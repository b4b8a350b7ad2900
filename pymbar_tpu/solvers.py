"""MBAR solver engine: adaptive Newton/self-consistent iteration + protocol chain.

Capability parity with pymbar 4.x mbar_solvers.py:102-1017:

* solver protocol constants (DEFAULT/ROBUST/JAX/BOOTSTRAP)
* ``adaptive``            — dual SC/Newton step, pick the smaller gradient
                            norm (reference :510-667)
* ``solve_mbar_once``     — f_0-pinned dispatch to adaptive / scipy minimize
                            / scipy root (reference :738-883)
* ``solve_mbar``          — protocol chain with best-gradient-norm fallback
                            (reference :886-974)
* ``solve_mbar_for_all_states`` — solve sampled states then one SC update to
                            fill empty states (reference :977-1017)

TPU-first design
----------------
``adaptive`` runs its entire iteration loop inside one ``lax.while_loop`` on
device — gradient, K×K Hessian (Gram form on the MXU), the least-squares
Newton step, both candidate gradient norms and the convergence test — so a
solve is a single device dispatch instead of one host round-trip per
iteration.  A host-orchestrated variant (one jitted step per iteration) is
kept for ``verbose=True`` so per-iteration diagnostics match the reference's
logging semantics.
"""

import logging
import warnings
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.optimize

from pymbar_tpu.ops.mbar_core import (
    core_stats,
    mbar_gradient,
    mbar_hessian,
    mbar_objective,
    mbar_objective_and_gradient,
    mbar_W_nk,
    precondition_u_kn,
    self_consistent_update,
    validate_inputs,
)
from pymbar_tpu.utils import ParameterError, check_w_normalized

logger = logging.getLogger(__name__)

__all__ = [
    "JAX_SOLVER_PROTOCOL",
    "DEFAULT_SOLVER_PROTOCOL",
    "ROBUST_SOLVER_PROTOCOL",
    "BOOTSTRAP_SOLVER_PROTOCOL",
    "adaptive",
    "anderson",
    "solve_mbar_once",
    "solve_mbar",
    "solve_mbar_for_all_states",
    "batched_bootstrap_solve",
]

# Protocol constants (reference mbar_solvers.py:102-118).  The reference's
# DEFAULT starts with scipy's 'hybr' root finder; on TPU the device-resident
# adaptive solver is both faster and more robust, so DEFAULT leads with it and
# keeps 'hybr' as the host fallback stage.
JAX_SOLVER_PROTOCOL = (
    dict(method="BFGS", continuation=True),
    dict(method="adaptive", options=dict(min_sc_iter=0)),
)

DEFAULT_SOLVER_PROTOCOL = (
    dict(method="adaptive", continuation=True),
    dict(method="hybr", continuation=True),
)

ROBUST_SOLVER_PROTOCOL = (
    dict(method="adaptive", options=dict(maxiter=1000)),
    dict(method="L-BFGS-B", options=dict(maxiter=1000)),
)

BOOTSTRAP_SOLVER_PROTOCOL = (dict(method="adaptive", options=dict(min_sc_iter=0)),)

# Gradient-based scipy.optimize.minimize methods accepted for protocol-string
# parity (reference mbar_solvers.py:120-140).
scipy_minimize_options = [
    "L-BFGS-B",
    "dogleg",
    "CG",
    "BFGS",
    "Newton-CG",
    "TNC",
    "trust-ncg",
    "trust-krylov",
    "trust-exact",
    "SLSQP",
]
scipy_nohess_options = ["L-BFGS-B", "BFGS", "CG", "TNC", "SLSQP"]
scipy_root_options = ["hybr", "lm"]


# -----------------------------------------------------------------------------
# Adaptive solver
# -----------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("nr_method",))
def _adaptive_candidates(u_kn, N_k, f_k, gamma, nr_method="lstsq"):
    """One adaptive iteration's candidate steps and their gradient norms.

    Returns (f_sci, g_sci, gnorm_sci, f_nr, g_nr, gnorm_nr) exactly as the
    reference's jax_core_adaptive (mbar_solvers.py:670-694), but sharing the
    log-denominator pass between the gradient and the SC update.

    nr_method='lstsq' reproduces the reference (min-norm solve of the
    singular full Hessian, then re-pin f_0).  nr_method='chol' solves the
    equivalent nonsingular reduced system -H[1:,1:] by Cholesky — the exact
    Newton step in the f_0=0 gauge, O(K^3/3) and SVD-free, preferred at
    large K on TPU where the f64 SVD is emulated.
    """
    _, g, f_sci = core_stats(u_kn, N_k, f_k)
    # DEFAULT-precision Gram: the Hessian only steers the Newton direction
    # here — step acceptance and convergence are judged on the exact
    # gradient — and single-pass bf16 MXU arithmetic (~9e-4 relative Gram
    # error) was measured iteration-count-neutral while being ~6x cheaper
    # per matmul than HIGHEST (the round-3 covariance-accuracy fix must
    # not tax the solve loop).
    H = mbar_hessian(u_kn, N_k, f_k, precision=jax.lax.Precision.DEFAULT)
    if nr_method == "chol":
        # mbar_hessian returns the PSD Hessian of the convex MBAR objective
        # (reference sign convention), so the f_0-pinned block is positive
        # definite and Cholesky-solvable directly.
        A = H[1:, 1:]
        cho = jax.scipy.linalg.cho_factor(A)
        dx1 = jax.scipy.linalg.cho_solve(cho, g[1:])
        Hinvg = jnp.concatenate([jnp.zeros((1,), dtype=g.dtype), dx1])
    else:
        Hinvg = jnp.linalg.lstsq(H, g, rcond=-1)[0]
    Hinvg -= Hinvg[0]
    f_nr = f_k - gamma * Hinvg

    f_sci = f_sci - f_sci[0]
    g_sci = mbar_gradient(u_kn, N_k, f_sci)
    gnorm_sci = jnp.dot(g_sci, g_sci)

    g_nr = mbar_gradient(u_kn, N_k, f_nr)
    gnorm_nr = jnp.dot(g_nr, g_nr)

    return f_sci, g_sci, gnorm_sci, f_nr, g_nr, gnorm_nr


def host_adaptive_metrics(f_new, f_old, f_sci, f_nr, tol, delta_mode="relative"):
    """Host (numpy) twin of :func:`_adaptive_metrics`.

    Every host-orchestrated adaptive loop (the verbose path here, the
    sharded f64 and f32 loops in :mod:`pymbar_tpu.parallel.sharding`) calls
    this one function, so the convergence rule exists exactly twice in the
    codebase — once traceable, once host — and the two are pinned equal by
    ``tests/test_mbar_solvers.py``.  Returns ``(max_delta, max_diff)``.
    """
    f_new = np.asarray(f_new)
    f_old = np.asarray(f_old)
    f_sci = np.asarray(f_sci)
    f_nr = np.asarray(f_nr)
    if delta_mode == "mixed":
        div = np.maximum(np.abs(f_new[1:]), 1.0)
    else:
        div = np.abs(f_new[1:]).copy()
        div[div < min(1.0e-8, tol)] = 1.0
    max_delta = float(np.max(np.abs(f_new[1:] - f_old[1:]) / div))
    max_diff = float(np.max(np.abs(f_sci[1:] - f_nr[1:]) / div))
    return max_delta, max_diff


def _adaptive_metrics(f_new, f_old, f_sci, f_nr, tol, delta_mode="relative"):
    """Convergence metrics.

    'relative' reproduces the reference (mbar_solvers.py:627-640): divide by
    |f_k|, which is pathological when some f_k are near zero (their noise
    never shrinks relative to them).  'mixed' divides by max(|f_k|, 1) — an
    absolute criterion for small values — used by the non-parity fast paths.
    """
    if delta_mode == "mixed":
        div = jnp.maximum(jnp.abs(f_new[1:]), 1.0)
    else:
        div = jnp.abs(f_new[1:])
        zeroed = div < jnp.minimum(1.0e-8, tol)
        div = jnp.where(zeroed, 1.0, div)
    max_delta = jnp.max(jnp.abs(f_new[1:] - f_old[1:]) / div)
    max_diff = jnp.max(jnp.abs(f_sci[1:] - f_nr[1:]) / div)
    return max_delta, max_diff


@partial(jax.jit, static_argnames=("maxiter", "min_sc_iter", "nr_method", "delta_mode"))
def _adaptive_while(
    u_kn, N_k, f_k, gamma, tol, maxiter, min_sc_iter, nr_method="lstsq", delta_mode="relative"
):
    """Entire adaptive loop as one on-device lax.while_loop.

    Carries (iteration, f_k, sci_iter, nr_iter, max_delta, done).  Semantics
    match the reference host loop (mbar_solvers.py:575-640): SC step is
    forced for the first ``min_sc_iter`` iterations, otherwise whichever of
    the SC / Newton candidates has the smaller gradient 2-norm wins; the loop
    stops when the relative change in f is below tol AND the SC/NR candidates
    agree to sqrt(tol) (or the metric went NaN, which the reference also
    treats as termination-with-success).
    """
    tol = jnp.asarray(tol, dtype=f_k.dtype)

    def cond(state):
        it, _f, _sci, _nr, _delta, done = state
        return jnp.logical_and(it < maxiter, jnp.logical_not(done))

    def body(state):
        it, f_old, sci_iter, nr_iter, _delta, done = state
        f_sci, g_sci, gnorm_sci, f_nr, g_nr, gnorm_nr = _adaptive_candidates(
            u_kn, N_k, f_old, gamma, nr_method
        )
        take_sci = jnp.logical_or(gnorm_sci < gnorm_nr, sci_iter < min_sc_iter)
        f_new = jnp.where(take_sci, f_sci, f_nr)
        sci_iter = sci_iter + jnp.where(take_sci, 1, 0)
        nr_iter = nr_iter + jnp.where(take_sci, 0, 1)

        max_delta, max_diff = _adaptive_metrics(f_new, f_old, f_sci, f_nr, tol, delta_mode)
        done = jnp.logical_or(
            jnp.isnan(max_delta),
            jnp.logical_and(max_delta < tol, max_diff < jnp.sqrt(tol)),
        )
        return it + 1, f_new, sci_iter, nr_iter, max_delta, done

    init = (
        jnp.asarray(0, dtype=jnp.int32),
        f_k,
        jnp.asarray(0, dtype=jnp.int32),
        jnp.asarray(0, dtype=jnp.int32),
        jnp.asarray(jnp.inf, dtype=f_k.dtype),
        jnp.asarray(False),
    )
    it, f_k, sci_iter, nr_iter, max_delta, done = jax.lax.while_loop(cond, body, init)
    return f_k, it, sci_iter, nr_iter, max_delta, done


def adaptive(u_kn, N_k, f_k, tol=1.0e-8, options=None):
    """Hybrid Newton-Raphson / self-consistent-iteration solver.

    Per iteration both a Newton step (H^-1 g via least squares, f_0 re-pinned)
    and a self-consistent step are computed; the one with the smaller gradient
    norm is taken (reference mbar_solvers.py:510-667).

    Options: ``gamma`` (Newton step scale, default 1.0), ``maxiter`` (default
    10000), ``min_sc_iter`` (minimum forced SC iterations, default 2),
    ``verbose``, ``print_warning``.

    Returns dict(success, message, x) like the reference.
    """
    options = dict(options or {})
    options.setdefault("verbose", False)
    options.setdefault("maxiter", 10000)
    options.setdefault("print_warning", False)
    options.setdefault("gamma", 1.0)
    options.setdefault("min_sc_iter", 2)
    options.setdefault("nr_method", "lstsq")

    gamma = options["gamma"]
    maxiter = int(options["maxiter"])
    min_sc_iter = int(options["min_sc_iter"])
    nr_method = options["nr_method"]
    verbose = options["verbose"]

    if verbose:
        logger.info(
            "Determining dimensionless free energies by Newton-Raphson / "
            "self-consistent iteration."
        )
    if tol < 4.0 * np.finfo(np.float64).eps:
        logger.info("Tolerance may be too close to machine precision to converge.")

    u_kn = jnp.asarray(u_kn)
    N_k = jnp.asarray(N_k, dtype=u_kn.dtype)
    f_k = jnp.asarray(f_k, dtype=u_kn.dtype)
    gamma = jnp.asarray(gamma, dtype=u_kn.dtype)

    if maxiter <= 0:
        logger.warning(
            f"No iterations ran because maximum_iterations was <= 0 ({maxiter})!"
        )
        return dict(success=False, message="Did not converge.", x=f_k)

    if not verbose:
        f_out, it, sci_iter, nr_iter, max_delta, done = _adaptive_while(
            u_kn, N_k, f_k, gamma, tol, maxiter, min_sc_iter, nr_method
        )
        success = bool(done)
        max_delta = float(max_delta)
        it = int(it)
        sci_iter, nr_iter = int(sci_iter), int(nr_iter)
    else:
        # Host-orchestrated loop: one fused device step per iteration, with
        # the reference's per-iteration diagnostics.
        success = False
        sci_iter = nr_iter = 0
        max_delta = np.inf
        it = 0
        for it in range(1, maxiter + 1):
            f_sci, g_sci, gnorm_sci, f_nr, g_nr, gnorm_nr = map(
                np.asarray, _adaptive_candidates(u_kn, N_k, f_k, gamma, nr_method)
            )
            logger.info(
                "self consistent iteration gradient norm is %10.5g, "
                "Newton-Raphson gradient norm is %10.5g"
                % (np.sqrt(gnorm_sci), np.sqrt(gnorm_nr))
            )
            f_old = np.asarray(f_k)
            if gnorm_sci < gnorm_nr or sci_iter < min_sc_iter:
                f_k = f_sci
                sci_iter += 1
                if sci_iter <= min_sc_iter:
                    logger.info(
                        f"Choosing self-consistent iteration on iteration "
                        f"{it - 1:d} because min_sci_iter={min_sc_iter:d}"
                    )
                else:
                    logger.info(
                        "Choosing self-consistent iteration for lower "
                        f"gradient on iteration {it - 1:d}"
                    )
            else:
                f_k = f_nr
                nr_iter += 1
                logger.info(f"Newton-Raphson used on iteration {it - 1:d}")

            max_delta, max_diff = host_adaptive_metrics(f_k, f_old, f_sci, f_nr, tol)
            if np.isnan(max_delta) or (max_delta < tol and max_diff < np.sqrt(tol)):
                success = True
                break
        f_out = jnp.asarray(f_k)

    if success:
        message = "Convergence achieved by change in f with respect to previous guess."
        if verbose:
            logger.info(
                f"Converged to tolerance of {max_delta:e} in {it:d} iterations."
            )
            logger.info(
                f"Of {it:d} iterations, {nr_iter:d} were Newton-Raphson "
                f"iterations and {sci_iter:d} were self-consistent iterations"
            )
            if np.all(np.asarray(f_out) == 0.0):
                logger.info("WARNING: All f_k appear to be zero.")
    else:
        message = "Did not converge."
        logger.warning("WARNING: Did not converge to within specified tolerance.")
        logger.warning(
            f"max_delta = {max_delta:e}, tol = {tol:e}, "
            f"maximum_iterations = {maxiter:d}, iterations completed = {it:d}"
        )

    return dict(success=success, message=message, x=f_out)


def anderson(u_kn, N_k, f_k, tol=1.0e-12, options=None):
    """Anderson-accelerated self-consistent iteration (Hessian-free).

    A NEW solver (no reference analog): accelerates the Eq. C3 fixed point
    with Anderson mixing over an ``m``-deep residual history.  Each iteration
    costs exactly one fused K×N pass pair (logden + lognum) and O(K m^2) host
    algebra — no K×K Hessian, no Gram matmul — which makes it the method of
    choice when K is too large to afford Newton (the K>=4096 mesh configs)
    or as a cheap warm-up phase.

    Options: maxiter (default 1000), m (history depth, default 5),
    beta (mixing, default 1.0), verbose.
    Returns dict(success, message, x) like ``adaptive``.
    """
    options = dict(options or {})
    maxiter = int(options.get("maxiter", 1000))
    m = int(options.get("m", 5))
    beta = float(options.get("beta", 1.0))
    verbose = options.get("verbose", False)

    u_kn = jnp.asarray(u_kn)
    N_k = jnp.asarray(N_k, dtype=u_kn.dtype)
    f = np.asarray(f_k, dtype=np.float64)
    f = f - f[0]

    @jax.jit
    def sc(fv):
        _, _, f_sci = core_stats(u_kn, N_k, fv)
        return f_sci - f_sci[0]

    hist_x = []
    hist_r = []
    success = False
    max_delta = np.inf
    it = 0
    for it in range(1, maxiter + 1):
        gx = np.asarray(sc(jnp.asarray(f, dtype=u_kn.dtype)), dtype=np.float64)
        r = gx - f

        hist_x.append(gx)
        hist_r.append(r)
        if len(hist_x) > m:
            hist_x.pop(0)
            hist_r.pop(0)

        if len(hist_r) > 1:
            # alpha minimizing || R alpha ||, sum(alpha) = 1 — solved as an
            # unconstrained lstsq on residual differences.
            R = np.stack(hist_r, axis=1)  # (K, q)
            dR = R[:, :-1] - R[:, -1:]
            try:
                gamma_c, *_ = np.linalg.lstsq(dR, R[:, -1], rcond=None)
                alpha = np.concatenate([-gamma_c, [1.0 + np.sum(gamma_c)]])
            except np.linalg.LinAlgError:
                alpha = np.zeros(R.shape[1])
                alpha[-1] = 1.0
            X = np.stack(hist_x, axis=1)
            f_new = X @ alpha
            if beta != 1.0:
                f_new = (1 - beta) * (np.stack([x - r for x, r in zip(hist_x, hist_r)], axis=1) @ alpha) + beta * f_new
        else:
            f_new = gx

        f_new = f_new - f_new[0]
        max_delta, _ = host_adaptive_metrics(f_new, f, f_new, f_new, tol)
        f = f_new
        if verbose:
            logger.info(f"anderson iteration {it}: max_delta = {max_delta:.3e}")
        if max_delta < tol:
            success = True
            break

    message = (
        "Convergence achieved by change in f with respect to previous guess."
        if success
        else "Did not converge."
    )
    if not success:
        logger.warning(
            f"anderson: did not converge (max_delta={max_delta:e}, maxiter={maxiter})"
        )
    return dict(success=success, message=message, x=jnp.asarray(f))


# -----------------------------------------------------------------------------
# Protocol machinery
# -----------------------------------------------------------------------------


def solve_mbar_once(
    u_kn_nonzero,
    N_k_nonzero,
    f_k_nonzero,
    method="adaptive",
    tol=1e-12,
    continuation=None,
    options=None,
):
    """Solve MBAR once with a single method, f_0 pinned to zero.

    Mirrors reference mbar_solvers.py:738-883: inputs are validated,
    preconditioned, and solved in the K-1 dimensional reduced coordinate
    system (f_0 := 0).  ``method`` may be "adaptive" (on-device), any
    gradient-based scipy.optimize.minimize method, or a scipy.optimize.root
    method ("hybr"/"lm") with the analytic Jacobian.

    Returns (f_k_nonzero, results_dict).
    """
    del continuation  # consumed by solve_mbar; accepted for **solver splat
    options = dict(options or {})
    u_kn_nonzero, N_k_nonzero, f_k_nonzero = validate_inputs(
        u_kn_nonzero, N_k_nonzero, f_k_nonzero
    )
    f_k_nonzero = f_k_nonzero - f_k_nonzero[0]

    if method == "dd":
        # Two-phase double-word solve (solvers_large) — the TPU production
        # path for large problems.  A host matrix splits host-side (the
        # full f64 never reaches the device); a device-RESIDENT matrix
        # splits on device (dev_split_planes — pulling it to host first
        # would cost a GB-scale download).  Either way the split applies
        # the min-shift precondition (gradients are shift-invariant, and
        # the dd solver never consumes the objective value).
        from pymbar_tpu.solvers_large import (
            dev_split_planes,
            host_split_planes,
            solve_mbar_dd,
        )

        if isinstance(u_kn_nonzero, jax.Array) and not isinstance(
            u_kn_nonzero, np.ndarray
        ):
            uh, ul = dev_split_planes(u_kn_nonzero)
        else:
            uh, ul = host_split_planes(u_kn_nonzero)
        opts = {
            k: options[k]
            for k in ("f32_tol", "f32_maxiter", "polish_maxiter", "gamma", "fast_exp")
            if k in options
        }
        f_sol, info = solve_mbar_dd(
            uh, ul, N_k_nonzero, f_k=f_k_nonzero, tol=tol, **opts
        )
        results = {
            "x": np.asarray(f_sol),
            "success": bool(info["converged"]),
            "info": info,
        }
        return results["x"] - results["x"][0], results

    u_dev = jnp.asarray(u_kn_nonzero)
    N_dev = jnp.asarray(N_k_nonzero, dtype=u_dev.dtype)
    f_dev = jnp.asarray(f_k_nonzero, dtype=u_dev.dtype)
    u_dev = precondition_u_kn(u_dev, N_dev, f_dev)

    def pad(x):
        return np.pad(np.asarray(x), (1, 0), mode="constant")

    def grad(x):
        return np.asarray(mbar_gradient(u_dev, N_dev, jnp.asarray(pad(x))))[1:]

    def grad_and_obj(x):
        obj, g = mbar_objective_and_gradient(u_dev, N_dev, jnp.asarray(pad(x)))
        return float(obj), np.asarray(g)[1:]

    def hess(x):
        return np.asarray(mbar_hessian(u_dev, N_dev, jnp.asarray(pad(x))))[1:, 1:]

    with warnings.catch_warnings(record=True) as w:
        if method == "adaptive":
            results = adaptive(u_dev, N_dev, f_dev, tol=tol, options=options)
            f_k_nonzero = np.asarray(results["x"])
        elif method == "anderson":
            results = anderson(u_dev, N_dev, f_dev, tol=tol, options=options)
            f_k_nonzero = np.asarray(results["x"])
        elif method == "BFGS":
            # Device-resident BFGS on the f_0-pinned objective — the
            # reference's JAX-protocol path (mbar_solvers.py:820-834).
            import jax.scipy.optimize as jopt

            def obj(x):
                return mbar_objective(
                    u_dev, N_dev, jnp.concatenate([jnp.zeros(1, dtype=x.dtype), x])
                )

            jax_results = jopt.minimize(
                obj,
                f_dev[1:],
                method="BFGS",
                tol=tol,
                options=dict(maxiter=options.get("maxiter", 10000)),
            )
            f_k_nonzero = pad(jax_results.x)
            results = dict(x=jax_results.x, success=bool(jax_results.success))
        elif method in scipy_minimize_options:
            hess_arg = None if method in scipy_nohess_options else hess
            scipy_opts = {
                k: v
                for k, v in options.items()
                if k not in ("min_sc_iter", "print_warning", "gamma", "verbose", "nr_method")
            }
            results = scipy.optimize.minimize(
                grad_and_obj,
                np.asarray(f_k_nonzero)[1:],
                jac=True,
                hess=hess_arg,
                method=method,
                tol=tol,
                options=scipy_opts,
            )
            f_k_nonzero = pad(results["x"])
        elif method in scipy_root_options:
            scipy_opts = {
                k: v
                for k, v in options.items()
                if k not in ("min_sc_iter", "print_warning", "gamma", "verbose", "nr_method")
            }
            results = scipy.optimize.root(
                grad,
                np.asarray(f_k_nonzero)[1:],
                jac=hess,
                method=method,
                tol=tol,
                options=scipy_opts,
            )
            f_k_nonzero = pad(results["x"])
        else:
            raise ParameterError(
                f"Method {method} for solution of free energies not recognized"
            )

    # Scipy-warning fallback validation (reference mbar_solvers.py:860-882).
    if len(w) > 0:
        can_ignore = True
        for warn_msg in w:
            if "Unknown solver options" in str(warn_msg.message):
                continue
            warnings.showwarning(
                warn_msg.message,
                warn_msg.category,
                warn_msg.filename,
                warn_msg.lineno,
                warn_msg.file,
                "",
            )
            can_ignore = False
        if not can_ignore:
            w_nk_check = np.asarray(mbar_W_nk(u_dev, N_dev, jnp.asarray(f_k_nonzero)))
            check_w_normalized(w_nk_check, np.asarray(N_k_nonzero))
            logger.warning(
                "MBAR weights converged within tolerance, despite the SciPy "
                "Warnings. Please validate your results."
            )

    return np.asarray(f_k_nonzero), dict(results)


def solve_mbar(u_kn_nonzero, N_k_nonzero, f_k_nonzero, solver_protocol=None):
    """Run a chain of solvers, keeping the best-gradient-norm result on failure.

    Mirrors reference mbar_solvers.py:886-974: each protocol stage is tried
    in order; a successful stage short-circuits; on total failure the stage
    with the smallest final gradient norm wins; stages with
    ``continuation=True`` hand their f_k to the next stage.
    """
    if solver_protocol is None:
        solver_protocol = DEFAULT_SOLVER_PROTOCOL

    all_fks = []
    all_gnorms = []
    all_results = []
    results = dict(success=False)

    for solver in solver_protocol:
        f_k_nonzero_result, results = solve_mbar_once(
            u_kn_nonzero, N_k_nonzero, f_k_nonzero, **solver
        )
        all_fks.append(f_k_nonzero_result)
        if "info" in results and "gnorm" in results.get("info", {}):
            # Stage already certified its own gradient norm (dd path) — a
            # recompute would stream the full f64 matrix again for nothing.
            all_gnorms.append(float(results["info"]["gnorm"]))
        else:
            all_gnorms.append(
                float(
                    np.linalg.norm(
                        np.asarray(
                            mbar_gradient(
                                jnp.asarray(u_kn_nonzero),
                                jnp.asarray(
                                    N_k_nonzero,
                                    # .dtype, NOT np.asarray(...).dtype: the
                                    # latter downloads a device matrix just
                                    # to read its dtype
                                    dtype=np.dtype(u_kn_nonzero.dtype),
                                ),
                                jnp.asarray(f_k_nonzero_result),
                            )
                        )
                    )
                )
            )
        all_results.append(results)

        if results["success"]:
            best_gnorm = all_gnorms[-1]
            logger.info(
                f"Reached a solution to within tolerance with {solver['method']}"
            )
            break
        logger.warning(
            f"Failed to reach a solution to within tolerance with "
            f"{solver['method']}: trying next method"
        )
        logger.info(f"Ending gnorm of method {solver['method']} = {all_gnorms[-1]:e}")
        if solver.get("continuation"):
            f_k_nonzero = f_k_nonzero_result
            logger.info("Will continue with results from previous method")

    if results["success"]:
        logger.info("Solution found within tolerance!")
    else:
        i_best_gnorm = int(np.argmin(all_gnorms))
        logger.warning("No solution found to within tolerance.")
        best_method = solver_protocol[i_best_gnorm]["method"]
        best_gnorm = all_gnorms[i_best_gnorm]
        logger.warning(
            f"The solution with the smallest gradient {best_gnorm:e} norm is "
            f"{best_method}"
        )
        f_k_nonzero_result = all_fks[i_best_gnorm]
        logger.warning(
            "Please exercise caution with this solution and consider "
            "alternative methods or a different tolerance."
        )

    logger.info(f"Final gradient norm: {best_gnorm:.3g}")
    return f_k_nonzero_result, all_results


def batched_bootstrap_solve(
    u_kn,
    N_k,
    f_k,
    rints,
    maxiter=10000,
    min_sc_iter=2,
    gamma=1.0,
    tol=1.0e-12,
    nr_method="lstsq",
    chunk_bytes=1 << 28,
    verbose=False,
):
    """Solve every bootstrap replicate's f_k batched under vmap.

    Equivalent to per-replicate ``solve_mbar_for_all_states`` with a
    single-stage adaptive protocol warm-started at the converged ``f_k``
    (reference mbar.py:417-449), but the per-replicate gathers,
    preconditioning, adaptive while-loops and the empty-state SC fill all
    run as one vmapped device program per chunk of replicates.  Replicates
    chunk to bound the B x K x N resampled-matrix memory.

    Parameters: ``rints`` is the (B, N) resample-index matrix.  Returns
    (f_boots (B, K) ndarray, n_fail).
    """
    from pymbar_tpu.ops.mbar_core import (
        _log_numerator_k,
        log_denominator_n,
        precondition_u_kn,
    )

    if not isinstance(u_kn, jax.Array):
        u_kn = np.asarray(u_kn)  # device matrices stay resident
    N_k = np.asarray(N_k, dtype=np.float64)
    f_k = np.asarray(f_k, dtype=np.float64)
    rints = np.asarray(rints)
    B = rints.shape[0]
    K = len(N_k)
    sws = np.where(N_k != 0)[0]

    u_dev = jnp.asarray(u_kn)
    N_sub = jnp.asarray(N_k[sws])
    N_all = jnp.asarray(N_k)
    f_init = jnp.asarray(f_k - f_k[0])
    sws_dev = jnp.asarray(sws)

    def solve_one(r):
        u_full = u_dev[:, r]
        u_sub = u_full[sws_dev]
        u_sub = precondition_u_kn(u_sub, N_sub, f_init[sws_dev])
        f_nz, _it, _sci, _nr, _delta, done = _adaptive_while(
            u_sub,
            N_sub,
            f_init[sws_dev],
            jnp.asarray(gamma, jnp.float64),
            jnp.asarray(tol, jnp.float64),
            maxiter,
            min_sc_iter,
            nr_method,
        )
        f_all = jnp.zeros(K, dtype=jnp.float64).at[sws_dev].set(f_nz)
        # Empty-state fill: one SC update over all states, re-pin f_0.
        logden = log_denominator_n(u_full, N_all, f_all)
        f_all = -_log_numerator_k(u_full, logden)
        return f_all - f_all[0], done

    solve_batch = jax.jit(jax.vmap(solve_one))

    f_boots = np.zeros((B, K))
    bytes_per = u_kn.size * 8
    chunk = int(max(1, min(B, chunk_bytes // max(bytes_per, 1))))
    n_fail = 0
    for start in range(0, B, chunk):
        r = jnp.asarray(rints[start : start + chunk])
        f_b, done_b = solve_batch(r)
        f_boots[start : start + chunk] = np.asarray(f_b)
        n_fail += int(np.sum(~np.asarray(done_b)))
        if verbose:
            logger.info(
                f"Calculated {min(start + chunk, B):d}/{B:d} bootstrap samples"
            )
    return f_boots, n_fail


def solve_mbar_for_all_states(u_kn, N_k, f_k, states_with_samples, solver_protocol):
    """Solve sampled states, then one SC pass to fill empty states, re-pin f_0.

    Mirrors reference mbar_solvers.py:977-1017.  A device-resident
    (jax.Array) u_kn is consumed in place: np.asarray here would pull the
    whole matrix across the frontend (GB-scale = minutes on a tunneled
    TPU) only for every downstream stage to push it back.
    """
    if not isinstance(u_kn, jax.Array):
        u_kn = np.asarray(u_kn)
    N_k = np.asarray(N_k)
    f_k = np.array(f_k, dtype=np.float64, copy=True)
    states_with_samples = np.asarray(states_with_samples)

    if len(states_with_samples) == 1:
        f_k_nonzero = np.array([0.0])
    else:
        all_sampled = len(states_with_samples) == len(N_k) and np.array_equal(
            states_with_samples, np.arange(len(N_k))
        )
        f_k_nonzero, _all_results = solve_mbar(
            # identity selection skips a full-matrix device gather copy
            u_kn if all_sampled else u_kn[states_with_samples],
            N_k[states_with_samples],
            f_k[states_with_samples],
            solver_protocol=solver_protocol,
        )

    f_k[states_with_samples] = np.asarray(f_k_nonzero)

    # Empty states' free energies come from one SC update over all states.
    # With no empty states and a dd-protocol solve this pass is pure cost:
    # f already satisfies the SC equations past the dd noise floor (~1e-10),
    # and at the GB scale the extra full-f64 device upload it would trigger
    # costs minutes on a tunneled frontend.
    dd_only = all(s.get("method") == "dd" for s in (solver_protocol or ()))
    if dd_only and len(states_with_samples) == len(N_k):
        return f_k - f_k[0]
    f_k = np.array(
        self_consistent_update(
            jnp.asarray(u_kn), jnp.asarray(N_k, dtype=np.float64), jnp.asarray(f_k)
        )
    )
    f_k -= f_k[0]
    return f_k
