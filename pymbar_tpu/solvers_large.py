"""TPU-scale MBAR solver: f32 phase + double-word Newton polish.

The production path for K x N problems in the 10^9-element range
(BASELINE.md targets).  The reduced-potential matrix is held as two float32
planes (hi, lo) — the same 8 bytes/element as f64 — and the solve runs in
two phases:

1. **f32 phase** — the standard adaptive solver (`solvers._adaptive_while`)
   on the hi plane alone, at full f32 speed.  Its achievable relative
   convergence is measured with the 'mixed' metric (divide by
   max(|f_k|, 1)) because the reference's purely relative metric never
   settles for states with near-zero f_k.
2. **double-word Newton polish** — a handful of Newton iterations where the
   two hot logsumexp reductions run through the fused Pallas double-word
   kernels (:mod:`pymbar_tpu.ops.pallas_kernels`, ~1e-13 effective
   precision) and the K x K Hessian comes from the f32 Gram (the Newton
   direction needs no more precision; convergence is certified on the
   compensated gradient).

This replaces XLA's f64 emulation on the hot path (measured ~5x slower than
f32) without giving up the 1e-12-level convergence the MBAR tolerances
demand (SURVEY.md §7 hard part #1).
"""

import logging
from functools import partial

import jax
import jax.numpy as jnp
import functools

import numpy as np

from pymbar_tpu.config import on_tpu
from pymbar_tpu.ops.doubledouble import dd_from_f64, dd_to_f64
from pymbar_tpu.ops.mbar_core import gram_f32_acc64
from pymbar_tpu.ops.pallas_kernels import (
    logden_dd,
    logden_dd_ref,
    lognum_dd,
    lognum_dd_ref,
    lognum_fused_dd,
    lognum_fused_dd_ref,
    wsum_dd,
    wsum_dd_ref,
)
from pymbar_tpu.solvers import _adaptive_while

logger = logging.getLogger(__name__)

__all__ = ["solve_mbar_dd", "split_u_kn_streamed"]


@partial(jax.jit, donate_argnums=(0,))
def _split_inplaceish(u64):
    hi = u64.astype(jnp.float32)
    lo = (u64 - hi.astype(u64.dtype)).astype(jnp.float32)
    return hi, lo


def split_u_kn_streamed(u64):
    """Split a float64 u_kn into (hi, lo) f32 planes, donating the input."""
    return _split_inplaceish(jnp.asarray(u64))


@jax.jit
def _m_k_pass(u_hi, ld_hi):
    """f32 stabilizing max over n of (-logden - u) per state (one cheap pass)."""
    return jnp.max(-ld_hi[None, :] - u_hi, axis=1)



@functools.partial(jax.jit, static_argnames=("maxiter",))
def _newton_while_f32(u_hi, N_k32, f0, chol, tol, maxiter):
    """f32 chord-Newton loop: one fused stats pass per iteration.

    The reference adaptive loop evaluates BOTH the SC and Newton candidates
    plus their gradients (~7 K x N passes per iteration) to pick the safer
    step; from the multilevel warm start (~1e-3 from the solution) the
    chord-Newton step with the frozen factor ``chol`` always contracts, so
    one core_stats pass per iteration suffices.  Returns (f, iters, delta).
    """
    from pymbar_tpu.ops.mbar_core import core_stats

    def cond(state):
        it, _f, _delta, done = state
        return jnp.logical_and(it < maxiter, jnp.logical_not(done))

    def body(state):
        it, f, _delta, _done = state
        _obj, g, _f_sci = core_stats(u_hi, N_k32, f)
        dx1 = jax.scipy.linalg.cho_solve((chol, False), g[1:])
        f_new = f - jnp.concatenate([jnp.zeros((1,), f.dtype), dx1])
        f_new = f_new - f_new[0]
        div = jnp.maximum(jnp.abs(f_new[1:]), 1.0)
        delta = jnp.max(jnp.abs(f_new[1:] - f[1:]) / div)
        bad = ~jnp.isfinite(delta)
        return it + 1, jnp.where(bad, f, f_new), delta, (delta < tol) | bad

    it, f, delta, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), f0, jnp.asarray(jnp.inf, f0.dtype), False)
    )
    return f, it, delta


def _newton_factor(gram, colsum, N_k64):
    """Cholesky factor of the reduced Hessian from the f32 Gram (f64 algebra).

    Factored once per polish and reused across iterations (chord/frozen-
    Newton): H moves by only ~|delta f| ~ 1e-4 relative between polish
    iterations while each iteration only needs ~1e-2 contraction, so the
    stale factor costs nothing observable and saves a K x N Gram pass plus
    an O(K^3) factorization per iteration.
    """
    gram = gram.astype(jnp.float64)
    colsum = colsum.astype(jnp.float64)
    H = -(gram * N_k64[None, :] * N_k64[:, None] - jnp.diag(colsum * N_k64))
    c, lower = jax.scipy.linalg.cho_factor(H[1:, 1:])
    return c, bool(lower)


def _newton_step(f, lognum64, cho, N_k64, gamma):
    """One f64 K-vector (chord-)Newton step from the dd lognum."""
    g = -N_k64 * (1.0 - jnp.exp(f + lognum64))
    dx1 = jax.scipy.linalg.cho_solve((cho[0], cho[1]), g[1:])
    dx = jnp.concatenate([jnp.zeros((1,), dtype=f.dtype), dx1])
    f_new = f - gamma * dx
    f_new = f_new - f_new[0]
    return f_new, g


def _newton_step_g(f, g, cho, gamma):
    """One f64 K-vector chord-Newton step from the exact gradient
    g_k = S_k - N_k (the wsum form — no log/exp roundtrip)."""
    dx1 = jax.scipy.linalg.cho_solve((cho[0], cho[1]), g[1:])
    dx = jnp.concatenate([jnp.zeros((1,), dtype=f.dtype), dx1])
    f_new = f - gamma * dx
    return f_new - f_new[0]



def _strided_subsample(N_k, stride):
    """Host-side every-``stride``-th column selection in kn block order.

    Returns (flat column indices, per-state subsample counts).  Sampling
    uniformly within each state block keeps the subproblem a consistent
    MBAR estimate of the full problem (used for the multilevel warm start).
    """
    N_k = np.asarray(N_k, dtype=np.int64)
    idx = []
    counts = np.zeros_like(N_k)
    start = 0
    for k, nk in enumerate(N_k):
        sel = np.arange(start, start + nk, stride, dtype=np.int64)
        idx.append(sel)
        counts[k] = sel.size
        start += nk
    return np.concatenate(idx), counts


def solve_mbar_dd(
    u_hi,
    u_lo,
    N_k,
    f_k=None,
    tol=1.0e-12,
    f32_tol=1.0e-4,
    f32_maxiter=40,
    polish_maxiter=12,
    gamma=1.0,
    fast_exp=True,
):
    """Solve the MBAR equations on double-word-split reduced potentials.

    Parameters
    ----------
    u_hi, u_lo : (K, N) float32
        Double-word planes of the (preconditioned) reduced potentials.
    N_k : (K,) — all states must have samples (empty-state fill is the
        caller's job, as in solve_mbar_for_all_states).
    f_k : optional initial guess (float64).
    tol : relative convergence tolerance of the polish phase.
    fast_exp : use the 16x-range-reduction dd exp in the Pallas kernels
        (same accuracy under Mosaic — measured 7e-12 logden either way —
        ~1.4x kernel speedup; ignored off-TPU where the jnp reference runs).

    Returns (f_k float64, info dict with gnorm/iteration counts).
    """
    import time

    u_hi = jnp.asarray(u_hi)
    u_lo = jnp.asarray(u_lo)
    K = u_hi.shape[0]
    N_k64 = jnp.asarray(np.asarray(N_k), dtype=jnp.float64)
    f64 = jnp.zeros(K, dtype=jnp.float64) if f_k is None else jnp.asarray(f_k, jnp.float64)
    f64 = f64 - f64[0]

    t_phase1 = time.time()

    # ---- phase 1a: multilevel warm start on a strided subsample.
    # An MBAR solve on every 16th sample is a consistent estimate whose f_k
    # sits ~1e-2..1e-3 from the full-N solution, at ~1/16 the per-iteration
    # cost — the full-N adaptive phase then needs ~2-3 iterations instead
    # of ~9.  Skipped when any state would get too few subsamples.
    it32_coarse = 0
    N_k_host = np.asarray(N_k, dtype=np.int64)
    stride = 16
    cho = None  # the shared chord factor (subsample Gram when available)
    N_k32 = N_k64.astype(jnp.float32)
    if u_hi.shape[1] >= 2**19 and N_k_host.min() >= 4 * stride:
        idx, N_k_sub = _strided_subsample(N_k_host, stride)
        u_sub = jnp.take(u_hi, jnp.asarray(idx), axis=1)
        N_sub32 = jnp.asarray(N_k_sub, jnp.float32)
        f32_coarse, it32_coarse, _, _, _, _ = _adaptive_while(
            u_sub,
            N_sub32,
            f64.astype(jnp.float32),
            jnp.asarray(gamma, jnp.float32),
            jnp.asarray(f32_tol, jnp.float32),
            f32_maxiter,
            2,
            "chol",
            "mixed",
        )
        f64 = f32_coarse.astype(jnp.float64)
        f64 = f64 - f64[0]
        it32_coarse = int(it32_coarse)

        # The chord factor for BOTH the f32 refinement and the dd polish
        # comes from the SUBSAMPLE Gram at the coarse endpoint: W columns
        # normalize to 1 whatever the sample count, so individual weights
        # scale as 1/N — gram_full ~ gram_sub / stride while colsums stay
        # ~1.  Its ~0.4% statistical error matches the ~1e-2 contraction
        # the full-plane f32 Gram delivers anyway, and it replaces two
        # full-plane Gram passes (mbar_hessian + gram_f32_acc64, ~0.15 s
        # at the 8 GB bench config) with one 1/16-cost pass.
        gram_s, colsum_s = gram_f32_acc64(u_sub, N_sub32, f32_coarse)
        cho = _newton_factor(gram_s / stride, colsum_s, N_k64)

    # ---- phase 1b: full-N f32 refinement.
    # From the coarse warm start a chord-Newton loop (one fused stats pass
    # per iteration, frozen factor) replaces the reference adaptive loop
    # (~7 passes per iteration evaluating both candidate steps); the
    # adaptive loop remains the fallback if chord fails to contract (cold
    # start, ill-conditioned data).
    f32_0 = f64.astype(jnp.float32)
    done32 = False
    it32 = 0
    if it32_coarse > 0:
        chol32 = cho[0].astype(jnp.float32)
        f32_out, it32, max_delta32 = _newton_while_f32(
            u_hi, N_k32, f32_0, chol32, jnp.float32(f32_tol), f32_maxiter
        )
        it32 = int(it32)
        done32 = bool(jnp.isfinite(max_delta32) & (max_delta32 < f32_tol))
    if not done32:
        f_start = f32_out if it32 else f32_0
        f32_out, it32b, sci, nr, max_delta32, done32 = _adaptive_while(
            u_hi,
            N_k32,
            f_start,
            jnp.asarray(gamma, jnp.float32),
            jnp.asarray(f32_tol, jnp.float32),
            f32_maxiter,
            2,
            "chol",
            "mixed",
        )
        it32 += int(it32b)
        done32 = bool(done32)
    f64 = f32_out.astype(jnp.float64)
    f64 = (f64 - f64[0]).block_until_ready()
    t_phase1 = time.time() - t_phase1
    t_phase2 = time.time()

    # ---- phase 2: double-word Newton polish on the wsum kernel.
    # One fused pass per iteration produces S_k = sum_n N_k W_nk in dd; the
    # gradient is g_k = S_k - N_k exactly (no log/exp roundtrip) and the
    # chord-Newton step uses the frozen Cholesky factor of the f32-Gram
    # Hessian.  The frozen factor contracts ~1e-2 per iteration all the way
    # to the ~1e-12 delta floor (measured; refreshing it mid-polish does not
    # improve the rate — the f32 Gram's accuracy is the limit — so no
    # refresh pass is spent).
    logN = jnp.log(N_k64)
    gamma64 = jnp.asarray(gamma, jnp.float64)
    it = 0
    max_delta = np.inf
    prev_delta = np.inf
    converged = False
    at_noise_floor = False
    g64 = None
    deltas = []
    _wsum = functools.partial(wsum_dd, fast=fast_exp) if on_tpu() else wsum_dd_ref

    for it in range(1, polish_maxiter + 1):
        gh, gl = dd_from_f64(f64 + logN)
        Sh, Sl = _wsum(u_hi, u_lo, gh, gl)
        g64 = dd_to_f64(Sh, Sl) - N_k64

        if cho is None:
            # No coarse phase ran (small N): factor from the full plane.
            gram, colsum = gram_f32_acc64(
                u_hi, N_k64.astype(jnp.float32), f64.astype(jnp.float32)
            )
            cho = _newton_factor(gram, colsum, N_k64)
        f_new = _newton_step_g(f64, g64, cho, gamma64)

        f_new_np = np.asarray(f_new)
        f_old_np = np.asarray(f64)
        # mixed metric (see _adaptive_metrics): absolute for small |f_k|
        div = np.maximum(np.abs(f_new_np[1:]), 1.0)
        max_delta = float(np.max(np.abs(f_new_np[1:] - f_old_np[1:]) / div))
        deltas.append(max_delta)
        f64 = f_new
        if max_delta < tol:
            converged = True
            break
        # The dd kernel's ~1e-13 relative noise in S_k bounds the reachable
        # per-iteration delta at ~1e-13 (df ~ H^-1 g_noise ~ g_noise / N_k);
        # once Newton stops contracting near that floor the iterate is as
        # converged as the arithmetic allows (docs/numerics.md derivation).
        stalled = it >= 2 and max_delta < 1.0e-9 and max_delta > 0.3 * prev_delta
        tiny = max_delta < 3.0e-13
        # Predictive stop: with steady contraction r = delta/prev, the next
        # step would be ~ delta * r; below the noise floor the next kernel
        # pass would only confirm convergence.
        predicted_next = (
            max_delta * max_delta / prev_delta if np.isfinite(prev_delta) else np.inf
        )
        if stalled or tiny or predicted_next < 1.0e-14:
            converged = True
            at_noise_floor = True
            break
        prev_delta = max_delta

    gnorm = float(np.linalg.norm(np.asarray(g64))) if g64 is not None else np.nan
    return np.asarray(f64), dict(
        converged=converged,
        at_noise_floor=at_noise_floor,
        f32_iterations=int(it32),
        f32_coarse_iterations=it32_coarse,
        f32_converged=bool(done32),
        polish_iterations=it,
        max_delta=max_delta,
        deltas=deltas,
        gnorm=gnorm,
        phase1_s=t_phase1,
        phase2_s=time.time() - t_phase2,
    )
