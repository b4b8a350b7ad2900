"""Sample-axis sharding of the MBAR solve over a device mesh.

The MBAR math is pure map-reduce over the sample axis n (SURVEY.md §5):

* ``log_denominator_n`` is embarrassingly parallel over n,
* the per-state reductions (logsumexp over n, W^T W, colsum W) finish with a
  single ``psum`` over the mesh axis,
* only K-sized vectors (f_k) are ever replicated.

We express the solve with NamedSharding + jit: u_kn carries a sharding on its
n axis, the functions in :mod:`pymbar_tpu.ops.mbar_core` are
sharding-transparent, and XLA inserts the all-reduces over ICI.  shard_map
variants are provided for the reductions where explicit collectives give
tighter control.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "default_mesh",
    "shard_u_kn",
    "sharded_log_denominator",
    "sharded_core_stats",
    "sharded_gram",
    "sharded_solve_mbar",
]


def default_mesh(n_devices=None, axis_name="n"):
    """1-D mesh over the first n_devices devices, for sample-axis sharding."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_u_kn(u_kn, mesh, axis_name="n"):
    """Place u_kn with its sample axis sharded over the mesh.

    Pads n up to a multiple of the mesh size with +inf columns — exp(-inf)
    contributes exactly 0 to every reduction, so results are unchanged.
    Returns (u_sharded, n_pad).
    """
    u_kn = np.asarray(u_kn)
    n_dev = mesh.devices.size
    K, N = u_kn.shape
    n_pad = (-N) % n_dev
    if n_pad:
        u_kn = np.concatenate(
            [u_kn, np.full((K, n_pad), np.inf, dtype=u_kn.dtype)], axis=1
        )
    sharding = NamedSharding(mesh, P(None, axis_name))
    return jax.device_put(u_kn, sharding), n_pad


def _replicated(x, mesh):
    return jax.device_put(jnp.asarray(x), NamedSharding(mesh, P()))


def sharded_log_denominator(u_kn_sharded, N_k, f_k, mesh, axis_name="n"):
    """Per-sample log-normalizer with the n axis sharded.

    Explicit shard_map version: each device reduces its own K x (N/n_dev)
    slab along K; no collective is needed (the output stays n-sharded).
    """

    def local(u_local, N_k, f_k):
        a = f_k[:, None] - u_local
        a_max = jnp.max(a, axis=0)
        a_max = jnp.where(jnp.isfinite(a_max), a_max, 0.0)
        s = jnp.sum(N_k[:, None] * jnp.exp(a - a_max[None, :]), axis=0)
        # Pad columns (u = +inf everywhere) would give log(0) = -inf; zero
        # them so downstream sums are unaffected.
        pad = ~jnp.isfinite(u_local[0, :])
        return jnp.where(pad, 0.0, jnp.log(s) + a_max)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis_name), P(), P()),
        out_specs=P(axis_name),
    )
    return fn(u_kn_sharded, _replicated(N_k, mesh), _replicated(f_k, mesh))


def sharded_core_stats(u_kn_sharded, N_k, f_k, mesh, axis_name="n"):
    """(objective, gradient, f_sci) with psum-finished per-state reductions.

    Each device computes its slab's contribution to sum_n logden_n and to the
    per-state logsumexp over n; the cross-device combine is one pmax (for the
    stable shift) plus one psum, all over ICI.
    """

    def local(u_local, N_k, f_k):
        # local log denominator; pad columns (u = +inf) contribute exactly 0
        a = f_k[:, None] - u_local
        a_max = jnp.max(a, axis=0)
        a_max = jnp.where(jnp.isfinite(a_max), a_max, 0.0)
        logden = jnp.log(jnp.sum(N_k[:, None] * jnp.exp(a - a_max[None, :]), axis=0)) + a_max
        pad = ~jnp.isfinite(u_local[0, :])
        logden = jnp.where(pad, 0.0, logden)

        obj_local = jnp.sum(logden)
        obj = jax.lax.psum(obj_local, axis_name) - jnp.dot(N_k, f_k)

        # per-state logsumexp over the sharded n axis: global max via pmax,
        # then psum of the rescaled partial sums.
        b = -logden[None, :] - u_local  # (K, N_local)
        b_max_local = jnp.max(b, axis=1)
        b_max = jax.lax.pmax(b_max_local, axis_name)
        b_max = jnp.where(jnp.isfinite(b_max), b_max, 0.0)
        s = jax.lax.psum(jnp.sum(jnp.exp(b - b_max[:, None]), axis=1), axis_name)
        lognum = jnp.log(s) + b_max

        grad = -N_k * (1.0 - jnp.exp(f_k + lognum))
        f_sci = -lognum
        return obj, grad, f_sci

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis_name), P(), P()),
        out_specs=(P(), P(), P()),
    )
    return fn(u_kn_sharded, _replicated(N_k, mesh), _replicated(f_k, mesh))


def sharded_gram(u_kn_sharded, N_k, f_k, mesh, axis_name="n"):
    """(W^T W, colsum W) with per-device K x K partial Grams psum-reduced.

    The N x K weight matrix never exists globally: each device forms its
    local K x (N/n_dev) slab of W and contracts it on the MXU; the K x K
    partials are all-reduced.
    """

    def local(u_local, N_k, f_k):
        a = f_k[:, None] - u_local
        a_max = jnp.max(a, axis=0)
        a_max = jnp.where(jnp.isfinite(a_max), a_max, 0.0)
        logden = jnp.log(jnp.sum(N_k[:, None] * jnp.exp(a - a_max[None, :]), axis=0)) + a_max
        pad = ~jnp.isfinite(u_local[0, :])
        logden = jnp.where(pad, 0.0, logden)
        w = jnp.exp(f_k[:, None] - u_local - logden[None, :])
        gram_local = jnp.dot(w, w.T, preferred_element_type=w.dtype)
        colsum_local = jnp.sum(w, axis=1)
        return (
            jax.lax.psum(gram_local, axis_name),
            jax.lax.psum(colsum_local, axis_name),
        )

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis_name), P(), P()),
        out_specs=(P(), P()),
    )
    return fn(u_kn_sharded, _replicated(N_k, mesh), _replicated(f_k, mesh))


def sharded_adaptive_step(u_kn_sharded, N_k, f_k, gamma, mesh, axis_name="n"):
    """One adaptive iteration's candidates on the sharded problem."""
    _, g, f_sci = sharded_core_stats(u_kn_sharded, N_k, f_k, mesh, axis_name)
    gram, colsum = sharded_gram(u_kn_sharded, N_k, f_k, mesh, axis_name)
    N_k = jnp.asarray(N_k, dtype=g.dtype)
    H = -(gram * N_k[None, :] * N_k[:, None] - jnp.diag(colsum * N_k))
    Hinvg = jnp.linalg.lstsq(H, g, rcond=-1)[0]
    Hinvg -= Hinvg[0]
    f_nr = f_k - gamma * Hinvg
    f_sci = f_sci - f_sci[0]

    _, g_sci, _ = sharded_core_stats(u_kn_sharded, N_k, f_sci, mesh, axis_name)
    _, g_nr, _ = sharded_core_stats(u_kn_sharded, N_k, f_nr, mesh, axis_name)
    return f_sci, g_sci, jnp.dot(g_sci, g_sci), f_nr, g_nr, jnp.dot(g_nr, g_nr)


def sharded_solve_mbar(
    u_kn,
    N_k,
    f_k=None,
    mesh=None,
    tol=1.0e-12,
    maxiter=10000,
    min_sc_iter=2,
    gamma=1.0,
    axis_name="n",
):
    """Full adaptive MBAR solve with u_kn sharded along n across the mesh.

    Host-orchestrated iteration loop (one fused sharded step per iteration);
    all heavy reductions ride ICI collectives.  Returns (f_k, info dict).
    All states must have samples (empty-state fill is the caller's job, as in
    solve_mbar_for_all_states).
    """
    if mesh is None:
        mesh = default_mesh()

    u_kn = np.asarray(u_kn, dtype=np.float64)
    K = u_kn.shape[0]
    N_k = np.asarray(N_k, dtype=np.float64)
    f_k = np.zeros(K) if f_k is None else np.asarray(f_k, dtype=np.float64)
    f_k = f_k - f_k[0]

    u_sharded, _ = shard_u_kn(u_kn, mesh, axis_name)
    f = jnp.asarray(f_k)

    # Precondition: u -= min_k u (per sample, local), then shift so obj ~ 0.
    min_fn = jax.jit(lambda u: u - jnp.min(u, axis=0)[None, :])
    u_sharded = min_fn(u_sharded)
    logden = sharded_log_denominator(u_sharded, N_k, f, mesh, axis_name)
    shift_fn = jax.jit(lambda u, d, c: u + (d - c)[None, :])
    u_sharded = shift_fn(u_sharded, logden, jnp.dot(jnp.asarray(N_k), f) / N_k.sum())

    sci_iter = 0
    converged = False
    it = 0
    max_delta = np.inf
    for it in range(1, maxiter + 1):
        f_sci, g_sci, gn_sci, f_nr, g_nr, gn_nr = sharded_adaptive_step(
            u_sharded, N_k, f, gamma, mesh, axis_name
        )
        take_sci = bool(gn_sci < gn_nr) or sci_iter < min_sc_iter
        f_old = np.asarray(f)
        f = f_sci if take_sci else f_nr
        sci_iter += int(take_sci)

        f_new = np.asarray(f)
        div = np.abs(f_new[1:])
        div[div < min(1.0e-8, tol)] = 1.0
        max_delta = np.max(np.abs(f_new[1:] - f_old[1:]) / div)
        max_diff = np.max(np.abs(np.asarray(f_sci)[1:] - np.asarray(f_nr)[1:]) / div)
        if np.isnan(max_delta) or (max_delta < tol and max_diff < np.sqrt(tol)):
            converged = True
            break

    _, g, _ = sharded_core_stats(u_sharded, N_k, f, mesh, axis_name)
    return np.asarray(f), dict(
        success=converged,
        iterations=it,
        max_delta=float(max_delta),
        gnorm=float(np.linalg.norm(np.asarray(g))),
    )


# -----------------------------------------------------------------------------
# 2-D (K x N) mesh: for state counts too large for a single chip's VMEM/HBM
# (SURVEY.md §5: K >= 4096 stress configs).  States shard over 'k', samples
# over 'n'; the per-sample mixture reduction finishes with pmax+psum over
# 'k', the per-state reductions over 'n'.
# -----------------------------------------------------------------------------


def mesh_2d(k_devices, n_devices, axis_names=("k", "n")):
    """2-D mesh: first axis shards states, second shards samples."""
    devices = np.asarray(jax.devices()[: k_devices * n_devices]).reshape(
        k_devices, n_devices
    )
    return Mesh(devices, axis_names)


def shard_u_kn_2d(u_kn, N_k, f_k, mesh):
    """Place u_kn on a 2-D mesh, padding K and N to the mesh shape.

    Pad rows get u = +inf and N_k = 0 (their exp terms vanish exactly under
    the pad masking in the local kernels); pad columns get u = +inf.
    Returns (u_sharded, N_k_padded, f_k_padded, (k_pad, n_pad)).
    """
    u_kn = np.asarray(u_kn)
    K, N = u_kn.shape
    kd, nd = mesh.devices.shape
    k_pad = (-K) % kd
    n_pad = (-N) % nd
    if k_pad or n_pad:
        u_kn = np.pad(u_kn, ((0, k_pad), (0, n_pad)), constant_values=np.inf)
    N_k = np.pad(np.asarray(N_k, dtype=np.float64), (0, k_pad))
    f_k = np.pad(np.asarray(f_k, dtype=np.float64), (0, k_pad))
    sharding = NamedSharding(mesh, P("k", "n"))
    return jax.device_put(u_kn, sharding), N_k, f_k, (k_pad, n_pad)


def sharded2d_core_stats(u_sharded, N_k, f_k, mesh):
    """(objective, gradient, f_sci) on a 2-D (k, n) mesh.

    Collective pattern: logden needs the FULL state mixture per sample —
    pmax then psum over 'k'; the per-state reductions (lognum, objective)
    finish over 'n'.  K-sized outputs come back k-sharded and are gathered
    by the host on materialization.
    """

    def local(u_local, N_k_local, f_local):
        pad_col = ~jnp.isfinite(u_local[0, :])

        # --- log denominator: partial over the local k-block, then 'k'
        a = f_local[:, None] - u_local
        a = jnp.where(jnp.isfinite(a), a, -jnp.inf)
        m_loc = jnp.max(a, axis=0)
        m = jax.lax.pmax(m_loc, "k")
        m = jnp.where(jnp.isfinite(m), m, 0.0)
        s = jax.lax.psum(
            jnp.sum(N_k_local[:, None] * jnp.exp(a - m[None, :]), axis=0), "k"
        )
        logden = jnp.log(s) + m
        logden = jnp.where(pad_col, 0.0, logden)

        obj_local = jnp.sum(logden)
        # logden is replicated across the 'k' axis after the psum; the pmean
        # over 'k' is exact (identical values) and makes the replication
        # statically provable for shard_map's out_specs check.
        obj = jax.lax.pmean(jax.lax.psum(obj_local, "n"), "k") - jax.lax.psum(
            jnp.dot(N_k_local, f_local), "k"
        )

        # --- per-state logsumexp over the sharded n axis
        b = -logden[None, :] - u_local
        b = jnp.where(jnp.isfinite(b), b, -jnp.inf)
        bm_loc = jnp.max(b, axis=1)
        bm = jax.lax.pmax(bm_loc, "n")
        bm = jnp.where(jnp.isfinite(bm), bm, 0.0)
        sb = jax.lax.psum(jnp.sum(jnp.exp(b - bm[:, None]), axis=1), "n")
        lognum = jnp.log(sb) + bm

        grad = -N_k_local * (1.0 - jnp.exp(f_local + lognum))
        f_sci = -lognum
        return obj, grad, f_sci

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("k", "n"), P("k"), P("k")),
        out_specs=(P(), P("k"), P("k")),
    )
    N_sh = jax.device_put(jnp.asarray(N_k), NamedSharding(mesh, P("k")))
    f_sh = jax.device_put(jnp.asarray(f_k), NamedSharding(mesh, P("k")))
    return fn(u_sharded, N_sh, f_sh)


def sharded2d_solve_mbar(
    u_kn,
    N_k,
    f_k=None,
    mesh=None,
    tol=1.0e-12,
    maxiter=2000,
    m_history=5,
):
    """Anderson-accelerated MBAR solve on a 2-D (k, n) mesh.

    Hessian-free by design: at K >= 4096 the K x K Gram across k-shards
    would need ring collectives, while Anderson mixing needs only the SC
    fixed-point map (one fused sharded pass pair per iteration) plus O(K m)
    host algebra.  All states must have samples.
    """
    if mesh is None:
        raise ValueError("sharded2d_solve_mbar requires an explicit 2-D mesh")

    u_kn = np.asarray(u_kn, dtype=np.float64)
    K = u_kn.shape[0]
    N_k_in = np.asarray(N_k, dtype=np.float64)
    f0 = np.zeros(K) if f_k is None else np.asarray(f_k, dtype=np.float64)
    f0 = f0 - f0[0]

    u_sh, N_pad, f_pad, (k_pad, n_pad) = shard_u_kn_2d(u_kn, N_k_in, f0, mesh)
    Kp = len(N_pad)

    def sc(fv):
        # pad states carry N_k = 0: they never enter the denominator; their
        # f_sci values are ignored (re-pinned below).
        _, _, f_sci = sharded2d_core_stats(u_sh, N_pad, fv, mesh)
        f_sci = np.asarray(f_sci, dtype=np.float64)
        return f_sci - f_sci[0]

    f = f_pad.copy()
    hist_x, hist_r = [], []
    success = False
    max_delta = np.inf
    it = 0
    for it in range(1, maxiter + 1):
        gx = sc(f)
        gx[K:] = 0.0  # pad states
        r = gx - f
        hist_x.append(gx)
        hist_r.append(r)
        if len(hist_x) > m_history:
            hist_x.pop(0)
            hist_r.pop(0)

        if len(hist_r) > 1:
            R = np.stack(hist_r, axis=1)
            dR = R[:, :-1] - R[:, -1:]
            try:
                gamma_c, *_ = np.linalg.lstsq(dR, R[:, -1], rcond=None)
                alpha = np.concatenate([-gamma_c, [1.0 + np.sum(gamma_c)]])
                f_new = np.stack(hist_x, axis=1) @ alpha
            except np.linalg.LinAlgError:
                f_new = gx
        else:
            f_new = gx
        f_new = f_new - f_new[0]
        f_new[K:] = 0.0

        div = np.abs(f_new[1:K])
        div[div < min(1.0e-8, tol)] = 1.0
        max_delta = float(np.max(np.abs(f_new[1:K] - f[1:K]) / div))
        f = f_new
        if max_delta < tol:
            success = True
            break

    _, g, _ = sharded2d_core_stats(u_sh, N_pad, f, mesh)
    g = np.asarray(g)[:K]
    return np.asarray(f[:K]), dict(
        success=success,
        iterations=it,
        max_delta=max_delta,
        gnorm=float(np.linalg.norm(g)),
    )
