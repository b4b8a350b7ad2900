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

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pymbar_tpu.solvers import host_adaptive_metrics

__all__ = [
    "default_mesh",
    "shard_u_kn",
    "sharded_log_denominator",
    "sharded_core_stats",
    "sharded_gram",
    "sharded2d_gram",
    "sharded_solve_mbar",
    "shard_dd_planes",
    "sharded_fused_lognum_dd",
    "sharded_wsum_dd",
    "sharded_solve_mbar_dd",
    "sharded_bootstrap_polish_dd",
    "shard_dd_planes_2d",
    "sharded2d_wsum_dd",
    "sharded2d_solve_mbar_dd",
    "sharded_solve_mbar_for_all_states",
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


def _is_pad_col(u_local, k_axis=None):
    """Pad-column mask: +inf pads (f64 path) or finite +PAD dd sentinels.

    A column is padding only when EVERY row carries the sentinel (tested
    via the column min; pass ``k_axis`` inside a 2-D shard_map so the min
    spans ALL k-blocks, not just the local one).  The rule is
    dtype-dependent:

    * f64 inputs are the raw user paths, padded with +inf and NOT
      preconditioned — only a whole-column +inf is padding.  A column that
      is merely huge in every state (an all-state clash) is kept, and a
      NaN anywhere propagates loudly instead of silently dropping the
      sample (matching the unsharded reductions).
    * f32 inputs are double-word hi planes: finite ~1e10 sentinels (dd
      error-free transforms cannot carry ±inf) on per-column-min
      preconditioned potentials, so real columns sit at col_min ~ 0 and
      the 5e9 threshold is unambiguous.
    """
    col_min = jnp.min(u_local, axis=0)
    if k_axis is not None:
        col_min = jax.lax.pmin(col_min, k_axis)
    if u_local.dtype == jnp.float64:
        return col_min == jnp.inf
    return jnp.logical_or(
        ~jnp.isfinite(col_min), col_min >= jnp.asarray(5.0e9, col_min.dtype)
    )


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
        pad = _is_pad_col(u_local)
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
        pad = _is_pad_col(u_local)
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


def sharded_gram(u_kn_sharded, N_k, f_k, mesh, axis_name="n", precision=None):
    """(W^T W, colsum W) with per-device K x K partial Grams psum-reduced.

    The N x K weight matrix never exists globally: each device forms its
    local K x (N/n_dev) slab of W and contracts it on the MXU; the K x K
    partials are all-reduced.  ``precision`` sets the TPU MXU pass count
    (default HIGHEST, ~2e-6 relative, for read-out quantities; the
    adaptive solve loop passes DEFAULT — its Gram only steers a Newton
    direction and single-pass bf16 was measured iteration-count-neutral).
    """
    if precision is None:
        precision = jax.lax.Precision.HIGHEST

    def local(u_local, N_k, f_k):
        a = f_k[:, None] - u_local
        a_max = jnp.max(a, axis=0)
        a_max = jnp.where(jnp.isfinite(a_max), a_max, 0.0)
        logden = jnp.log(jnp.sum(N_k[:, None] * jnp.exp(a - a_max[None, :]), axis=0)) + a_max
        pad = _is_pad_col(u_local)
        logden = jnp.where(pad, 0.0, logden)
        w = jnp.exp(f_k[:, None] - u_local - logden[None, :])
        gram_local = jnp.dot(
            w, w.T, preferred_element_type=w.dtype,
            precision=precision,
        )
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


def sharded_adaptive_step(
    u_kn_sharded, N_k, f_k, gamma, mesh, axis_name="n", nr_method="lstsq"
):
    """One adaptive iteration's candidates on the sharded problem.

    nr_method "lstsq" matches the reference Newton step; "chol" solves the
    reduced PSD system H[1:, 1:] by Cholesky — equivalent up to the f_0 = 0
    gauge and the only option on hardware whose compiler lacks a stable SVD
    (the axon TPU compile helper aborts on lstsq's SVD kernel).
    """
    _, g, f_sci = sharded_core_stats(u_kn_sharded, N_k, f_k, mesh, axis_name)
    # Newton-direction-only Gram: DEFAULT MXU precision (see sharded_gram).
    gram, colsum = sharded_gram(
        u_kn_sharded, N_k, f_k, mesh, axis_name,
        precision=jax.lax.Precision.DEFAULT,
    )
    N_k = jnp.asarray(N_k, dtype=g.dtype)
    H = -(gram * N_k[None, :] * N_k[:, None] - jnp.diag(colsum * N_k))
    if nr_method == "chol":
        c = jax.scipy.linalg.cho_factor(H[1:, 1:])
        dx1 = jax.scipy.linalg.cho_solve((c[0], bool(c[1])), g[1:])
        Hinvg = jnp.concatenate([jnp.zeros((1,), dtype=g.dtype), dx1])
    else:
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

        max_delta, max_diff = host_adaptive_metrics(f, f_old, f_sci, f_nr, tol)
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
        pad_col = _is_pad_col(u_local, k_axis="k")

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


def _chunked_w_gram(w, c=None):
    """(W diag(c) W^T, rowsum cW) of a local f32 weight slab: f32 MXU
    matmuls with f64 chunk accumulation (c = 1 when None — the plain Gram).
    A fori-loop carry does not compose with shard_map's varying axes, so
    the chunking is by reshape; shared by the 1-D and 2-D sharded Gram
    passes and the weighted bootstrap-replicate factor."""
    K_l, N_l = w.shape
    wv = w if c is None else w * c[None, :]
    C = 8
    n_pad = (-N_l) % C
    if n_pad:
        w = jnp.pad(w, ((0, 0), (0, n_pad)))
        wv = jnp.pad(wv, ((0, 0), (0, n_pad)))
    wc = w.reshape(K_l, C, -1)
    wvc = wv.reshape(K_l, C, -1)
    g = jnp.einsum(
        "kcn,jcn->ckj", wvc, wc, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    gram = jnp.sum(g.astype(jnp.float64), axis=0)
    colsum = jnp.sum(wv.astype(jnp.float64), axis=1)
    return gram, colsum


def _chunked_pair_gram(a, b):
    """a @ b^T of two local f32 slabs with f64 chunk accumulation (the
    asymmetric twin of :func:`_chunked_w_gram`, for ring Gram tiles)."""
    K_a, N_l = a.shape
    C = 8
    n_pad = (-N_l) % C
    if n_pad:
        a = jnp.pad(a, ((0, 0), (0, n_pad)))
        b = jnp.pad(b, ((0, 0), (0, n_pad)))
    ac = a.reshape(K_a, C, -1)
    bc = b.reshape(b.shape[0], C, -1)
    g = jnp.einsum(
        "kcn,jcn->ckj", ac, bc, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.sum(g.astype(jnp.float64), axis=0)


def sharded2d_gram(u_sharded, N_k, f_k, mesh):
    """(W^T W, colsum W) on a 2-D (k, n) mesh — the chord-factor pass,
    GATHERLESS: a collective-permute ring over the k axis.

    Each device forms its local (K_loc, N_loc) W block from the psum-'k'
    log denominator.  A rotating copy of the block then ppermutes around
    the k-ring: at step t, device i holds the block of device (i + t) mod
    D_k and contracts its own block against the visitor into one
    (K_loc, K_loc) f64 Gram tile — after D_k steps each device owns its
    full (K_loc, K) row-block of the Gram, which psums over 'n' and
    assembles via the 'k'-sharded output spec.  Peak transient per device
    is 2 x K_loc x N_loc (own + visiting block) instead of the previous
    all_gather's K x N_loc — at the BASELINE stress shape (K=4096,
    N=1e7, 2x4 mesh, stride-16 subsample) that is ~1.3 GB instead of
    ~10 GB (see docs/scaling.md).  The ring traffic totals the same bytes
    as the gather but is pipelined step-by-step against the MXU tiles.
    Works on f32 hi planes with +PAD sentinels.
    """
    Dk = mesh.shape["k"]

    def local(u_local, N_k_local, f_local):
        pad_col = _is_pad_col(u_local, k_axis="k")
        a = f_local[:, None] - u_local  # pads: f=0, u=+PAD -> exp -> 0
        m_loc = jnp.max(a, axis=0)
        m = jax.lax.pmax(m_loc, "k")
        m = jnp.where(jnp.isfinite(m) & (m > -1.0e30), m, 0.0)
        s = jax.lax.psum(
            jnp.sum(N_k_local[:, None] * jnp.exp(a - m[None, :]), axis=0), "k"
        )
        logden = jnp.log(s) + m
        logden = jnp.where(pad_col, 0.0, logden)
        w = jnp.exp(f_local[:, None] - u_local - logden[None, :])
        w = jnp.where(pad_col[None, :], jnp.zeros((), w.dtype), w)

        perm = [(i, (i - 1) % Dk) for i in range(Dk)]
        tiles = []
        rot = w
        for t in range(Dk):
            # rot holds the W block of device (my_k + t) mod Dk
            tiles.append(_chunked_pair_gram(w, rot))
            if t < Dk - 1:
                rot = jax.lax.ppermute(rot, "k", perm)
        stacked = jnp.stack(tiles, axis=0)  # (Dk, K_loc, K_loc)
        # Tile t belongs at column block j = (my_k + t) mod Dk:
        # roll by my_k gives rolled[j] = stacked[(j - my_k) mod Dk].
        my_k = jax.lax.axis_index("k")
        rolled = jnp.roll(stacked, my_k, axis=0)
        row_block = rolled.transpose(1, 0, 2).reshape(w.shape[0], -1)  # (K_loc, K)
        row_block = jax.lax.psum(row_block, "n")
        colsum = jax.lax.psum(jnp.sum(w.astype(jnp.float64), axis=1), "n")
        return row_block, colsum

    gram, colsum = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("k", "n"), P("k"), P("k")),
        out_specs=(P("k", None), P("k")),
    )(
        u_sharded,
        jax.device_put(jnp.asarray(N_k), NamedSharding(mesh, P("k"))),
        jax.device_put(jnp.asarray(f_k), NamedSharding(mesh, P("k"))),
    )
    return gram, colsum


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

        max_delta, _ = host_adaptive_metrics(
            f_new[:K], f[:K], f_new[:K], f_new[:K], tol
        )
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


# ---------------------------------------------------------------------------
# Double-word (two-float32) sharded solve: the production TPU-pod path.
# ---------------------------------------------------------------------------


def shard_dd_planes(u_hi, u_lo, mesh, axis_name="n"):
    """Place double-word (hi, lo) planes with the sample axis sharded.

    Pads n to a multiple of the mesh size with finite +PAD sentinel columns
    (±inf must never enter an error-free transform — doubledouble.py); the
    fused dd kernels mask sentinel columns to exactly zero contribution.
    Returns (u_hi_sharded, u_lo_sharded, n_pad).
    """
    from pymbar_tpu.ops.pallas_kernels import _PAD_U

    u_hi = np.asarray(u_hi, dtype=np.float32)
    u_lo = np.asarray(u_lo, dtype=np.float32)
    n_dev = mesh.devices.size
    K, N = u_hi.shape
    n_pad = (-N) % n_dev
    if n_pad:
        u_hi = np.concatenate(
            [u_hi, np.full((K, n_pad), _PAD_U, dtype=np.float32)], axis=1
        )
        u_lo = np.concatenate(
            [u_lo, np.zeros((K, n_pad), dtype=np.float32)], axis=1
        )
    sharding = NamedSharding(mesh, P(None, axis_name))
    return (
        jax.device_put(u_hi, sharding),
        jax.device_put(u_lo, sharding),
        n_pad,
    )


def _dd_combine_partials(sh, sl):
    """Exactly combine (D, K) stacked dd partial sums along axis 0.

    The stacked partials are K-sized per device — pull them off the mesh
    first (eager dd arithmetic directly on a cross-device-sharded array
    aborts on the CPU backend) and combine replicated.
    """
    from pymbar_tpu.ops.doubledouble import dd_add

    sh = jnp.asarray(jax.device_get(sh))
    sl = jnp.asarray(jax.device_get(sl))
    h, l = sh[0], sl[0]
    for d in range(1, sh.shape[0]):
        h, l = dd_add(h, l, sh[d], sl[d])
    return h, l


def sharded_fused_lognum_dd(u_hi_s, u_lo_s, g_hi, g_lo, m_k, mesh, axis_name="n", fast=True):
    """lognum over an n-sharded dd matrix: per-device fused pass, dd merge.

    Each device runs the fused logden->lognum kernel on its local slab
    (Pallas on TPU, the jnp reference elsewhere) returning raw dd partial
    sums; the (D, K) partials merge with exact dd adds on the host side of
    the shard_map, and a single log finishes.  Communication: one K-sized
    all-gather per call.
    """
    from pymbar_tpu.config import on_tpu
    from pymbar_tpu.ops.doubledouble import two_sum
    from pymbar_tpu.ops.pallas_kernels import (
        dd_log_pos,
        lognum_fused_dd,
        lognum_fused_dd_ref,
    )
    if on_tpu():
        local = lambda uh, ul: lognum_fused_dd(
            uh, ul, g_hi, g_lo, m_k, fast=fast, return_sums=True
        )
    else:
        local = lambda uh, ul: lognum_fused_dd_ref(
            uh, ul, g_hi, g_lo, m_k, return_sums=True
        )

    def body(uh, ul):
        sh, sl = local(uh, ul)
        return sh[None, :], sl[None, :]

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, axis_name), P(None, axis_name)),
        out_specs=(P(axis_name, None), P(axis_name, None)),
        # pallas_call's ShapeDtypeStruct out_shape carries no vma metadata;
        # the varying-axis checker rejects it (jnp ref path is unaffected)
        check_vma=False,
    )
    sh, sl = fn(u_hi_s, u_lo_s)  # (D, K) stacked partials
    h, l = _dd_combine_partials(sh, sl)
    lh, ll = dd_log_pos(h, l)
    t_hi, t_e = two_sum(lh, m_k)
    return t_hi, ll + t_e


def sharded_wsum_dd(u_hi_s, u_lo_s, g_hi, g_lo, mesh, axis_name="n", fast=True, c=None):
    """S_k = sum_n c_n N_k W_nk over an n-sharded dd matrix.

    Each device runs the one-exp-per-element wsum kernel on its local slab
    (Pallas on TPU, the jnp reference elsewhere); the per-device (K,) dd
    partial sums merge with exact dd adds.  Pad columns are masked inside
    the kernels.  ``c`` optionally supplies per-sample resample counts,
    sharded along the same axis as the planes (bootstrap replicates —
    see :func:`sharded_bootstrap_polish_dd`).  Communication: one K-sized
    all-gather per call.
    """
    from pymbar_tpu.config import on_tpu
    from pymbar_tpu.ops.pallas_kernels import wsum_dd, wsum_dd_ref

    if on_tpu():
        local = lambda uh, ul, cc: wsum_dd(uh, ul, g_hi, g_lo, c=cc, fast=fast)
    else:
        local = lambda uh, ul, cc: wsum_dd_ref(uh, ul, g_hi, g_lo, c=cc)

    if c is None:

        def body(uh, ul):
            sh, sl = local(uh, ul, None)
            return sh[None, :], sl[None, :]

        in_specs = (P(None, axis_name), P(None, axis_name))
        args = (u_hi_s, u_lo_s)
    else:

        def body(uh, ul, cc):
            sh, sl = local(uh, ul, cc)
            return sh[None, :], sl[None, :]

        in_specs = (P(None, axis_name), P(None, axis_name), P(axis_name))
        args = (u_hi_s, u_lo_s, c)

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(axis_name, None), P(axis_name, None)),
        # pallas_call's ShapeDtypeStruct out_shape carries no vma metadata;
        # the varying-axis checker rejects it (jnp ref path is unaffected)
        check_vma=False,
    )
    sh, sl = fn(*args)  # (D, K) stacked partials
    return _dd_combine_partials(sh, sl)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "axis_name", "maxiter", "fast"),
)
def _sharded_polish_while_dd(
    u_hi_s, u_lo_s, N_k64, f0, hinv, logN, tol, gamma,
    mesh, axis_name, maxiter, fast,
):
    """The n-sharded dd Newton polish as ONE device while_loop (the sharded
    twin of :func:`pymbar_tpu.solvers_large._polish_while_dd`)."""
    from pymbar_tpu.solvers_large import _polish_loop

    def _wsum(uh, ul, gh, gl):
        return sharded_wsum_dd(uh, ul, gh, gl, mesh, axis_name, fast=fast)

    return _polish_loop(
        _wsum, u_hi_s, u_lo_s, N_k64, f0, hinv, logN, tol, gamma,
        maxiter,
    )


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "axis_name", "maxiter", "fast"),
)
def _sharded_polish_while_dd_w(
    u_hi_s, u_lo_s, c_s, N_k64, f0, hinv, logN, tol, gamma,
    mesh, axis_name, maxiter, fast,
):
    """Counts-weighted n-sharded dd Newton polish (bootstrap replicates):
    the sharded twin of :func:`pymbar_tpu.solvers_large._polish_while_dd_w`.
    ``c_s`` is the (N_padded,) f32 resample-count vector sharded along the
    same axis as the planes (pad columns carry count 0)."""
    from pymbar_tpu.solvers_large import _polish_loop

    def _wsum(uh, ul, gh, gl):
        return sharded_wsum_dd(uh, ul, gh, gl, mesh, axis_name, fast=fast, c=c_s)

    return _polish_loop(
        _wsum, u_hi_s, u_lo_s, N_k64, f0, hinv, logN, tol, gamma, maxiter
    )


def _sharded_gram(u_hi_s, N_k32, f32_val, mesh, axis_name="n", c_s=None):
    """f32 Gram on an n-sharded hi plane: (W diag(c) W^T, sum_n c_n W_nk),
    psum-combined; ``c_s`` optionally supplies n-sharded per-sample counts
    (the counts-weighted form is a bootstrap replicate's Gram — it supplies
    the fallback chord factor when the base-factor polish fails to
    contract; c_s=None is the plain chord factor of the 1-D dd solve)."""

    def _local(uh, fv, cc=None):
        from pymbar_tpu.ops.mbar_core import _logden_direct

        ld = _logden_direct(uh, N_k32, fv)
        pad = _is_pad_col(uh)
        ld = jnp.where(pad, jnp.float32(0.0), ld)
        w = jnp.exp(fv[:, None] - uh - ld[None, :])
        w = jnp.where(pad[None, :], jnp.float32(0.0), w)
        gram, colsum = _chunked_w_gram(w, cc)
        return gram[None], colsum[None]

    out_specs = (P(axis_name, None, None), P(axis_name, None))
    if c_s is None:
        g_parts, c_parts = jax.shard_map(
            _local, mesh=mesh,
            in_specs=(P(None, axis_name), P()), out_specs=out_specs,
        )(u_hi_s, _replicated(f32_val, mesh))
    else:
        g_parts, c_parts = jax.shard_map(
            _local, mesh=mesh,
            in_specs=(P(None, axis_name), P(), P(axis_name)),
            out_specs=out_specs,
        )(u_hi_s, _replicated(f32_val, mesh), c_s)
    return jnp.sum(g_parts, axis=0), jnp.sum(c_parts, axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "axis_name", "n_chunk"),
)
def _sharded_materialize_th(u_hi_s, u_lo_s, g0h, g0l, mesh, axis_name, n_chunk):
    """Each device writes the base-point fast plane for ITS shard: the
    mesh twin of :func:`pymbar_tpu.solvers_large._materialize_th`.  The
    per-column stabilizer m_n is column-local and K is unsharded, so no
    communication happens — the result shards exactly like the planes."""
    from pymbar_tpu.solvers_large import _materialize_th

    def _local(uh, ul, g0h, g0l):
        return _materialize_th(uh, ul, g0h, g0l, n_chunk)

    return jax.shard_map(
        _local,
        mesh=mesh,
        in_specs=(P(None, axis_name), P(None, axis_name), P(), P()),
        out_specs=P(None, axis_name),
        check_vma=False,
    )(u_hi_s, u_lo_s, _replicated(g0h, mesh), _replicated(g0l, mesh))


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "axis_name", "maxiter", "n_chunk"),
)
def _sharded_polish_while_dd_batch(
    u_hi_s, u_lo_s, C_s, N_k64, f0, hinv, tol, gamma,
    mesh, axis_name, maxiter, n_chunk, th_s=None,
):
    """All replicates batched on the n-sharded planes: the mesh twin of
    :func:`pymbar_tpu.solvers_large._polish_while_dd_batch`.

    The whole two-phase loop runs INSIDE one shard_map: each device streams
    its local plane shard through the shared-dd-exp + matmul factorization
    (:func:`solvers_large._batched_wsum_S` — denominators are fully local
    because K is unsharded on the 1-D mesh, and zero-count pad columns
    contribute exactly 0), and one psum per iteration merges the (B, K)
    weight sums.  C_s is the (B, N_padded) f32 counts matrix sharded along
    'n'; ``th_s`` (optional) is the resident fast plane from
    :func:`_sharded_materialize_th`, sharded like the planes."""
    from pymbar_tpu.solvers_large import _batch_loop_from_S_fn

    def _local(uh, ul, C, N_k64, f0, hinv, tol, gamma, *maybe_th):
        from pymbar_tpu.solvers_large import _batched_wsum_S

        th = maybe_th[0] if maybe_th else None

        def S_fn(g0h, g0l, R, exact):
            S_part = _batched_wsum_S(
                uh, ul, g0h, g0l, R, C, n_chunk, exact, th=th
            )
            return jax.lax.psum(S_part, axis_name)

        return _batch_loop_from_S_fn(
            S_fn, C.shape[0], N_k64, f0, hinv, tol, gamma, maxiter
        )

    in_specs = (
        P(None, axis_name), P(None, axis_name), P(None, axis_name),
        P(), P(), P(), P(), P(),
    )
    args = (
        u_hi_s, u_lo_s, C_s,
        _replicated(N_k64, mesh), _replicated(f0, mesh),
        _replicated(hinv, mesh), _replicated(tol, mesh),
        _replicated(gamma, mesh),
    )
    if th_s is not None:
        in_specs = in_specs + (P(None, axis_name),)
        args = args + (th_s,)

    return jax.shard_map(
        _local,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=P(),
        check_vma=False,
    )(*args)


def sharded_bootstrap_polish_dd(
    u_hi_s,
    u_lo_s,
    N_k,
    f_k,
    hinv,
    counts,
    mesh,
    axis_name="n",
    tol=1.0e-12,
    maxiter=16,
    fast_exp=True,
    verbose=False,
    mode="batched",
):
    """Solve B bootstrap replicates on the resident n-sharded dd planes.

    The mesh twin of :func:`pymbar_tpu.solvers_large.bootstrap_polish_dd`:
    by default all replicates advance together (``mode="batched"`` — one
    shared dd-exp stream of each device's shard + f64 MXU matmuls per
    iteration, :func:`_sharded_polish_while_dd_batch`); ``mode="serial"``
    polishes replicates one at a time through the counts-weighted wsum
    kernel (kept as the fallback and differential twin).  Either way no
    resampled matrix and no cross-device sample movement ever happens — the
    only extra communication is the per-device count-shard upload and the
    usual K-sized partial merges.
    Reference semantics: pymbar 4.x mbar.py:417-449.
    Returns (f_boots (B, K) float64, n_fail, info) with the same
    convergence-accounting ``info`` dict as the single-device engine
    (``at_floor`` mask / ``n_at_floor`` / ``n_tol_converged`` — noise-floor
    stops reported separately from certified d < tol).
    """
    import logging as _logging

    from pymbar_tpu.solvers_large import (
        _batch_chunk_width,
        _batch_group_size,
        _boot_info,
        _newton_factor,
        polish_to_host,
    )

    logger = _logging.getLogger(__name__)
    counts = np.asarray(counts)
    B, N = counts.shape
    Np = u_hi_s.shape[1]
    K = u_hi_s.shape[0]
    N_k64 = jnp.asarray(np.asarray(N_k), dtype=jnp.float64)
    N_k32 = jnp.asarray(np.asarray(N_k), dtype=jnp.float32)
    logN = jnp.log(N_k64)
    f0 = jnp.asarray(np.asarray(f_k), jnp.float64)
    f0 = f0 - f0[0]
    tol_j = jnp.asarray(tol, jnp.float64)
    gamma_j = jnp.asarray(1.0, jnp.float64)
    sharding = NamedSharding(mesh, P(axis_name))

    if mode == "batched":
        from pymbar_tpu.ops.doubledouble import dd_from_f64
        from pymbar_tpu.solvers_large import _use_resident_th

        n_dev = int(np.prod(list(mesh.shape.values())))
        hinv_j = jnp.asarray(hinv, jnp.float64)
        n_chunk = _batch_chunk_width(K, max(1, Np // max(n_dev, 1)))
        group = _batch_group_size(B, Np)
        c_shard = NamedSharding(mesh, P(None, axis_name))
        th_s = None
        if _use_resident_th(K, max(1, Np // max(n_dev, 1))):
            # Budgeted per device: each shard parks its own fast plane
            # next to its plane shard (same 12 B/element accounting as
            # the single-device engine).
            g0h, g0l = dd_from_f64(f0 + jnp.log(N_k64))
            th_s = _sharded_materialize_th(
                u_hi_s, u_lo_s, g0h, g0l, mesh, axis_name, n_chunk
            )
        f_boots = np.zeros((B, K))
        at_floor = np.zeros(B, bool)
        retry = []
        # Same frontend-traffic optimization as the single-device engine:
        # resample multiplicities are small integers, so the (group, N)
        # count matrix crosses the tunnel and parks in HBM as uint8 (4x
        # less than f32); _batched_wsum_S casts chunks to f32 on device.
        if counts.dtype == np.uint8:
            up_dtype = np.uint8
        elif np.issubdtype(counts.dtype, np.integer):
            up_dtype = np.uint8 if counts.max() <= 255 else np.float32
        else:
            up_dtype = (
                np.uint8
                if counts.max() <= 255 and np.all(counts == np.round(counts))
                else np.float32
            )
        for s in range(0, B, group):
            e = min(B, s + group)
            Bg = e - s
            C = np.zeros((group if B > group else Bg, Np), up_dtype)
            C[:Bg, :N] = counts[s:e]
            if Bg < C.shape[0]:
                C[Bg:] = C[0]  # pad rows reuse the jit cache; discarded
            C_s = jax.device_put(C, c_shard)
            F, _iters, _deltas, conv, floor = _sharded_polish_while_dd_batch(
                u_hi_s, u_lo_s, C_s, N_k64, f0, hinv_j, tol_j, gamma_j,
                mesh, axis_name, maxiter, n_chunk, th_s=th_s,
            )
            f_boots[s:e] = np.asarray(F)[:Bg]
            conv = np.asarray(conv)[:Bg]
            at_floor[s:e] = np.asarray(floor)[:Bg]
            retry.extend(s + i for i in np.nonzero(~conv)[0])
            if verbose:
                logger.info(
                    f"Calculated {e:d}/{B:d} bootstrap samples (batched)"
                )
        if th_s is not None:
            th_s.delete()  # release the fast-plane shards before retries
        n_fail = 0
        for b in retry:
            c_pad = np.zeros(Np, dtype=np.float32)
            c_pad[:N] = counts[b]
            c_s = jax.device_put(c_pad, sharding)
            f_b = jnp.asarray(f_boots[b])
            gram_b, colsum_b = _sharded_gram(
                u_hi_s, N_k32, f_b.astype(jnp.float32), mesh, axis_name,
                c_s=c_s,
            )
            hinv_b = _newton_factor(gram_b, colsum_b, N_k64)
            f_b, _it, _g, _d, converged, floor_b = polish_to_host(
                _sharded_polish_while_dd_w(
                    u_hi_s, u_lo_s, c_s, N_k64, f_b, hinv_b, logN, tol_j,
                    gamma_j, mesh, axis_name, maxiter, bool(fast_exp),
                )
            )
            at_floor[b] = converged and floor_b
            if not converged:
                n_fail += 1
            f_b = np.asarray(f_b)
            f_boots[b] = f_b - f_b[0]
        return f_boots, n_fail, _boot_info(at_floor, B, n_fail)

    f_boots = np.zeros((B, K))
    at_floor = np.zeros(B, bool)
    n_fail = 0
    for b in range(B):
        c_pad = np.zeros(Np, dtype=np.float32)
        c_pad[:N] = counts[b]
        c_s = jax.device_put(c_pad, sharding)
        f_b, _it, _g, _d, converged, floor_b = polish_to_host(
            _sharded_polish_while_dd_w(
                u_hi_s, u_lo_s, c_s, N_k64, f0, hinv, logN, tol_j, gamma_j,
                mesh, axis_name, maxiter, bool(fast_exp),
            )
        )
        if not converged:
            gram_b, colsum_b = _sharded_gram(
                u_hi_s, N_k32, f_b.astype(jnp.float32), mesh, axis_name,
                c_s=c_s,
            )
            hinv_b = _newton_factor(gram_b, colsum_b, N_k64)
            f_b, _it, _g, _d, converged, floor_b = polish_to_host(
                _sharded_polish_while_dd_w(
                    u_hi_s, u_lo_s, c_s, N_k64, f_b, hinv_b, logN, tol_j,
                    gamma_j, mesh, axis_name, maxiter, bool(fast_exp),
                )
            )
        at_floor[b] = converged and floor_b
        if not converged:
            n_fail += 1
        f_b = np.asarray(f_b)
        f_boots[b] = f_b - f_b[0]
        if verbose and (b + 1) % max(1, B // 10) == 0:
            logger.info(f"Calculated {b + 1:d}/{B:d} bootstrap samples")
    return f_boots, n_fail, _boot_info(at_floor, B, n_fail)


def sharded_solve_mbar_dd(
    u_hi,
    u_lo,
    N_k,
    f_k=None,
    mesh=None,
    tol=1.0e-12,
    f32_tol=1.0e-4,
    f32_maxiter=40,
    polish_maxiter=12,
    gamma=1.0,
    fast_exp=True,
    axis_name="n",
    return_state=False,
):
    """Multi-chip double-word MBAR solve: n-sharded planes, dd polish.

    The sharded counterpart of :func:`pymbar_tpu.solvers_large.solve_mbar_dd`
    (same two-phase structure and stopping rules): the f32 adaptive phase
    runs on the sharded hi plane (reductions psum over ICI), the polish runs
    one fused dd pass per device per iteration with exact dd merging of the
    K-sized partials.  Caller supplies preconditioned (hi, lo) planes, as in
    the single-device API.  Returns (f_k float64, info dict).
    """
    import time

    from pymbar_tpu import solvers_large as _sl
    from pymbar_tpu.solvers_large import _newton_factor

    if mesh is None:
        mesh = default_mesh(axis_name=axis_name)

    K = np.asarray(u_hi).shape[0]
    N_k64 = jnp.asarray(np.asarray(N_k), dtype=jnp.float64)
    f64 = jnp.zeros(K, dtype=jnp.float64) if f_k is None else jnp.asarray(f_k, jnp.float64)
    f64 = f64 - f64[0]

    u_hi_s, u_lo_s, _ = shard_dd_planes(u_hi, u_lo, mesh, axis_name)

    t_phase1 = time.time()
    N_k_host = np.asarray(N_k, dtype=np.int64)
    N_real = int(N_k_host.sum())
    N_k32 = jnp.asarray(np.asarray(N_k), dtype=jnp.float32)

    def _f32_adaptive(u_s, Nk32_loc, f_start):
        """Host-orchestrated f32 adaptive loop on a sharded plane."""
        f = f_start
        sci_iter = 0
        its = 0
        for its in range(1, f32_maxiter + 1):
            f_sci, g_sci, gn_sci, f_nr, g_nr, gn_nr = sharded_adaptive_step(
                u_s, Nk32_loc, f, jnp.float32(gamma), mesh, axis_name,
                nr_method="chol",
            )
            take_sci = bool(gn_sci < gn_nr) or sci_iter < 2
            f_old = np.asarray(f)
            f = f_sci if take_sci else f_nr
            sci_iter += int(take_sci)
            max_delta, _ = host_adaptive_metrics(
                f, f_old, f_sci, f_nr, f32_tol, delta_mode="mixed"
            )
            if max_delta < f32_tol:
                break
        return f, its

    # ---- phase 1: f32 adaptive warm start (pad columns carry the finite
    # sentinel; exp underflows them to exactly 0 in f32 too).  Large
    # problems solve a 1/16-strided subsample of the sharded plane — a
    # consistent MBAR estimate ~1e-2 from the full solution at 1/16 the
    # per-pass cost — and take the polish chord factor from the subsample
    # Gram (gram_full ~ gram_sub / ratio; measured-optimal, see
    # solvers_large.solve_mbar_dd).  Small problems run the adaptive loop
    # on the full plane as before.
    hinv = None
    it32 = 0
    it32_coarse = 0
    stride = _sl._coarse_stride(N_k_host, K * N_real)
    if stride:
        from pymbar_tpu.ops.pallas_kernels import _PAD_U

        sub = u_hi_s[:, ::stride]
        pad_cols = (-sub.shape[1]) % mesh.devices.size
        if pad_cols:
            sub = jnp.concatenate(
                [sub, jnp.full((K, pad_cols), _PAD_U, jnp.float32)], axis=1
            )
        sub = jax.device_put(sub, NamedSharding(mesh, P(None, axis_name)))
        # per-state counts of the global stride multiples falling in each
        # contiguous state block (plane pads sit past N_real -> masked)
        starts = np.concatenate([[0], np.cumsum(N_k_host)])
        ceil_div = lambda a: -(-a // stride)
        N_k_sub = np.array(
            [ceil_div(starts[k + 1]) - ceil_div(starts[k]) for k in range(K)],
            dtype=np.int64,
        )
        N_sub32 = jnp.asarray(N_k_sub, jnp.float32)
        f32c, it32_coarse = _f32_adaptive(sub, N_sub32, f64.astype(jnp.float32))
        f64 = jnp.asarray(np.asarray(f32c), jnp.float64)
        f64 = f64 - f64[0]
        gram_s, colsum_s = _sharded_gram(sub, N_sub32, f32c, mesh, axis_name)
        ratio = N_real / float(N_k_sub.sum())
        hinv = _newton_factor(gram_s / ratio, colsum_s, N_k64)
        del sub
    else:
        f32_out, it32 = _f32_adaptive(u_hi_s, N_k32, f64.astype(jnp.float32))
        f64 = jnp.asarray(np.asarray(f32_out), jnp.float64)
        f64 = f64 - f64[0]
    t_phase1 = time.time() - t_phase1

    # ---- polish prologue: chord factor from the full sharded Gram when no
    # coarse phase supplied one
    t_phase2 = time.time()
    if hinv is None:
        gram, colsum = _sharded_gram(
            u_hi_s, N_k32, f64.astype(jnp.float32), mesh, axis_name
        )
        hinv = _newton_factor(gram, colsum, N_k64)

    # ---- polish: one wsum pass per device per iteration, the whole loop on
    # device (see solvers_large._polish_loop — same structure and stopping
    # rules; the per-device dd partial S_k sums merge exactly, and no
    # host round-trip happens between iterations).
    logN = jnp.log(N_k64)

    def _run_polish(f_start):
        return _sl.polish_to_host(
            _sharded_polish_while_dd(
                u_hi_s,
                u_lo_s,
                N_k64,
                f_start,
                hinv,
                logN,
                jnp.asarray(tol, jnp.float64),
                jnp.asarray(gamma, jnp.float64),
                mesh,
                axis_name,
                polish_maxiter,
                bool(fast_exp),
            )
        )

    f64, it, g64, deltas, converged, at_noise_floor = _run_polish(f64)

    if not converged and it32_coarse:
        # Subsample factor failed to contract the polish (rare): fall back
        # to the full-plane f32 adaptive + fresh factor + one more polish,
        # mirroring solvers_large.solve_mbar_dd.
        f32_out, it32 = _f32_adaptive(u_hi_s, N_k32, f64.astype(jnp.float32))
        f64 = jnp.asarray(np.asarray(f32_out), jnp.float64)
        f64 = f64 - f64[0]
        gram, colsum = _sharded_gram(
            u_hi_s, N_k32, f64.astype(jnp.float32), mesh, axis_name
        )
        hinv = _newton_factor(gram, colsum, N_k64)
        f64, it2, g64, deltas2, converged, at_noise_floor = _run_polish(f64)
        deltas += deltas2
        it += it2

    gnorm = float(np.linalg.norm(np.asarray(g64))) if it else np.nan
    info = dict(
        converged=converged,
        at_noise_floor=at_noise_floor,
        f32_iterations=int(it32),
        f32_coarse_iterations=int(it32_coarse),
        polish_iterations=it,
        deltas=deltas,
        gnorm=gnorm,
        phase1_s=t_phase1,
        phase2_s=time.time() - t_phase2,
        hinv=hinv,
    )
    if return_state:
        # The sharded planes, for follow-on solves on the same data
        # (bootstrap replicates) without a second host split + upload.
        info["planes"] = (u_hi_s, u_lo_s)
    return np.asarray(f64), info


# ---------------------------------------------------------------------------
# Double-word 2-D (K x N) mesh: the dd precision path for the K >= 4096
# stress layout (BASELINE.md stress config; VERDICT r1 item 6).  The wsum
# factorization splits at the k-block boundary: each device computes its
# partial denominator sums under a pmax-shared shift (they combine exactly
# with dd adds — the only cross-block collective that must preserve dd
# precision is an all_gather of (D_k, N_local) f32 pairs), then its local
# T1/s weight sums, whose (D_n, K_local) partials combine the same way.
# ---------------------------------------------------------------------------


def shard_dd_planes_2d(u_hi, u_lo, N_k, f_k, mesh):
    """Place dd planes on a 2-D (k, n) mesh with finite sentinel padding.

    Pad state rows get u = +PAD and N_k = 0; pad sample columns get
    u = +PAD (the dd kernels mask them).  Returns
    (u_hi_s, u_lo_s, N_k_padded, f_k_padded, (k_pad, n_pad)).
    """
    from pymbar_tpu.ops.pallas_kernels import _PAD_U

    u_hi = np.asarray(u_hi, dtype=np.float32)
    u_lo = np.asarray(u_lo, dtype=np.float32)
    K, N = u_hi.shape
    kd, nd = mesh.devices.shape
    k_pad = (-K) % kd
    n_pad = (-N) % nd
    if k_pad or n_pad:
        u_hi = np.pad(u_hi, ((0, k_pad), (0, n_pad)), constant_values=np.float32(_PAD_U))
        u_lo = np.pad(u_lo, ((0, k_pad), (0, n_pad)))
    N_k = np.pad(np.asarray(N_k, dtype=np.float64), (0, k_pad))
    f_k = np.pad(np.asarray(f_k, dtype=np.float64), (0, k_pad))
    sharding = NamedSharding(mesh, P("k", "n"))
    return (
        jax.device_put(u_hi, sharding),
        jax.device_put(u_lo, sharding),
        N_k,
        f_k,
        (k_pad, n_pad),
    )


def sharded2d_wsum_dd(u_hi_s, u_lo_s, g_hi, g_lo, mesh, fast=True):
    """S_k = sum_n N_k W_nk on a 2-D (k, n) mesh in dd precision.

    Two kernel passes per device: partial denominator sums under the
    pmax-global shift, an exact dd combine across k-blocks (all_gather of
    the (1, N_local) partials — the one N-sized collective the math
    requires), then the local weight sums, combined across n-shards the
    same way.  g_hi/g_lo are the full (K_padded,) dd planes of f + ln N
    (pad states carry the -PAD sentinel).  Returns (S_hi, S_lo) (K_padded,)
    f32 pairs, replicated.
    """
    from pymbar_tpu.config import on_tpu
    from pymbar_tpu.ops.doubledouble import dd_add
    from pymbar_tpu.ops.pallas_kernels import (
        denom_sums_dd,
        denom_sums_dd_ref,
        wsum_denom_dd,
        wsum_denom_dd_ref,
    )

    if on_tpu():
        _denom = lambda uh, ul, gh, gl, m: denom_sums_dd(uh, ul, gh, gl, m, fast=fast)
        _wsum = lambda uh, ul, gh, gl, m, dh, dl: wsum_denom_dd(
            uh, ul, gh, gl, m, dh, dl, fast=fast
        )
    else:
        _denom = denom_sums_dd_ref
        _wsum = wsum_denom_dd_ref

    kd, nd = mesh.devices.shape

    def local(uh, ul, gh_loc, gl_loc):
        # Global per-column shift: local f32 max, pmax over the k blocks.
        m = jax.lax.pmax(jnp.max(gh_loc[:, None] - uh, axis=0), "k")  # (N_loc,)

        sh, sl = _denom(uh, ul, gh_loc, gl_loc, m)  # (N_loc,) partials
        SH = jax.lax.all_gather(sh, "k")  # (kd, N_loc)
        SL = jax.lax.all_gather(sl, "k")
        dh, dl = SH[0], SL[0]
        for d in range(1, kd):
            dh, dl = dd_add(dh, dl, SH[d], SL[d])
        # Pad columns: u = +PAD in every row of every block, so the shift is
        # m = max_k(g) - PAD ~ -1e10 while real (preconditioned) columns sit
        # at O(+-100).  Zero their denominator; the wsum kernel masks s <= 0.
        pad_col = m < jnp.float32(-1.0e8)
        dh = jnp.where(pad_col, jnp.float32(0.0), dh)
        dl = jnp.where(pad_col, jnp.float32(0.0), dl)

        th, tl = _wsum(uh, ul, gh_loc, gl_loc, m, dh, dl)  # (K_loc,)
        TH = jax.lax.all_gather(th, "n")  # (nd, K_loc)
        TL = jax.lax.all_gather(tl, "n")
        Sh, Sl = TH[0], TL[0]
        for d in range(1, nd):
            Sh, Sl = dd_add(Sh, Sl, TH[d], TL[d])
        return Sh, Sl

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("k", "n"), P("k", "n"), P("k"), P("k")),
        out_specs=(P("k"), P("k")),
        check_vma=False,
    )
    g_hi_s = jax.device_put(jnp.asarray(g_hi), NamedSharding(mesh, P("k")))
    g_lo_s = jax.device_put(jnp.asarray(g_lo), NamedSharding(mesh, P("k")))
    Sh, Sl = fn(u_hi_s, u_lo_s, g_hi_s, g_lo_s)
    return jnp.asarray(jax.device_get(Sh)), jnp.asarray(jax.device_get(Sl))


@functools.partial(
    jax.jit, static_argnames=("mesh", "maxiter", "fast")
)
def _sharded2d_polish_while_dd(
    u_hi_s, u_lo_s, N_k64, f0, hinv, logN, tol, gamma, mesh, maxiter, fast
):
    """The 2-D-mesh dd Newton polish as ONE device while_loop (pad states
    carry N_k = 0, S_k = 0 and an identity hinv block, so their gradient
    and step are exactly zero)."""
    from pymbar_tpu.solvers_large import _polish_loop

    def _wsum(uh, ul, gh, gl):
        return sharded2d_wsum_dd(uh, ul, gh, gl, mesh, fast=fast)

    return _polish_loop(
        _wsum, u_hi_s, u_lo_s, N_k64, f0, hinv, logN, tol, gamma, maxiter
    )


def sharded2d_solve_mbar_dd(
    u_hi,
    u_lo,
    N_k,
    f_k=None,
    mesh=None,
    tol=1.0e-12,
    f32_tol=1.0e-4,
    f32_maxiter=200,
    polish_maxiter=60,
    m_history=5,
    fast_exp=True,
):
    """Double-word MBAR solve on a 2-D (k, n) mesh: the K >= 4096 stress
    path with the same ~1e-12 story as the 1-D dd solve.

    Phase 1 runs Anderson-accelerated f32 SC on the hi plane
    (sharded2d_core_stats).  Phase 2 is the same chord-Newton device
    while_loop as the 1-D solvers: the frozen factor comes from
    :func:`sharded2d_gram` on a strided subsample of the plane (the k-axis
    all_gather of W blocks stays a few GB because of the subsampling), and
    each iteration is one :func:`sharded2d_wsum_dd` pass (evaluation noise
    ~2e-13, so the fixed point is resolved to the same floor as the 1-D
    path).  The Hessian-free dd-Anderson SC iteration remains as the
    fallback when the subsample factor fails to contract.  Caller supplies
    preconditioned (hi, lo) planes; all states must have samples.
    Returns (f_k float64, info).
    """
    import time

    if mesh is None:
        raise ValueError("sharded2d_solve_mbar_dd requires an explicit 2-D mesh")

    from pymbar_tpu.ops.doubledouble import dd_from_f64, dd_to_f64

    K = np.asarray(u_hi).shape[0]
    f0 = np.zeros(K) if f_k is None else np.asarray(f_k, dtype=np.float64)
    f0 = f0 - f0[0]

    u_hi_s, u_lo_s, N_pad, f_pad, (k_pad, n_pad) = shard_dd_planes_2d(
        u_hi, u_lo, N_k, f0, mesh
    )
    Kp = len(N_pad)
    N_pad32 = N_pad.astype(np.float32)

    def _anderson(sc, f, maxiter, tol_stop, floor_stop):
        hist_x, hist_r = [], []
        it = 0
        max_delta = np.inf
        prev_delta = np.inf
        converged = False
        at_floor = False
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
            max_delta, _ = host_adaptive_metrics(
                f_new[:K], f[:K], f_new[:K], f_new[:K], tol_stop,
                delta_mode="mixed",
            )
            f = f_new
            if max_delta < tol_stop:
                converged = True
                break
            if floor_stop is not None:
                predicted = (
                    max_delta * max_delta / prev_delta
                    if np.isfinite(prev_delta)
                    else np.inf
                )
                if max_delta < floor_stop or predicted < floor_stop:
                    converged = True
                    at_floor = True
                    break
            prev_delta = max_delta
        return f, it, max_delta, converged, at_floor

    # ---- subsample plane, shared by the phase-1 warm start and the chord
    # factor.  Unlike the 1-D coarse phase (which solves a subsample MBAR
    # with its own counts), the weights here keep the FULL-N normalization
    # — logden is column-local — so (a) the SC map on the subsample is the
    # full map plus a uniform +ln(stride) shift that cancels on re-pinning,
    # and (b) gram and colsum both scale by ratio = N_cols / n_sub with
    # the factor algebra unchanged.
    from pymbar_tpu.ops.pallas_kernels import _PAD_U as _PAD2D
    from pymbar_tpu.solvers_large import _newton_factor

    N_cols = int(np.asarray(u_hi).shape[1])
    # Subsample down to ~32 samples/state (the chord factor only needs
    # ~1e-2 relative accuracy — its 1/sqrt(n_sub/K) statistical error at 32
    # samples/state matches the rate floor set by cond(H)-amplified f32
    # Gram noise); the 64 cap bounds phase 1's distance from the full
    # solution at huge N/K ratios.
    stride2 = int(np.clip(N_cols // max(32 * K, 1), 1, 64))
    if stride2 > 1:
        Dn = mesh.shape["n"]
        sub = u_hi_s[:, ::stride2]
        pad_c = (-sub.shape[1]) % Dn
        if pad_c:
            sub = jnp.concatenate(
                [sub, jnp.full((Kp, pad_c), _PAD2D, jnp.float32)], axis=1
            )
        sub = jax.device_put(sub, NamedSharding(mesh, P("k", "n")))
    else:
        sub = u_hi_s
    n_sub = -(-N_cols // stride2)  # real columns among the stride multiples
    ratio = N_cols / float(n_sub)

    # ---- phase 1: f32 Anderson SC on the (subsampled) hi plane.
    t_phase1 = time.time()

    def sc32(fv):
        _, _, f_sci = sharded2d_core_stats(
            sub, N_pad32, fv.astype(np.float32), mesh
        )
        f_sci = np.asarray(f_sci, dtype=np.float64)
        return f_sci - f_sci[0]

    f, it32, _, _, _ = _anderson(sc32, f_pad.copy(), f32_maxiter, f32_tol, None)
    t_phase1 = time.time() - t_phase1

    # ---- phase 2: dd chord-Newton polish as one device while_loop (same
    # machinery as the 1-D solvers: solvers_large._polish_loop), with the
    # old dd-Anderson SC iteration kept as fallback.
    t_phase2 = time.time()
    logN = np.where(N_pad > 0, np.log(np.where(N_pad > 0, N_pad, 1.0)), 0.0)

    gram, colsum = sharded2d_gram(sub, N_pad32, f.astype(np.float32), mesh)
    hinv_real = _newton_factor(
        gram[:K, :K] * ratio, colsum[:K] * ratio, jnp.asarray(N_pad[:K])
    )
    hinv = jnp.eye(Kp - 1, dtype=jnp.float64)
    hinv = hinv.at[: K - 1, : K - 1].set(hinv_real)

    f64j, itdd, g64, deltas_arr, converged, at_floor = _sharded2d_polish_while_dd(
        u_hi_s,
        u_lo_s,
        jnp.asarray(N_pad),
        jnp.asarray(f),
        hinv,
        jnp.asarray(logN),
        jnp.asarray(tol, jnp.float64),
        jnp.asarray(1.0, jnp.float64),
        mesh,
        polish_maxiter,
        bool(fast_exp),
    )
    itdd = int(itdd)
    deltas = [float(d) for d in np.asarray(deltas_arr)[:itdd]]
    max_delta = deltas[-1] if deltas else np.inf
    converged = bool(converged)
    at_floor = bool(at_floor)
    f = np.asarray(f64j)
    g = np.asarray(g64)[:K]

    if not converged:
        # Newton off the chord factor failed to contract (rare): fall
        # back to the Hessian-free dd Anderson SC iteration.
        def sc_dd(fv):
            gh, gl = dd_from_f64(jnp.asarray(fv + logN))
            Sh, Sl = sharded2d_wsum_dd(u_hi_s, u_lo_s, gh, gl, mesh, fast=fast_exp)
            S64 = np.asarray(dd_to_f64(Sh, Sl), dtype=np.float64)
            with np.errstate(divide="ignore", invalid="ignore"):
                f_sci = fv + logN - np.log(np.where(S64 > 0, S64, 1.0))
            f_sci[N_pad == 0] = 0.0
            return f_sci - f_sci[0]

        f, it2, max_delta, converged, at_floor = _anderson(
            sc_dd, f, polish_maxiter, tol, 3.0e-13
        )
        itdd += int(it2)
        # gradient certificate from one more wsum pass
        gh, gl = dd_from_f64(jnp.asarray(f + logN))
        Sh, Sl = sharded2d_wsum_dd(u_hi_s, u_lo_s, gh, gl, mesh, fast=fast_exp)
        g = (np.asarray(dd_to_f64(Sh, Sl), dtype=np.float64) - N_pad)[:K]

    t_phase2 = time.time() - t_phase2

    return f[:K], dict(
        converged=converged,
        at_noise_floor=at_floor,
        f32_iterations=int(it32),
        polish_iterations=int(itdd),
        max_delta=max_delta,
        deltas=deltas,
        gnorm=float(np.linalg.norm(g)),
        phase1_s=t_phase1,
        phase2_s=t_phase2,
    )


def sharded_solve_mbar_for_all_states(
    u_kn, N_k, f_k, states_with_samples, mesh=None, tol=1.0e-12,
    axis_name="n", bootstrap_counts=None, verbose=False,
):
    """Multi-chip analog of ``solve_mbar_for_all_states`` — the MBAR class's
    sharded front door.

    Same contract as the single-device version (reference
    mbar_solvers.py:977-1017): solve on the states with samples, then one
    self-consistent update over ALL K states to fill the empty ones, and
    re-pin f_0 = 0.  The solve itself is the double-word n-sharded path
    (:func:`sharded_solve_mbar_dd`); the empty-state fill is one sharded
    fused pass.  Returns f_k (K,) float64.

    With ``bootstrap_counts`` (a (B, N) resample-multiplicity matrix;
    requires every state to have samples) the B replicates are also solved
    on the SAME resident planes via :func:`sharded_bootstrap_polish_dd`,
    and the return becomes (f_k, f_boots (B, K), n_fail).
    """
    from pymbar_tpu.solvers_large import split_u_kn_streamed

    if mesh is None:
        mesh = default_mesh(axis_name=axis_name)

    u_kn = np.asarray(u_kn, dtype=np.float64)
    N_k = np.asarray(N_k, dtype=np.float64)
    f_k = np.array(f_k, dtype=np.float64, copy=True)
    sws = np.asarray(states_with_samples)

    if bootstrap_counts is not None and len(sws) < len(N_k):
        raise ValueError(
            "bootstrap_counts requires every state to have samples "
            "(the class front door falls back to the sequential bootstrap "
            "path for empty-state problems)"
        )

    u_sub = u_kn[sws]
    # Per-sample shift (the MBAR equations are invariant under column
    # shifts) so the dd split sees small, cancellation-friendly values.
    # In place: u_sub is already a private fancy-index copy, and a second
    # K x N temporary would triple transient host memory at the 1e7-sample
    # target this front door exists for.
    u_sub -= u_sub.min(axis=0, keepdims=True)
    uh, ul = split_u_kn_streamed(u_sub)
    f_sub, info = sharded_solve_mbar_dd(
        uh, ul, N_k[sws], f_k=f_k[sws] - f_k[sws][0], mesh=mesh, tol=tol,
        axis_name=axis_name, return_state=bootstrap_counts is not None,
    )
    if not info.get("converged", False):
        import logging

        logging.getLogger(__name__).warning(
            "sharded MBAR solve did not converge to within tolerance "
            f"(gnorm={info.get('gnorm', float('nan')):.3e})"
        )
    f_k[sws] = f_sub

    if bootstrap_counts is not None:
        u_hi_s, u_lo_s = info["planes"]
        f_boots, n_fail, boot_info = sharded_bootstrap_polish_dd(
            u_hi_s, u_lo_s, N_k, f_sub, info["hinv"], bootstrap_counts,
            mesh, axis_name=axis_name, tol=tol, verbose=verbose,
        )
        return f_k - f_k[0], f_boots, n_fail, boot_info

    if len(sws) < len(N_k):
        # Empty-state fill: one SC update over all K states (empty states
        # carry N_k = 0 and drop out of the denominator exactly).
        u_all, _ = shard_u_kn(u_kn, mesh, axis_name)
        _, _, f_sci = sharded_core_stats(u_all, N_k, jnp.asarray(f_k), mesh, axis_name)
        f_k = np.asarray(f_sci, dtype=np.float64)
    return f_k - f_k[0]
