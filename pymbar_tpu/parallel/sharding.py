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

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pymbar_tpu.ops.mbar_core import core_stats, mbar_w_nk_gram

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
