"""Fused Pallas TPU kernels for the MBAR hot path in double-word precision.

The MBAR solve is dominated by two reductions over the K×N reduced-potential
matrix (SURVEY.md §3.1).  XLA's f64 emulation runs them at ~40 GB/s on v5e;
these kernels stream the same data as two float32 planes (hi, lo — the same
8 bytes/element as f64) with compensated double-word arithmetic
(:mod:`pymbar_tpu.ops.doubledouble`), targeting VPU-bound throughput several
times higher at ~1e-13 effective precision.

Kernels
-------
* ``logden_dd``  — per-sample logsumexp over states:
                   logden_n = log sum_k exp(g_k - u_kn),  g_k = f_k + ln N_k
* ``lognum_dd``  — per-state logsumexp over samples with a precomputed
                   stabilizing max: lognum_k = log sum_n exp(-logden_n - u_kn)

Both tile the sample axis; the full K extent lives in VMEM per tile
(K <= ~2048 for f32 pairs at the default tile width).  K beyond that is the
domain of the K-sharded mesh (pymbar_tpu.parallel), not of a single kernel.

Padding conventions: N is padded to the tile width and K to a power of two
with ``u = +1e10`` / ``g = -1e10`` sentinel entries — large-but-finite so the
error-free transforms stay NaN-free while the exp clamp turns the terms into
~1e-37 (numerically zero at any real sum scale).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pymbar_tpu.ops.doubledouble import (
    dd_add,
    dd_add_f,
    dd_exp_neg,
    dd_exp_neg_fast,
    dd_mul,
    two_sum,
)

__all__ = ["logden_dd", "lognum_dd", "lognum_fused_dd", "dd_log_pos"]

_TILE_N = None  # auto: sized from K to fit VMEM (see _pick_tile)
_PAD_U = 1.0e10  # sentinel potential for padded rows/columns


def _pick_tile(K):
    """Largest 128-multiple tile width whose working set fits scoped VMEM.

    Empirically the kernel's live set is ~15 K*tile f32 buffers (two input
    planes double-buffered plus dd intermediates); budget ~12 MB.  Beyond
    K ~ 2048 even the minimum tile no longer fits — that K range belongs to
    the K-sharded 2-D mesh (pymbar_tpu.parallel.mesh_2d), not one kernel.
    """
    if K > 2048:
        raise ValueError(
            f"K={K} exceeds the single-kernel VMEM capacity (~2048 states); "
            "shard states across chips with pymbar_tpu.parallel.mesh_2d / "
            "sharded2d_solve_mbar instead."
        )
    t = (12_000_000 // (60 * max(K, 1))) // 128 * 128
    t = int(max(128, min(512, t)))
    # The in-kernel dd tree reductions pair-halve the tile extent, so the
    # tile MUST be a power of two (384 would silently drop columns).
    return 1 << (t.bit_length() - 1)


def dd_log_pos(s_hi, s_lo):
    """log of a double-word s >= ~0.1, to ~1e-14: one f32 log refined by a
    residual step l += (s e^{-l} - 1) - (...)^2/2."""
    l = jnp.log(s_hi)
    e_hi, e_lo = dd_exp_neg(-l, jnp.zeros_like(l))
    r_hi, r_lo = dd_mul(s_hi, s_lo, e_hi, e_lo)
    r_hi, r_lo = dd_add_f(r_hi, r_lo, jnp.float32(-1.0))
    corr = (r_hi + r_lo) - 0.5 * r_hi * r_hi
    return two_sum(l, corr)


def _dd_tree_sum(h, l, axis):
    """Pairwise double-word sum along ``axis`` (extent must be a power of 2)."""
    n = h.shape[axis]
    if n & (n - 1):
        raise ValueError(f"_dd_tree_sum needs a power-of-two extent, got {n}")
    while n > 1:
        n //= 2
        h0 = jax.lax.slice_in_dim(h, 0, n, axis=axis)
        l0 = jax.lax.slice_in_dim(l, 0, n, axis=axis)
        h1 = jax.lax.slice_in_dim(h, n, 2 * n, axis=axis)
        l1 = jax.lax.slice_in_dim(l, n, 2 * n, axis=axis)
        h, l = dd_add(h0, l0, h1, l1)
    return h, l


def _exp_terms(uh, ul, gh, gl, m, fast=False):
    """exp((g - u) - m) in double-word with error-free argument chaining.

    g may be a (K, 1) pair or zero; m is (1, T) or (K, 1) plain f32 (each m
    entry is exactly representable, so the subtraction folds in via two_sum).
    ``fast`` selects dd_exp_neg_fast (16x reduction, ~1.4x kernel speedup,
    ~2e-13 vs ~1.5e-13 relative error under Mosaic).
    """
    # a = g - u, fully compensated
    s_hi, s_lo = two_sum(gh, -uh)
    a_hi, a_lo = dd_add(s_hi, s_lo, gl, -ul)
    # a -= m, error-free since m is a plain f32 value
    t_hi, t_e = two_sum(a_hi, -m)
    a_hi, a_lo = t_hi, a_lo + t_e
    return (dd_exp_neg_fast if fast else dd_exp_neg)(a_hi, a_lo)


@jax.jit
def logden_dd_ref(u_hi, u_lo, g_hi, g_lo):
    """Pure-jnp reference of ``logden_dd`` (same dd math, no pallas_call).

    Used for CPU testing and as the off-TPU fallback of the two-phase
    solver; memory-naive (materializes K x N intermediates).
    """
    gh = g_hi[:, None]
    gl = g_lo[:, None]
    m = jnp.max(gh - u_hi, axis=0, keepdims=True)
    e_hi, e_lo = _exp_terms(u_hi, u_lo, gh, gl, m)
    K = u_hi.shape[0]
    K_pad = 1 << (K - 1).bit_length()
    if K_pad != K:
        e_hi = jnp.pad(e_hi, ((0, K_pad - K), (0, 0)))
        e_lo = jnp.pad(e_lo, ((0, K_pad - K), (0, 0)))
    s_hi, s_lo = _dd_tree_sum(e_hi, e_lo, axis=0)
    l_hi, l_lo = dd_log_pos(s_hi, s_lo)
    t_hi, t_e = two_sum(l_hi, m)
    return t_hi.reshape(-1), (l_lo + t_e).reshape(-1)


@jax.jit
def lognum_dd_ref(u_hi, u_lo, ld_hi, ld_lo, m_k):
    """Pure-jnp reference of ``lognum_dd``.

    The sample-axis reduction runs in true float64 (this path only runs
    off-TPU, where f64 is native): a log2(N)-level double-word slice tree
    over N ~ 1e6 takes XLA:CPU minutes to compile, while jnp.sum's internal
    pairwise f64 reduction is equally accurate here (terms are in [0, 1]).
    """
    m = m_k[:, None]
    e_hi, e_lo = _exp_terms(u_hi, u_lo, -ld_hi[None, :], -ld_lo[None, :], m)
    s64 = jnp.sum(e_hi.astype(jnp.float64) + e_lo.astype(jnp.float64), axis=1)
    sh = s64.astype(jnp.float32)
    sl = (s64 - sh.astype(jnp.float64)).astype(jnp.float32)
    lh, ll = dd_log_pos(sh, sl)
    t_hi, t_e = two_sum(lh, m_k)
    return t_hi, ll + t_e


def _logden_kernel(uh_ref, ul_ref, gh_ref, gl_ref, oh_ref, ol_ref, *, fast):
    """One (K, TILE_N) tile: logden over axis 0 in double-word arithmetic."""
    uh = uh_ref[:, :]
    ul = ul_ref[:, :]
    gh = gh_ref[:, :]  # (K, 1)
    gl = gl_ref[:, :]

    # Stabilizing per-column max in plain f32 (only the shift; exactness of
    # m is irrelevant, it just has to be a representable nearby value).
    m = jnp.max(gh - uh, axis=0, keepdims=True)  # (1, T)

    e_hi, e_lo = _exp_terms(uh, ul, gh, gl, m, fast=fast)
    s_hi, s_lo = _dd_tree_sum(e_hi, e_lo, axis=0)  # (1, T)

    l_hi, l_lo = dd_log_pos(s_hi, s_lo)
    t_hi, t_e = two_sum(l_hi, m)
    oh_ref[:, :] = t_hi
    ol_ref[:, :] = l_lo + t_e


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret", "fast"))
def logden_dd(u_hi, u_lo, g_hi, g_lo, tile_n=_TILE_N, interpret=False, fast=False):
    """Per-sample mixture log-normalizer in double-word precision.

    u_hi/u_lo: (K, N) f32 planes of the reduced potentials;
    g_hi/g_lo: (K,) f32 planes of f_k + ln N_k (sampled states only).
    Returns (logden_hi, logden_lo), each (N,) f32.

    K is padded to a power of two and N to the tile width internally.
    """
    K, N = u_hi.shape
    K_pad = 1 << (K - 1).bit_length()
    if tile_n is None:
        tile_n = _pick_tile(K_pad)
    n_pad = (-N) % tile_n

    if K_pad != K or n_pad:
        u_hi = jnp.pad(u_hi, ((0, K_pad - K), (0, n_pad)), constant_values=_PAD_U)
        u_lo = jnp.pad(u_lo, ((0, K_pad - K), (0, n_pad)))
        g_hi = jnp.pad(g_hi, (0, K_pad - K), constant_values=-_PAD_U)
        g_lo = jnp.pad(g_lo, (0, K_pad - K))

    grid = ((N + n_pad) // tile_n,)
    gh = g_hi.reshape(K_pad, 1)
    gl = g_lo.reshape(K_pad, 1)

    # Mosaic cannot legalize the int64 grid/index arithmetic that global
    # x64 mode produces; trace the kernel in an x64-off scope (all operands
    # are f32, so no semantics change).
    with jax.enable_x64(False):
        out_hi, out_lo = pl.pallas_call(
        functools.partial(_logden_kernel, fast=fast),
        grid=grid,
        in_specs=[
            pl.BlockSpec((K_pad, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((K_pad, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((K_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, N + n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, N + n_pad), jnp.float32),
        ],
            interpret=interpret,
        )(u_hi, u_lo, gh, gl)
    return out_hi.reshape(-1)[:N], out_lo.reshape(-1)[:N]


def _lognum_kernel(uh_ref, ul_ref, ldh_ref, ldl_ref, m_ref, sh_ref, sl_ref, *, fast):
    """One (K, TILE_N) tile: accumulate s_k += sum_n exp((-ld_n - u_kn) - m_k)."""
    i = pl.program_id(0)

    uh = uh_ref[:, :]
    ul = ul_ref[:, :]
    ldh = ldh_ref[:, :]  # (1, T)
    ldl = ldl_ref[:, :]
    m = m_ref[:, :]  # (K, 1)

    e_hi, e_lo = _exp_terms(uh, ul, -ldh, -ldl, m, fast=fast)
    th, tl = _dd_tree_sum(e_hi, e_lo, axis=1)  # (K, 1)

    @pl.when(i == 0)
    def _():
        sh_ref[:, :] = jnp.zeros_like(th)
        sl_ref[:, :] = jnp.zeros_like(tl)

    nh, nl = dd_add(sh_ref[:, :], sl_ref[:, :], th, tl)
    sh_ref[:, :] = nh
    sl_ref[:, :] = nl


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret", "fast"))
def lognum_dd(u_hi, u_lo, ld_hi, ld_lo, m_k, tile_n=_TILE_N, interpret=False, fast=False):
    """Per-state logsumexp over samples, double-word, with precomputed max.

    m_k: (K,) f32 — global max over n of (-logden - u) per state (one cheap
    f32 pass computes it; only the shift needs it, not the value).
    Returns (lognum_hi, lognum_lo): (K,) f32 pairs, lognum = log(s) + m_k.
    """
    K, N = u_hi.shape
    if tile_n is None:
        tile_n = _pick_tile(K)
    n_pad = (-N) % tile_n
    if n_pad:
        u_hi = jnp.pad(u_hi, ((0, 0), (0, n_pad)), constant_values=_PAD_U)
        u_lo = jnp.pad(u_lo, ((0, 0), (0, n_pad)))
        ld_hi = jnp.pad(ld_hi, (0, n_pad))
        ld_lo = jnp.pad(ld_lo, (0, n_pad))
    Np = N + n_pad
    grid = (Np // tile_n,)

    with jax.enable_x64(False):
        s_hi, s_lo = pl.pallas_call(
        functools.partial(_lognum_kernel, fast=fast),
        grid=grid,
        in_specs=[
            pl.BlockSpec((K, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((K, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, 1), jnp.float32),
            jax.ShapeDtypeStruct((K, 1), jnp.float32),
        ],
            interpret=interpret,
        )(u_hi, u_lo, ld_hi.reshape(1, Np), ld_lo.reshape(1, Np), m_k.reshape(K, 1))

    lh, ll = dd_log_pos(s_hi.reshape(K), s_lo.reshape(K))
    t_hi, t_e = two_sum(lh, m_k)
    return t_hi, ll + t_e


def _fused_polish_kernel(
    uh_ref, ul_ref, gh_ref, gl_ref, mk_ref, sh_ref, sl_ref, *, fast
):
    """One (K, TILE_N) tile: logden for the tile, then lognum partials.

    Fuses the two reductions of a polish iteration so each u tile is read
    from HBM once: per column compute logden_n (dd reduce over states),
    immediately form exp((-logden - u) - m_k) and accumulate per-state dd
    partial sums.  m_k is a frozen stabilizing shift from the previous
    iteration (only needs to be a representable nearby value).
    """
    i = pl.program_id(0)
    uh = uh_ref[:, :]
    ul = ul_ref[:, :]
    gh = gh_ref[:, :]  # (K, 1)
    gl = gl_ref[:, :]
    mk = mk_ref[:, :]  # (K, 1)

    m = jnp.max(gh - uh, axis=0, keepdims=True)  # (1, T)
    e_hi, e_lo = _exp_terms(uh, ul, gh, gl, m, fast=fast)
    s_hi, s_lo = _dd_tree_sum(e_hi, e_lo, axis=0)  # (1, T)
    ld_h, ld_l = dd_log_pos(s_hi, s_lo)
    t_hi, t_e = two_sum(ld_h, m)
    ld_h, ld_l = t_hi, ld_l + t_e  # logden of the tile, (1, T) dd

    # Padded sample columns (u = +PAD everywhere) produce logden ~ -PAD,
    # which would CANCEL u in the lognum argument and leave an O(exp(-m_k))
    # phantom contribution; force their logden to +PAD so the lognum term
    # underflows to exactly zero.  Row 0 is always an original state row and
    # preconditioned potentials never approach the sentinel.
    pad_col = uh[0:1, :] >= jnp.float32(0.5 * _PAD_U)
    ld_h = jnp.where(pad_col, jnp.float32(_PAD_U), ld_h)
    ld_l = jnp.where(pad_col, jnp.float32(0.0), ld_l)

    e_hi, e_lo = _exp_terms(uh, ul, -ld_h, -ld_l, mk, fast=fast)
    th, tl = _dd_tree_sum(e_hi, e_lo, axis=1)  # (K, 1)

    @pl.when(i == 0)
    def _():
        sh_ref[:, :] = jnp.zeros_like(th)
        sl_ref[:, :] = jnp.zeros_like(tl)

    nh, nl = dd_add(sh_ref[:, :], sl_ref[:, :], th, tl)
    sh_ref[:, :] = nh
    sl_ref[:, :] = nl


@functools.partial(
    jax.jit, static_argnames=("tile_n", "interpret", "fast", "return_sums")
)
def lognum_fused_dd(
    u_hi,
    u_lo,
    g_hi,
    g_lo,
    m_k,
    tile_n=_TILE_N,
    interpret=False,
    fast=False,
    return_sums=False,
):
    """Per-state lognum in one fused pass over u (logden computed in-tile).

    u_hi/u_lo: (K, N) dd planes; g_hi/g_lo: (K,) dd planes of f_k + ln N_k;
    m_k: (K,) f32 stabilizing shift (a nearby value, e.g. from the previous
    polish iteration).  Returns (lognum_hi, lognum_lo): (K,) f32 pairs.
    Halves HBM traffic vs logden_dd + lognum_dd (the u planes stream once).
    With ``return_sums`` the raw (K,) dd partial sums s_k (lognum = log s_k
    + m_k) are returned instead — the mergeable form for sample-sharded
    multi-chip solves (partials from each device combine with dd adds
    before one log).
    """
    K, N = u_hi.shape
    K_pad = 1 << (K - 1).bit_length()
    if tile_n is None:
        tile_n = _pick_tile(K_pad)
    n_pad = (-N) % tile_n
    if K_pad != K or n_pad:
        # Padded state rows take u=+PAD (their lognum partials vanish and
        # they drop out of the in-tile logden); padded sample columns take
        # u=+PAD so their lognum contribution is exactly zero whatever
        # logden value the pad column produces.
        u_hi = jnp.pad(u_hi, ((0, K_pad - K), (0, n_pad)), constant_values=_PAD_U)
        u_lo = jnp.pad(u_lo, ((0, K_pad - K), (0, n_pad)))
        g_hi = jnp.pad(g_hi, (0, K_pad - K), constant_values=-_PAD_U)
        g_lo = jnp.pad(g_lo, (0, K_pad - K))
        m_k = jnp.pad(m_k, (0, K_pad - K))
    Np = N + n_pad
    grid = (Np // tile_n,)

    with jax.enable_x64(False):
        s_hi, s_lo = pl.pallas_call(
            functools.partial(_fused_polish_kernel, fast=fast),
            grid=grid,
            in_specs=[
                pl.BlockSpec((K_pad, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((K_pad, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((K_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((K_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((K_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((K_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((K_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((K_pad, 1), jnp.float32),
                jax.ShapeDtypeStruct((K_pad, 1), jnp.float32),
            ],
            interpret=interpret,
        )(
            u_hi,
            u_lo,
            g_hi.reshape(K_pad, 1),
            g_lo.reshape(K_pad, 1),
            m_k.reshape(K_pad, 1),
        )

    s_hi = s_hi.reshape(K_pad)[:K]
    s_lo = s_lo.reshape(K_pad)[:K]
    if return_sums:
        return s_hi, s_lo
    lh, ll = dd_log_pos(s_hi, s_lo)
    t_hi, t_e = two_sum(lh, m_k[:K])
    return t_hi, ll + t_e


def _lognum_sums_ref(u_hi, u_lo, ld_hi, ld_lo, m_k):
    """Raw dd partial sums of the lognum reduction (true-f64 inner sum)."""
    m = m_k[:, None]
    e_hi, e_lo = _exp_terms(u_hi, u_lo, -ld_hi[None, :], -ld_lo[None, :], m)
    s64 = jnp.sum(e_hi.astype(jnp.float64) + e_lo.astype(jnp.float64), axis=1)
    sh = s64.astype(jnp.float32)
    sl = (s64 - sh.astype(jnp.float64)).astype(jnp.float32)
    return sh, sl


@functools.partial(jax.jit, static_argnames=("return_sums",))
def lognum_fused_dd_ref(u_hi, u_lo, g_hi, g_lo, m_k, return_sums=False):
    """Pure-jnp reference of ``lognum_fused_dd`` (same math, no pallas).

    Pad columns (u >= PAD/2 sentinels, as the sharded layout produces)
    contribute exactly zero, matching the Pallas kernel's column mask.
    """
    ldh, ldl = logden_dd_ref(u_hi, u_lo, g_hi, g_lo)
    pad_col = u_hi[0, :] >= jnp.float32(0.5 * _PAD_U)
    ldh = jnp.where(pad_col, jnp.float32(_PAD_U), ldh)
    ldl = jnp.where(pad_col, jnp.float32(0.0), ldl)
    if return_sums:
        return _lognum_sums_ref(u_hi, u_lo, ldh, ldl, m_k)
    return lognum_dd_ref(u_hi, u_lo, ldh, ldl, m_k)
