"""Fused Pallas TPU kernels for the MBAR hot path in double-word precision.

The MBAR solve is dominated by two reductions over the K×N reduced-potential
matrix (SURVEY.md §3.1).  XLA's f64 emulation runs them at ~40 GB/s on v5e;
these kernels stream the same data as two float32 planes (hi, lo — the same
8 bytes/element as f64) with compensated double-word arithmetic
(:mod:`pymbar_tpu.ops.doubledouble`), targeting VPU-bound throughput several
times higher at ~1e-13 effective precision.

Kernels
-------
* ``wsum_dd``    — THE polish kernel: S_k = sum_n N_k W_nk in one pass, one
                   dd exp per element (the lognum terms factor exactly as
                   T1/s_n — see docs/numerics.md).  gradient = S - N_k.
* ``denom_sums_dd`` / ``wsum_denom_dd`` — the same pass split at the
                   k-block boundary, for K-sharded (2-D mesh) solves and
                   the k-blocked large-K single-device route.
* ``logden_dd``  — per-sample logsumexp over states:
                   logden_n = log sum_k exp(g_k - u_kn),  g_k = f_k + ln N_k
* ``lognum_dd``  — per-state logsumexp over samples with a precomputed
                   stabilizing max: lognum_k = log sum_n exp(-logden_n - u_kn)

All tile the sample axis with the K extent VMEM-resident per tile; wsum
k-blocks internally above 2048 padded states (grid dim 0), so a single chip
covers K = 4096 at two passes of HBM traffic.  Larger K belongs to the
K-sharded mesh (pymbar_tpu.parallel.sharded2d_solve_mbar_dd).

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
    dd_mul_f,
    dd_recip,
    two_sum,
)

__all__ = [
    "logden_dd",
    "lognum_dd",
    "lognum_fused_dd",
    "wsum_dd",
    "denom_sums_dd",
    "wsum_denom_dd",
    "dd_log_pos",
]

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


def _pick_tile_wsum(K):
    """Tile width for the one-exp wsum kernel (smaller live set than the
    two-exp kernels: one T1 pair plus exp temps).  Measured on v5e: at
    K_pad=1024 tile 512 compiles and runs at peak (121 GB/s), tile 1024
    blows VMEM — budget K*tile <= 2^19 elements, tile in [128, 512].
    K_pad up to 4096 fits at the 128-wide minimum tile, so the single-chip
    kernel covers the K=4096 stress config directly.
    """
    if K > 4096:
        raise ValueError(
            f"K={K} exceeds the single-kernel VMEM capacity (~4096 states); "
            "shard states across chips with pymbar_tpu.parallel.mesh_2d / "
            "sharded2d_solve_mbar instead."
        )
    t = int(max(128, min(512, (1 << 19) // max(K, 1))))
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

    # Padded sample columns (u = +PAD in EVERY row) produce logden ~ -PAD,
    # which would CANCEL u in the lognum argument and leave an O(exp(-m_k))
    # phantom contribution; force their logden to +PAD so the lognum term
    # underflows to exactly zero.  Detected via the column shift m =
    # max_k (g - u): only an all-sentinel column drives it to ~ -PAD (a
    # real sample always has u ~ 0 at its sampling state after
    # preconditioning, even if other states assign it huge energies).
    pad_col = m < jnp.float32(-1.0e8)
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


# Above this many (padded) states a single wsum/fused tile no longer fits
# VMEM (measured on v5e: K=1024 x tile 512 compiles, K=4096 x tile 128 is
# 19.9M vs the 16M scoped limit); larger K routes through _wsum_big (one
# HBM read, in-kernel k-block loops, T1 parked in VMEM scratch) up to
# _WSUM_BIG_MAX_K, then through the two-pass k-blocked scheme
# (denominator partials + weight sums, same dd math).
_WSUM_MAX_K = 2048

# _wsum_big budget: the double-buffered input planes are 16 B/element
# (2 planes x 2 buffers x 4 B) and the T1 scratch pair adds 8 B/element,
# so the live set is ~24 * K_pad * tile bytes; K_pad = 4096 x tile 128 is
# ~12 MB + ~1 MB of k-block-sized exp temps, inside the 16 MB scoped VMEM.
_WSUM_BIG_MAX_K = 4096
_WSUM_BIG_KBLK = 512


def _wsum_big_kernel(uh_ref, ul_ref, gh_ref, gl_ref, *rest, fast, k_blk, weighted):
    """One (K_pad, TILE_N) column stripe for K too large for one-block temps.

    The k extent is walked in static k_blk-row blocks INSIDE the kernel with
    the T1 = exp((g - u) - m) terms parked in VMEM scratch, so the planes
    are read from HBM once and the dd exp runs once per element — the
    two-pass k-blocked route (denom_sums_dd + wsum_denom_dd) streams the
    planes twice and pays the exp twice, which halves its throughput on the
    flop-bound dd kernel (measured 48.6 vs 99.5 GB/s at K=4096/K=1024).
    Same math and padding conventions as :func:`_wsum_kernel`.
    """
    i = pl.program_id(0)
    if weighted:
        c_ref, sh_ref, sl_ref, t1h_ref, t1l_ref = rest
    else:
        sh_ref, sl_ref, t1h_ref, t1l_ref = rest
    K_pad = uh_ref.shape[0]
    nblk = K_pad // k_blk

    # Global per-column shift in plain f32 (it only has to be a nearby
    # representable value; _exp_terms folds it in error-free).
    m = jnp.max(gh_ref[0:k_blk, :] - uh_ref[0:k_blk, :], axis=0, keepdims=True)
    for b in range(1, nblk):
        s = slice(b * k_blk, (b + 1) * k_blk)
        m = jnp.maximum(
            m, jnp.max(gh_ref[s, :] - uh_ref[s, :], axis=0, keepdims=True)
        )

    # Denominator sums over all k, storing each block's T1 terms.
    s_hi = jnp.zeros_like(m)
    s_lo = jnp.zeros_like(m)
    for b in range(nblk):
        s = slice(b * k_blk, (b + 1) * k_blk)
        e_hi, e_lo = _exp_terms(
            uh_ref[s, :], ul_ref[s, :], gh_ref[s, :], gl_ref[s, :], m, fast=fast
        )
        t1h_ref[s, :] = e_hi
        t1l_ref[s, :] = e_lo
        th, tl = _dd_tree_sum(e_hi, e_lo, axis=0)
        s_hi, s_lo = dd_add(s_hi, s_lo, th, tl)

    r_hi, r_lo = dd_recip(s_hi, s_lo)
    # Padded sample columns: every row sentinel, so m ~ -2e10 (see
    # _wsum_kernel's pad_col rationale).
    pad_col = m < jnp.float32(-1.0e8)
    r_hi = jnp.where(pad_col, jnp.float32(0.0), r_hi)
    r_lo = jnp.where(pad_col, jnp.float32(0.0), r_lo)
    if weighted:
        r_hi, r_lo = dd_mul_f(r_hi, r_lo, c_ref[:, :])

    @pl.when(i == 0)
    def _():
        sh_ref[:, :] = jnp.zeros_like(sh_ref)
        sl_ref[:, :] = jnp.zeros_like(sl_ref)

    for b in range(nblk):
        s = slice(b * k_blk, (b + 1) * k_blk)
        w_hi, w_lo = dd_mul(t1h_ref[s, :], t1l_ref[s, :], r_hi, r_lo)
        th, tl = _dd_tree_sum(w_hi, w_lo, axis=1)  # (k_blk, 1)
        nh, nl = dd_add(sh_ref[s, :], sl_ref[s, :], th, tl)
        sh_ref[s, :] = nh
        sl_ref[s, :] = nl


def _wsum_big(u_hi, u_lo, g_hi, g_lo, c, tile_n, interpret, fast):
    """Single-read wsum for 2048 < K_pad <= 4096: grid over column stripes,
    full-K input blocks, T1 in VMEM scratch.  Inputs must be pre-padded to
    (K_pad pow2, N multiple of tile_n); returns (S_hi, S_lo): (K_pad,)."""
    K_pad, Np = u_hi.shape
    grid = (Np // tile_n,)

    block_u = pl.BlockSpec((K_pad, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM)
    block_g = pl.BlockSpec((K_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [block_u, block_u, block_g, block_g]
    operands = [u_hi, u_lo, g_hi.reshape(K_pad, 1), g_lo.reshape(K_pad, 1)]
    if c is not None:
        in_specs.append(
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM)
        )
        operands.append(c.reshape(1, Np))

    with jax.enable_x64(False):
        s_hi, s_lo = pl.pallas_call(
            functools.partial(
                _wsum_big_kernel,
                fast=fast,
                k_blk=min(_WSUM_BIG_KBLK, K_pad),
                weighted=c is not None,
            ),
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((K_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((K_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((K_pad, 1), jnp.float32),
                jax.ShapeDtypeStruct((K_pad, 1), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((K_pad, tile_n), jnp.float32),
                pltpu.VMEM((K_pad, tile_n), jnp.float32),
            ],
            interpret=interpret,
        )(*operands)
    return s_hi.reshape(K_pad), s_lo.reshape(K_pad)


def _wsum_kernel(uh_ref, ul_ref, gh_ref, gl_ref, *rest, fast, weighted=False):
    """One (K, TILE_N) tile: accumulate S_k += sum_n c_n N_k W_nk, one exp/element.

    The polish iteration's two logsumexp reductions collapse algebraically:
    with T1 = exp((g - u) - m_n) the logden terms and s_n their column sum,
    the lognum terms are exactly T1 / s_n (= N_k W_nk, each in [0, 1]), so
    one dd exp + one dd reciprocal per column + one dd multiply replace the
    second full exp evaluation — ~2x fewer VPU flops per element than the
    logden+lognum formulation (_fused_polish_kernel).  The accumulated
    S_k = sum_n N_k W_nk gives the gradient directly (g_k = S_k - N_k) and
    the SC update (f_sci = f_k + ln N_k - ln S_k); no stabilizer m_k or
    final log is needed since every term is in [0, 1] and S_k <= N.

    ``weighted`` adds a (1, T) per-sample count plane c_n (exact small f32
    integers) multiplied into the weights before the per-state reduction:
    S_k = sum_n c_n N_k W_nk — a bootstrap replicate IS the original data
    reweighted by its resample counts, so replicate solves stream the same
    planes with this one extra dd-by-f32 multiply (+4 bytes/column of HBM).
    """
    i = pl.program_id(0)
    if weighted:
        c_ref, sh_ref, sl_ref = rest
    else:
        sh_ref, sl_ref = rest
    uh = uh_ref[:, :]
    ul = ul_ref[:, :]
    gh = gh_ref[:, :]  # (K, 1)
    gl = gl_ref[:, :]

    m = jnp.max(gh - uh, axis=0, keepdims=True)  # (1, T)
    e_hi, e_lo = _exp_terms(uh, ul, gh, gl, m, fast=fast)  # T1, dd
    s_hi, s_lo = _dd_tree_sum(e_hi, e_lo, axis=0)  # (1, T) denom sums

    r_hi, r_lo = dd_recip(s_hi, s_lo)
    # Padded sample columns (u = +PAD in EVERY row) have s ~ K * exp(clamp):
    # T1/s would be a phantom 1/K weight — zero their reciprocal instead.
    # Detected via the shift m (~ -PAD only when ALL rows are sentinel;
    # a real sample keeps u ~ 0 at its sampling state even when other
    # states assign it huge energies).
    pad_col = m < jnp.float32(-1.0e8)
    r_hi = jnp.where(pad_col, jnp.float32(0.0), r_hi)
    r_lo = jnp.where(pad_col, jnp.float32(0.0), r_lo)
    if weighted:
        # Fold the counts into the reciprocal (one (1, T) dd-by-f32 multiply
        # instead of a (K, T) one on the weights).
        c = c_ref[:, :]
        r_hi, r_lo = dd_mul_f(r_hi, r_lo, c)

    w_hi, w_lo = dd_mul(e_hi, e_lo, r_hi, r_lo)  # (c_n) N_k W_nk, dd
    th, tl = _dd_tree_sum(w_hi, w_lo, axis=1)  # (K, 1)

    @pl.when(i == 0)
    def _():
        sh_ref[:, :] = jnp.zeros_like(th)
        sl_ref[:, :] = jnp.zeros_like(tl)

    nh, nl = dd_add(sh_ref[:, :], sl_ref[:, :], th, tl)
    sh_ref[:, :] = nh
    sl_ref[:, :] = nl


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret", "fast"))
def wsum_dd(u_hi, u_lo, g_hi, g_lo, c=None, tile_n=_TILE_N, interpret=False, fast=True):
    """S_k = sum_n c_n N_k W_nk in double-word precision, one pass over u.

    u_hi/u_lo: (K, N) dd planes of the (preconditioned) reduced potentials;
    g_hi/g_lo: (K,) dd planes of f_k + ln N_k; c: optional (N,) f32
    per-sample counts (bootstrap-resample multiplicities; None = unweighted).
    Returns (S_hi, S_lo): (K,) f32 pairs with S_k in [0, max(c) N] and
    ~1e-13 relative accuracy.

    This is THE polish-phase kernel: gradient g_k = S_k - N_k exactly
    (Eq. C6 with exp(f+lognum) = S/N substituted), self-consistent update
    f_sci = f_k + ln N_k - ln S_k (Eq. C3), weight column sums S_k / N_k.
    Per-device partial S_k sums merge exactly with dd adds across
    sample-sharded meshes (the multi-chip form needs no extra plumbing).
    With ``c`` it is also the bootstrap-replicate kernel: a resample is the
    same dataset with integer sample multiplicities, so replicate gradients
    come from the same resident planes (reference semantics
    pymbar 4.x mbar.py:417-449, which gathers a resampled
    matrix per replicate instead).
    """
    K, N = u_hi.shape
    K_pad = 1 << (K - 1).bit_length()
    if _WSUM_MAX_K < K_pad <= _WSUM_BIG_MAX_K:
        # Too many states for one-block temps but inside the scratch
        # budget: single-read route (in-kernel k-block loops, T1 parked in
        # VMEM — one HBM pass, one dd exp per element).
        if tile_n is None:
            tile_n = _pick_tile_wsum(K_pad)
        n_pad = (-N) % tile_n
        if K_pad != K or n_pad:
            u_hi = jnp.pad(
                u_hi, ((0, K_pad - K), (0, n_pad)), constant_values=_PAD_U
            )
            u_lo = jnp.pad(u_lo, ((0, K_pad - K), (0, n_pad)))
            g_hi = jnp.pad(g_hi, (0, K_pad - K), constant_values=-_PAD_U)
            g_lo = jnp.pad(g_lo, (0, K_pad - K))
            if c is not None:
                c = jnp.pad(c, (0, n_pad))
        s_hi, s_lo = _wsum_big(
            u_hi, u_lo, g_hi, g_lo, c, tile_n, interpret, fast
        )
        return s_hi[:K], s_lo[:K]
    if K_pad > _WSUM_MAX_K:
        # Beyond the single-read scratch budget: two-pass k-blocked route
        # (same dd math, one extra read of the planes).  The shift must be
        # global over k, so one cheap f32 max pass precedes.
        m_n = jnp.max(g_hi[:, None] - u_hi, axis=0)
        dh, dl = denom_sums_dd(
            u_hi, u_lo, g_hi, g_lo, m_n, tile_n=tile_n, interpret=interpret,
            fast=fast,
        )
        # Sentinel pad columns: m ~ max(g) - PAD << 0 while preconditioned
        # real columns sit at O(+-100); zero them so the weight pass masks.
        pad_col = m_n < jnp.float32(-1.0e8)
        dh = jnp.where(pad_col, jnp.float32(0.0), dh)
        dl = jnp.where(pad_col, jnp.float32(0.0), dl)
        return wsum_denom_dd(
            u_hi, u_lo, g_hi, g_lo, m_n, dh, dl, c=c, tile_n=tile_n,
            interpret=interpret, fast=fast,
        )
    if tile_n is None:
        tile_n = _pick_tile_wsum(K_pad)
    n_pad = (-N) % tile_n
    if K_pad != K or n_pad:
        # Padded state rows take u=+PAD, g=-PAD: their T1 underflows to
        # exp(clamp) ~ 1e-37, a negligible perturbation of s_n, and their
        # S rows are sliced off.  Padded sample columns are masked in-kernel.
        u_hi = jnp.pad(u_hi, ((0, K_pad - K), (0, n_pad)), constant_values=_PAD_U)
        u_lo = jnp.pad(u_lo, ((0, K_pad - K), (0, n_pad)))
        g_hi = jnp.pad(g_hi, (0, K_pad - K), constant_values=-_PAD_U)
        g_lo = jnp.pad(g_lo, (0, K_pad - K))
        if c is not None:
            c = jnp.pad(c, (0, n_pad))
    Np = N + n_pad
    grid = (Np // tile_n,)

    block_u = pl.BlockSpec((K_pad, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM)
    block_g = pl.BlockSpec((K_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    block_c = pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM)
    in_specs = [block_u, block_u, block_g, block_g]
    operands = [u_hi, u_lo, g_hi.reshape(K_pad, 1), g_lo.reshape(K_pad, 1)]
    if c is not None:
        in_specs.append(block_c)
        operands.append(c.reshape(1, Np))

    with jax.enable_x64(False):
        s_hi, s_lo = pl.pallas_call(
            functools.partial(_wsum_kernel, fast=fast, weighted=c is not None),
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((K_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((K_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((K_pad, 1), jnp.float32),
                jax.ShapeDtypeStruct((K_pad, 1), jnp.float32),
            ],
            interpret=interpret,
        )(*operands)

    return s_hi.reshape(K_pad)[:K], s_lo.reshape(K_pad)[:K]


@jax.jit
def wsum_dd_ref(u_hi, u_lo, g_hi, g_lo, c=None):
    """Pure-jnp reference of ``wsum_dd`` (true-f64 inner math, off-TPU).

    S_k = sum_n c_n exp(g_k - u_kn - logden_n) with logden from the dd
    planes (c = 1 when None); sentinel pad columns contribute exactly zero,
    matching the kernel mask.
    """
    u64 = u_hi.astype(jnp.float64) + u_lo.astype(jnp.float64)
    g64 = (g_hi.astype(jnp.float64) + g_lo.astype(jnp.float64))[:, None]
    a = g64 - u64
    m = jnp.max(a, axis=0, keepdims=True)
    s = jnp.sum(jnp.exp(a - m), axis=0, keepdims=True)
    w = jnp.exp(a - m) / s
    # all-sentinel detection via the shift, matching the kernel mask
    pad_col = m < -1.0e8
    w = jnp.where(pad_col, 0.0, w)
    if c is not None:
        w = w * c.astype(jnp.float64)[None, :]
    S64 = jnp.sum(w, axis=1)
    sh = S64.astype(jnp.float32)
    sl = (S64 - sh.astype(jnp.float64)).astype(jnp.float32)
    return sh, sl


# -----------------------------------------------------------------------------
# K-sharded (2-D mesh) building blocks: the wsum factorization split at the
# cross-k-block boundary.  Each k-block device computes (a) its partial
# denominator sums with a GLOBAL per-column shift m_n (pmax over 'k'),
# which combine exactly across blocks with dd adds, then (b) its local
# T1/s weight sums given the combined denominator.  m_n cancels exactly in
# T1/s, so the only cross-block agreement needed is the shift itself.
# -----------------------------------------------------------------------------


def _denom_sums_kernel(uh_ref, ul_ref, gh_ref, gl_ref, m_ref, oh_ref, ol_ref, *, fast):
    """One (K_blk, TILE_N) tile: s_n += sum_k exp((g - u) - m_n) with the
    stabilizing shift m_n supplied; k-blocks (grid dim 0) accumulate into
    the same per-column output with exact dd adds."""
    b = pl.program_id(0)
    uh = uh_ref[:, :]
    ul = ul_ref[:, :]
    gh = gh_ref[:, :]  # (K_blk, 1)
    gl = gl_ref[:, :]
    m = m_ref[:, :]  # (1, T)

    e_hi, e_lo = _exp_terms(uh, ul, gh, gl, m, fast=fast)
    s_hi, s_lo = _dd_tree_sum(e_hi, e_lo, axis=0)  # (1, T)

    @pl.when(b == 0)
    def _():
        oh_ref[:, :] = s_hi
        ol_ref[:, :] = s_lo

    @pl.when(b != 0)
    def _():
        nh, nl = dd_add(oh_ref[:, :], ol_ref[:, :], s_hi, s_lo)
        oh_ref[:, :] = nh
        ol_ref[:, :] = nl


def _k_blocking(K):
    """(K_padded, K_block, num_blocks, tile_n) for a state extent K.

    One pow2 block when it fits VMEM (1-D grid, K*tile <= 2^19 measured);
    otherwise 1024-row blocks on a 2-D (block, tile) grid — where Mosaic's
    pipelining doubles the buffering twice over, so the per-block budget
    drops to K_blk*tile <= 2^17 (measured on v5e: 1024x256 is 18M vs the
    16M limit, 1024x128 compiles)."""
    K_pad = 1 << (K - 1).bit_length()
    if K_pad <= _WSUM_MAX_K:
        return K_pad, K_pad, 1, _pick_tile_wsum(K_pad)
    K_blk = 1024
    return K_pad, K_blk, K_pad // K_blk, 128


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret", "fast"))
def denom_sums_dd(u_hi, u_lo, g_hi, g_lo, m_n, tile_n=_TILE_N, interpret=False, fast=True):
    """Per-column denominator sums s_n = sum_k exp((g_k - u_kn) - m_n).

    Returns (s_hi, s_lo): (N,) f32 pairs.  m_n must be the GLOBAL shift
    (max over ALL k-blocks/devices of g - u) so partials from different
    k-blocks share a scale and combine with dd adds.  K beyond the
    single-tile VMEM limit blocks internally over grid dim 0.
    """
    K, N = u_hi.shape
    K_pad, K_blk, k_blocks, auto_tile = _k_blocking(K)
    if tile_n is None:
        tile_n = auto_tile
    n_pad = (-N) % tile_n
    if K_pad != K or n_pad:
        u_hi = jnp.pad(u_hi, ((0, K_pad - K), (0, n_pad)), constant_values=_PAD_U)
        u_lo = jnp.pad(u_lo, ((0, K_pad - K), (0, n_pad)))
        g_hi = jnp.pad(g_hi, (0, K_pad - K), constant_values=-_PAD_U)
        g_lo = jnp.pad(g_lo, (0, K_pad - K))
        m_n = jnp.pad(m_n, (0, n_pad))
    Np = N + n_pad
    grid = (k_blocks, Np // tile_n)

    with jax.enable_x64(False):
        s_hi, s_lo = pl.pallas_call(
            functools.partial(_denom_sums_kernel, fast=fast),
            grid=grid,
            in_specs=[
                pl.BlockSpec((K_blk, tile_n), lambda b, i: (b, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((K_blk, tile_n), lambda b, i: (b, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((K_blk, 1), lambda b, i: (b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((K_blk, 1), lambda b, i: (b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_n), lambda b, i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, tile_n), lambda b, i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_n), lambda b, i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((1, Np), jnp.float32),
                jax.ShapeDtypeStruct((1, Np), jnp.float32),
            ],
            interpret=interpret,
        )(
            u_hi,
            u_lo,
            g_hi.reshape(K_pad, 1),
            g_lo.reshape(K_pad, 1),
            m_n.reshape(1, Np),
        )
    return s_hi.reshape(-1)[:N], s_lo.reshape(-1)[:N]


@jax.jit
def denom_sums_dd_ref(u_hi, u_lo, g_hi, g_lo, m_n):
    """Pure-jnp reference of ``denom_sums_dd`` (true-f64 inner sum)."""
    u64 = u_hi.astype(jnp.float64) + u_lo.astype(jnp.float64)
    g64 = (g_hi.astype(jnp.float64) + g_lo.astype(jnp.float64))[:, None]
    s64 = jnp.sum(jnp.exp(g64 - u64 - m_n.astype(jnp.float64)[None, :]), axis=0)
    sh = s64.astype(jnp.float32)
    sl = (s64 - sh.astype(jnp.float64)).astype(jnp.float32)
    return sh, sl


def _wsum_denom_kernel(
    uh_ref, ul_ref, gh_ref, gl_ref, m_ref, dh_ref, dl_ref, *rest, fast,
    weighted=False,
):
    """One (K_blk, TILE_N) tile: S_k += sum_n c_n T1 / s_n with s_n supplied."""
    i = pl.program_id(1)
    if weighted:
        c_ref, sh_ref, sl_ref = rest
    else:
        sh_ref, sl_ref = rest
    uh = uh_ref[:, :]
    ul = ul_ref[:, :]
    gh = gh_ref[:, :]
    gl = gl_ref[:, :]
    m = m_ref[:, :]  # (1, T)
    dh = dh_ref[:, :]  # (1, T) combined denominator sums
    dl = dl_ref[:, :]

    e_hi, e_lo = _exp_terms(uh, ul, gh, gl, m, fast=fast)
    r_hi, r_lo = dd_recip(dh, dl)
    # Pad columns carry s = 0 exactly (the orchestrator zeroes them after
    # the cross-block combine); mask their reciprocal.
    pad_col = dh <= jnp.float32(0.0)
    r_hi = jnp.where(pad_col, jnp.float32(0.0), r_hi)
    r_lo = jnp.where(pad_col, jnp.float32(0.0), r_lo)
    if weighted:
        r_hi, r_lo = dd_mul_f(r_hi, r_lo, c_ref[:, :])

    w_hi, w_lo = dd_mul(e_hi, e_lo, r_hi, r_lo)
    th, tl = _dd_tree_sum(w_hi, w_lo, axis=1)

    @pl.when(i == 0)
    def _():
        sh_ref[:, :] = jnp.zeros_like(th)
        sl_ref[:, :] = jnp.zeros_like(tl)

    nh, nl = dd_add(sh_ref[:, :], sl_ref[:, :], th, tl)
    sh_ref[:, :] = nh
    sl_ref[:, :] = nl


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret", "fast"))
def wsum_denom_dd(
    u_hi, u_lo, g_hi, g_lo, m_n, d_hi, d_lo, c=None, tile_n=_TILE_N,
    interpret=False, fast=True,
):
    """S_k = sum_n c_n exp((g_k - u_kn) - m_n) / s_n for this device's
    k-block, with the cross-block-combined denominator sums (d_hi, d_lo)
    supplied (c = 1 when None).

    The shift m_n cancels exactly in T1/s, so S_k = sum_n c_n N_k W_nk as in
    :func:`wsum_dd`; this split form serves K-sharded (2-D mesh) solves
    where no single device holds all states, and the k-blocked large-K
    single-device route.  Returns (S_hi, S_lo): (K,).
    """
    K, N = u_hi.shape
    K_pad, K_blk, k_blocks, auto_tile = _k_blocking(K)
    if tile_n is None:
        tile_n = auto_tile
    n_pad = (-N) % tile_n
    if K_pad != K or n_pad:
        u_hi = jnp.pad(u_hi, ((0, K_pad - K), (0, n_pad)), constant_values=_PAD_U)
        u_lo = jnp.pad(u_lo, ((0, K_pad - K), (0, n_pad)))
        g_hi = jnp.pad(g_hi, (0, K_pad - K), constant_values=-_PAD_U)
        g_lo = jnp.pad(g_lo, (0, K_pad - K))
        m_n = jnp.pad(m_n, (0, n_pad))
        d_hi = jnp.pad(d_hi, (0, n_pad))  # pad columns: s = 0 -> masked
        d_lo = jnp.pad(d_lo, (0, n_pad))
        if c is not None:
            c = jnp.pad(c, (0, n_pad))
    Np = N + n_pad
    grid = (k_blocks, Np // tile_n)

    block_u = pl.BlockSpec((K_blk, tile_n), lambda b, i: (b, i), memory_space=pltpu.VMEM)
    block_g = pl.BlockSpec((K_blk, 1), lambda b, i: (b, 0), memory_space=pltpu.VMEM)
    block_n = pl.BlockSpec((1, tile_n), lambda b, i: (0, i), memory_space=pltpu.VMEM)
    in_specs = [block_u, block_u, block_g, block_g, block_n, block_n, block_n]
    operands = [
        u_hi,
        u_lo,
        g_hi.reshape(K_pad, 1),
        g_lo.reshape(K_pad, 1),
        m_n.reshape(1, Np),
        d_hi.reshape(1, Np),
        d_lo.reshape(1, Np),
    ]
    if c is not None:
        in_specs.append(block_n)
        operands.append(c.reshape(1, Np))

    with jax.enable_x64(False):
        s_hi, s_lo = pl.pallas_call(
            functools.partial(
                _wsum_denom_kernel, fast=fast, weighted=c is not None
            ),
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((K_blk, 1), lambda b, i: (b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((K_blk, 1), lambda b, i: (b, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((K_pad, 1), jnp.float32),
                jax.ShapeDtypeStruct((K_pad, 1), jnp.float32),
            ],
            interpret=interpret,
        )(*operands)
    return s_hi.reshape(K_pad)[:K], s_lo.reshape(K_pad)[:K]


@jax.jit
def wsum_denom_dd_ref(u_hi, u_lo, g_hi, g_lo, m_n, d_hi, d_lo, c=None):
    """Pure-jnp reference of ``wsum_denom_dd`` (true-f64 inner math)."""
    u64 = u_hi.astype(jnp.float64) + u_lo.astype(jnp.float64)
    g64 = (g_hi.astype(jnp.float64) + g_lo.astype(jnp.float64))[:, None]
    d64 = d_hi.astype(jnp.float64) + d_lo.astype(jnp.float64)
    t = jnp.exp(g64 - u64 - m_n.astype(jnp.float64)[None, :])
    w = jnp.where(d64[None, :] > 0.0, t / jnp.where(d64 == 0.0, 1.0, d64)[None, :], 0.0)
    if c is not None:
        w = w * c.astype(jnp.float64)[None, :]
    S64 = jnp.sum(w, axis=1)
    sh = S64.astype(jnp.float32)
    sl = (S64 - sh.astype(jnp.float64)).astype(jnp.float32)
    return sh, sl


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
    # all-sentinel detection via the column shift (a real sample keeps
    # u ~ 0 at its sampling state even if other states assign it huge u)
    m = jnp.max(g_hi[:, None] - u_hi, axis=0)
    pad_col = m < jnp.float32(-1.0e8)
    ldh = jnp.where(pad_col, jnp.float32(_PAD_U), ldh)
    ldl = jnp.where(pad_col, jnp.float32(0.0), ldl)
    if return_sums:
        return _lognum_sums_ref(u_hi, u_lo, ldh, ldl, m_k)
    return lognum_dd_ref(u_hi, u_lo, ldh, ldl, m_k)
