"""TPU-scale MBAR solver: f32 phase + double-word Newton polish.

The production path for K x N problems in the 10^9-element range
(BASELINE.md targets).  The reduced-potential matrix is held as two float32
planes (hi, lo) — the same 8 bytes/element as f64 — and the solve runs in
two phases:

1. **f32 phase** — for large problems, the adaptive solver
   (`solvers._adaptive_while`) on a 1/16-strided SUBSAMPLE of the hi plane
   (a consistent MBAR estimate ~1e-2 from the full solution at 1/16 the
   cost), which also supplies the polish's chord factor from the subsample
   Gram; small problems run the adaptive loop on the full hi plane.  The
   achievable relative convergence is measured with the 'mixed' metric
   (divide by max(|f_k|, 1)) because the reference's purely relative metric
   never settles for states with near-zero f_k.
2. **double-word Newton polish** — one device while_loop of chord-Newton
   iterations, each ONE fused Pallas pass producing S_k = sum_n N_k W_nk in
   double-word precision (:mod:`pymbar_tpu.ops.pallas_kernels`, ~1e-13
   effective) and hence the exact gradient S_k - N_k; the frozen K x K
   factor comes from the f32 Gram (the Newton direction needs no more
   precision; convergence is certified on the compensated gradient).  A
   full-plane f32 adaptive + fresh-factor retry covers the rare case where
   the subsample factor fails to contract.

This replaces XLA's f64 emulation on the hot path (measured ~5x slower than
f32) without giving up the 1e-12-level convergence the MBAR tolerances
demand (SURVEY.md §7 hard part #1).
"""

import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pymbar_tpu.config import on_tpu
from pymbar_tpu.ops.doubledouble import dd_from_f64, dd_to_f64
from pymbar_tpu.ops.mbar_core import gram_f32_acc64
from pymbar_tpu.ops.pallas_kernels import _exp_terms, wsum_dd, wsum_dd_ref
from pymbar_tpu.solvers import _adaptive_while

logger = logging.getLogger(__name__)

__all__ = [
    "solve_mbar_dd",
    "split_u_kn_streamed",
    "host_split_planes",
    "bootstrap_polish_dd",
    "solve_mbar_dd_bootstrap",
]

# Below this many K x N plane elements (~0.5 GB of hi plane) the coarse
# strided-subsample warm start is not worth its fixed costs and the f32
# phase runs on the full plane.  Module constant so tests can exercise the
# coarse path on small problems.
COARSE_MIN_ELEMS = 2**27


def _coarse_stride(N_k_host, n_elems):
    """Subsample stride for the coarse warm start (0 = don't).

    Capped so every state keeps >= 16 subsamples — the subsample Gram must
    remain a usable chord factor (its ~1/sqrt(n_sub) statistical error only
    needs to beat the ~1e-2 contraction target per iteration).
    """
    if n_elems < COARSE_MIN_ELEMS:
        return 0
    stride = min(16, int(N_k_host.min()) // 16)
    return stride if stride >= 2 else 0


@partial(jax.jit, donate_argnums=(0,))
def _split_inplaceish(u64):
    hi = u64.astype(jnp.float32)
    lo = (u64 - hi.astype(u64.dtype)).astype(jnp.float32)
    return hi, lo


def split_u_kn_streamed(u64):
    """Split a float64 u_kn into (hi, lo) f32 planes, donating the input."""
    return _split_inplaceish(jnp.asarray(u64))


@partial(jax.jit, static_argnames=("chunks",))
def _dev_split_planes_jit(u64, chunks):
    K_, N_ = u64.shape
    nc = max(1, N_ // chunks)
    n_main = N_ // nc

    shift = jnp.min(u64, axis=0)

    def body(c, planes):
        uh, ul = planes
        blk = jax.lax.dynamic_slice(u64, (0, c * nc), (K_, nc))
        blk = blk - jax.lax.dynamic_slice(shift, (c * nc,), (nc,))[None, :]
        hi = blk.astype(jnp.float32)
        lo = (blk - hi.astype(jnp.float64)).astype(jnp.float32)
        return (
            jax.lax.dynamic_update_slice(uh, hi, (0, c * nc)),
            jax.lax.dynamic_update_slice(ul, lo, (0, c * nc)),
        )

    planes = (
        jnp.zeros((K_, N_), jnp.float32),
        jnp.zeros((K_, N_), jnp.float32),
    )
    planes = jax.lax.fori_loop(0, n_main, body, planes)
    rem = N_ - n_main * nc
    if rem:
        blk = u64[:, n_main * nc :] - shift[n_main * nc :][None, :]
        hi = blk.astype(jnp.float32)
        lo = (blk - hi.astype(jnp.float64)).astype(jnp.float32)
        planes = (
            jax.lax.dynamic_update_slice(planes[0], hi, (0, n_main * nc)),
            jax.lax.dynamic_update_slice(planes[1], lo, (0, n_main * nc)),
        )
    return planes


def dev_split_planes(u64):
    """Device-side double-word split of a RESIDENT float64 u_kn.

    The device twin of :func:`host_split_planes` (same per-sample min
    shift): one chunked jit pass builds the (hi, lo) f32 planes next to
    the resident matrix with only ~chunk-sized f64 temps live.  Peak HBM
    is u_kn (8 B/elem) + planes (8 B/elem) + one chunk — fine below ~half
    the chip's HBM; a host matrix that large should split host-side
    instead.
    """
    u64 = jnp.asarray(u64)
    chunks = max(1, int(u64.nbytes // (256 * 2**20)))
    return _dev_split_planes_jit(u64, chunks)


def host_split_planes(u_np):
    """Host-side double-word split of a float64 u_kn into (hi, lo) planes.

    Applies the per-sample min shift (gradients are shift-invariant and the
    dd solvers never consume the objective value) and splits chunkwise in
    pure numpy: pushing chunks through the device for the cast costs two
    full host<->device round trips of the matrix (minutes on a tunneled TPU
    frontend) for work the host does in seconds.  Returns (u_hi, u_lo) as
    numpy float32 arrays.
    """
    u_np = np.asarray(u_np, dtype=np.float64)
    shift = u_np.min(axis=0)
    K_, N_ = u_np.shape
    uh = np.empty((K_, N_), dtype=np.float32)
    ul = np.empty((K_, N_), dtype=np.float32)
    chunk = max(1, int(2**27 // max(K_, 1)))
    for s in range(0, N_, chunk):
        blk = u_np[:, s : s + chunk] - shift[s : s + chunk][None, :]
        bh = blk.astype(np.float32)
        uh[:, s : s + chunk] = bh
        ul[:, s : s + chunk] = (blk - bh.astype(np.float64)).astype(np.float32)
    return uh, ul


def _newton_factor(gram, colsum, N_k64):
    """Explicit inverse of the reduced Hessian from the f32 Gram (f64 algebra).

    Computed once per polish and reused across iterations (chord/frozen-
    Newton): H moves by only ~|delta f| ~ 1e-4 relative between polish
    iterations while each iteration only needs ~1e-2 contraction, so the
    stale factor costs nothing observable.  The EXPLICIT inverse (one
    Cholesky solve against I up front) is deliberate: inside the polish
    while_loop a triangular cho_solve is a K-step sequential recurrence —
    latency-bound and emulated-f64 on TPU (~15 ms/iteration at K=1024) —
    whereas Hinv @ g is a single MXU matmul.  The mild extra rounding of an
    explicit inverse is irrelevant for a chord direction that only needs
    1e-2 contraction.
    """
    gram = gram.astype(jnp.float64)
    colsum = colsum.astype(jnp.float64)
    H = -(gram * N_k64[None, :] * N_k64[:, None] - jnp.diag(colsum * N_k64))
    c, lower = jax.scipy.linalg.cho_factor(H[1:, 1:])
    return jax.scipy.linalg.cho_solve(
        (c, lower), jnp.eye(H.shape[0] - 1, dtype=jnp.float64)
    )


def _newton_step_g(f, g, hinv, gamma):
    """One f64 K-vector chord-Newton step from the exact gradient
    g_k = S_k - N_k (the wsum form — no log/exp roundtrip)."""
    dx1 = hinv @ g[1:]
    dx = jnp.concatenate([jnp.zeros((1,), dtype=f.dtype), dx1])
    f_new = f - gamma * dx
    return f_new - f_new[0]


def _polish_loop(wsum, u_hi, u_lo, N_k64, f0, hinv, logN, tol, gamma, maxiter):
    """Traceable dd-polish while_loop, shared by the single-device and
    n-sharded solvers (``wsum`` is the respective S_k = sum N_k W_nk pass).

    The host version of this loop synchronized on every iteration (two
    K-vector device->host copies plus a dispatch bubble per step — measured
    ~45 ms/iteration against the ~66 ms kernel pass at the 8 GB bench
    config).  Under jit only the kernel passes and the (tiny) chord-Newton
    updates are on the timeline; the host sees one sync at the end.  Stop
    rules: converged (delta < tol), stalled (>= 2nd iteration, delta < 1e-9
    yet > 0.3 x previous), tiny (delta < 3e-13), or predictive
    (delta^2/prev < 1e-14, i.e. even the extrapolated next step would sit
    below the floor) — the last three mark the dd noise floor
    (docs/numerics.md); a stop that met the requested tol is NOT flagged as
    noise-floor.

    Returns (f, iterations, g_last, deltas[maxiter] nan-padded,
    converged, at_noise_floor).
    """

    def cond(carry):
        it, _f, _g, _prev, _deltas, done, _floor, _bad = carry
        return jnp.logical_and(it < maxiter, jnp.logical_not(done))

    def body(carry):
        it, f, _g, prev_d, deltas, _done, floor, _bad = carry
        gh, gl = dd_from_f64(f + logN)
        Sh, Sl = wsum(u_hi, u_lo, gh, gl)
        g = dd_to_f64(Sh, Sl) - N_k64
        f_new = _newton_step_g(f, g, hinv, gamma)
        div = jnp.maximum(jnp.abs(f_new[1:]), 1.0)
        d = jnp.max(jnp.abs(f_new[1:] - f[1:]) / div)
        deltas = deltas.at[it].set(d)

        # A non-finite step (e.g. a NaN factor from a non-PD subsample
        # Gram) stops immediately WITHOUT taking the step, so the caller's
        # fallback restarts from the last finite iterate.
        bad = ~jnp.isfinite(d)
        conv = d < tol
        stalled = (it >= 1) & (d < 1.0e-9) & (d > 0.3 * prev_d)
        tiny = d < 3.0e-13
        pred = jnp.where(jnp.isfinite(prev_d), d * d / prev_d, jnp.inf)
        at_floor = ~conv & (stalled | tiny | (pred < 1.0e-14))
        return (
            it + 1, jnp.where(bad, f, f_new), g, d, deltas,
            conv | at_floor | bad, floor | at_floor, bad,
        )

    deltas0 = jnp.full((maxiter,), jnp.nan, dtype=jnp.float64)
    it, f, g, _prev, deltas, done, floor, bad = jax.lax.while_loop(
        cond,
        body,
        (
            jnp.int32(0), f0, jnp.zeros_like(f0),
            jnp.asarray(jnp.inf, jnp.float64), deltas0, False, False, False,
        ),
    )
    # every stop except maxiter-exhaustion or a non-finite step converged
    return f, it, g, deltas, done & ~bad, floor


@partial(
    jax.jit, static_argnames=("maxiter", "use_pallas", "fast")
)
def _polish_while_dd(
    u_hi, u_lo, N_k64, f0, hinv, logN, tol, gamma,
    maxiter, use_pallas, fast,
):
    """The single-device dd Newton polish as ONE device while_loop."""
    _wsum = (
        partial(wsum_dd, fast=fast) if use_pallas else wsum_dd_ref
    )
    return _polish_loop(
        _wsum, u_hi, u_lo, N_k64, f0, hinv, logN, tol, gamma, maxiter
    )


@partial(jax.jit, static_argnames=("maxiter", "use_pallas", "fast"))
def _polish_while_dd_w(
    u_hi, u_lo, c, N_k64, f0, hinv, logN, tol, gamma,
    maxiter, use_pallas, fast,
):
    """Counts-weighted single-device dd Newton polish (bootstrap replicates).

    Identical to :func:`_polish_while_dd` except the wsum pass folds the
    (N,) f32 resample counts c — the replicate's gradient is
    g_k = sum_n c_n N_k W_nk - N_k on the SAME resident planes.  c is a
    traced argument, so all replicates of a problem share one compilation.
    """
    _wsum = (
        (lambda uh, ul, gh, gl: wsum_dd(uh, ul, gh, gl, c=c, fast=fast))
        if use_pallas
        else (lambda uh, ul, gh, gl: wsum_dd_ref(uh, ul, gh, gl, c=c))
    )
    return _polish_loop(
        _wsum, u_hi, u_lo, N_k64, f0, hinv, logN, tol, gamma, maxiter
    )


# Ceiling on (planes + resident th) bytes for the batched bootstrap's
# materialized fast-phase plane: 12 B/element (8 B dd planes + 4 B f32 th)
# next to the chip's 16 GB HBM, leaving headroom for the counts matrix,
# chunk temps and the f64-matmul emulation scratch.  The 8 GB bench config
# (K=1024 x N=1e6, 12.3 GB live) fits; the k4096 HBM-edge slice does not
# and falls back to recomputing the dd exp per fast iteration.
_TH_RESIDENT_BUDGET_BYTES = 12.4e9


def _use_resident_th(K, N):
    return 12.0 * K * N <= _TH_RESIDENT_BUDGET_BYTES


@partial(jax.jit, static_argnames=("n_chunk",))
def _materialize_th(u_hi, u_lo, g0h, g0l, n_chunk):
    """One streamed dd-exp pass that WRITES the base-point fast plane
    th_kn = hi(exp((g0_k - u_kn) - m_n)) instead of consuming it.

    T1 depends only on the base point g0 — not on the replicate iterates —
    so the batched loop's fast phase can reuse this plane every iteration
    and skip the dd exp entirely (its per-iteration cost collapses to two
    MXU matmuls per chunk).  Chunked exactly like
    :func:`_batched_wsum_S` so the per-column stabilizer m_n and the exp
    values are bit-identical to the recompute path."""
    K, N = u_hi.shape

    def chunk_th(uh_c, ul_c):
        m = jnp.max(g0h[:, None] - uh_c, axis=0, keepdims=True)
        th, _tl = _exp_terms(uh_c, ul_c, g0h[:, None], g0l[:, None], m)
        return th

    th_full = jnp.zeros((K, N), jnp.float32)
    n_main = N // n_chunk
    if n_main:

        def body(i, acc):
            s = i * n_chunk
            uh_c = jax.lax.dynamic_slice(u_hi, (0, s), (K, n_chunk))
            ul_c = jax.lax.dynamic_slice(u_lo, (0, s), (K, n_chunk))
            return jax.lax.dynamic_update_slice(
                acc, chunk_th(uh_c, ul_c), (0, s)
            )

        th_full = jax.lax.fori_loop(0, n_main, body, th_full)
    rem = N - n_main * n_chunk
    if rem:
        s = n_main * n_chunk
        th_full = jax.lax.dynamic_update_slice(
            th_full, chunk_th(u_hi[:, s:], u_lo[:, s:]), (0, s)
        )
    return th_full


# Sample-segment width for the fast phase's f64-segmented S contraction:
# the (B, nc) x (K, nc) weight-sum matmul runs f32 on the MXU in SEG-wide
# segments with f64 inter-segment adds.  Bounding each f32 accumulation
# chain at 512 terms cuts the pass's relative S error from ~1.7e-6 (full
# nc=2^14 chain) to ~2.5e-8 at UNCHANGED wall time (both measured 0.06 s
# at the 8 GB bench config, profiling/probe_fast_floor.py) — the batched
# dot_general tiles onto the MXU exactly like the flat one.  Through the
# chord iteration's ~750x error amplification that moves the fast phase's
# fixed-point displacement from ~1.3e-3 to ~2e-5, which is what the exact
# phase inherits as its start error (≈2 fewer f64-emulated sweeps).
_FAST_SEG = 512


def _seg_wsum(W, th_c, seg=_FAST_SEG):
    """f64-segmented (B, nc) x (K, nc) -> (B, K) weight-sum contraction:
    f32 MXU dots over ``seg``-wide sample segments, f64 adds between
    segments.  Width need not divide ``seg``; the tail contracts flat."""
    B, nc = W.shape
    K = th_c.shape[0]
    dim_bn_kn = (((1,), (1,)), ((), ()))
    nseg = nc // seg
    S = jnp.zeros((B, K), jnp.float64)
    if nseg:
        main = nseg * seg
        Wr = W[:, :main].reshape(B, nseg, seg)
        Tr = th_c[:, :main].reshape(K, nseg, seg)
        S_seg = jax.lax.dot_general(
            Wr, Tr, (((2,), (2,)), ((1,), (1,))),
            precision=jax.lax.Precision.HIGHEST,
        )  # (nseg, B, K)
        S = jnp.sum(S_seg.astype(jnp.float64), axis=0)
    if nc - nseg * seg:
        S_tail = jax.lax.dot_general(
            W[:, nseg * seg:], th_c[:, nseg * seg:], dim_bn_kn,
            precision=jax.lax.Precision.HIGHEST,
        )
        S = S + S_tail.astype(jnp.float64)
    return S


def _batched_boot_chunk_th(th_c, R32, C_c):
    """Fast-phase chunk contribution from the RESIDENT th plane: no dd
    exp, just the denominator matmul plus the f64-segmented weight-sum
    contraction (:func:`_seg_wsum`) on a pre-computed T1 chunk."""
    dim_bk_kn = (((1,), (0,)), ((), ()))
    den = jax.lax.dot_general(
        R32, th_c, dim_bk_kn, precision=jax.lax.Precision.HIGHEST
    )
    W = C_c / den
    return _seg_wsum(W, th_c)


def _batched_boot_chunk(uh_c, ul_c, g0h, g0l, R, C_c, exact):
    """One sample chunk's contribution to every replicate's weight sum.

    The batched factorization: with T1_kn = exp((g0_k - u_kn) - m_n) the
    dd-exp terms at the BASE point g0 and r_bk = exp(f_bk - f_base,k) the
    per-replicate ratio, replicate b's weights are exactly
    W_bnk = r_bk T1_kn / sum_j r_bj T1_jn — the per-column stabilizer m_n
    cancels, so the expensive dd exp is computed ONCE and shared by every
    replicate, and the per-replicate work collapses to two (B, K) x (K, nc)
    matmuls on the MXU.  ``exact`` selects f64 matmuls (true-f64 accurate
    on TPU via XLA emulation — whole-S error measured 2e-14 — but ~11x the
    f32 MXU cost) vs f64-segmented f32 matmuls on the hi plane only
    (~2.5e-8 relative in S via :func:`_seg_wsum`, which bounds the fast
    phase's fixed-point displacement at ~2e-5).
    Returns the (B, K) partial sum_n C_bn T1_kn / den_bn (the caller
    scales by r_bk).
    """
    m = jnp.max(g0h[:, None] - uh_c, axis=0, keepdims=True)  # (1, nc) f32
    th, tl = _exp_terms(uh_c, ul_c, g0h[:, None], g0l[:, None], m)
    # Both matmuls express their contraction through dot_general dimension
    # numbers instead of materializing T.T: a transposed operand makes XLA
    # relayout-copy the full 4 GB input planes into column-major temps
    # (observed OOM at the 8 GB bench config), while contracting dim 1 of
    # the chunk keeps every operand in the planes' native row-major layout.
    dim_bk_kn = (((1,), (0,)), ((), ()))  # (B,K) x (K,nc) -> (B,nc)
    dim_bn_kn = (((1,), (1,)), ((), ()))  # (B,nc) x (K,nc) -> (B,K)
    if exact:
        T = th.astype(jnp.float64) + tl.astype(jnp.float64)  # (K, nc)
        den = jax.lax.dot_general(R, T, dim_bk_kn)  # (B, nc)
        W = C_c.astype(jnp.float64) / den
        return jax.lax.dot_general(W, T, dim_bn_kn)  # (B, K)
    R32 = R.astype(jnp.float32)
    den = jax.lax.dot_general(
        R32, th, dim_bk_kn, precision=jax.lax.Precision.HIGHEST
    )
    W = C_c / den
    return _seg_wsum(W, th)


def _unpack4(Cp, B):
    """(B, w) uint8 nibble-packed counts -> (B, 2w) f32.  Column 2j sits
    in the high nibble of packed column j, column 2j+1 in the low nibble
    (the host packer in :func:`bootstrap_polish_dd`)."""
    hi = (Cp >> 4).astype(jnp.float32)
    lo = (Cp & 0xF).astype(jnp.float32)
    return jnp.stack([hi, lo], axis=-1).reshape(B, -1)


def _batched_wsum_S(
    u_hi, u_lo, g0h, g0l, R, C, n_chunk, exact, th=None, packed=False
):
    """S_bk = r_bk sum_n c_bn T1_kn / den_bn for all B replicates: one
    streamed dd-exp pass over the planes + two matmuls per chunk.
    Sentinel pad columns (sharded layouts) need no masking here: their
    counts are zero, so they contribute exactly 0/den = 0.

    When ``th`` (the resident base-point fast plane from
    :func:`_materialize_th`) is given, the non-exact pass slices it
    instead of recomputing the dd exp — identical values, ~20x cheaper
    per fast iteration.

    ``packed`` marks ``C`` as 4-bit nibble-packed uint8 of shape
    (B, N//2): resample multiplicities are almost always <= 15, so the
    count matrix can cross the ~60 MB/s tunnel frontend at half a byte
    per sample; chunks unpack on device (:func:`_unpack4`, VPU-trivial
    next to the matmuls)."""
    K, N = u_hi.shape
    B = C.shape[0]
    use_th = th is not None and not exact
    R32 = R.astype(jnp.float32) if use_th else None
    S = jnp.zeros((B, K), jnp.float64)
    n_main = N // n_chunk

    def slice_counts(s, width):
        # counts may arrive uint8 (1 B/sample in HBM, 4x less than f32)
        # or nibble-packed uint8 (0.5 B/sample); the f32 cast happens
        # here, one chunk at a time.
        if packed:
            Cp = jax.lax.dynamic_slice(C, (0, s // 2), (B, width // 2))
            return _unpack4(Cp, B)
        return jax.lax.dynamic_slice(C, (0, s), (B, width)).astype(
            jnp.float32
        )

    if n_main:

        def body(i, acc):
            s = i * n_chunk
            C_c = slice_counts(s, n_chunk)
            if use_th:
                th_c = jax.lax.dynamic_slice(th, (0, s), (K, n_chunk))
                return acc + _batched_boot_chunk_th(th_c, R32, C_c)
            uh_c = jax.lax.dynamic_slice(u_hi, (0, s), (K, n_chunk))
            ul_c = jax.lax.dynamic_slice(u_lo, (0, s), (K, n_chunk))
            return acc + _batched_boot_chunk(uh_c, ul_c, g0h, g0l, R, C_c, exact)

        S = jax.lax.fori_loop(0, n_main, body, S)
    rem = N - n_main * n_chunk
    if rem:
        s = n_main * n_chunk
        C_r = _unpack4(C[:, s // 2 :], B) if packed else C[:, s:].astype(
            jnp.float32
        )
        if use_th:
            S = S + _batched_boot_chunk_th(th[:, s:], R32, C_r)
        else:
            S = S + _batched_boot_chunk(
                u_hi[:, s:], u_lo[:, s:], g0h, g0l, R, C_r, exact
            )
    return R * S


# Fast-phase stop: with the f64-segmented S pass the step-delta plateau
# sits at ~2e-7 (≈7x the ~2.5e-8 S error, probe_fast_floor.py), so 1e-6
# is reached in ~3 iterations instead of capping at _BATCH_FAST_MAXITER;
# iterating further cannot help — the fast fixed point itself is
# displaced ~2e-5 from truth, which is the exact phase's start error.
_BATCH_FAST_TOL = 1.0e-6
_BATCH_FAST_MAXITER = 10


def _batch_step(S_fn, g0h, g0l, f0, N_k64, hinv, gamma, F, exact):
    """One batched frozen-factor chord-Newton step (all replicates):
    returns (F_new, per-replicate delta)."""
    R = jnp.exp(F - f0[None, :])
    S = S_fn(g0h, g0l, R, exact)
    g = S - N_k64[None, :]
    dx1 = g[:, 1:] @ hinv.T  # (B, K-1); hinv is the f64 chord inverse
    F_new = F - gamma * jnp.pad(dx1, ((0, 0), (1, 0)))
    F_new = F_new - F_new[:, :1]
    div = jnp.maximum(jnp.abs(F_new[:, 1:]), 1.0)
    d = jnp.max(jnp.abs(F_new[:, 1:] - F[:, 1:]) / div, axis=1)  # (B,)
    return F_new, d


def _batch_fast_from_S_fn(S_fn, B, N_k64, f0, hinv, gamma):
    """FAST phase of the batched bootstrap: f64-segmented f32-MXU matmul
    iterations take every replicate from its ~1/sqrt(N_k) start
    displacement down to the ~2e-7 segmented-pass delta plateau (stop at
    _BATCH_FAST_TOL).  Returns (F, iterations)."""
    g0h, g0l = dd_from_f64(f0 + jnp.log(N_k64))
    F0 = jnp.broadcast_to(f0[None, :], (B, f0.shape[0])).astype(jnp.float64)

    def fast_cond(carry):
        it, _F, prev_d = carry
        return jnp.logical_and(
            it < _BATCH_FAST_MAXITER,
            jnp.logical_not(jnp.all(prev_d < _BATCH_FAST_TOL)),
        )

    def fast_body(carry):
        it, F, prev_d = carry
        F_new, d = _batch_step(
            S_fn, g0h, g0l, f0, N_k64, hinv, gamma, F, exact=False
        )
        # a replicate at/below the floor stops moving (keeps its iterate);
        # non-finite steps also freeze (the exact phase restarts cleanly
        # from the base point for those rows)
        keep = jnp.isfinite(d) & (prev_d >= _BATCH_FAST_TOL)
        F = jnp.where(keep[:, None], F_new, F)
        prev_d = jnp.where(jnp.isfinite(d), d, prev_d)
        return it + 1, F, prev_d

    it_f, F, _prev = jax.lax.while_loop(
        fast_cond, fast_body, (jnp.int32(0), F0, jnp.full((B,), jnp.inf))
    )
    # any non-finite fast iterate restarts the exact phase from the base
    F = jnp.where(jnp.all(jnp.isfinite(F), axis=1)[:, None], F, F0)
    return F, it_f


def _batch_exact_from_S_fn(S_fn, F, N_k64, f0, hinv, tol, gamma, maxiter):
    """EXACT phase of the batched bootstrap: f64 matmuls with per-replicate
    certification, starting from the fast phase's iterates ``F``.  Returns
    (F, iters (B,), deltas (maxiter, B) nan-padded, converged (B,),
    at_floor (B,))."""
    g0h, g0l = dd_from_f64(f0 + jnp.log(N_k64))
    B = F.shape[0]

    def cond(carry):
        it, _F, _prev, _deltas, done, _floor, _iters = carry
        return jnp.logical_and(it < maxiter, ~jnp.all(done))

    def body(carry):
        it, F, prev_d, deltas, done, floor, iters = carry
        F_new, d = _batch_step(
            S_fn, g0h, g0l, f0, N_k64, hinv, gamma, F, exact=True
        )

        bad = ~jnp.isfinite(d)
        conv = d < tol
        stalled = (iters >= 1) & (d < 1.0e-9) & (d > 0.3 * prev_d)
        tiny = d < 3.0e-13
        # Predictive stop: under the chord iteration's linear contraction
        # (measured rate d/prev_d) the NEXT delta would be d^2/prev_d.
        # When that prediction sits 10x below tol the iterate just taken
        # already satisfies the convergence contract, and the would-be
        # final certification pass is pure cost — each exact pass here is
        # a full f64-emulated sweep of the planes shared by every
        # replicate, so skipping it cuts ~1/3 of the bootstrap wall.
        # Worst case (contraction rate doubling between iterations) still
        # leaves the residual at tol/5.  The single-replicate polish
        # (:func:`_polish_while_dd_w`) keeps the tighter 1e-14 rule: its
        # iterations ride the cheap pallas kernel, so there is nothing to
        # save on the flagship solve.
        pred = jnp.where(jnp.isfinite(prev_d), d * d / prev_d, jnp.inf)
        at_floor = ~conv & (stalled | tiny | (pred < 0.1 * tol))
        live = ~done

        deltas = deltas.at[it].set(jnp.where(live, d, jnp.nan))
        F = jnp.where((live & ~bad)[:, None], F_new, F)
        prev_d = jnp.where(live, d, prev_d)
        iters = iters + live.astype(jnp.int32)
        done = done | conv | at_floor | bad
        return it + 1, F, prev_d, deltas, done, floor | (live & at_floor), iters

    carry0 = (
        jnp.int32(0),
        F,
        jnp.full((B,), jnp.inf, jnp.float64),
        jnp.full((maxiter, B), jnp.nan, jnp.float64),
        jnp.zeros((B,), bool),
        jnp.zeros((B,), bool),
        jnp.zeros((B,), jnp.int32),
    )
    _it, F, prev_d, deltas, done, floor, iters = jax.lax.while_loop(
        cond, body, carry0
    )
    # A replicate is converged unless it exhausted maxiter or its last
    # delta was non-finite (matching _polish_loop's contract per row).
    finite = jnp.isfinite(prev_d)
    return F, iters, deltas, done & finite, floor


def _batch_loop_from_S_fn(S_fn, B, N_k64, f0, hinv, tol, gamma, maxiter):
    """The two-phase batched chord-Newton loop over an abstract weight-sum
    pass ``S_fn(g0h, g0l, R, exact) -> (B, K) f64`` — shared by the
    single-device (:func:`_polish_while_dd_batch`) and n-sharded
    (:func:`pymbar_tpu.parallel.sharding._sharded_polish_while_dd_batch`)
    batched bootstrap engines.

    Steps are the same frozen-factor chord-Newton as :func:`_polish_loop`,
    vectorized over the replicate axis, in two while_loops: a FAST phase
    whose matmuls run f64-segmented on the f32 MXU (S error ~2.5e-8, ~8%
    of the exact pass's matmul cost) takes the replicates from their
    ~1/sqrt(N_k) start displacement to a fixed point ~2e-5 from truth,
    then the EXACT phase (f64 matmuls) contracts ~3e-3/iteration to the
    dd noise floor — ~3 exact passes instead of ~6.
    Per-replicate stop rules (converged / stalled / tiny / predictive
    noise-floor / non-finite) freeze a replicate's iterate while the rest
    keep polishing.  Returns (F (B, K), iters (B,), deltas (maxiter, B)
    nan-padded from the exact phase, converged (B,), at_floor (B,)).

    The single-device engine times the two phases separately (it runs
    them as two jits with a fence at the boundary — see
    :func:`bootstrap_polish_dd`'s ``phase_walls``); this composition is
    kept as the one-dispatch form the sharded twin uses.
    """
    F, _it_f = _batch_fast_from_S_fn(S_fn, B, N_k64, f0, hinv, gamma)
    return _batch_exact_from_S_fn(S_fn, F, N_k64, f0, hinv, tol, gamma, maxiter)


@partial(jax.jit, static_argnames=("n_chunk", "packed"))
def _polish_while_dd_batch_fast(
    u_hi, u_lo, C, N_k64, f0, hinv, gamma, n_chunk, th=None, packed=False
):
    """FAST phase of the single-device batched bootstrap as its own jit
    (the phase boundary is a production dispatch point so the engine can
    report real per-phase walls — VERDICT r4 item 2).  ``th`` (optional)
    is the resident base-point fast plane: with it this phase never
    touches the dd exp at all."""

    def S_fn(g0h, g0l, R, exact):
        return _batched_wsum_S(
            u_hi, u_lo, g0h, g0l, R, C, n_chunk, exact, th=th, packed=packed
        )

    return _batch_fast_from_S_fn(
        S_fn, C.shape[0], N_k64, f0, hinv, gamma
    )


@partial(jax.jit, static_argnames=("maxiter", "n_chunk", "packed"))
def _polish_while_dd_batch_exact(
    u_hi, u_lo, C, N_k64, F, f0, hinv, tol, gamma, maxiter, n_chunk,
    packed=False,
):
    """EXACT phase of the single-device batched bootstrap (f64 matmuls,
    per-replicate certification) as its own jit."""

    def S_fn(g0h, g0l, R, exact):
        return _batched_wsum_S(
            u_hi, u_lo, g0h, g0l, R, C, n_chunk, exact, packed=packed
        )

    return _batch_exact_from_S_fn(
        S_fn, F, N_k64, f0, hinv, tol, gamma, maxiter
    )


def _polish_while_dd_batch(
    u_hi, u_lo, C, N_k64, f0, hinv, tol, gamma, maxiter, n_chunk, th=None,
    packed=False,
):
    """ALL bootstrap replicates polished together on one device: the
    two-phase batched loop over the single-device streamed pass
    :func:`_batched_wsum_S`, as the fast + exact jits back to back.  Each
    iteration advances every live replicate with ONE shared dd-exp stream
    of the resident planes — the serial per-replicate formulation pays
    that stream B times."""
    F, _it_f = _polish_while_dd_batch_fast(
        u_hi, u_lo, C, N_k64, f0, hinv, gamma, n_chunk, th=th, packed=packed
    )
    return _polish_while_dd_batch_exact(
        u_hi, u_lo, C, N_k64, F, f0, hinv, tol, gamma, maxiter, n_chunk,
        packed=packed,
    )


def _batch_chunk_width(K, N):
    """Sample-chunk width for the batched replicate pass: ~2^24 f64 chunk
    elements (a ~128 MB T1 buffer at K=1024; the f64-emulated dot_general
    adds an ~4x f32 scratch on TPU) keeps the matmuls MXU-sized without
    stressing HBM next to the resident planes.  2^25 was probed in round 5
    and REGRESSED: the isolated chunk matmul looked ~12% faster, but in
    production the per-sweep wall was unchanged (1.10 s) while the exact
    phase's step-noise floor degraded enough that replicates churned to
    maxiter and fell into serial retries (probe_bootstrap.py log r5)."""
    return int(max(1024, min(N, (1 << 24) // max(K, 1))))


def _batch_group_size(B, N):
    """Replicates per batched dispatch: the device counts matrix is
    group x N f32, budgeted at ~1 GB next to the resident planes."""
    return int(max(1, min(B, max(8, (1 << 28) // max(N, 1)))))


def _boot_info(at_floor, B, n_fail):
    """Bootstrap convergence-accounting dict: separates 'certified d < tol'
    from 'stopped at the dd noise floor' (stalled / tiny / predictive stop,
    worst-case residual ~tol/5 — docs/numerics.md) so callers can observe
    the relaxed stop instead of counting it as certified convergence."""
    n_at_floor = int(np.count_nonzero(at_floor))
    if n_at_floor:
        logger.info(
            f"{n_at_floor:d}/{B:d} bootstrap replicates stopped at the dd "
            "noise floor (stalled/tiny/predictive stop) rather than "
            "certifying d < tol; worst-case residual ~tol/5."
        )
    return dict(
        at_floor=at_floor,
        n_at_floor=n_at_floor,
        n_tol_converged=B - n_fail - n_at_floor,
    )


def bootstrap_polish_dd(
    u_hi,
    u_lo,
    N_k,
    f_k,
    hinv,
    counts,
    tol=1.0e-12,
    maxiter=16,
    gamma=1.0,
    fast_exp=True,
    verbose=False,
    mode="batched",
):
    """Solve B bootstrap replicates as counts-weighted dd chord-Newton polishes.

    A bootstrap resample is the original dataset reweighted by integer
    per-sample multiplicities, so each replicate streams the SAME (hi, lo)
    planes through the weighted wsum kernel — no K x N resampled copy ever
    exists, on host or device (the reference gathers one per replicate:
    pymbar 4.x mbar.py:417-449).  Each replicate warm-starts
    from the base solution ``f_k`` and reuses the base solve's frozen chord
    factor ``hinv``; the start error is the bootstrap fluctuation itself
    (~1/sqrt(N_k)), so ~5-8 passes reach the ~1e-12 floor.  A replicate
    whose polish fails to contract retries once with a fresh
    counts-weighted f32-Gram factor.  (A per-replicate weighted factor +
    f32 pre-step was measured in round 3 and rejected: the pre-step is
    broken by cond(H)-amplified f32 gradient noise — it DISPLACES the
    iterate ~5e-3 — and the weighted factor's rate gain does not repay
    its Gram-plus-factorization cost.)

    Parameters: ``counts`` is (B, N) integer-valued resample multiplicities
    (rows sum to N, per-state block sums to N_k).  ``mode`` selects the
    replicate engine: ``"batched"`` (default — every iteration advances all
    replicates from ONE shared dd-exp stream of the planes,
    :func:`_polish_while_dd_batch`; replicates that fail to converge fall
    back to the serial per-replicate kernel with a fresh factor) or
    ``"serial"`` (the per-replicate counts-weighted wsum loop, kept as the
    fallback and as the differential twin for tests).

    Returns
    -------
    (f_boots, n_fail, info)
        ``f_boots`` is (B, K) float64; ``n_fail`` counts replicates whose
        polish neither met ``tol`` nor reached the dd noise floor.  ``info``
        separates the two ways a replicate can count as converged:
        ``info["at_floor"]`` is a (B,) bool mask of replicates stopped by a
        noise-floor rule (stalled / tiny / predictive stop — their last
        step delta did NOT satisfy ``d < tol``; worst-case residual ~tol/5,
        docs/numerics.md), ``info["n_at_floor"]`` its count, and
        ``info["n_tol_converged"]`` the replicates that certified
        ``d < tol``.  n_fail + n_at_floor + n_tol_converged == B.
    """
    u_hi = jnp.asarray(u_hi)
    u_lo = jnp.asarray(u_lo)
    counts = np.asarray(counts)
    B = counts.shape[0]
    K = u_hi.shape[0]
    N = u_hi.shape[1]
    N_k64 = jnp.asarray(np.asarray(N_k), dtype=jnp.float64)
    logN = jnp.log(N_k64)
    f0 = jnp.asarray(np.asarray(f_k), jnp.float64)
    f0 = f0 - f0[0]
    tol_j = jnp.asarray(tol, jnp.float64)
    gamma_j = jnp.asarray(gamma, jnp.float64)
    use_pallas = on_tpu()

    if mode == "batched":
        import time as _time

        _t_all = _time.time()
        hinv_j = jnp.asarray(hinv, jnp.float64)
        n_chunk = _batch_chunk_width(K, N)
        # Group replicates so the device counts matrix stays ~<=1 GB next
        # to the resident planes; one compilation per distinct group shape.
        group = _batch_group_size(B, N)
        walls = dict(
            prep_s=0.0, upload_s=0.0, materialize_s=0.0, fast_s=0.0,
            exact_s=0.0,
        )
        th = None
        t0 = _time.time()
        if _use_resident_th(K, N):
            # One extra dd-exp pass buys every fast-phase iteration of
            # every group: the base point g0 is shared by all replicates.
            g0h, g0l = dd_from_f64(f0 + jnp.log(N_k64))
            th = _materialize_th(u_hi, u_lo, g0h, g0l, n_chunk)
            float(th[0, 0])  # scalar fence (reshape would copy the plane)
        walls["materialize_s"] = _time.time() - t0
        f_boots = np.zeros((B, K))
        at_floor = np.zeros(B, bool)
        fast_iters = 0
        exact_iters = np.zeros(B, np.int32)
        retry = []
        # Resample multiplicities are small non-negative integers (max over
        # 1e6 Poisson(1)-like draws is ~12), so the (group, N) matrix
        # crosses the tunnel and parks in HBM as uint8 — 4x less than f32;
        # the engine casts chunks to f32 on device.
        t0 = _time.time()
        counts_max = counts.max()
        if counts.dtype == np.uint8:
            up_dtype = np.uint8  # already the upload layout: no more scans
        elif np.issubdtype(counts.dtype, np.integer):
            up_dtype = np.uint8 if counts_max <= 255 else np.float32
        else:
            # float counts: the integrality scan over the full (B, N)
            # matrix costs ~2 s of the one host vCPU at the bench config —
            # callers that build integer resamples should pass uint8/uint16.
            up_dtype = (
                np.uint8
                if counts_max <= 255 and np.all(counts == np.round(counts))
                else np.float32
            )
        # Nibble packing: multiplicities <= 15 (true for any realistic
        # resample of >~100 samples/state; max over 1e6 Poisson(1)-like
        # draws is ~12) cross the ~60 MB/s tunnel at half a byte per
        # sample.  Chunks unpack on device (_unpack4).
        pack4 = (
            up_dtype == np.uint8
            and counts_max <= 15
            and N % 2 == 0
            and n_chunk % 2 == 0
        )
        walls["prep_s"] += _time.time() - t0
        for s in range(0, B, group):
            e = min(B, s + group)
            Bg = e - s
            t0 = _time.time()
            C = np.asarray(counts[s:e], up_dtype)
            if pack4:
                C = (C[:, 0::2] << 4) | C[:, 1::2]
            walls["prep_s"] += _time.time() - t0
            if Bg < group and B > group:
                # Pad the tail group to the common shape (reuses the jit
                # cache) with copies of its first row; results discarded.
                C = np.concatenate(
                    [C, np.repeat(C[:1], group - Bg, axis=0)], axis=0
                )
            t0 = _time.time()
            C_dev = jnp.asarray(C)
            float(C_dev[0, 0])  # fence the (group, N) host->device upload
            walls["upload_s"] += _time.time() - t0
            # The two phases run as separate production jits with a scalar
            # fence at the boundary: real per-phase walls, published by the
            # bench (VERDICT r4 item 2).  Cost: one ~40 ms dispatch bubble
            # per group against an ~11 s wall.
            t0 = _time.time()
            F, it_f = _polish_while_dd_batch_fast(
                u_hi, u_lo, C_dev, N_k64, f0, hinv_j, gamma_j, n_chunk,
                th=th, packed=pack4,
            )
            float(F[0, 0])
            walls["fast_s"] += _time.time() - t0
            fast_iters = max(fast_iters, int(it_f))
            t0 = _time.time()
            F, iters, deltas_g, conv, floor = _polish_while_dd_batch_exact(
                u_hi, u_lo, C_dev, N_k64, F, f0, hinv_j,
                tol_j, gamma_j, maxiter, n_chunk, packed=pack4,
            )
            F = np.asarray(F)[:Bg]
            walls["exact_s"] += _time.time() - t0
            conv = np.asarray(conv)[:Bg]
            f_boots[s:e] = F
            at_floor[s:e] = np.asarray(floor)[:Bg]
            exact_iters[s:e] = np.asarray(iters)[:Bg]
            retry.extend(s + i for i in np.nonzero(~conv)[0])
            if verbose:
                logger.info(
                    f"Calculated {e:d}/{B:d} bootstrap samples (batched)"
                )
        if th is not None:
            th.delete()  # release the 4 B/elem fast plane before retries
        n_fail = 0
        for b in retry:
            # Rare: the frozen base factor failed to contract this
            # replicate.  Fresh counts-weighted factor at its current
            # iterate + one serial dd polish.
            c = jnp.asarray(counts[b], jnp.float32)
            f_b = jnp.asarray(f_boots[b])
            gram_b, colsum_b = gram_f32_acc64(
                u_hi, N_k64.astype(jnp.float32), f_b.astype(jnp.float32), c
            )
            hinv_b = _newton_factor(gram_b, colsum_b, N_k64)
            f_b, _it, _g, _d, converged, floor_b = polish_to_host(
                _polish_while_dd_w(
                    u_hi, u_lo, c, N_k64, f_b, hinv_b, logN, tol_j, gamma_j,
                    maxiter, use_pallas, bool(fast_exp),
                )
            )
            at_floor[b] = converged and floor_b
            if not converged:
                n_fail += 1
            f_boots[b] = np.asarray(f_b)
        info = _boot_info(at_floor, B, n_fail)
        walls["total_s"] = _time.time() - _t_all
        info["phase_walls"] = {k: round(v, 3) for k, v in walls.items()}
        info["fast_iters"] = fast_iters
        info["exact_iters"] = exact_iters
        # Last group's per-iteration step deltas (maxiter, group) — nan
        # past each replicate's stop; the bench publishes quantiles so the
        # sweep-count budget is measured, not inferred (VERDICT r4 item 2).
        info["exact_deltas"] = np.asarray(deltas_g)
        return f_boots, n_fail, info

    f_boots = np.zeros((B, K))
    at_floor = np.zeros(B, bool)
    n_fail = 0
    for b in range(B):
        c = jnp.asarray(counts[b], jnp.float32)
        f_b, it, _g, _deltas, converged, floor_b = polish_to_host(
            _polish_while_dd_w(
                u_hi, u_lo, c, N_k64, f0, hinv, logN, tol_j, gamma_j,
                maxiter, use_pallas, bool(fast_exp),
            )
        )
        if not converged:
            # Fresh factor from the replicate's own weighted f32 Gram at the
            # current iterate, one retry (rare: base factor failed to
            # contract an unusually far replicate).
            gram_b, colsum_b = gram_f32_acc64(
                u_hi, N_k64.astype(jnp.float32), f_b.astype(jnp.float32), c
            )
            hinv_b = _newton_factor(gram_b, colsum_b, N_k64)
            f_b, it2, _g, _d2, converged, floor_b = polish_to_host(
                _polish_while_dd_w(
                    u_hi, u_lo, c, N_k64, f_b, hinv_b, logN, tol_j, gamma_j,
                    maxiter, use_pallas, bool(fast_exp),
                )
            )
        at_floor[b] = converged and floor_b
        if not converged:
            n_fail += 1
        f_boots[b] = np.asarray(f_b)
        if verbose and (b + 1) % max(1, B // 10) == 0:
            logger.info(f"Calculated {b + 1:d}/{B:d} bootstrap samples")
    return f_boots, n_fail, _boot_info(at_floor, B, n_fail)


def solve_mbar_dd_bootstrap(
    u_kn, N_k, f_k, counts, tol=1.0e-12, options=None, verbose=False
):
    """Combined base solve + bootstrap replicates on one set of dd planes.

    The GB-scale front door for ``MBAR(u_kn, N_k, n_bootstraps=...)`` when
    the solve auto-routes to the dd path: the planes are host-split ONCE,
    the base problem solves with :func:`solve_mbar_dd`, and every replicate
    rides :func:`bootstrap_polish_dd` on the same resident planes with the
    base chord factor.  All states must have samples.  Returns
    (f_k, f_boots, n_fail, info).
    """
    options = dict(options or {})
    if isinstance(u_kn, jax.Array) and not isinstance(u_kn, np.ndarray):
        uh, ul = dev_split_planes(u_kn)  # resident matrix: split on device
    else:
        uh, ul = host_split_planes(u_kn)
        uh = jnp.asarray(uh)
        ul = jnp.asarray(ul)
    f_sol, info = solve_mbar_dd(
        uh, ul, N_k, f_k=np.asarray(f_k) - np.asarray(f_k)[0], tol=tol,
        **{
            k: options[k]
            for k in ("f32_tol", "f32_maxiter", "polish_maxiter", "gamma", "fast_exp")
            if k in options
        },
    )
    f_sol = f_sol - f_sol[0]
    f_boots, n_fail, boot_info = bootstrap_polish_dd(
        uh,
        ul,
        N_k,
        f_sol,
        info["hinv"],
        counts,
        tol=tol,
        fast_exp=options.get("fast_exp", True),
        verbose=verbose,
    )
    info["bootstrap_at_floor"] = boot_info["at_floor"]
    info["bootstrap_n_at_floor"] = boot_info["n_at_floor"]
    info["bootstrap_n_tol_converged"] = boot_info["n_tol_converged"]
    f_boots = f_boots - f_boots[:, :1]
    return f_sol, f_boots, n_fail, info


def polish_to_host(polish_results):
    """Convert a jitted polish loop's results to host types.

    Returns (f64, iterations, g_last, deltas list, converged, at_noise_floor)
    — the one host sync of the polish phase.  Shared by the single-device
    and sharded solvers (primary call and fallback retry alike).
    """
    f64, it, g64, deltas_arr, converged, floor = polish_results
    it = int(it)
    deltas = [float(d) for d in np.asarray(deltas_arr)[:it]]
    return f64, it, g64, deltas, bool(converged), bool(floor)



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
    # An MBAR solve on every stride-th sample is a consistent estimate whose
    # f_k sits ~1e-2..1e-3 from the full-N solution, at ~1/stride the
    # per-iteration cost — and the dd polish starts directly from it.
    # Skipped on small planes or when any state would get too few
    # subsamples (_coarse_stride).
    it32_coarse = 0
    N_k_host = np.asarray(N_k, dtype=np.int64)
    hinv = None  # the shared chord inverse (subsample Gram when available)
    N_k32 = N_k64.astype(jnp.float32)
    stride = _coarse_stride(N_k_host, u_hi.size)
    if stride:
        if (N_k_host % stride == 0).all():
            # Every state block is stride-aligned: the subsample is a plain
            # strided slice (XLA copies it at near-memcpy rate; the general
            # gather below runs ~3x slower on the 4 GB plane).  Explicit
            # lax.slice with strides: jnp's `[:, ::stride]` basic indexing
            # falls through to a full gather in current JAX, whose scratch
            # OOMs next to HBM-edge planes (observed at 12.9 GB, K=4096).
            u_sub = jax.lax.slice(
                u_hi, (0, 0), u_hi.shape, (1, stride)
            )
            N_k_sub = N_k_host // stride
        else:
            idx, N_k_sub = _strided_subsample(N_k_host, stride)
            u_sub = jnp.take(u_hi, jnp.asarray(idx), axis=1)
        N_sub32 = jnp.asarray(N_k_sub, jnp.float32)
        f32_coarse, it32_coarse, _, _, _, done_c = _adaptive_while(
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
        done32 = bool(done_c)

        # The dd polish's chord factor comes from the SUBSAMPLE Gram at the
        # coarse endpoint: W columns normalize to 1 whatever the sample
        # count, so gram_full ~ gram_sub / ratio while colsums stay ~1.
        # This is measured-optimal, not merely cheap: the chord rate floors
        # at ~1e-3..3e-3/iteration from the f32 MXU Gram noise amplified by
        # cond(H) — a full-plane Gram, precision=HIGHEST matmuls, and even
        # a factor evaluated AT the converged solution all leave the rate
        # unchanged (round-3 measurements, docs/numerics.md) — so the
        # 1/stride-cost estimate is as good as any affordable factor.
        gram_s, colsum_s = gram_f32_acc64(u_sub, N_sub32, f32_coarse)
        ratio = float(N_k_host.sum()) / float(N_k_sub.sum())
        hinv = _newton_factor(gram_s / ratio, colsum_s, N_k64)

    # ---- phase 1b (small problems only): full-N f32 adaptive.
    # When the coarse phase ran, the dd polish starts DIRECTLY from its
    # endpoint: a full-plane f32 core_stats pass costs nearly as much as a
    # dd polish pass (hi plane + heavier math vs both planes), and with
    # ~1e-3..3e-3 chord contraction the coarse endpoint's ~1e-2 statistical
    # error costs at most one extra polish iteration — strictly cheaper
    # than any f32 refinement loop (whose accuracy is in any case capped
    # at ~5e-3 by cond(H)-amplified f32 gradient noise).  If the polish
    # fails to contract, the f32 adaptive loop runs as a fallback below.
    it32 = 0
    if not it32_coarse:
        f32_out, it32, sci, nr, max_delta32, done32 = _adaptive_while(
            u_hi,
            N_k32,
            f64.astype(jnp.float32),
            jnp.asarray(gamma, jnp.float32),
            jnp.asarray(f32_tol, jnp.float32),
            f32_maxiter,
            2,
            "chol",
            "mixed",
        )
        it32 = int(it32)
        done32 = bool(done32)
        f64 = f32_out.astype(jnp.float64)
        f64 = f64 - f64[0]
    # Hard phase fence: block_until_ready is unreliable under the tunneled
    # axon platform (observed returning with work pending — docs/numerics.md),
    # and a wrong fence here misattributes phase-1 time to phase 2.  A scalar
    # readback cannot complete before the computation has.
    float(f64[0])
    t_phase1 = time.time() - t_phase1
    t_phase2 = time.time()

    # ---- phase 2: double-word Newton polish on the wsum kernel.
    # One fused pass per iteration produces S_k = sum_n N_k W_nk in dd; the
    # gradient is g_k = S_k - N_k exactly (no log/exp roundtrip) and the
    # chord-Newton step uses the frozen explicit inverse of the f32-Gram
    # Hessian.  The frozen factor contracts ~1e-3..5e-3 per iteration all
    # the way to the ~1e-12 delta floor: the rate is pinned by the f32 MXU
    # Gram noise amplified through cond(H), so no refresh, full-plane
    # Gram, or higher-precision matmul is spent on it (each measured
    # rate-neutral in round 3 — docs/numerics.md).
    logN = jnp.log(N_k64)
    if hinv is None:
        # No coarse phase ran (small N): factor from the full plane.
        gram, colsum = gram_f32_acc64(
            u_hi, N_k64.astype(jnp.float32), f64.astype(jnp.float32)
        )
        hinv = _newton_factor(gram, colsum, N_k64)

    def _run_polish(f_start):
        return polish_to_host(
            _polish_while_dd(
                u_hi,
                u_lo,
                N_k64,
                f_start,
                hinv,
                logN,
                jnp.asarray(tol, jnp.float64),
                jnp.asarray(gamma, jnp.float64),
                polish_maxiter,
                on_tpu(),
                bool(fast_exp),
            )
        )

    # The dd kernel's ~1e-13 relative noise in S_k bounds the reachable
    # per-iteration delta at ~1e-13 (df ~ H^-1 g_noise ~ g_noise / N_k);
    # once Newton stops contracting near that floor — stalled, tiny, or
    # predicted-below-floor next step — the iterate is as converged as the
    # arithmetic allows (docs/numerics.md derivation).  The whole loop runs
    # on device (_polish_while_dd); the host syncs once, here.
    f64, it, g64, deltas, converged, at_noise_floor = _run_polish(f64)
    max_delta = deltas[-1] if deltas else np.inf

    if not converged and it32_coarse:
        # The subsample factor failed to contract the polish (rare:
        # ill-conditioned overlap the subsample misrepresents).  Fall back
        # to the reference-grade path: full-plane f32 adaptive from the
        # current iterate, a fresh full-plane factor, and one more polish.
        logger.info(
            "dd polish did not converge off the subsample factor "
            "(last delta %.2e); re-running with the full-plane factor",
            max_delta,
        )
        f32_out, it32b, _sci, _nr, _d32, done32 = _adaptive_while(
            u_hi,
            N_k32,
            f64.astype(jnp.float32),
            jnp.asarray(gamma, jnp.float32),
            jnp.asarray(f32_tol, jnp.float32),
            f32_maxiter,
            2,
            "chol",
            "mixed",
        )
        it32 = int(it32b)
        done32 = bool(done32)
        f64 = f32_out.astype(jnp.float64)
        f64 = f64 - f64[0]
        gram, colsum = gram_f32_acc64(
            u_hi, N_k64.astype(jnp.float32), f64.astype(jnp.float32)
        )
        hinv = _newton_factor(gram, colsum, N_k64)
        f64, it2, g64, deltas2, converged, at_noise_floor = _run_polish(f64)
        deltas += deltas2
        it += it2
        max_delta = deltas[-1] if deltas else np.inf

    gnorm = float(np.linalg.norm(np.asarray(g64))) if it else np.nan
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
        # The frozen chord factor, for warm-started follow-on solves
        # (bootstrap replicates reuse it: bootstrap_polish_dd).
        hinv=hinv,
    )
