"""Core MBAR numerics as pure jit-compiled functions of (u_kn, N_k, f_k).

Capability parity with the reference solver primitives
(pymbar 4.x mbar_solvers.py:174-507, :697-735):

* ``self_consistent_update``  — Eq. C3 of Shirts & Chodera JCP 129:124105
* ``mbar_gradient``           — Eq. C6
* ``mbar_objective``          — the convex MBAR objective (Eq. C1 family)
* ``mbar_hessian``            — Eq. C9
* ``mbar_log_W_nk``/``mbar_W_nk`` — Eq. 9 weights
* ``precondition_u_kn``       — per-sample shift that zeroes the objective

TPU-first design notes
----------------------
Everything is expressed as two reusable fused reductions over the K×N
reduced-potential matrix:

* ``log_denominator_n = logsumexp_k(f_k + log-weights N_k - u_kn)``  (per-sample)
* ``log_numerator_k   = logsumexp_n(-log_denominator_n - u_kn)``     (per-state)

so one pass of HBM traffic yields the self-consistent update, the gradient
and the objective simultaneously (the reference recomputes the denominator
separately in each wrapper).  The Hessian is produced in Gram form
(W^T W, K×K, MXU matmul) without transposing u_kn.  All functions are pure
and shard-transparent: when u_kn arrives sharded along n, XLA inserts the
psum/all-reduce for the per-state reductions automatically under pjit (see
pymbar_tpu.parallel).
"""

from functools import partial

import jax
import jax.numpy as jnp

from pymbar_tpu.utils import ensure_type

# TPU f32 matmuls default to single-pass bf16 MXU arithmetic (~9e-4
# relative Gram error, measured); Grams that feed covariance output or
# the polish chord factor request the 6-pass f32 decomposition instead
# (~2e-6 relative, ~2.3x the matmul time).  No-op on CPU.
HIGHEST = jax.lax.Precision.HIGHEST

__all__ = [
    "validate_inputs",
    "log_denominator_n",
    "core_stats",
    "self_consistent_update",
    "mbar_gradient",
    "mbar_objective",
    "mbar_objective_and_gradient",
    "mbar_hessian",
    "mbar_log_W_nk",
    "mbar_W_nk",
    "mbar_w_nk_gram",
    "mbar_gram_normalization",
    "gram_f32_acc64",
    "precondition_u_kn",
]


def validate_inputs(u_kn, N_k, f_k):
    """Host-side shape/dtype validation (reference mbar_solvers.py:174-203).

    Returns (u_kn, N_k, f_k) with N_k cast to float (it enters log-space
    weights immediately downstream).  A device-resident (jax.Array) u_kn is
    validated in place — ensure_type's ndarray conversion would pull the
    whole matrix across the frontend.
    """
    import numpy as np

    n_states, n_samples = u_kn.shape
    if isinstance(u_kn, jax.Array) and not isinstance(u_kn, np.ndarray):
        if u_kn.ndim != 2:
            raise ValueError(
                f"u_kn or Q_kn must be ndim 2. You supplied {u_kn.ndim}"
            )
        if not jnp.issubdtype(u_kn.dtype, jnp.floating):
            u_kn = u_kn.astype(jnp.float64)
    else:
        u_kn = ensure_type(
            u_kn, "float", 2, "u_kn or Q_kn", shape=(n_states, n_samples)
        )
    N_k = ensure_type(N_k, "float", 1, "N_k", shape=(n_states,), warn_on_cast=False)
    f_k = ensure_type(f_k, "float", 1, "f_k", shape=(n_states,))
    return u_kn, N_k, f_k


# -----------------------------------------------------------------------------
# Fused reductions
# -----------------------------------------------------------------------------


# Above this many bytes of u_kn, the K×N reductions stream over n-chunks
# instead of relying on XLA fusion: under f64 emulation XLA materializes the
# split-f32 planes of K×N temps, which blows HBM at the 8 GB problem sizes.
_STREAM_BYTES = 1024 * 1024 * 1024
_STREAM_CHUNK_BYTES = 128 * 1024 * 1024


def _stream_chunks(nbytes):
    return max(2, int(nbytes // _STREAM_CHUNK_BYTES))


def _logden_direct(u_kn, N_k, f_k):
    a = f_k[:, None] - u_kn  # (K, N)
    a_max = jnp.max(a, axis=0)
    a_max = jnp.where(jnp.isfinite(a_max), a_max, 0.0)
    s = jnp.sum(N_k[:, None] * jnp.exp(a - a_max[None, :]), axis=0)
    return jnp.log(s) + a_max


def _logden_blocked(u_kn, N_k, f_k, num_chunks):
    """Streamed per-sample reduction: chunk of columns in, chunk of logden out."""
    K, N = u_kn.shape
    nc = N // num_chunks

    def body(c, out):
        sl = jax.lax.dynamic_slice(u_kn, (0, c * nc), (K, nc))
        return jax.lax.dynamic_update_slice(
            out, _logden_direct(sl, N_k, f_k), (c * nc,)
        )

    out = jax.lax.fori_loop(
        0, num_chunks, body, jnp.zeros(N, dtype=u_kn.dtype)
    )
    rem = N - nc * num_chunks
    if rem > 0:
        out = jax.lax.dynamic_update_slice(
            out,
            _logden_direct(u_kn[:, nc * num_chunks :], N_k, f_k),
            (nc * num_chunks,),
        )
    return out


def log_denominator_n(u_kn, N_k, f_k):
    """Per-sample mixture log-normalizer: logsumexp_k[f_k - u_kn] with weights N_k.

    Shapes: u_kn (K, N); N_k, f_k (K,).  Returns (N,).

    Empty states (N_k == 0) drop out exactly.  Reduction runs along the K
    (leading) axis so the large N axis stays the vectorized minor dimension
    on TPU and no K×N transpose is ever formed (the reference transposes:
    mbar_solvers.py:241).  Large inputs stream over n-chunks.
    """
    nbytes = u_kn.size * u_kn.dtype.itemsize
    if nbytes <= _STREAM_BYTES:
        return _logden_direct(u_kn, N_k, f_k)
    return _logden_blocked(u_kn, N_k, f_k, _stream_chunks(nbytes))


def _lognum_direct(u_kn, logden_n):
    a = -logden_n[None, :] - u_kn  # (K, N)
    a_max = jnp.max(a, axis=1)
    a_max = jnp.where(jnp.isfinite(a_max), a_max, 0.0)
    s = jnp.sum(jnp.exp(a - a_max[:, None]), axis=1)
    return jnp.log(s) + a_max


def _lognum_blocked(u_kn, logden_n, num_chunks):
    """Streaming logsumexp over n with a running max (flash-style rescaling)."""
    K, N = u_kn.shape
    nc = N // num_chunks
    neg_inf = jnp.asarray(-jnp.inf, dtype=u_kn.dtype)

    def combine(m, s, a):
        a_max = jnp.max(a, axis=1)
        m_new = jnp.maximum(m, a_max)
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        s = s * jnp.exp(m - m_safe) + jnp.sum(jnp.exp(a - m_safe[:, None]), axis=1)
        return m_new, s

    def body(c, carry):
        m, s = carry
        sl = jax.lax.dynamic_slice(u_kn, (0, c * nc), (K, nc))
        ldc = jax.lax.dynamic_slice(logden_n, (c * nc,), (nc,))
        return combine(m, s, -ldc[None, :] - sl)

    m0 = jnp.full(K, neg_inf)
    s0 = jnp.zeros(K, dtype=u_kn.dtype)
    m, s = jax.lax.fori_loop(0, num_chunks, body, (m0, s0))
    rem = N - nc * num_chunks
    if rem > 0:
        a = -logden_n[None, nc * num_chunks :] - u_kn[:, nc * num_chunks :]
        m, s = combine(m, s, a)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    return jnp.log(s) + m


def _log_numerator_k(u_kn, logden_n):
    """Per-state reweighted log-sum: logsumexp_n[-logden_n - u_kn].  Returns (K,)."""
    nbytes = u_kn.size * u_kn.dtype.itemsize
    if nbytes <= _STREAM_BYTES:
        return _lognum_direct(u_kn, logden_n)
    return _lognum_blocked(u_kn, logden_n, _stream_chunks(nbytes))


@jax.jit
def core_stats(u_kn, N_k, f_k):
    """One fused pass producing (objective, gradient, f_sci).

    obj   = sum_n logden_n - N_k . f_k
    grad  = -N_k (1 - exp(f_k + lognum_k))          [Eq. C6]
    f_sci = -lognum_k                                [Eq. C3]

    The reference computes these in three separate kernels, re-deriving
    log_denominator_n each time (mbar_solvers.py:231-355); here the K×N
    matrix is read twice total.
    """
    logden = log_denominator_n(u_kn, N_k, f_k)
    lognum = _log_numerator_k(u_kn, logden)
    obj = jnp.sum(logden) - jnp.dot(N_k, f_k)
    grad = -N_k * (1.0 - jnp.exp(f_k + lognum))
    f_sci = -lognum
    return obj, grad, f_sci


# -----------------------------------------------------------------------------
# Reference-parity wrappers
# -----------------------------------------------------------------------------


@jax.jit
def _jit_self_consistent_update(u_kn, N_k, f_k):
    logden = log_denominator_n(u_kn, N_k, f_k)
    return -_log_numerator_k(u_kn, logden)


def self_consistent_update(u_kn, N_k, f_k, states_with_samples=None):
    """Improved f_k guess via Eq. C3 (reference mbar_solvers.py:206-257).

    Only states in ``states_with_samples`` feed the denominator when given
    (slicing happens host-side exactly as in the reference, which cannot jit
    the slice either).
    """
    if states_with_samples is not None:
        u_kn = u_kn[states_with_samples]
        N_k = N_k[states_with_samples]
        f_k = f_k[states_with_samples]
    return _jit_self_consistent_update(
        jnp.asarray(u_kn), jnp.asarray(N_k, dtype=u_kn.dtype), jnp.asarray(f_k)
    )


@jax.jit
def mbar_gradient(u_kn, N_k, f_k):
    """Gradient of the MBAR objective, Eq. C6 (reference mbar_solvers.py:260-292)."""
    logden = log_denominator_n(u_kn, N_k, f_k)
    lognum = _log_numerator_k(u_kn, logden)
    return -N_k * (1.0 - jnp.exp(f_k + lognum))


@jax.jit
def mbar_objective(u_kn, N_k, f_k):
    """MBAR objective (reference mbar_solvers.py:295-339)."""
    logden = log_denominator_n(u_kn, N_k, f_k)
    return jnp.sum(logden) - jnp.dot(N_k, f_k)


@jax.jit
def mbar_objective_and_gradient(u_kn, N_k, f_k):
    """Fused objective+gradient (reference mbar_solvers.py:341-392)."""
    obj, grad, _ = core_stats(u_kn, N_k, f_k)
    return obj, grad


# Above this many bytes of u_kn, the Gram streams over n-chunks instead of
# materializing the full K×N weight matrix as a matmul operand.
_GRAM_BLOCK_BYTES = 256 * 1024 * 1024
_GRAM_CHUNK_BYTES = 64 * 1024 * 1024


@partial(jax.jit, static_argnames=("precision",))
def _gram_direct(u_kn, N_k, f_k, precision=HIGHEST):
    logden = log_denominator_n(u_kn, N_k, f_k)
    w_kn = jnp.exp(f_k[:, None] - u_kn - logden[None, :])
    gram = jnp.dot(
        w_kn, w_kn.T, preferred_element_type=w_kn.dtype, precision=precision
    )
    colsum = jnp.sum(w_kn, axis=1)
    return gram, colsum


@partial(jax.jit, static_argnames=("num_chunks", "acc_dtype", "precision"))
def _gram_blocked(u_kn, N_k, f_k, num_chunks, acc_dtype, precision=HIGHEST):
    """Streamed Gram: per n-chunk, build the K×chunk weight slab, contract it
    on the MXU and accumulate the K×K partial — the full W never exists.

    ``acc_dtype`` may be lower precision than u_kn: the Gram only feeds the
    Newton step direction (convergence is certified on the exact gradient),
    and f64 matmuls are emulated (slow) on TPU.
    """
    K, N = u_kn.shape
    logden = log_denominator_n(u_kn, N_k, f_k)
    nc = N // num_chunks

    def body(c, acc):
        sl = jax.lax.dynamic_slice(u_kn, (0, c * nc), (K, nc))
        ldc = jax.lax.dynamic_slice(logden, (c * nc,), (nc,))
        w = jnp.exp((f_k[:, None] - sl - ldc[None, :]).astype(acc_dtype))
        return (
            acc[0]
            + jnp.dot(w, w.T, preferred_element_type=acc_dtype, precision=precision),
            acc[1] + jnp.sum(w, axis=1),
        )

    gram, colsum = jax.lax.fori_loop(
        0,
        num_chunks,
        body,
        (jnp.zeros((K, K), acc_dtype), jnp.zeros(K, acc_dtype)),
    )

    # Remainder columns (N not divisible by num_chunks).
    rem = N - nc * num_chunks
    if rem > 0:
        sl = u_kn[:, nc * num_chunks :]
        ldc = logden[nc * num_chunks :]
        w = jnp.exp((f_k[:, None] - sl - ldc[None, :]).astype(acc_dtype))
        gram = gram + jnp.dot(
            w, w.T, preferred_element_type=acc_dtype, precision=precision
        )
        colsum = colsum + jnp.sum(w, axis=1)

    return gram.astype(u_kn.dtype), colsum.astype(u_kn.dtype)


@partial(jax.jit, static_argnames=("num_chunks",))
def gram_f32_acc64(u_kn32, N_k32, f_k32, c32=None, num_chunks=64):
    """Blocked Gram with f32 MXU matmuls per chunk and f64 chunk accumulation.

    The dot requests ``precision=HIGHEST`` (6-pass f32, ~2e-6 relative vs
    ~9e-4 for the TPU default single-pass bf16 arithmetic, both measured).
    For the polish chord factor this is rate-NEUTRAL — the contraction
    floor is cond(H)-amplified noise either way (docs/numerics.md) — but
    the cost is ~ms on a subsample and the same Gram seeds bootstrap
    retry factors; summing the per-chunk K x K partials in (emulated) f64
    removes the cross-chunk accumulation error at negligible cost.  ``c32`` supplies
    optional (N,) per-sample counts (bootstrap multiplicities): the result
    becomes the weighted Gram W diag(c) W^T and colsum sum_n c_n W_nk —
    the Hessian aggregates of a counts-reweighted (resampled) problem.
    Returns (gram, colsum) in f64.
    """
    K, N = u_kn32.shape
    logden = log_denominator_n(u_kn32, N_k32, f_k32)
    nc = max(1, N // num_chunks)
    num_chunks = N // nc

    def wslab(sl, ldc, cc):
        w = jnp.exp(f_k32[:, None] - sl - ldc[None, :])
        # W columns normalize to 1 regardless of u, so sentinel pad columns
        # (sharded dd layout) would be phantom weight-1 samples: zero them.
        w = jnp.where(sl >= jnp.float32(5.0e9), jnp.float32(0.0), w)
        wc = w if cc is None else w * cc[None, :]
        g = jnp.dot(
            wc, w.T, preferred_element_type=jnp.float32, precision=HIGHEST
        )
        return g.astype(jnp.float64), jnp.sum(wc, axis=1).astype(jnp.float64)

    def body(c, acc):
        sl = jax.lax.dynamic_slice(u_kn32, (0, c * nc), (K, nc))
        ldc = jax.lax.dynamic_slice(logden, (c * nc,), (nc,))
        cc = None if c32 is None else jax.lax.dynamic_slice(c32, (c * nc,), (nc,))
        g, cs = wslab(sl, ldc, cc)
        return (acc[0] + g, acc[1] + cs)

    gram, colsum = jax.lax.fori_loop(
        0,
        num_chunks,
        body,
        (jnp.zeros((K, K), jnp.float64), jnp.zeros(K, jnp.float64)),
    )
    rem = N - nc * num_chunks
    if rem > 0:
        g, cs = wslab(
            u_kn32[:, nc * num_chunks :],
            logden[nc * num_chunks :],
            None if c32 is None else c32[nc * num_chunks :],
        )
        gram = gram + g
        colsum = colsum + cs
    return gram, colsum


def mbar_w_nk_gram(u_kn, N_k, f_k, precision=HIGHEST):
    """(W^T W, colsum W) without materializing W in (N, K) layout.

    W[n, k] = exp(f_k - u_kn[k, n] - logden_n).  G = W W^T is formed over the
    (K, N) layout directly — a K×K MXU matmul — plus the per-state weight
    sums.  These are the only aggregates the Hessian (Eq. C9) and the svd-ew
    covariance need.  Large problems stream over n-chunks (f32 accumulation
    on TPU, where f64 matmuls are emulated).

    ``precision`` sets the TPU MXU pass count (no-op on CPU): the default
    HIGHEST (~2e-6 relative) suits quantities a caller reads out; solve
    loops that use the Gram only to steer a Newton direction pass
    ``jax.lax.Precision.DEFAULT`` (single-pass bf16, ~9e-4 relative —
    measured iteration-count-neutral, and ~6x cheaper per matmul).
    """
    nbytes = u_kn.size * u_kn.dtype.itemsize
    if nbytes <= _GRAM_BLOCK_BYTES:
        return _gram_direct(u_kn, N_k, f_k, precision=precision)
    num_chunks = max(2, int(nbytes // _GRAM_CHUNK_BYTES))
    from pymbar_tpu.config import on_tpu

    acc_dtype = jnp.float32 if (on_tpu() and u_kn.dtype == jnp.float64) else u_kn.dtype
    return _gram_blocked(u_kn, N_k, f_k, num_chunks, acc_dtype, precision=precision)


@partial(jax.jit, static_argnames=("num_chunks", "compute_dtype"))
def _gram_norm_blocked(u_kn, N_k, f_k, tolerance, num_chunks, compute_dtype):
    """Streamed Gram + both W-normalization checks in one pass over u_kn.

    Per n-chunk: build the K×chunk weight slab w (in ``compute_dtype``),
    contract it on the MXU, and fold in (a) the per-state column sums and
    (b) the per-sample row sums sum_k N_k W_nk, whose deviation from 1 is
    reduced to (bad count, first bad index, value at first bad index) so the
    reference diagnostic (utils.py:340-393 semantics) can be reproduced
    without an N-sized host array.  Accumulation is f64 (native on CPU,
    emulated-but-cheap K×K on TPU).
    """
    K, N = u_kn.shape
    logden = log_denominator_n(u_kn, N_k, f_k)
    nc = max(1, N // num_chunks)
    num_chunks = N // nc
    big = jnp.asarray(N + 1, dtype=jnp.int64)

    def fold(acc, sl, ldc, base):
        gram, colsum, cnt, fidx, fval = acc
        w = jnp.exp(
            (f_k[:, None] - sl - ldc[None, :]).astype(compute_dtype)
        )
        # Sentinel pad columns (sharded dd layout) are phantom samples.
        w = jnp.where(sl.astype(compute_dtype) >= 5.0e9, 0.0, w)
        g = jnp.dot(
            w, w.T, preferred_element_type=compute_dtype, precision=HIGHEST
        )
        gram = gram + g.astype(jnp.float64)
        colsum = colsum + jnp.sum(w, axis=1).astype(jnp.float64)
        rowsum = jnp.dot(
            N_k.astype(compute_dtype), w, precision=HIGHEST
        ).astype(jnp.float64)
        bad = jnp.abs(rowsum - 1.0) > tolerance
        cnt = cnt + jnp.sum(bad)
        local_first = jnp.argmax(bad)
        gidx = jnp.where(jnp.any(bad), base + local_first, big)
        take = gidx < fidx
        fidx = jnp.where(take, gidx, fidx)
        fval = jnp.where(take, rowsum[local_first], fval)
        return gram, colsum, cnt, fidx, fval

    def body(c, acc):
        sl = jax.lax.dynamic_slice(u_kn, (0, c * nc), (K, nc))
        ldc = jax.lax.dynamic_slice(logden, (c * nc,), (nc,))
        return fold(acc, sl, ldc, (c * nc).astype(jnp.int64))

    init = (
        jnp.zeros((K, K), jnp.float64),
        jnp.zeros(K, jnp.float64),
        jnp.zeros((), jnp.int64),
        big,
        jnp.zeros((), jnp.float64),
    )
    acc = jax.lax.fori_loop(0, num_chunks, body, init)
    rem = N - nc * num_chunks
    if rem > 0:
        acc = fold(
            acc,
            u_kn[:, nc * num_chunks :],
            logden[nc * num_chunks :],
            jnp.asarray(nc * num_chunks, jnp.int64),
        )
    return acc


def mbar_gram_normalization(u_kn, N_k, f_k, tolerance=1.0e-4):
    """(W^T W, colsum W, row-check stats) without ever materializing W.

    The aggregates the covariance estimators (Eq. D4/D5, Kong 2003) and the
    reference's ``check_w_normalized`` need, produced by one streamed device
    pass over the (K, N) layout: Gram and per-state column sums in f64, plus
    (bad row count, first bad row index, its row sum) for the
    sum_k N_k W_nk = 1 check.  On TPU with f64 inputs the per-chunk matmul
    runs in f32 on the MXU (``precision=HIGHEST`` — the default single-pass
    bf16 arithmetic has ~9e-4 relative error, measured; the 6-pass f32
    decomposition reaches ~2e-6) with f64 chunk accumulation, a fraction of
    the emulated-f64 cost; on CPU everything is native f64.

    Replaces the reference's host N×K materialization
    (mbar.py:1756-1864 consuming exp(Log_W_nk)) — at the BASELINE north star
    (K=1024, N=1e7) that W is 80 GB and cannot exist.
    """
    u_kn = jnp.asarray(u_kn)
    N_k = jnp.asarray(N_k, dtype=u_kn.dtype)
    f_k = jnp.asarray(f_k, dtype=u_kn.dtype)
    nbytes = u_kn.size * u_kn.dtype.itemsize
    from pymbar_tpu.config import on_tpu

    if on_tpu() and u_kn.dtype == jnp.float64:
        compute_dtype = jnp.float32
    else:
        compute_dtype = u_kn.dtype
    num_chunks = max(1, int(nbytes // _GRAM_CHUNK_BYTES))
    gram, colsum, cnt, fidx, fval = _gram_norm_blocked(
        u_kn, N_k, f_k, jnp.asarray(tolerance, jnp.float64), num_chunks,
        compute_dtype,
    )
    return gram, colsum, (int(cnt), int(fidx), float(fval))


def mbar_hessian(u_kn, N_k, f_k, precision=HIGHEST):
    """Hessian of the MBAR objective, Eq. C9 (reference mbar_solvers.py:395-436).

    ``precision`` is forwarded to the Gram's TPU matmul (see
    :func:`mbar_w_nk_gram`); the accurate default suits direct callers,
    while the adaptive solver passes DEFAULT — its Hessian only steers the
    Newton direction and convergence is certified on the exact gradient.
    """
    gram, colsum = mbar_w_nk_gram(u_kn, N_k, f_k, precision=precision)
    H = gram * N_k[None, :] * N_k[:, None]
    H -= jnp.diag(colsum * N_k)
    return -H


@jax.jit
def mbar_log_W_nk(u_kn, N_k, f_k):
    """Normalized log-weights, Eq. 9, in (N, K) layout (reference :439-476)."""
    logden = log_denominator_n(u_kn, N_k, f_k)
    return (f_k[:, None] - u_kn - logden[None, :]).T


@jax.jit
def mbar_W_nk(u_kn, N_k, f_k):
    """Normalized weights, Eq. 9 (reference mbar_solvers.py:479-507)."""
    return jnp.exp(mbar_log_W_nk(u_kn, N_k, f_k))


def _precondition_direct(u_kn, N_k, f_k):
    u_kn = u_kn - jnp.min(u_kn, axis=0)[None, :]
    logden = _logden_direct(u_kn, N_k, f_k)
    return u_kn + (logden - jnp.dot(N_k, f_k) / jnp.sum(N_k))[None, :]


def _precondition_blocked(u_kn, N_k, f_k, num_chunks):
    """Streamed in-place preconditioning: the shift is per-sample (column-
    local), so each n-chunk is min-shifted, logden-shifted and written back
    without any full-size temporaries."""
    K, N = u_kn.shape
    nc = N // num_chunks
    c_shift = jnp.dot(N_k, f_k) / jnp.sum(N_k)

    def transform(sl):
        sl = sl - jnp.min(sl, axis=0)[None, :]
        logden = _logden_direct(sl, N_k, f_k)
        return sl + (logden - c_shift)[None, :]

    def body(c, out):
        sl = jax.lax.dynamic_slice(out, (0, c * nc), (K, nc))
        return jax.lax.dynamic_update_slice(out, transform(sl), (0, c * nc))

    out = jax.lax.fori_loop(0, num_chunks, body, u_kn)
    rem = N - nc * num_chunks
    if rem > 0:
        out = jax.lax.dynamic_update_slice(
            out, transform(out[:, nc * num_chunks :]), (0, nc * num_chunks)
        )
    return out


@jax.jit
def precondition_u_kn(u_kn, N_k, f_k):
    """Shift u_kn per-sample so the objective is ~0 (reference :697-735).

    u_kn <- u_kn - min_k u_kn, then add logden_n - (N_k.f_k)/N so the current
    objective value is exactly zero; derivatives are invariant.  Large inputs
    stream in place over n-chunks.
    """
    nbytes = u_kn.size * u_kn.dtype.itemsize
    if nbytes <= _STREAM_BYTES:
        return _precondition_direct(u_kn, N_k, f_k)
    return _precondition_blocked(u_kn, N_k, f_k, _stream_chunks(nbytes))
