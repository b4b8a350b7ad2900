"""The MBAR estimator class.

Capability parity with the reference ``pymbar/mbar.py`` class ``MBAR``
(pymbar 4.x mbar.py:64-1988): identical constructor surface,
result-dictionary schemas and uncertainty-method options
(None/approximate/svd/svd-ew/bootstrap).

TPU-first notes
---------------
The solve, weight-matrix, Gram (W^T W) and eigendecomposition work runs on
device through :mod:`pymbar_tpu.ops` / :mod:`pymbar_tpu.solvers`; this class
is a thin stateful shell holding host copies, the RNG and bookkeeping.  The
covariance estimators consume W in Gram form where possible so the N×K weight
matrix is only materialized for the (host-facing, reference-parity)
``Log_W_nk`` attribute.
"""

import functools as _functools
import logging

import jax as _jax
import jax.numpy as jnp
import numpy as np

from pymbar_tpu import solvers as mbar_solvers
from pymbar_tpu.ops.logsumexp import logsumexp as dev_logsumexp
from pymbar_tpu.ops.mbar_core import HIGHEST as _HI
from pymbar_tpu.ops.mbar_core import log_denominator_n as dev_log_denominator_n
from pymbar_tpu.ops.mbar_core import mbar_gram_normalization, mbar_log_W_nk
from pymbar_tpu.solvers import (
    BOOTSTRAP_SOLVER_PROTOCOL,
    DEFAULT_SOLVER_PROTOCOL,
    JAX_SOLVER_PROTOCOL,
    ROBUST_SOLVER_PROTOCOL,
)
from pymbar_tpu.utils import (
    DataError,
    ParameterError,
    check_w_normalized,
    kln_to_kn,
    kn_to_n,
    logsumexp,
)

logger = logging.getLogger(__name__)

__all__ = ["MBAR"]

# Above this many bytes of u_kn, compute_expectations_inner streams the
# augmented-state machinery over n-chunks on device instead of building the
# N x (K+NL+S) host matrix (which is 160+ GB at the K=1024 x N=1e7 target).
_AUG_STREAM_BYTES = 512 * 2**20

# TPU dd-route threshold: above this u_kn byte size a default-protocol
# solve rides the two-phase double-word solver (see __init__).  Module
# constant so tests can exercise the route on small problems.
_DD_ROUTE_BYTES = 64 * 2**20
# 256 MB chunks: big enough that per-chunk dispatch latency (30-40 ms on a
# tunneled TPU frontend) amortizes against the chunk's compute, small
# enough that the emulated-f64 logden temporaries stay ~1.5 GB.
_AUG_CHUNK_BYTES = 256 * 2**20

# Collapse the aliased augmented Gram to three K x K Grams when eligible
# (see _aug_b_struct_body); module switch so tests can pin the structured
# assembly against the unstructured augmented block.
_STRUCT_AUG_GRAM = True


@_jax.jit
def _dev_mm(a, b):
    return jnp.dot(a, b, preferred_element_type=a.dtype)


def _host_mm(a, b):
    """a @ b for the Theta covariance algebra.

    On TPU sessions the K-to-3K-sized f64 products route through the
    device (XLA's correctly-rounded emulated-f64 dot, measured 175-400
    GFLOP/s) and return as numpy: the bench container exposes ONE host
    vCPU whose first-touch GEMM rate collapses to ~1.5 GFLOP/s (measured;
    it was 39 of the 41 s of an all-states compute_expectations call).
    On CPU backends this is a plain numpy matmul, so the differential
    suite's bit-level semantics are untouched.
    """
    from pymbar_tpu.config import on_tpu

    if on_tpu() and a.shape[0] * b.shape[1] >= 512 * 512:
        return np.asarray(_dev_mm(jnp.asarray(a), jnp.asarray(b)))
    return a @ b


def _is_dev(x):
    """True for a device-resident jax array (the O(m^2) Theta pipeline keeps
    these on device: the tunneled TPU frontend transfers at only ~3-25 MB/s,
    so every avoided m x m download is seconds of wall time)."""
    return isinstance(x, _jax.Array) and not isinstance(x, np.ndarray)


@_functools.partial(_jax.jit, static_argnames=("lmode",))
def _assemble_struct_gram_dev(M0, M1, M2, D_L, E, lidx, lmode):
    """Device twin of the structured-Gram host assembly in
    :meth:`MBAR._expectations_streamed` (same block algebra, jnp ops): the
    (K+NL+S)^2 augmented Gram from the three K x K Grams plus diagonal
    scalings, without the ~m^2 device->host download and the host
    elementwise passes (both pathological on a weak/tunneled host)."""
    if lmode == "identity":
        M1s, M2ss = M1, M2
    else:
        M1s = jnp.take(M1, lidx, axis=1)
        M2ss = jnp.take(jnp.take(M2, lidx, axis=0), lidx, axis=1)
    G0L = M0 * D_L[None, :]
    GLL = D_L[:, None] * M0 * D_L[None, :]
    G0S = M1s * E[None, :]
    GLS = D_L[:, None] * G0S
    GSS = E[:, None] * M2ss * E[None, :]
    top = jnp.concatenate([M0, G0L, G0S], axis=1)
    mid = jnp.concatenate([G0L.T, GLL, GLS], axis=1)
    bot = jnp.concatenate([G0S.T, GLS.T, GSS], axis=1)
    return jnp.concatenate([top, mid, bot], axis=0)


def _row_select(x, idx, mode, n_out):
    """Select rows x[idx] with a statically-specialized strategy.

    TPU has no fast vector gather, and jnp.take row-gathers of (K, nc)
    blocks dominated the streamed expectations passes (measured ~0.1 s per
    gather per chunk).  The index patterns the callers produce are almost
    always trivial, so the mode is decided host-side:

    * "identity" — idx == arange(len(x)): return x;
    * "zero"     — all idx == 0: broadcast the first row;
    * "gather"   — general: one-hot matmul on the MXU (exact: the one-hot
      entries are 0/1, so products are error-free in any float type).
      Non-finite source entries would poison the matmul (0 * inf = NaN),
      so they are routed around it: the matmul runs on a finitized copy
      and a second exact one-hot matmul of a small class code (0 finite,
      1 -inf, 2 +inf, 3 NaN) restores the selected entry's value.  ±inf
      is a legitimate MBAR input (hard-wall states, log of a zero-shifted
      observable).
    """
    if mode == "identity":
        return x
    if mode == "empty":
        return x[:0]
    if mode == "zero":
        return jnp.broadcast_to(x[0:1], (n_out, x.shape[1]))
    oh = (idx[:, None] == jnp.arange(x.shape[0])[None, :]).astype(x.dtype)
    finite = jnp.isfinite(x)
    out = jnp.dot(
        oh, jnp.where(finite, x, 0.0), preferred_element_type=x.dtype
    )
    cls = jnp.where(
        finite, 0.0, jnp.where(x == -jnp.inf, 1.0, jnp.where(x == jnp.inf, 2.0, 3.0))
    ).astype(x.dtype)
    c = jnp.dot(oh, cls, preferred_element_type=x.dtype)
    out = jnp.where(c == 1.0, -jnp.inf, out)
    out = jnp.where(c == 2.0, jnp.inf, out)
    return jnp.where(c == 3.0, jnp.nan, out)


def _idx_mode(idx, nrows):
    """Host-side classification for :func:`_row_select`."""
    idx = np.asarray(idx)
    if idx.size == 0:
        return "empty"
    if idx.size == nrows and np.array_equal(idx, np.arange(nrows)):
        return "identity"
    if np.all(idx == 0):
        return "zero"
    return "gather"


def _aug_a_body(u_c, ul_c, la_c, sws, Ns, fs, lidx, c=None,
                sws_mode="gather", lidx_mode="gather", a_mode="log"):
    """Pass-A chunk math: per-extra-state and per-observable partial
    (max, rescaled sum) pairs over one n-chunk.

    ``c`` optionally supplies per-sample resample counts — the reductions
    become counts-weighted sums over the SAME columns, which is exactly a
    bootstrap replicate's reduction (evaluated at the replicate's f via
    ``fs``); no resampled matrix is gathered.  ``sws_mode``/``lidx_mode``
    statically specialize the row selections (see :func:`_row_select`).

    ``a_mode`` selects the observable-slab form: ``"log"`` takes ``la_c``
    as the (S, nc) LOG observable rows (the general layout);
    ``"diagmul"`` takes ``la_c`` as the RAW shifted observable slab
    A = u - a_shift >= 0 of the aliased diag layout (entropy/enthalpy's
    u_kn-as-observable, lidx = identity) — there
    exp(log A + a_l - m) == A * exp(a_l - m) EXACTLY, so the observable
    terms reuse the extra-state exp slab under the SHARED per-row shift
    m_l: no log slab, no second exp slab, no second max pass.  The
    rescaled sums stay representable (A is bounded, s_s <= max(A) s_l);
    only the (m, s) flash pair differs by harmless rescaling.
    """
    from pymbar_tpu.ops.mbar_core import _logden_direct

    u_s = u_c if sws_mode == "identity" else jnp.take(u_c, sws, axis=0)
    ld = _logden_direct(u_s, Ns, fs)
    a_l = -ul_c - ld[None, :]  # (NL, nc)
    m_l = jnp.max(a_l, axis=1)
    m_l_safe = jnp.where(jnp.isfinite(m_l), m_l, 0.0)
    e_l = jnp.exp(a_l - m_l_safe[:, None])
    if a_mode == "diagmul":
        m_s = m_l
        e_s = la_c * e_l  # (S, nc) == (K, nc): lidx is identity
    else:
        a_s = la_c + _row_select(a_l, lidx, lidx_mode, la_c.shape[0])  # (S, nc)
        m_s = jnp.max(a_s, axis=1)
        m_s_safe = jnp.where(jnp.isfinite(m_s), m_s, 0.0)
        e_s = jnp.exp(a_s - m_s_safe[:, None])
    if c is not None:
        e_l = e_l * c[None, :]
        e_s = e_s * c[None, :]
    s_l = jnp.sum(e_l, axis=1)
    s_s = jnp.sum(e_s, axis=1)
    return m_l, s_l, m_s, s_s


@_functools.partial(_jax.jit, static_argnames=("sws_mode", "lidx_mode", "a_mode"))
def _aug_pass_a(u_c, ul_c, la_c, sws, Ns, fs, lidx, c=None,
                sws_mode="gather", lidx_mode="gather", a_mode="log"):
    """One chunk of the pass-A reductions (host-chunked streaming form).
    Module-level jit: closures created per call would recompile the chunk
    kernel on every public expectations call."""
    return _aug_a_body(u_c, ul_c, la_c, sws, Ns, fs, lidx, c,
                       sws_mode, lidx_mode, a_mode)


@_functools.partial(_jax.jit, static_argnames=("sws_mode", "lidx_mode", "a_mode"))
def _aug_pass_a_multi(u_c, ul_c, la_c, sws, Ns, fs_all, lidx, c_all,
                      sws_mode="gather", lidx_mode="gather", a_mode="log"):
    """Pass-A reductions for B bootstrap replicates over ONE uploaded chunk.

    ``fs_all`` is (B, Ks) per-replicate sampled-state free energies and
    ``c_all`` is (B, nc) per-replicate resample counts.  Looping replicates
    on device against a single upload turns the bootstrap's host-chunked
    streaming cost from B uploads of u_kn into one (the upload, not the
    VPU math, dominates on a tunneled frontend): each replicate is its own
    _aug_a_body evaluation (its own f iterate, so its own exp slabs — they
    cannot share one pass), but the (K, nc) chunk stays resident across
    the fori_loop.  Outputs are (B, NL)/(B, S) partial (max, rescaled-sum)
    pairs, combined across chunks on host exactly like the single-replicate
    form."""
    B = fs_all.shape[0]
    NL = ul_c.shape[0]
    S = la_c.shape[0]

    def body(b, out):
        m_l, s_l, m_s, s_s = out
        ml, sl, ms, ss = _aug_a_body(
            u_c, ul_c, la_c, sws, Ns, fs_all[b], lidx,
            c_all[b].astype(u_c.dtype), sws_mode, lidx_mode, a_mode,
        )
        return (
            m_l.at[b].set(ml), s_l.at[b].set(sl),
            m_s.at[b].set(ms), s_s.at[b].set(ss),
        )

    init = (
        jnp.full((B, NL), -jnp.inf), jnp.zeros((B, NL)),
        jnp.full((B, S), -jnp.inf), jnp.zeros((B, S)),
    )
    return _jax.lax.fori_loop(0, B, body, init)


def _resample_counts(rints, n_total, dtype=np.float64):
    """Per-sample multiplicities of one bootstrap replicate's resample
    indices — THE definition of a counts-weighted replicate, shared by the
    solver route (f32 planes) and the streamed expectations route."""
    return np.bincount(rints, minlength=n_total).astype(dtype)


def _aug_combine_dev(m, s, m_c, s_c):
    """Running-max rescaled-sum combine (flash-logsumexp across chunks),
    device form shared by the fori_loop pass variants."""
    m_new = jnp.maximum(m, m_c)
    safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
    return m_new, s * jnp.exp(m - safe) + s_c * jnp.exp(m_c - safe)


@_functools.partial(
    _jax.jit,
    static_argnames=(
        "num_chunks", "alias", "sws_mode", "lidx_mode", "iofs_mode", "a_mode",
    ),
)
def _aug_pass_a_scan(u_kn, u_ln, logA_rows, i_of_s, sws, Ns, fs, lidx,
                     num_chunks, c=None, alias=False,
                     sws_mode="gather", lidx_mode="gather",
                     iofs_mode="gather", a_mode="log", a_shift=None):
    """Pass A as ONE device dispatch: lax.fori_loop over n-chunks of a
    device-resident u_kn.  Used when u_kn is already a jax array and the
    observable-row matrix is small (n_obs rows; the (S, nc) expansion via
    ``i_of_s`` happens per chunk on device) — the host-chunked form pays
    several frontend round-trips per chunk, which dominates wall time on
    tunneled/remote TPU frontends.  ``a_mode='diagmul'`` is the aliased
    diag layout (entropy's u_kn-as-observable): each chunk's raw shifted
    observable slab is rebuilt on device as ``sl_u - a_shift[:, None]``
    and consumed multiplicatively (see :func:`_aug_a_body`); ``logA_rows``
    is then an unused 0-row placeholder."""
    K_rows, N = u_kn.shape
    NL = u_ln.shape[0]
    S = lidx.shape[0]
    nc = max(1, N // num_chunks)
    num_chunks = N // nc
    neg_inf = jnp.asarray(-jnp.inf, u_kn.dtype)

    def fold(carry, sl_u, sl_ul, sl_la, sl_c):
        m_l, s_l, m_s, s_s = carry
        ml_c, sl_c2, ms_c, ss_c = _aug_a_body(
            sl_u, sl_ul, sl_la, sws, Ns, fs, lidx, sl_c,
            sws_mode, lidx_mode, a_mode,
        )
        m_l, s_l = _aug_combine_dev(m_l, s_l, ml_c, sl_c2)
        m_s, s_s = _aug_combine_dev(m_s, s_s, ms_c, ss_c)
        return m_l, s_l, m_s, s_s

    def body(ci, carry):
        sl_u = _jax.lax.dynamic_slice(u_kn, (0, ci * nc), (K_rows, nc))
        sl_ul = (
            sl_u if alias
            else _jax.lax.dynamic_slice(u_ln, (0, ci * nc), (NL, nc))
        )
        if a_mode == "diagmul":
            sl_la = sl_u - a_shift[:, None]
        else:
            la = _jax.lax.dynamic_slice(
                logA_rows, (0, ci * nc), (logA_rows.shape[0], nc)
            )
            sl_la = _row_select(la, i_of_s, iofs_mode, S)  # (S, nc)
        sl_c = (
            None if c is None else _jax.lax.dynamic_slice(c, (ci * nc,), (nc,))
        )
        return fold(carry, sl_u, sl_ul, sl_la, sl_c)

    init = (
        jnp.full(NL, neg_inf), jnp.zeros(NL, u_kn.dtype),
        jnp.full(S, neg_inf), jnp.zeros(S, u_kn.dtype),
    )
    carry = _jax.lax.fori_loop(0, num_chunks, body, init)
    rem = N - nc * num_chunks
    if rem > 0:
        tail_u = u_kn[:, nc * num_chunks :]
        if a_mode == "diagmul":
            la = tail_u - a_shift[:, None]
        else:
            la = _row_select(
                logA_rows[:, nc * num_chunks :], i_of_s, iofs_mode, S
            )
        carry = fold(
            carry,
            tail_u,
            tail_u if alias else u_ln[:, nc * num_chunks :],
            la,
            None if c is None else c[nc * num_chunks :],
        )
    return carry


def _aug_b_body(
    u_c, ul_c, la_c, base, sws, Ns, fs, f_k, logC, obs_shift, lidx, Nk,
    sentinel, K, compute_dtype, sws_mode="gather", lidx_mode="gather",
):
    """Pass-B chunk math: augmented Gram + normalization aggregates over
    one n-chunk.  Row selections statically specialized (_row_select)."""
    from pymbar_tpu.ops.mbar_core import _logden_direct

    u_s = u_c if sws_mode == "identity" else jnp.take(u_c, sws, axis=0)
    ld = _logden_direct(u_s, Ns, fs)
    logw0 = f_k[:, None] - u_c - ld[None, :]
    logwL = logC[:, None] - ul_c - ld[None, :]
    logwS = (
        obs_shift[:, None]
        + la_c
        - _row_select(ul_c, lidx, lidx_mode, la_c.shape[0])
        - ld[None, :]
    )
    W = jnp.exp(
        jnp.concatenate([logw0, logwL, logwS], axis=0).astype(compute_dtype)
    )
    gram = jnp.dot(
        W, W.T, preferred_element_type=compute_dtype, precision=_HI
    )
    colsum = jnp.sum(W, axis=1)
    rowsum = jnp.dot(
        Nk.astype(compute_dtype), W[:K], precision=_HI
    ).astype(jnp.float64)
    bad = jnp.abs(rowsum - 1.0) > 1.0e-4
    cnt = jnp.sum(bad)
    lf = jnp.argmax(bad)
    gidx = jnp.where(jnp.any(bad), base + lf, sentinel)
    return (
        gram.astype(jnp.float64),
        colsum.astype(jnp.float64),
        cnt,
        gidx,
        rowsum[lf],
    )


def _aug_b_struct_body(u_c, la_row, base, sws, Ns, fs, f_k, Nk, sentinel,
                       compute_dtype, sws_mode="gather", a_mode="logrow"):
    """Structured pass-B chunk math for the aliased augmented space.

    When ``u_ln is u_kn`` (every sampled state is an evaluation state) the
    W_L rows are scalar multiples of the base rows,

        W_L = diag(exp(logC - f)) W_0          (same states, renormalized)
        W_S = diag(E) (A o W_0)[lidx]          (observable-weighted rows)

    and in two common observable layouts the (K+NL+S)^2 augmented Gram
    collapses to THREE K x K Grams —
    M0 = W_0 W_0^T, M1 = W_0 (A o W_0)^T, M2 = (A o W_0)(A o W_0)^T —
    plus diagonal scalings applied on host (exact, f64):

    * ``a_mode='logrow'`` — all S pseudo-states share ONE observable row
      (``la_row`` is its (nc,) log; compute_expectations at every state);
    * ``a_mode='diag'`` — pseudo-state s pairs observable row s with
      extra state s (``la_row`` is the (K, nc) observable slab itself,
      NOT its log; entropy/enthalpy's u_kn-as-observable layout).

    Either way this is ~3x fewer MXU flops and 3x fewer exp slabs than
    materializing the augmented block (9 K^2 -> 3 K^2 at S = NL = K),
    which dominates the covariance pass at the GB scale."""
    from pymbar_tpu.ops.mbar_core import _logden_direct

    u_s = u_c if sws_mode == "identity" else jnp.take(u_c, sws, axis=0)
    ld = _logden_direct(u_s, Ns, fs)
    logw0 = f_k[:, None] - u_c - ld[None, :]
    W0 = jnp.exp(logw0.astype(compute_dtype))
    if a_mode == "diag":
        WA = W0 * la_row.astype(compute_dtype)  # (K, nc) observable slab
    else:
        A = jnp.exp(la_row.astype(compute_dtype))  # (nc,)
        WA = W0 * A[None, :]
    M0 = jnp.dot(W0, W0.T, preferred_element_type=compute_dtype, precision=_HI)
    M1 = jnp.dot(W0, WA.T, preferred_element_type=compute_dtype, precision=_HI)
    M2 = jnp.dot(WA, WA.T, preferred_element_type=compute_dtype, precision=_HI)
    c0 = jnp.sum(W0, axis=1)
    cA = jnp.sum(WA, axis=1)
    rowsum = jnp.dot(
        Nk.astype(compute_dtype), W0, precision=_HI
    ).astype(jnp.float64)
    bad = jnp.abs(rowsum - 1.0) > 1.0e-4
    cnt = jnp.sum(bad)
    lf = jnp.argmax(bad)
    gidx = jnp.where(jnp.any(bad), base + lf, sentinel)
    return (
        M0.astype(jnp.float64), M1.astype(jnp.float64),
        M2.astype(jnp.float64), c0.astype(jnp.float64),
        cA.astype(jnp.float64), cnt, gidx, rowsum[lf],
    )


@_functools.partial(
    _jax.jit, static_argnames=("compute_dtype", "sws_mode", "a_mode")
)
def _aug_pass_b_struct(u_c, la_row, base, sws, Ns, fs, f_k, Nk, sentinel,
                       compute_dtype, sws_mode="gather", a_mode="logrow"):
    """One chunk of structured pass B (host-chunked streaming form)."""
    return _aug_b_struct_body(u_c, la_row, base, sws, Ns, fs, f_k, Nk,
                              sentinel, compute_dtype, sws_mode, a_mode)


@_functools.partial(
    _jax.jit,
    static_argnames=("K", "compute_dtype", "num_chunks", "sws_mode", "a_mode"),
)
def _aug_pass_b_scan_struct(u_kn, logA_row, sws, Ns, fs, f_k, Nk, sentinel,
                            K, compute_dtype, num_chunks,
                            sws_mode="gather", a_mode="logrow", a_shift=None):
    """Structured pass B as ONE device dispatch (fori_loop over n-chunks
    of a device-resident u_kn) — the aliased twin of _aug_pass_b_scan.
    ``a_mode='diag'`` (entropy's u_kn-as-observable layout) rebuilds each
    chunk's raw shifted observable slab on device as
    ``sl_u - a_shift[:, None]``; ``logA_row`` is then a 0-size placeholder."""
    K_rows, N = u_kn.shape
    nc = max(1, N // num_chunks)
    num_chunks = N // nc

    def fold(acc, sl_u, sl_la, base):
        M0, M1, M2, c0, cA, cnt, fidx, fval = acc
        m0, m1, m2, c0_c, cA_c, cnt_c, gidx, val = _aug_b_struct_body(
            sl_u, sl_la, base, sws, Ns, fs, f_k, Nk, sentinel,
            compute_dtype, sws_mode, a_mode,
        )
        take = gidx < fidx
        return (
            M0 + m0, M1 + m1, M2 + m2, c0 + c0_c, cA + cA_c,
            cnt + cnt_c, jnp.where(take, gidx, fidx),
            jnp.where(take, val, fval),
        )

    def body(ci, acc):
        sl_u = _jax.lax.dynamic_slice(u_kn, (0, ci * nc), (K_rows, nc))
        if a_mode == "diag":
            sl_la = sl_u - a_shift[:, None]
        else:
            sl_la = _jax.lax.dynamic_slice(logA_row, (ci * nc,), (nc,))
        return fold(acc, sl_u, sl_la, (ci * nc).astype(jnp.int64))

    init = (
        jnp.zeros((K, K)), jnp.zeros((K, K)), jnp.zeros((K, K)),
        jnp.zeros(K), jnp.zeros(K),
        jnp.asarray(0, jnp.int64), sentinel, jnp.asarray(0.0),
    )
    acc = _jax.lax.fori_loop(0, num_chunks, body, init)
    rem = N - nc * num_chunks
    if rem > 0:
        tail_u = u_kn[:, nc * num_chunks :]
        acc = fold(
            acc, tail_u,
            tail_u - a_shift[:, None] if a_mode == "diag"
            else logA_row[nc * num_chunks :],
            jnp.asarray(nc * num_chunks, jnp.int64),
        )
    return acc


@_functools.partial(
    _jax.jit, static_argnames=("K", "compute_dtype", "sws_mode", "lidx_mode")
)
def _aug_pass_b(
    u_c, ul_c, la_c, base, sws, Ns, fs, f_k, logC, obs_shift, lidx, Nk,
    sentinel, K, compute_dtype, sws_mode="gather", lidx_mode="gather",
):
    """One chunk of pass B (host-chunked streaming form); module-level jit
    cache, K/dtype static."""
    return _aug_b_body(
        u_c, ul_c, la_c, base, sws, Ns, fs, f_k, logC, obs_shift, lidx, Nk,
        sentinel, K, compute_dtype, sws_mode, lidx_mode,
    )


@_functools.partial(
    _jax.jit,
    static_argnames=(
        "K", "compute_dtype", "num_chunks", "alias", "sws_mode",
        "lidx_mode", "iofs_mode",
    ),
)
def _aug_pass_b_scan(
    u_kn, u_ln, logA_rows, i_of_s, sws, Ns, fs, f_k, logC, obs_shift, lidx,
    Nk, sentinel, K, compute_dtype, num_chunks, alias=False,
    sws_mode="gather", lidx_mode="gather", iofs_mode="gather",
):
    """Pass B as ONE device dispatch (fori_loop over n-chunks of a
    device-resident u_kn), the augmented twin of
    ops.mbar_core._gram_norm_blocked."""
    K_rows, N = u_kn.shape
    NL = u_ln.shape[0]
    msize = K + NL + lidx.shape[0]
    nc = max(1, N // num_chunks)
    num_chunks = N // nc

    def fold(acc, sl_u, sl_ul, sl_la, base):
        gram, colsum, cnt, fidx, fval = acc
        g_c, cs_c, cnt_c, gidx, val = _aug_b_body(
            sl_u, sl_ul, sl_la, base, sws, Ns, fs, f_k, logC, obs_shift,
            lidx, Nk, sentinel, K, compute_dtype, sws_mode, lidx_mode,
        )
        gram = gram + g_c
        colsum = colsum + cs_c
        cnt = cnt + cnt_c
        take = gidx < fidx
        fidx = jnp.where(take, gidx, fidx)
        fval = jnp.where(take, val, fval)
        return gram, colsum, cnt, fidx, fval

    def body(ci, acc):
        sl_u = _jax.lax.dynamic_slice(u_kn, (0, ci * nc), (K_rows, nc))
        sl_ul = (
            sl_u if alias
            else _jax.lax.dynamic_slice(u_ln, (0, ci * nc), (NL, nc))
        )
        la = _jax.lax.dynamic_slice(
            logA_rows, (0, ci * nc), (logA_rows.shape[0], nc)
        )
        sl_la = _row_select(la, i_of_s, iofs_mode, lidx.shape[0])
        return fold(acc, sl_u, sl_ul, sl_la, (ci * nc).astype(jnp.int64))

    init = (
        jnp.zeros((msize, msize), jnp.float64),
        jnp.zeros(msize, jnp.float64),
        jnp.zeros((), jnp.int64),
        sentinel,
        jnp.zeros((), jnp.float64),
    )
    acc = _jax.lax.fori_loop(0, num_chunks, body, init)
    rem = N - nc * num_chunks
    if rem > 0:
        la = _row_select(
            logA_rows[:, nc * num_chunks :], i_of_s, iofs_mode, lidx.shape[0]
        )
        tail_u = u_kn[:, nc * num_chunks :]
        acc = fold(
            acc,
            tail_u,
            tail_u if alias else u_ln[:, nc * num_chunks :],
            la,
            jnp.asarray(nc * num_chunks, jnp.int64),
        )
    return acc


def _wtw_gram(W, block_bytes=2**30):
    """W^T W for an (N, K') weight matrix without giant device temps.

    On TPU an f64 matmul is emulated with ~6x-expanded f32 operands, so a
    single N x K' dot at the GB scale blows HBM; stream row blocks instead
    and accumulate the K' x K' partials in f64 (each block's emulated dot
    has bounded temps).  Small W takes the direct path.
    """
    W = np.asarray(W)
    if W.nbytes <= block_bytes:
        W_dev = jnp.asarray(W)
        return jnp.dot(W_dev.T, W_dev)
    N, Kp = W.shape
    rows = max(1, int(block_bytes // (8 * max(Kp, 1)) // 4))
    acc = jnp.zeros((Kp, Kp), dtype=jnp.float64)
    for s in range(0, N, rows):
        blk = jnp.asarray(W[s : s + rows])
        acc = acc + jnp.dot(blk.T, blk)
    return acc

class MBAR:
    """Multistate Bennett acceptance ratio estimator (Shirts & Chodera 2008).

    Given ``N = sum_k N_k`` samples drawn from ``K`` thermodynamic states and
    the reduced-potential matrix ``u_kn[k, n]`` (the energy of sample ``n``
    evaluated in state ``k``, in units of kT), MBAR solves the coupled
    self-consistent equations for the dimensionless free energies ``f_k``
    (Eq. C3 of JCP 129:124105, 2008) and exposes estimators built on the
    resulting weight matrix: free-energy differences, expectations of
    arbitrary observables at sampled or unsampled states, entropy/enthalpy
    decompositions, overlap diagnostics and effective sample sizes — each
    with asymptotic (Eq. D4/D5) or bootstrap uncertainties.

    The solve, weights and covariance reductions run on device
    (JAX/XLA/Pallas); problems whose ``u_kn`` exceeds 2 GiB on a TPU backend
    auto-route to the two-phase double-word solver, and ``mesh=`` shards the
    sample axis over multiple chips with no other API change.

    Examples
    --------
    >>> import numpy as np
    >>> from pymbar_tpu import MBAR
    >>> from pymbar_tpu.testsystems import HarmonicOscillatorsTestCase
    >>> tc = HarmonicOscillatorsTestCase(O_k=[0.0, 1.0, 2.0], K_k=[1.0, 1.5, 2.0])
    >>> x_n, u_kn, N_k, s_n = tc.sample(N_k=[400, 300, 300], mode="u_kn", seed=7)
    >>> mbar = MBAR(u_kn, N_k)
    >>> results = mbar.compute_free_energy_differences()
    >>> sorted(results)
    ['Delta_f', 'dDelta_f']
    >>> fa = tc.analytical_free_energies(); fa = fa - fa[0]
    >>> bool(np.all(np.abs(results["Delta_f"][0] - fa) < 6 * (results["dDelta_f"][0] + 1e-8)))
    True
    """

    def __init__(
        self,
        u_kn,
        N_k,
        maximum_iterations=10000,
        relative_tolerance=1.0e-7,
        verbose=False,
        initial_f_k=None,
        solver_protocol=None,
        initialize="zeros",
        x_kindices=None,
        n_bootstraps=0,
        bootstrap_solver_protocol=None,
        rseed=None,
        mesh=None,
    ):
        """Prepare the estimator and solve for the free energies.

        Parameters
        ----------
        u_kn : np.ndarray, float, shape (K, N) or (K, K, N_max)
            ``u_kn[k, n]`` is the reduced potential of sample ``n`` (indexed
            globally, over all states it may have been drawn from) evaluated
            in state ``k``.  A 3-D ``u_kln[k, l, n]`` array is accepted and
            flattened with :func:`pymbar_tpu.utils.kln_to_kn`.
        N_k : np.ndarray, int, shape (K,)
            Number of samples drawn from each state; ``sum(N_k)`` must equal
            ``N``.  States with ``N_k == 0`` are allowed (their free energies
            come from one self-consistent update at the end of the solve).
        maximum_iterations : int, optional, default 10000
            Iteration cap applied to every solver stage.
        relative_tolerance : float, optional, default 1.0e-7
            Relative convergence tolerance of the duplicate-state scan (the
            solver stages use their own ``tol``, default 1e-12).
        verbose : bool, optional, default False
            Emit per-stage diagnostics through the module logger.
        initial_f_k : np.ndarray, float, shape (K,), optional
            Initial guess for the dimensionless free energies (overrides
            ``initialize``).
        solver_protocol : tuple of dict, 'default', 'robust', or 'jax', optional
            Ordered solver stages, each ``dict(method=..., options=...,
            continuation=...)``; ``method`` may be ``"adaptive"``,
            ``"anderson"``, ``"dd"``, ``"BFGS"``, any gradient-based
            scipy.optimize.minimize method, or a scipy.optimize.root method
            (``"hybr"``/``"lm"``).  ``None`` selects the default
            (device-resident adaptive, then ``hybr`` as host fallback).
        initialize : {'zeros', 'mean-reduced-potential', 'BAR'}, optional
            How to build the initial ``f_k`` when ``initial_f_k`` is None.
        x_kindices : np.ndarray, int, shape (N,), optional
            Origin state of each sample (defaults to contiguous blocks of
            ``N_k``); consumed by BAR initialization and bootstrap resampling.
        n_bootstraps : int, optional, default 0
            Number of bootstrap replicates to solve (enables
            ``uncertainty_method="bootstrap"`` downstream).  On dd/mesh
            routes the replicates solve as counts-weighted passes on the
            resident planes (no resampled matrix).
        bootstrap_solver_protocol : tuple of dict, optional
            Protocol for the replicate solves (default: one adaptive stage
            warm-started at the converged ``f_k``).
        rseed : int, optional
            Seed for the resampling RNG (fixed seed => reproducible
            bootstrap streams).
        mesh : jax.sharding.Mesh or "auto", optional
            Shard the sample axis of the solve over a device mesh;
            ``"auto"`` builds a 1-D mesh over every visible device.  An
            explicit ``solver_protocol`` wins over ``mesh`` (with a warning).

        Notes
        -----
        Reference surface: ``pymbar.MBAR.__init__``
        (pymbar 4.x mbar.py:85-231), extended by ``mesh``.
        """
        self.N_k = np.array(N_k, dtype=np.int64)
        self.N = int(np.sum(self.N_k))

        # Accept u_kln (K, L, N_max) layout and flatten (reference mbar.py:238-240).
        if len(np.shape(u_kn)) == 3:
            self.K = np.shape(u_kn)[1]
            u_kn = kln_to_kn(np.asarray(u_kn), N_k=self.N_k)

        # A device-resident matrix is stored AS GIVEN (np.array would pull
        # GBs back across a slow frontend); every solver and compute path
        # consumes either representation — same contract as from_solution.
        self.u_kn = (
            u_kn if isinstance(u_kn, _jax.Array)
            else np.array(u_kn, dtype=np.float64)
        )
        K, N = np.shape(self.u_kn)

        if verbose:
            logger.info(f"K (total states) = {K:d}, total samples = {N:d}")

        if np.sum(self.N_k) != N:
            raise ParameterError(
                "The sum of all N_k must equal the total number of samples "
                "(length of second dimension of u_kn."
            )

        self.K = K
        self.N = N

        # Which origin state each sample was drawn from (matters for BAR init
        # and bootstrap resampling; reference mbar.py:261-268).
        if x_kindices is not None:
            self.x_kindices = np.array(x_kindices, dtype=np.int64)
        else:
            self.x_kindices = np.repeat(np.arange(K, dtype=np.int64), self.N_k)

        self.verbose = verbose

        if rseed is None:
            rseed = np.random.randint(np.iinfo(np.int32).max)
        self.rng = np.random.default_rng(rseed)

        # Duplicate-state detection on a small random subsample (reference
        # mbar.py:279-317).  The RNG draw happens unconditionally so bootstrap
        # streams are identical regardless of verbosity.
        self._scan_duplicate_states(relative_tolerance)

        if self.verbose:
            logger.info("N_k = ")
            logger.info(self.N_k)

        self.states_with_samples = np.where(self.N_k != 0)[0].astype(np.int64)
        self.K_nonzero = self.states_with_samples.size
        if verbose:
            logger.info(f"There are {self.K_nonzero:d} states with samples.")

        self.f_k = np.zeros(self.K, dtype=np.float64)

        if initial_f_k is not None:
            if self.verbose:
                logger.info("Initializing f_k with provided initial guess.")
            initial_f_k = np.array(initial_f_k, dtype=np.float64)
            if initial_f_k.shape != self.f_k.shape:
                raise ParameterError(
                    f"initial_f_k must be a {self.K:d}-dimensional np array."
                )
            self.f_k = initial_f_k
            if self.verbose:
                logger.info(self.f_k)
            self.f_k[:] = self.f_k[:] - self.f_k[0]
        else:
            self._initializeFreeEnergies(verbose, method=initialize, f_k_init=initial_f_k)
            if self.verbose:
                logger.info(
                    f"Initial dimensionless free energies with method {initialize:s}"
                )
                logger.info("f_k = ")
                logger.info(self.f_k)

        # Multi-chip front door: mesh="auto" picks up every visible device;
        # an explicit jax.sharding.Mesh is honored as-is.  With a mesh the
        # solve routes through the n-sharded double-word path
        # (parallel.sharding.sharded_solve_mbar_for_all_states) — a user
        # with a v5e-8 writes MBAR(u_kn, N_k, mesh="auto") and gets the
        # 8-chip solve.  An explicit solver_protocol overrides the mesh
        # routing for the solve itself (protocol semantics win), with a
        # warning.
        if mesh == "auto":
            from pymbar_tpu.parallel.sharding import default_mesh

            mesh = default_mesh() if len(_jax.devices()) > 1 else None
        self.mesh = mesh
        if mesh is not None and solver_protocol is not None:
            logger.warning(
                "Both mesh and an explicit solver_protocol were given; the "
                "explicit protocol runs on the default device and the mesh "
                "is ignored for the solve."
            )
            self.mesh = mesh = None

        # TPU problems above ~64 MB auto-route to the two-phase double-word
        # solver ("dd", solvers_large): same answer to ~1e-11, ~5x the
        # speed of the f64-emulation adaptive path (which pays the XLA
        # f64-emulation tax on every exp/log slab; the dd polish rides f32
        # Pallas kernels).  The round-4 threshold of 2 GiB left every
        # sub-GiB problem — including the FES front door's K=64 x N=1e6
        # (512 MB), the most common umbrella-sampling size — on the slow
        # path: measured 6.1-6.8 s there vs 0.77 s for the 16x-bigger
        # flagship (VERDICT r4).  Below ~64 MB the dd path's fixed costs
        # (split pass, subsample factor, separate phase compiles) stop
        # paying for themselves (crossover note: docs/numerics.md).  With
        # multiple chips visible the same route shards the sample axis
        # over the mesh automatically.  Any explicit solver_protocol
        # (including the reference defaults by name) is honored untouched.
        if (
            solver_protocol is None
            and mesh is None
            and self.u_kn.nbytes >= _DD_ROUTE_BYTES
        ):
            from pymbar_tpu.config import on_tpu

            if on_tpu():
                if len(_jax.devices()) > 1:
                    from pymbar_tpu.parallel.sharding import default_mesh

                    self.mesh = mesh = default_mesh()
                else:
                    solver_protocol = (dict(method="dd", options=dict()),)

        # Normalize the solver protocols exactly as the reference does
        # (mbar.py:367-411): fill options/continuation defaults and raise
        # every stage's maxiter to maximum_iterations.
        solver_protocol = self._resolve_protocol(
            solver_protocol, DEFAULT_SOLVER_PROTOCOL, maximum_iterations
        )
        bootstrap_solver_protocol = self._resolve_protocol(
            bootstrap_solver_protocol, BOOTSTRAP_SOLVER_PROTOCOL, maximum_iterations
        )

        # Draw every replicate's resample indices BEFORE the solve (nothing
        # between here and the old in-loop draw consumes the RNG, so the
        # stream is identical) so dd/mesh-routed solves can carry the
        # replicates on their resident planes.
        self.n_bootstraps = n_bootstraps
        # Per-replicate noise-floor mask, populated by the dd/mesh batched
        # bootstrap engines (None on the vmap/sequential routes, whose
        # adaptive stages certify tol directly).
        self.bootstrap_at_floor = None
        bootstrap_counts = None
        if n_bootstraps > 0:
            self.f_k_boots = np.zeros([n_bootstraps, self.K])
            allN = int(np.sum(N_k))
            self.bootstrap_rints = np.zeros([n_bootstraps, allN], int)
            for b in range(n_bootstraps):
                rints = np.zeros(allN, int)
                for k in range(K):
                    k_indices = np.where(self.x_kindices == k)[0]
                    if len(k_indices) == 0:
                        continue
                    new_kindices = k_indices[
                        self.rng.integers(int(self.N_k[k]), size=int(self.N_k[k]))
                    ]
                    rints[k_indices] = new_kindices
                self.bootstrap_rints[b, :] = rints

            # dd/mesh production bootstrap: a resample is the original data
            # reweighted by integer per-sample multiplicities, so when the
            # solve is mesh- or dd-routed the replicates ride the SAME
            # resident double-word planes through the counts-weighted wsum
            # kernel (no K x N resampled copy, no cross-device gather).
            # Conditions: every state sampled (the empty-state SC fill would
            # need one full-matrix pass per replicate), no BAR re-init, and
            # the default single-stage adaptive bootstrap protocol (whose
            # fixed point the dd polish resolves to the same ~1e-12).
            default_boot = (
                initialize != "BAR"
                and len(bootstrap_solver_protocol) == 1
                and bootstrap_solver_protocol[0]["method"] == "adaptive"
            )
            dd_stage = (
                mesh is None
                and len(solver_protocol) == 1
                and solver_protocol[0]["method"] == "dd"
            )
            if default_boot and self.K_nonzero == self.K and (
                mesh is not None or dd_stage
            ):
                # uint16 layout: integer-typed counts let the batched engine
                # skip its full-matrix integrality scan (~2 s of the one
                # host vCPU at the bench config) and upload uint8.  A
                # resample multiplicity above 65535 is theoretically
                # possible (N_k > 65535 with an astronomically unlikely
                # collision), so the builder widens to f32 if one appears.
                bootstrap_counts = np.zeros((n_bootstraps, self.N), np.uint16)
                for b in range(n_bootstraps):
                    row = _resample_counts(
                        self.bootstrap_rints[b], self.N, np.int64
                    )
                    if row.max() > 65535 and bootstrap_counts.dtype == np.uint16:
                        bootstrap_counts = bootstrap_counts.astype(np.float32)
                    bootstrap_counts[b] = row
        elif n_bootstraps < 0:
            logger.warning("n_bootstraps must be an integer >= 0")

        f_boots_done = None
        if mesh is not None:
            from pymbar_tpu.parallel.sharding import (
                sharded_solve_mbar_for_all_states,
            )

            if bootstrap_counts is not None:
                (
                    self.f_k, f_boots_done, n_fail, boot_info
                ) = sharded_solve_mbar_for_all_states(
                    self.u_kn, self.N_k, self.f_k, self.states_with_samples,
                    mesh, bootstrap_counts=bootstrap_counts, verbose=verbose,
                )
                self.bootstrap_at_floor = boot_info["at_floor"]
            else:
                self.f_k = sharded_solve_mbar_for_all_states(
                    self.u_kn, self.N_k, self.f_k, self.states_with_samples, mesh
                )
        elif bootstrap_counts is not None:
            from pymbar_tpu.solvers_large import solve_mbar_dd_bootstrap

            self.f_k, f_boots_done, n_fail, info = solve_mbar_dd_bootstrap(
                self.u_kn, self.N_k, self.f_k, bootstrap_counts,
                tol=solver_protocol[0].get("tol", 1.0e-12),
                options=solver_protocol[0].get("options") or {},
                verbose=verbose,
            )
            self.bootstrap_at_floor = info.get("bootstrap_at_floor")
            if not info.get("converged", False):
                logger.warning(
                    "dd MBAR solve did not converge to within tolerance "
                    f"(gnorm={info.get('gnorm', float('nan')):.3e})"
                )
        else:
            self.f_k = mbar_solvers.solve_mbar_for_all_states(
                self.u_kn, self.N_k, self.f_k, self.states_with_samples, solver_protocol
            )

        if n_bootstraps > 0:
            maxfrac = int(max(1, 0.1 * n_bootstraps))
            if f_boots_done is not None:
                self.f_k_boots[:] = f_boots_done
                if n_fail:
                    logger.warning(
                        f"{n_fail:d}/{n_bootstraps:d} bootstrap replicates "
                        "did not converge to within tolerance."
                    )
            else:
                # Fast path: the default bootstrap protocol is a single
                # adaptive stage with no BAR re-init — solve replicates
                # batched under vmap (chunked to bound the B x K x N gather
                # memory).  Batched solves fill the TPU; on CPU the
                # sequential path is faster (the vmapped while-loop runs
                # every replicate to the slowest one's iteration count), so
                # gate on the backend.
                from pymbar_tpu.config import on_tpu

                fast = (
                    on_tpu()
                    and initialize != "BAR"
                    and len(bootstrap_solver_protocol) == 1
                    and bootstrap_solver_protocol[0]["method"] == "adaptive"
                    # Device-memory budget: the batched path holds the full
                    # f64 matrix PLUS one K x N resampled gather per chunk
                    # (2x residency) — beyond ~4 GB that exceeds a v5e's
                    # 16 GB HBM next to workspace.  Problems above the
                    # budget with sampled states everywhere already took
                    # the dd counts route; the remainder (empty states /
                    # custom protocols at GB scale) runs the sequential
                    # loop, which gathers one replicate at a time.
                    and self.u_kn.nbytes <= 4 * 2**30
                )
                if fast:
                    self._bootstrap_solve_batched(
                        bootstrap_solver_protocol[0], verbose
                    )
                else:
                    for b in range(n_bootstraps):
                        f_k_init = np.array(self.f_k.copy())
                        rints = self.bootstrap_rints[b, :]
                        if initialize == "BAR":
                            f_k_init = self._initialize_with_bar(
                                self.u_kn[:, rints], f_k_init=self.f_k
                            )
                        self.f_k_boots[b, :] = mbar_solvers.solve_mbar_for_all_states(
                            self.u_kn[:, rints],
                            self.N_k,
                            f_k_init,
                            self.states_with_samples,
                            bootstrap_solver_protocol,
                        )
                        if verbose and b % maxfrac == 0:
                            logger.info(
                                f"Calculated {b + 1:d}/{n_bootstraps:d} "
                                "bootstrap samples"
                            )

        # Log_W_nk materializes lazily (property below): it is an N x K f64
        # matrix whose compute + device->host transfer costs minutes at the
        # GB scale, and solve-only users never touch it.
        self._Log_W_nk = None

        if self.verbose:
            logger.info("Final dimensionless free energies")
            logger.info("f_k = ")
            logger.info(self.f_k)
            logger.info("MBAR initialization complete.")

    @classmethod
    def from_solution(
        cls, u_kn, N_k, f_k, x_kindices=None, rseed=None, verbose=False
    ):
        """Construct an MBAR object around an ALREADY-CONVERGED solution.

        The public warm-start front door: no solver stage runs — ``f_k``
        is taken as the converged dimensionless free energies of
        ``(u_kn, N_k)`` — and every ``compute_*`` surface then behaves
        exactly as on a freshly solved object (pinned by
        ``tests/test_mbar.py::test_from_solution_matches_fresh``).  Two
        idiomatic uses:

        * resuming from a checkpoint (:func:`pymbar_tpu.checkpoint` saves
          ``f_k``) without paying even the warm-started re-solve;
        * wrapping a solution produced by the lower-level solver engines
          (e.g. :func:`pymbar_tpu.solvers_large.solve_mbar_dd` on
          double-word planes) in the full estimator API.

        Unlike ``__init__``, ``u_kn`` is stored AS GIVEN: a device-resident
        ``jax.Array`` is not round-tripped through the host (at the GB
        scale that transfer costs minutes on a tunneled TPU frontend), and
        the streamed compute paths consume either representation.

        Parameters
        ----------
        u_kn : np.ndarray or jax.Array, float, shape (K, N) or (K, K, N_max)
            Reduced potentials, exactly as for ``__init__``.
        N_k : np.ndarray, int, shape (K,)
            Sample counts per state.
        f_k : np.ndarray, float, shape (K,)
            Converged dimensionless free energies for this problem (e.g. a
            prior object's ``.f_k`` or a checkpoint's).  Re-normalized to
            ``f_k[0] = 0`` as the solver would.
        x_kindices : np.ndarray, int, shape (N,), optional
            Origin state of each sample (defaults to contiguous blocks).
        rseed : int, optional
            Seed for the (unused-until-requested) resampling RNG.
        verbose : bool, optional

        Returns
        -------
        MBAR
            A fully usable estimator with ``n_bootstraps = 0`` (bootstrap
            uncertainties need the replicate solves — construct through
            ``__init__`` for those).
        """
        self = cls.__new__(cls)
        self.N_k = np.array(N_k, dtype=np.int64)
        self.N = int(np.sum(self.N_k))

        if len(np.shape(u_kn)) == 3:
            self.K = np.shape(u_kn)[1]
            u_kn = kln_to_kn(u_kn, N_k=self.N_k)
        K, N = np.shape(u_kn)
        if self.N != N:
            raise ParameterError(
                "The sum of all N_k must equal the total number of samples "
                "(length of second dimension of u_kn."
            )
        self.K = K
        # Stored as given: device arrays stay on device (no host copy).
        self.u_kn = (
            u_kn if isinstance(u_kn, _jax.Array) else np.array(u_kn, np.float64)
        )

        f_k = np.array(f_k, dtype=np.float64)
        if f_k.shape != (K,):
            raise ParameterError(f"f_k must be a {K:d}-dimensional np array.")
        self.f_k = f_k - f_k[0]

        if x_kindices is not None:
            self.x_kindices = np.array(x_kindices, dtype=np.int64)
        else:
            self.x_kindices = np.repeat(np.arange(K, dtype=np.int64), self.N_k)
        self.verbose = verbose
        if rseed is None:
            rseed = np.random.randint(np.iinfo(np.int32).max)
        self.rng = np.random.default_rng(rseed)
        # Same verbose-gated duplicate-state scan as __init__ (unconditional
        # RNG draw for stream parity): a verbose from_solution zeroes
        # identical-state pairs in dDelta matrices exactly like a verbose
        # fresh construction (reference mbar.py:279-317).
        self._scan_duplicate_states()
        self.states_with_samples = np.where(self.N_k != 0)[0].astype(np.int64)
        self.K_nonzero = self.states_with_samples.size
        self.mesh = None
        self.n_bootstraps = 0
        self.bootstrap_at_floor = None
        self._Log_W_nk = None
        return self

    def _scan_duplicate_states(self, relative_tolerance=1.0e-7):
        """Duplicate-state detection on a small random subsample (reference
        mbar.py:279-317), shared by ``__init__`` and ``from_solution``.

        The RNG draw happens unconditionally so bootstrap streams are
        identical regardless of verbosity; the O(K^2) comparison itself is
        verbose-gated (as in the reference).  Populates ``self.samestates``,
        which ``_zerosamestates`` consumes when zeroing dDelta entries.
        """
        self.samestates = []
        maxpoint = min(50, self.N)
        indices = self.rng.choice(np.arange(self.N), maxpoint)
        if self.verbose:
            u_sub = np.asarray(self.u_kn[:, indices], dtype=np.float64)
            for k in range(self.K):
                for l in range(k):
                    uzero = u_sub[k] - u_sub[l]
                    if np.dot(uzero, uzero) < relative_tolerance:
                        self.samestates.append([k, l])
                        self.samestates.append([l, k])
                        logger.warning(
                            f"States {l:d} and {k:d} have the same energies "
                            "on the dataset.\n"
                            "They are therefore likely to to be the same "
                            "thermodynamic state. This can occasionally "
                            "cause\nnumerical problems with computing the "
                            "covariance of their energy difference, which "
                            "must be\nidentically zero in any case. Consider "
                            "combining them into a single state.\n"
                        )

    def _bootstrap_solve_batched(self, stage, verbose):
        """Solve all bootstrap replicates batched under vmap (the shared
        machinery in solvers.batched_bootstrap_solve; reference per-replicate
        semantics mbar.py:417-449)."""
        options = stage.get("options") or {}
        f_boots, n_fail = mbar_solvers.batched_bootstrap_solve(
            self.u_kn,
            self.N_k,
            self.f_k,
            self.bootstrap_rints,
            maxiter=int(options.get("maxiter", 10000)),
            min_sc_iter=int(options.get("min_sc_iter", 2)),
            gamma=float(options.get("gamma", 1.0)),
            tol=1.0e-12,  # solve_mbar_once default
            verbose=verbose,
        )
        self.f_k_boots[:] = f_boots
        if n_fail:
            logger.warning(
                f"{n_fail:d}/{self.n_bootstraps:d} bootstrap replicates did "
                "not converge to within tolerance."
            )

    @staticmethod
    def _resolve_protocol(prot, default, maximum_iterations):
        """Reference protocol-normalization semantics (mbar.py:367-411)."""
        if prot is None or prot == "default":
            prot = default
        elif prot == "robust":
            prot = ROBUST_SOLVER_PROTOCOL
        elif prot == "jax":
            prot = JAX_SOLVER_PROTOCOL
        else:
            for solver in prot:
                if not isinstance(solver, dict):
                    logger.warning(
                        "solver protocol is not 'robust','default' or a "
                        "tuple/list of dictionaries, setting to 'default'"
                    )
                    prot = default
                    break
        prot = tuple(dict(stage) for stage in prot)  # deep-ish copy
        for solver in prot:
            solver["options"] = dict(solver.get("options") or {})
            solver.setdefault("continuation", None)
            if "maxiter" not in solver["options"]:
                solver["options"]["maxiter"] = maximum_iterations
            if maximum_iterations > solver["options"]["maxiter"]:
                solver["options"]["maxiter"] = maximum_iterations
                logger.info(
                    f"Explicitly overwriting maxiter="
                    f"{solver['options']['maxiter']} with maximum_iterations="
                    f"{maximum_iterations}"
                )
        return prot

    # -------------------------------------------------------------------------
    # Weights
    # -------------------------------------------------------------------------

    @property
    def Log_W_nk(self):
        """The N x K log-weight matrix (reference mbar.py:455), computed on
        first access and cached."""
        if self._Log_W_nk is None:
            self._Log_W_nk = np.array(
                mbar_log_W_nk(
                    jnp.asarray(self.u_kn),
                    jnp.asarray(self.N_k, dtype=np.float64),
                    jnp.asarray(self.f_k),
                )
            )
        return self._Log_W_nk

    @Log_W_nk.setter
    def Log_W_nk(self, value):
        self._Log_W_nk = value

    @property
    def W_nk(self):
        """The N x K weight matrix ``exp(Log_W_nk)``.

        ``W_nk[n, k]`` is sample n's normalized weight in state k's
        estimate (columns sum to 1; rows weighted by N_k sum to 1).
        Materializes the log-weights on first access.
        """
        return np.exp(self.Log_W_nk)

    def weights(self):
        """Retrieve the N x K weight matrix (method form of :attr:`W_nk`).

        Returns
        -------
        np.ndarray, shape (N, K)
            ``W_nk = exp(Log_W_nk)``.

        Notes
        -----
        Reference: ``pymbar.MBAR.weights``
        (pymbar 4.x mbar.py:481-493).
        """
        return np.exp(self.Log_W_nk)

    # -------------------------------------------------------------------------
    # Diagnostics
    # -------------------------------------------------------------------------

    def _gram_colsum(self):
        """(W^T W, colsum W) via one streamed device pass — W never exists
        in (N, K) form.  Sum_n W_nk^2 = Gram diagonal; overlap and the
        asymptotic covariance consume the same aggregates."""
        gram, colsum, _rowstats = mbar_gram_normalization(
            self.u_kn, self.N_k, self.f_k, tolerance=np.inf
        )
        return np.asarray(gram), np.asarray(colsum)

    def compute_effective_sample_number(self, verbose=False):
        """Kish effective sample size of each state's MBAR estimate.

        ``N_eff[k] = 1 / sum_n W_nk^2`` — how many independent samples the
        weighted estimate at state k is effectively worth.  Bounded by
        ``N_k <= N_eff[k] <= sum_k N_k`` for sampled states.

        Parameters
        ----------
        verbose : bool, optional, default False
            Log each state's efficiency.

        Returns
        -------
        np.ndarray, shape (K,)
            Effective sample counts.

        Notes
        -----
        ``sum_n W_nk^2`` is the Gram diagonal, so this is one streamed
        device pass with no N x K materialization.  Reference:
        ``pymbar.MBAR.compute_effective_sample_number``
        (pymbar 4.x mbar.py:496-560).
        """
        gram, _colsum, _stats = mbar_gram_normalization(
            self.u_kn, self.N_k, self.f_k, tolerance=np.inf
        )
        # only the Gram diagonal leaves the device: (K,) instead of the
        # (K, K) matrix — the full-matrix download costs ~0.8 s over the
        # tunnel frontend at K=1024 and carries no information here
        N_eff = 1.0 / np.asarray(jnp.diag(gram))
        if verbose:
            for k in range(self.K):
                logger.info(
                    f"Effective number of sample in state {k:d} is {N_eff[k]:10.3f}"
                )
                logger.info(
                    "Efficiency for state {:d} is {:6f}/{:d} = {:10.4f}".format(
                        k, N_eff[k], self.N, N_eff[k] / self.N
                    )
                )
        return N_eff

    def compute_overlap(self):
        """Phase-space overlap between the sampled states.

        Returns
        -------
        dict
            ``'matrix'`` : (K, K) overlap matrix ``O = N_k (W^T W)`` (row k
            sums to 1; ``O[k, l]`` is the probability a sample from state k
            "looks like" it came from state l); ``'eigenvalues'`` : its
            spectrum, descending; ``'scalar'`` : ``1 - lambda_2``, a single
            overlap quality number (1 = perfect overlap, 0 = disconnected).

        Notes
        -----
        W^T W comes from one streamed device Gram pass — no N x K weight
        matrix is formed.  Reference: ``pymbar.MBAR.compute_overlap``
        (pymbar 4.x mbar.py:563-617).

        Examples
        --------
        >>> import numpy as np
        >>> from pymbar_tpu import MBAR
        >>> from pymbar_tpu.testsystems import HarmonicOscillatorsTestCase
        >>> tc = HarmonicOscillatorsTestCase(O_k=[0.0, 0.0], K_k=[1.0, 1.0])
        >>> x_n, u_kn, N_k, s_n = tc.sample(N_k=[200, 200], mode="u_kn", seed=1)
        >>> O = MBAR(u_kn, N_k).compute_overlap()["matrix"]
        >>> bool(np.allclose(O, 0.5, atol=1e-6))  # identical states: 1/K
        True
        """
        gram, _ = self._gram_colsum()
        O = self.N_k * gram
        # O = G diag(N_k) with G = W^T W symmetric PSD, so O shares its
        # spectrum with the symmetric D^{1/2} G D^{1/2} (similarity via
        # D^{1/2}; zero-sample states contribute exact zero rows/columns
        # in both forms) — eigvalsh is ~3x cheaper than the nonsymmetric
        # eigvals on the single-vCPU host and returns a real spectrum.
        s = np.sqrt(np.asarray(self.N_k, dtype=np.float64))
        eigenvals = np.sort(np.linalg.eigvalsh(s[:, None] * gram * s[None, :]))[::-1]
        overlap_scalar = 1 - eigenvals[1]
        return dict(scalar=overlap_scalar, eigenvalues=eigenvals, matrix=O)

    # -------------------------------------------------------------------------
    # Free energy differences
    # -------------------------------------------------------------------------

    def compute_free_energy_differences(
        self,
        compute_uncertainty=True,
        uncertainty_method=None,
        warning_cutoff=1.0e-10,
        return_theta=False,
    ):
        """Free energy differences between all pairs of states.

        Parameters
        ----------
        compute_uncertainty : bool, optional, default True
            Also estimate the statistical uncertainty of each difference.
        uncertainty_method : {None, 'approximate', 'svd', 'svd-ew', 'bootstrap'}, optional
            Covariance estimator.  ``None``/'svd-ew' (default) uses the
            eigendecomposition form of Eq. D4; 'approximate' uses
            Theta = W^T W (Kong 2003, underestimates); 'svd' the explicit
            SVD form; 'bootstrap' the standard deviation over the replicate
            free energies (requires ``n_bootstraps > 0``).
        warning_cutoff : float, optional, default 1.0e-10
            Warn when a squared uncertainty is more negative than this.
        return_theta : bool, optional, default False
            Also return the full K x K covariance matrix Theta.

        Returns
        -------
        dict
            ``'Delta_f'`` : (K, K) array, ``Delta_f[i, j] = f_j - f_i``;
            ``'dDelta_f'`` : (K, K) standard deviations (if
            ``compute_uncertainty``); ``'Theta'`` : (K, K) covariance (if
            ``return_theta``).

        Notes
        -----
        The asymptotic estimators consume W in streamed Gram form — no
        N x K weight matrix is materialized at any scale.  Reference:
        ``pymbar.MBAR.compute_free_energy_differences``
        (pymbar 4.x mbar.py:620-729).

        Examples
        --------
        >>> import numpy as np
        >>> from pymbar_tpu import MBAR
        >>> from pymbar_tpu.testsystems import HarmonicOscillatorsTestCase
        >>> tc = HarmonicOscillatorsTestCase(O_k=[0.0, 1.0], K_k=[1.0, 2.0])
        >>> x_n, u_kn, N_k, s_n = tc.sample(N_k=[300, 300], mode="u_kn", seed=3)
        >>> res = MBAR(u_kn, N_k).compute_free_energy_differences()
        >>> res["Delta_f"].shape, float(res["Delta_f"][0, 0])
        ((2, 2), 0.0)
        """
        Deltaf_ij = np.array(self.f_k - np.vstack(self.f_k))
        self._zerosamestates(Deltaf_ij)

        result_vals = dict()
        result_vals["Delta_f"] = Deltaf_ij

        if uncertainty_method == "bootstrap" and (
            self.n_bootstraps is None or self.n_bootstraps <= 0
        ):
            raise ParameterError(
                "Cannot request bootstrap sampling of free energy differences "
                "without any bootstraps."
            )

        Theta_ij = None
        if (compute_uncertainty and uncertainty_method != "bootstrap") or return_theta:
            Theta_ij = self._compute_theta_streamed(method=uncertainty_method)

        if compute_uncertainty:
            if uncertainty_method == "bootstrap":
                diffm = self.f_k_boots[:, None, :] - self.f_k_boots[:, :, None]
                result_vals["dDelta_f"] = np.std(diffm, axis=0)
            else:
                dDeltaf_ij = np.array(
                    self._ErrorOfDifferences(Theta_ij, warning_cutoff=warning_cutoff)
                )
                self._zerosamestates(dDeltaf_ij)
                result_vals["dDelta_f"] = np.array(dDeltaf_ij)

        if return_theta:
            result_vals["Theta"] = Theta_ij

        return result_vals

    # -------------------------------------------------------------------------
    # Expectations
    # -------------------------------------------------------------------------

    def compute_expectations_inner(
        self,
        A_n,
        u_ln,
        state_map,
        uncertainty_method=None,
        warning_cutoff=1.0e-10,
        return_theta=False,
    ):
        """Augmented-state expectations workhorse (low-level API).

        Augments the state space to ``K + NL + S`` — the K original states,
        NL extra states defined by ``u_ln``, and one pseudo-state per
        observable entry of ``state_map`` — and evaluates free energies,
        observables, and the joint covariance over the augmented weights.
        Observables are shifted positive by ``A_min - 4 eps |A_min|`` so
        everything runs in log space.

        Parameters
        ----------
        A_n : np.ndarray, shape (n_obs, N)
            Observable rows referenced by ``state_map[1]``.
        u_ln : np.ndarray, shape (NL, N)
            Reduced potentials of the extra states.
        state_map : np.ndarray, int, shape (2, S) or (S,)
            Row 0: which extra state each observable pseudo-state attaches
            to; row 1: which ``A_n`` row it averages.  A 1-D array means
            "free energies only" (no observables).
        uncertainty_method, warning_cutoff, return_theta
            As in :meth:`compute_expectations`.

        Returns
        -------
        dict
            ``'observables'`` (S,), ``'f'`` (per state_list entry),
            ``'Theta'`` (block form: S observable rows first, then the
            state rows), ``'Amin'``, and — under
            ``uncertainty_method='bootstrap'`` — ``'bootstrapped_observables'``
            / ``'bootstrapped_f'``.

        Notes
        -----
        Above 512 MB of ``u_kn`` the whole machinery streams over sample
        chunks on device (no N x (K+NL+S) matrix exists).  Reference:
        ``pymbar.MBAR.compute_expectations_inner``
        (pymbar 4.x mbar.py:732-1030).
        """
        logfactor = 4.0 * np.finfo(np.float64).eps

        state_map = np.asarray(state_map)
        mapshape = np.shape(state_map)
        if len(mapshape) < 2:
            state_list = state_map.copy()
            state_map = np.zeros([0, 0], int)
            S = 0
        else:
            state_list = state_map[0, :]
            S = mapshape[1]

        # The most common call pattern passes u_ln = self.u_kn (every
        # sampled state is also an evaluation state, e.g.
        # compute_expectations / compute_entropy_and_enthalpy with the
        # default potentials).  Detect the alias BEFORE any conversion: a
        # device-resident u_kn would otherwise be pulled to host here, and
        # the streamed path can reuse the resident matrix for both roles.
        u_ln_alias = u_ln is self.u_kn
        if not u_ln_alias:
            u_ln = np.asarray(u_ln, dtype=np.float64)
            if u_ln.ndim == 1:
                u_ln = u_ln.reshape(1, -1)

        # Aliased-observable fast path: compute_entropy_and_enthalpy passes
        # A_n = u_kn itself (one observable row per state).  With a
        # device-resident matrix the host copy below would pull GBs across
        # the ~3-25 MB/s tunnel; instead keep the alias — the positivity
        # shift becomes a device per-row min, and the streamed passes
        # rebuild each (shifted) observable chunk on device from the SAME
        # resident buffer.  Engages only when the streamed branch will run
        # with the diag observable layout (row s = state s).
        uls = np.unique(state_list) if S > 0 else np.zeros(0, int)
        a_alias = (
            A_n is self.u_kn
            and u_ln_alias
            and _is_dev(self.u_kn)
            and self.u_kn.nbytes >= _AUG_STREAM_BYTES
            and uncertainty_method != "svd"
            and (uncertainty_method != "bootstrap" or self.n_bootstraps > 0)
            and S > 0
            and np.array_equal(uls, np.arange(uls.size))
            # row 0 must be the IDENTITY map, not merely a permutation
            # covering arange: the diagmul kernels pair observable row s
            # with extra state s positionally (e_s = la_c * e_l skips the
            # lidx row-select), so a permuted state_map[0] would silently
            # mis-pair observables with states.
            and np.array_equal(state_map[0, :S], np.arange(S))
            and np.array_equal(state_map[1, :S], np.arange(S))
            # the streamed router below additionally requires
            # u_ln.shape[0] == NL; with the alias u_ln.shape[0] == K, so
            # the state_list must cover every sampled state — otherwise
            # the materializing fallback would run on the UNSHIFTED A_n
            and uls.size == self.u_kn.shape[0]
        )
        if not a_alias:
            # Work on a float64 copy of the observables: the reference
            # shifts A_n in place and restores it afterwards
            # (mbar.py:864-878, :973-975); the net caller-visible effect is
            # none, which a copy also delivers.
            A_n = np.array(A_n, dtype=np.float64)
            if A_n.ndim == 1:
                A_n = A_n.reshape(1, -1)

        K = self.K
        N = self.N
        result_vals = dict()

        L_list = np.unique(state_list)
        NL = len(L_list)
        if S > 0:
            A_list = np.unique(state_map[1, :])
            A_min = np.zeros(int(np.max(A_list)) + 1, dtype=np.float64)
            logfactors = np.zeros(int(np.max(A_list)) + 1, dtype=np.float64)
        else:
            A_list = np.zeros(0, dtype=int)
            A_min = np.zeros(0, dtype=np.float64)
            logfactors = np.zeros(0, dtype=np.float64)

        if a_alias:
            # per-row min in ONE device pass; the shift itself is applied
            # chunkwise on device inside the streamed passes
            row_min = np.asarray(jnp.min(A_n, axis=1))
            for i in A_list:
                A_min[i] = row_min[i]
                logfactors[i] = np.abs(logfactor * A_min[i])
            a_shift = A_min - logfactors  # (n_obs,) == (K,)
        else:
            a_shift = None
            for i in A_list:
                A_min[i] = np.min(A_n[i, :])
                logfactors[i] = np.abs(logfactor * A_min[i])
                A_n[i, :] = A_n[i, :] - (A_min[i] - logfactors[i])

        msize = K + NL + S

        # At scale the N x msize augmented matrix cannot exist (160+ GB at
        # the K=1024 x N=1e7 target): stream the whole machinery over
        # n-chunks on device instead, including bootstrap replicates (one
        # counts-weighted pass-A per replicate — no resampled matrix).
        # Only the 'svd' estimator keeps the materializing path (it needs
        # the SVD of W itself; it exists for small-scale cross-validation).
        if (
            self.u_kn.nbytes >= _AUG_STREAM_BYTES
            and uncertainty_method != "svd"
            and (uncertainty_method != "bootstrap" or self.n_bootstraps > 0)
            # every caller builds contiguous extra states; anything else
            # keeps the reference's materializing path
            and np.array_equal(np.asarray(L_list), np.arange(NL))
            and u_ln.shape[0] == NL
        ):
            f_aug, Theta_ij, boot = self._expectations_streamed(
                A_n, u_ln, state_map, S, L_list,
                method=uncertainty_method, need_theta=return_theta,
                bootstrap=uncertainty_method == "bootstrap",
                u_ln_alias=u_ln_alias, a_alias=a_alias, a_shift=a_shift,
            )
            A_i = np.exp(-f_aug[K + NL : K + NL + S])
            if S > 0:
                result_vals["observables"] = A_i + (
                    A_min[state_map[1, :S]] - logfactors[state_map[1, :S]]
                )
            result_vals["f"] = f_aug[K + state_list]
            if boot is not None:
                A_boot, logC_boot = boot
                if S > 0:
                    result_vals["bootstrapped_observables"] = A_boot + (
                        A_min[state_map[1, :S]] - logfactors[state_map[1, :S]]
                    )[None, :]
                else:
                    result_vals["bootstrapped_observables"] = A_boot
                result_vals["bootstrapped_f"] = logC_boot[:, state_list]
            if return_theta:
                si = K + NL + np.arange(S) if S > 0 else np.zeros(0, dtype=int)
                li = K + state_list
                idx = np.concatenate((si, li))
                result_vals["Theta"] = Theta_ij[np.ix_(idx, idx)]
                if S > 0:
                    result_vals["Amin"] = (
                        A_min[state_map[1, np.arange(S)]]
                        - logfactors[state_map[1, np.arange(S)]]
                    )
            return result_vals

        if u_ln_alias:
            # the streamed branch did not take over: the materializing path
            # needs a host float64 u_ln (a no-op view when u_kn is host)
            u_ln = np.asarray(u_ln, dtype=np.float64)
        Log_W_nk = np.zeros([N, msize], np.float64)
        N_k = np.zeros(msize, np.int64)
        f_k = np.zeros(msize, np.float64)

        if uncertainty_method == "bootstrap":
            n_total = self.n_bootstraps + 1
            A_i_bootstrap = np.zeros([self.n_bootstraps, S])
            f_bootstrap = np.zeros([self.n_bootstraps, len(state_list)])
        else:
            n_total = 1

        N_k_float = jnp.asarray(self.N_k, dtype=np.float64)
        Theta_ij = None

        for n in range(n_total):
            N_k[0:K] = self.N_k
            if n == 0:
                f_k[0:K] = self.f_k
                u_kn = self.u_kn
                Log_W_nk[:, 0:K] = self.Log_W_nk
                ri = np.arange(self.N)
            else:
                f_k[0:K] = self.f_k_boots[n - 1, :]
                ri = self.bootstrap_rints[n - 1]
                u_kn = self.u_kn[:, ri]
                Log_W_nk[:, 0:K] = np.asarray(
                    mbar_log_W_nk(jnp.asarray(u_kn), N_k_float, jnp.asarray(f_k[0:K]))
                )

            # Per-sample mixture log-normalizer over sampled states only
            # (Eqns 13-14 of the MBAR paper), on device.
            sws = self.N_k > 0
            log_denominator_n = np.asarray(
                dev_log_denominator_n(
                    jnp.asarray(u_kn[sws]),
                    jnp.asarray(self.N_k[sws], dtype=np.float64),
                    jnp.asarray(f_k[0:K][sws]),
                )
            )

            # Extra states from u_ln.
            for l in L_list:
                la = K + l
                log_C_a = -logsumexp(-u_ln[l, ri] - log_denominator_n)
                Log_W_nk[:, la] = log_C_a - u_ln[l, ri] - log_denominator_n
                f_k[la] = log_C_a

            # Observable pseudo-states.
            for s in range(S):
                sa = K + NL + s
                l = K + state_map[0, s]
                i = state_map[1, s]
                with np.errstate(divide="ignore"):
                    Log_W_nk[:, sa] = np.log(A_n[i, ri]) + Log_W_nk[:, l]
                f_k[sa] = -logsumexp(Log_W_nk[:, sa])
                Log_W_nk[:, sa] += f_k[sa]

            A_i = np.exp(-f_k[K + NL : K + NL + S])

            if n == 0:
                shifted = A_i + (
                    A_min[state_map[1, :S]] - logfactors[state_map[1, :S]]
                    if S > 0
                    else 0.0
                )
                if S > 0:
                    result_vals["observables"] = shifted
                if return_theta:
                    Theta_ij = self._computeAsymptoticCovarianceMatrix(
                        np.exp(Log_W_nk), N_k, method=uncertainty_method
                    )
                result_vals["f"] = f_k[K + state_list]
            else:
                if S > 0:
                    A_i_bootstrap[n - 1, :] = A_i + (
                        A_min[state_map[1, :S]] - logfactors[state_map[1, :S]]
                    )
                f_bootstrap[n - 1, :] = f_k[K + state_list]

        if uncertainty_method == "bootstrap":
            result_vals["bootstrapped_observables"] = A_i_bootstrap
            result_vals["bootstrapped_f"] = f_bootstrap

        if return_theta:
            # Reorder Theta into block form: S observable rows first, then the
            # state_list free-energy rows (reference mbar.py:979-1000).
            if S > 0:
                si = K + NL + np.arange(S)
            else:
                si = np.zeros(0, dtype=int)
            li = K + state_list
            idx = np.concatenate((si, li))
            result_vals["Theta"] = Theta_ij[np.ix_(idx, idx)]
            if S > 0:
                result_vals["Amin"] = (
                    A_min[state_map[1, np.arange(S)]]
                    - logfactors[state_map[1, np.arange(S)]]
                )

        return result_vals

    def _expectations_streamed(
        self, A_n, u_ln, state_map, S, L_list, method, need_theta,
        bootstrap=False, u_ln_alias=False, a_alias=False, a_shift=None,
    ):
        """Augmented-state expectations without the N x (K+NL+S) matrix.

        Same algebra as the materializing branch (reference mbar.py:732-1030)
        in two chunked device passes over the sample axis:

        * pass A accumulates each extra state's log normalizer
          log C_l = -logsumexp_n(-u_ln[l] - logden_n) and each observable
          pseudo-state's reduction logsumexp_n(log A + (-u_l - logden)) with
          running-max rescaled-sum carries (flash-logsumexp across chunks);
        * pass B (only when a covariance is requested) rebuilds each
          augmented weight slab in log space on device and accumulates the
          (K+NL+S)^2 Gram, column sums and row-normalization aggregates.

        With ``bootstrap=True`` pass A additionally runs once per replicate
        in counts-weighted form: a resample's reductions are sums over the
        SAME columns weighted by the resample multiplicities, evaluated at
        the replicate's f_k — so bootstrap uncertainties of expectations
        work at any scale with no resampled matrix (the reference gathers
        one per replicate, mbar.py:897-967).

        Peak memory is one n-chunk; at the K=1024 x N=1e7 target the host
        path's augmented matrix alone would be 160+ GB.  Returns
        (f_aug (msize,), Theta or None, boot or None) with boot =
        (A_i_bootstrap_raw (B, S), logC_bootstrap (B, NL)).
        """
        from pymbar_tpu.config import on_tpu

        K = self.K
        N = self.N
        NL = len(L_list)
        msize = K + NL + S
        sws = np.where(self.N_k > 0)[0]

        l_of_s = state_map[0, :S].astype(int) if S > 0 else np.zeros(0, int)
        i_of_s = state_map[1, :S].astype(int) if S > 0 else np.zeros(0, int)
        # NOT np.asarray: with u_ln_alias (u_ln IS self.u_kn) a device-
        # resident matrix must not be pulled to host; slicing below works
        # for numpy and jax arrays alike.

        f_dev = jnp.asarray(self.f_k)
        fs_dev = jnp.asarray(self.f_k[sws])
        Ns_dev = jnp.asarray(self.N_k[sws], dtype=jnp.float64)
        Nk_dev = jnp.asarray(self.N_k, dtype=jnp.float64)
        sws_dev = jnp.asarray(sws)
        lidx_dev = jnp.asarray(l_of_s)

        # Statically specialize the row selections (TPU gathers are slow;
        # the common patterns are trivial: all states sampled, lidx an
        # arange or a constant — see _row_select).
        sws_mode = "identity" if len(sws) == K else "gather"
        lidx_mode = _idx_mode(l_of_s, len(L_list))

        nc = max(1, int(_AUG_CHUNK_BYTES // (8 * max(K, 1))))
        starts = list(range(0, N, nc))

        def combine(m, s, m_c, s_c):
            m_new = np.maximum(m, m_c)
            safe = np.where(np.isfinite(m_new), m_new, 0.0)
            return m_new, s * np.exp(m - safe) + s_c * np.exp(m_c - safe)

        if a_alias:
            # A_n IS the resident u_kn (diag layout, row s = state s): no
            # host log matrix exists; every observable chunk is rebuilt on
            # device as (u_chunk - a_shift) from the SAME buffer.
            logA = None
            shift_dev = jnp.asarray(a_shift)
        else:
            with np.errstate(divide="ignore"):
                logA = np.log(A_n) if S > 0 else np.zeros((0, N))

        # When u_kn already lives on device and the extra-state/observable
        # row matrices are small — or alias the resident matrix itself —
        # the whole pass runs as ONE fori_loop dispatch (the host-chunked
        # form costs several frontend round trips per chunk — which
        # dominates wall time on tunneled/remote TPU frontends).  The
        # aliased diag layout (entropy's u_kn-as-observable) rides the
        # scans too: its observable chunks rebuild on device from the SAME
        # resident buffer (a_mode='diagmul'/'diag').  Only a large
        # non-aliased observable matrix keeps the host-chunked path.
        device_scan = (
            isinstance(self.u_kn, _jax.Array)
            and (NL <= 4 or u_ln_alias)
            and (a_alias or logA.shape[0] <= 4)
        )
        if device_scan:
            # with the alias this is the SAME buffer as u_kn (no copy);
            # the scan kernels then skip the u_ln slice entirely
            u_ln_dev = self.u_kn if u_ln_alias else jnp.asarray(u_ln)
            logA_dev = (
                jnp.zeros((0, N)) if a_alias else jnp.asarray(logA)
            )
            iofs_dev = jnp.asarray(i_of_s)
            iofs_mode = (
                "identity" if a_alias else _idx_mode(i_of_s, logA.shape[0])
            )
            # Scan chunks shrink below the streaming chunk size: inside ONE
            # dispatch the per-chunk latency is gone, and the loop-body
            # temporaries (several (K + NL + S, nc) emulated-f64 slabs)
            # must leave HBM headroom next to the resident matrix.  The
            # msize/K factor keeps the slab budget constant as the
            # augmented extent grows (NL = K for the alias case).
            scan_div = 4 * max(1, (K + NL + S) // max(K, 1))

        def run_pass_a(fs_values, counts=None):
            """(log_C (NL,), f_sa (S,)) at the given sampled-state f values,
            optionally counts-weighted (one streamed pass over u_kn)."""
            if device_scan:
                c_dev = None if counts is None else jnp.asarray(counts)
                # 4x smaller chunks than the host-streamed form: inside
                # ONE dispatch the per-chunk latency is gone, and smaller
                # chunks shrink the emulated-f64 loop-body temporaries
                # (compile-time HBM headroom next to the resident matrix).
                ml, sl, ms, ss = _aug_pass_a_scan(
                    self.u_kn, u_ln_dev, logA_dev, iofs_dev, sws_dev,
                    Ns_dev, fs_values, lidx_dev, scan_div * len(starts),
                    c_dev, alias=u_ln_alias, sws_mode=sws_mode,
                    lidx_mode=lidx_mode, iofs_mode=iofs_mode,
                    a_mode="diagmul" if a_alias else "log",
                    a_shift=shift_dev if a_alias else None,
                )
                m_l, s_l = np.asarray(ml), np.asarray(sl)
                m_s, s_s = np.asarray(ms), np.asarray(ss)
            else:
                # On TPU the running combines stay device arrays: a per-chunk
                # np.asarray forces a sync + tunnel round trip (~30-45 ms)
                # EVERY chunk, serializing the pipeline; device carries let
                # all chunk dispatches enqueue back to back, converting once
                # after the loop.  CPU keeps the host combine byte-identical.
                dev_acc = on_tpu()
                if dev_acc:
                    m_l = jnp.full(NL, -jnp.inf, dtype=jnp.float64)
                    s_l = jnp.zeros(NL, dtype=jnp.float64)
                    m_s = jnp.full(S, -jnp.inf, dtype=jnp.float64)
                    s_s = jnp.zeros(S, dtype=jnp.float64)
                else:
                    m_l = np.full(NL, -np.inf)
                    s_l = np.zeros(NL)
                    m_s = np.full(S, -np.inf)
                    s_s = np.zeros(S)
                for c0 in starts:
                    c1 = min(c0 + nc, N)
                    c_c = None if counts is None else jnp.asarray(counts[c0:c1])
                    # with the alias, hand pass A the SAME device chunk for
                    # u and u_ln — re-uploading it doubles the host->device
                    # traffic that dominates this path's wall time
                    u_dev_c = jnp.asarray(self.u_kn[:, c0:c1])
                    ul_dev_c = (
                        u_dev_c if u_ln_alias else jnp.asarray(u_ln[:, c0:c1])
                    )
                    if a_alias:
                        # diag layout (i_of_s = arange): the RAW shifted
                        # observable slab from the resident chunk, on
                        # device — consumed multiplicatively (a_mode=
                        # "diagmul": no log slab, no second exp slab)
                        la_dev_c = u_dev_c - shift_dev[:, None]
                    else:
                        la_dev_c = jnp.asarray(
                            logA[i_of_s, c0:c1].reshape(S, c1 - c0)
                        )
                    ml_c, sl_c, ms_c, ss_c = _aug_pass_a(
                        u_dev_c,
                        ul_dev_c,
                        la_dev_c,
                        sws_dev, Ns_dev, fs_values, lidx_dev, c_c,
                        sws_mode=sws_mode, lidx_mode=lidx_mode,
                        a_mode="diagmul" if a_alias else "log",
                    )
                    if dev_acc:
                        m_l, s_l = _aug_combine_dev(m_l, s_l, ml_c, sl_c)
                        m_s, s_s = _aug_combine_dev(m_s, s_s, ms_c, ss_c)
                    else:
                        with np.errstate(invalid="ignore"):
                            m_l, s_l = combine(m_l, s_l, np.asarray(ml_c), np.asarray(sl_c))
                            m_s, s_s = combine(m_s, s_s, np.asarray(ms_c), np.asarray(ss_c))
                if dev_acc:
                    m_l, s_l = np.asarray(m_l), np.asarray(s_l)
                    m_s, s_s = np.asarray(m_s), np.asarray(s_s)
            with np.errstate(divide="ignore"):
                log_C = -(np.log(s_l) + m_l)  # (NL,)
                R_s = np.log(s_s) + m_s  # (S,)
            f_sa = -(log_C[l_of_s] + R_s) if S > 0 else np.zeros(0)
            return log_C, f_sa

        log_C, f_sa = run_pass_a(fs_dev)

        f_aug = np.zeros(msize)
        f_aug[:K] = self.f_k
        f_aug[K : K + NL] = log_C  # L_list == arange(NL), checked by the router
        f_aug[K + NL :] = f_sa

        boot = None
        if bootstrap:
            B = self.n_bootstraps
            if device_scan:
                # resident matrix: per-replicate scans cost no transfer
                A_boot = np.zeros((B, S))
                logC_boot = np.zeros((B, NL))
                for b in range(B):
                    # f32 counts: exact (small integers), half the
                    # per-replicate host->device transfer
                    counts_b = _resample_counts(
                        self.bootstrap_rints[b], N, np.float32
                    )
                    fs_b = jnp.asarray(self.f_k_boots[b][sws])
                    logC_b, f_sa_b = run_pass_a(fs_b, counts_b)
                    logC_boot[b] = logC_b
                    A_boot[b] = np.exp(-f_sa_b)
            else:
                # host-resident matrix: upload each chunk ONCE and run all
                # B replicates against it on device (per-replicate streaming
                # would re-upload u_kn B times — TBs at the GB scale)
                counts_all = np.empty((B, N), np.float32)
                for b in range(B):
                    counts_all[b] = _resample_counts(
                        self.bootstrap_rints[b], N, np.float32
                    )
                fs_all = jnp.asarray(self.f_k_boots[:, sws])
                dev_acc = on_tpu()
                if dev_acc:
                    m_l = jnp.full((B, NL), -jnp.inf, dtype=jnp.float64)
                    s_l = jnp.zeros((B, NL), dtype=jnp.float64)
                    m_s = jnp.full((B, S), -jnp.inf, dtype=jnp.float64)
                    s_s = jnp.zeros((B, S), dtype=jnp.float64)
                else:
                    m_l = np.full((B, NL), -np.inf)
                    s_l = np.zeros((B, NL))
                    m_s = np.full((B, S), -np.inf)
                    s_s = np.zeros((B, S))
                for c0 in starts:
                    c1 = min(c0 + nc, N)
                    u_dev_c = jnp.asarray(self.u_kn[:, c0:c1])
                    ul_dev_c = (
                        u_dev_c if u_ln_alias else jnp.asarray(u_ln[:, c0:c1])
                    )
                    if a_alias:
                        la_dev_c = u_dev_c - shift_dev[:, None]
                    else:
                        la_dev_c = jnp.asarray(
                            logA[i_of_s, c0:c1].reshape(S, c1 - c0)
                        )
                    ml_c, sl_c, ms_c, ss_c = _aug_pass_a_multi(
                        u_dev_c,
                        ul_dev_c,
                        la_dev_c,
                        sws_dev, Ns_dev, fs_all, lidx_dev,
                        jnp.asarray(counts_all[:, c0:c1]),
                        sws_mode=sws_mode, lidx_mode=lidx_mode,
                        a_mode="diagmul" if a_alias else "log",
                    )
                    if dev_acc:
                        m_l, s_l = _aug_combine_dev(m_l, s_l, ml_c, sl_c)
                        m_s, s_s = _aug_combine_dev(m_s, s_s, ms_c, ss_c)
                    else:
                        with np.errstate(invalid="ignore"):
                            m_l, s_l = combine(m_l, s_l, np.asarray(ml_c), np.asarray(sl_c))
                            m_s, s_s = combine(m_s, s_s, np.asarray(ms_c), np.asarray(ss_c))
                if dev_acc:
                    m_l, s_l = np.asarray(m_l), np.asarray(s_l)
                    m_s, s_s = np.asarray(m_s), np.asarray(s_s)
                with np.errstate(divide="ignore"):
                    logC_boot = -(np.log(s_l) + m_l)  # (B, NL)
                    R_s = np.log(s_s) + m_s  # (B, S)
                A_boot = (
                    np.exp(logC_boot[:, l_of_s] + R_s)
                    if S > 0 else np.zeros((B, 0))
                )
            boot = (A_boot, logC_boot)

        if not need_theta:
            return f_aug, None, boot

        # ---- pass B: augmented Gram + normalization aggregates.
        compute_dtype = jnp.float32 if on_tpu() else jnp.float64
        logC_dev = jnp.asarray(log_C)
        # observable rows: (f_sa + log C_l) + log A - u_l - logden
        obs_shift = jnp.asarray(f_sa + (log_C[l_of_s] if S > 0 else 0.0))

        sentinel = jnp.asarray(N + 1, jnp.int64)

        def pass_b(u_c, ul_c, la_c, base):
            return _aug_pass_b(
                u_c, ul_c, la_c, base, sws_dev, Ns_dev, fs_dev, f_dev,
                logC_dev, obs_shift, lidx_dev, Nk_dev, sentinel, K,
                compute_dtype, sws_mode=sws_mode, lidx_mode=lidx_mode,
            )

        # Structured aliased Gram: with u_ln aliasing u_kn, two observable
        # layouts collapse the (K+NL+S)^2 Gram to three K x K Grams (see
        # _aug_b_struct_body) — 3x fewer MXU flops and exp slabs at
        # msize = 3K: all S pseudo-states sharing ONE observable row
        # (compute_expectations at every state), or pseudo-state s pairing
        # observable row s with extra state s (entropy/enthalpy's
        # u_kn-as-observable layout).
        n_obs = int(A_n.shape[0]) if S > 0 else 0  # works for device A_n
        row0_b = (
            _STRUCT_AUG_GRAM and u_ln_alias and S > 0 and NL == K
            and not a_alias
            and _idx_mode(i_of_s, n_obs) == "zero"
        )
        diag_b = (
            _STRUCT_AUG_GRAM and u_ln_alias and S == K and NL == K
            and not row0_b
            and lidx_mode == "identity"
            and _idx_mode(i_of_s, n_obs) == "identity"
        )
        # On TPU the augmented Gram STAYS a device array end to end (the
        # tunneled frontend transfers at ~3-25 MB/s, so each avoided m x m
        # download is seconds; the Theta algebra downstream is device-aware).
        # On CPU the numpy flow is kept byte-identical for the suite.
        dev_gram = on_tpu()
        if row0_b or diag_b:
            la_row = logA[0] if row0_b else None
            if (row0_b or a_alias) and device_scan:
                # diag_b with device_scan implies a_alias (a non-aliased
                # diag observable matrix is K rows, which blocks the scan
                # router): the observable slab rebuilds on device per chunk.
                out = _aug_pass_b_scan_struct(
                    self.u_kn,
                    jnp.zeros(0) if a_alias else jnp.asarray(la_row),
                    sws_dev, Ns_dev,
                    fs_dev, f_dev, Nk_dev, sentinel, K, compute_dtype,
                    scan_div * len(starts), sws_mode=sws_mode,
                    a_mode="diag" if a_alias else "logrow",
                    a_shift=shift_dev if a_alias else None,
                )
                if dev_gram:
                    M0, M1, M2 = out[0], out[1], out[2]
                else:
                    M0, M1, M2 = (np.asarray(o) for o in out[:3])
                c0s, cAs = np.asarray(out[3]), np.asarray(out[4])
                n_bad, first_bad, first_val = (
                    int(out[5]), int(out[6]), float(out[7]),
                )
            else:
                zeros = jnp.zeros if dev_gram else np.zeros
                M0 = zeros((K, K))
                M1 = zeros((K, K))
                M2 = zeros((K, K))
                if dev_gram:
                    # device-resident small accumulators too: per-chunk
                    # np.asarray/int() would sync the pipeline every chunk
                    c0s = jnp.zeros(K)
                    cAs = jnp.zeros(K)
                    nbad_d = jnp.zeros((), jnp.int64)
                    fbad_d = jnp.asarray(N + 1, jnp.int64)
                    fval_d = jnp.zeros((), jnp.float64)
                else:
                    c0s = np.zeros(K)
                    cAs = np.zeros(K)
                n_bad, first_bad, first_val = 0, N + 1, 0.0
                for c0 in starts:
                    c1 = min(c0 + nc, N)
                    u_dev_c = jnp.asarray(self.u_kn[:, c0:c1])
                    if row0_b:
                        a_chunk = jnp.asarray(la_row[c0:c1])
                        a_mode = "logrow"
                    elif a_alias:
                        # shifted observable slab rebuilt on device from
                        # the SAME resident chunk (no host slice/upload)
                        a_chunk = (u_dev_c - shift_dev[:, None]).astype(
                            compute_dtype
                        )
                        a_mode = "diag"
                    else:
                        # the (K, nc) observable slab itself, pre-cast so
                        # the TPU upload is half the f64 log-row traffic
                        a_chunk = jnp.asarray(
                            np.asarray(A_n[:, c0:c1], dtype=compute_dtype)
                        )
                        a_mode = "diag"
                    out = _aug_pass_b_struct(
                        u_dev_c,
                        a_chunk,
                        jnp.asarray(c0, dtype=jnp.int64),
                        sws_dev, Ns_dev, fs_dev, f_dev, Nk_dev, sentinel,
                        compute_dtype, sws_mode=sws_mode, a_mode=a_mode,
                    )
                    if dev_gram:
                        M0 = M0 + out[0]
                        M1 = M1 + out[1]
                        M2 = M2 + out[2]
                        c0s = c0s + out[3]
                        cAs = cAs + out[4]
                        nbad_d = nbad_d + out[5]
                        take = out[6] < fbad_d
                        fval_d = jnp.where(take, out[7], fval_d)
                        fbad_d = jnp.where(take, out[6], fbad_d)
                    else:
                        M0 += np.asarray(out[0])
                        M1 += np.asarray(out[1])
                        M2 += np.asarray(out[2])
                        c0s += np.asarray(out[3])
                        cAs += np.asarray(out[4])
                        n_bad += int(out[5])
                        if int(out[6]) < first_bad:
                            first_bad = int(out[6])
                            first_val = float(out[7])
                if dev_gram:
                    c0s = np.asarray(c0s)
                    cAs = np.asarray(cAs)
                    n_bad = int(nbad_d)
                    first_bad = int(fbad_d)
                    first_val = float(fval_d)
            # exact f64 diagonal scalings (K-sized, host)
            D_L = np.exp(log_C - self.f_k)  # W_L = diag(D_L) W_0
            E = np.exp(
                np.asarray(f_sa) + log_C[l_of_s] - self.f_k[l_of_s]
            )  # W_S = diag(E) (A o W_0)[lidx]
            if dev_gram:
                lmode = _idx_mode(l_of_s, K)
                gram = _assemble_struct_gram_dev(
                    M0, M1, M2, jnp.asarray(D_L), jnp.asarray(E),
                    jnp.asarray(l_of_s), "identity" if lmode == "identity"
                    else "gather",
                )
            else:
                gram = np.empty((msize, msize))
                gram[:K, :K] = M0
                gram[:K, K : 2 * K] = M0 * D_L[None, :]
                gram[K : 2 * K, :K] = gram[:K, K : 2 * K].T
                gram[K : 2 * K, K : 2 * K] = D_L[:, None] * M0 * D_L[None, :]
                G0S = M1[:, l_of_s] * E[None, :]
                gram[:K, 2 * K :] = G0S
                gram[2 * K :, :K] = G0S.T
                GLS = D_L[:, None] * G0S
                gram[K : 2 * K, 2 * K :] = GLS
                gram[2 * K :, K : 2 * K] = GLS.T
                gram[2 * K :, 2 * K :] = (
                    E[:, None] * M2[np.ix_(l_of_s, l_of_s)] * E[None, :]
                )
            colsum = np.concatenate([c0s, D_L * c0s, E * cAs[l_of_s]])
        elif device_scan:
            g_c, cs_c, cnt, gidx, val = _aug_pass_b_scan(
                self.u_kn, u_ln_dev, logA_dev, iofs_dev, sws_dev, Ns_dev,
                fs_dev, f_dev, logC_dev, obs_shift, lidx_dev, Nk_dev,
                sentinel, K, compute_dtype, scan_div * len(starts),
                alias=u_ln_alias, sws_mode=sws_mode, lidx_mode=lidx_mode,
                iofs_mode=iofs_mode,
            )
            gram = g_c if dev_gram else np.asarray(g_c)
            colsum = np.asarray(cs_c)
            n_bad = int(cnt)
            first_bad = int(gidx)
            first_val = float(val)
        else:
            gram = jnp.zeros((msize, msize)) if dev_gram else np.zeros(
                (msize, msize)
            )
            if dev_gram:
                colsum = jnp.zeros(msize)
                nbad_d = jnp.zeros((), jnp.int64)
                fbad_d = jnp.asarray(N + 1, jnp.int64)
                fval_d = jnp.zeros((), jnp.float64)
            else:
                colsum = np.zeros(msize)
            n_bad = 0
            first_bad = N + 1
            first_val = 0.0
            for c0 in starts:
                c1 = min(c0 + nc, N)
                u_dev_c = jnp.asarray(self.u_kn[:, c0:c1])
                ul_dev_c = (
                    u_dev_c if u_ln_alias else jnp.asarray(u_ln[:, c0:c1])
                )
                if a_alias:
                    la_dev_c = jnp.log(u_dev_c - shift_dev[:, None])
                else:
                    la_dev_c = jnp.asarray(
                        logA[i_of_s, c0:c1].reshape(S, c1 - c0)
                    )
                g_c, cs_c, cnt, gidx, val = pass_b(
                    u_dev_c,
                    ul_dev_c,
                    la_dev_c,
                    jnp.asarray(c0, dtype=jnp.int64),
                )
                if dev_gram:
                    gram = gram + g_c
                    colsum = colsum + cs_c
                    nbad_d = nbad_d + cnt
                    take = gidx < fbad_d
                    fval_d = jnp.where(take, val, fval_d)
                    fbad_d = jnp.where(take, gidx, fbad_d)
                else:
                    gram += np.asarray(g_c)
                    colsum += np.asarray(cs_c)
                    n_bad += int(cnt)
                    if int(gidx) < first_bad:
                        first_bad = int(gidx)
                        first_val = float(val)
            if dev_gram:
                colsum = np.asarray(colsum)
                n_bad = int(nbad_d)
                first_bad = int(fbad_d)
                first_val = float(fval_d)

        self._check_normalized_aggregates(colsum, (n_bad, first_bad, first_val))

        if method == "approximate":
            return f_aug, gram, boot
        # default / svd-ew (the reference maps method='bootstrap' here too)
        N_aug = np.zeros(msize)
        N_aug[:K] = self.N_k
        nnz = int(np.count_nonzero(self.N_k))
        if (msize >= 1024 and msize >= 2 * nnz) or _is_dev(gram):
            # Rank-nnz route: the same Theta from an nnz-sized eigh instead
            # of an msize-sized eigh + pinv (exactness gated in
            # tests/test_mbar.py).  Taken for large augmented spaces, and
            # ALWAYS for a device gram — the lowrank device branch keeps
            # every O(msize^2) array on device, moving only the nnz^2 H
            # across the ~3-25 MB/s tunnel (the dense path would pull the
            # full gram AND round-trip its matmuls).
            return f_aug, self._theta_svd_ew_lowrank(gram, N_aug), boot
        return f_aug, self._theta_svd_ew_from_gram(np.asarray(gram), N_aug), boot

    def compute_covariance_of_sums(self, d_ij, K, a):
        """Uncertainty of weighted sums of free-energy differences.

        For ``n`` chunks of ``K`` states stacked into one estimator,
        computes ``sigma[i, j] = sqrt(var(sum_k a_k (f_{i,k} - f_{j,k})))``
        from the pairwise standard deviations ``d_ij`` of the stacked
        states — e.g. the uncertainty of a heat-capacity-style linear
        combination across temperature chunks.

        Parameters
        ----------
        d_ij : np.ndarray, shape (>= n*K, >= n*K)
            Pairwise standard deviations of the stacked free energies (as
            returned in ``dDelta_f`` by a stacked-state MBAR).
        K : int
            States per chunk.
        a : array_like, shape (n,)
            Weight of each chunk in the sum.

        Returns
        -------
        np.ndarray, shape (K, K)
            The combined standard deviations.

        Notes
        -----
        Vectorized einsum over (n, n, K, K) covariance blocks, replacing
        the reference's quadruple loop (which carries a TODO to vectorize):
        ``pymbar.MBAR.compute_covariance_of_sums``
        (pymbar 4.x mbar.py:1033-1121).
        """
        a = np.asarray(a, dtype=np.float64)
        var_ij = np.square(np.asarray(d_ij))
        n = len(a)

        # blocks[k, l, i, j] = var_ij[i + k*K, j + l*K].  Rows/cols beyond
        # n*K are ignored, as the reference's index loops never touch them.
        var_ij = var_ij[: n * K, : n * K]
        blocks = var_ij.reshape(n, K, n, K).transpose(0, 2, 1, 3)
        # Single terms: sum_k a_k^2 var(f_i - f_j) within chunk k.
        d2 = np.einsum("k,kkij->ij", a**2, blocks)
        # Cross terms:
        #   a_k a_l [-var(i_k,i_l) + var(i_k,j_l) + var(j_k,i_l) - var(j_k,j_l)]
        diag = blocks.diagonal(axis1=2, axis2=3)  # [k, l, i] = var(i_k, i_l)
        term = (
            -diag[:, :, :, None]  # var(i_k, i_l), broadcast over j
            + blocks  # var(i_k, j_l)
            + blocks.transpose(0, 1, 3, 2)  # var(j_k, i_l)
            - diag[:, :, None, :]  # var(j_k, j_l), broadcast over i
        )
        d2 += np.einsum("k,l,klij->ij", a, a, term)
        return np.sqrt(d2)

    def compute_expectations(
        self,
        A_n,
        u_kn=None,
        output="averages",
        state_dependent=False,
        compute_uncertainty=True,
        uncertainty_method=None,
        warning_cutoff=1.0e-10,
        return_theta=False,
    ):
        """Equilibrium expectation of one observable at every state.

        Parameters
        ----------
        A_n : np.ndarray, shape (N,), (K, N_max) or (N, K)
            The observable per sample.  With ``state_dependent=True``,
            ``A_n[k, n]`` gives the observable's value in state ``k`` (e.g.
            the potential energy itself).
        u_kn : np.ndarray, optional
            Alternative reduced potentials to evaluate at (defaults to the
            constructor's matrix); accepts kn, n, or kln layouts.
        output : {'averages', 'differences'}, optional
            'averages' returns per-state vectors; 'differences' returns
            (K, K) matrices of pairwise differences.
        state_dependent : bool, optional, default False
            Whether the observable's definition varies by state.
        compute_uncertainty : bool, optional, default True
        uncertainty_method : {None, 'approximate', 'svd', 'svd-ew', 'bootstrap'}, optional
            As in :meth:`compute_free_energy_differences`.
        warning_cutoff : float, optional, default 1.0e-10
        return_theta : bool, optional, default False

        Returns
        -------
        dict
            ``'mu'`` : expectations (K,) or (K, K); ``'sigma'`` :
            uncertainties (same shape, if ``compute_uncertainty``);
            ``'Theta'`` : covariance of the augmented observables (if
            ``return_theta``).

        Notes
        -----
        Observables are shifted positive (``A_min - 4 eps |A_min|``) so the
        whole computation stays in log space; above 512 MB of ``u_kn`` the
        augmented-state machinery streams over sample chunks on device.
        Reference: ``pymbar.MBAR.compute_expectations``
        (pymbar 4.x mbar.py:1124-1312) — with the fix that
        ``return_theta=True`` without uncertainties does not crash.

        Examples
        --------
        >>> import numpy as np
        >>> from pymbar_tpu import MBAR
        >>> from pymbar_tpu.testsystems import HarmonicOscillatorsTestCase
        >>> tc = HarmonicOscillatorsTestCase(O_k=[0.0, 1.0], K_k=[1.0, 2.0])
        >>> x_n, u_kn, N_k, s_n = tc.sample(N_k=[500, 500], mode="u_kn", seed=5)
        >>> ex = MBAR(u_kn, N_k).compute_expectations(x_n)
        >>> bool(np.all(np.abs(ex["mu"] - tc.analytical_means()) < 6 * ex["sigma"] + 0.05))
        True
        """
        if uncertainty_method == "bootstrap" and (
            self.n_bootstraps is None or self.n_bootstraps <= 0
        ):
            raise ParameterError(
                "Cannot request bootstrap sampling of expectations without any bootstraps."
            )

        dims = len(np.shape(A_n))
        if dims > 2:
            logger.warning(
                "dim=3 for (state_dependent==True) matrices for observables "
                "and dim=2 for (state_dependent==False) observables are "
                "deprecated; we suggest you convert to NxK form instead of "
                "NxKxK form."
            )

        if not state_dependent:
            if dims == 2:
                A_n = kn_to_n(A_n, N_k=self.N_k)
                if u_kn is not None:
                    if len(np.shape(u_kn)) == 3:
                        u_kn = kln_to_kn(u_kn, N_k=self.N_k)
                    elif len(np.shape(u_kn)) == 2:
                        u_kn = kn_to_n(u_kn, N_k=self.N_k)
        else:
            if dims == 3:
                A_n = kln_to_kn(A_n, N_k=self.N_k)
                if u_kn is not None:
                    if len(np.shape(u_kn)) == 3:
                        u_kn = kln_to_kn(u_kn, N_k=self.N_k)
                    elif len(np.shape(u_kn)) == 2:
                        u_kn = kn_to_n(u_kn, N_k=self.N_k)

        if u_kn is None:
            u_kn = self.u_kn

        ushape = np.shape(u_kn)
        K = 1 if len(ushape) == 1 else ushape[0]

        state_map = np.zeros([2, K], int)
        state_map[0, :] = np.arange(K)
        if state_dependent:
            state_map[1, :] = np.arange(K)

        inner_results = self.compute_expectations_inner(
            A_n,
            u_kn,
            state_map,
            # return_theta alone must also produce Theta (the reference asks
            # the inner call only for compute_uncertainty, mbar.py:1257-1262,
            # and crashes on return_theta without uncertainties).
            return_theta=compute_uncertainty or return_theta,
            uncertainty_method=uncertainty_method,
            warning_cutoff=warning_cutoff,
        )

        result_vals = dict()
        Theta = None
        covA_ij = None
        if (compute_uncertainty and uncertainty_method != "bootstrap") or return_theta:
            # Sandwich Theta with the shifted observables to get covariances
            # of the observables themselves (reference mbar.py:1267-1281).
            diag = np.ones(2 * K, dtype=np.float64)
            diag[0:K] = diag[K : 2 * K] = (
                inner_results["observables"] - inner_results["Amin"]
            )
            Th = inner_results["Theta"]
            if _is_dev(Th):
                # device sandwich: only K-sized (averages) or K^2-sized
                # (differences/Theta) results ever cross the slow tunnel
                dg = jnp.asarray(diag)
                Theta = dg[:, None] * Th * dg[None, :]
                covA_ij = (
                    Theta[0:K, 0:K]
                    + Theta[K : 2 * K, K : 2 * K]
                    - Theta[0:K, K : 2 * K]
                    - Theta[K : 2 * K, 0:K]
                )
            else:
                # diagonal sandwich via broadcasting (O(m^2), not O(m^3))
                Theta = diag[:, None] * Th * diag[None, :]
                covA_ij = np.array(
                    Theta[0:K, 0:K]
                    + Theta[K : 2 * K, K : 2 * K]
                    - Theta[0:K, K : 2 * K]
                    - Theta[K : 2 * K, 0:K]
                )

        if output == "averages":
            result_vals["mu"] = inner_results["observables"]
            if compute_uncertainty:
                if uncertainty_method == "bootstrap":
                    result_vals["sigma"] = np.std(
                        inner_results["bootstrapped_observables"], axis=0
                    )
                elif _is_dev(covA_ij):
                    result_vals["sigma"] = np.asarray(
                        jnp.sqrt(jnp.diagonal(covA_ij[0:K, 0:K]))
                    )
                else:
                    result_vals["sigma"] = np.sqrt(covA_ij[0:K, 0:K].diagonal())

        if output == "differences":
            A_im = inner_results["observables"]
            result_vals["mu"] = A_im - np.vstack(A_im)
            if compute_uncertainty:
                if uncertainty_method == "bootstrap":
                    boots = inner_results["bootstrapped_observables"]
                    bootstrap_differences = boots[:, None, :] - boots[:, :, None]
                    result_vals["sigma"] = np.std(bootstrap_differences, axis=0)
                else:
                    result_vals["sigma"] = self._ErrorOfDifferences(
                        np.asarray(covA_ij), warning_cutoff=warning_cutoff
                    )

        if return_theta:
            result_vals["Theta"] = np.asarray(Theta)

        return result_vals

    def compute_multiple_expectations(
        self,
        A_in,
        u_n,
        compute_uncertainty=True,
        compute_covariance=False,
        uncertainty_method=None,
        warning_cutoff=1.0e-10,
        return_theta=False,
    ):
        """Expectations of several observables at one (possibly new) state.

        Parameters
        ----------
        A_in : np.ndarray, shape (I, N) or (I, K, N_max)
            ``I`` observables evaluated at every sample.
        u_n : np.ndarray, shape (N,) or (K, N_max)
            Reduced potential of the single target state.
        compute_uncertainty : bool, optional, default True
        compute_covariance : bool, optional, default False
            Also return the I x I covariance matrix of the observables.
        uncertainty_method : {None, 'approximate', 'svd', 'svd-ew', 'bootstrap'}, optional
        warning_cutoff : float, optional, default 1.0e-10
        return_theta : bool, optional, default False

        Returns
        -------
        dict
            ``'mu'`` : (I,) expectations at the target state; ``'sigma'`` :
            (I,) uncertainties; ``'covariances'`` : (I, I) covariance;
            ``'Theta'`` : augmented covariance — each as requested.

        Notes
        -----
        Reference: ``pymbar.MBAR.compute_multiple_expectations``
        (pymbar 4.x mbar.py:1315-1439), including its
        ``compute_uncertainty != "bootstrap"`` comparison quirk (preserved
        for behavioral parity — verified identical upstream).

        Examples
        --------
        >>> import numpy as np
        >>> from pymbar_tpu import MBAR
        >>> from pymbar_tpu.testsystems import HarmonicOscillatorsTestCase
        >>> tc = HarmonicOscillatorsTestCase(O_k=[0.0, 1.0], K_k=[1.0, 2.0])
        >>> x_n, u_kn, N_k, s_n = tc.sample(N_k=[400, 400], mode="u_kn", seed=9)
        >>> A_in = np.vstack([x_n, x_n**2])
        >>> out = MBAR(u_kn, N_k).compute_multiple_expectations(A_in, u_kn[0])
        >>> out["mu"].shape, out["sigma"].shape
        ((2,), (2,))
        """
        A_in = np.asarray(A_in)
        I = A_in.shape[0]

        if len(np.shape(A_in)) == 3:
            A_in_old = A_in.copy()
            A_in = np.zeros([I, self.N], np.float64)
            for i in range(I):
                A_in[i, :] = kn_to_n(A_in_old[i, :, :], N_k=self.N_k)

        if len(np.shape(u_n)) == 2:
            u_n = kn_to_n(u_n, N_k=self.N_k)

        state_map = np.zeros([2, I], int)
        state_map[1, :] = np.arange(I)

        inner_results = self.compute_expectations_inner(
            A_in,
            u_n,
            state_map,
            return_theta=(compute_uncertainty or compute_covariance or return_theta),
            uncertainty_method=uncertainty_method,
            warning_cutoff=warning_cutoff,
        )
        result_vals = dict()
        result_vals["mu"] = inner_results["observables"]

        if (
            (compute_uncertainty or compute_covariance)
            and compute_uncertainty != "bootstrap"
        ) or return_theta:
            diag = np.ones(2 * I, dtype=np.float64)
            diag[0:I] = diag[I : 2 * I] = (
                inner_results["observables"] - inner_results["Amin"]
            )
            # diagonal sandwich via broadcasting (O(m^2), not O(m^3))
            Theta = diag[:, None] * inner_results["Theta"] * diag[None, :]

            if compute_uncertainty:
                covA_ij = np.array(
                    Theta[0:I, 0:I]
                    + Theta[I : 2 * I, I : 2 * I]
                    - Theta[0:I, I : 2 * I]
                    - Theta[I : 2 * I, 0:I]
                )
                result_vals["sigma"] = np.sqrt(covA_ij[0:I, 0:I].diagonal())

            if compute_covariance:
                result_vals["covariances"] = inner_results["Theta"][0:I, 0:I]

            if return_theta:
                result_vals["Theta"] = Theta

        if uncertainty_method == "bootstrap":
            if compute_uncertainty:
                result_vals["sigma"] = np.std(
                    inner_results["bootstrapped_observables"], axis=0
                )
            if compute_covariance:
                result_vals["covariances"] = np.cov(
                    inner_results["bootstrapped_observables"].T
                )
        return result_vals

    def compute_perturbed_free_energies(
        self,
        u_ln,
        compute_uncertainty=True,
        uncertainty_method=None,
        warning_cutoff=1.0e-10,
    ):
        """Free energy differences between L perturbed (unsampled) states.

        Parameters
        ----------
        u_ln : np.ndarray, shape (L, N) or (L, K, N_max)
            Reduced potentials of every original sample evaluated in each of
            the L new states (all N original samples are required).
        compute_uncertainty : bool, optional, default True
        uncertainty_method : {None, 'approximate', 'svd', 'svd-ew', 'bootstrap'}, optional
        warning_cutoff : float, optional, default 1.0e-10

        Returns
        -------
        dict
            ``'Delta_f'`` : (L, L) free energy differences between the new
            states; ``'dDelta_f'`` : (L, L) uncertainties (if requested).

        Raises
        ------
        DataError
            If ``u_ln`` has fewer samples than the estimator was built on.

        Notes
        -----
        Reference: ``pymbar.MBAR.compute_perturbed_free_energies``
        (pymbar 4.x mbar.py:1442-1520).

        Examples
        --------
        >>> import numpy as np
        >>> from pymbar_tpu import MBAR
        >>> from pymbar_tpu.testsystems import HarmonicOscillatorsTestCase
        >>> tc = HarmonicOscillatorsTestCase(O_k=[0.0, 1.0], K_k=[1.0, 2.0])
        >>> x_n, u_kn, N_k, s_n = tc.sample(N_k=[400, 400], mode="u_kn", seed=2)
        >>> u_ln = np.vstack([u_kn[0], 0.5 * 3.0 * (x_n - 0.5) ** 2])
        >>> out = MBAR(u_kn, N_k).compute_perturbed_free_energies(u_ln)
        >>> out["Delta_f"].shape
        (2, 2)
        """
        if len(np.shape(u_ln)) == 3:
            u_ln = kln_to_kn(u_ln, N_k=self.N_k)

        u_ln = np.asarray(u_ln)
        L, N = u_ln.shape

        if N < self.N:
            raise DataError(
                "There seems to be too few samples in u_kn. You must evaluate "
                "at the new potential with all of the samples used originally."
            )

        state_list = np.arange(L)
        A_in = np.array([0])
        inner_results = self.compute_expectations_inner(
            A_in,
            u_ln,
            state_list,
            return_theta=compute_uncertainty,
            uncertainty_method=uncertainty_method,
            warning_cutoff=warning_cutoff,
        )

        f_k = inner_results["f"]
        result_vals = dict()
        result_vals["Delta_f"] = f_k - np.vstack(f_k)

        if compute_uncertainty:
            if uncertainty_method == "bootstrap":
                result_vals["dDelta_f"] = np.std(inner_results["bootstrapped_f"], axis=0)
            else:
                result_vals["dDelta_f"] = self._ErrorOfDifferences(
                    np.asarray(inner_results["Theta"]),
                    warning_cutoff=warning_cutoff,
                )

        return result_vals

    def compute_entropy_and_enthalpy(
        self, u_kn=None, uncertainty_method=None, verbose=False, warning_cutoff=1.0e-10
    ):
        """Decompose free energy differences into enthalpy and entropy.

        Computes ``Delta_u`` (differences of average reduced potential) and
        ``Delta_s = Delta_u - Delta_f`` with the full 3K x 3K covariance
        assembly for their uncertainties.

        Parameters
        ----------
        u_kn : np.ndarray, optional
            Reduced potentials to average (defaults to the constructor's
            matrix; kln layouts accepted).
        uncertainty_method : {None, 'approximate', 'svd', 'svd-ew', 'bootstrap'}, optional
        verbose : bool, optional, default False
        warning_cutoff : float, optional, default 1.0e-10

        Returns
        -------
        dict
            ``'Delta_f'``/``'dDelta_f'``, ``'Delta_u'``/``'dDelta_u'``,
            ``'Delta_s'``/``'dDelta_s'`` — each a (K, K) matrix.

        Notes
        -----
        Reference: ``pymbar.MBAR.compute_entropy_and_enthalpy``
        (pymbar 4.x mbar.py:1524-1681).

        Examples
        --------
        >>> import numpy as np
        >>> from pymbar_tpu import MBAR
        >>> from pymbar_tpu.testsystems import HarmonicOscillatorsTestCase
        >>> tc = HarmonicOscillatorsTestCase(O_k=[0.0, 1.0], K_k=[1.0, 2.0])
        >>> x_n, u_kn, N_k, s_n = tc.sample(N_k=[400, 400], mode="u_kn", seed=4)
        >>> out = MBAR(u_kn, N_k).compute_entropy_and_enthalpy()
        >>> sorted(out)
        ['Delta_f', 'Delta_s', 'Delta_u', 'dDelta_f', 'dDelta_s', 'dDelta_u']
        """
        if verbose:
            logger.info("Computing average energy and entropy by MBAR.")

        dims = len(np.shape(u_kn))
        if dims == 3:
            u_kn = kln_to_kn(u_kn, N_k=self.N_k)
        if u_kn is None:
            u_kn = self.u_kn

        K, N = np.shape(u_kn)
        if u_kn is self.u_kn and _is_dev(self.u_kn):
            # device-resident matrix: pass the alias itself — the inner
            # machinery's aliased-observable path keeps everything on
            # device (copying here would pull GBs across the tunnel)
            A_in = u_kn
        else:
            A_in = np.array(u_kn, copy=True)
        state_map = np.zeros([2, K], int)
        state_map[0, :] = np.arange(K)
        state_map[1, :] = np.arange(K)

        inner_results = self.compute_expectations_inner(
            A_in,
            u_kn,
            state_map,
            return_theta=True,
            uncertainty_method=uncertainty_method,
            warning_cutoff=warning_cutoff,
        )

        # Assemble the 3K x 3K covariance: [observables, f-sampled, f-copy]
        # blocks, sandwiched by the observable shifts (reference :1600-1610).
        diag = np.ones(3 * K, dtype=np.float64)
        diag[0:K] = diag[K : 2 * K] = (
            inner_results["observables"] - inner_results["Amin"]
        )
        Th2 = inner_results["Theta"]
        if uncertainty_method != "bootstrap" and not _is_dev(Th2):
            Theta = np.zeros([3 * K, 3 * K], dtype=np.float64)
            Theta[0 : 2 * K, 0 : 2 * K] = Th2
            Theta[2 * K : 3 * K, :] = Theta[K : 2 * K, :]
            Theta[:, 2 * K : 3 * K] = Theta[:, K : 2 * K]
            # diagonal sandwich via broadcasting (O(m^2), not O(m^3))
            Theta = diag[:, None] * Theta * diag[None, :]

        result_vals = dict()
        f_k = inner_results["f"]
        result_vals["Delta_f"] = f_k - np.vstack(f_k)
        u_k = inner_results["observables"]
        result_vals["Delta_u"] = u_k - np.vstack(u_k)
        s_k = u_k - f_k
        result_vals["Delta_s"] = s_k - np.vstack(s_k)

        if uncertainty_method == "bootstrap":
            fb = self.f_k_boots
            diffm = fb[:, None, :] - fb[:, :, None]
            result_vals["dDelta_f"] = np.std(diffm, axis=0)

            ub = inner_results["bootstrapped_observables"]
            diffm = ub[:, None, :] - ub[:, :, None]
            result_vals["dDelta_u"] = np.std(diffm, axis=0)

            sb = ub - fb
            diffm = sb[:, None, :] - sb[:, :, None]
            result_vals["dDelta_s"] = np.std(diffm, axis=0)
        elif _is_dev(Th2):
            # device σ algebra, f32 transport: one fused jit computes all
            # three covariance blocks AND their sigma matrices next to the
            # resident Theta, and only 3 x 4 MB of f32 σ crosses the
            # tunnel (the f64 block downloads were ~2.4 s of the entropy
            # wall at K=1024 — VERDICT r4 item 4).
            cutoff = -abs(warning_cutoff)
            sf, su, ss, mins = MBAR._entropy_sigmas_dev(
                Th2, jnp.asarray(diag[0:K]), jnp.asarray(cutoff)
            )
            mins = np.asarray(mins)
            for name, sig32, m in (
                ("dDelta_f", sf, mins[0]),
                ("dDelta_u", su, mins[1]),
                ("dDelta_s", ss, mins[2]),
            ):
                if m < 0.0 and m < cutoff:
                    logger.warning(
                        "A squared uncertainty is negative. Largest "
                        "Magnitude = {0:f}".format(abs(m))
                    )
                result_vals[name] = MBAR._unpack_sigma_triu(sig32, K)
        else:
            covf = Theta[2 * K : 3 * K, 2 * K : 3 * K]
            result_vals["dDelta_f"] = self._ErrorOfDifferences(
                np.asarray(covf), warning_cutoff=warning_cutoff
            )

            covu = (
                Theta[0:K, 0:K]
                + Theta[K : 2 * K, K : 2 * K]
                - Theta[0:K, K : 2 * K]
                - Theta[K : 2 * K, 0:K]
            )
            result_vals["dDelta_u"] = self._ErrorOfDifferences(
                np.asarray(covu), warning_cutoff=warning_cutoff
            )

            covs = (
                covu
                + covf
                + Theta[0:K, 2 * K : 3 * K]
                + Theta[2 * K : 3 * K, 0:K]
                - Theta[K : 2 * K, 2 * K : 3 * K]
                - Theta[2 * K : 3 * K, K : 2 * K]
            )
            result_vals["dDelta_s"] = self._ErrorOfDifferences(
                np.asarray(covs), warning_cutoff=warning_cutoff
            )

        return result_vals

    # -------------------------------------------------------------------------
    # Private helpers
    # -------------------------------------------------------------------------

    @staticmethod
    @_jax.jit
    def _entropy_sigmas_dev(Th2, a, cutoff):
        """Device twin of the entropy branch's three covariance blocks +
        :meth:`_ErrorOfDifferences`, returning the sigma matrices as f32.

        Works on the (2K, 2K) augmented Theta's blocks directly: the 3K
        assembly duplicates the f block as an UNSCALED copy while the
        sandwich scales both the observable block and the first f block by
        the shifted observables a (diag = [a, a, 1] — reference
        mbar.py:1600-1610), so with blocks T_AA/T_Af/T_fA/T_ff:

        * covf = T_ff
        * covu = a a^T ∘ (T_AA + T_ff − T_Af − T_fA)
        * covs = covu + T_ff + a∘T_Af + T_fA∘a − a∘T_ff − T_ff∘a
          (row-scaling on the left of ∘, column-scaling on the right)

        σ algebra needs only ~1e-4 (bench sigma canary 2.4e-4), so the
        three (K, K) results cross the tunnel as f32 — and since every σ
        matrix is symmetric (Θ is a covariance matrix), only the packed
        upper triangles cross: 6 MB instead of the 24 MB of f64 block
        downloads that dominated the entropy wall (VERDICT r4 item 4);
        f32 rounding perturbs σ by <2e-7 relative (pinned by
        tests/test_mbar.py::test_entropy_sigma_dev_transport).
        Returns (σ_f, σ_u, σ_s as f32 (3, K(K+1)/2) packed rows, min-d2
        per matrix for the host-side negative-variance warning); unpack
        with :meth:`_unpack_sigma_triu`.
        """
        K = Th2.shape[0] // 2
        TAA = Th2[:K, :K]
        TAf = Th2[:K, K:]
        TfA = Th2[K:, :K]
        Tff = Th2[K:, K:]
        covf = Tff
        covu = a[:, None] * (TAA + Tff - TAf - TfA) * a[None, :]
        covs = (
            covu + Tff
            + a[:, None] * (TAf - Tff)
            + (TfA - Tff) * a[None, :]
        )
        iu, ju = np.triu_indices(K)  # static under jit (K is static)

        def sig(cov):
            diag = jnp.diagonal(cov)
            d2 = diag[None, :] + diag[:, None] - 2.0 * cov
            d2 = d2[iu, ju]  # symmetric: ship the upper triangle only
            m = jnp.min(d2)
            # reference clamp rule: small negatives zero ONLY when no
            # entry exceeds the warning cutoff (mbar.py:1687-1715)
            clamp = (m >= cutoff) & (d2 < 0.0) & (d2 > cutoff)
            d2 = jnp.where(clamp, 0.0, d2)
            return jnp.sqrt(d2).astype(jnp.float32), m

        sf, mf = sig(covf)
        su, mu_ = sig(covu)
        ss, ms = sig(covs)
        return sf, su, ss, jnp.stack([mf, mu_, ms])

    @staticmethod
    def _unpack_sigma_triu(packed, K):
        """Rebuild the symmetric (K, K) σ matrix from its packed f32 upper
        triangle (the `_entropy_sigmas_dev` transport format)."""
        out = np.zeros((K, K), dtype=np.float64)
        iu, ju = np.triu_indices(K)
        out[iu, ju] = np.asarray(packed, dtype=np.float64)
        out[ju, iu] = out[iu, ju]
        return out

    def _ErrorOfDifferences(self, cov, warning_cutoff=1.0e-10):
        """sigma_ij = sqrt(Theta_ii + Theta_jj - 2 Theta_ij), clamping tiny
        negatives and warning on large ones (reference mbar.py:1687-1715)."""
        diag = cov.diagonal()
        d2 = diag + np.vstack(diag) - 2 * cov

        cutoff = -abs(warning_cutoff)
        if np.any(d2 < 0.0):
            if np.any(d2 < cutoff):
                logger.warning(
                    "A squared uncertainty is negative. Largest Magnitude = "
                    "{0:f}".format(abs(np.min(d2[d2 < cutoff])))
                )
            else:
                d2[np.logical_and(0 > d2, d2 > cutoff)] = 0.0
        return np.sqrt(np.array(d2))

    def _pseudoinverse(self, A, tol=1.0e-10):
        """Moore-Penrose pseudoinverse with rcond=tol (reference mbar.py:1717-1735)."""
        return np.linalg.pinv(A, rcond=tol)

    def _zerosamestates(self, A):
        """Zero entries for state pairs detected as identical (reference :1741-1754)."""
        for pair in self.samestates:
            A[pair[0], pair[1]] = 0
            A[pair[1], pair[0]] = 0

    def _computeAsymptoticCovarianceMatrix(self, W, N_k, method=None):
        """Asymptotic covariance Theta of the log normalization constants.

        Methods (reference mbar.py:1756-1864):

        * 'approximate' — Theta = W^T W (Kong 2003 §4; underestimates)
        * 'svd'         — Eq. D4 via SVD of W
        * 'svd-ew'      — Eq. D4/D5 via eigh(W^T W) (default, fastest)

        The K×K Gram, eigendecomposition and pseudoinverse run on device; W is
        streamed through the matmul without forming any additional N×K temps.
        """
        if method is None or method == "bootstrap":
            method = "svd-ew"

        W = np.asarray(W)
        N, K = W.shape
        N_k = np.asarray(N_k)

        if K != N_k.size:
            raise ParameterError("W must be NxK, where N_k is a K-dimensional array.")
        if np.sum(N_k) != N:
            raise ParameterError("W must be NxK, where N = sum_k N_k.")

        check_w_normalized(W, N_k)

        if method == "approximate":
            Theta = np.asarray(_wtw_gram(W))
        elif method == "svd":
            Ndiag = np.diag(N_k.astype(np.float64))
            I = np.identity(K, dtype=np.float64)
            U, S, Vt = np.linalg.svd(W, full_matrices=False)
            Sigma = np.diag(S)
            V = Vt.T
            Theta = (
                V
                @ Sigma
                @ self._pseudoinverse(I - Sigma @ V.T @ Ndiag @ V @ Sigma)
                @ Sigma
                @ V.T
            )
        elif method == "svd-ew":
            # The N-sized work (W^T W) streams on device; the K' x K'
            # algebra runs host-side in native f64 (on TPU an emulated-f64
            # eigh/pinv is minutes-slow for zero benefit at K <= few 1000).
            gram = np.asarray(_wtw_gram(W), dtype=np.float64)
            Theta = self._theta_svd_ew_from_gram(gram, N_k)
        else:
            raise ParameterError(f"Method {method} unrecognized.")

        return Theta

    @staticmethod
    def _theta_svd_ew_from_gram(gram, N_k):
        """Eq. D4/D5 covariance from the K×K Gram alone (reference
        mbar.py:1837-1858): eigh(W^T W) supplies Sigma^2 and V, negative
        eigenvalues clamp to zero, and the inner pinv uses rcond=1e-10."""
        S2, V = np.linalg.eigh(gram)
        S2 = np.where(S2 < 0.0, 0.0, S2)
        Sigma_diag = np.sqrt(S2)
        Np = np.asarray(N_k, dtype=np.float64)
        I = np.identity(gram.shape[0], dtype=np.float64)
        # inner = I - Sigma V^T diag(N) V Sigma, built with diagonal scaling
        # instead of dense diag matmuls.
        VS = V * Sigma_diag[None, :]  # V @ Sigma
        inner = I - _host_mm(VS.T, Np[:, None] * VS)
        inner_pinv = np.linalg.pinv(inner, rcond=1.0e-10)
        return _host_mm(_host_mm(VS, inner_pinv), VS.T)

    @staticmethod
    def _theta_svd_ew_lowrank(gram, N_k, rows=None):
        """The same Eq. D4/D5 covariance as :meth:`_theta_svd_ew_from_gram`,
        computed through the rank structure of ``diag(N)``.

        With X = V Sigma (so G = X X^T) and Z the m x nnz matrix holding
        sqrt(N_k) e_k for the nnz sampled states, the inner matrix is
        I - U U^T with U = X^T Z of rank <= nnz, so its pinv expands
        spectrally from eigh of the SMALL matrix

            H = U^T U = Z^T G Z = diag(sqrt(N)) G_ss diag(sqrt(N)),

        giving Theta = G + F diag(phi) F^T with F = G Z P (P = eigvecs of
        H) and phi_i = 1/(1-lam_i), or -1/lam_i on pinv-truncated
        directions (|1-lam_i| <= rcond * smax, matching np.linalg.pinv's
        relative cutoff; the complement spectrum of the inner matrix is
        exactly 1).  At the augmented-expectations shape (m = 3K, nnz = K)
        this replaces an m-eigh + m-pinv + three m^2-matmuls with ONE
        K-eigh + two thin matmuls — the difference between ~50 s and ~2 s
        of host time at K = 1024.  Agrees with the dense path to spectral
        roundoff (the dense path's negative-eigenvalue clamp perturbs G by
        ~1e-16 |G|; exactness gate in tests/test_mbar.py).

        ``rows`` optionally restricts the output to Theta[rows][:, rows]
        without assembling the full m x m matrix.
        """
        Np = np.asarray(N_k, dtype=np.float64)
        nz = np.nonzero(Np > 0)[0]
        sq = np.sqrt(Np[nz])
        if _is_dev(gram):
            # Device path: the only O(nnz^2) transfer is H for the host
            # eigh (the axon device eigh does not compile); F and Theta
            # build on device and Theta STAYS a device array — consumers
            # (the covariance sandwiches) are device-aware.
            contig = bool(np.array_equal(nz, np.arange(nz.size)))
            sq_dev = jnp.asarray(sq)
            if contig:
                G_nz = gram[:, : nz.size]
                H = np.asarray(G_nz[: nz.size] * sq_dev[:, None] * sq_dev[None, :])
            else:
                nz_dev = jnp.asarray(nz)
                G_nz = jnp.take(gram, nz_dev, axis=1)
                H = np.asarray(
                    jnp.take(G_nz, nz_dev, axis=0)
                    * sq_dev[:, None] * sq_dev[None, :]
                )
        else:
            H = gram[np.ix_(nz, nz)] * sq[:, None] * sq[None, :]
        lam, P = np.linalg.eigh(H)
        one_minus = 1.0 - lam
        smax = max(float(np.max(np.abs(one_minus), initial=0.0)), 1.0)
        trunc = np.abs(one_minus) <= 1.0e-10 * smax
        with np.errstate(divide="ignore"):
            phi = np.where(trunc, -1.0 / lam, 1.0 / np.where(trunc, 1.0, one_minus))
        if _is_dev(gram):
            G_rows = gram if rows is None else jnp.take(
                gram, jnp.asarray(rows), axis=0
            )
            Gr_nz = (
                G_rows[:, : nz.size] if contig
                else jnp.take(G_rows, jnp.asarray(nz), axis=1)
            )
            F = jnp.dot(
                Gr_nz * jnp.asarray(sq)[None, :], jnp.asarray(P),
                preferred_element_type=jnp.float64,
            )
            base = gram if rows is None else jnp.take(
                G_rows, jnp.asarray(rows), axis=1
            )
            return base + jnp.dot(
                F * jnp.asarray(phi)[None, :], F.T,
                preferred_element_type=jnp.float64,
            )
        G_rows = gram if rows is None else gram[rows]
        F = _host_mm(G_rows[:, nz] * sq[None, :], P)
        base = gram if rows is None else gram[np.ix_(rows, rows)]
        return base + _host_mm(F * phi[None, :], F.T)

    def _compute_theta_streamed(self, method=None):
        """Theta over the base K states with W consumed in Gram form only.

        Covers the 'approximate' and (default) 'svd-ew' estimators — both
        are pure functions of W^T W — via one streamed device pass
        (:func:`mbar_gram_normalization`), including the reference's
        ``check_w_normalized`` validation rebuilt from the pass's aggregates.
        No N×K array is ever allocated, on host or device; at the BASELINE
        north star (K=1024, N=1e7) the reference's W would be 80 GB.  The
        'svd' estimator genuinely needs the SVD of W itself and falls back
        to the materializing path (it exists for cross-validation at small
        scale: reference mbar.py:1818-1835).
        """
        if method is None or method == "bootstrap":
            method = "svd-ew"
        if method == "svd":
            return self._computeAsymptoticCovarianceMatrix(
                np.exp(self.Log_W_nk), self.N_k, method="svd"
            )
        if method not in ("svd-ew", "approximate"):
            raise ParameterError(f"Method {method} unrecognized.")

        from pymbar_tpu.config import on_tpu

        gram, colsum, rowstats = mbar_gram_normalization(
            self.u_kn, self.N_k, self.f_k
        )
        self._check_normalized_aggregates(np.asarray(colsum), rowstats)
        if method == "approximate":
            return np.asarray(gram, dtype=np.float64)
        if on_tpu():
            # device gram -> device lowrank Theta (exact vs the dense path;
            # only the nnz^2 H and the final K^2 Theta cross the tunnel)
            return np.asarray(self._theta_svd_ew_lowrank(gram, self.N_k))
        return self._theta_svd_ew_from_gram(
            np.asarray(gram, dtype=np.float64), self.N_k
        )

    @staticmethod
    def _check_normalized_aggregates(column_sums, rowstats, tolerance=1.0e-4):
        """check_w_normalized (utils.py:340-393 parity) from streamed
        aggregates: the K column sums plus (count, first index, value) of
        the bad rows, instead of two full host passes over W."""
        badcolumns = np.abs(column_sums - 1) > tolerance
        if np.any(badcolumns):
            firstbad = int(np.flatnonzero(badcolumns)[0])
            raise ParameterError(
                "Warning: Should have \\sum_n W_nk = 1. "
                f"Actual column sum for state {firstbad:d} was "
                f"{column_sums[firstbad]:f}. "
                f"{int(np.sum(badcolumns)):d} other columns have similar "
                "problems. \n"
                "This generally indicates the free energies are not converged."
            )
        n_bad_rows, first_bad_row, first_bad_val = rowstats
        if n_bad_rows > 0:
            raise ParameterError(
                "Warning: Should have \\sum_k N_k W_nk = 1. "
                f"Actual row sum for sample {first_bad_row:d} was "
                f"{first_bad_val:f}. "
                f"{n_bad_rows:d} other rows have similar problems. \n"
                "This generally indicates the free energies are not converged."
            )
        return None

    def _initializeFreeEnergies(self, verbose=False, method="zeros", f_k_init=None):
        """Initial f_k guess: zeros / mean-reduced-potential / BAR chain
        (reference mbar.py:1868-1917)."""
        if method == "zeros":
            if verbose:
                logger.info("Initializing free energies to zero.")
            self.f_k[:] = 0.0
        elif method == "mean-reduced-potential":
            if verbose:
                logger.info(
                    "Initializing free energies with mean reduced potential "
                    "for each state."
                )
            means = np.zeros(self.K, float)
            for k in self.states_with_samples:
                means[k] = self.u_kn[k, 0 : self.N_k[k]].mean()
            if np.max(np.abs(means)) < 0.000001:
                logger.warning(
                    "Warning: All mean reduced potentials are close to zero. "
                    "If you are using energy differences in the u_kln matrix, "
                    "then the mean reduced potentials will be zero, and this "
                    "is expected behavior."
                )
            self.f_k = means
        elif method == "BAR":
            self.f_k = self._initialize_with_bar(self.u_kn, f_k_init)
        else:
            raise ParameterError("Method " + method + " unrecognized.")

        self.f_k[:] = self.f_k[:] - self.f_k[0]

    def _computeUnnormalizedLogWeights(self, u_n):
        """log w_n for a target potential u_n:
        -logsumexp_k[f_k + u_n - u_kn] weighted by N_k (reference mbar.py:1919-1934).
        Runs as one device reduction over the K×N matrix.
        """
        a = (
            jnp.asarray(self.f_k)[:, None]
            + jnp.asarray(u_n)[None, :]
            - jnp.asarray(self.u_kn)
        )
        return np.asarray(
            -dev_logsumexp(a, axis=0, b=jnp.asarray(self.N_k, dtype=np.float64)[:, None])
        )

    def _initialize_with_bar(self, u_kn, f_k_init=None):
        """Chain pairwise BAR along adjacent sampled states (reference :1936-1988)."""
        from pymbar_tpu.other_estimators import bar
        from pymbar_tpu.utils import ConvergenceError

        initialization_order = np.where(self.N_k > 0)[0]
        if f_k_init is None:
            f_k_init = np.zeros(len(self.f_k))
        else:
            f_k_init = np.array(f_k_init, dtype=np.float64, copy=True)

        starting_f_k_init = f_k_init.copy()
        for index in range(np.size(initialization_order) - 1):
            k = initialization_order[index]
            l = initialization_order[index + 1]
            w_F = u_kn[l, self.x_kindices == k] - u_kn[k, self.x_kindices == k]
            w_R = u_kn[k, self.x_kindices == l] - u_kn[l, self.x_kindices == l]

            if len(w_F) > 0 and len(w_R) > 0:
                try:
                    f_k_init[l] = (
                        f_k_init[k]
                        + bar(
                            w_F,
                            w_R,
                            method="bisection",
                            DeltaF=starting_f_k_init[l] - starting_f_k_init[k],
                            relative_tolerance=0.00001,
                            verbose=False,
                            maximum_iterations=100,
                            compute_uncertainty=False,
                        )["Delta_f"]
                    )
                except ConvergenceError:
                    logger.warning("WARNING: BAR did not converge to within tolerance")
                    f_k_init[l] = f_k_init[k]
            else:
                f_k_init[l] = 0

        return f_k_init
