"""Double-word ("double-double" style) float32 arithmetic for TPU kernels.

TPU has no native float64 ALU; XLA emulates f64 at ~5x the cost of f32
(measured: the K×N f64 logsumexp pass runs at ~40 GB/s vs ~170 GB/s for
f32).  These helpers represent a value as an unevaluated sum hi + lo of two
float32s (~49-bit effective mantissa, eps ~ 3.6e-15) using error-free
transformations that need no FMA:

* ``two_sum``   — Knuth's 6-flop exact addition
* ``split``     — Veltkamp splitting (12-bit halves of a 24-bit mantissa)
* ``two_prod``  — Dekker's exact product via split
* dd add / mul built from those, plus a range-reduced ``dd_exp_neg``

All functions are pure jnp and trace both in regular jit and inside Pallas
kernels.  They power :mod:`pymbar_tpu.ops.pallas_kernels`' dd logsumexp —
the compensated replacement for XLA's f64 emulation on the hot path
(SURVEY.md §7 hard part #1).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "two_sum",
    "fast_two_sum",
    "split",
    "two_prod",
    "dd_add",
    "dd_add_f",
    "dd_mul",
    "dd_mul_f",
    "dd_from_f64",
    "dd_to_f64",
    "dd_exp_neg",
    "dd_recip",
]

# Plain Python floats: inlined as literals inside Pallas kernels (traced
# jnp constants would be rejected as captured values).
_SPLITTER = 4097.0  # 2^12 + 1 for float32 Veltkamp splitting


def two_sum(a, b):
    """Error-free a + b: returns (s, e) with s = fl(a+b), a + b = s + e exactly."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Error-free a + b assuming |a| >= |b| (3 flops)."""
    s = a + b
    e = b - (s - a)
    return s, e


def split(a):
    """Veltkamp split of a float32 into high/low 12-bit-mantissa halves."""
    t = jnp.float32(_SPLITTER) * a
    hi = t - (t - a)
    lo = a - hi
    return hi, lo


def two_prod(a, b):
    """Error-free a * b via Dekker's algorithm (no FMA needed)."""
    p = a * b
    a_hi, a_lo = split(a)
    b_hi, b_lo = split(b)
    e = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, e


def dd_add(x_hi, x_lo, y_hi, y_lo):
    """(x) + (y) in double-word arithmetic."""
    s, e = two_sum(x_hi, y_hi)
    e = e + (x_lo + y_lo)
    return fast_two_sum(s, e)


def dd_add_f(x_hi, x_lo, f):
    """(x) + single-word f."""
    s, e = two_sum(x_hi, f)
    e = e + x_lo
    return fast_two_sum(s, e)


def dd_mul(x_hi, x_lo, y_hi, y_lo):
    """(x) * (y) in double-word arithmetic."""
    p, e = two_prod(x_hi, y_hi)
    e = e + (x_hi * y_lo + x_lo * y_hi)
    return fast_two_sum(p, e)


def dd_mul_f(x_hi, x_lo, f):
    """(x) * single-word f."""
    p, e = two_prod(x_hi, f)
    e = e + x_lo * f
    return fast_two_sum(p, e)


def dd_from_f64(x64):
    """Split a float64 array into a (hi, lo) float32 pair (exact)."""
    hi = x64.astype(jnp.float32)
    lo = (x64 - hi.astype(x64.dtype)).astype(jnp.float32)
    return hi, lo


def dd_to_f64(hi, lo):
    """Recombine a double-word pair into float64 (outside kernels)."""
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)


def dd_recip(y_hi, y_lo):
    """1 / (y_hi + y_lo) in double-word arithmetic (~2^-48 relative error).

    One f32 division seeds q1 = 1/y_hi; the residual 1 - q1*y is formed
    error-free (1 - fl(q1*y_hi) is exact by Sterbenz since fl(q1*y_hi) is
    within one ulp of 1) and one Newton correction recovers the low word.
    ~20 flops — cheap enough per-column inside kernels.
    """
    q1 = jnp.float32(1.0) / y_hi
    p, pe = two_prod(q1, y_hi)
    r = ((jnp.float32(1.0) - p) - pe) - q1 * y_lo
    return fast_two_sum(q1, q1 * r)


# -----------------------------------------------------------------------------
# exp for non-positive double-word arguments
# -----------------------------------------------------------------------------


def _dd_const(x):
    """Exact double-f32 split of a host float64 constant."""
    hi = np.float32(x)
    lo = np.float32(np.float64(x) - np.float64(hi))
    return float(hi), float(lo)


# ln2 split so that k * LN2_HI is exact for |k| <= 2^11 (LN2_HI has 13
# significant bits), with a second-order tail for the dd remainder.
_LN2_HI = 0.693145751953125
_LN2_MID, _LN2_LO = _dd_const(
    float(np.float64(math.log(2.0)) - np.float64(0.693145751953125))
)
_INV_LN2 = 1.4426950408889634

# Double-word 1/n! for the dd Horner head (n = 1..6).  The n >= 7 tail is
# evaluated in plain f32: its value is <= r^7/7! ~ 9e-7 on |r| <= ln2/2, so
# f32's 1e-7 relative error contributes <= ~1e-13 absolute — below the dd
# noise floor, at a third of the flops of a full-dd degree-13 Horner.
_COEF = [_dd_const(1.0 / math.factorial(n)) for n in range(1, 7)]
_TAIL = [1.0 / math.factorial(n) for n in range(7, 14)]


def _pow2_f32(ki):
    """2^ki as float32 by direct exponent construction (ki clipped to normals)."""
    ki = jnp.minimum(jnp.maximum(ki, jnp.int32(-126)), jnp.int32(127))
    bits = jax.lax.shift_left(ki + jnp.int32(127), jnp.int32(23))
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def dd_exp_neg(a_hi, a_lo, clamp=-85.0):
    """exp(a) for a double-word a <= 0, to ~1e-14 relative accuracy.

    Range-reduce a = k ln2 + r with |r| <= ln2/2, evaluate the exp Taylor
    series in double-word Horner form, scale back 2^k by exact exponent
    construction.  a_hi below ``clamp`` yields exp(clamp-ish) ~ 1e-37 —
    treat such terms as numerically zero at any realistic sum scale.

    Returns an (hi, lo) float32 pair.
    """
    f32 = jnp.float32
    a_hi = jnp.maximum(a_hi, f32(clamp))

    # All constants go through f32() so every operation below is a true
    # float32 op (Python-float constant folding would silently compute in
    # f64 at trace time and then round products the wrong way).
    k = jnp.round(a_hi * f32(_INV_LN2))
    # r = a - k*ln2 in double-word; k*LN2_HI is exact (13-bit x 12-bit), and
    # k*LN2_MID is made error-free with two_prod so r keeps ~2^-48 accuracy.
    t_hi, t_lo = two_prod(k, f32(_LN2_MID))
    s_hi, s_lo = two_sum(a_hi - k * f32(_LN2_HI), a_lo)
    r_hi, r_lo = dd_add(s_hi, s_lo, -t_hi, -t_lo)
    r_lo = r_lo - k * f32(_LN2_LO)

    # f32 tail: T = sum_{n>=7} r^(n-7)/n!; the Horner seed is c_6 + r*T,
    # which the dd head then multiplies by r^5 to place every tail term at
    # its right power.
    t = f32(_TAIL[-1])
    for c in reversed(_TAIL[:-1]):
        t = t * r_hi + f32(c)
    tail = r_hi * t

    # p = sum_{n>=1} r^(n-1)/n!, dd Horner for the head (n = 1..6).
    p_hi, p_lo = fast_two_sum(f32(_COEF[-1][0]) + tail, f32(_COEF[-1][1]))
    for c_hi, c_lo in reversed(_COEF[:-1]):
        p_hi, p_lo = dd_mul(p_hi, p_lo, r_hi, r_lo)
        p_hi, p_lo = dd_add(p_hi, p_lo, f32(c_hi), f32(c_lo))
    # exp(r) = 1 + r * p
    q_hi, q_lo = dd_mul(r_hi, r_lo, p_hi, p_lo)
    e_hi, e_lo = dd_add_f(q_hi, q_lo, f32(1.0))

    two_k = _pow2_f32(k.astype(jnp.int32))
    return e_hi * two_k, e_lo * two_k


# -----------------------------------------------------------------------------
# Faster exp variant: 16x range reduction + selected 2^(j/16) table
# -----------------------------------------------------------------------------

def _exact_mul_split(x, k_bits=11):
    """Split x = hi + mid + lo with hi carrying <= 24 - k_bits significant
    bits, so that k * hi is exact in f32 for |k| < 2^k_bits."""
    e = math.frexp(x)[1]
    scale = 2.0 ** ((24 - k_bits) - e)
    hi = math.floor(x * scale) / scale
    mid, lo = _dd_const(float(np.float64(x) - np.float64(hi)))
    return float(hi), mid, lo


# ln2/16 split with a 13-bit hi word: the 16x reduction uses |k| up to
# ~2^11, so hi must be coarse enough that k * hi stays exact in f32.
_LN2_16_HI, _LN2_16_MID, _LN2_16_LO = _exact_mul_split(math.log(2.0) / 16.0)
_INV_LN2_16 = 16.0 / math.log(2.0)

# 2^(j/16) factored as 2^(j0/16) * 2^(j1/4) with j = j1*4 + j0: two 4-entry
# double-f32 tables, each gathered by a 2-level select tree (TPU has no fast
# vector gather) and applied with one dd multiply each.
_POW16_0 = [_dd_const(2.0 ** (j / 16.0)) for j in range(4)]
_POW16_1 = [_dd_const(2.0 ** (j / 4.0)) for j in range(4)]

# f32 tail of exp(r) on |r| <= ln2/32 ~ 0.0217: T(r) = sum_{n>=3} r^(n-3)/n!.
_TAIL16 = [1.0 / math.factorial(n) for n in range(3, 8)]


def dd_exp_neg_fast(a_hi, a_lo, clamp=-85.0):
    """exp(a) for double-word a <= 0, ~1.5x fewer flops than dd_exp_neg.

    Reduction: a = k * (ln2/16) + r with |r| <= ln2/32; exp(a) = 2^(k>>4)
    * 2^((k & 15)/16) * exp(r).  The 16-entry 2^(j/16) double-word table is
    gathered with a 4-level vectorized select tree (TPU has no fast vector
    gather); exp(r) needs only a degree-2 double-word head plus an f32 tail
    at this range.  Same ~1e-13 relative accuracy as dd_exp_neg on the
    logsumexp-relevant range (validated in tests/test_doubledouble.py).
    """
    f32 = jnp.float32
    a_hi = jnp.maximum(a_hi, f32(clamp))

    k = jnp.round(a_hi * f32(_INV_LN2_16))
    t_hi, t_lo = two_prod(k, f32(_LN2_16_MID))
    s_hi, s_lo = two_sum(a_hi - k * f32(_LN2_16_HI), a_lo)
    r_hi, r_lo = dd_add(s_hi, s_lo, -t_hi, -t_lo)
    r_lo = r_lo - k * f32(_LN2_16_LO)

    # exp(r) = (1 + r + r^2 (1/2 + r T(r))) * (1 + r_lo); |r_lo| <= ~1e-9
    # so the first-order low-word correction is exact to ~1e-18.
    tail = f32(_TAIL16[-1])
    for c in reversed(_TAIL16[:-1]):
        tail = tail * r_hi + f32(c)
    p_hi, p_e = two_prod(r_hi, r_hi)  # r^2 exactly
    # c2 = 1/2 + r*T(r) must carry ~31 bits: a single-f32 c2 puts a
    # ulp(0.5)/2 ~ 3e-8 rounding error under r^2, i.e. ~1.4e-11 in exp(r).
    c2_hi, c2_lo = two_sum(f32(0.5), r_hi * tail)
    q_hi, q_lo = dd_mul(p_hi, p_e, c2_hi, c2_lo)
    # 1 + r + q assembled with Knuth two_sum only, constant-last: XLA's
    # algebraic simplifier folds the compensation terms of any two_sum whose
    # FIRST operand is the literal 1.0 (and the 3-op fast_two_sum variant
    # too), silently destroying the low word under jit.
    e_hi, e_lo = dd_add_f(*dd_add(q_hi, q_lo, r_hi, jnp.zeros_like(r_hi)), f32(1.0))
    e_lo = e_lo + e_hi * r_lo

    # 2^(j/16) = 2^(j0/16) * 2^(j1/4), each factor a 4-entry dd select.
    ki = k.astype(jnp.int32)
    j = jnp.bitwise_and(ki, jnp.int32(15))
    j0 = jnp.bitwise_and(j, jnp.int32(3))

    def _sel4(table, idx):
        b0 = jnp.bitwise_and(idx, jnp.int32(1)) != 0
        b1 = jnp.bitwise_and(idx, jnp.int32(2)) != 0
        h = jnp.where(
            b1,
            jnp.where(b0, f32(table[3][0]), f32(table[2][0])),
            jnp.where(b0, f32(table[1][0]), f32(table[0][0])),
        )
        lo = jnp.where(
            b1,
            jnp.where(b0, f32(table[3][1]), f32(table[2][1])),
            jnp.where(b0, f32(table[1][1]), f32(table[0][1])),
        )
        return h, lo

    c0_hi, c0_lo = _sel4(_POW16_0, j0)
    c1_hi, c1_lo = _sel4(_POW16_1, jax.lax.shift_right_logical(j, jnp.int32(2)))
    e_hi, e_lo = dd_mul(e_hi, e_lo, c0_hi, c0_lo)
    e_hi, e_lo = dd_mul(e_hi, e_lo, c1_hi, c1_lo)

    q = jax.lax.shift_right_arithmetic(ki - j, jnp.int32(4))
    two_q = _pow2_f32(q)
    return e_hi * two_q, e_lo * two_q
