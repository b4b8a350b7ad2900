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
