"""Stable (weighted) logsumexp on device.

Semantics match the reference host implementation
(pymbar 4.x utils.py:279-337): the per-slice maximum is clamped
to 0 when non-finite so all-(-inf) slices reduce to -inf instead of nan, and
an optional multiplicative weight ``b`` scales each exponential.

Everything here is shape-polymorphic pure-jnp so it traces once under jit and
fuses into surrounding elementwise work; the blocked/fused TPU paths live in
:mod:`pymbar_tpu.ops.pallas_kernels`.
"""

import jax.numpy as jnp

__all__ = ["logsumexp"]


def logsumexp(a, axis=None, b=None, keepdims=False):
    """log(sum(b * exp(a), axis)) computed stably on device.

    Parameters
    ----------
    a : jnp.ndarray
        Log-space inputs.
    axis : int or None
        Reduction axis (None = all).
    b : jnp.ndarray, optional
        Multiplicative weights, broadcastable to ``a``.  May contain zeros
        (contributions drop out exactly).
    keepdims : bool
        Keep the reduced axis as size 1.
    """
    a = jnp.asarray(a)
    a_max = jnp.max(a, axis=axis, keepdims=True)
    a_max = jnp.where(jnp.isfinite(a_max), a_max, 0.0)

    shifted = jnp.exp(a - a_max)
    if b is not None:
        shifted = jnp.asarray(b) * shifted
    out = jnp.log(jnp.sum(shifted, axis=axis, keepdims=keepdims))

    if not keepdims:
        a_max = jnp.squeeze(a_max, axis=axis) if axis is not None else jnp.squeeze(a_max)
    return out + a_max
