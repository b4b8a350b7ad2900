"""Tests of the double-word (two-float32) arithmetic behind the TPU kernels.

The error-free transforms and the range-reduced exp must deliver ~1e-13
effective precision — validated here against true float64 on CPU.  The
Pallas kernels themselves are exercised on TPU hardware (bench path); their
math helpers are plain jnp and fully covered here.
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import jax
import jax.numpy as jnp

from pymbar_tpu.ops.doubledouble import (
    dd_exp_neg_fast,
    dd_add,
    dd_exp_neg,
    dd_from_f64,
    dd_mul,
    dd_to_f64,
    two_prod,
    two_sum,
)
from pymbar_tpu.ops.pallas_kernels import dd_log_pos, _dd_tree_sum


def test_two_sum_exact():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=10000), dtype=jnp.float32)
    b = jnp.asarray(rng.normal(size=10000) * 1e-4, dtype=jnp.float32)
    s, e = jax.jit(two_sum)(a, b)
    exact = a.astype(jnp.float64) + b.astype(jnp.float64)
    got = s.astype(jnp.float64) + e.astype(jnp.float64)
    assert_allclose(np.asarray(got), np.asarray(exact), rtol=0, atol=0)


def test_two_prod_exact():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.normal(size=10000), dtype=jnp.float32)
    b = jnp.asarray(rng.normal(size=10000), dtype=jnp.float32)
    p, e = jax.jit(two_prod)(a, b)
    exact = a.astype(jnp.float64) * b.astype(jnp.float64)
    got = p.astype(jnp.float64) + e.astype(jnp.float64)
    assert_allclose(np.asarray(got), np.asarray(exact), rtol=0, atol=0)


def test_dd_roundtrip_and_ops():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(-50, 50, 20000))
    y = jnp.asarray(rng.uniform(-50, 50, 20000))
    xh, xl = dd_from_f64(x)
    yh, yl = dd_from_f64(y)
    assert float(jnp.max(jnp.abs(dd_to_f64(xh, xl) - x) / jnp.abs(x))) < 1e-14

    sh, sl = jax.jit(dd_add)(xh, xl, yh, yl)
    assert float(jnp.max(jnp.abs(dd_to_f64(sh, sl) - (x + y)))) < 1e-11

    ph, pl = jax.jit(dd_mul)(xh, xl, yh, yl)
    rel = jnp.abs(dd_to_f64(ph, pl) - x * y) / jnp.maximum(jnp.abs(x * y), 1e-30)
    assert float(jnp.max(rel)) < 1e-13


def test_dd_exp_neg_accuracy():
    """~1e-13 relative over the argument range a logsumexp term can take."""
    rng = np.random.default_rng(3)
    a = jnp.asarray(-rng.uniform(0, 40, 200000))
    hi, lo = dd_from_f64(a)
    eh, el = jax.jit(dd_exp_neg)(hi, lo)
    rel = jnp.abs(dd_to_f64(eh, el) - jnp.exp(a)) / jnp.exp(a)
    assert float(jnp.max(rel)) < 5e-13


def test_dd_exp_neg_fast_accuracy():
    """The 16x-reduction variant: ~2e-13 eager; the XLA:CPU fusion emitter
    reassociates one compensation (observed only when the whole graph fuses,
    not in any isolated sub-graph), capping jit accuracy at ~1.4e-11 on CPU.
    Both are far below the solver noise floor (~9e-11); Mosaic/TPU preserves
    full accuracy (kernel-level gate lives in test_solvers_large)."""
    rng = np.random.default_rng(30)
    a = jnp.asarray(-rng.uniform(0, 60, 200000))
    hi, lo = dd_from_f64(a)
    eh, el = dd_exp_neg_fast(hi, lo)
    rel = jnp.abs(dd_to_f64(eh, el) - jnp.exp(a)) / jnp.exp(a)
    assert float(jnp.max(rel)) < 1e-12
    eh, el = jax.jit(dd_exp_neg_fast)(hi, lo)
    rel = jnp.abs(dd_to_f64(eh, el) - jnp.exp(a)) / jnp.exp(a)
    assert float(jnp.max(rel)) < 5e-11


def test_dd_exp_fast_lo_word_underflow_cap():
    """Below exp(a) ~ 1e-31 the f32 lo word denormalizes: relative accuracy
    degrades to one f32 ulp (~6e-8) for BOTH exp variants.  Harmless for
    logsumexp (such terms contribute < 1e-30 absolutely) — this test pins
    the behavior so the cap is intentional, not a regression."""
    rng = np.random.default_rng(31)
    a = jnp.asarray(-rng.uniform(70, 84, 50000))
    hi, lo = dd_from_f64(a)
    for fn in (dd_exp_neg, dd_exp_neg_fast):
        eh, el = jax.jit(fn)(hi, lo)
        rel = jnp.abs(dd_to_f64(eh, el) - jnp.exp(a)) / jnp.exp(a)
        assert float(jnp.max(rel)) < 1.2e-7  # one f32 ulp cap
        assert float(jnp.max(jnp.abs(dd_to_f64(eh, el) - jnp.exp(a)))) < 1e-36


def test_dd_exp_neg_deep_underflow_is_harmless():
    """Terms below the clamp must come out >= 0 and < 1e-30 (invisible)."""
    a = jnp.asarray(np.linspace(-500.0, -90.0, 1000))
    hi, lo = dd_from_f64(a)
    eh, el = jax.jit(dd_exp_neg)(hi, lo)
    v = np.asarray(dd_to_f64(eh, el))
    assert np.all(v >= 0)
    assert np.all(v < 1e-30)


def test_dd_log_pos_accuracy():
    rng = np.random.default_rng(4)
    s = jnp.asarray(rng.uniform(1.0, 1e6, 100000))
    sh, sl = dd_from_f64(s)
    lh, ll = jax.jit(dd_log_pos)(sh, sl)
    err = jnp.abs(dd_to_f64(lh, ll) - jnp.log(s))
    assert float(jnp.max(err)) < 1e-12


def test_dd_tree_sum_matches_f64():
    rng = np.random.default_rng(5)
    vals = rng.uniform(0, 1, (256, 8))
    h, l = dd_from_f64(jnp.asarray(vals))
    sh, sl = _dd_tree_sum(h, l, axis=0)
    exact = jnp.sum(jnp.asarray(vals), axis=0)
    err = jnp.abs(dd_to_f64(sh, sl).reshape(-1) - exact)
    assert float(jnp.max(err)) < 1e-12


def test_logsumexp_via_dd_matches_f64():
    """End-to-end dd logsumexp (tree sum + dd exp + dd log) vs float64."""
    rng = np.random.default_rng(6)
    K, T = 64, 128
    a64 = jnp.asarray(-rng.uniform(0, 30, (K, T)))

    from pymbar_tpu.ops.doubledouble import two_sum as _ts

    hi, lo = dd_from_f64(a64)
    eh, el = dd_exp_neg(hi, lo)
    sh, sl = _dd_tree_sum(eh, el, axis=0)
    lh, ll = dd_log_pos(sh, sl)
    got = dd_to_f64(lh, ll).reshape(-1)

    from jax.scipy.special import logsumexp as lse

    want = lse(a64, axis=0)
    assert float(jnp.max(jnp.abs(got - want))) < 1e-12
