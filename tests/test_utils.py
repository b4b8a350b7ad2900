"""Tests of host utilities: logsumexp semantics, normalization checks,
ensure_type matrix, layout converters.

Coverage model: reference pymbar/tests/test_utils.py (241 LoC).
"""

import numpy as np
import pytest
from numpy.testing import assert_almost_equal, assert_equal
from scipy.special import logsumexp as scipy_logsumexp

import pymbar_tpu
from pymbar_tpu.utils import (
    ParameterError,
    TypeCastPerformanceWarning,
    ensure_type,
)


def test_logsumexp_matches_scipy_all_axes():
    a = np.random.normal(size=(200, 500, 5))
    for axis in range(a.ndim):
        ours = pymbar_tpu.utils.logsumexp(a, axis=axis)
        ours_no_ne = pymbar_tpu.utils.logsumexp(a, axis=axis, use_numexpr=False)
        ref = scipy_logsumexp(a, axis=axis)
        assert_almost_equal(ours, ours_no_ne)
        assert_almost_equal(ours, ref)


def test_logsumexp_single_infinite():
    assert_equal(pymbar_tpu.utils.logsumexp(np.inf), scipy_logsumexp(np.inf))


def test_logsumexp_weighted_matches_scipy():
    a = np.random.normal(size=(200, 500, 5))
    b = np.random.normal(size=(200, 500, 5)) ** 2.0
    for axis in range(a.ndim):
        ours = pymbar_tpu.utils.logsumexp(a, b=b, axis=axis)
        ref = scipy_logsumexp(a, b=b, axis=axis)
        assert_almost_equal(ours, ref)


def test_device_logsumexp_matches_host():
    import jax.numpy as jnp

    from pymbar_tpu.ops.logsumexp import logsumexp as dev_logsumexp

    a = np.random.normal(size=(64, 257))
    b = np.random.normal(size=(64, 257)) ** 2.0
    for axis in (0, 1):
        assert_almost_equal(
            np.asarray(dev_logsumexp(jnp.asarray(a), axis=axis, b=jnp.asarray(b))),
            scipy_logsumexp(a, b=b, axis=axis),
            decimal=12,
        )
    # -inf columns must reduce to -inf, not nan
    a_inf = np.full((3, 4), -np.inf)
    out = np.asarray(dev_logsumexp(jnp.asarray(a_inf), axis=0))
    assert np.all(np.isneginf(out))


def test_legacy_logsum():
    u = np.random.normal(size=200)
    assert_almost_equal(
        pymbar_tpu.utils.logsumexp(u), pymbar_tpu.utils._logsum(u), decimal=12
    )


@pytest.mark.xfail(raises=ParameterError)
def test_check_w_normalized_bad_row():
    w = np.array([[0.5, 0.5, 0.75, 0.25]])
    pymbar_tpu.utils.check_w_normalized(w, np.array([1, 1]))


@pytest.mark.xfail(raises=ParameterError)
def test_check_w_normalized_bad_col():
    w = np.array([[0.5, 0.5], [0.5, 0.5]])
    pymbar_tpu.utils.check_w_normalized(w, np.array([1, 0]))


@pytest.mark.parametrize(
    "kwargs,expected,warn",
    [
        (dict(val=None, dtype=int, ndim=1, name="t", can_be_none=True), None, None),
        (
            dict(val=0, dtype=int, ndim=1, name="t", add_newaxis_on_deficient_ndim=True),
            np.array([0]),
            None,
        ),
        pytest.param(
            dict(val=0, dtype=int, ndim=1, name="t", add_newaxis_on_deficient_ndim=False),
            "fail",
            None,
            marks=pytest.mark.xfail,
        ),
        pytest.param(
            dict(val=[], dtype=int, ndim=1, name="t", add_newaxis_on_deficient_ndim=True),
            "fail",
            None,
            marks=pytest.mark.xfail,
        ),
        (
            dict(val=np.array([1.0]), dtype=int, ndim=1, name="t", warn_on_cast=True),
            np.array([1]),
            TypeCastPerformanceWarning,
        ),
        (
            dict(
                val=np.array([1]),
                dtype=int,
                ndim=2,
                name="t",
                add_newaxis_on_deficient_ndim=True,
            ),
            np.array([[1]]),
            None,
        ),
        pytest.param(
            dict(
                val=np.array([1]),
                dtype=int,
                ndim=3,
                name="t",
                add_newaxis_on_deficient_ndim=True,
            ),
            "fail",
            None,
            marks=pytest.mark.xfail,
        ),
        pytest.param(
            dict(val=np.array([1, 2, 3]), dtype=int, ndim=1, name="t", length=4),
            "fail",
            None,
            marks=pytest.mark.xfail,
        ),
        (
            dict(
                val=np.array([[1, 2, 3], [4, 5, 6]]),
                dtype=int,
                ndim=2,
                name="t",
                shape=(2, 3),
            ),
            np.array([[1, 2, 3], [4, 5, 6]]),
            None,
        ),
        (
            dict(
                val=np.array([[1, 2, 3], [4, 5, 6]]),
                dtype=int,
                ndim=2,
                name="t",
                shape=(None, 3),
            ),
            np.array([[1, 2, 3], [4, 5, 6]]),
            None,
        ),
        pytest.param(
            dict(
                val=np.array([[1, 2, 3], [4, 5, 6]]),
                dtype=int,
                ndim=2,
                name="t",
                shape=(2,),
            ),
            "fail",
            None,
            marks=pytest.mark.xfail,
        ),
        pytest.param(
            dict(
                val=np.array([[1, 2, 3], [4, 5, 6]]),
                dtype=int,
                ndim=2,
                name="t",
                shape=(3, 1),
            ),
            "fail",
            None,
            marks=pytest.mark.xfail,
        ),
    ],
)
def test_ensure_type_matrix(kwargs, expected, warn):
    if warn is not None:
        with pytest.warns(warn):
            ret = ensure_type(**kwargs)
    else:
        ret = ensure_type(**kwargs)
    if isinstance(ret, np.ndarray):
        assert np.allclose(ret, expected)
        assert ret.shape == expected.shape
    else:
        assert ret == expected


@pytest.mark.parametrize("n_k", [None, np.array([3] * 3)])
def test_layout_roundtrip(n_k):
    """kln -> kn -> n layout conversions on a hand-built 3-state example."""
    u_kln = np.array(
        [
            [[0, 0, 0], [1, 1, 1], [2, 2, 2]],
            [[-2, -2, -2], [0, 0, 0], [2, 2, 2]],
            [[-6, -6, -6], [-3, -3, -3], [0, 0, 0]],
        ]
    )
    u_kn = np.array(
        [
            [0, 0, 0, -2, -2, -2, -6, -6, -6],
            [1, 1, 1, 0, 0, 0, -3, -3, -3],
            [2, 2, 2, 2, 2, 2, 0, 0, 0],
        ]
    )
    u_n = np.array(
        [0, 0, 0, -2, -2, -2, -6, -6, -6, 1, 1, 1, 0, 0, 0, -3, -3, -3, 2, 2, 2, 2, 2, 2, 0, 0, 0]
    )
    u_kn_out = pymbar_tpu.utils.kln_to_kn(u_kln, N_k=n_k, cleanup=True)
    assert np.allclose(u_kn, u_kn_out)
    if n_k is not None:
        n_k = np.array([9] * 3)
    u_n_out = pymbar_tpu.utils.kn_to_n(u_kn, N_k=n_k, cleanup=True)
    assert np.allclose(u_n, u_n_out)


def test_ragged_layout_conversion():
    """kln_to_kn with unequal N_k must concatenate only the valid slots."""
    u_kln = np.zeros([2, 2, 3])
    u_kln[0, 0, :2] = [1, 2]
    u_kln[0, 1, :2] = [3, 4]
    u_kln[1, 0, :3] = [5, 6, 7]
    u_kln[1, 1, :3] = [8, 9, 10]
    N_k = np.array([2, 3])
    u_kn = pymbar_tpu.utils.kln_to_kn(u_kln, N_k=N_k)
    assert u_kn.shape == (2, 5)
    assert np.allclose(u_kn[0], [1, 2, 5, 6, 7])
    assert np.allclose(u_kn[1], [3, 4, 8, 9, 10])


def test_confidenceintervals_qq_plot(tmp_path):
    """qq_plot must render and write a figure for 0/1/2-dim replicates."""
    import matplotlib

    matplotlib.use("Agg")
    from pymbar_tpu import confidenceintervals

    rng = np.random.default_rng(0)
    K = 3
    reps = [
        dict(
            estimated=rng.normal(size=(K, K)),
            error=rng.normal(size=(K, K)) * 0.1,
            destimated=np.abs(rng.normal(size=(K, K))) + 0.1,
        )
        for _ in range(20)
    ]
    out = tmp_path / "qq.pdf"
    confidenceintervals.qq_plot(reps, K, filename=str(out))
    assert out.exists() and out.stat().st_size > 0
