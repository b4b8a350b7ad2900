"""Tests of the timeseries decorrelation tools.

Coverage model: reference pymbar/tests/test_timeseries.py (178 LoC).  The
statsmodels-gated FFT tests run unconditionally here because the FFT path is
native.
"""

import numpy as np
import pytest
from numpy.testing import assert_almost_equal
from scipy import stats

from pymbar_tpu import testsystems, timeseries


@pytest.fixture(scope="module")
def data(N=10000, K=10):
    var = np.ones(N)
    for _ in range(2, K + 1):
        var = np.concatenate((var, np.ones(N)))
    X = np.random.normal(np.zeros(K * N), var).reshape((K, N)) / 10.0
    Y = np.random.normal(np.zeros(K * N), var).reshape((K, N))
    energy = 10 * (X**2) / 2.0 + (Y**2) / 2.0
    return X, Y, energy


def test_statistical_inefficiency_single(data):
    X, Y, energy = data
    timeseries.statistical_inefficiency(X[0])
    timeseries.statistical_inefficiency(X[0], X[0])
    timeseries.statistical_inefficiency(X[0] ** 2)
    timeseries.statistical_inefficiency(X[0] ** 2, X[0] ** 2)
    timeseries.statistical_inefficiency(energy[0])
    timeseries.statistical_inefficiency(energy[0], energy[0])
    timeseries.statistical_inefficiency(X[0], X[0] ** 2)


def test_statistical_inefficiency_multiple(data):
    X, Y, energy = data
    timeseries.statistical_inefficiency_multiple(X)
    timeseries.statistical_inefficiency_multiple(X**2)
    timeseries.statistical_inefficiency_multiple(X[0, :] ** 2)
    timeseries.statistical_inefficiency_multiple(X[0:2, :] ** 2)
    timeseries.statistical_inefficiency_multiple(energy)


def test_statistical_inefficiency_on_known_tau():
    """g estimated on AR(1) data must match the analytic 1 + 2*tau_int."""
    tau = 10.0
    rho = np.exp(-1.0 / tau)
    g_true = 1.0 + 2.0 * (0.5 * (1 + rho) / (1 - rho) - 0.5)  # 1+2*tau_int-1
    gs = []
    for seed in range(5):
        A_n = testsystems.correlated_timeseries_example(N=100000, tau=tau, seed=seed)
        gs.append(timeseries.statistical_inefficiency(A_n))
    # within 15% on average over 5 draws
    assert abs(np.mean(gs) - g_true) / g_true < 0.15


def test_fft_and_direct_agree(data):
    X, Y, energy = data
    g0 = timeseries.statistical_inefficiency_fft(X[0])
    g1 = timeseries.statistical_inefficiency(X[0])
    g2 = timeseries.statistical_inefficiency(X[0], X[0])
    g3 = timeseries.statistical_inefficiency(X[0], fft=True)
    assert_almost_equal(g0, g1, decimal=6)
    assert_almost_equal(g0, g2, decimal=6)
    assert_almost_equal(g0, g3, decimal=6)


def test_explicit_direct_overrides_fft_flag(data):
    """An explicit method='direct' request must take the bitwise-parity
    accumulation even with the legacy fft=True flag set (the fft early
    return must not override it)."""
    X, Y, energy = data
    g_direct = timeseries.statistical_inefficiency(X[0], method="direct")
    g_both = timeseries.statistical_inefficiency(X[0], fft=True, method="direct")
    assert g_both == g_direct  # bitwise: same accumulation path


def test_fft_gaussian_uncorrelated_and_repeated():
    """White noise must give g~1; 3x-repeated samples must give g~3
    (reference test_timeseries.py:77-104)."""
    for _ in range(5):
        x = np.random.normal(size=100000)
        g0 = timeseries.statistical_inefficiency(x, fast=False)
        g1 = timeseries.statistical_inefficiency(x, x, fast=False)
        g2 = timeseries.statistical_inefficiency_fft(x)
        g3 = timeseries.statistical_inefficiency(x, fft=True)
        assert_almost_equal(g0, g1, decimal=5)
        assert_almost_equal(g0, g2, decimal=5)
        assert_almost_equal(g0, g3, decimal=5)
        assert_almost_equal(np.log(g0), np.log(1.0), decimal=1)

    for _ in range(5):
        x = np.repeat(np.random.normal(size=100000), 3)
        g0 = timeseries.statistical_inefficiency(x, fast=False)
        g2 = timeseries.statistical_inefficiency_fft(x)
        assert_almost_equal(g0, g2, decimal=5)
        assert_almost_equal(np.log(g0), np.log(3.0), decimal=1)


def test_detect_equilibration_runs():
    x = np.random.normal(size=10000)
    t, g, Neff_max = timeseries.detect_equilibration(x)
    assert 0 <= t < len(x)
    assert g >= 1.0


def test_detect_equilibration_binary_search_runs():
    x = np.random.normal(size=10000)
    t, g, Neff_max = timeseries.detect_equilibration_binary_search(x)
    assert 0 <= t < len(x)


def test_detect_equilibration_methods_agree():
    """Binary-search and full-scan equilibration detection agree modally
    (reference test_timeseries.py:118-144)."""
    t_res = []
    N = 100
    for _ in range(100):
        A_t = testsystems.correlated_timeseries_example(N=N, tau=5.0) + 2.0
        B_t = testsystems.correlated_timeseries_example(N=N, tau=5.0) + 1.0
        C_t = testsystems.correlated_timeseries_example(N=N * 2, tau=5.0)
        D_t = np.concatenate([A_t, B_t, C_t])
        bs_de = timeseries.detect_equilibration_binary_search(D_t, bs_nodes=10)
        std_de = timeseries.detect_equilibration(D_t, fast=False, nskip=1)
        t_res.append(bs_de[0] - std_de[0])
    t_res_mode = float(stats.mode(t_res, keepdims=True)[0][0])
    assert_almost_equal(t_res_mode, 0.0, decimal=1)


def test_detect_equilibration_constant_trailing():
    """Issue #122 regression: constant trailing sequence must not raise."""
    x = np.random.normal(size=100) * 0.01
    x[50:] = 3.0
    t, g, Neff_max = timeseries.detect_equilibration(x)


def test_detect_equilibration_constant_series():
    """A fully constant series returns Neff = 1 (issue #122 semantics)."""
    x = np.ones(100)
    t, g, Neff = timeseries.detect_equilibration(x)
    assert (t, g, Neff) == (0, 1, 1)


def test_correlation_function_multiple_truncate_norm():
    A_t = [testsystems.correlated_timeseries_example(N=10000, tau=10.0) for _ in range(10)]
    corr_norm = timeseries.normalized_fluctuation_correlation_function_multiple(A_kn=A_t)
    corr = timeseries.normalized_fluctuation_correlation_function_multiple(
        A_kn=A_t, norm=False
    )
    corr_norm_trun = timeseries.normalized_fluctuation_correlation_function_multiple(
        A_kn=A_t, truncate=True
    )
    corr_trun = timeseries.normalized_fluctuation_correlation_function_multiple(
        A_kn=A_t, norm=False, truncate=True
    )
    assert corr_norm_trun[-1] >= 0
    assert corr_trun[-1] >= 0
    assert corr_norm[0] == 1.0
    assert corr_norm_trun[0] == 1.0
    assert len(corr_trun) == len(corr_norm_trun)


def test_subsampling_strides():
    A_t = testsystems.correlated_timeseries_example(N=10000, tau=5.0, seed=7)
    idx = timeseries.subsample_correlated_data(A_t)
    assert len(idx) > 0
    assert sorted(set(idx)) == list(idx)
    idx_c = list(timeseries.subsample_correlated_data(A_t, conservative=True))
    strides = np.diff(idx_c)
    assert np.all(strides == strides[0])  # uniform stride for conservative


def test_integrated_autocorrelation_time_wrappers():
    A_t = testsystems.correlated_timeseries_example(N=10000, tau=5.0, seed=3)
    tau1 = timeseries.integrated_autocorrelation_time(A_t)
    assert tau1 > 0
    tau2 = timeseries.integrated_autocorrelation_timeMultiple([A_t, A_t])
    assert tau2 > 0
