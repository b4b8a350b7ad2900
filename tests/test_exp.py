"""Statistical tests of the EXP (Zwanzig) estimators.

Coverage model: reference pymbar/tests/test_exp.py (94 LoC).
"""

import numpy as np
import pytest
from numpy.testing import assert_almost_equal

from helpers import Z_SCALE, make_exp, make_ho
from pymbar_tpu import other_estimators as estimators

N_k = np.array([50000, 100000])

SYSTEMS = {
    "harmonic": lambda: make_ho(O_k=(1.0, 2.0), K_k=(0.5, 1.0)),
    "exponential": lambda: make_exp(rates=(1.0, 4.0)),
}


@pytest.fixture(scope="module", params=list(SYSTEMS))
def exp_bundle(request):
    test = SYSTEMS[request.param]()
    w_F, w_R, N_k_out = test.sample(N_k, mode="wFwR")
    np.testing.assert_array_equal(N_k, N_k_out)
    exps = {
        "F": estimators.exp(w_F),
        "R": estimators.exp(w_R),
        "gF": estimators.exp_gauss(w_F),
        "gR": estimators.exp_gauss(w_R),
    }
    return dict(exps=exps, test=test, w_F=w_F, w_R=w_R)


@pytest.mark.parametrize("system", list(SYSTEMS))
def test_wfwr_sampling(system):
    test = SYSTEMS[system]()
    for counts in ([10, 8], [1, 1], [10, 0], [0, 5]):
        test.sample(counts, mode="wFwR")


def test_exp_free_energies(exp_bundle):
    exps, test = exp_bundle["exps"], exp_bundle["test"]
    fa = test.analytical_free_energies()
    fa = fa[1:] - fa[0]

    fe_F, dfe_F = exps["F"]["Delta_f"], exps["F"]["dDelta_f"]
    z = (fe_F - fa) / dfe_F
    assert_almost_equal(z / Z_SCALE, np.zeros(np.shape(z)), decimal=0)

    fe_R, dfe_R = -exps["R"]["Delta_f"], exps["R"]["dDelta_f"]
    z = (fe_R - fa) / dfe_R
    assert_almost_equal(z / Z_SCALE, np.zeros(np.shape(z)), decimal=0)

    # Gaussian-approx variants must at least produce finite estimates
    # (accuracy intentionally not asserted, as in the reference).
    assert np.isfinite(exps["gF"]["Delta_f"]) and np.isfinite(exps["gF"]["dDelta_f"])
    assert np.isfinite(exps["gR"]["Delta_f"]) and np.isfinite(exps["gR"]["dDelta_f"])

    # Forward/reverse consistency within combined uncertainty.
    z = np.abs(fe_R - fe_F) / np.sqrt(dfe_R**2 + dfe_F**2)
    assert_almost_equal(z / Z_SCALE, 0.0, decimal=0)


def test_exp_no_uncertainty():
    test = SYSTEMS["harmonic"]()
    w_F, w_R, _ = test.sample([100, 100], mode="wFwR")
    r = estimators.exp(w_F, compute_uncertainty=False)
    assert set(r.keys()) == {"Delta_f"}
    r = estimators.exp_gauss(w_F, compute_uncertainty=False)
    assert set(r.keys()) == {"Delta_f"}


def test_exp_timeseries_correction():
    """is_timeseries=True inflates the error bar via the statistical
    inefficiency of the exponential weights."""
    from pymbar_tpu.testsystems import correlated_timeseries_example

    w = 1.0 + 0.2 * correlated_timeseries_example(N=20000, tau=10.0, seed=4).astype(float)
    plain = estimators.exp(w)
    corrected = estimators.exp(w, is_timeseries=True)
    assert corrected["dDelta_f"] > plain["dDelta_f"]
    assert np.isclose(corrected["Delta_f"], plain["Delta_f"])

    g_plain = estimators.exp_gauss(w)
    g_corr = estimators.exp_gauss(w, is_timeseries=True)
    assert g_corr["dDelta_f"] > g_plain["dDelta_f"]
