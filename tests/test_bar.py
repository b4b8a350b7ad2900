"""Statistical tests of the BAR estimator.

Coverage model: reference pymbar/tests/test_bar.py (121 LoC) — all three
root-finding methods agree to decimal 8 and match analytic truth within z;
BAR vs MBAR uncertainties agree to decimal 3; bar_overlap equals the 2-state
MBAR overlap scalar.
"""

import numpy as np
import pytest
from numpy.testing import assert_almost_equal

from helpers import PRECISION, Z_SCALE, make_exp, make_ho
from pymbar_tpu import MBAR
from pymbar_tpu import other_estimators as estimators

N_k = np.array([500, 800])

SYSTEMS = {
    "harmonic": lambda: make_ho(O_k=(1.0, 2.0), K_k=(0.5, 2.0)),
    "exponential": lambda: make_exp(rates=(1.0, 4.0)),
}


@pytest.fixture(scope="module", params=list(SYSTEMS))
def bar_bundle(request):
    test = SYSTEMS[request.param]()
    w_F, w_R, N_k_out = test.sample(N_k, mode="wFwR")
    np.testing.assert_array_equal(N_k, N_k_out)
    bars = {
        "sci": estimators.bar(w_F, w_R, method="self-consistent-iteration"),
        "bis": estimators.bar(w_F, w_R, method="bisection"),
        "fp": estimators.bar(w_F, w_R, method="false-position"),
        "dBAR": estimators.bar(w_F, w_R, uncertainty_method="BAR"),
        "dMBAR": estimators.bar(w_F, w_R, uncertainty_method="MBAR"),
    }
    return dict(bars=bars, test=test, w_F=w_F, w_R=w_R)


@pytest.mark.parametrize("system", list(SYSTEMS))
def test_wfwr_sampling(system):
    test = SYSTEMS[system]()
    for counts in ([10, 8], [1, 1], [10, 0], [0, 5]):
        test.sample(counts, mode="wFwR")


def test_bar_free_energies(bar_bundle):
    bars, test = bar_bundle["bars"], bar_bundle["test"]
    fa = test.analytical_free_energies()
    fa = fa[1:] - fa[0]

    for key in ("fp", "sci", "bis"):
        fe = bars[key]["Delta_f"]
        dfe = bars[key]["dDelta_f"]
        z = (fe - fa) / dfe
        assert_almost_equal(z / Z_SCALE, np.zeros(np.shape(z)), decimal=0)

    # All root methods must agree to high precision.
    assert_almost_equal(bars["bis"]["Delta_f"], bars["fp"]["Delta_f"], decimal=PRECISION)
    assert_almost_equal(bars["sci"]["Delta_f"], bars["bis"]["Delta_f"], decimal=PRECISION)

    # BAR vs (exact 2-state) MBAR uncertainty variants stay close here.
    assert_almost_equal(bars["dBAR"]["dDelta_f"], bars["dMBAR"]["dDelta_f"], decimal=3)


def test_bar_one_step_tms():
    """iterated_solution=False gives the one-step (TMS-equivalent) estimate."""
    test = SYSTEMS["harmonic"]()
    w_F, w_R, _ = test.sample(N_k, mode="wFwR")
    one_step = estimators.bar(w_F, w_R, iterated_solution=False)
    assert np.isfinite(one_step["Delta_f"])
    assert np.isfinite(one_step["dDelta_f"])


@pytest.mark.parametrize("system", list(SYSTEMS))
def test_bar_overlap_matches_mbar(system):
    test = SYSTEMS[system]()
    x_n, u_kn, N_k_out, s_n = test.sample(N_k, mode="u_kn")
    np.testing.assert_array_equal(N_k, N_k_out)

    i_idx = np.arange(0, N_k[0])
    j_idx = np.arange(N_k[0], N_k[0] + N_k[1])
    w_f = u_kn[1, i_idx] - u_kn[0, i_idx]
    w_r = u_kn[0, j_idx] - u_kn[1, j_idx]

    overlap = estimators.bar_overlap(w_f, w_r)
    mbar_overlap = MBAR(u_kn, N_k).compute_overlap()["scalar"]
    assert_almost_equal(np.real(overlap), np.real(mbar_overlap), decimal=PRECISION)
