"""svd vs svd-ew covariance agreement.

The reference version of this check is dead code (its function is named
``_test`` and never collected, reference tests/test_covariance.py:15); here
it is enabled, as SURVEY.md §4 prescribes.
"""

import numpy as np
import pytest
from numpy.testing import assert_almost_equal

import jax.numpy as jnp

from pymbar_tpu import MBAR
from pymbar_tpu.ops import mbar_gradient, self_consistent_update
from pymbar_tpu.utils_for_testing import exponentials, oscillators


@pytest.mark.parametrize(
    "statesa, statesb, test_system",
    [(100, 100, oscillators), (200, 50, oscillators), (200, 50, exponentials)],
)
def test_svd_vs_svdew(statesa, statesb, test_system):
    name, U, N_k, s_n = test_system(statesa, statesb)
    mbar = MBAR(U, N_k)
    r_svd = mbar.compute_free_energy_differences(uncertainty_method="svd")
    r_ew = mbar.compute_free_energy_differences(uncertainty_method="svd-ew")

    u, n, f = (
        jnp.asarray(U),
        jnp.asarray(N_k, dtype=np.float64),
        jnp.asarray(mbar.f_k),
    )
    assert_almost_equal(
        np.asarray(mbar_gradient(u, n, f)), np.zeros(N_k.shape), decimal=8
    )
    assert_almost_equal(np.exp(mbar.Log_W_nk).sum(0), np.ones(len(N_k)), decimal=10)
    assert_almost_equal(np.exp(mbar.Log_W_nk).dot(N_k), np.ones(U.shape[1]), decimal=10)
    assert_almost_equal(
        np.asarray(self_consistent_update(u, n, f)), mbar.f_k, decimal=10
    )

    assert_almost_equal(r_svd["Delta_f"], r_ew["Delta_f"], decimal=8)
    assert_almost_equal(r_svd["dDelta_f"], r_ew["dDelta_f"], decimal=8)
