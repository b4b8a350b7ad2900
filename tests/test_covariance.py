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


def test_gram_normalization_matches_materialized_w():
    """The streamed Gram pass must reproduce W^T W, colsum W and the
    normalization checks of the materialized weight matrix exactly."""
    from pymbar_tpu.ops.mbar_core import mbar_gram_normalization

    name, U, N_k, s_n = oscillators(25, 200)
    mbar = MBAR(U, N_k)
    W = np.exp(mbar.Log_W_nk)

    gram, colsum, rowstats = mbar_gram_normalization(U, N_k, mbar.f_k)
    assert_almost_equal(np.asarray(gram), W.T @ W, decimal=12)
    assert_almost_equal(np.asarray(colsum), W.sum(axis=0), decimal=12)
    n_bad, _, _ = rowstats
    assert n_bad == 0


def test_gram_normalization_chunked_matches_direct():
    """Force multi-chunk streaming and compare against the one-chunk pass."""
    from pymbar_tpu.ops import mbar_core

    name, U, N_k, s_n = oscillators(8, 300)
    mbar = MBAR(U, N_k)

    gram1, colsum1, row1 = mbar_core.mbar_gram_normalization(U, N_k, mbar.f_k)
    old = mbar_core._GRAM_CHUNK_BYTES
    mbar_core._GRAM_CHUNK_BYTES = 1024  # ~19 KB input -> many chunks
    try:
        gram2, colsum2, row2 = mbar_core.mbar_gram_normalization(
            U, N_k, mbar.f_k
        )
    finally:
        mbar_core._GRAM_CHUNK_BYTES = old
    assert_almost_equal(np.asarray(gram1), np.asarray(gram2), decimal=13)
    assert_almost_equal(np.asarray(colsum1), np.asarray(colsum2), decimal=13)
    assert row1[0] == row2[0] == 0


def test_streamed_check_raises_on_unconverged_f():
    """An unconverged f_k must fail the column-sum check with the reference
    diagnostic, via the streamed aggregates (no W materialization)."""
    from pymbar_tpu.utils import ParameterError

    name, U, N_k, s_n = oscillators(10, 100)
    mbar = MBAR(U, N_k)
    mbar.f_k = mbar.f_k + np.linspace(0.0, 3.0, len(mbar.f_k))  # break it
    with pytest.raises(ParameterError, match="sum_n W_nk = 1"):
        mbar._compute_theta_streamed(method="svd-ew")


def test_overlap_and_neff_match_materialized_w():
    """Gram-path overlap/N_eff equal the direct W-based formulas."""
    name, U, N_k, s_n = oscillators(12, 150)
    mbar = MBAR(U, N_k)
    W = np.exp(mbar.Log_W_nk)

    O_direct = N_k * (W.T @ W)
    res = mbar.compute_overlap()
    assert_almost_equal(res["matrix"], O_direct, decimal=11)

    neff_direct = 1.0 / np.sum(W**2, axis=0)
    assert_almost_equal(
        mbar.compute_effective_sample_number(), neff_direct, decimal=8
    )
