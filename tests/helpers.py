"""Shared helpers for the statistical test suite.

Core pattern (reference tests/test_mbar.py:13-16): estimates must sit within
~6 sigma of the analytic truth; z-scores are scaled by Z_SCALE and required
to round to 0 at decimal=0.
"""

import numpy as np
from numpy.testing import assert_almost_equal

PRECISION = 8  # decimal places for exact (analytical) identities
Z_SCALE = 12.0  # |z| < 6 passes; matches the reference's z_scale_factor

# Default MBAR scenario deliberately includes an empty state
# (reference tests/test_mbar.py:16).
N_K = np.array([1000, 500, 0, 800])


def assert_zscore_ok(estimate, truth, sigma):
    """Require |estimate - truth| within ~6 sigma everywhere."""
    z = np.asarray((np.asarray(estimate) - np.asarray(truth)) / np.asarray(sigma))
    assert_almost_equal(z / Z_SCALE, np.zeros(np.shape(z)), decimal=0)


def zscore_differences(x_ij, dx_ij, x_analytic):
    """z matrix for difference estimates, with exact-zero diagonal checked.

    Mirrors the reference's convert_to_differences helper
    (tests/test_mbar.py:27-38): unit sigmas are placed on the diagonal and
    the diagonal z is the raw difference (must be exactly ~0).
    """
    x_ij = np.asarray(x_ij)
    dx_ij = np.array(dx_ij, copy=True)
    xa_ij = np.asarray(x_analytic) - np.vstack(np.asarray(x_analytic))

    K = x_ij.shape[0]
    dx_ij[np.arange(K), np.arange(K)] += 1
    z = (x_ij - xa_ij) / dx_ij
    z[np.arange(K), np.arange(K)] = (x_ij - xa_ij)[np.arange(K), np.arange(K)]
    return z


def make_ho(O_k=(1.0, 2.0, 3.0, 4.0), K_k=(0.5, 1.0, 1.5, 2.0)):
    from pymbar_tpu.testsystems import HarmonicOscillatorsTestCase

    return HarmonicOscillatorsTestCase(np.asarray(O_k), np.asarray(K_k))


def make_exp(rates=(1.0, 2.0, 3.0, 4.0)):
    from pymbar_tpu.testsystems import ExponentialTestCase

    return ExponentialTestCase(np.asarray(rates))
