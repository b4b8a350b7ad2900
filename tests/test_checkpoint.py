"""Checkpoint / warm-start round-trip tests."""

import os

import numpy as np
from numpy.testing import assert_allclose

from helpers import N_K, make_ho
from pymbar_tpu import MBAR
from pymbar_tpu.checkpoint import load_mbar_state, resume_mbar, save_mbar


def test_checkpoint_roundtrip(tmp_path):
    test = make_ho()
    x_n, u_kn, _, _ = test.sample(N_K, mode="u_kn", seed=9)

    mbar = MBAR(u_kn, N_K, n_bootstraps=5, rseed=3)
    path = os.path.join(tmp_path, "mbar_state.npz")
    save_mbar(mbar, path)

    state = load_mbar_state(path)
    assert_allclose(state["f_k"], mbar.f_k)
    assert state["f_k_boots"].shape == (5, len(N_K))

    resumed = resume_mbar(path, u_kn)
    # Warm-started solve lands on the same fixed point.
    assert_allclose(resumed.f_k, mbar.f_k, atol=1e-9)
    r1 = mbar.compute_free_energy_differences()
    r2 = resumed.compute_free_energy_differences()
    assert_allclose(r1["Delta_f"], r2["Delta_f"], atol=1e-9)


def test_resume_rejects_wrong_shape(tmp_path):
    test = make_ho()
    _, u_kn, _, _ = test.sample(N_K, mode="u_kn", seed=9)
    mbar = MBAR(u_kn, N_K)
    path = os.path.join(tmp_path, "s.npz")
    save_mbar(mbar, path)
    import pytest

    with pytest.raises(ValueError):
        resume_mbar(path, u_kn[:2])


def test_mbar_solvers_alias_module():
    """Reference-style imports must resolve (pymbar.mbar_solvers parity)."""
    from pymbar_tpu import mbar_solvers

    for name in (
        "mbar_gradient",
        "self_consistent_update",
        "solve_mbar",
        "adaptive",
        "DEFAULT_SOLVER_PROTOCOL",
    ):
        assert hasattr(mbar_solvers, name)

    import numpy as np

    test = make_ho()
    _, u_kn, _, _ = test.sample(N_K, mode="u_kn", seed=1)
    m = MBAR(u_kn, N_K)
    g = np.asarray(mbar_solvers.mbar_gradient(u_kn, np.asarray(N_K, float), m.f_k))
    assert np.linalg.norm(g) < 1e-6


def test_resume_skip_solve(tmp_path):
    """skip_solve=True resumes through MBAR.from_solution: no solver stage,
    same downstream results as the re-solving resume."""
    import pytest

    from pymbar_tpu import MBAR
    from pymbar_tpu.checkpoint import resume_mbar, save_mbar
    from pymbar_tpu.testsystems import HarmonicOscillatorsTestCase

    tc = HarmonicOscillatorsTestCase(O_k=[0, 1, 2, 3], K_k=[1, 2, 4, 8])
    _x, u_kn, _nk, _s = tc.sample([200, 150, 250, 100], mode="u_kn", seed=9)
    N_k = np.array([200, 150, 250, 100])
    m = MBAR(u_kn, N_k)
    path = tmp_path / "ck.npz"
    save_mbar(m, path)

    warm = resume_mbar(path, u_kn, skip_solve=True)
    np.testing.assert_array_equal(warm.f_k, m.f_k)
    r0 = m.compute_free_energy_differences()
    r1 = warm.compute_free_energy_differences()
    np.testing.assert_allclose(r1["dDelta_f"], r0["dDelta_f"], rtol=0, atol=1e-14)

    with pytest.raises(ValueError):
        resume_mbar(path, u_kn, skip_solve=True, n_bootstraps=4)

    # solver kwargs are meaningless when no solver runs: rejected up front
    with pytest.raises(TypeError):
        resume_mbar(path, u_kn, skip_solve=True, maximum_iterations=50)
    with pytest.raises(TypeError):
        resume_mbar(path, u_kn, skip_solve=True, initial_f_k=m.f_k)
    # the allowed extras still pass through
    warm2 = resume_mbar(path, u_kn, skip_solve=True, rseed=7, verbose=False)
    np.testing.assert_array_equal(warm2.f_k, m.f_k)
    # the K-consistency check runs on the skip_solve path too
    with pytest.raises(ValueError):
        resume_mbar(path, u_kn[:2], skip_solve=True)
