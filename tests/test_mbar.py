"""Statistical tests of the MBAR estimator against analytically solvable systems.

Coverage model: reference pymbar/tests/test_mbar.py (545 LoC) — free energies
under every uncertainty method, every initialization, expectations in all
layouts, entropy/enthalpy, overlap, effective sample numbers, perturbed free
energies, bootstrap determinism.
"""

import numpy as np
import pytest
from numpy.testing import assert_almost_equal

from helpers import N_K, PRECISION, Z_SCALE, assert_zscore_ok, make_exp, make_ho, zscore_differences
from pymbar_tpu import MBAR
from pymbar_tpu.utils import ParameterError

SYSTEMS = {"harmonic": make_ho, "exponential": make_exp}


@pytest.fixture(scope="module", params=list(SYSTEMS))
def bundle(request):
    """Module-scoped MBAR over each generator, with bootstraps for the
    bootstrap-uncertainty tests (reference test_mbar.py:44-51)."""
    test = SYSTEMS[request.param]()
    x_n, u_kn, N_k_out, s_n = test.sample(N_K, mode="u_kn")
    np.testing.assert_array_equal(N_K, N_k_out)
    mbar = MBAR(u_kn, N_K, verbose=True, n_bootstraps=200)
    return dict(mbar=mbar, test=test, x_n=x_n, u_kn=u_kn)


@pytest.fixture(scope="module")
def bundle_ho():
    test = make_ho()
    x_n, u_kn, N_k_out, s_n = test.sample(N_K, mode="u_kn")
    mbar = MBAR(u_kn, N_K, verbose=True)
    return dict(mbar=mbar, test=test, x_n=x_n, u_kn=u_kn)


@pytest.fixture(scope="module")
def bundle_kln():
    test = make_ho()
    x_kn, u_kln, N_k_out = test.sample(N_K, mode="u_kln")
    mbar = MBAR(u_kln, N_K, verbose=True)
    return dict(mbar=mbar, test=test, x_n=x_kn, u_kn=u_kln)


@pytest.fixture()
def fresh_ho_u_kn():
    return make_ho().sample(N_K, mode="u_kn")[1]


def check_fe_against_analytic(results, test):
    fe = results["Delta_f"][0, 1:]
    dfe = results["dDelta_f"][0, 1:]
    fa = test.analytical_free_energies()
    assert_zscore_ok(fe, fa[1:] - fa[0], dfe)


# -----------------------------------------------------------------------------
# Test systems themselves
# -----------------------------------------------------------------------------


@pytest.mark.parametrize("system", list(SYSTEMS))
def test_analytical_properties_available(system):
    test = SYSTEMS[system]()
    test.analytical_means()
    test.analytical_variances()
    test.analytical_free_energies()
    test.analytical_entropies()
    for obs in ["position", "position^2", "RMS displacement", "potential energy"]:
        test.analytical_observable(observable=obs)


@pytest.mark.parametrize("system", list(SYSTEMS))
@pytest.mark.parametrize(
    "counts", [[5, 6, 7, 8], [5, 5, 5, 5], [1, 1, 1, 1], [10, 0, 8, 0]]
)
def test_sampling_modes(system, counts):
    test = SYSTEMS[system]()
    x_n, u_kn, N_k, s_n = test.sample(counts, mode="u_kn")
    assert u_kn.shape == (4, int(np.sum(counts)))
    x_kn, u_kln, N_k = test.sample(counts, mode="u_kln")
    assert u_kln.shape == (4, 4, int(np.max(counts)))


# -----------------------------------------------------------------------------
# Free energies
# -----------------------------------------------------------------------------


def test_ukln_input_layout(bundle_kln):
    """The (K, L, N_max) input layout must reproduce analytic free energies."""
    results = bundle_kln["mbar"].compute_free_energy_differences()
    check_fe_against_analytic(results, bundle_kln["test"])


@pytest.mark.parametrize(
    "uncertainty_method",
    [
        None,
        "approximate",
        "svd",
        "svd-ew",
        "bootstrap",
        pytest.param("waffles", marks=pytest.mark.xfail),
    ],
)
def test_free_energies(bundle, uncertainty_method):
    results = bundle["mbar"].compute_free_energy_differences(
        return_theta=True, uncertainty_method=uncertainty_method
    )
    check_fe_against_analytic(results, bundle["test"])


@pytest.mark.parametrize(
    "method",
    [
        "zeros",
        "mean-reduced-potential",
        "BAR",
        pytest.param("waffles", marks=pytest.mark.xfail),
    ],
)
def test_initialization_methods(fresh_ho_u_kn, method):
    mbar = MBAR(fresh_ho_u_kn, N_K, initialize=method, verbose=True)
    check_fe_against_analytic(mbar.compute_free_energy_differences(), make_ho())


@pytest.mark.xfail(strict=True)
@pytest.mark.parametrize("n_bootstrap", [None, -4, 0, 100.3])
def test_bad_bootstrap_counts(fresh_ho_u_kn, n_bootstrap):
    mbar = MBAR(fresh_ho_u_kn, N_K, verbose=True, n_bootstraps=n_bootstrap)
    mbar.compute_free_energy_differences(uncertainty_method="bootstrap")


@pytest.mark.xfail(raises=ParameterError)
def test_bad_initial_f_k(fresh_ho_u_kn):
    MBAR(fresh_ho_u_kn, N_K, initial_f_k=[0] * (N_K.size + 1))


def test_duplicate_state_detection(fresh_ho_u_kn, caplog):
    u_dup = np.append(fresh_ho_u_kn, fresh_ho_u_kn[[0], :], axis=0)
    N_dup = np.append(N_K, [0])
    mbar = MBAR(u_dup, N_dup, verbose=True)
    assert "likely to to be the same thermodynamic state" in caplog.text
    fe = mbar.compute_free_energy_differences()["Delta_f"]
    assert np.allclose(fe[0], fe[-1])


def test_x_kindices_equivalence(fresh_ho_u_kn):
    flat = np.concatenate([[k] * n for k, n in enumerate(N_K)]).astype(int)
    fe_default = MBAR(fresh_ho_u_kn, N_K).compute_free_energy_differences()["Delta_f"]
    fe_explicit = MBAR(fresh_ho_u_kn, N_K, x_kindices=flat).compute_free_energy_differences()[
        "Delta_f"
    ]
    assert np.allclose(fe_default, fe_explicit)


# -----------------------------------------------------------------------------
# Expectations
# -----------------------------------------------------------------------------


def test_expectations_position(bundle):
    results = bundle["mbar"].compute_expectations(bundle["x_n"])
    assert_zscore_ok(
        results["mu"],
        bundle["test"].analytical_observable("position"),
        results["sigma"],
    )


def test_expectations_position_differences(bundle):
    results = bundle["mbar"].compute_expectations(bundle["x_n"], output="differences")
    z = zscore_differences(
        results["mu"], results["sigma"], bundle["test"].analytical_observable("position")
    )
    assert_almost_equal(z / Z_SCALE, np.zeros(np.shape(z)), decimal=0)


def test_expectations_position_squared(bundle):
    results = bundle["mbar"].compute_expectations(bundle["x_n"] ** 2)
    assert_zscore_ok(
        results["mu"],
        bundle["test"].analytical_observable("position^2"),
        results["sigma"],
    )


def test_expectations_potential(bundle):
    results = bundle["mbar"].compute_expectations(bundle["u_kn"], state_dependent=True)
    assert_zscore_ok(
        results["mu"],
        bundle["test"].analytical_observable("potential energy"),
        results["sigma"],
    )


@pytest.mark.parametrize(
    "observable,state_dependent,sample_mode,single_dim,with_uxx",
    [
        ("position", False, "u_kln", False, False),
        ("position", False, "u_kln", False, True),
        ("position", False, "u_kn", False, False),
        ("position", False, "u_kn", False, True),
        ("position", False, "u_kn", True, False),
        ("potential energy", True, "u_kln", False, False),
        ("potential energy", True, "u_kln", False, True),
        ("potential energy", True, "u_kn", False, False),
        ("potential energy", True, "u_kn", False, True),
        ("potential energy", True, "u_kn", True, False),
    ],
)
def test_expectations_layout_matrix(
    bundle_ho, bundle_kln, observable, state_dependent, sample_mode, single_dim, with_uxx
):
    """Layout edge matrix: u_kln/u_kn/1-D inputs, state-(in)dependent observables."""
    payload = bundle_kln if sample_mode == "u_kln" else bundle_ho
    mbar, test = payload["mbar"], payload["test"]
    u_xxx = payload["u_kn"]
    obs = payload["u_kn"] if state_dependent else payload["x_n"]
    if single_dim:
        u_xxx = u_xxx[0]
    results = mbar.compute_expectations(
        obs,
        state_dependent=state_dependent,
        u_kn=u_xxx if with_uxx else None,
        return_theta=True,
    )
    assert_zscore_ok(
        results["mu"], test.analytical_observable(observable), results["sigma"]
    )


def test_multiple_expectations(bundle):
    mbar, test, x_n, u_kn = (
        bundle["mbar"],
        bundle["test"],
        bundle["x_n"],
        bundle["u_kn"],
    )
    A = np.vstack([x_n, x_n**2])
    state = 1
    results = mbar.compute_multiple_expectations(A, u_kn[state, :])
    assert_zscore_ok(
        results["mu"][0],
        test.analytical_observable("position")[state],
        results["sigma"][0],
    )
    assert_zscore_ok(
        results["mu"][1],
        test.analytical_observable("position^2")[state],
        results["sigma"][1],
    )


def test_multiple_expectations_3d(bundle_kln):
    mbar, test, x_kn, u_kln = (
        bundle_kln["mbar"],
        bundle_kln["test"],
        bundle_kln["x_n"],
        bundle_kln["u_kn"],
    )
    A = np.stack([x_kn, x_kn**2])
    state = 1
    results = mbar.compute_multiple_expectations(
        A, u_kln[:, state, :], compute_covariance=True, return_theta=True
    )
    assert "covariances" in results
    assert_zscore_ok(
        results["mu"][0],
        test.analytical_observable("position")[state],
        results["sigma"][0],
    )


def test_expectations_inner_runs(bundle):
    x_n, u_kn = bundle["x_n"], bundle["u_kn"]
    A_in = np.array([x_n, x_n**2, x_n**3])
    state_map = np.array([[0, 0], [1, 0], [2, 0], [2, 1]], int)
    bundle["mbar"].compute_expectations_inner(A_in, u_kn[:2, :], state_map)


# -----------------------------------------------------------------------------
# Entropy / enthalpy
# -----------------------------------------------------------------------------


def _check_entropy_enthalpy(payload, with_uxx=True):
    mbar, test, u_kn = payload["mbar"], payload["test"], payload["u_kn"]
    results = mbar.compute_entropy_and_enthalpy(u_kn if with_uxx else None, verbose=True)

    for key, analytic in [
        ("f", test.analytical_free_energies()),
        ("u", test.analytical_observable("potential energy")),
        ("s", test.analytical_entropies()),
    ]:
        z = zscore_differences(
            results[f"Delta_{key}"], results[f"dDelta_{key}"], analytic
        )
        assert_almost_equal(z / Z_SCALE, np.zeros(np.shape(z)), decimal=0)


def test_entropy_and_enthalpy(bundle):
    _check_entropy_enthalpy(bundle, with_uxx=True)


@pytest.mark.parametrize("as_kln,with_uxx", [(True, True), (True, False), (False, False)])
def test_entropy_and_enthalpy_edges(bundle_ho, bundle_kln, as_kln, with_uxx):
    _check_entropy_enthalpy(bundle_kln if as_kln else bundle_ho, with_uxx=with_uxx)


# -----------------------------------------------------------------------------
# Diagnostics
# -----------------------------------------------------------------------------


def test_effective_sample_number_bounds(bundle):
    N_eff = bundle["mbar"].compute_effective_sample_number()
    assert all(N_eff > N_K)
    assert all(N_eff < np.sum(N_K))


def test_overlap_identical_states_analytic():
    """K identical states must give O = ones/K, eigenvalues (1, 0, ..., 0)."""
    d = len(N_K)
    test = make_ho(O_k=2.0 * np.ones(d), K_k=0.5 * np.ones(d))
    x_n, u_kn, _, _ = test.sample(100 * np.ones(d, dtype=int), mode="u_kn")
    mbar = MBAR(u_kn, 100 * np.ones(d, dtype=int))

    results = mbar.compute_overlap()
    assert_almost_equal(results["matrix"], np.ones([d, d]) / d, decimal=PRECISION)
    ref_eig = np.zeros(d)
    ref_eig[0] = 1.0
    assert_almost_equal(np.real(results["eigenvalues"]), ref_eig, decimal=PRECISION)
    assert_almost_equal(np.real(results["scalar"]), 1.0, decimal=PRECISION)


def test_overlap_stochastic(bundle):
    results = bundle["mbar"].compute_overlap()
    assert isinstance(float(np.real(results["scalar"])), float)
    sumrows = np.sum(results["matrix"], axis=1)
    assert_almost_equal(sumrows, np.ones(np.shape(sumrows)), decimal=PRECISION)
    assert_almost_equal(np.real(results["eigenvalues"][0]), 1.0, decimal=PRECISION)


def test_overlap_spectrum_matches_nonsymmetric_eig():
    """The eigvalsh similarity route (spectrum of D^1/2 G D^1/2) must equal
    the direct nonsymmetric eigvals of O = G diag(N_k) — including with an
    empty state, where both forms carry an exact zero eigenvalue."""
    d = len(N_K)
    test = make_ho()
    N_k = np.array(N_K, dtype=int).copy()
    N_k[1] = 0  # empty state: zero column in O, zero row+column in the sym form
    x_n, u_kn, _, _ = test.sample(N_k, mode="u_kn")
    mbar = MBAR(u_kn, N_k)

    results = mbar.compute_overlap()
    direct = np.linalg.eigvals(results["matrix"])
    assert np.max(np.abs(np.imag(direct))) < 1e-10
    assert_almost_equal(
        np.sort(np.real(direct))[::-1], results["eigenvalues"], decimal=10
    )
    assert np.min(np.abs(results["eigenvalues"])) < 1e-12  # the empty state


def test_weights_column_normalized(bundle):
    W = bundle["mbar"].weights()
    assert_almost_equal(np.sum(W, axis=0), np.ones(W.shape[1]), decimal=PRECISION)


def test_covariance_of_sums_runs(bundle_kln):
    mbar = bundle_kln["mbar"]
    theta = mbar.compute_free_energy_differences(return_theta=True)["Theta"]
    mbar.compute_covariance_of_sums(theta, 1, np.array([1, -1]))


# -----------------------------------------------------------------------------
# Perturbed free energies
# -----------------------------------------------------------------------------


@pytest.mark.parametrize(
    "system,mode,bad_n",
    [
        ("harmonic", "u_kn", False),
        ("exponential", "u_kn", False),
        ("harmonic", "u_kln", False),
        pytest.param("harmonic", "u_kn", True, marks=pytest.mark.xfail(strict=True)),
    ],
)
def test_perturbed_free_energies(system, mode, bad_n):
    """Free energies of never-sampled states from a 2-state MBAR."""
    test = SYSTEMS[system]()
    if mode == "u_kln":
        x, u, _ = test.sample(N_K, mode=mode)
        numN = max(N_K[:2]) - (1 if bad_n else 0)
        mslice = np.s_[:2, :2, :numN]
        pslice = np.s_[:2, 2:, :numN]
    else:
        x, u, _, _ = test.sample(N_K, mode=mode)
        numN = np.sum(N_K[:2]) - (1 if bad_n else 0)
        mslice = np.s_[:2, :numN]
        pslice = np.s_[2:, :numN]

    mbar = MBAR(u[mslice], N_K[:2])
    results = mbar.compute_perturbed_free_energies(u[pslice])
    fe = results["Delta_f"][0, 1:]
    dfe = results["dDelta_f"][0, 1:]
    fa = test.analytical_free_energies()[2:]
    assert_zscore_ok(fe, fa[1:] - fa[0], dfe)


# -----------------------------------------------------------------------------
# Bootstrap determinism
# -----------------------------------------------------------------------------


@pytest.mark.parametrize("n_bootstrap", [1, 100])
def test_bootstrap_deterministic_under_seed(fresh_ho_u_kn, n_bootstrap):
    """Same rseed must reproduce bootstrap results bit-for-bit, regardless of
    verbosity (the duplicate-state RNG draw happens either way)."""
    a = MBAR(fresh_ho_u_kn, N_K, verbose=True, n_bootstraps=n_bootstrap, rseed=814)
    ref = a.compute_free_energy_differences(uncertainty_method="bootstrap")

    b = MBAR(fresh_ho_u_kn, N_K, verbose=False, n_bootstraps=n_bootstrap, rseed=814)
    out = b.compute_free_energy_differences(uncertainty_method="bootstrap")

    np.testing.assert_equal(ref["Delta_f"], out["Delta_f"])
    np.testing.assert_equal(ref["dDelta_f"], out["dDelta_f"])


def test_covariance_of_sums_matches_bruteforce(bundle_kln):
    """The einsum vectorization must reproduce the reference's quadruple-loop
    semantics exactly (checked against a direct loop implementation)."""
    mbar = bundle_kln["mbar"]
    theta = mbar.compute_free_energy_differences(return_theta=True)["Theta"]
    K_chunk = 2
    a = np.array([0.7, -1.3])

    got = mbar.compute_covariance_of_sums(theta, K_chunk, a)

    var_ij = np.square(np.asarray(theta))
    n = len(a)
    d2 = np.zeros([K_chunk, K_chunk])
    for i in range(K_chunk):
        for j in range(K_chunk):
            for k in range(n):
                d2[i, j] += a[k] ** 2 * var_ij[i + k * K_chunk, j + k * K_chunk]
                for l in range(n):
                    d2[i, j] += (
                        a[k]
                        * a[l]
                        * (
                            -var_ij[i + k * K_chunk, i + l * K_chunk]
                            + var_ij[i + k * K_chunk, j + l * K_chunk]
                            + var_ij[j + k * K_chunk, i + l * K_chunk]
                            - var_ij[j + k * K_chunk, j + l * K_chunk]
                        )
                    )
    want = np.sqrt(d2)
    np.testing.assert_allclose(got, want, rtol=1e-12, equal_nan=True)


def test_streamed_expectations_match_materialized(bundle_ho, monkeypatch):
    """The chunked device-streamed augmented-expectations path (used at
    GB scale, where the N x (K+NL+S) host matrix cannot exist) must
    reproduce the materializing path's observables, free energies and
    covariances to near machine precision."""
    import pymbar_tpu.mbar as mbar_mod

    mbar = bundle_ho["mbar"]
    x_n = bundle_ho["x_n"]
    u_kn = bundle_ho["u_kn"]

    r_host = {}
    r_stream = {}
    for tag, patch in (("host", 2**62), ("stream", 0)):
        monkeypatch.setattr(mbar_mod, "_AUG_STREAM_BYTES", patch)
        out = {}
        out["exp"] = mbar.compute_expectations(x_n, return_theta=True)
        out["exp_diff"] = mbar.compute_expectations(x_n, output="differences")
        out["exp2"] = mbar.compute_expectations(x_n**2)
        out["mult"] = mbar.compute_multiple_expectations(
            np.stack([x_n, x_n**2]), u_kn[0], compute_covariance=True
        )
        out["pert"] = mbar.compute_perturbed_free_energies(u_kn + 0.3)
        out["ent"] = mbar.compute_entropy_and_enthalpy(u_kn)
        (r_host if tag == "host" else r_stream).update(out)

    for key in r_host:
        for field, val in r_host[key].items():
            np.testing.assert_allclose(
                r_stream[key][field],
                val,
                rtol=1e-8,
                atol=1e-10,
                err_msg=f"{key}.{field} streamed != materialized",
            )


def test_streamed_bootstrap_expectations_match_materialized(monkeypatch):
    """Bootstrap uncertainties of expectations through the streamed path
    (counts-weighted pass-A per replicate, no resampled matrix) must
    reproduce the materializing branch's bootstrapped observables and
    replicate free energies given identical rints/f_k_boots."""
    import pymbar_tpu.mbar as mbar_mod

    test = make_ho()
    x_n, u_kn, N_k_out, s_n = test.sample([400, 300, 350, 250], mode="u_kn", seed=9)
    mbar = MBAR(u_kn, np.array([400, 300, 350, 250]), n_bootstraps=8, rseed=31)

    results = {}
    for tag, patch in (("host", 2**62), ("stream", 0)):
        monkeypatch.setattr(mbar_mod, "_AUG_STREAM_BYTES", patch)
        out = {}
        out["exp"] = mbar.compute_expectations(
            x_n, uncertainty_method="bootstrap"
        )
        out["pert"] = mbar.compute_perturbed_free_energies(
            u_kn + 0.3, uncertainty_method="bootstrap"
        )
        out["ent"] = mbar.compute_entropy_and_enthalpy(
            u_kn, uncertainty_method="bootstrap"
        )
        results[tag] = out

    for key in results["host"]:
        for field, val in results["host"][key].items():
            np.testing.assert_allclose(
                results["stream"][key][field],
                val,
                rtol=1e-7,
                atol=1e-9,
                err_msg=f"{key}.{field} streamed-bootstrap != materialized",
            )


def test_device_scan_expectations_match_host_chunked(monkeypatch):
    """With a device-resident u_kn and small NL/n_obs, pass A/B run as one
    fori_loop dispatch (_aug_pass_a_scan/_aug_pass_b_scan); results must
    match the host-chunked streaming form exactly."""
    import jax.numpy as jnp

    import pymbar_tpu.mbar as mbar_mod

    test = make_ho()
    x_n, u_kn, N_k_out, s_n = test.sample([300, 250, 280, 270], mode="u_kn", seed=6)
    N_k = np.array([300, 250, 280, 270])
    monkeypatch.setattr(mbar_mod, "_AUG_STREAM_BYTES", 0)

    m_host = MBAR(u_kn, N_k, n_bootstraps=5, rseed=3)
    m_dev = MBAR(u_kn, N_k, n_bootstraps=5, rseed=3)
    m_dev.u_kn = jnp.asarray(m_dev.u_kn)  # device-resident matrix

    u_pert = u_kn[:2] + 0.3
    for kwargs in (
        dict(),
        dict(uncertainty_method="bootstrap"),
        dict(compute_uncertainty=False),
    ):
        r_h = m_host.compute_perturbed_free_energies(u_pert, **kwargs)
        r_d = m_dev.compute_perturbed_free_energies(u_pert, **kwargs)
        for field in r_h:
            np.testing.assert_allclose(
                r_d[field], r_h[field], rtol=1e-9, atol=1e-11,
                err_msg=f"{field} device-scan != host-chunked ({kwargs})",
            )

    A_in = np.vstack([x_n, x_n**2])
    r_h = m_host.compute_multiple_expectations(A_in, u_kn[0], compute_covariance=True)
    r_d = m_dev.compute_multiple_expectations(A_in, u_kn[0], compute_covariance=True)
    for field in r_h:
        np.testing.assert_allclose(
            r_d[field], r_h[field], rtol=1e-9, atol=1e-11,
            err_msg=f"multiple.{field} device-scan != host-chunked",
        )


def test_theta_lowrank_matches_dense():
    """The rank-nnz svd-ew covariance (K-sized eigh) must agree with the
    dense eigh+pinv path to spectral roundoff, on an actual augmented
    MBAR Gram (including zero-sample states) and with row restriction."""
    test = make_ho()
    x_n, u_kn, N_k_out, s_n = test.sample([200, 150, 0, 180], mode="u_kn", seed=31)
    N_k = np.array([200, 150, 0, 180])
    m = MBAR(u_kn, N_k)
    K, N = m.K, m.N
    # augmented Gram exactly as the streamed path builds it: [W0; WL; WS]
    W0 = np.asarray(m.weights())  # (N, K), columns normalized
    logw_n = -np.asarray(
        m._computeUnnormalizedLogWeights(np.asarray(u_kn[1]) + 0.25)
    )
    WL = np.exp(-logw_n - np.asarray(u_kn[1]) - 0.25)
    WL = WL / WL.sum()
    A = x_n - x_n.min() + 0.1
    WS = A * WL
    WS = WS / WS.sum()
    Waug = np.concatenate([W0.T, WL[None], WS[None]], axis=0)  # (K+2, N)
    gram = Waug @ Waug.T
    N_aug = np.concatenate([N_k.astype(float), [0.0, 0.0]])

    dense = MBAR._theta_svd_ew_from_gram(gram, N_aug)
    lowrank = MBAR._theta_svd_ew_lowrank(gram, N_aug)
    scale = np.max(np.abs(dense))
    np.testing.assert_allclose(lowrank, dense, rtol=1e-8, atol=1e-12 * scale)

    rows = np.array([0, 2, K, K + 1])
    sub = MBAR._theta_svd_ew_lowrank(gram, N_aug, rows=rows)
    np.testing.assert_allclose(
        sub, dense[np.ix_(rows, rows)], rtol=1e-8, atol=1e-12 * scale
    )


def test_structured_alias_gram_matches_unstructured(monkeypatch):
    """The structured aliased augmented Gram (three K x K Grams + diagonal
    scalings, mbar._aug_b_struct_body) must reproduce the unstructured
    (K+NL+S)^2 streamed Gram: same Theta-derived sigmas on identical
    inputs, both in the host-chunked and the device-scan form."""
    import jax.numpy as jnp

    import pymbar_tpu.mbar as mbar_mod

    test = make_ho()
    x_n, u_kn, N_k_out, s_n = test.sample([300, 250, 280, 270], mode="u_kn", seed=21)
    N_k = np.array([300, 250, 280, 270])
    monkeypatch.setattr(mbar_mod, "_AUG_STREAM_BYTES", 0)

    for resident in (False, True):
        m = MBAR(u_kn, N_k, rseed=3)
        if resident:
            m.u_kn = jnp.asarray(m.u_kn)
        results = {}
        for flag in (True, False):
            monkeypatch.setattr(mbar_mod, "_STRUCT_AUG_GRAM", flag)
            results[flag] = m.compute_expectations(x_n, return_theta=True)
        for field in results[True]:
            np.testing.assert_allclose(
                results[True][field], results[False][field],
                rtol=1e-10, atol=1e-12,
                err_msg=f"{field} structured != unstructured (resident={resident})",
            )


def test_diag_struct_gram_matches_unstructured(monkeypatch):
    """The diag-mode structured Gram (pseudo-state s = observable row s x
    extra state s, entropy/enthalpy's layout) must reproduce the
    unstructured (3K)^2 streamed Gram through the public
    compute_entropy_and_enthalpy front door."""
    import pymbar_tpu.mbar as mbar_mod

    test = make_ho()
    x_n, u_kn, N_k_out, s_n = test.sample([300, 250, 280, 270], mode="u_kn", seed=23)
    N_k = np.array([300, 250, 280, 270])
    monkeypatch.setattr(mbar_mod, "_AUG_STREAM_BYTES", 0)

    m = MBAR(u_kn, N_k)
    results = {}
    for flag in (True, False):
        monkeypatch.setattr(mbar_mod, "_STRUCT_AUG_GRAM", flag)
        results[flag] = m.compute_entropy_and_enthalpy(uncertainty_method="svd-ew")
    for field in results[True]:
        np.testing.assert_allclose(
            results[True][field], results[False][field],
            rtol=1e-10, atol=1e-12,
            err_msg=f"{field} diag-structured != unstructured",
        )


def test_streamed_expectations_f32_compute_floor(monkeypatch):
    """The streamed expectations path under the TPU compute policy
    (f32 Grams; forced here by patching on_tpu) must stay within the f32
    floor of the f64 materializing branch — the sigma tolerance mirrors
    the round-3 TPU drive gate (2e-3 relative; TPU-measured 2e-4 after
    the precision=HIGHEST fix, 11% before it)."""
    import pymbar_tpu.config as cfg
    import pymbar_tpu.mbar as mbar_mod

    test = make_ho()
    x_n, u_kn, N_k_out, s_n = test.sample([400, 350, 380, 370], mode="u_kn", seed=11)
    N_k = np.array([400, 350, 380, 370])
    m = MBAR(u_kn, N_k)

    monkeypatch.setattr(mbar_mod, "_AUG_STREAM_BYTES", 0)
    monkeypatch.setattr(cfg, "on_tpu", lambda: True)
    ex32 = m.compute_expectations(x_n)
    monkeypatch.setattr(cfg, "on_tpu", lambda: False)
    monkeypatch.setattr(mbar_mod, "_AUG_STREAM_BYTES", 1 << 62)
    ex64 = m.compute_expectations(x_n)

    np.testing.assert_allclose(ex32["mu"], ex64["mu"], rtol=1e-6, atol=1e-9)
    rel = np.max(np.abs(ex32["sigma"] - ex64["sigma"]) / ex64["sigma"])
    assert rel < 2e-3, rel


def test_device_theta_pipeline_matches_host(monkeypatch):
    """Under the TPU compute policy (on_tpu patched True) the Theta
    pipeline stays a device-typed array end to end — struct-Gram assembly
    (_assemble_struct_gram_dev), the rank-nnz lowrank covariance's device
    branch, and the device covariance sandwiches.  K is chosen so
    msize = 3K >= 1024, i.e. the lowrank DEVICE branch actually runs
    (small-K tests fall through to the dense host path).  Sigmas must
    agree with the all-numpy f64 flow within the f32-Gram compute floor."""
    import pymbar_tpu.config as cfg
    import pymbar_tpu.mbar as mbar_mod

    from pymbar_tpu.testsystems import HarmonicOscillatorsTestCase

    K = 350
    test = HarmonicOscillatorsTestCase(
        O_k=np.linspace(0.0, 2.0, K), K_k=np.linspace(1.0, 3.0, K)
    )
    x_n, u_kn, N_k_out, s_n = test.sample(N_k=[40] * K, mode="u_kn", seed=29)
    N_k = np.full(K, 40)
    m = MBAR(u_kn, N_k)

    monkeypatch.setattr(mbar_mod, "_AUG_STREAM_BYTES", 0)
    monkeypatch.setattr(cfg, "on_tpu", lambda: True)
    ex_dev = m.compute_expectations(x_n)
    ee_dev = m.compute_entropy_and_enthalpy(uncertainty_method="svd-ew")
    monkeypatch.setattr(cfg, "on_tpu", lambda: False)
    ex_host = m.compute_expectations(x_n)
    ee_host = m.compute_entropy_and_enthalpy(uncertainty_method="svd-ew")

    np.testing.assert_allclose(ex_dev["mu"], ex_host["mu"], rtol=1e-6, atol=1e-9)
    rel = np.max(np.abs(ex_dev["sigma"] - ex_host["sigma"]) / ex_host["sigma"])
    assert rel < 2e-3, rel
    for field in ("Delta_f", "Delta_u", "Delta_s"):
        np.testing.assert_allclose(
            ee_dev[field], ee_host[field], rtol=1e-6, atol=1e-8,
            err_msg=f"entropy.{field} device != host",
        )
    for field in ("dDelta_f", "dDelta_u", "dDelta_s"):
        denom = np.abs(ee_host[field]) + 1e-4 * np.max(np.abs(ee_host[field]))
        rel = np.max(np.abs(ee_dev[field] - ee_host[field]) / denom)
        assert rel < 5e-3, (field, rel)


def test_aliased_observable_entropy_matches_host(monkeypatch):
    """compute_entropy_and_enthalpy with a device-resident u_kn must take
    the aliased-observable streamed path (no host copy of the matrix, the
    positivity shift applied chunkwise on device) and agree with the host
    flow — including bootstrap uncertainties (the counts-weighted pass-A
    with device-built observable chunks)."""
    import jax.numpy as jnp

    import pymbar_tpu.mbar as mbar_mod
    from pymbar_tpu.testsystems import HarmonicOscillatorsTestCase

    K = 12
    test = HarmonicOscillatorsTestCase(
        O_k=np.linspace(0.0, 2.0, K), K_k=np.linspace(1.0, 3.0, K)
    )
    x_n, u_kn, N_k_out, s_n = test.sample(N_k=[150] * K, mode="u_kn", seed=5)
    N_k = np.full(K, 150)
    monkeypatch.setattr(mbar_mod, "_AUG_STREAM_BYTES", 0)

    for method in ("svd-ew", "bootstrap"):
        nb = 6 if method == "bootstrap" else 0
        m_host = MBAR(u_kn, N_k, n_bootstraps=nb, rseed=9)
        m_dev = MBAR(u_kn, N_k, n_bootstraps=nb, rseed=9)
        m_dev.u_kn = jnp.asarray(m_dev.u_kn)
        r_h = m_host.compute_entropy_and_enthalpy(uncertainty_method=method)
        r_d = m_dev.compute_entropy_and_enthalpy(uncertainty_method=method)
        for field in r_h:
            np.testing.assert_allclose(
                np.asarray(r_d[field]), r_h[field], rtol=1e-9, atol=1e-11,
                err_msg=f"entropy.{field} aliased != host ({method})",
            )


def test_device_scan_alias_compute_expectations(monkeypatch):
    """compute_expectations(x_n) passes u_ln = self.u_kn (the alias): with a
    device-resident matrix the scan path must reuse the SAME buffer (no
    host pull, no second copy) and match the host-chunked form."""
    import jax.numpy as jnp

    import pymbar_tpu.mbar as mbar_mod

    test = make_ho()
    x_n, u_kn, N_k_out, s_n = test.sample([300, 250, 280, 270], mode="u_kn", seed=12)
    N_k = np.array([300, 250, 280, 270])
    monkeypatch.setattr(mbar_mod, "_AUG_STREAM_BYTES", 0)

    m_host = MBAR(u_kn, N_k, n_bootstraps=4, rseed=8)
    m_dev = MBAR(u_kn, N_k, n_bootstraps=4, rseed=8)
    m_dev.u_kn = jnp.asarray(m_dev.u_kn)

    for kwargs in (
        dict(return_theta=True),
        dict(uncertainty_method="bootstrap"),
        dict(output="differences"),
    ):
        r_h = m_host.compute_expectations(x_n, **kwargs)
        r_d = m_dev.compute_expectations(x_n, **kwargs)
        for field in r_h:
            np.testing.assert_allclose(
                r_d[field], r_h[field], rtol=1e-9, atol=1e-11,
                err_msg=f"expectations.{field} alias-scan != host ({kwargs})",
            )


def test_row_select_gather_preserves_nonfinite():
    """_row_select's one-hot-matmul gather must reproduce x[idx] exactly,
    INCLUDING non-finite entries: 0 * inf = NaN would otherwise poison the
    matmul, and +/-inf rows are legitimate (hard-wall states, log of a
    zero observable).  Checked against numpy fancy indexing."""
    import pymbar_tpu.mbar as mbar_mod

    rng = np.random.default_rng(7)
    x = rng.standard_normal((6, 9))
    x[1, 3] = -np.inf
    x[2, 0] = np.inf
    x[4, 7] = np.nan
    x[5, :] = -np.inf
    for idx in (
        np.array([1, 1, 4, 2, 5, 0]),
        np.array([5, 5, 5]),
        np.array([3, 0]),  # finite-only rows through the same path
    ):
        got = np.asarray(
            mbar_mod._row_select(x, idx, "gather", idx.size)
        )
        np.testing.assert_array_equal(got, x[idx])


def test_streamed_expectations_with_zero_observable(monkeypatch):
    """End-to-end: streamed augmented expectations where the observable has
    exact zeros (logA rows contain -inf after the shift) must match the
    materializing path — exercises the non-finite-safe row gather."""
    import pymbar_tpu.mbar as mbar_mod

    test = make_ho()
    x_n, u_kn, N_k_out, s_n = test.sample([250, 220, 240, 230], mode="u_kn", seed=5)
    N_k = np.array([250, 220, 240, 230])
    # observable with exact zeros and sign changes
    a_n = np.where(np.abs(x_n) < 0.5, 0.0, x_n)
    mbar = MBAR(u_kn, N_k)

    r = {}
    for tag, patch in (("host", 2**62), ("stream", 0)):
        monkeypatch.setattr(mbar_mod, "_AUG_STREAM_BYTES", patch)
        r[tag] = mbar.compute_expectations(a_n)
    for field in r["host"]:
        np.testing.assert_allclose(
            r["stream"][field], r["host"][field], rtol=1e-9, atol=1e-11,
            err_msg=f"expectations.{field} streamed != materialized (zeros)",
        )


def test_entropy_sigma_dev_transport():
    """The device entropy-sigma helper (block algebra on the (2K, 2K)
    augmented Theta + f32 transport) must reproduce the host branch's
    3K x 3K assembly + _ErrorOfDifferences to f32 rounding (<2e-7
    relative) — the canary that keeps the f32 tunnel transport honest
    (VERDICT r4 item 4)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(12)
    K = 32
    X = rng.normal(size=(2 * K, 2 * K + 8))
    Th2 = (X @ X.T) * 1e-4  # SPD, sigma-scale magnitudes
    a = rng.random(K) + 0.5

    sf, su, ss, _mins = MBAR._entropy_sigmas_dev(
        jnp.asarray(Th2), jnp.asarray(a), jnp.asarray(-1e-10)
    )

    # host reference: the 3K assembly exactly as the host branch builds it
    diag = np.ones(3 * K)
    diag[:K] = diag[K : 2 * K] = a
    T = np.zeros((3 * K, 3 * K))
    T[: 2 * K, : 2 * K] = Th2
    T[2 * K :, :] = T[K : 2 * K, :]
    T[:, 2 * K :] = T[:, K : 2 * K]
    T = diag[:, None] * T * diag[None, :]

    def err_of_diff(cov):
        d = cov.diagonal()
        return np.sqrt(np.maximum(d + np.vstack(d) - 2 * cov, 0.0))

    covf = T[2 * K :, 2 * K :]
    covu = (
        T[:K, :K] + T[K : 2 * K, K : 2 * K]
        - T[:K, K : 2 * K] - T[K : 2 * K, :K]
    )
    covs = (
        covu + covf + T[:K, 2 * K :] + T[2 * K :, :K]
        - T[K : 2 * K, 2 * K :] - T[2 * K :, K : 2 * K]
    )
    for dev, host in ((sf, covf), (su, covu), (ss, covs)):
        got = MBAR._unpack_sigma_triu(dev, K)  # packed-triangle transport
        ref = err_of_diff(host)
        assert np.allclose(got, got.T), "unpacked sigma not symmetric"
        scale = np.maximum(np.abs(ref), np.max(ref) * 1e-3)
        rel = np.max(np.abs(got - ref) / scale)
        assert rel < 2e-7, rel


def test_from_solution_matches_fresh():
    """MBAR.from_solution (the warm-start constructor: no solver stage) must
    reproduce a freshly solved object's results across the compute surfaces
    — this is the pin that keeps warm-started objects (checkpoint resume,
    bench.py's full-answer section) honest against constructor invariants."""
    test = make_ho()
    x_n, u_kn, N_k_out, s_n = test.sample([120, 220, 0, 180], mode="u_kn", seed=3)
    N_k = np.array([120, 220, 0, 180])
    fresh = MBAR(u_kn, N_k)
    warm = MBAR.from_solution(u_kn, N_k, fresh.f_k)

    np.testing.assert_array_equal(warm.f_k, fresh.f_k)
    r_f = fresh.compute_free_energy_differences()
    r_w = warm.compute_free_energy_differences()
    np.testing.assert_allclose(r_w["Delta_f"], r_f["Delta_f"], rtol=0, atol=1e-14)
    np.testing.assert_allclose(r_w["dDelta_f"], r_f["dDelta_f"], rtol=0, atol=1e-14)

    e_f = fresh.compute_expectations(x_n)
    e_w = warm.compute_expectations(x_n)
    np.testing.assert_allclose(e_w["mu"], e_f["mu"], rtol=0, atol=1e-14)
    np.testing.assert_allclose(e_w["sigma"], e_f["sigma"], rtol=0, atol=1e-14)

    o_f = fresh.compute_overlap()
    o_w = warm.compute_overlap()
    np.testing.assert_allclose(o_w["matrix"], o_f["matrix"], rtol=0, atol=1e-14)
    np.testing.assert_allclose(
        warm.compute_effective_sample_number(),
        fresh.compute_effective_sample_number(), rtol=0, atol=1e-12,
    )

    ent_f = fresh.compute_entropy_and_enthalpy()
    ent_w = warm.compute_entropy_and_enthalpy()
    np.testing.assert_allclose(ent_w["Delta_s"], ent_f["Delta_s"], rtol=0, atol=1e-14)

    # theta through the production streamed route agrees too
    np.testing.assert_allclose(
        np.asarray(warm._compute_theta_streamed()),
        np.asarray(fresh._compute_theta_streamed()), rtol=0, atol=1e-14,
    )

    # and a device-resident u_kn is stored without a host round-trip
    import jax.numpy as jnp

    u_dev = jnp.asarray(u_kn)
    warm_dev = MBAR.from_solution(u_dev, N_k, fresh.f_k)
    assert warm_dev.u_kn is u_dev
    r_d = warm_dev.compute_free_energy_differences()
    np.testing.assert_allclose(r_d["Delta_f"], r_f["Delta_f"], rtol=0, atol=1e-13)


def test_from_solution_validates():
    test = make_ho()
    _x, u_kn, _nk, _s = test.sample([50, 60, 40, 30], mode="u_kn", seed=4)
    N_k = np.array([50, 60, 40, 30])
    with pytest.raises(ParameterError):
        MBAR.from_solution(u_kn, N_k[:-1], np.zeros(4))
    with pytest.raises(ParameterError):
        MBAR.from_solution(u_kn, N_k, np.zeros(5))


def test_from_solution_verbose_dup_scan():
    """A verbose from_solution runs the same duplicate-state scan as a
    verbose fresh construction (reference mbar.py:279-317), so identical
    states zero their dDelta entries either way; non-verbose stays empty."""
    test = make_ho()
    _x, u_kn, _nk, _s = test.sample([200, 150, 250, 100], mode="u_kn", seed=9)
    N_k = np.array([200, 150, 250, 100])
    # duplicate the last state as an extra zero-sample state
    u_dup = np.vstack([u_kn, u_kn[-1:]])
    N_dup = np.concatenate([N_k, [0]])

    fresh = MBAR(u_dup, N_dup, verbose=True)
    assert [4, 3] in fresh.samestates and [3, 4] in fresh.samestates

    warm = MBAR.from_solution(u_dup, N_dup, fresh.f_k, verbose=True)
    assert [4, 3] in warm.samestates and [3, 4] in warm.samestates
    r_f = fresh.compute_free_energy_differences()
    r_w = warm.compute_free_energy_differences()
    np.testing.assert_allclose(r_w["dDelta_f"], r_f["dDelta_f"], rtol=0, atol=1e-14)
    assert r_w["dDelta_f"][3, 4] == 0.0

    quiet = MBAR.from_solution(u_dup, N_dup, fresh.f_k)
    assert quiet.samestates == []


def test_permuted_state_map_skips_alias_fast_path(monkeypatch):
    """compute_expectations_inner with A_n = u_ln = the device-resident
    u_kn and a PERMUTED state_map[0] must NOT take the aliased diagmul
    fast path (which pairs observable row s with extra state s
    positionally): the gate requires the identity map, so the permuted
    call routes through the generic path and matches the materializing
    reference route."""
    import jax.numpy as jnp

    import pymbar_tpu.mbar as mbar_mod

    test = make_ho()
    _x, u_kn, _nk, _s = test.sample([300, 250, 280, 270], mode="u_kn", seed=31)
    N_k = np.array([300, 250, 280, 270])
    K = 4
    perm = np.array([2, 0, 3, 1])
    state_map = np.vstack([perm, np.arange(K)])

    m = MBAR(u_kn, N_k, rseed=5)
    monkeypatch.setattr(mbar_mod, "_AUG_STREAM_BYTES", 1 << 62)
    ref = m.compute_expectations_inner(m.u_kn, m.u_kn, state_map)

    m_dev = MBAR(u_kn, N_k, rseed=5)
    m_dev.u_kn = jnp.asarray(m_dev.u_kn)
    monkeypatch.setattr(mbar_mod, "_AUG_STREAM_BYTES", 0)
    got = m_dev.compute_expectations_inner(m_dev.u_kn, m_dev.u_kn, state_map)

    np.testing.assert_allclose(
        got["observables"], ref["observables"], rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(got["f"], ref["f"], rtol=1e-8, atol=1e-10)

    # the identity map still rides the fast path and agrees too
    id_map = np.vstack([np.arange(K), np.arange(K)])
    monkeypatch.setattr(mbar_mod, "_AUG_STREAM_BYTES", 1 << 62)
    ref_id = m.compute_expectations_inner(m.u_kn, m.u_kn, id_map)
    monkeypatch.setattr(mbar_mod, "_AUG_STREAM_BYTES", 0)
    got_id = m_dev.compute_expectations_inner(m_dev.u_kn, m_dev.u_kn, id_map)
    np.testing.assert_allclose(
        got_id["observables"], ref_id["observables"], rtol=1e-8, atol=1e-10
    )


def test_init_with_device_matrix_matches_host():
    """MBAR.__init__ stores a device-resident (jax.Array) u_kn AS GIVEN —
    no host round-trip — and solves/computes identically to the
    host-matrix construction (the from_solution contract, now at the
    front door)."""
    import jax.numpy as jnp

    test = make_ho()
    x_n, u_kn, _nk, _s = test.sample([250, 200, 0, 150], mode="u_kn", seed=12)
    N_k = np.array([250, 200, 0, 150])
    host = MBAR(u_kn, N_k)
    dev = MBAR(jnp.asarray(u_kn), N_k)
    assert isinstance(dev.u_kn, jnp.ndarray)
    np.testing.assert_allclose(dev.f_k, host.f_k, rtol=0, atol=1e-10)
    r_h = host.compute_free_energy_differences()
    r_d = dev.compute_free_energy_differences()
    np.testing.assert_allclose(r_d["dDelta_f"], r_h["dDelta_f"], rtol=0, atol=1e-10)
    e_h = host.compute_expectations(x_n)
    e_d = dev.compute_expectations(x_n)
    np.testing.assert_allclose(e_d["sigma"], e_h["sigma"], rtol=0, atol=1e-10)
