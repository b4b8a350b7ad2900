"""Multi-chip sharding equivalence tests on the virtual 8-device CPU mesh.

The reference is single-device (SURVEY.md §2.8); the invariant our scaling
layer must satisfy is: sharded result == single-device result == analytic,
for any shard count (the TPU analog of the reference's determinism tests).
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_array_almost_equal

import jax
import jax.numpy as jnp

from helpers import N_K, make_ho
from pymbar_tpu import MBAR
from pymbar_tpu.ops.mbar_core import core_stats, mbar_w_nk_gram
from pymbar_tpu.parallel.sharding import (
    default_mesh,
    shard_u_kn,
    sharded_core_stats,
    sharded_gram,
    sharded_log_denominator,
    sharded_solve_mbar,
)


@pytest.fixture(scope="module")
def problem():
    test = make_ho()
    x_n, u_kn, N_k_out, s_n = test.sample([800, 500, 700, 600], mode="u_kn", seed=3)
    N_k = np.array([800, 500, 700, 600], dtype=np.float64)
    f_k = np.array([0.0, 0.1, -0.2, 0.3])
    return u_kn, N_k, f_k, test


@pytest.mark.parametrize("n_devices", [2, 4, 8])
def test_sharded_reductions_match_single_device(problem, n_devices):
    u_kn, N_k, f_k, _ = problem
    mesh = default_mesh(n_devices)
    u_sharded, n_pad = shard_u_kn(u_kn, mesh)

    u = jnp.asarray(u_kn)
    nk = jnp.asarray(N_k)
    fk = jnp.asarray(f_k)

    # log denominator: compare the unpadded prefix
    ld_sharded = np.asarray(sharded_log_denominator(u_sharded, N_k, f_k, mesh))
    from pymbar_tpu.ops.mbar_core import log_denominator_n

    ld_single = np.asarray(log_denominator_n(u, nk, fk))
    assert_allclose(ld_sharded[: u_kn.shape[1]], ld_single, rtol=1e-12)

    # fused stats (obj, grad, f_sci)
    obj_s, g_s, fs_s = sharded_core_stats(u_sharded, N_k, f_k, mesh)
    obj_1, g_1, fs_1 = core_stats(u, nk, fk)
    assert_allclose(float(obj_s), float(obj_1), rtol=1e-12)
    assert_allclose(np.asarray(g_s), np.asarray(g_1), rtol=1e-10, atol=1e-10)
    assert_allclose(np.asarray(fs_s), np.asarray(fs_1), rtol=1e-12)

    # Gram / colsum
    gram_s, col_s = sharded_gram(u_sharded, N_k, f_k, mesh)
    gram_1, col_1 = mbar_w_nk_gram(u, nk, fk)
    assert_allclose(np.asarray(gram_s), np.asarray(gram_1), rtol=1e-10, atol=1e-12)
    assert_allclose(np.asarray(col_s), np.asarray(col_1), rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("n_devices", [2, 8])
def test_sharded_solve_matches_mbar(problem, n_devices):
    u_kn, N_k, f_k, test = problem
    mesh = default_mesh(n_devices)

    f_sharded, info = sharded_solve_mbar(u_kn, N_k, mesh=mesh, tol=1e-12)
    assert info["success"]
    assert info["gnorm"] < 1e-6

    mbar = MBAR(u_kn, N_k.astype(int))
    assert_array_almost_equal(f_sharded, mbar.f_k, decimal=9)

    fa = test.analytical_free_energies()
    # statistical agreement with analytic truth
    assert np.max(np.abs(f_sharded - (fa - fa[0]))) < 0.2


def test_shard_padding_is_exact(problem):
    """+inf padding columns must contribute exactly zero."""
    u_kn, N_k, f_k, _ = problem
    mesh = default_mesh(8)
    # 2600 samples % 8 = 0; force padding by dropping one sample
    u_odd = u_kn[:, :-1]
    N_odd = N_k.copy()
    N_odd[-1] -= 1
    u_sharded, n_pad = shard_u_kn(u_odd, mesh)
    assert n_pad > 0

    obj_s, g_s, _ = sharded_core_stats(u_sharded, N_odd, f_k, mesh)

    from pymbar_tpu.ops.mbar_core import core_stats as single_stats

    obj_1, g_1, _ = single_stats(
        jnp.asarray(u_odd), jnp.asarray(N_odd), jnp.asarray(f_k)
    )
    assert_allclose(float(obj_s), float(obj_1), rtol=1e-12)
    assert_allclose(np.asarray(g_s), np.asarray(g_1), rtol=1e-10, atol=1e-10)


def test_mesh_device_count():
    assert len(jax.devices()) == 8, "conftest should provide 8 virtual devices"


# -----------------------------------------------------------------------------
# 2-D (K x N) mesh
# -----------------------------------------------------------------------------


@pytest.mark.parametrize("shape", [(2, 4), (4, 2)])
def test_2d_core_stats_match_single_device(problem, shape):
    from pymbar_tpu.parallel.sharding import mesh_2d, shard_u_kn_2d, sharded2d_core_stats

    u_kn, N_k, f_k, _ = problem
    mesh = mesh_2d(*shape)
    # Pad check: 4 states over k_devices=2/4 and 2600 samples over n.
    u_sh, N_pad, f_pad, pads = shard_u_kn_2d(u_kn, N_k, f_k, mesh)

    obj_s, g_s, fs_s = sharded2d_core_stats(u_sh, N_pad, f_pad, mesh)
    obj_1, g_1, fs_1 = core_stats(
        jnp.asarray(u_kn), jnp.asarray(N_k), jnp.asarray(f_k)
    )
    K = u_kn.shape[0]
    assert_allclose(float(obj_s), float(obj_1), rtol=1e-12)
    assert_allclose(np.asarray(g_s)[:K], np.asarray(g_1), rtol=1e-10, atol=1e-10)
    assert_allclose(np.asarray(fs_s)[:K], np.asarray(fs_1), rtol=1e-12)


def test_2d_solve_matches_mbar(problem):
    from pymbar_tpu.parallel.sharding import mesh_2d, sharded2d_solve_mbar

    u_kn, N_k, f_k, test = problem
    mesh = mesh_2d(2, 4)
    f_2d, info = sharded2d_solve_mbar(u_kn, N_k, mesh=mesh, tol=1e-12, maxiter=500)
    assert info["success"]
    assert info["gnorm"] < 1e-6

    mbar = MBAR(u_kn, N_k.astype(int))
    assert_array_almost_equal(f_2d, mbar.f_k, decimal=9)


def test_sharded_solve_mbar_dd_matches_single_device():
    """dd sharded solve == single-device dd solve == analytic, pads exercised."""
    from pymbar_tpu.parallel.sharding import default_mesh, sharded_solve_mbar_dd
    from pymbar_tpu.solvers_large import solve_mbar_dd, split_u_kn_streamed

    rng = np.random.default_rng(33)
    K = 3
    O_k = np.array([0.0, 1.0, 2.0])
    k_spring = np.array([1.0, 2.0, 4.0])
    N_k = np.array([1501, 1201, 901])  # sum 3603: not divisible by 8 -> pads
    x = np.concatenate(
        [rng.normal(o, 1.0 / np.sqrt(s), n) for o, s, n in zip(O_k, k_spring, N_k)]
    )
    u_kn = 0.5 * k_spring[:, None] * (x[None, :] - O_k[:, None]) ** 2
    u_kn -= u_kn.min(axis=0, keepdims=True)
    uh, ul = split_u_kn_streamed(u_kn)

    f_single, info_s = solve_mbar_dd(uh, ul, N_k)
    mesh = default_mesh(8)
    f_shard, info = sharded_solve_mbar_dd(uh, ul, N_k, mesh=mesh)
    assert info["converged"]
    assert np.max(np.abs(f_shard - f_single)) < 5e-10

    f_true = -0.5 * np.log(2 * np.pi / k_spring)
    f_true -= f_true[0]
    assert np.max(np.abs(f_shard - f_true)) < 0.1  # statistical


def test_sharded_solve_mbar_dd_coarse_path(monkeypatch):
    """With the coarse subsample warm start forced on, both the sharded and
    single-device dd solvers take it (production large-N flow) and still
    agree with each other to dd precision."""
    from pymbar_tpu import solvers_large as sl
    from pymbar_tpu.parallel.sharding import default_mesh, sharded_solve_mbar_dd
    from pymbar_tpu.solvers_large import solve_mbar_dd, split_u_kn_streamed

    monkeypatch.setattr(sl, "COARSE_MIN_ELEMS", 1024)
    rng = np.random.default_rng(7)
    K = 8
    O_k = np.linspace(0.0, 2.0, K)
    k_spring = np.linspace(1.0, 3.0, K)
    N_k = np.full(K, 403)  # not divisible by 8 or 16: pads + gather subsample
    x = np.concatenate(
        [rng.normal(o, 1.0 / np.sqrt(s), n) for o, s, n in zip(O_k, k_spring, N_k)]
    )
    u_kn = 0.5 * k_spring[:, None] * (x[None, :] - O_k[:, None]) ** 2
    u_kn -= u_kn.min(axis=0, keepdims=True)
    uh, ul = split_u_kn_streamed(u_kn)

    f_single, info_s = solve_mbar_dd(uh, ul, N_k)
    assert info_s["f32_coarse_iterations"] > 0
    mesh = default_mesh(8)
    f_shard, info = sharded_solve_mbar_dd(uh, ul, N_k, mesh=mesh)
    assert info["f32_coarse_iterations"] > 0
    assert info["converged"]
    assert np.max(np.abs(f_shard - f_single)) < 5e-10


def test_mbar_class_mesh_front_door(problem):
    """MBAR(u_kn, N_k, mesh=...) on the 8-device mesh == single-device MBAR
    to 1e-10, including an empty state (solve_mbar_for_all_states
    semantics, reference mbar_solvers.py:977-1017)."""
    u_kn, N_k, f_k, test = problem
    # Insert an empty state between the sampled ones.
    K, N = u_kn.shape
    u_aug = np.insert(u_kn, 2, u_kn[1] + 0.7, axis=0)
    N_aug = np.insert(N_k.astype(int), 2, 0)

    mesh = default_mesh(8)
    m_sharded = MBAR(u_aug, N_aug, mesh=mesh)
    m_single = MBAR(u_aug, N_aug)
    assert np.max(np.abs(m_sharded.f_k - m_single.f_k)) < 1e-10

    # Downstream consumers see identical results.
    r_s = m_sharded.compute_free_energy_differences()
    r_1 = m_single.compute_free_energy_differences()
    assert_allclose(r_s["Delta_f"], r_1["Delta_f"], atol=1e-9)
    assert_allclose(r_s["dDelta_f"], r_1["dDelta_f"], atol=1e-8)


def test_mbar_class_mesh_auto(problem):
    """mesh='auto' resolves to the full visible mesh and solves correctly."""
    u_kn, N_k, f_k, test = problem
    m_auto = MBAR(u_kn, N_k.astype(int), mesh="auto")
    assert m_auto.mesh is not None
    m_single = MBAR(u_kn, N_k.astype(int))
    assert np.max(np.abs(m_auto.f_k - m_single.f_k)) < 1e-10


def test_mbar_class_mesh_with_protocol_warns(problem, caplog):
    """Explicit solver_protocol + mesh falls back to single-device solve."""
    import logging

    u_kn, N_k, f_k, test = problem
    with caplog.at_level(logging.WARNING, logger="pymbar_tpu.mbar"):
        m = MBAR(
            u_kn,
            N_k.astype(int),
            mesh=default_mesh(8),
            solver_protocol=(dict(method="adaptive"),),
        )
    assert m.mesh is None
    assert any("mesh is ignored" in r.message for r in caplog.records)


def test_sharded2d_wsum_dd_matches_single_device(problem):
    """2-D-mesh dd weight sums == single-device wsum reference exactly
    (pads on both axes exercised)."""
    from pymbar_tpu.ops.doubledouble import dd_from_f64, dd_to_f64
    from pymbar_tpu.ops.pallas_kernels import wsum_dd_ref
    from pymbar_tpu.parallel.sharding import (
        mesh_2d,
        shard_dd_planes_2d,
        sharded2d_wsum_dd,
    )

    u_kn, N_k, f_k, _ = problem
    # 4 states over kd=2 (no k pad) and 2599 samples over nd=4 (pads)
    u_odd = u_kn[:, :-1] - u_kn[:, :-1].min(axis=0, keepdims=True)
    N_odd = N_k.copy()
    N_odd[-1] -= 1
    uh, ul = dd_from_f64(jnp.asarray(u_odd))
    gh, gl = dd_from_f64(jnp.asarray(f_k + np.log(N_odd)))

    S_ref = np.asarray(dd_to_f64(*wsum_dd_ref(uh, ul, gh, gl)))

    mesh = mesh_2d(2, 4)
    uh_s, ul_s, N_pad, f_pad, pads = shard_dd_planes_2d(uh, ul, N_odd, f_k, mesh)
    gh_p = jnp.pad(gh, (0, len(N_pad) - len(N_odd)))
    gl_p = jnp.pad(gl, (0, len(N_pad) - len(N_odd)))
    Sh, Sl = sharded2d_wsum_dd(uh_s, ul_s, gh_p, gl_p, mesh)
    S_2d = np.asarray(dd_to_f64(Sh, Sl))[: len(N_odd)]
    assert np.max(np.abs(S_2d - S_ref) / np.maximum(S_ref, 1.0)) < 1e-12


def test_sharded2d_solve_dd_matches_1d(problem):
    """2-D dd solve == 1-D dd solve == f64 to the dd noise floor."""
    from pymbar_tpu.parallel.sharding import mesh_2d, sharded2d_solve_mbar_dd
    from pymbar_tpu.solvers_large import solve_mbar_dd, split_u_kn_streamed

    u_kn, N_k, f_k, test = problem
    u_pre = u_kn - u_kn.min(axis=0, keepdims=True)
    uh, ul = split_u_kn_streamed(u_pre)

    f_1d, info1 = solve_mbar_dd(uh, ul, N_k)
    mesh = mesh_2d(2, 4)
    f_2d, info2 = sharded2d_solve_mbar_dd(uh, ul, N_k, mesh=mesh)
    assert info2["converged"]
    assert np.max(np.abs(f_2d - f_1d)) < 5e-10

    fa = test.analytical_free_energies()
    assert np.max(np.abs(f_2d - (fa - fa[0]))) < 0.2  # statistical


def test_sharded2d_solve_dd_beyond_single_kernel_K():
    """K beyond the 2048 single-kernel limit, dd precision on the 2-D mesh
    (VERDICT r1 item 6).  Certified against true-f64 first-order conditions
    directly (a K=2304 iterative f64 reference solve needs a K^3
    factorization per iteration — minutes on CPU CI for no extra signal)."""
    from pymbar_tpu.ops.mbar_core import mbar_gradient, self_consistent_update
    from pymbar_tpu.parallel.sharding import mesh_2d, sharded2d_solve_mbar_dd
    from pymbar_tpu.solvers_large import split_u_kn_streamed

    rng = np.random.default_rng(44)
    K, npk = 2304, 4  # K > 2048
    O = np.linspace(0.0, 3.0, K)
    Kf = np.full(K, 2.0)
    x = np.repeat(O, npk) + rng.normal(0, 1 / np.sqrt(2.0), K * npk)
    u_kn = 0.5 * Kf[:, None] * (x[None, :] - O[:, None]) ** 2
    N_k = np.full(K, float(npk))
    u_pre = u_kn - u_kn.min(axis=0, keepdims=True)

    uh, ul = split_u_kn_streamed(u_pre)
    mesh = mesh_2d(4, 2)
    f_2d, info = sharded2d_solve_mbar_dd(uh, ul, N_k, mesh=mesh)
    assert info["converged"]
    assert info["gnorm"] < 1e-8

    # First-order conditions in true f64: gradient ~ 0 and SC fixed point.
    u = jnp.asarray(u_kn)
    nk = jnp.asarray(N_k)
    f = jnp.asarray(f_2d)
    g = np.asarray(mbar_gradient(u, nk, f))
    assert np.max(np.abs(g)) / npk < 1e-10  # per-sample gradient
    f_sc = np.array(self_consistent_update(u, nk, f))
    f_sc = f_sc - f_sc[0]
    assert np.max(np.abs(f_sc - f_2d)) < 1e-10


def test_sharded_fused_lognum_matches_ref():
    """Sharded fused lognum (pads + dd merge) == unsharded f64 logsumexp."""
    from scipy.special import logsumexp as lse

    from pymbar_tpu.ops.doubledouble import dd_from_f64
    from pymbar_tpu.parallel.sharding import (
        default_mesh,
        shard_dd_planes,
        sharded_fused_lognum_dd,
    )

    rng = np.random.default_rng(34)
    K, N = 5, 1003  # pads to 1008
    u64 = rng.normal(0, 3, (K, N)) + rng.normal(0, 2, (1, N))
    u64 -= u64.min()
    g64 = rng.normal(0, 1, K)
    uh, ul = dd_from_f64(jnp.asarray(u64))
    gh, gl = dd_from_f64(jnp.asarray(g64))
    ld64 = lse(g64[:, None] - u64, axis=0)
    m_k = jnp.asarray(np.max(-ld64[None, :] - u64, axis=1).astype(np.float32))
    ln64 = lse(-ld64[None, :] - u64, axis=1)

    mesh = default_mesh(8)
    uh_s, ul_s, _ = shard_dd_planes(uh, ul, mesh)
    # the fused pass recomputes logden internally from (gh, gl)
    lnh, lnl = sharded_fused_lognum_dd(uh_s, ul_s, gh, gl, m_k, mesh)
    got = np.asarray(lnh, np.float64) + np.asarray(lnl, np.float64)
    assert np.max(np.abs(got - ln64)) < 1e-10


def test_sharded2d_solve_dd_subsampled_warm_start():
    """N large enough to trigger the strided subsample (stride2 > 1) for
    both the 2-D phase-1 SC warm start and the chord Gram; answer must
    still match the single-device dd solve to dd precision."""
    from pymbar_tpu.parallel.sharding import mesh_2d, sharded2d_solve_mbar_dd
    from pymbar_tpu.solvers_large import solve_mbar_dd, split_u_kn_streamed

    rng = np.random.default_rng(8)
    K, npk = 8, 300  # N_cols = 2400 -> stride2 = clip(2400 // 256, 1, 16) = 9
    O = np.linspace(0.0, 2.0, K)
    Kf = np.linspace(1.0, 3.0, K)
    x = np.concatenate(
        [rng.normal(o, 1 / np.sqrt(s), npk) for o, s in zip(O, Kf)]
    )
    u_kn = 0.5 * Kf[:, None] * (x[None, :] - O[:, None]) ** 2
    N_k = np.full(K, float(npk))
    u_pre = u_kn - u_kn.min(axis=0, keepdims=True)
    uh, ul = split_u_kn_streamed(u_pre)

    f_1d, _ = solve_mbar_dd(uh, ul, N_k)
    mesh = mesh_2d(2, 4)
    f_2d, info = sharded2d_solve_mbar_dd(uh, ul, N_k, mesh=mesh)
    assert info["converged"]
    assert np.max(np.abs(f_2d - f_1d)) < 5e-10


def test_sharded_reductions_keep_high_energy_real_samples():
    """_is_pad_col must only flag ALL-row sentinels: a real sample with one
    clash-level row (u[0] huge) keeps its contributions in every sharded
    reduction (old row-0 test dropped it)."""
    rng = np.random.default_rng(12)
    K, N = 4, 160
    u_kn = rng.uniform(0.0, 5.0, (K, N))
    u_kn -= u_kn.min(axis=0, keepdims=True)
    u_kn[0, 7] = 1.0e12  # clash under state 0 only (f64 path)
    u_kn[:, 11] = 6.0e9 + rng.uniform(0, 1, K)  # clash under EVERY state:
    # huge but finite in f64 — must match the unsharded reductions, not be
    # silently classified as padding
    N_k = np.full(K, N / K)
    f_k = np.array([0.0, 0.1, -0.2, 0.3])

    mesh = default_mesh(8)
    u_sharded, _ = shard_u_kn(u_kn, mesh)
    obj_s, g_s, fs_s = sharded_core_stats(u_sharded, N_k, f_k, mesh)
    obj_1, g_1, fs_1 = core_stats(
        jnp.asarray(u_kn), jnp.asarray(N_k), jnp.asarray(f_k)
    )
    assert_allclose(float(obj_s), float(obj_1), rtol=1e-12)
    assert_allclose(np.asarray(g_s), np.asarray(g_1), rtol=1e-10, atol=1e-10)
    assert_allclose(np.asarray(fs_s), np.asarray(fs_1), rtol=1e-12)


# ---------------------------------------------------------------------------
# Bootstrap at the dd/mesh scale: replicates as counts-weighted polishes on
# the resident planes (VERDICT r2 item 1).  The gate: same seed => same
# resample stream => the dd/mesh bootstrap f_k_boots equal the plain
# single-device bootstrap's to solver tolerance.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def boot_problem():
    test = make_ho()
    x_n, u_kn, N_k_out, s_n = test.sample([400, 300, 350, 250], mode="u_kn", seed=11)
    return u_kn, np.array([400, 300, 350, 250], dtype=int)


def test_bootstrap_dd_protocol_matches_plain(boot_problem):
    """MBAR(solver_protocol='dd', n_bootstraps=B) rides the counts-weighted
    wsum path; same rseed must reproduce the default-protocol bootstrap's
    replicate free energies to solver tolerance."""
    u_kn, N_k = boot_problem
    B = 12
    m_plain = MBAR(u_kn, N_k, n_bootstraps=B, rseed=99)
    m_dd = MBAR(
        u_kn, N_k, n_bootstraps=B, rseed=99,
        solver_protocol=({"method": "dd"},),
    )
    # identical resample streams
    assert np.array_equal(m_plain.bootstrap_rints, m_dd.bootstrap_rints)
    assert_allclose(m_dd.f_k_boots, m_plain.f_k_boots, atol=5e-8, rtol=0)
    # and identical bootstrap uncertainties downstream
    s_plain = m_plain.compute_free_energy_differences(uncertainty_method="bootstrap")
    s_dd = m_dd.compute_free_energy_differences(uncertainty_method="bootstrap")
    assert_allclose(s_dd["dDelta_f"], s_plain["dDelta_f"], atol=1e-8, rtol=0)


def test_bootstrap_mesh_matches_plain(boot_problem):
    """MBAR(mesh=..., n_bootstraps=B): replicates solve on the sharded
    planes (sharded_bootstrap_polish_dd); same-seed equivalence vs the
    single-device bootstrap."""
    u_kn, N_k = boot_problem
    B = 12
    m_plain = MBAR(u_kn, N_k, n_bootstraps=B, rseed=42)
    m_mesh = MBAR(u_kn, N_k, n_bootstraps=B, rseed=42, mesh=default_mesh(8))
    assert np.array_equal(m_plain.bootstrap_rints, m_mesh.bootstrap_rints)
    assert_allclose(m_mesh.f_k, m_plain.f_k, atol=1e-9, rtol=0)
    assert_allclose(m_mesh.f_k_boots, m_plain.f_k_boots, atol=5e-8, rtol=0)


def test_bootstrap_mesh_empty_state_falls_back(boot_problem):
    """With an empty state the mesh bootstrap cannot take the counts route;
    the class falls back to per-replicate solves and still reproduces the
    single-device stream."""
    u_kn, N_k = boot_problem
    u_aug = np.insert(u_kn, 2, u_kn[1] + 0.7, axis=0)
    N_aug = np.insert(N_k, 2, 0)
    B = 6
    m_plain = MBAR(u_aug, N_aug, n_bootstraps=B, rseed=13)
    m_mesh = MBAR(u_aug, N_aug, n_bootstraps=B, rseed=13, mesh=default_mesh(8))
    assert_allclose(m_mesh.f_k_boots, m_plain.f_k_boots, atol=5e-7, rtol=0)


def test_sharded_weighted_wsum_matches_resample(problem):
    """sharded_wsum_dd with counts == unweighted wsum on the explicitly
    resampled matrix (exact reweighting identity), across shard counts."""
    from pymbar_tpu.ops.doubledouble import dd_from_f64, dd_to_f64
    from pymbar_tpu.ops.pallas_kernels import wsum_dd_ref
    from pymbar_tpu.parallel.sharding import shard_dd_planes, sharded_wsum_dd
    from jax.sharding import NamedSharding, PartitionSpec as P

    u_kn, N_k, f_k, _ = problem
    rng = np.random.default_rng(3)
    N = u_kn.shape[1]
    r = rng.integers(0, N, N)
    c = np.bincount(r, minlength=N).astype(np.float32)

    u_pre = u_kn - u_kn.min(axis=0, keepdims=True)
    uh = u_pre.astype(np.float32)
    ul = (u_pre - uh.astype(np.float64)).astype(np.float32)
    gh, gl = dd_from_f64(jnp.asarray(f_k + np.log(N_k)))

    # truth: unweighted wsum on the gathered resample
    ur = u_pre[:, r]
    urh = ur.astype(np.float32)
    url = (ur - urh.astype(np.float64)).astype(np.float32)
    Sh, Sl = wsum_dd_ref(jnp.asarray(urh), jnp.asarray(url), gh, gl)
    S_true = np.asarray(dd_to_f64(Sh, Sl))

    for n_dev in (2, 8):
        mesh = default_mesh(n_dev)
        uh_s, ul_s, n_pad = shard_dd_planes(uh, ul, mesh)
        c_pad = np.concatenate([c, np.zeros(n_pad, np.float32)])
        c_s = jax.device_put(c_pad, NamedSharding(mesh, P("n")))
        Th, Tl = sharded_wsum_dd(uh_s, ul_s, gh, gl, mesh, c=c_s)
        S_sh = np.asarray(dd_to_f64(Th, Tl))
        assert_allclose(S_sh, S_true, rtol=1e-12, atol=0)


def test_sharded_bootstrap_batched_matches_serial(boot_problem):
    """The batched mesh bootstrap (one shared dd-exp stream per shard +
    psum-merged matmul weight sums) must reproduce the serial per-replicate
    sharded polish to the dd noise floor — same counts, same planes, same
    frozen factor."""
    from pymbar_tpu.parallel.sharding import (
        shard_dd_planes,
        sharded_bootstrap_polish_dd,
        sharded_solve_mbar_dd,
    )
    from pymbar_tpu.solvers_large import host_split_planes

    u_kn, N_k = boot_problem
    uh, ul = host_split_planes(u_kn)
    mesh = default_mesh(4)
    f_k, info = sharded_solve_mbar_dd(uh, ul, N_k, mesh=mesh, return_state=True)
    uh_s, ul_s = info["planes"]

    rng = np.random.default_rng(21)
    N = u_kn.shape[1]
    B = 5
    counts = np.zeros((B, N), np.float32)
    start = 0
    for nk in N_k:
        nk = int(nk)
        for b in range(B):
            idx = start + rng.integers(nk, size=nk)
            np.add.at(counts[b], idx, 1.0)
        start += nk

    fb_ser, nf_ser, _bi_s = sharded_bootstrap_polish_dd(
        uh_s, ul_s, N_k, f_k, info["hinv"], counts, mesh, mode="serial"
    )
    fb_bat, nf_bat, _bi_b = sharded_bootstrap_polish_dd(
        uh_s, ul_s, N_k, f_k, info["hinv"], counts, mesh, mode="batched"
    )
    assert nf_ser == 0 and nf_bat == 0
    assert np.max(np.abs(fb_bat - fb_ser)) < 5e-11
    assert np.max(np.abs(fb_bat - np.asarray(f_k)[None, :])) > 1e-3


# ---------------------------------------------------------------------------
# Memory-meaningful virtual-mesh gates (VERDICT r2 item 4): the dd sharded
# paths at shapes where layout/padding/combine bugs actually surface
# (hundreds of MB of planes), asserted against true-f64 first-order
# conditions.  Shapes are sized for the single-core CI box (~1-2 min each);
# the kernels' per-element math is identical at any scale, so these gates
# exercise every packing/collective path the hardware run would.
# ---------------------------------------------------------------------------


def _scaled_problem(K, n_per, seed=0):
    rng = np.random.default_rng(seed)
    O = np.linspace(0.0, 4.0, K)
    Kf = np.linspace(1.0, 3.0, K)
    x = (O[:, None] + rng.normal(size=(K, n_per)) / np.sqrt(Kf)[:, None]).reshape(-1)
    u = 0.5 * Kf[:, None] * (x[None, :] - O[:, None]) ** 2
    N_k = np.full(K, float(n_per))
    return u, N_k


@pytest.mark.nightly
def test_scaled_1d_dd_solve_first_order_conditions():
    """1-D sharded dd solve at K=512 x N=307200 (1.2 GB f64-equivalent of
    planes; the coarse-subsample warm start engages): the converged f_k
    must satisfy the TRUE float64 first-order conditions, not merely the
    dd solver's own certificate."""
    from pymbar_tpu.ops.mbar_core import mbar_gradient, self_consistent_update
    from pymbar_tpu.parallel.sharding import sharded_solve_mbar_dd
    from pymbar_tpu.solvers_large import COARSE_MIN_ELEMS

    K, n_per = 512, 600
    u, N_k = _scaled_problem(K, n_per, seed=21)
    u_pre = u - u.min(axis=0, keepdims=True)
    uh = u_pre.astype(np.float32)
    ul = (u_pre - uh.astype(np.float64)).astype(np.float32)
    assert uh.size >= COARSE_MIN_ELEMS  # the coarse phase must engage

    mesh = default_mesh(8)
    f, info = sharded_solve_mbar_dd(uh, ul, N_k, mesh=mesh)
    assert info["converged"]
    assert info["f32_coarse_iterations"] > 0  # coarse path exercised

    # true-f64 gradient at the dd answer
    u64 = jnp.asarray(uh.astype(np.float64) + ul.astype(np.float64))
    g = np.asarray(mbar_gradient(u64, jnp.asarray(N_k), jnp.asarray(f)))
    assert np.linalg.norm(g) / n_per < 1e-9
    # SC fixed point in f64
    f_sci = np.array(self_consistent_update(u64, N_k, f))
    f_sci -= f_sci[0]
    assert np.max(np.abs(f_sci - f)) < 1e-9


@pytest.mark.nightly
def test_scaled_2d_dd_solve_first_order_conditions():
    """2-D (k, n)-mesh dd solve at K=4096 x N=65536 (the k-blocked kernel
    route, ring chord factor, dd collectives — 2.1 GB of f64-equivalent
    planes): true-f64 first-order conditions at the answer."""
    from pymbar_tpu.ops.mbar_core import mbar_gradient
    from pymbar_tpu.parallel.sharding import mesh_2d, sharded2d_solve_mbar_dd

    K, n_per = 4096, 16
    u, N_k = _scaled_problem(K, n_per, seed=22)
    u_pre = u - u.min(axis=0, keepdims=True)
    uh = u_pre.astype(np.float32)
    ul = (u_pre - uh.astype(np.float64)).astype(np.float32)

    mesh = mesh_2d(4, 2)
    f, info = sharded2d_solve_mbar_dd(uh, ul, N_k, mesh=mesh)
    assert info["converged"]

    u64 = jnp.asarray(uh.astype(np.float64) + ul.astype(np.float64))
    g = np.asarray(mbar_gradient(u64, jnp.asarray(N_k), jnp.asarray(f)))
    # N_k = 16/state: the dd noise floor in f is ~1e-12 absolute, so the
    # per-sample gradient certificate is the right scale-free assertion.
    assert np.linalg.norm(g) / n_per < 1e-9


@pytest.mark.nightly
def test_scaled_mesh_bootstrap_matches_single_device():
    """Mesh bootstrap at the 1.2 GB virtual-mesh scale (VERDICT r3 item 5):
    K=512 x N=307200, B=16 replicates through the batched mesh engine must
    reproduce the single-device dd bootstrap stream replicate-for-replicate
    (same counts, same frozen factor semantics) and hence the same sigma."""
    from pymbar_tpu.parallel.sharding import (
        sharded_bootstrap_polish_dd,
        sharded_solve_mbar_dd,
    )
    from pymbar_tpu.solvers_large import bootstrap_polish_dd, solve_mbar_dd

    K, n_per = 512, 600
    u, N_k = _scaled_problem(K, n_per, seed=23)
    u_pre = u - u.min(axis=0, keepdims=True)
    uh = u_pre.astype(np.float32)
    ul = (u_pre - uh.astype(np.float64)).astype(np.float32)
    N = u.shape[1]

    rng = np.random.default_rng(29)
    B = 16
    # block resampling as integer multiplicities, all states sampled
    counts = np.zeros((B, N), np.float32)
    for b in range(B):
        r = rng.integers(0, n_per, size=N) + np.repeat(
            np.arange(K) * n_per, n_per
        )
        counts[b] = np.bincount(r, minlength=N)

    f_sd, info_sd = solve_mbar_dd(uh, ul, N_k, tol=1e-12)
    fb_sd, nf_sd, _bi_sd = bootstrap_polish_dd(
        uh, ul, N_k, f_sd, info_sd["hinv"], counts, mode="batched"
    )

    mesh = default_mesh(8)
    f_m, info_m = sharded_solve_mbar_dd(uh, ul, N_k, mesh=mesh, return_state=True)
    uh_s, ul_s = info_m["planes"]
    fb_m, nf_m, _bi_m = sharded_bootstrap_polish_dd(
        uh_s, ul_s, N_k, f_m, info_m["hinv"], counts, mesh, mode="batched"
    )

    assert nf_sd == 0 and nf_m == 0
    # same replicate stream to the dd noise floor...
    assert np.max(np.abs(fb_m - fb_sd)) < 5e-10
    # ...and hence the same bootstrap uncertainties
    sig_sd = np.std(fb_sd - fb_sd[:, :1], axis=0)
    sig_m = np.std(fb_m - fb_m[:, :1], axis=0)
    assert np.max(np.abs(sig_m - sig_sd)) < 1e-10
    # the replicates genuinely moved off the base solution
    assert np.max(np.abs(fb_sd - np.asarray(f_sd)[None, :])) > 1e-4
