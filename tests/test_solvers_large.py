"""Tests of the two-phase double-word solver (CPU path: jnp dd reference).

Gate: the dd solve must agree with the XLA-f64 adaptive solve to ~1e-10 —
the single-chip analog of the BASELINE "delta_f vs CPU pymbar <= 1e-8"
requirement.
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import jax
import jax.numpy as jnp

from pymbar_tpu.ops.doubledouble import dd_from_f64, dd_to_f64
from pymbar_tpu.ops.mbar_core import (
    _logden_direct,
    _lognum_direct,
    mbar_gradient,
    precondition_u_kn,
)
from pymbar_tpu.ops.pallas_kernels import logden_dd_ref, lognum_dd_ref
from pymbar_tpu.solvers import _adaptive_while
from pymbar_tpu.solvers_large import solve_mbar_dd


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(5)
    K, npk = 32, 256
    N = K * npk
    O = np.linspace(0, 4, K)
    Kf = np.linspace(1, 3, K)
    x = np.repeat(O, npk) + rng.normal(0, 1.0, N) / np.sqrt(np.repeat(Kf, npk))
    u64 = jnp.asarray(0.5 * Kf[:, None] * (x[None, :] - O[:, None]) ** 2)
    N_k = np.full(K, float(npk))
    # precondition once (as the production pipeline does)
    u64 = precondition_u_kn(u64, jnp.asarray(N_k), jnp.zeros(K, jnp.float64))
    return u64, N_k


def test_dd_reductions_match_f64(problem):
    u64, N_k = problem
    K = u64.shape[0]
    f = jnp.asarray(np.linspace(0, 0.5, K))

    ld64 = _logden_direct(u64, jnp.asarray(N_k), f)
    ln64 = _lognum_direct(u64, ld64)

    uh, ul = dd_from_f64(u64)
    gh, gl = dd_from_f64(f + jnp.log(jnp.asarray(N_k)))
    ldh, ldl = logden_dd_ref(uh, ul, gh, gl)
    assert float(jnp.max(jnp.abs(dd_to_f64(ldh, ldl) - ld64))) < 1e-11

    m_k = np.asarray(jnp.max(-ld64[None, :] - u64, axis=1)).astype(np.float32)
    lnh, lnl = lognum_dd_ref(uh, ul, ldh, ldl, jnp.asarray(m_k))
    assert float(jnp.max(jnp.abs(dd_to_f64(lnh, lnl) - ln64))) < 1e-11


def test_wsum_matches_f64(problem):
    """wsum S_k == sum_n N_k W_nk from true f64 to ~1e-12 relative, and the
    gradient identity g_k = S_k - N_k holds against mbar_gradient."""
    from pymbar_tpu.ops.pallas_kernels import wsum_dd_ref

    u64, N_k = problem
    K = u64.shape[0]
    f = jnp.asarray(np.linspace(0, 0.5, K))
    N_kj = jnp.asarray(N_k)

    ld64 = _logden_direct(u64, N_kj, f)
    # colsum_k = sum_n W_nk = sum_n exp(f_k - u_kn - logden_n); S_k = N_k * colsum_k
    S_expect = np.asarray(jnp.sum(jnp.exp(f[:, None] - u64 - ld64[None, :]), axis=1))

    uh, ul = dd_from_f64(u64)
    gh, gl = dd_from_f64(f + jnp.log(N_kj))
    Sh, Sl = wsum_dd_ref(uh, ul, gh, gl)
    S = np.asarray(dd_to_f64(Sh, Sl))
    S_true = np.asarray(N_k) * S_expect
    assert np.max(np.abs(S - S_true) / S_true) < 1e-12

    g_direct = np.asarray(mbar_gradient(u64, N_kj, f))
    assert np.max(np.abs((S - np.asarray(N_k)) - g_direct)) < 1e-9 * np.max(np.asarray(N_k))


def test_wsum_pad_columns_exact():
    """Sentinel pad columns must contribute exactly zero to S_k."""
    from pymbar_tpu.ops.pallas_kernels import _PAD_U, wsum_dd_ref

    rng = np.random.default_rng(7)
    K, N = 4, 100
    u = rng.uniform(0, 10, (K, N))
    f = rng.normal(0, 0.5, K)
    N_k = np.full(K, float(N // K * K) / K)
    uh, ul = dd_from_f64(jnp.asarray(u))
    gh, gl = dd_from_f64(jnp.asarray(f + np.log(N_k)))
    S0 = dd_to_f64(*wsum_dd_ref(uh, ul, gh, gl))

    pad = 12
    uhp = jnp.pad(uh, ((0, 0), (0, pad)), constant_values=np.float32(_PAD_U))
    ulp = jnp.pad(ul, ((0, 0), (0, pad)))
    S1 = dd_to_f64(*wsum_dd_ref(uhp, ulp, gh, gl))
    assert_allclose(np.asarray(S1), np.asarray(S0), rtol=0, atol=0)


def test_solve_mbar_dd_matches_f64_solve(problem):
    u64, N_k = problem
    K = u64.shape[0]

    uh, ul = dd_from_f64(u64)
    f_dd, info = solve_mbar_dd(uh, ul, N_k, tol=1e-12)
    assert info["converged"]
    assert info["f32_iterations"] > 0
    assert info["polish_iterations"] >= 1

    f64_ref, *_rest = _adaptive_while(
        u64,
        jnp.asarray(N_k),
        jnp.zeros(K, jnp.float64),
        jnp.asarray(1.0, jnp.float64),
        jnp.asarray(1e-12, jnp.float64),
        2000,
        2,
        "chol",
    )
    f64_ref = np.array(f64_ref)
    f64_ref -= f64_ref[0]

    assert np.max(np.abs(f_dd - f64_ref)) < 1e-9

    # the dd gradient certificate
    g = np.asarray(mbar_gradient(u64, jnp.asarray(N_k), jnp.asarray(f_dd)))
    assert np.linalg.norm(g) < 1e-6


def test_strided_subsample_counts():
    from pymbar_tpu.solvers_large import _strided_subsample

    N_k = [1000, 64, 130]
    idx, counts = _strided_subsample(N_k, 16)
    assert counts.tolist() == [63, 4, 9]
    assert idx.size == sum(counts)
    # every index belongs to the right block
    assert (idx[: counts[0]] < 1000).all()
    assert ((idx[counts[0] : counts[0] + counts[1]] >= 1000)).all()
    assert (np.diff(idx[: counts[0]]) == 16).all()


def test_coarse_stride_policy():
    from pymbar_tpu import solvers_large as sl

    big = sl.COARSE_MIN_ELEMS
    # small planes: no coarse phase
    assert sl._coarse_stride(np.array([1000, 1000]), big - 1) == 0
    # big plane, plentiful samples: full 1/16 stride
    assert sl._coarse_stride(np.array([976 * 1024] * 4), big) == 16
    # big plane, small min N_k: stride capped so >= 16 subsamples remain
    assert sl._coarse_stride(np.array([64, 10000]), big) == 4
    assert sl._coarse_stride(np.array([33, 10000]), big) == 2
    # too few samples in some state: skip
    assert sl._coarse_stride(np.array([31, 10000]), big) == 0


def test_solve_mbar_dd_multilevel_warm_start(monkeypatch):
    """Large planes trigger the coarse subsample phase; answer unchanged."""
    from pymbar_tpu import solvers_large as sl
    from pymbar_tpu.solvers_large import solve_mbar_dd, split_u_kn_streamed

    monkeypatch.setattr(sl, "COARSE_MIN_ELEMS", 2**21)
    rng = np.random.default_rng(21)
    K, N_per = 4, 2**17 + 11
    O_k = np.array([0.0, 1.0, 2.0, 3.0])
    k_spring = np.array([1.0, 1.5, 2.0, 2.5])
    N_k = np.full(K, N_per)
    x = np.concatenate(
        [rng.normal(o, 1.0 / np.sqrt(s), n) for o, s, n in zip(O_k, k_spring, N_k)]
    )
    u_kn = 0.5 * k_spring[:, None] * (x[None, :] - O_k[:, None]) ** 2
    u_kn -= u_kn.min(axis=0, keepdims=True)
    uh, ul = split_u_kn_streamed(u_kn)
    f, info = solve_mbar_dd(uh, ul, N_k)
    assert info["f32_coarse_iterations"] > 0, "multilevel phase should trigger"
    assert info["converged"]
    f_analytic = -0.5 * np.log(2 * np.pi / k_spring)
    f_analytic -= f_analytic[0]
    assert np.max(np.abs(np.asarray(f) - f_analytic)) < 5e-3  # statistical


def test_solve_mbar_dd_fallback_after_failed_polish(monkeypatch):
    """If the polish off the subsample factor reports non-convergence, the
    solver must rerun full-plane f32 adaptive + fresh factor + polish and
    still land on the right answer (the rare-ill-conditioning safety net,
    forced here by failing the first polish invocation)."""
    import jax.numpy as jnp

    from pymbar_tpu import solvers_large as sl
    from pymbar_tpu.solvers_large import solve_mbar_dd, split_u_kn_streamed

    monkeypatch.setattr(sl, "COARSE_MIN_ELEMS", 2**12)
    real_polish = sl._polish_while_dd
    calls = {"n": 0}

    def flaky_polish(*args, **kwargs):
        f, it, g, deltas, converged, floor = real_polish(*args, **kwargs)
        calls["n"] += 1
        if calls["n"] == 1:
            return f, it, g, deltas, jnp.asarray(False), floor
        return f, it, g, deltas, converged, floor

    monkeypatch.setattr(sl, "_polish_while_dd", flaky_polish)

    rng = np.random.default_rng(5)
    K, N_per = 6, 600
    O_k = np.linspace(0.0, 2.0, K)
    k_spring = np.linspace(1.0, 3.0, K)
    N_k = np.full(K, N_per)
    x = np.concatenate(
        [rng.normal(o, 1.0 / np.sqrt(s), n) for o, s, n in zip(O_k, k_spring, N_k)]
    )
    u_kn = 0.5 * k_spring[:, None] * (x[None, :] - O_k[:, None]) ** 2
    u_kn -= u_kn.min(axis=0, keepdims=True)
    uh, ul = split_u_kn_streamed(u_kn)

    f, info = solve_mbar_dd(uh, ul, N_k)
    assert calls["n"] == 2, "fallback polish must run"
    assert info["converged"]
    assert info["f32_iterations"] > 0, "fallback f32 adaptive must run"
    assert info["gnorm"] < 1e-6

    # and the answer equals the un-tampered solve
    monkeypatch.setattr(sl, "_polish_while_dd", real_polish)
    f_ref, _ = solve_mbar_dd(uh, ul, N_k)
    assert np.max(np.abs(np.asarray(f) - np.asarray(f_ref))) < 1e-11


def test_wsum_keeps_high_energy_real_samples():
    """A real sample that one state assigns clash-level energy (>= the
    sentinel threshold in a single row) must still contribute its weight to
    the other states — only ALL-row sentinels are padding (the old row-0
    test silently dropped such samples from every S_k)."""
    from pymbar_tpu.ops.pallas_kernels import wsum_dd_ref

    rng = np.random.default_rng(11)
    K, N = 3, 64
    u = rng.uniform(0.0, 5.0, (K, N))
    u -= u.min(axis=0, keepdims=True)  # preconditioned: col-min 0
    u[0, 5] = 6.0e9  # state 0 sees a steric clash for sample 5
    u[1, 5] = 0.0
    u[2, 5] = 1.3
    f = np.array([0.0, 0.1, -0.2])
    N_k = np.full(K, N / K)
    g = f + np.log(N_k)

    uh, ul = dd_from_f64(jnp.asarray(u))
    gh, gl = dd_from_f64(jnp.asarray(g))
    S = np.asarray(dd_to_f64(*wsum_dd_ref(uh, ul, gh, gl)))

    # f64 ground truth: sample 5 weights ~ exp(g - u) normalized
    a = g[:, None] - u
    w = np.exp(a - a.max(axis=0)) / np.exp(a - a.max(axis=0)).sum(axis=0)
    S_true = w.sum(axis=1)
    assert np.max(np.abs(S - S_true)) < 1e-10
    # and the clash sample's weight went to states 1 and 2, not nowhere
    assert w[1:, 5].sum() > 0.99


def test_wsum_big_single_read_interpret_matches_ref():
    """The single-read big-K wsum route (2048 < K_pad <= 4096: in-kernel
    k-block loops, T1 in VMEM scratch) must match the jnp dd reference in
    interpret mode, weighted and unweighted.  The only dd difference vs the
    one-block kernel is the reduction order (per-block tree sums combined
    with dd adds), so agreement is at the dd noise scale."""
    from pymbar_tpu.ops.pallas_kernels import _WSUM_MAX_K, wsum_dd, wsum_dd_ref

    rng = np.random.default_rng(11)
    K, N = _WSUM_MAX_K + 50, 140  # pads to 4096 rows -> big-K route
    u64 = jnp.asarray(rng.standard_normal((K, N)) * 3.0 + 5.0)
    uh, ul = dd_from_f64(u64)
    gh, gl = dd_from_f64(jnp.asarray(rng.standard_normal(K) * 0.5))
    c = jnp.asarray(rng.integers(0, 4, N).astype(np.float32))

    S_ref = np.asarray(dd_to_f64(*wsum_dd_ref(uh, ul, gh, gl)))
    S_new = np.asarray(dd_to_f64(*wsum_dd(uh, ul, gh, gl, interpret=True)))
    assert np.max(np.abs(S_new - S_ref) / np.maximum(S_ref, 1e-30)) < 1e-10

    Sc_ref = np.asarray(dd_to_f64(*wsum_dd_ref(uh, ul, gh, gl, c=c)))
    Sc_new = np.asarray(dd_to_f64(*wsum_dd(uh, ul, gh, gl, c=c, interpret=True)))
    assert np.max(np.abs(Sc_new - Sc_ref) / np.maximum(Sc_ref, 1e-30)) < 1e-10


def _boot_counts(rng, N_k, B):
    """Per-state block resample multiplicities, (B, sum N_k) float32."""
    N_k = np.asarray(N_k, dtype=np.int64)
    N = int(N_k.sum())
    counts = np.zeros((B, N), np.float32)
    for b in range(B):
        start = 0
        for nk in N_k:
            idx = start + rng.integers(int(nk), size=int(nk))
            np.add.at(counts[b], idx, 1.0)
            start += int(nk)
    return counts


def test_bootstrap_batched_matches_serial(problem):
    """The batched all-replicates polish (one shared dd-exp stream + f64
    matmuls per iteration) must agree with the serial per-replicate
    counts-weighted wsum loop to the dd noise floor: both resolve the same
    counts-weighted MBAR fixed points on the same planes."""
    from pymbar_tpu.solvers_large import bootstrap_polish_dd

    u64, N_k = problem
    uh, ul = dd_from_f64(u64)
    f_k, info = solve_mbar_dd(uh, ul, N_k, tol=1e-12)
    rng = np.random.default_rng(7)
    counts = _boot_counts(rng, N_k, B=6)

    fb_ser, nf_ser, bi_ser = bootstrap_polish_dd(
        uh, ul, N_k, f_k, info["hinv"], counts, mode="serial"
    )
    fb_bat, nf_bat, bi_bat = bootstrap_polish_dd(
        uh, ul, N_k, f_k, info["hinv"], counts, mode="batched"
    )
    assert nf_ser == 0 and nf_bat == 0
    assert np.max(np.abs(fb_bat - fb_ser)) < 5e-11
    # replicates really moved away from the base solution
    assert np.max(np.abs(fb_bat - f_k[None, :])) > 1e-3
    # accounting identity holds in both modes
    for nf, bi in ((nf_ser, bi_ser), (nf_bat, bi_bat)):
        assert bi["at_floor"].shape == (6,)
        assert nf + bi["n_at_floor"] + bi["n_tol_converged"] == 6


def test_bootstrap_at_floor_vs_tol_converged(problem):
    """The convergence accounting separates 'certified d < tol' from
    'stopped at the dd noise floor': with tol far below the floor every
    replicate necessarily stops via a floor rule (stalled/tiny/predictive)
    and must be reported in at_floor, not as tol-converged — and not as a
    failure either (VERDICT r4 weak #6 contract split)."""
    from pymbar_tpu.solvers_large import bootstrap_polish_dd

    u64, N_k = problem
    uh, ul = dd_from_f64(u64)
    f_k, info = solve_mbar_dd(uh, ul, N_k, tol=1e-12)
    rng = np.random.default_rng(11)
    counts = _boot_counts(rng, N_k, B=4)

    # unreachable tol: every replicate stalls at the dd noise floor
    fb, nf, bi = bootstrap_polish_dd(
        uh, ul, N_k, f_k, info["hinv"], counts, tol=1e-30, mode="batched"
    )
    assert nf == 0
    assert bi["n_at_floor"] == 4 and bi["at_floor"].all()
    assert bi["n_tol_converged"] == 0
    assert np.all(np.isfinite(fb))

    # reachable tol: floor stops are the exception, not the rule
    fb2, nf2, bi2 = bootstrap_polish_dd(
        uh, ul, N_k, f_k, info["hinv"], counts, tol=1e-6, mode="batched"
    )
    assert nf2 == 0
    assert bi2["n_tol_converged"] == 4 and bi2["n_at_floor"] == 0
    # the relaxed-stop iterates still sit at the same fixed points
    assert np.max(np.abs(fb - fb2)) < 1e-5


def test_bootstrap_batched_group_split(problem):
    """Grouped dispatch (group smaller than B, padded tail group) returns
    the same replicates as one full-width group."""
    from pymbar_tpu import solvers_large as sl

    u64, N_k = problem
    uh, ul = dd_from_f64(u64)
    f_k, info = solve_mbar_dd(uh, ul, N_k, tol=1e-12)
    rng = np.random.default_rng(8)
    counts = _boot_counts(rng, N_k, B=5)

    fb_one, _, _bi = sl.bootstrap_polish_dd(
        uh, ul, N_k, f_k, info["hinv"], counts, mode="batched"
    )
    # force group=2 -> groups [2, 2, 1-padded-to-2]
    orig = sl._batch_chunk_width
    try:
        fb_grp = np.zeros_like(fb_one)
        import unittest.mock as _mock

        with _mock.patch.object(sl, "_batch_group_size", lambda B, N: 2):
            fb_grp, nf, _bi2 = sl.bootstrap_polish_dd(
                uh, ul, N_k, f_k, info["hinv"], counts, mode="batched"
            )
    finally:
        sl._batch_chunk_width = orig
    assert nf == 0
    assert np.max(np.abs(fb_grp - fb_one)) < 1e-12


def test_bootstrap_packed_counts_match_float(problem):
    """Integer-typed counts ride the nibble-packed uint8 upload (half a
    byte per sample over the frontend, device-side unpack); the packed
    route must reproduce the float-counts route bit-for-bit — the unpack
    reconstructs the exact same f32 chunk values."""
    from pymbar_tpu.solvers_large import (
        _unpack4,
        bootstrap_polish_dd,
    )

    u64, N_k = problem
    uh, ul = dd_from_f64(u64)
    f_k, info = solve_mbar_dd(uh, ul, N_k, tol=1e-12)
    rng = np.random.default_rng(11)
    counts = _boot_counts(rng, N_k, B=4)
    assert counts.max() <= 15  # nibble-packable (production regime)

    fb_f32, nf_f, _ = bootstrap_polish_dd(
        uh, ul, N_k, f_k, info["hinv"], counts.astype(np.float32)
    )
    fb_u16, nf_u, bi = bootstrap_polish_dd(
        uh, ul, N_k, f_k, info["hinv"], counts.astype(np.uint16)
    )
    assert nf_f == 0 and nf_u == 0
    assert np.array_equal(fb_u16, fb_f32)  # identical weights -> identical polish

    # the device unpack inverts the host packer exactly
    C8 = counts.astype(np.uint8)
    Cp = (C8[:, 0::2] << 4) | C8[:, 1::2]
    un = np.asarray(_unpack4(jnp.asarray(Cp), counts.shape[0]))
    assert np.array_equal(un, counts.astype(np.float32))
