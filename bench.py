#!/usr/bin/env python
"""Benchmark: MBAR solve at K=1024, N~1e6 on TPU vs the reference on CPU.

Prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": speedup, ...}

* Problem: BASELINE.json config — evenly spaced harmonic oscillators,
  K=1024 states x ~1e6 total samples, solved to 1e-12 relative tolerance.
* Solver: the TPU-scale two-phase path (pymbar_tpu.solvers_large) — an f32
  adaptive phase on the hi plane followed by a double-word Newton polish
  whose logsumexp reductions run through the fused Pallas kernels.  The
  reduced potentials are generated, preconditioned and double-word-split
  chunkwise ON DEVICE (no host transfer, no full f64 copy ever lives in
  HBM next to the planes).
* Cross-check: the converged f_k is validated against an XLA-f64 adaptive
  solve of the same problem (delta_f_max_err_vs_f64) and against the
  analytic free energies (statistical-noise level).
* vs_baseline: reference pymbar's JAX-CPU backend on the same problem at
  N/10, scaled linearly (cached in bench_baseline.json).
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import numpy as np

K = 1024
N_PER_STATE = 976  # ~1e6 total samples
N = K * N_PER_STATE
TOL = 1.0e-12
CHUNKS = 16
BASELINE_CACHE = os.path.join(REPO, "bench_baseline.json")


def _setup():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from pymbar_tpu.ops.mbar_core import _logden_direct

    O = jnp.linspace(0.0, 5.0, K, dtype=jnp.float64)
    Kf = jnp.linspace(1.0, 3.0, K, dtype=jnp.float64)
    f_analytic = np.asarray(-0.5 * jnp.log(2 * jnp.pi / Kf))
    f_analytic = f_analytic - f_analytic[0]

    N_k64 = jnp.full(K, float(N_PER_STATE), dtype=jnp.float64)
    f0 = jnp.zeros(K, dtype=jnp.float64)
    c_shift = 0.0  # dot(N_k, f0)/N = 0 at the zero initial guess

    @jax.jit
    def gen_dd(key):
        """Generate, precondition (f=0) and double-word split, chunkwise.

        Only the two f32 planes (8 GB total) plus one small f64 chunk are
        ever live — the full f64 matrix never exists.
        """
        z = jax.random.normal(key, (K, N_PER_STATE), dtype=jnp.float32).astype(jnp.float64)
        x = (O[:, None] + z / jnp.sqrt(Kf)[:, None]).reshape(-1)

        nc = N // CHUNKS

        def body(c, planes):
            uh, ul = planes
            xc = jax.lax.dynamic_slice(x, (c * nc,), (nc,))
            u64 = 0.5 * Kf[:, None] * (xc[None, :] - O[:, None]) ** 2
            # precondition: per-column min shift + logden shift (f = 0)
            u64 = u64 - jnp.min(u64, axis=0)[None, :]
            ld = _logden_direct(u64, N_k64, f0)
            u64 = u64 + (ld - c_shift)[None, :]
            hi = u64.astype(jnp.float32)
            lo = (u64 - hi.astype(jnp.float64)).astype(jnp.float32)
            uh = jax.lax.dynamic_update_slice(uh, hi, (0, c * nc))
            ul = jax.lax.dynamic_update_slice(ul, lo, (0, c * nc))
            return uh, ul

        planes = (
            jnp.zeros((K, N), jnp.float32),
            jnp.zeros((K, N), jnp.float32),
        )
        return jax.lax.fori_loop(0, CHUNKS, body, planes)

    @jax.jit
    def gen_f64(key):
        """The same preconditioned problem in f64 (for the cross-check solve,
        run after the planes are freed — they cannot coexist in HBM)."""
        z = jax.random.normal(key, (K, N_PER_STATE), dtype=jnp.float32).astype(jnp.float64)
        x = (O[:, None] + z / jnp.sqrt(Kf)[:, None]).reshape(-1)
        nc = N // CHUNKS

        def body(c, u):
            xc = jax.lax.dynamic_slice(x, (c * nc,), (nc,))
            u64 = 0.5 * Kf[:, None] * (xc[None, :] - O[:, None]) ** 2
            u64 = u64 - jnp.min(u64, axis=0)[None, :]
            ld = _logden_direct(u64, N_k64, f0)
            u64 = u64 + (ld - c_shift)[None, :]
            return jax.lax.dynamic_update_slice(u, u64, (0, c * nc))

        return jax.lax.fori_loop(0, CHUNKS, body, jnp.zeros((K, N), jnp.float64))

    return jax, jnp, gen_dd, gen_f64, N_k64, f_analytic


# Static VPU flop count per (k, n) element of the wsum kernel (one dd exp
# via dd_exp_neg_fast ~185 f32 ops + argument assembly ~24 + column-max 2 +
# two dd tree-sum levels ~22 + the dd weight multiply ~22); documented in
# docs/numerics.md.  Used to convert the measured pass time into TFLOP/s.
WSUM_FLOPS_PER_ELEM = 255


def tpu_solve():
    jax, jnp, gen_dd, gen_f64, N_k64, f_analytic = _setup()

    from pymbar_tpu.ops.doubledouble import dd_from_f64
    from pymbar_tpu.ops.mbar_core import log_denominator_n
    from pymbar_tpu.ops.pallas_kernels import wsum_dd
    from pymbar_tpu.solvers_large import solve_mbar_dd

    key = jax.random.PRNGKey(20260816)
    u_hi, u_lo = gen_dd(key)
    jax.block_until_ready(u_hi)

    def solve():
        f, info = solve_mbar_dd(u_hi, u_lo, np.full(K, float(N_PER_STATE)), tol=TOL)
        return f, info

    f, info = solve()  # warm-up / compile
    t0 = time.time()
    f, info = solve()
    solve_s = time.time() - t0

    f = f - f[0]
    delta_f_rmse = float(np.sqrt(np.mean((f - f_analytic) ** 2)))

    # Throughput of the hot reduction — the fused wsum kernel (one dd
    # logsumexp-weights pass over both planes; planes still resident).
    # Best of 5 singles (the sustained rate, free of scheduler jitter).
    gh, gl = dd_from_f64(jnp.asarray(f) + jnp.log(N_k64))
    out = wsum_dd(u_hi, u_lo, gh, gl)
    jax.block_until_ready(out)
    dd_pass = np.inf
    for _ in range(5):
        t0 = time.time()
        out = wsum_dd(u_hi, u_lo, gh, gl)
        jax.block_until_ready(out)
        dd_pass = min(dd_pass, time.time() - t0)

    # Free the planes, regenerate the same problem in f64 (deterministic
    # PRNG), and cross-check with the XLA-f64 adaptive solver.
    del u_hi, u_lo, out, gh, gl
    u64 = gen_f64(key)
    jax.block_until_ready(u64)

    from pymbar_tpu.solvers import _adaptive_while

    f64_ref, *_ = _adaptive_while(
        u64,
        N_k64,
        jnp.zeros(K, jnp.float64),
        jnp.asarray(1.0, jnp.float64),
        jnp.asarray(TOL, jnp.float64),
        2000,
        2,
        "chol",
    )
    f64_ref = np.asarray(f64_ref)
    f64_ref = f64_ref - f64_ref[0]
    dd_vs_f64 = float(np.max(np.abs(f - f64_ref)))

    jitted = jax.jit(log_denominator_n)
    jax.block_until_ready(jitted(u64, N_k64, jnp.asarray(f)))
    t0 = time.time()
    for _ in range(3):
        out = jitted(u64, N_k64, jnp.asarray(f))
    jax.block_until_ready(out)
    f64_pass = (time.time() - t0) / 3
    del u64, out

    k4096 = k4096_slice(jax, jnp)

    return dict(
        solve_s=solve_s,
        f32_iterations="%d coarse + %d full"
        % (info.get("f32_coarse_iterations", 0), info["f32_iterations"]),
        polish_iterations=info["polish_iterations"],
        phase1_s=round(info.get("phase1_s", 0), 3),
        phase2_s=round(info.get("phase2_s", 0), 3),
        polish_deltas=["%.1e" % d for d in info.get("deltas", [])],
        converged=bool(info["converged"]),
        gnorm=info["gnorm"],
        gnorm_per_sample=info["gnorm"] / N_PER_STATE,
        delta_f_rmse_vs_analytic=delta_f_rmse,
        delta_f_max_err_vs_f64=dd_vs_f64,
        logsumexp_dd_gb_s=K * N * 8 / dd_pass / 1e9,
        logsumexp_dd_tflops=K * N * WSUM_FLOPS_PER_ELEM / dd_pass / 1e12,
        logsumexp_f64_gb_s=K * N * 8 / f64_pass / 1e9,
        **k4096,
    )


def k4096_slice(jax, jnp):
    """BASELINE stress-K slice on one chip: K=4096 states (the wsum kernel's
    single-chip ceiling, tile 128), N = 2^18 samples -> 8.6 GB of planes.
    Reports kernel GB/s and a full dd solve with its gradient certificate;
    the ICI-sharded N=1e7 version of this config is the multi-chip dryrun's
    job (BASELINE.md stress config)."""
    import jax.numpy as jnp

    from pymbar_tpu.ops.doubledouble import dd_from_f64
    from pymbar_tpu.ops.mbar_core import _logden_direct
    from pymbar_tpu.ops.pallas_kernels import wsum_dd
    from pymbar_tpu.solvers_large import solve_mbar_dd

    K4, NPK4 = 4096, 64
    N4 = K4 * NPK4
    O = jnp.linspace(0.0, 5.0, K4, dtype=jnp.float64)
    Kf = jnp.linspace(1.0, 3.0, K4, dtype=jnp.float64)
    f_true = np.asarray(-0.5 * jnp.log(2 * jnp.pi / Kf))
    f_true = f_true - f_true[0]
    N_k = jnp.full(K4, float(NPK4), dtype=jnp.float64)
    f0 = jnp.zeros(K4, dtype=jnp.float64)
    chunks = 32

    @jax.jit
    def gen(key):
        z = jax.random.normal(key, (K4, NPK4), dtype=jnp.float32).astype(jnp.float64)
        x = (O[:, None] + z / jnp.sqrt(Kf)[:, None]).reshape(-1)
        nc = N4 // chunks

        def body(c, planes):
            uh, ul = planes
            xc = jax.lax.dynamic_slice(x, (c * nc,), (nc,))
            u64 = 0.5 * Kf[:, None] * (xc[None, :] - O[:, None]) ** 2
            u64 = u64 - jnp.min(u64, axis=0)[None, :]
            ld = _logden_direct(u64, N_k, f0)
            u64 = u64 + ld[None, :]
            hi = u64.astype(jnp.float32)
            lo = (u64 - hi.astype(jnp.float64)).astype(jnp.float32)
            return (
                jax.lax.dynamic_update_slice(uh, hi, (0, c * nc)),
                jax.lax.dynamic_update_slice(ul, lo, (0, c * nc)),
            )

        return jax.lax.fori_loop(
            0, chunks, body,
            (jnp.zeros((K4, N4), jnp.float32), jnp.zeros((K4, N4), jnp.float32)),
        )

    uh, ul = gen(jax.random.PRNGKey(4096))
    jax.block_until_ready(uh)

    Nk_host = np.full(K4, float(NPK4))
    f, info = solve_mbar_dd(uh, ul, Nk_host, tol=TOL)  # compile + run
    t0 = time.time()
    f, info = solve_mbar_dd(uh, ul, Nk_host, tol=TOL)
    solve_s = time.time() - t0

    gh, gl = dd_from_f64(jnp.asarray(f) + jnp.log(N_k))
    out = wsum_dd(uh, ul, gh, gl)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(3):
        out = wsum_dd(uh, ul, gh, gl)
    jax.block_until_ready(out)
    dd_pass = (time.time() - t0) / 3
    del uh, ul, out

    rmse = float(np.sqrt(np.mean((np.asarray(f) - f_true) ** 2)))
    return dict(
        k4096_solve_s=round(solve_s, 4),
        k4096_gnorm=info["gnorm"],
        k4096_gnorm_per_sample=info["gnorm"] / NPK4,
        k4096_delta_f_rmse_vs_analytic=rmse,
        k4096_wsum_gb_s=round(K4 * N4 * 8 / dd_pass / 1e9, 1),
    )


def reference_baseline():
    """Reference pymbar (JAX CPU backend) at N/10, scaled x10; cached."""
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as fh:
            return json.load(fh)

    import subprocess
    import tempfile

    stub_dir = tempfile.mkdtemp()
    with open(os.path.join(stub_dir, "numexpr.py"), "w") as fh:
        fh.write(
            "import inspect\n"
            "import numpy as np\n"
            "def evaluate(expr, local_dict=None):\n"
            "    frame = inspect.currentframe().f_back\n"
            "    ld = dict(frame.f_globals)\n"
            "    ld.update(frame.f_locals)\n"
            "    if local_dict: ld.update(local_dict)\n"
            "    env = {'exp': np.exp, 'log': np.log, 'sqrt': np.sqrt, 'abs': np.abs}\n"
            "    return eval(expr, env, ld)\n"
        )

    script = f"""
import os, sys, time, json
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
sys.path.insert(0, {stub_dir!r})
sys.path.insert(0, "/root/reference")
import pymbar
from pymbar import mbar_solvers

K = {K}
NPK = {N_PER_STATE} // 10
O = np.linspace(0.0, 5.0, K)
Kf = np.linspace(1.0, 3.0, K)
rng = np.random.RandomState(0)
x = (O[:, None] + rng.randn(K, NPK) / np.sqrt(Kf)[:, None]).reshape(-1)
u = 0.5 * Kf[:, None] * (x[None, :] - O[:, None]) ** 2
N_k = np.full(K, float(NPK))
f0 = np.zeros(K)

t0 = time.time()
f, results = mbar_solvers.solve_mbar(u, N_k, f0, solver_protocol=(dict(method="adaptive", continuation=True, options=dict(maxiter=2000)),))
elapsed = time.time() - t0
g = np.asarray(mbar_solvers.mbar_gradient(u, N_k, np.asarray(f)))
print(json.dumps(dict(ref_solve_s_tenth=elapsed, ref_gnorm=float(np.linalg.norm(g)))))
"""
    try:
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        out = subprocess.run(
            [sys.executable, "-c", script],
            capture_output=True,
            text=True,
            timeout=3000,
            env=env,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        data = json.loads(line)
        data["ref_solve_s_scaled"] = data["ref_solve_s_tenth"] * 10.0
    except Exception as exc:  # baseline is best-effort
        data = dict(error=str(exc)[:200], ref_solve_s_scaled=None)

    with open(BASELINE_CACHE, "w") as fh:
        json.dump(data, fh)
    return data


def main():
    result = tpu_solve()
    base = reference_baseline()

    vs_baseline = None
    if base.get("ref_solve_s_scaled"):
        vs_baseline = base["ref_solve_s_scaled"] / result["solve_s"]

    print(
        json.dumps(
            dict(
                metric="mbar_solve_K1024_N1e6_wall",
                value=round(result["solve_s"], 4),
                unit="s",
                vs_baseline=round(vs_baseline, 2) if vs_baseline else None,
                converged=result["converged"],
                f32_iterations=result["f32_iterations"],
                polish_iterations=result["polish_iterations"],
                phase1_s=result.get("phase1_s"),
                phase2_s=result.get("phase2_s"),
                polish_deltas=result.get("polish_deltas"),
                gradient_norm=result["gnorm"],
                gradient_norm_per_sample=result["gnorm_per_sample"],
                delta_f_rmse_vs_analytic=result["delta_f_rmse_vs_analytic"],
                delta_f_max_err_vs_f64=result["delta_f_max_err_vs_f64"],
                logsumexp_dd_gb_s=round(result["logsumexp_dd_gb_s"], 1),
                logsumexp_dd_tflops=round(result["logsumexp_dd_tflops"], 2),
                logsumexp_f64_gb_s=round(result["logsumexp_f64_gb_s"], 1),
                k4096_solve_s=result["k4096_solve_s"],
                k4096_gnorm=result["k4096_gnorm"],
                k4096_gnorm_per_sample=result["k4096_gnorm_per_sample"],
                k4096_delta_f_rmse_vs_analytic=result["k4096_delta_f_rmse_vs_analytic"],
                k4096_wsum_gb_s=result["k4096_wsum_gb_s"],
                baseline="reference pymbar jax-cpu, N/10 scaled x10",
            )
        )
    )


if __name__ == "__main__":
    main()
