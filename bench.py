#!/usr/bin/env python
"""Benchmark: MBAR solve at K=1024, N~1e6 on TPU vs the reference on CPU.

Prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": speedup, ...}

* The problem is BASELINE.json config: evenly spaced harmonic oscillators,
  K=1024 states x ~1e6 total samples, solved to the adaptive solver's
  1e-12 relative tolerance.  Data is generated ON DEVICE (one fused f64
  expression from an (N,)-vector of positions) so no host->device transfer
  of the 8 GB u_kn matrix happens.
* vs_baseline: wall time of the reference pymbar (its JAX-accelerated CPU
  backend, /root/reference mounted read-only, numexpr stubbed) on the same
  problem at N/10, scaled linearly in N (the solve is O(K*N) per iteration),
  divided by our TPU time.  Cached in bench_baseline.json after first run.
* Extra keys: delta_f rms error vs the analytic free energies, the final
  gradient norm, and the f64 logsumexp pass throughput.
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
BASELINE_CACHE = os.path.join(REPO, "bench_baseline.json")


def tpu_solve():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from pymbar_tpu.ops.mbar_core import core_stats, log_denominator_n, precondition_u_kn
    from pymbar_tpu.solvers import _adaptive_while

    O = jnp.linspace(0.0, 5.0, K, dtype=jnp.float64)
    Kf = jnp.linspace(1.0, 3.0, K, dtype=jnp.float64)
    f_analytic = np.asarray(-0.5 * jnp.log(2 * jnp.pi / Kf))
    f_analytic = f_analytic - f_analytic[0]

    @jax.jit
    def gen(key):
        z = jax.random.normal(key, (K, N_PER_STATE), dtype=jnp.float32).astype(jnp.float64)
        x = (O[:, None] + z / jnp.sqrt(Kf)[:, None]).reshape(-1)
        # One fused elementwise expression -> only the 8 GB output is live.
        u = 0.5 * Kf[:, None] * (x[None, :] - O[:, None]) ** 2
        return u

    u = gen(jax.random.PRNGKey(20260816))
    u.block_until_ready()

    N_k = jnp.full(K, float(N_PER_STATE), dtype=jnp.float64)
    f0 = jnp.zeros(K, dtype=jnp.float64)
    gamma = jnp.asarray(1.0, dtype=jnp.float64)
    tol = jnp.asarray(TOL, dtype=jnp.float64)

    # Precondition once (donated so the 8 GB buffer is reused in place).
    precond = jax.jit(precondition_u_kn.__wrapped__, donate_argnums=0)
    u = precond(u, N_k, f0)
    u.block_until_ready()

    def solve():
        f, it, sci, nr, max_delta, done = _adaptive_while(
            u, N_k, f0, gamma, tol, 2000, 2, "chol"
        )
        jax.block_until_ready(f)
        return f, int(it), bool(done)

    # Warm-up (compiles); then the timed run.
    f, iters, done = solve()
    t0 = time.time()
    f, iters, done = solve()
    solve_s = time.time() - t0

    _, g, _ = core_stats(u, N_k, f)
    gnorm = float(np.linalg.norm(np.asarray(g)))

    f_np = np.asarray(f)
    f_np = f_np - f_np[0]
    delta_f_rmse = float(np.sqrt(np.mean((f_np - f_analytic) ** 2)))

    # f64 logsumexp pass throughput (the hot op).
    jitted = jax.jit(log_denominator_n)
    jax.block_until_ready(jitted(u, N_k, f))
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        out = jitted(u, N_k, f)
    jax.block_until_ready(out)
    pass_s = (time.time() - t0) / reps
    lse_gbps = K * N * 8 / pass_s / 1e9
    # ~4 flops per element (sub, exp, fma, plus the max pass).
    lse_tflops = 4 * K * N / pass_s / 1e12

    return dict(
        solve_s=solve_s,
        iterations=iters,
        converged=done,
        gnorm=gnorm,
        delta_f_rmse_vs_analytic=delta_f_rmse,
        logsumexp_gb_s=lse_gbps,
        logsumexp_tflop_s=lse_tflops,
    )


def reference_baseline():
    """Reference pymbar (JAX CPU backend) on the same problem at N/10, x10.

    Runs in a subprocess so its CPU-jax / x64 config can't contaminate ours.
    Cached in bench_baseline.json.
    """
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as fh:
            return json.load(fh)

    import subprocess
    import tempfile

    stub_dir = tempfile.mkdtemp()
    # numexpr stub: the reference imports it unconditionally (utils.py:29).
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
                iterations=result["iterations"],
                converged=result["converged"],
                gradient_norm=result["gnorm"],
                delta_f_rmse_vs_analytic=result["delta_f_rmse_vs_analytic"],
                logsumexp_gb_s=round(result["logsumexp_gb_s"], 1),
                logsumexp_tflop_s=round(result["logsumexp_tflop_s"], 3),
                baseline="reference pymbar jax-cpu, N/10 scaled x10",
            )
        )
    )


if __name__ == "__main__":
    main()
