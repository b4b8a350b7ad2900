"""Probe: batched-bootstrap wall at the 8 GB bench config with the
f64-segmented fast S pass (round-5 follow-up to probe_fast_floor.py,
which measured the segmented pass at 70x the accuracy of the flat f32
pass for the same 0.06 s wall — this validates the production effect:
fewer fast iterations to _BATCH_FAST_TOL and ~2 fewer exact sweeps).

Logs to /tmp/probe_seg_boot.log.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import bench

_LOG = open("/tmp/probe_seg_boot.log", "a", buffering=1)


def log(msg):
    print(msg, flush=True)
    _LOG.write(msg + "\n")


jax, jnp, gen_dd, gen_f64, N_k64, f_analytic = bench._setup()
from pymbar_tpu.solvers_large import bootstrap_polish_dd, solve_mbar_dd

key = jax.random.PRNGKey(20260816)
t0 = time.time()
u_hi, u_lo = gen_dd(key)
jax.block_until_ready(u_hi)
log(f"planes: {time.time()-t0:.1f}s")

Nk_host = np.full(bench.K, float(bench.N_PER_STATE))
t0 = time.time()
f, info = solve_mbar_dd(u_hi, u_lo, Nk_host, tol=bench.TOL)
f = np.asarray(f)
f = f - f[0]
log(f"solve: {time.time()-t0:.1f}s")

rngb = np.random.RandomState(7)
B = 64
counts = np.zeros((B, bench.N), np.uint16)
for b in range(B):
    r = rngb.randint(0, bench.N_PER_STATE, size=bench.N) + np.repeat(
        np.arange(bench.K) * bench.N_PER_STATE, bench.N_PER_STATE
    )
    counts[b] = np.bincount(r, minlength=bench.N)
log("counts ready")

t0 = time.time()
f_bb, nf, bi = bootstrap_polish_dd(u_hi, u_lo, Nk_host, f, info["hinv"], counts)
log(f"bootstrap warm-up (compile+run): {time.time()-t0:.1f}s n_fail={nf}")

for rep in range(3):
    t0 = time.time()
    f_boots, n_fail, boot_info = bootstrap_polish_dd(
        u_hi, u_lo, Nk_host, f, info["hinv"], counts
    )
    wall = time.time() - t0
    pw = boot_info.get("phase_walls", {})
    log(
        f"rep {rep}: {wall:.2f}s = {B/wall:.2f} reps/s n_fail={n_fail} "
        f"at_floor={boot_info.get('n_at_floor')} "
        f"fast_iters={boot_info.get('fast_iters')} "
        f"exact_iters_mean={np.mean(boot_info.get('exact_iters', [0])):.2f} "
        f"phase_walls={ {k: round(float(v), 3) for k, v in pw.items()} }"
    )
    dmat = boot_info.get("exact_deltas")
    if dmat is not None:
        rows = [
            f"{np.nanmax(row):.1e}"
            for row in np.asarray(dmat)
            if np.any(np.isfinite(row))
        ]
        log(f"  exact sweep deltas: {rows}")

sig = np.std(np.asarray(f_boots), axis=0)
log(f"sigma finite: {bool(np.all(np.isfinite(sig)))} "
    f"sigma[1]={sig[1]:.3e} sigma[-1]={sig[-1]:.3e}")
