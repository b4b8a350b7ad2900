"""Probe: per-run wall vs internal phase walls of the batched bootstrap
at the bench's 8 GB config (VERDICT r4 item 2 follow-up — the driver
capture shows 15.2 s/call while the phase walls sum to 7.9 s)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import bench
jax, jnp, gen_dd, gen_f64, N_k64, f_analytic = bench._setup()
from pymbar_tpu.solvers_large import solve_mbar_dd, bootstrap_polish_dd

key = jax.random.PRNGKey(20260816)
t0 = time.time()
u_hi, u_lo = gen_dd(key)
jax.block_until_ready(u_hi)
print(f"planes: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
f, info = solve_mbar_dd(u_hi, u_lo, np.full(bench.K, float(bench.N_PER_STATE)), tol=bench.TOL)
print(f"solve: {time.time()-t0:.1f}s", flush=True)

rngb = np.random.RandomState(7)
B = 64
counts = np.zeros((B, bench.N), np.uint16)
for b in range(B):
    r = rngb.randint(0, bench.N_PER_STATE, size=bench.N) + np.repeat(
        np.arange(bench.K) * bench.N_PER_STATE, bench.N_PER_STATE)
    counts[b] = np.bincount(r, minlength=bench.N)
Nk_host = np.full(bench.K, float(bench.N_PER_STATE))
print("counts ready", flush=True)

for run in range(4):
    t0 = time.time()
    fb, nf, bi = bootstrap_polish_dd(u_hi, u_lo, Nk_host, f, info["hinv"], counts)
    w = time.time() - t0
    ei = np.asarray(bi["exact_iters"])
    print(f"run{run}: wall={w:.3f} walls={bi['phase_walls']} "
          f"exact_iters max={ei.max()} mean={ei.mean():.2f} fast={bi['fast_iters']} "
          f"nfail={nf} at_floor={bi['n_at_floor']}", flush=True)

# delta trajectory of the last run (exact phase, nan past each stop)
d = bi["exact_deltas"]
with np.errstate(all="ignore"):
    for i in range(d.shape[0]):
        row = d[i][np.isfinite(d[i])]
        if row.size == 0:
            break
        print(f"exact sweep {i}: n_live={row.size} median={np.median(row):.2e} "
              f"max={row.max():.2e} min={row.min():.2e}", flush=True)
