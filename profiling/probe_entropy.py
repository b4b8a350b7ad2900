"""Phase-level timing probe for compute_entropy_and_enthalpy at the bench
config (K=1024, N~1e6, device-resident f64 matrix).  Times pass A alone
(return_theta=False) vs pass A+B, at several streaming chunk sizes, plus the
all-states expectations call for comparison.  Run on the real TPU from the
repo root:
    python -u profiling/probe_entropy.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import bench as B


def main():
    jax, jnp, gen_dd, gen_f64, N_k64, f_analytic = B._setup()
    from pymbar_tpu.mbar import MBAR as _MBAR
    import pymbar_tpu.mbar as mbar_mod

    from pymbar_tpu.solvers_large import solve_mbar_dd

    key = jax.random.PRNGKey(20260816)
    # Converged f via the fast dd solve on the split planes (pass B's
    # weight-normalization check needs a real solution, not f_analytic),
    # then free the planes and regenerate the same problem in f64.
    u_hi, u_lo = gen_dd(key)
    f, _info = solve_mbar_dd(u_hi, u_lo, np.full(B.K, float(B.N_PER_STATE)), tol=1e-12)
    f = np.asarray(f)
    f = f - f[0]
    del u_hi, u_lo
    print("solved", flush=True)
    u64 = gen_f64(key)
    # NOT B._fence: reshape(-1) of an 8.4 GB tiled array materializes a
    # copy (OOM next to the resident matrix); a [0, 0] slice readback is
    # the same hard sync without the copy.
    float(u64[0, 0])
    print("planes resident", flush=True)

    m = _MBAR.from_solution(u64, np.full(B.K, B.N_PER_STATE, np.int64), f)
    K = B.K
    state_map = np.zeros([2, K], int)
    state_map[0, :] = np.arange(K)
    state_map[1, :] = np.arange(K)

    out = {}
    for tag, chunk in (("256M", 256 * 2**20), ("1G", 1024 * 2**20)):
        mbar_mod._AUG_CHUNK_BYTES = chunk
        # pass A only
        r = m.compute_expectations_inner(u64, u64, state_map, return_theta=False)
        t0 = time.time()
        r = m.compute_expectations_inner(u64, u64, state_map, return_theta=False)
        tA = time.time() - t0
        # pass A + B
        r = m.compute_expectations_inner(u64, u64, state_map, return_theta=True)
        t0 = time.time()
        r = m.compute_expectations_inner(u64, u64, state_map, return_theta=True)
        tAB = time.time() - t0
        out[f"passA_{tag}"] = round(tA, 3)
        out[f"passB_{tag}"] = round(tAB - tA, 3)
        print(json.dumps(out), flush=True)

    mbar_mod._AUG_CHUNK_BYTES = 256 * 2**20
    ee = m.compute_entropy_and_enthalpy()
    t0 = time.time()
    ee = m.compute_entropy_and_enthalpy()
    out["entropy_full"] = round(time.time() - t0, 3)

    # all-states expectations for comparison (device-scan path)
    A_obs = np.asarray(u64[0])
    ex = m.compute_expectations(A_obs)
    t0 = time.time()
    ex = m.compute_expectations(A_obs)
    out["expectations_all_states"] = round(time.time() - t0, 3)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
