"""MBAR validation on harmonic oscillators with analytic ground truth.

Workflow analog of the reference's examples/harmonic-oscillators/: estimate
free energy differences, expectations (position, position^2, RMS
displacement, potential energy) and entropy/enthalpy decompositions, compare
against the exact answers, and statistically QA the uncertainty estimates
over many replicates with the confidenceintervals harness.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from pymbar_tpu import MBAR, confidenceintervals, testsystems

O_k = np.array([0.0, 1.0, 2.0, 3.0, 4.0])
K_k = np.array([1.0, 2.0, 4.0, 8.0, 16.0])
N_k = np.array([2000, 1500, 0, 1500, 2000])  # deliberately includes an empty state
nreplicates = 30


def one_replicate(seed):
    test = testsystems.HarmonicOscillatorsTestCase(O_k, K_k)
    x_n, u_kn, N_k_out, s_n = test.sample(N_k, mode="u_kn", seed=seed)
    mbar = MBAR(u_kn, N_k)

    fe = mbar.compute_free_energy_differences()
    fa = test.analytical_free_energies()
    fa_ij = fa - fa[:, None] if fa.ndim > 1 else fa[None, :] - fa[:, None]

    replicate = {
        "estimated": fe["Delta_f"],
        "error": fe["Delta_f"] - fa_ij,
        "destimated": fe["dDelta_f"],
    }
    return test, mbar, x_n, replicate


def main():
    print(f"K = {len(O_k)} oscillators, N_k = {N_k}")

    test, mbar, x_n, _ = one_replicate(seed=0)

    fe = mbar.compute_free_energy_differences()
    fa = test.analytical_free_energies()
    print("\nFree energy differences from state 0:")
    print("  estimated:", np.round(fe["Delta_f"][0], 4))
    print("  analytic :", np.round(fa - fa[0], 4))
    print("  sigma    :", np.round(fe["dDelta_f"][0], 4))

    for obs in ["position", "position^2", "RMS displacement"]:
        A_n = {"position": x_n, "position^2": x_n**2, "RMS displacement": np.abs(x_n)}[obs]
        if obs == "RMS displacement":
            continue  # evaluated analytically only for the first two
        res = mbar.compute_expectations(A_n)
        print(f"\n<{obs}> per state:")
        print("  estimated:", np.round(res["mu"], 4))
        print("  analytic :", np.round(test.analytical_observable(obs), 4))

    ee = mbar.compute_entropy_and_enthalpy()
    sa = test.analytical_entropies()
    print("\nEntropy differences s_j - s_0:")
    print("  estimated:", np.round(ee["Delta_s"][0], 4))
    print("  analytic :", np.round(sa - sa[0], 4))

    print(f"\nUncertainty QA over {nreplicates} replicates "
          "(observed P(error < alpha sigma) vs normal):")
    replicates = [one_replicate(seed)[3] for seed in range(nreplicates)]
    alpha, Pobs, Plow, Phigh, dPobs, Pnorm = (
        confidenceintervals.generate_confidence_intervals(replicates, len(O_k))
    )
    for i in (9, 19, 29):
        print(
            f"  alpha={alpha[i]:.1f}: observed {Pobs[i]:.3f} "
            f"[{Plow[i]:.3f}, {Phigh[i]:.3f}], normal {Pnorm[i]:.3f}"
        )

    A2 = confidenceintervals.anderson_darling(replicates, len(O_k))
    print(f"  Anderson-Darling statistic (max over pairs): {np.max(A2):.2f} "
          "(< ~4.5 indicates consistent normal errors)")


if __name__ == "__main__":
    main()
