"""Heat capacity by temperature reweighting with MBAR.

Workflow analog of the reference's examples/heat-capacity/: simulations at a
few temperatures are reweighted to a dense grid of unsampled temperatures;
<E>(T) comes from compute_expectations on perturbed states and the heat
capacity from the fluctuation formula C_v = (<E^2> - <E>^2) / (k_B T^2).
The model system (independent harmonic oscillators) has C_v = N k_B / 2
exactly, so the result is checkable.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from pymbar_tpu import MBAR

kB = 1.0  # work in reduced units
n_osc = 10  # independent oscillators -> Cv = n_osc/2 exactly
T_sim = np.array([0.8, 1.0, 1.25, 1.6])  # sampled temperatures
N_per = 4000
T_grid = np.linspace(0.85, 1.5, 14)  # reweighting targets


def main():
    rng = np.random.default_rng(3)
    K = len(T_sim)

    # Sample E = sum of n_osc quadratic modes at each temperature:
    # x_i ~ N(0, sqrt(T)); E = sum x_i^2 / 2 -> E ~ Gamma(n_osc/2, T)
    E_n = np.concatenate(
        [0.5 * np.sum(rng.normal(0, np.sqrt(T), (N_per, n_osc)) ** 2, axis=1) for T in T_sim]
    )
    N_k = np.full(K, N_per)

    # Reduced potentials at every sampled temperature
    beta_k = 1.0 / (kB * T_sim)
    u_kn = beta_k[:, None] * E_n[None, :]

    mbar = MBAR(u_kn, N_k)

    # Reweight to the dense grid: perturbed reduced potentials
    beta_grid = 1.0 / (kB * T_grid)
    u_ln = beta_grid[:, None] * E_n[None, :]

    res_E = mbar.compute_expectations(E_n, u_kn=u_ln)
    res_E2 = mbar.compute_expectations(E_n**2, u_kn=u_ln)

    E_T = res_E["mu"]
    varE_T = res_E2["mu"] - E_T**2
    Cv_T = varE_T / (kB * T_grid**2)

    print(f"{'T':>6} {'<E>':>9} {'+-':>6} {'<E> exact':>10} {'Cv':>7} {'Cv exact':>9}")
    for i, T in enumerate(T_grid):
        print(
            f"{T:6.3f} {E_T[i]:9.4f} {res_E['sigma'][i]:6.4f} "
            f"{n_osc * T / 2:10.4f} {Cv_T[i]:7.3f} {n_osc / 2:9.3f}"
        )

    err = np.abs(E_T - n_osc * T_grid / 2) / res_E["sigma"]
    print(f"\nmax |<E> error|/sigma over the grid: {err.max():.2f}")


if __name__ == "__main__":
    main()
