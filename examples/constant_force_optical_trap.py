"""1-D free energy profile from constant-force single-molecule pulling.

Workflow analog of the reference's examples/constant-force-optical-trap/
(force-bias-optical-trap.py, after Woodside et al., PNAS 103:6190, 2006):
force-clamp trajectories of a molecular extension x are recorded at several
constant biasing forces, decorrelated with the timeseries tools, combined
with MBAR under the linear bias u_k(x) = -beta F_k (x - x0_k), and binned
into an unbiased extension free energy profile with equal-population
(non-uniform) bins plus the Jacobian ln(bin width) correction.

The reference analyzes bundled experimental hairpin data; here the
"experiment" is synthetic — a two-state (folded/unfolded) extension
landscape sampled with a Metropolis chain so the trajectories carry
realistic correlation times and the recovered profile has an exact answer.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from pymbar_tpu import FES, MBAR, timeseries

rng = np.random.default_rng(20)

# ---------------------------------------------------------------------------
# "Experimental" setup: a two-state hairpin extension landscape (in kT, x in
# nm), pulled at several constant forces.  beta F x enters in kT via the
# same pN nm -> kT conversion the reference uses at T = 296.15 K.
# ---------------------------------------------------------------------------
kB = 1.381e-23
temperature = 296.15
pN_nm_to_kT = (1.0e-9) * (1.0e-12) / (kB * temperature)  # 1 pN nm in kT

X_FOLD, X_UNFOLD = 520.0, 540.0  # nm: the two extension basins
BARRIER = 4.0  # kT barrier between them at the transition force
F_HALF = 12.6  # pN: the transition (half-unfolding) force

# A hairpin with a 20 nm unfolding extension has a zero-force stability of
# ~ F_1/2 * dx ~ 60 kT, so the informative landscape is the one AT the
# transition force (as the experimental papers report it); the force-clamp
# biases below are deviations from F_1/2.


def F0(x):
    """Extension free energy at F = F_1/2 (kT): two harmonic basins joined
    by a quartic barrier, unfolded basin 1.5 kT above folded."""
    mid = 0.5 * (X_FOLD + X_UNFOLD)
    w = 0.5 * (X_UNFOLD - X_FOLD)
    z = (x - mid) / w
    return BARRIER * (z**2 - 1.0) ** 2 + 0.75 * z


biasing_force_pN = np.array([11.8, 12.2, 12.6, 13.0, 13.4])  # pN
K = len(biasing_force_pN)
T_traj = 30000  # correlated snapshots per force-clamp trajectory


def sample_force_clamp(force_pN, nsteps):
    """Metropolis trajectory under F0(x) - beta (F - F_1/2) x
    (a force-clamp trace relative to the transition force)."""
    beta_F = pN_nm_to_kT * (force_pN - F_HALF)

    def u(x):
        return F0(x) - beta_F * x

    x = 0.5 * (X_FOLD + X_UNFOLD)
    out = np.empty(nsteps)
    for t in range(nsteps):
        prop = x + rng.normal(0.0, 3.5)
        dU = u(prop) - u(x)
        if dU <= 0 or rng.random() < np.exp(-dU):
            x = prop
        out[t] = x
    return out


def construct_nonuniform_bins(x_n, nbins):
    """Equal-population extension bins (reference
    force-bias-optical-trap.py:construct_nonuniform_bins)."""
    N = x_n.size
    sorted_x = np.sort(x_n)
    edges = np.zeros(nbins + 1)
    for i in range(nbins):
        edges[i] = sorted_x[int(N / nbins * i)]
    edges[nbins] = sorted_x[-1] + 1e-5 * (sorted_x[-1] - sorted_x[0])
    centers = 0.5 * (edges[1:] + edges[:-1])
    widths = np.diff(edges)
    return edges, centers, widths


def main():
    print(f"biasing forces (pN): {biasing_force_pN}")
    print(f"Simulating {K} force-clamp trajectories x {T_traj} snapshots...")
    x_kt = np.array([sample_force_clamp(f, T_traj) for f in biasing_force_pN])

    # Decorrelate each trajectory (reference flow: statistical_inefficiency
    # then subsample_correlated_data per trajectory).
    x_kn, N_k = [], []
    for k in range(K):
        g = timeseries.statistical_inefficiency(x_kt[k])
        indices = timeseries.subsample_correlated_data(x_kt[k], g=g)
        x_kn.append(x_kt[k][indices])
        N_k.append(len(indices))
        print(
            f"  trajectory {k + 1}: g = {g:6.1f}, "
            f"{N_k[-1]:5d} uncorrelated samples of {T_traj}"
        )
    N_k = np.array(N_k)
    x_n = np.concatenate(x_kn)
    N = x_n.size

    # Zero of each biasing potential at the trajectory mean (as in the
    # reference), then reduced bias energies u_kln -> u_kn.
    x0_k = np.array([xk.mean() for xk in x_kn])
    beta_F_k = pN_nm_to_kT * (biasing_force_pN - F_HALF)
    # u_k(x) = F0-free bias only: -beta F_k (x - x0_k); MBAR needs only
    # bias differences between states.
    u_kn = -beta_F_k[:, None] * (x_n[None, :] - x0_k[:, None])

    print("Running MBAR (robust protocol)...")
    mbar = MBAR(u_kn, N_k, relative_tolerance=1.0e-10, solver_protocol="robust")
    results = mbar.compute_free_energy_differences()
    print("Delta f between force-clamp states (kT):")
    print(np.array2string(results["Delta_f"][0], precision=2))

    # Unbiased reduced potential of every sample (zero external force).
    u_n = np.zeros(N)

    nbins = 40
    edges, centers, widths = construct_nonuniform_bins(x_n, nbins)

    print("Computing extension free energy profile...")
    fes = FES(u_kn, N_k, mbar_options=dict(solver_protocol="robust"))
    fes.generate_fes(u_n, x_n, histogram_parameters=dict(bin_edges=edges))
    out = fes.get_fes(
        centers, reference_point="from-lowest", uncertainty_method="analytical"
    )
    # Jacobian correction for non-uniform bin widths (reference flow).
    fes_i = out["f_i"] + np.log(widths)
    fes_i -= fes_i.min()
    df_i = out["df_i"]

    # The histogram estimates the BIN-AVERAGED Boltzmann weight, so the
    # exact target for bin i is -ln(<exp(-F0)>_bin) (a wide bin across the
    # barrier genuinely reads lower than F0 at its center).
    trapezoid = getattr(np, "trapezoid", None) or np.trapz  # numpy<2 compat
    f_true = np.empty(nbins)
    for i in range(nbins):
        xx = np.linspace(edges[i], edges[i + 1], 64)
        f_true[i] = -np.log(trapezoid(np.exp(-F0(xx)), xx) / widths[i])
    f_true -= f_true[np.argmin(fes_i)]

    print(f"\n{'x (nm)':>8} {'F (kT)':>8} {'dF':>6} {'exact':>8}")
    for i in range(nbins):
        print(f"{centers[i]:8.2f} {fes_i[i]:8.2f} {df_i[i]:6.2f} {f_true[i]:8.2f}")

    # The estimate should track the true landscape within a few sigma over
    # the well-sampled region (df floor guards bins whose clamped
    # analytical variance underflows to zero).
    core = (centers > X_FOLD - 5) & (centers < X_UNFOLD + 5)
    z = (fes_i - f_true)[core] / np.maximum(df_i[core], 0.25)
    print(f"\nmax |z| over the sampled region: {np.max(np.abs(z)):.2f}")
    assert np.max(np.abs(z)) < 6.0, "FES deviates from the exact landscape"
    print("OK: recovered profile matches the exact two-state landscape.")


if __name__ == "__main__":
    main()
