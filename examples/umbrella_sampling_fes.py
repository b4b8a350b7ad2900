"""1-D umbrella-sampling free energy profile with three FES estimators.

Workflow analog of the reference's examples/umbrella-sampling-fes/: biased
simulations along a reaction coordinate are combined with MBAR into an
unbiased free energy profile, via histogram (with analytical uncertainties),
weighted-KDE, and maximum-likelihood B-spline estimators.  The underlying
surface here is a double well, F(x) = a x^4 - b x^2, known exactly.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from pymbar_tpu import FES

rng = np.random.default_rng(17)

# True free energy surface (double well) and umbrella setup
a4, b2 = 5.0, 4.0


def F_true(x):
    return a4 * x**4 - b2 * x**2


K = 24  # umbrella windows
centers = np.linspace(-1.3, 1.3, K)
kappa = 120.0  # umbrella spring constant
n_per = 400


def sample_window(c, n):
    """Metropolis sampling of exp(-F(x) - kappa/2 (x-c)^2)."""
    x = c
    out = np.empty(n)
    naccept = 0
    for i in range(n * 10):  # stride 10 to decorrelate
        prop = x + rng.normal(0, 0.12)
        dU = (F_true(prop) + 0.5 * kappa * (prop - c) ** 2) - (
            F_true(x) + 0.5 * kappa * (x - c) ** 2
        )
        if dU <= 0 or rng.random() < np.exp(-dU):
            x = prop
            naccept += 1
        if i % 10 == 9:
            out[i // 10] = x
    return out


def main():
    print(f"Sampling {K} umbrella windows x {n_per} snapshots...")
    x_kn = np.array([sample_window(c, n_per) for c in centers])
    x_n = x_kn.reshape(-1)
    N_k = np.full(K, n_per)

    # Reduced potentials of every sample in every window's biased ensemble
    u_kn = F_true(x_n)[None, :] + 0.5 * kappa * (x_n[None, :] - centers[:, None]) ** 2
    u_n = F_true(x_n)  # the unbiased target state

    fes = FES(u_kn, N_k)

    edges = np.linspace(-1.45, 1.45, 30)
    qc = 0.5 * (edges[1:] + edges[:-1])
    truth = F_true(qc) - F_true(qc).min()

    # --- histogram with analytical uncertainties
    fes.generate_fes(u_n, x_n, fes_type="histogram", histogram_parameters={"bin_edges": edges})
    hist = fes.get_fes(
        qc.reshape(-1, 1), reference_point="from-lowest", uncertainty_method="analytical"
    )

    # --- weighted Gaussian KDE
    fes.generate_fes(u_n, x_n, fes_type="kde", kde_parameters={"bandwidth": 0.05})
    kde = fes.get_fes(qc.reshape(-1, 1), reference_point="from-lowest")

    # --- maximum-likelihood B-spline
    ok = np.isfinite(hist["f_i"])  # unpopulated bins are NaN; skip for init
    spline_parameters = dict(
        spline_weights="unbiasedstate",
        nspline=10,
        spline_initialize="explicit",
        xinit=qc[ok],
        yinit=hist["f_i"][ok],
        xrange=[-1.45, 1.45],
        fkbias=[lambda x, c=c: 0.5 * kappa * (x - c) ** 2 for c in centers],
        kdegree=3,
        optimization_algorithm="Newton-CG",
        optimize_options={"disp": False, "tol": 1e-6},
        objective="ml",
        map_data=None,
    )
    fes.generate_fes(u_n, x_n, fes_type="spline", spline_parameters=spline_parameters)
    spl = fes.get_fes(qc.reshape(-1, 1), reference_point="from-lowest")
    print(f"spline AIC = {fes.get_information_criteria('aic'):.1f}, "
          f"BIC = {fes.get_information_criteria('bic'):.1f}")

    print(f"\n{'x':>7} {'true':>8} {'hist':>8} {'+-':>6} {'kde':>8} {'spline':>8}")
    for i in range(0, len(qc), 3):
        print(
            f"{qc[i]:7.3f} {truth[i]:8.3f} {hist['f_i'][i]:8.3f} "
            f"{hist['df_i'][i]:6.3f} {kde['f_i'][i]:8.3f} {spl['f_i'][i]:8.3f}"
        )

    ok = np.nanmax(np.abs(hist["f_i"] - truth) / np.where(hist["df_i"] == 0, 1, hist["df_i"]))
    print(f"\nhistogram max |error|/sigma = {ok:.2f} (should be a few sigma at most)")


if __name__ == "__main__":
    main()
