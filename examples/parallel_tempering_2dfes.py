"""2-D free energy surface from parallel-tempering-style data.

Workflow analog of the reference's examples/parallel-tempering-2dfes/:
replicas sampled at several temperatures are combined with MBAR into the
free energy surface over two collective variables at the target
temperature.  The model surface F(x, y) = 2 x^4 - 3 x^2 + y^2 (double well
in x, harmonic in y) is known exactly.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from pymbar_tpu import FES

T_k = np.array([1.0, 1.35, 1.8, 2.4, 3.2])  # replica temperatures
N_per = 6000
rng = np.random.default_rng(23)


def F(xy):
    x, y = xy[..., 0], xy[..., 1]
    return 2 * x**4 - 3 * x**2 + y**2


def sample_replica(T, n, stride=8):
    xy = np.zeros(2)
    out = np.empty((n, 2))
    for i in range(n * stride):
        prop = xy + rng.normal(0, 0.25, 2)
        dU = (F(prop) - F(xy)) / T
        if dU <= 0 or rng.random() < np.exp(-dU):
            xy = prop
        if i % stride == stride - 1:
            out[i // stride] = xy
    return out


def main():
    K = len(T_k)
    print(f"Sampling {K} replicas x {N_per} snapshots...")
    xy_kn = np.concatenate([sample_replica(T, N_per) for T in T_k])
    E_n = F(xy_kn)
    N_k = np.full(K, N_per)

    # Reduced potentials of every sample at every replica temperature
    u_kn = E_n[None, :] / T_k[:, None]
    u_n = E_n / T_k[0]  # target: the coldest temperature

    fes = FES(u_kn, N_k)
    edges = [np.linspace(-1.6, 1.6, 17), np.linspace(-2.2, 2.2, 13)]
    fes.generate_fes(u_n, xy_kn, fes_type="histogram", histogram_parameters={"bin_edges": edges})

    cx = 0.5 * (edges[0][1:] + edges[0][:-1])
    cy = 0.5 * (edges[1][1:] + edges[1][:-1])
    gx, gy = np.meshgrid(cx, cy, indexing="ij")
    queries = np.column_stack([gx.ravel(), gy.ravel()])

    res = fes.get_fes(
        queries, reference_point="from-lowest", uncertainty_method="analytical"
    )
    f_est = res["f_i"].reshape(len(cx), len(cy))

    # The histogram estimates -ln integral_bin exp(-E/T0): compare against
    # the bin-INTEGRATED truth (a bin-center comparison would be dominated
    # by binning bias on this steep surface, not statistics).
    sub = 12
    truth = np.zeros((len(cx), len(cy)))
    for i in range(len(cx)):
        for j in range(len(cy)):
            xs = np.linspace(edges[0][i], edges[0][i + 1], sub)
            ys = np.linspace(edges[1][j], edges[1][j + 1], sub)
            gxx, gyy = np.meshgrid(xs, ys, indexing="ij")
            pts = np.column_stack([gxx.ravel(), gyy.ravel()])
            truth[i, j] = -np.log(np.mean(np.exp(-F(pts) / T_k[0])))
    truth -= np.nanmin(truth[np.isfinite(f_est)])

    print("\nFES slice along x at y~0 (estimated vs true, in kT at T0):")
    jmid = len(cy) // 2
    for i in range(len(cx)):
        e, t, d = f_est[i, jmid], truth[i, jmid], res["df_i"].reshape(f_est.shape)[i, jmid]
        mark = "" if not np.isfinite(e) else f"{e:8.3f} vs {t:8.3f}  (+- {d:.3f})"
        print(f"  x={cx[i]:6.2f}: {mark or 'no samples'}")

    mask = np.isfinite(f_est)
    dfm = res["df_i"].reshape(f_est.shape)
    z = np.abs(f_est - truth)[mask] / np.where(dfm[mask] == 0, 1, dfm[mask])
    print(f"\nmax |error|/sigma over populated bins: {np.max(z):.2f}")


if __name__ == "__main__":
    main()
