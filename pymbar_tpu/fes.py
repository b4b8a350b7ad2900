"""Free energy surfaces from MBAR-weighted samples: histogram, KDE, spline.

Capability parity with the reference ``pymbar/fes.py`` class ``FES``
(/root/reference/pymbar/fes.py:47-2477):

* histogram FES with analytical (augmented-Theta) or bootstrap uncertainties
* kernel-density FES — here a native JAX weighted Gaussian KDE
  (:mod:`pymbar_tpu.kde`) replaces the reference's sklearn dependency
* B-spline maximum-likelihood / MAP FES (Shirts & Ferguson,
  arXiv:2001.01170) with Custom-NR or scipy optimizers, AIC/BIC
* Metropolis MC sampling of the spline-coefficient posterior with
  decorrelation and Bayesian confidence intervals

Heavy lifting (the internal MBAR solve, per-sample unnormalized log weights,
augmented covariance) runs on device through :class:`pymbar_tpu.MBAR`; the
spline bookkeeping is host-side scipy, as the parameter count is tiny.

Known reference bugs intentionally fixed rather than reproduced:
* the bootstrap loop re-created the MBAR object once per origin state
  instead of once per bootstrap (fes.py:394-406 indentation);
* the 'all-differences' analytical path indexed the covariance diagonal
  with a tuple (fes.py:1487) and crashed; implemented correctly here;
* querying an unpopulated bin raised KeyError; returns NaN here.
"""

import logging
import math
from timeit import default_timer as timer

import numpy as np
from scipy.integrate import quad
from scipy.interpolate import BSpline, make_lsq_spline
from scipy.optimize import minimize

import pymbar_tpu
from pymbar_tpu import timeseries
from pymbar_tpu.kde import GaussianKDE
from pymbar_tpu.utils import DataError, ParameterError, kln_to_kn, kn_to_n, logsumexp

logger = logging.getLogger(__name__)

__all__ = ["FES"]


class FES:
    """Free energy surface (profile) generation with statistical uncertainties.

    References: Shirts & Chodera JCP 129:124105 (2008); Shirts & Ferguson
    arXiv:2001.01170.  Input samples must be uncorrelated (subsample first).
    """

    def __init__(self, u_kn, N_k, verbose=False, mbar_options=None, timings=True, **kwargs):
        """Build the internal MBAR object over the sampled states.

        ``mbar_options`` passes through maximum_iterations, relative_tolerance,
        verbose, initial_f_k, solver_protocol, initialize, x_kindices
        (reference fes.py:74-210).
        """
        for key, val in kwargs.items():
            logger.warning(f"Warning: parameter {key}={val} is unrecognized and unused.")

        self.N_k = np.array(N_k, dtype=np.int64)
        self.N = int(np.sum(self.N_k))

        if len(np.shape(u_kn)) == 3:
            self.K = np.shape(u_kn)[1]
            u_kn = kln_to_kn(u_kn, N_k=self.N_k)

        self.u_kn = np.array(u_kn, dtype=np.float64)
        K, N = np.shape(self.u_kn)

        if np.sum(self.N_k) != N:
            raise ParameterError(
                "The sum of all N_k must equal the total number of samples "
                "(length of second dimension of u_kn."
            )

        self.K = K
        self.N = N
        self.verbose = verbose
        self.timings = bool(timings)

        if mbar_options is None:
            fes_mbar = pymbar_tpu.MBAR(u_kn, N_k)
        else:
            mbar_options = dict(mbar_options)
            for o in (
                "maximum_iterations",
                "relative_tolerance",
                "verbose",
                "initial_f_k",
                "solver_protocol",
                "initialize",
                "x_kindices",
            ):
                mbar_options.setdefault(o, None)
            if mbar_options["maximum_iterations"] is None:
                mbar_options["maximum_iterations"] = 10000
            if mbar_options["relative_tolerance"] is None:
                mbar_options["relative_tolerance"] = 1.0e-7
            if mbar_options["initialize"] is None:
                mbar_options["initialize"] = "zeros"

            fes_mbar = pymbar_tpu.MBAR(
                u_kn,
                N_k,
                maximum_iterations=mbar_options["maximum_iterations"],
                relative_tolerance=mbar_options["relative_tolerance"],
                verbose=bool(mbar_options["verbose"]),
                initial_f_k=mbar_options["initial_f_k"],
                solver_protocol=mbar_options["solver_protocol"],
                initialize=mbar_options["initialize"],
                x_kindices=mbar_options["x_kindices"],
            )

        self.mbar = fes_mbar

        self.fes_type = None
        self.u_n = None
        self.n_bootstraps = 0
        self.w_n = None
        self.w_kn = None
        self.fes_function = None
        self.fes_functions = None
        self.histogram_data = None
        self.histogram_datas = None
        self.histogram_parameters = None
        self.kde = None
        self.kdes = None
        self.kde_parameters = None
        self.spline_data = None
        self.spline_parameters = None
        self.mc_data = None

        if self.verbose:
            logger.info("FES initialized")

    # -------------------------------------------------------------------------
    # Generation
    # -------------------------------------------------------------------------

    def generate_fes(
        self,
        u_n,
        x_n,
        fes_type="histogram",
        histogram_parameters=None,
        kde_parameters=None,
        spline_parameters=None,
        n_bootstraps=0,
        seed=-1,
    ):
        """Fit the FES of the state whose reduced potential per sample is u_n.

        fes_type in {'histogram', 'kde', 'spline'}; n_bootstraps must be 0 or
        >= 2; returns {'timing': seconds} when timings were requested
        (reference fes.py:221-438).
        """
        result_vals = dict()
        self.fes_type = fes_type

        if len(np.shape(u_n)) == 2:
            u_n = kn_to_n(u_n, N_k=self.N_k)
        self.u_n = np.asarray(u_n)

        if seed >= 0:
            np.random.seed(seed)

        if not np.issubdtype(type(n_bootstraps), np.integer) or n_bootstraps == 1:
            raise ValueError(
                f"n_bootstraps must be an integer of 0 or >=2, it was set to {n_bootstraps}"
            )
        self.n_bootstraps = n_bootstraps

        if self.timings:
            start = timer()

        self.fes_function = list()
        self.mc_data = None

        if fes_type == "histogram":
            self._setup_fes_histogram(histogram_parameters)
        elif fes_type == "kde":
            self._setup_fes_kde(kde_parameters)
        elif fes_type == "spline":
            self._setup_fes_spline(spline_parameters)
        else:
            raise ParameterError(f"fes_type {fes_type} is not defined!")

        N_k = self.mbar.N_k
        K = self.mbar.K
        N = int(np.sum(N_k))

        x_n = np.asarray(x_n)
        bootstrap_indices = np.arange(0, N)

        for b in range(n_bootstraps + 1):
            if b == 0:
                bootstrap_indices = np.arange(0, N)
                mbar = self.mbar
                x_nb = x_n
            else:
                # Per-state resampling; one MBAR re-solve per bootstrap,
                # warm-started from the converged f_k.
                index = 0
                for k in range(K):
                    bootstrap_indices[index : index + N_k[k]] = index + np.random.randint(
                        0, N_k[k], size=N_k[k]
                    )
                    index += N_k[k]
                mbar = pymbar_tpu.MBAR(
                    self.u_kn[:, bootstrap_indices],
                    self.N_k,
                    initial_f_k=self.mbar.f_k,
                )
                x_nb = x_n[bootstrap_indices]

            # Unnormalized log weights of the target state (device reduction).
            log_w_nb = mbar._computeUnnormalizedLogWeights(self.u_n[bootstrap_indices])
            max_log_w_nb = np.max(log_w_nb)
            w_nb = np.exp(log_w_nb - max_log_w_nb)
            w_nb = w_nb / np.sum(w_nb)
            w_knb = np.exp(mbar.Log_W_nk)

            if b == 0:
                self.w_n = w_nb
                self.w_kn = w_knb

            if fes_type == "histogram":
                self._generate_fes_histogram(b, x_nb, w_nb, log_w_nb)
            elif fes_type == "kde":
                self._generate_fes_kde(b, x_nb, w_nb)
            elif fes_type == "spline":
                self._generate_fes_spline(b, x_nb, w_nb)

        if self.timings:
            result_vals["timing"] = timer() - start

        return result_vals

    # --------------------------- histogram ----------------------------------

    def _setup_fes_histogram(self, histogram_parameters):
        """Validate bin_edges (list of per-dimension edge arrays)."""
        if "bin_edges" not in histogram_parameters:
            raise ParameterError(
                "histogram_parameters['bin_edges'] cannot be undefined with "
                "fes_type = histogram"
            )
        # Normalize to a list of per-dimension edge arrays.  (np.shape on a
        # ragged list of unequal-length edge arrays raises; probe the first
        # element instead so unequal grids per dimension work.)
        be = histogram_parameters["bin_edges"]
        if isinstance(be, np.ndarray) and be.ndim == 1:
            be = [be]
        elif np.isscalar(be[0]):
            be = [np.asarray(be)]
        else:
            be = [np.asarray(e) for e in be]
        histogram_parameters["bin_edges"] = be

        self.histogram_parameters = histogram_parameters
        self.histogram_data = None
        self.histogram_datas = list() if self.n_bootstraps > 0 else None

    def _generate_fes_histogram(self, b, x_n, w_nb, log_w_nb):
        """Bin samples and compute per-bin free energies f_i = -logsumexp(log w).

        Bin bookkeeping follows the reference (fes.py:440-600): integer bin
        labels by positional encoding sum_d bin_d * len(bins_d)^d; out-of-grid
        samples get label -1; a stable ``bin_order`` fixed by the b==0 pass
        keeps free energies aligned across bootstraps.  The per-sample loops
        are vectorized here.
        """
        histogram_parameters = self.histogram_parameters
        bins = histogram_parameters["bin_edges"]
        dims = len(bins)

        histogram_data = dict(dims=dims, bins=bins)

        if len(np.shape(x_n)) == 1:
            x_n = x_n.reshape(-1, 1)

        bin_n = np.zeros(x_n.shape, int)
        bin_length = np.zeros(dims, int)
        for d in range(dims):
            bin_length[d] = len(bins[d])
            bin_n[:, d] = np.digitize(x_n[:, d], bins[d]) - 1

        histogram_data["bin_n"] = bin_n

        # Positional-encoded integer label per sample; -1 when out of grid.
        weights_d = bin_length.astype(np.int64) ** np.arange(dims)
        encoded = bin_n @ weights_d
        out_of_grid = np.any(bin_n < 0, axis=1)
        sample_label = np.where(out_of_grid, -1, encoded).astype(int)

        # First-occurrence-ordered unique bins (reference appends bins in
        # sample order).
        _, first_idx = np.unique(sample_label, return_index=True)
        first_idx = np.sort(first_idx)
        nonzero_bins = [tuple(bin_n[i]) for i in first_idx]
        bin_label = {tuple(bin_n[i]): int(sample_label[i]) for i in first_idx}

        histogram_data["nonzero_bins"] = nonzero_bins
        histogram_data["sample_label"] = sample_label

        if b == 0:
            bin_order = {}
            i = 0
            for bv in bin_label.values():
                if bv not in bin_order:
                    bin_order[bv] = i
                    i += 1
            histogram_data["bin_order"] = bin_order
            histogram_data["bin_label"] = bin_label
        else:
            bin_order = self.histogram_data["bin_order"]

        f_i = np.zeros(max(len(bin_label), len(bin_order)), np.float64)
        for label in bin_label.values():
            indices = np.where(sample_label == label)
            if len(indices[0]) == 0:
                raise DataError(
                    f"WARNING: bin {label} has no samples -- all bins must "
                    "have at least one sample."
                )
            if label in bin_order:
                f_i[bin_order[label]] = -logsumexp(log_w_nb[indices])

        histogram_data["f"] = f_i

        if b == 0:
            self.histogram_data = histogram_data
        else:
            self.histogram_datas.append(histogram_data)

    # ------------------------------ KDE -------------------------------------

    def _setup_fes_kde(self, kde_parameters):
        """Configure the weighted Gaussian KDE (native JAX; sklearn surface)."""
        kde = GaussianKDE()
        kde_defaults = kde.get_params()
        for k in kde_defaults:
            if k in kde_parameters:
                kde_defaults[k] = kde_parameters[k]
        for k in kde_parameters:
            if k not in kde_defaults:
                raise ParameterError(
                    f"Warning: {k} is not a parameter in KernelDensity"
                )
        kde.set_params(**kde_defaults)

        self.kde_parameters = kde_parameters
        self.kdes = list() if self.n_bootstraps > 0 else None
        self.kde = kde

    def _generate_fes_kde(self, b, x_n, w_n):
        """Fit the (bootstrap) KDE with the MBAR weights of the target state."""
        if len(np.shape(x_n)) == 1:
            x_n = x_n.reshape(-1, 1)

        if b > 0:
            kde = GaussianKDE()
            kde.set_params(**self.kde.get_params())
        else:
            kde = self.kde
        kde.fit(x_n, sample_weight=self.w_n)

        if b > 0:
            self.kdes.append(kde)

    # ----------------------------- spline -----------------------------------

    def _setup_fes_spline(self, spline_parameters):
        """Validate spline options and build the initial B-spline
        (reference fes.py:701-969)."""
        spline_parameters = dict(spline_parameters)
        spline_parameters.setdefault("objective", "ml")
        objective = spline_parameters["objective"]

        if objective not in ["ml", "map"]:
            raise ParameterError(
                f"objective may only be 'ml' or 'map': you have selected {objective}"
            )

        if objective == "ml":
            if spline_parameters.get("map_data") is not None:
                raise ParameterError(
                    "if 'objective' is 'ml' then 'map_data' structure "
                    "containing priors should not be included"
                )
            spline_parameters["map_data"] = dict(
                logprior=None, dlogprior=None, ddlogprior=None
            )
        else:
            map_data = spline_parameters.get("map_data")
            if map_data is None:
                raise ParameterError("MAP data must be defined if objective is MAP")
            if map_data.get("logprior") is None:
                raise ParameterError("log prior must be included if objective is MAP")
            if map_data.get("dlogprior") is None:
                raise ParameterError("d(log prior) must be included if objective is MAP")
            if map_data.get("ddlogprior") is None:
                raise ParameterError("d^2(log prior) must be included if objective is MAP")

        if spline_parameters["optimization_algorithm"] != "Custom-NR":
            if "optimize_options" not in spline_parameters:
                spline_parameters["optimize_options"] = {
                    "disp": True,
                    "ftol": 1e-7,
                    "xtol": 1e-7,
                }
            if "tol" in spline_parameters["optimize_options"]:
                spline_parameters["scipy_tol"] = spline_parameters["optimize_options"]["tol"]
                spline_parameters["optimize_options"].pop("tol", None)
            else:
                spline_parameters["scipy_tol"] = None
            if spline_parameters["optimization_algorithm"] not in [
                "Newton-CG",
                "CG",
                "BFGS",
                "L-BFGS-B",
                "TNC",
                "SLSQP",
            ]:
                raise ParameterError(
                    "Optimization method {:s} is not supported".format(
                        spline_parameters["optimization_algorithm"]
                    )
                )
        else:
            spline_parameters.setdefault("optimize_options", dict())
            if "gtol" not in spline_parameters["optimize_options"]:
                spline_parameters["optimize_options"]["tol"] = 1e-7

        self.spline_parameters = spline_parameters

        xinit, yinit = self._get_initial_spline_points()
        self.spline_data = self._get_initial_spline(xinit, yinit)

        self.fes_functions = list() if self.n_bootstraps > 0 else None

    def _get_initial_spline_points(self):
        """Initial (x, y) control data: bias free energies / explicit / zeros."""
        spline_parameters = self.spline_parameters
        nspline = spline_parameters["nspline"]
        kdegree = spline_parameters["kdegree"]
        xrange = spline_parameters["xrange"]

        mode = spline_parameters["spline_initialize"]
        if mode == "bias_free_energies":
            initvals = self.mbar.f_k
            if "bias_centers" in spline_parameters:
                bias_centers = np.asarray(spline_parameters["bias_centers"])
                sort_indices = np.argsort(bias_centers)
                K = self.mbar.K
                if K < 2 * nspline:
                    noverfit = int(np.round(K / 2))
                    tinit = np.zeros(noverfit + kdegree + 1)
                    tinit[0:kdegree] = xrange[0]
                    tinit[kdegree : noverfit + 1] = np.linspace(
                        xrange[0], xrange[1], num=noverfit + 1 - kdegree, endpoint=True
                    )
                    tinit[noverfit + 1 :] = xrange[1]
                    binit = make_lsq_spline(
                        bias_centers[sort_indices], initvals[sort_indices], tinit, k=kdegree
                    )
                    xinit = np.linspace(xrange[0], xrange[1], num=2 * nspline)
                    yinit = binit(xinit)
                else:
                    xinit = bias_centers[sort_indices]
                    yinit = initvals[sort_indices]
            else:
                xinit = np.linspace(xrange[0], xrange[1], self.mbar.K + 1)[1:-1]
                yinit = initvals
        elif mode == "explicit":
            if "xinit" not in spline_parameters:
                raise ParameterError(
                    "spline_initialize set as explicit, but no xinit array specified"
                )
            if "yinit" not in spline_parameters:
                raise ParameterError(
                    "spline_initialize set as explicit, but no yinit array specified"
                )
            xinit = spline_parameters["xinit"]
            yinit = spline_parameters["yinit"]
        elif mode == "zeros":
            xinit = np.linspace(xrange[0], xrange[1], nspline + kdegree)
            yinit = np.zeros(len(xinit))
        else:
            raise ParameterError(f"Initialization type {mode} not recognized")

        return np.asarray(xinit), np.asarray(yinit)

    def _get_initial_spline(self, xinit, yinit):
        """LSQ-fit the initial spline; precompute basis derivatives and their
        support ranges (reference fes.py:881-969)."""
        spline_data = {}
        spline_parameters = self.spline_parameters

        kdegree = spline_parameters["kdegree"]
        nspline = spline_parameters["nspline"]
        xrange = spline_parameters["xrange"]

        t = np.zeros(nspline + kdegree + 1)
        t[0:kdegree] = xrange[0]
        t[kdegree : nspline + 1] = np.linspace(
            xrange[0], xrange[1], num=nspline + 1 - kdegree, endpoint=True
        )
        t[nspline + 1 :] = xrange[1]

        sort_indices = np.argsort(xinit)
        b = make_lsq_spline(xinit[sort_indices], yinit[sort_indices], t, k=kdegree)
        b.c = b.c - b.c[0]  # FES defined up to a constant; pin c_0 = 0
        xi = b.c[1:]

        # Basis functions (derivatives of the spline wrt each coefficient).
        db_c = []
        for i in range(nspline):
            dc = np.zeros(nspline)
            dc[i] = 1.0
            db_c.append(BSpline(b.t, dc, b.k))

        # Support ranges: basis i lives on [t_i, t_{i+k+1}].
        xrangei = np.zeros([nspline, 2])
        for i in range(nspline):
            xrangei[i, 0] = t[i]
            xrangei[i, 1] = t[i + kdegree + 1]

        xrangeij = np.zeros([nspline, nspline, 2])
        for i in range(nspline):
            for j in range(nspline):
                xrangeij[i, j, 0] = max(xrangei[i, 0], xrangei[j, 0])
                xrangeij[i, j, 1] = min(xrangei[i, 1], xrangei[j, 1])

        spline_data["initial_coefficients"] = xi
        spline_data["bspline_derivatives"] = db_c
        spline_data["bspline"] = b
        spline_data["xrangei"] = xrangei
        spline_data["xrangeij"] = xrangeij
        return spline_data

    def _generate_fes_spline(self, b, x_n, w_n):
        """Maximize the spline log-likelihood (scipy or custom Newton with
        backtracking); store AIC/BIC on the b==0 fit (reference fes.py:971-1098)."""
        # Splines are 1-D; accept (N, 1) column layout and flatten so the
        # objective/gradient return true scalars/vectors.
        x_n = np.asarray(x_n)
        if x_n.ndim == 2 and x_n.shape[1] == 1:
            x_n = x_n[:, 0]

        if b == 0:
            xi = self.spline_data["initial_coefficients"].copy()
        else:
            xi = self.spline_data["first_coefficients"].copy()

        spline_parameters = self.spline_parameters
        func = self._bspline_calculate_f
        grad = self._bspline_calculate_g
        hess = self._bspline_calculate_h
        spline_args = (x_n, w_n)

        if spline_parameters["optimization_algorithm"] != "Custom-NR":
            results = minimize(
                func,
                xi,
                args=spline_args,
                method=spline_parameters["optimization_algorithm"],
                jac=grad,
                tol=spline_parameters["scipy_tol"],
                hess=hess if spline_parameters["optimization_algorithm"] == "Newton-CG" else None,
                options=spline_parameters["optimize_options"],
            )
            bspline = self._val_to_spline(results["x"], form="log")
            savexi = results["x"]
        else:
            opts = spline_parameters["optimize_options"]
            tol = opts.get("gtol", opts.get("tol"))
            # The reference's Custom-NR loop has no iteration cap and spins
            # forever when quadrature noise floors the gradient norm above
            # tol; bound it here and warn instead.
            maxiter = opts.get("maxiter", 200)

            dg = tol * 1e10
            firsttime = True
            fold = np.inf
            xold = xi.copy()
            dx = np.zeros_like(xi)
            iteration = 0
            while dg > tol and iteration < maxiter:
                iteration += 1
                f = func(xi, *spline_args)
                if firsttime:
                    firsttime = False
                else:
                    count = 0
                    # Backtrack when the step overshot.  (The reference's
                    # isinf branch is uncapped and can spin forever and its
                    # 0.9 shrink can't rescue a wildly long Newton step,
                    # fes.py:1049-1056; halve with a hard cap instead.)
                    while (f >= fold + abs(fold) * 0.1 or not np.isfinite(f)) and count < 60:
                        f = fold
                        dx = 0.5 * dx
                        xi = xold - dx
                        xold = xi.copy()
                        f = func(xi, *spline_args)
                        count += 1

                fold = f
                xold = xi.copy()
                g = grad(xi, *spline_args)
                h = hess(xi, *spline_args)
                if not (np.all(np.isfinite(g)) and np.all(np.isfinite(h))):
                    logger.warning(
                        "Custom-NR encountered non-finite derivatives; "
                        "stopping at the last finite iterate."
                    )
                    break
                dx = np.linalg.lstsq(h, g, rcond=None)[0]
                xi = xold - dx
                dg = np.sqrt(np.dot(g, g))
                if opts.get("disp"):
                    logger.info(f"f = {float(f):.10f}. gradient norm = {np.sqrt(dg):.10f}")
            if dg > tol:
                logger.warning(
                    f"Custom-NR did not reach gradient tolerance {tol:g} in "
                    f"{maxiter:d} iterations (gnorm = {dg:g}); quadrature "
                    "noise may floor the achievable gradient norm."
                )
            bspline = self._val_to_spline(xi, form="log")
            savexi = xi

        if b == 0:
            nparameters = len(savexi)
            minus_log_likelihood = func(savexi, *spline_args)
            self.spline_data["first_coefficients"] = savexi
            results_ic = self._calculate_information_criteria(
                nparameters, minus_log_likelihood, self.N
            )
            self.spline_data["aic"] = results_ic["aic"]
            self.spline_data["bic"] = results_ic["bic"]
            self.fes_function = bspline
        else:
            self.fes_functions.append(bspline)

    @staticmethod
    def _calculate_information_criteria(nparameters, minus_log_likelihood, N):
        """AIC = 2p + 2(-lnL); BIC = 2 ln(N) p + 2(-lnL) (reference :1100-1134)."""
        return dict(
            aic=2 * nparameters + 2 * minus_log_likelihood,
            bic=2 * np.log(N) * nparameters + 2 * minus_log_likelihood,
        )

    def get_information_criteria(self, type="akaike"):
        """AIC/BIC of the fitted spline model (reference fes.py:1136-1165)."""
        if self.fes_type != "spline":
            raise ParameterError(
                "Information criteria currently only defined for spline "
                f"approaches, you are currently using {self.fes_type}"
            )
        if type in ["akaike", "Akaike", "AIC", "aic"]:
            return self.spline_data["aic"]
        if type in ["bayesian", "Bayesian", "BIC", "bic"]:
            return self.spline_data["bic"]
        raise ParameterError(f"Information criteria of type '{type}' not defined")

    # -------------------------------------------------------------------------
    # Evaluation
    # -------------------------------------------------------------------------

    def get_fes(
        self, x, reference_point="from-lowest", fes_reference=None, uncertainty_method=None
    ):
        """FES values (and uncertainties) at query points x.

        Returns dict with 'f_i' (+ 'df_i' when uncertainty_method given);
        see reference fes.py:1167-1231 for reference_point semantics.
        """
        x = np.array(x)
        if len(np.shape(x)) <= 1:
            x = x.reshape(-1, 1)

        if reference_point == "from-specified" and fes_reference is None:
            logger.info(
                "No reference state specified for FES, using "
                "uncertainty_method = from-specified"
            )

        if self.fes_type == "histogram":
            return self._get_fes_histogram(x, reference_point, fes_reference, uncertainty_method)
        if self.fes_type == "kde":
            return self._get_fes_kde(x, reference_point, fes_reference, uncertainty_method)
        if self.fes_type == "spline":
            return self._get_fes_spline(x, reference_point, fes_reference, uncertainty_method)
        raise ParameterError(f"fes_type {self.fes_type} is not supported")

    def get_mbar(self):
        """The internal MBAR object."""
        if self.mbar is not None:
            return self.mbar
        raise DataError("MBAR in the FES object is not initialized, cannot return it.")

    def get_kde(self):
        """The fitted KDE object (fes_type == 'kde' only)."""
        if self.fes_type == "kde":
            if self.kde is not None:
                return self.kde
            raise ParameterError(
                "Can't return the KernelDensity object because kde not yet defined"
            )
        raise ParameterError("Can't return the KernelDensity object because fes_type != kde")

    def _get_fes_histogram(
        self, x, reference_point="from-lowest", fes_reference=None, uncertainty_method=None
    ):
        """Histogram FES evaluation with analytical (augmented W_nk -> Theta)
        or bootstrap uncertainties (reference fes.py:1263-1521)."""
        histogram_data = self.histogram_data
        histogram_datas = self.histogram_datas

        if np.shape(x)[1] != histogram_data["dims"]:
            raise DataError(
                "query coordinates have inconsistent dimension with the data "
                "the FES is fit to."
            )

        if uncertainty_method not in ["bootstrap", "analytical", None]:
            raise ParameterError(
                f"Uncertainty_method {uncertainty_method} is not a valid option"
            )

        if uncertainty_method == "bootstrap":
            if histogram_datas is None:
                raise ParameterError(
                    "Can't calculate uncertainties via bootstrap if "
                    "bootstrapping was not performed when running get_fes"
                )
            n_bootstraps = len(histogram_datas)

        result_vals = {}

        bins = histogram_data["bins"]
        dims = histogram_data["dims"]
        bin_order = histogram_data["bin_order"]
        nbins = len(bin_order)

        loc_indices = np.zeros([len(x), dims], dtype=int)
        for d in range(dims):
            loc_indices[:, d] = np.digitize(x[:, d], bins[d]) - 1

        if reference_point == "from-specified":
            if fes_reference is None:
                raise ParameterError("Specified reference point for FES not given")
            if dims == 1 and np.ndim(fes_reference) == 0:
                fes_reference = [fes_reference]
            fes_ref_grid = np.zeros([dims], dtype=int)
            for d in range(dims):
                fes_ref_grid[d] = np.digitize(fes_reference[d], bins[d]) - 1
                if fes_ref_grid[d] == -1 or fes_ref_grid[d] == len(bins[d]):
                    raise ParameterError(
                        "Specified reference point coordinate {:f} in dim {:d} "
                        "grid point is out of the FES region [{:f},{:f}]".format(
                            fes_ref_grid[d], d, np.min(bins[d]), np.max(bins[d])
                        )
                    )

        Theta_ij = None
        j = 0
        f_i = histogram_data["f"].copy()
        df_i = np.zeros(len(f_i), np.float64)

        if reference_point in ["from-lowest", "from-specified", "all-differences"]:
            if reference_point == "from-lowest":
                j = histogram_data["f"].argmin()
            elif reference_point == "from-specified":
                ref_bin_label = histogram_data["bin_label"][tuple(fes_ref_grid)]
                j = bin_order[ref_bin_label]

            f_i = histogram_data["f"] - histogram_data["f"][j]

            if uncertainty_method == "analytical" or (
                reference_point == "all-differences" and uncertainty_method == "analytical"
            ):
                Theta_ij = self._histogram_augmented_theta(histogram_data, nbins, bin_order)
                K = self.mbar.K
                for i in range(nbins):
                    df_i[i] = math.sqrt(
                        Theta_ij[K + i, K + i]
                        + Theta_ij[K + j, K + j]
                        - 2.0 * Theta_ij[K + i, K + j]
                    )
            elif uncertainty_method == "bootstrap":
                fall = np.zeros([len(histogram_data["f"]), n_bootstraps])
                for b in range(n_bootstraps):
                    h = histogram_datas[b]
                    fall[:, b] = h["f"] - h["f"][j]
                df_i = np.std(fall, axis=1)

        elif reference_point == "from-normalization":
            raise ParameterError(
                "uncertainty_method 'from-normalization' is not currently "
                "supported for histograms"
            )

        # Map query points to bins; out-of-grid / unpopulated -> NaN.
        fx_vals = np.zeros(len(x))
        dfx_vals = np.zeros(len(x))
        maxp = np.array([len(bins[d]) for d in range(dims)])

        query_orders = np.full(len(x), -1, dtype=int)
        for i, l in enumerate(loc_indices):
            if np.any(l < 0) or np.any(l >= maxp - 1):
                fx_vals[i] = np.nan
                dfx_vals[i] = np.nan
                continue
            bl = histogram_data["bin_label"].get(tuple(l), -1)
            if bl >= 0:
                fx_vals[i] = f_i[bin_order[bl]]
                dfx_vals[i] = df_i[bin_order[bl]]
                query_orders[i] = bin_order[bl]
            else:
                fx_vals[i] = np.nan
                dfx_vals[i] = np.nan

        result_vals["f_i"] = fx_vals
        if uncertainty_method is not None:
            result_vals["df_i"] = dfx_vals

        if reference_point == "all-differences":
            # Full matrix of pairwise uncertainties between query points.
            # (The reference's analytical branch here is broken, fes.py:1487;
            # implemented correctly from the same covariance algebra.)
            if uncertainty_method == "analytical":
                if Theta_ij is None:
                    Theta_ij = self._histogram_augmented_theta(
                        histogram_data, nbins, bin_order
                    )
                K = self.mbar.K
                bin_block = Theta_ij[K : K + nbins, K : K + nbins]
                diag = bin_block.diagonal()
                d2f_ij = diag[:, None] + diag[None, :] - 2 * bin_block
                df_ij = np.sqrt(np.clip(d2f_ij, 0.0, None))

                dfxij_vals = np.full([len(x), len(x)], np.nan)
                for a, va in enumerate(query_orders):
                    for c, vc in enumerate(query_orders):
                        if va >= 0 and vc >= 0:
                            dfxij_vals[a, c] = df_ij[va, vc]
            elif uncertainty_method == "bootstrap":
                nb = len(histogram_datas)
                fall = np.zeros([nbins, nbins, nb])
                for b in range(nb):
                    fb = histogram_datas[b]["f"]
                    fall[:, :, b] = fb[:, None] - fb[None, :]
                df_ij = np.std(fall, axis=2)
                dfxij_vals = np.full([len(x), len(x)], np.nan)
                for a, va in enumerate(query_orders):
                    for c, vc in enumerate(query_orders):
                        if va >= 0 and vc >= 0:
                            dfxij_vals[a, c] = df_ij[va, vc]
            if uncertainty_method is not None:
                result_vals["df_ij"] = dfxij_vals

        return result_vals

    def _histogram_augmented_theta(self, histogram_data, nbins, bin_order):
        """Theta over [K states | nbins bin pseudo-states]: augment W_nk with
        per-bin renormalized weights (reference fes.py:1382-1415)."""
        K = self.mbar.K
        N_k = np.zeros(K + nbins, np.int64)
        N_k[0:K] = self.mbar.N_k
        W_nk = np.zeros([self.mbar.N, K + nbins], np.float64)
        W_nk[:, 0:K] = np.exp(self.mbar.Log_W_nk)

        log_w_n = self.mbar._computeUnnormalizedLogWeights(self.u_n)

        # Every labeled bin — including the pooled out-of-grid pseudo-bin
        # (label -1) when present — occupies a column, as in the reference.
        for label in histogram_data["bin_label"].values():
            if label not in bin_order:
                continue
            indices = np.where(histogram_data["sample_label"] == label)
            flabel = bin_order[label]
            W_nk[indices, K + flabel] = np.exp(
                log_w_n[indices] + histogram_data["f"][flabel]
            )

        return self.mbar._computeAsymptoticCovarianceMatrix(W_nk, N_k)

    def _get_fes_kde(
        self, x, reference_point="from-normalization", fes_reference=None, uncertainty_method=None
    ):
        """KDE FES evaluation (reference fes.py:1523-1609)."""
        if np.shape(x)[1] != np.shape(self.kde.sample())[1]:
            raise DataError(
                "query coordinates have inconsistent dimension with the data "
                "the FES is fit to."
            )

        result_vals = {}
        f_i = -self.kde.score_samples(x)

        fmin = 0.0
        if reference_point == "from-lowest":
            fmin = np.min(f_i)
            f_i = f_i - fmin
        elif reference_point == "from-specified":
            fmin = -self.kde.score_samples(np.array(fes_reference).reshape(1, -1))
            f_i = f_i - fmin
        elif reference_point == "from-normalization":
            pass
        else:
            raise ParameterError(
                f"reference point choice {reference_point} for kde is unavailable"
            )

        result_vals["f_i"] = f_i

        if uncertainty_method is None:
            df_i = None
        elif uncertainty_method == "bootstrap":
            if self.kdes is None:
                raise ParameterError(
                    "Cannot calculate bootstrap error of bootstrap KDE's not determined"
                )
            n_bootstraps = len(self.kdes)
            fall = np.zeros([len(x), n_bootstraps])
            for b in range(n_bootstraps):
                fall[:, b] = -self.kdes[b].score_samples(x) - fmin
            df_i = np.std(fall, axis=1)
        else:
            raise ParameterError(
                f"Uncertainty method {uncertainty_method} for kde is not implemented"
            )

        result_vals["df_i"] = df_i
        return result_vals

    def _get_fes_spline(
        self, x, reference_point="from-lowest", fes_reference=0.0, uncertainty_method=None
    ):
        """Spline FES evaluation (1-D only; reference fes.py:1611-1694)."""
        if np.shape(x)[1] != 1:
            raise DataError("splines FES only supported in 1D")

        result_vals = {}
        x = x[:, 0]
        f_i = self.fes_function(x)

        fmin = 0.0
        if reference_point == "from-lowest":
            fmin = np.min(f_i)
            f_i = f_i - fmin
        elif reference_point == "from-specified":
            fmin = -self.fes_function(np.array(fes_reference).reshape(1, -1))
            f_i = f_i - fmin
        else:
            raise ParameterError(
                f"reference point {reference_point} not implemented for spline fes"
            )

        df_i = None
        if uncertainty_method == "bootstrap":
            if self.fes_functions is None:
                raise ParameterError(
                    "Cannot calculate via uncertainties error if bootstrapping "
                    "was not performed running get_fes"
                )
            n_bootstraps = len(self.fes_functions)
            fall = np.zeros(list(x.shape) + [n_bootstraps])
            for b in range(n_bootstraps):
                fall[:, b] = self.fes_functions[b](x) - fmin
            df_i = np.std(fall, axis=-1)

        result_vals["f_i"] = f_i
        result_vals["df_i"] = df_i
        return result_vals

    # -------------------------------------------------------------------------
    # MCMC over spline parameters
    # -------------------------------------------------------------------------

    def sample_parameter_distribution(self, x_n, mc_parameters=None, decorrelate=True, verbose=True):
        """Metropolis sampling of the spline-coefficient posterior.

        One coefficient perturbed per step; the spline is renormalized
        (int exp(-F) = 1) after every move; the chain is optionally
        decorrelated with the timeseries tools (reference fes.py:1696-1857).
        """
        if self.fes_type != "spline":
            raise ParameterError("Sampling of posterior is only supported for spline type")

        spline_parameters = self.spline_parameters
        if spline_parameters is None:
            raise ParameterError("Must specify spline_parameters to sample the distributions")

        spline_weights = spline_parameters["spline_weights"]
        xrange = spline_parameters["xrange"]

        if self.fes_function is None:
            raise ParameterError(
                "Need to generate an initial splined FES using generate_fes "
                "before performing MCMC sampling"
            )

        if mc_parameters is None:
            logger.info("Using default MC parameters")
            mc_parameters = dict()
        mc_parameters.setdefault("niterations", 5000)
        mc_parameters.setdefault("fraction_change", 0.01)
        mc_parameters.setdefault("sample_every", 50)
        mc_parameters.setdefault("print_every", 1000)
        mc_parameters.setdefault("logprior", lambda x: 0)

        niterations = mc_parameters["niterations"]
        fraction_change = mc_parameters["fraction_change"]
        sample_every = mc_parameters["sample_every"]
        print_every = mc_parameters["print_every"]
        logprior = mc_parameters["logprior"]

        self.mc_data = dict()
        self.mc_data["bspline"] = self.fes_function
        bspline = self.mc_data["bspline"]

        def prob(x):
            return np.exp(-bspline(x))

        norm = self._integrate(prob, xrange[0], xrange[1])
        bspline.c = bspline.c + np.log(norm)

        self.mc_data["original_spline"] = BSpline(bspline.t, bspline.c, bspline.k)

        c = bspline.c
        crange = np.max(c) - np.min(c)
        dc = fraction_change * crange

        self.mc_data["naccept"] = 0
        csamples = np.zeros([len(c), int(niterations) // int(sample_every)])
        logposteriors = np.zeros(int(niterations) // int(sample_every))
        self.mc_data["first_step"] = True

        for n in range(niterations):
            results = self._MC_step(x_n, self.w_n, dc, xrange, spline_weights, logprior)
            if n % sample_every == 0:
                csamples[:, n // sample_every] = results["c"]
                logposteriors[n // sample_every] = results["logposterior"]
            if n % print_every == 0 and verbose:
                logger.info(
                    f"MC Step {n:d} of {niterations:d} "
                    f"{results['logposterior']} {bspline.c}"
                )

        t_mc = 0
        g_mc = None

        if verbose:
            logger.info("Done MC sampling")

        if decorrelate:
            t_mc, g_mc, Neff = timeseries.detect_equilibration(logposteriors)
            logger.info(
                f"First equilibration sample is {t_mc:d} of {len(logposteriors):d}"
            )
            equil_logp = logposteriors[t_mc:]
            g_mc = timeseries.statistical_inefficiency(equil_logp)
            if verbose:
                logger.info(f"Statistical inefficiency of log posterior is {g_mc:.3g}")
            g_c = np.zeros(len(c))
            for nc in range(len(c)):
                g_c[nc] = timeseries.statistical_inefficiency(csamples[nc, t_mc:])
            if verbose:
                logger.info(f"Time series for spline parameters are : {g_c}")
            guse = g_mc
            indices = timeseries.subsample_correlated_data(equil_logp, g=guse)
            logposteriors = equil_logp[indices]
            csamples = (csamples[:, t_mc:])[:, indices]
            if verbose:
                logger.info(f"samples after decorrelation : {np.shape(csamples)[1]:d}")
            self.mc_data["g_parameters"] = g_c
            self.mc_data["g"] = guse

        self.mc_data["samples"] = csamples
        self.mc_data["logposteriors"] = logposteriors
        self.mc_data["mc_parameters"] = mc_parameters
        self.mc_data["acceptance_ratio"] = self.mc_data["naccept"] / niterations
        if verbose:
            logger.info(f"Acceptance rate : {self.mc_data['acceptance_ratio']:5.3f}")
        self.mc_data["nequil"] = t_mc
        self.mc_data["g_logposterior"] = g_mc

    def get_confidence_intervals(self, xplot, plow, phigh, reference="zero"):
        """Percentile bands of the sampled FES at the given x points
        (reference fes.py:1859-1926)."""
        if self.mc_data is None:
            raise DataError("No MC sampling has been done, cannot construct confidence intervals")

        nplot = len(xplot)
        nsamples = len(self.mc_data["logposteriors"])
        samplevals = np.zeros([nplot, nsamples])

        csamples = self.mc_data["samples"]
        base_spline = self.mc_data["original_spline"]

        yvals = base_spline(xplot)
        for n in range(nsamples):
            pcurve = BSpline(base_spline.t, csamples[:, n], base_spline.k)
            samplevals[:, n] = pcurve(xplot)

        ylows = np.percentile(samplevals, plow, axis=1)
        yhighs = np.percentile(samplevals, phigh, axis=1)
        ymedians = np.percentile(samplevals, 50, axis=1)

        if reference == "zero":
            ref = np.min(yvals)
        elif reference is None:
            ref = 0
        else:
            raise ParameterError(f"{reference} is not a valid value for 'reference'")

        return dict(
            plow=ylows - ref,
            phigh=yhighs - ref,
            median=ymedians - ref,
            values=yvals - ref,
        )

    def get_mc_data(self):
        """The MC chain data dict (reference fes.py:1928-1952)."""
        if self.mc_data is None:
            raise DataError("No MC sampling has been done, cannot construct confidence intervals")
        return self.mc_data

    def _get_MC_loglikelihood(self, x_n, w_n, spline_weights, spline, xrange):
        """Minus-log-likelihood of a spline under the chosen weighting
        (reference fes.py:1954-2010)."""
        N = self.N
        K = self.K

        if spline_weights in ["simplesum", "biasedstates"]:
            loglikelihood = 0.0

            def splinek(x, kf):
                return spline(x) + self.spline_parameters["fkbias"][kf](x)

            def expk(x, kf):
                return np.exp(-splinek(x, kf))

            for k in range(K):
                x_kn = x_n[self.mbar.x_kindices == k]
                normalize = np.log(self._integrate(expk, xrange[0], xrange[1], args=(k,)))
                if spline_weights == "simplesum":
                    loglikelihood += (N / K) * np.mean(splinek(x_kn, k))
                    loglikelihood += (N / K) * normalize
                else:
                    loglikelihood += np.sum(splinek(x_kn, k))
                    loglikelihood += self.N_k[k] * normalize
        elif spline_weights == "unbiasedstate":
            loglikelihood = N * np.dot(w_n, spline(x_n))
        else:
            raise ParameterError(f"Unknown spline_weights {spline_weights}")

        return loglikelihood

    def _MC_step(self, x_n, w_n, stepsize, xrange, spline_weights, logprior):
        """One Metropolis step over a single random spline coefficient
        (reference fes.py:2012-2100)."""
        mc_data = self.mc_data
        bspline = mc_data["bspline"]

        if mc_data["first_step"]:
            c = bspline.c
            mc_data["previous_logposterior"] = self._get_MC_loglikelihood(
                x_n,
                w_n,
                self.spline_parameters["spline_weights"],
                bspline,
                self.spline_parameters["xrange"],
            ) - logprior(c)
            mc_data["first_step"] = False
            mc_data["newspline"] = BSpline(bspline.t, bspline.c.copy(), bspline.k)

        mc_data["cold"] = bspline.c
        psize = len(mc_data["cold"])
        rchange = stepsize * np.random.normal()
        cnew = mc_data["cold"].copy()
        ci = np.random.randint(psize)
        cnew[ci] += rchange
        mc_data["newspline"].c = cnew

        def prob(x):
            return np.exp(-mc_data["newspline"](x))

        new_integral = self._integrate(prob, xrange[0], xrange[1])
        cnew = cnew + np.log(new_integral)
        mc_data["newspline"].c = cnew

        loglikelihood = self._get_MC_loglikelihood(
            x_n, w_n, spline_weights, mc_data["newspline"], xrange
        )
        newlogposterior = loglikelihood - logprior(cnew)
        dlogposterior = newlogposterior - mc_data["previous_logposterior"]

        accept = dlogposterior <= 0
        if dlogposterior > 0 and np.random.random() < np.exp(-dlogposterior):
            accept = True

        if accept:
            mc_data["bspline"].c = mc_data["newspline"].c
            mc_data["cold"] = bspline.c
            mc_data["previous_logposterior"] = newlogposterior
            mc_data["naccept"] = mc_data["naccept"] + 1

        return dict(c=mc_data["bspline"].c, logposterior=mc_data["previous_logposterior"])

    # -------------------------------------------------------------------------
    # Spline objective / gradient / Hessian
    # -------------------------------------------------------------------------

    def _bspline_calculate_f(self, xi, x_n, w_n):
        """Minus log likelihood of the splined FES (reference fes.py:2102-2186).

        f = sum_n scale_n F(x_n) + sum_k scale_k ln int exp(-F - bias_k),
        with weighting per ``spline_weights``; MAP subtracts the log prior.
        """
        mbar = self.mbar
        K = mbar.K
        N_k = mbar.N_k
        N = self.N

        bloc = self._val_to_spline(xi)
        spline_weights = self.spline_parameters["spline_weights"]
        xrange = self.spline_parameters["xrange"]
        fkbias = self.spline_parameters["fkbias"]

        if spline_weights in ["simplesum", "biasedstates"]:
            pF = np.zeros(K)
            if spline_weights == "simplesum":
                f = 0.0
                for k in range(K):
                    f += (N / K) * np.mean(bloc(x_n[mbar.x_kindices == k]))
                integral_scaling = (N / K) * np.ones(K)
            else:
                f = np.sum(bloc(x_n))
                integral_scaling = N_k

            expf = list()
            for k in range(K):

                def expfk(x, kf=k):
                    return np.exp(-bloc(x) - fkbias[kf](x))

                pF[k] = self._integrate(expfk, xrange[0], xrange[1])
                expf.append(expfk)
            f += np.dot(integral_scaling, np.log(pF))

        elif spline_weights == "unbiasedstate":
            f = N * np.dot(w_n, bloc(x_n))

            def expf(x):
                return np.exp(-bloc(x))

            pF = self._integrate(expf, xrange[0], xrange[1])
            f += N * np.log(pF)
        else:
            raise ParameterError(f"Unknown spline_weights {spline_weights}")

        self.spline_data["bspline_expf"] = expf
        self.spline_data["bspline_pF"] = pF

        logprior = self.spline_parameters["map_data"]["logprior"]
        if logprior is not None:
            f -= logprior(np.concatenate([[0], xi], axis=None))

        return f

    def _bspline_calculate_g(self, xi, x_n, w_n):
        """Gradient: basis sums over samples minus Boltzmann-weighted basis
        expectations (reference fes.py:2188-2306)."""
        mbar = self.mbar
        K = mbar.K
        N_k = mbar.N_k
        N = self.N

        bloc = self._val_to_spline(xi)
        spline_weights = self.spline_parameters["spline_weights"]
        nspline = self.spline_parameters["nspline"]
        xrange = self.spline_parameters["xrange"]
        fkbias = self.spline_parameters["fkbias"]
        db_c = self.spline_data["bspline_derivatives"]
        xrangei = self.spline_data["xrangei"]

        pF = np.zeros(K)
        if spline_weights == "simplesum":
            integral_scaling = (N / K) * np.ones(K)
        elif spline_weights == "biasedstates":
            integral_scaling = N_k

        g = np.zeros(nspline - 1)
        for i in range(1, nspline):
            if spline_weights == "simplesum":
                for k in range(K):
                    g[i - 1] += (N / K) * np.mean(db_c[i](x_n[mbar.x_kindices == k]))
            elif spline_weights == "biasedstates":
                g[i - 1] = np.sum(db_c[i](x_n))
            elif spline_weights == "unbiasedstate":
                g[i - 1] = N * np.dot(w_n, db_c[i](x_n))

        if spline_weights in ["biasedstates", "simplesum"]:
            gkquad = np.zeros([nspline - 1, K])

            def expf(x, k):
                return np.exp(-bloc(x) - fkbias[k](x))

            for k in range(K):
                pF[k] = self._integrate(expf, xrange[0], xrange[1], args=(k,))
                for i in range(nspline - 1):

                    def dexpf(x, kf=k, idx=i):
                        return db_c[idx + 1](x) * expf(x, kf)

                    pE = self._integrate(dexpf, xrangei[i + 1, 0], xrangei[i + 1, 1])
                    gkquad[i, k] = pE / pF[k]
            g -= np.dot(gkquad, integral_scaling)
            pE = None
        else:
            gkquad = 0

            def expf_u(x):
                return np.exp(-bloc(x))

            pF = self._integrate(expf_u, xrange[0], xrange[1])
            pE = np.zeros(nspline - 1)
            for i in range(nspline - 1):

                def dexpf_u(x, idx=i):
                    return db_c[idx + 1](x) * expf_u(x)

                pE[i] = self._integrate(dexpf_u, xrangei[i + 1, 0], xrangei[i + 1, 1])
                pE[i] /= pF
            g -= N * pE

        dlogprior = self.spline_parameters["map_data"]["dlogprior"]
        if dlogprior is not None:
            g -= dlogprior(np.concatenate([[0], xi], axis=None))

        self.spline_data["bspline_gkquad"] = gkquad
        self.spline_data["bspline_pE"] = pE
        return g

    def _bspline_calculate_h(self, xi, x_n, w_n):
        """Banded Hessian (|i-j| <= degree) of second-moment basis integrals
        minus the outer product of the first moments (reference fes.py:2308-2416).

        Assumes the gradient was just evaluated at the same xi (reuses its
        cached pF/pE/gkquad), as in the reference.
        """
        mbar = self.mbar
        K = mbar.K
        N_k = mbar.N_k
        N = self.N

        bloc = self._val_to_spline(xi)
        spline_weights = self.spline_parameters["spline_weights"]
        nspline = self.spline_parameters["nspline"]
        kdegree = self.spline_parameters["kdegree"]
        fkbias = self.spline_parameters["fkbias"]
        db_c = self.spline_data["bspline_derivatives"]
        xrangeij = self.spline_data["xrangeij"]
        expf = self.spline_data["bspline_expf"]
        gkquad = self.spline_data["bspline_gkquad"]
        pF = self.spline_data["bspline_pF"]
        pE = self.spline_data["bspline_pE"]

        if spline_weights == "simplesum":
            integral_scaling = N / K * np.ones(K)
        elif spline_weights == "biasedstates":
            integral_scaling = N_k

        h = np.zeros([nspline - 1, nspline - 1])

        if spline_weights in ["simplesum", "biasedstates"]:
            for k in range(K):
                h += -integral_scaling[k] * np.outer(gkquad[:, k], gkquad[:, k])
            for i in range(nspline - 1):
                for j in range(0, i + 1):
                    if abs(i - j) <= kdegree:
                        for k in range(K):

                            def ddexpf(x, kf=k, ii=i, jj=j):
                                return db_c[ii + 1](x) * db_c[jj + 1](x) * expf[kf](x)

                            pE_ij = integral_scaling[k] * self._integrate(
                                ddexpf,
                                xrangeij[i + 1, j + 1, 0],
                                xrangeij[i + 1, j + 1, 1],
                            )
                            h[i, j] += pE_ij / pF[k]
        else:
            h = -N * np.outer(pE, pE)

            def expf_u(x):
                return np.exp(-bloc(x))

            for i in range(nspline - 1):
                for j in range(0, i + 1):
                    if abs(i - j) <= kdegree:

                        def ddexpf_u(x, ii=i, jj=j):
                            return db_c[ii + 1](x) * db_c[jj + 1](x) * expf_u(x)

                        pE_ij = self._integrate(
                            ddexpf_u,
                            xrangeij[i + 1, j + 1, 0],
                            xrangeij[i + 1, j + 1, 1],
                        )
                        h[i, j] += N * pE_ij / pF

        for i in range(nspline - 1):
            for j in range(i + 1, nspline - 1):
                h[i, j] = h[j, i]

        ddlogprior = self.spline_parameters["map_data"]["ddlogprior"]
        if ddlogprior is not None:
            h -= ddlogprior(np.concatenate([[0], xi], axis=None))

        return h

    @staticmethod
    def _integrate(func, xlow, xhigh, args=(), method="quad"):
        """Adaptive quadrature wrapper (reference fes.py:2418-2428)."""
        if method == "quad":
            return quad(func, xlow, xhigh, args)[0]
        raise ParameterError(f"integration method {method} not yet implemented")

    def _val_to_spline(self, x, form=None):
        """Coefficients (c_0 pinned from the template) -> BSpline object
        (reference fes.py:2430-2456)."""
        template_bspline = self.spline_data["bspline"]
        xnew = np.zeros(len(x) + 1)
        xnew[0] = template_bspline.c[0]
        xnew[1:] = x
        bspline = BSpline(template_bspline.t, xnew, template_bspline.k)
        if form == "exp":
            return lambda xq: -np.log(bspline(xq))
        return bspline
