"""Two-state free-energy estimators: BAR, EXP and variants.

Capability parity with pymbar 4.x other_estimators.py:56-719.
These operate on 1-D work arrays (typically small); they run host-side in
float64 with stable log-space arithmetic, and :func:`bar_overlap` reuses the
device-accelerated :class:`pymbar_tpu.MBAR`.
"""

import logging

import numpy as np

from pymbar_tpu.utils import (
    BoundsError,
    ConvergenceError,
    ParameterError,
    logsumexp,
)

logger = logging.getLogger(__name__)

__all__ = ["bar_zero", "bar", "bar_overlap", "exp", "exp_gauss"]


def _fermi_log_moments(x):
    """First and second moments of the Fermi function f(x) = 1/(1 + e^x)
    over a work array, evaluated in guarded log space.

    Uses the softplus identity log f(x) = -(max(x, 0) + log1p(e^-|x|)) —
    overflow-free on either tail — and one logsumexp per moment:
    <f^p> = exp(logsumexp(p log f) - log T).  Shared by the 'BAR'
    (Bennett Eq. 10a) and 'MBAR' (exact two-state Eq. E9) uncertainty
    variants of :func:`bar`.
    """
    log_f = -(np.maximum(x, 0.0) + np.log1p(np.exp(-np.abs(x))))
    log_T = np.log(float(x.size))
    return (
        np.exp(logsumexp(log_f) - log_T),
        np.exp(logsumexp(2.0 * log_f) - log_T),
    )


def bar_zero(w_F, w_R, DeltaF):
    """The implicit BAR function; zero when DeltaF solves the BAR equation.

    fzero = ln sum_F fermi(-(M + w_F - DeltaF)) - ln sum_R fermi(-( -(M - w_R
    - DeltaF))), with M = ln(T_F/T_R); overflow-guarded by exponentiating only
    non-positive arguments (reference other_estimators.py:56-153).  Returns
    nan when the inputs overflow even the guarded form.
    """
    w_F = np.array(w_F, np.float64)
    w_R = np.array(w_R, np.float64)
    DeltaF = float(DeltaF)

    T_F = float(w_F.size)
    T_R = float(w_R.size)
    M = np.log(T_F / T_R)

    with np.errstate(over="raise"):
        # log f(W) = -maxarg - log(exp(-maxarg) + exp(arg - maxarg)),
        # maxarg = max(arg, 0), for the Fermi function 1/(1+exp(arg)).
        exp_arg_F = M + w_F - DeltaF
        max_arg_F = np.where(exp_arg_F > 0.0, exp_arg_F, 0.0)
        try:
            log_f_F = -max_arg_F - np.log(
                np.exp(-max_arg_F) + np.exp(exp_arg_F - max_arg_F)
            )
        except FloatingPointError:
            logger.warning("The input data results in overflow in bar")
            return np.nan
        log_numer = logsumexp(log_f_F)

        exp_arg_R = -(M - w_R - DeltaF)
        max_arg_R = np.where(exp_arg_R > 0.0, exp_arg_R, 0.0)
        try:
            log_f_R = -max_arg_R - np.log(
                np.exp(-max_arg_R) + np.exp(exp_arg_R - max_arg_R)
            )
        except FloatingPointError:
            logger.info("The input data results in overflow in bar")
            return np.nan
        log_denom = logsumexp(log_f_R)

    return log_numer - log_denom


def bar(
    w_F,
    w_R,
    DeltaF=0.0,
    compute_uncertainty=True,
    uncertainty_method="BAR",
    maximum_iterations=500,
    relative_tolerance=1.0e-12,
    verbose=False,
    method="false-position",
    iterated_solution=True,
):
    """Bennett acceptance ratio estimate of the free energy difference.

    Root-solves :func:`bar_zero` via 'false-position' (default), 'bisection'
    or 'self-consistent-iteration', bracketing with the two EXP estimates;
    uncertainty via Bennett Eq. 10a ('BAR') or the exact two-state MBAR
    Eq. E9 ('MBAR').  ``iterated_solution=False`` gives the one-step
    TMS-equivalent estimate.  Returns dict('Delta_f'[, 'dDelta_f']).

    Reference other_estimators.py:156-531 (NaN/poor-overlap path returns
    Delta_f = 0 with a warning, :263-276).
    """
    w_F = np.asarray(w_F, dtype=np.float64)
    w_R = np.asarray(w_R, dtype=np.float64)

    result_vals = dict()

    if not iterated_solution:
        maximum_iterations = 1
        method = "self-consistent-iteration"
        DeltaF_initial = DeltaF

    if method not in ["self-consistent-iteration", "false-position", "bisection"]:
        raise ParameterError(f"method {method} is not defined for bar")
    if uncertainty_method not in ["BAR", "MBAR"]:
        raise ParameterError(
            f"uncertainty_method {uncertainty_method} is not defined for bar"
        )

    nfunc = 0
    relative_change = np.nan
    iteration = 0

    if method in ("bisection", "false-position"):
        UpperB = exp(w_F)["Delta_f"]
        LowerB = -exp(w_R)["Delta_f"]

        FUpperB = bar_zero(w_F, w_R, UpperB)
        FLowerB = bar_zero(w_F, w_R, LowerB)
        nfunc = 2

        if np.isnan(FUpperB) or np.isnan(FLowerB):
            logger.warning(
                "BAR is likely to be inaccurate because of poor overlap. "
                "Improve the sampling, or decrease the spacing between "
                "states.  For now, guessing that the free energy difference "
                "is 0 with no uncertainty."
            )
            result_vals["Delta_f"] = 0.0
            if compute_uncertainty:
                result_vals["dDelta_f"] = 0.0
            return result_vals

        while FUpperB * FLowerB > 0:
            # Same sign: widen until the root is bracketed.
            if verbose:
                logger.info("Initial brackets did not actually bracket, widening them")
            FAve = (UpperB + LowerB) / 2
            UpperB = UpperB - max(abs(UpperB - FAve), 0.1)
            LowerB = LowerB + max(abs(LowerB - FAve), 0.1)
            FUpperB = bar_zero(w_F, w_R, UpperB)
            FLowerB = bar_zero(w_F, w_R, LowerB)
            nfunc += 2

    for iteration in range(maximum_iterations + 1):
        DeltaF_old = DeltaF
        FNew = np.nan

        if method == "false-position":
            if (LowerB == 0.0) and (UpperB == 0.0):
                DeltaF = 0.0
                FNew = 0.0
            else:
                DeltaF = UpperB - FUpperB * (UpperB - LowerB) / (FUpperB - FLowerB)
                FNew = bar_zero(w_F, w_R, DeltaF)
            nfunc += 1
            if FNew == 0:
                if verbose:
                    logger.info("Convergence achieved.")
                relative_change = 1.0e-15
                break

        if method == "bisection":
            DeltaF = (UpperB + LowerB) / 2
            FNew = bar_zero(w_F, w_R, DeltaF)
            nfunc += 1

        if method == "self-consistent-iteration":
            DeltaF = -bar_zero(w_F, w_R, DeltaF) + DeltaF
            nfunc += 1

        if DeltaF == 0.0:
            if verbose:
                logger.info("The free energy difference appears to be zero.")
            break

        if iterated_solution:
            relative_change = abs((DeltaF - DeltaF_old) / DeltaF)
            if verbose:
                logger.info(f"relative_change = {relative_change:12.3f}")
            if iteration > 0 and relative_change < relative_tolerance:
                if verbose:
                    logger.info("Convergence achieved.")
                break

        if method in ("false-position", "bisection"):
            if FUpperB * FNew < 0:
                LowerB = DeltaF
                FLowerB = FNew
            elif FLowerB * FNew <= 0:
                UpperB = DeltaF
                FUpperB = FNew
            else:
                raise BoundsError("WARNING: Cannot determine bound on free energy")

        if verbose:
            logger.info(f"iteration {iteration:5d}: DeltaF = {DeltaF:16.3f}")

    if iterated_solution:
        if iteration < maximum_iterations:
            if verbose:
                logger.info(
                    f"Converged to tolerance of {relative_change:e} in "
                    f"{iteration:d} iterations ({nfunc:d} function evaluations)"
                )
        else:
            raise ConvergenceError(
                "WARNING: Did not converge to within specified tolerance. "
                f"max_delta = {relative_change:f}, "
                f"TOLERANCE = {relative_tolerance:f}, "
                f"MAX_ITS = {maximum_iterations:d}"
            )

    if not compute_uncertainty:
        if verbose:
            logger.info(f"DeltaF = {DeltaF:8.3f}")
        result_vals["Delta_f"] = DeltaF
        return result_vals

    # Uncertainty: Bennett Eq. 10a ('BAR', with the n_1<f>_1^2 correction) or
    # the exact two-state MBAR Eq. E9 ('MBAR'); see reference
    # other_estimators.py:370-525 for the full derivation commentary.  Both
    # variants consume the same two Fermi moments per work direction, so the
    # guarded log-space evaluation lives in one helper.
    T_F = float(w_F.size)
    T_R = float(w_R.size)
    C = np.log(T_F / T_R) - (DeltaF if iterated_solution else DeltaF_initial)

    afF, afF2 = _fermi_log_moments(w_F + C)
    afR, afR2 = _fermi_log_moments(w_R - C)
    nrat = (T_F + T_R) / (T_F * T_R)

    if uncertainty_method == "BAR":
        dDeltaF = np.sqrt((afF2 / afF**2) / T_F + (afR2 / afR**2) / T_R - nrat)
    else:  # MBAR
        dDeltaF = np.sqrt(1.0 / ((afF - afF2) * T_F + (afR - afR2) * T_R) - nrat)

    if verbose:
        logger.info(f"DeltaF = {DeltaF:8.3f} +- {dDeltaF:8.3f}")
    result_vals["Delta_f"] = DeltaF
    result_vals["dDelta_f"] = dDeltaF
    return result_vals


def bar_overlap(w_F, w_R):
    """MBAR-definition overlap between forward and reverse work ensembles.

    Builds the exact 2-state MBAR problem from the work values, asserts the
    BAR and MBAR free energies agree, and returns the overlap scalar
    (reference other_estimators.py:534-569).
    """
    from pymbar_tpu.mbar import MBAR

    w_F = np.asarray(w_F, dtype=np.float64)
    w_R = np.asarray(w_R, dtype=np.float64)

    N_k = np.array([len(w_F), len(w_R)])
    N = N_k.sum()
    u_kn = np.zeros([2, N])
    u_kn[1, 0 : N_k[0]] = w_F[:]
    u_kn[0, N_k[0] : N] = w_R[:]
    mbar = MBAR(u_kn, N_k)

    results = bar(w_F, w_R)
    bar_df = results["Delta_f"]
    bar_ddf = results["dDelta_f"]

    assert np.isclose(
        mbar.f_k[1] - mbar.f_k[0], bar_df
    ), f"BAR: {bar_df} +- {bar_ddf} | MBAR: {mbar.f_k[1] - mbar.f_k[0]}"

    return mbar.compute_overlap()["scalar"]


def exp(w_F, compute_uncertainty=True, is_timeseries=False):
    """Zwanzig exponential-averaging (EXP) free energy estimate.

    DeltaF = -(ln sum exp(-w) - ln T); uncertainty from the standard error of
    the shifted exponentials, optionally corrected by the statistical
    inefficiency when ``is_timeseries`` (reference other_estimators.py:572-647).
    """
    w_F = np.asarray(w_F, dtype=np.float64)
    result_vals = dict()

    T = float(np.size(w_F))
    DeltaF = -(logsumexp(-w_F) - np.log(T))

    if compute_uncertainty:
        max_arg = np.max(-w_F)
        x = np.exp(-w_F - max_arg)
        Ex = x.mean()

        g = 1.0
        if is_timeseries:
            from pymbar_tpu import timeseries

            g = timeseries.statistical_inefficiency(x, x)

        dx = np.std(x) / np.sqrt(T / g)
        result_vals["Delta_f"] = DeltaF
        result_vals["dDelta_f"] = dx / Ex
    else:
        result_vals["Delta_f"] = DeltaF

    return result_vals


def exp_gauss(w_F, compute_uncertainty=True, is_timeseries=False):
    """Gaussian-approximation EXP: DeltaF = <w> - var(w)/2.

    Uncertainty dx^2 = var/T_eff + var^2 / (2 (T_eff - 1)) (reference
    other_estimators.py:650-719).
    """
    w_F = np.asarray(w_F, dtype=np.float64)
    T = float(np.size(w_F))

    var = np.var(w_F)
    DeltaF = np.average(w_F) - 0.5 * var

    result_vals = dict()
    if compute_uncertainty:
        T_eff = T
        if is_timeseries:
            from pymbar_tpu import timeseries

            g = timeseries.statistical_inefficiency(w_F, w_F)
            T_eff = T / g
        dx2 = var / T_eff + 0.5 * var * var / (T_eff - 1)
        result_vals["Delta_f"] = DeltaF
        result_vals["dDelta_f"] = np.sqrt(dx2)
    else:
        result_vals["Delta_f"] = DeltaF
    return result_vals
