"""Analytically solvable test systems (reference pymbar 4.x testsystems/)."""

__all__ = [
    "timeseries",
    "exponential_distributions",
    "harmonic_oscillators",
    "gaussian_work",
    "HarmonicOscillatorsTestCase",
    "ExponentialTestCase",
    "correlated_timeseries_example",
    "gaussian_work_example",
]

from pymbar_tpu.testsystems.exponential_distributions import ExponentialTestCase
from pymbar_tpu.testsystems.gaussian_work import gaussian_work_example
from pymbar_tpu.testsystems.harmonic_oscillators import HarmonicOscillatorsTestCase
from pymbar_tpu.testsystems.timeseries import correlated_timeseries_example
