"""pymbar_tpu — a TPU-native MBAR engine (JAX/XLA/Pallas/pjit).

A from-scratch rebuild of the capability surface of pymbar 4.x
(reference: choderalab/pymbar, pymbar 4.x upstream): the MBAR
estimator, BAR/EXP two-state estimators, free-energy surfaces, timeseries
decorrelation tools and analytically solvable test systems — with the hot
path (logsumexp reductions over the K×N reduced-potential matrix, W^T W
Grams, the adaptive Newton/self-consistent solver) running on TPU through
JAX, and sample-axis sharding across chips via jax.sharding (see
pymbar_tpu.parallel).

Public surface parity: pymbar 4.x __init__.py:33-51.
"""

from pymbar_tpu import config  # noqa: F401  (enables x64 before anything traces)
from pymbar_tpu import timeseries  # noqa: F401
from pymbar_tpu import testsystems  # noqa: F401
from pymbar_tpu import confidenceintervals  # noqa: F401
from pymbar_tpu import utils  # noqa: F401
from pymbar_tpu.mbar import MBAR
from pymbar_tpu.other_estimators import bar, bar_overlap, bar_zero, exp, exp_gauss


def __getattr__(name):
    # FES pulls in the whole surfaces stack (histogram/KDE/spline/MCMC);
    # import it lazily so `import pymbar_tpu` stays light.
    if name == "FES":
        from pymbar_tpu.fes import FES

        return FES
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

try:
    from importlib.metadata import version as _version

    __version__ = _version("pymbar_tpu")
except Exception:  # pragma: no cover - not installed as a distribution
    __version__ = "0.1.0"

__all__ = [
    "MBAR",
    "FES",
    "bar",
    "bar_overlap",
    "bar_zero",
    "exp",
    "exp_gauss",
    "timeseries",
    "testsystems",
    "confidenceintervals",
    "utils",
    "__version__",
]
