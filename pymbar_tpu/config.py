"""Global numeric configuration for pymbar_tpu.

The MBAR equations need ~1e-12 relative precision in their logsumexp
accumulations (reference: /root/reference/pymbar/mbar_solvers.py:142-171 forces
``jax_enable_x64`` at call time).  We enable x64 once at import:

* On CPU (and GPU) backends this gives true IEEE float64 — the parity/testing
  path.
* On TPU there is no native f64 ALU; XLA emulates F64 for most ops (slowly).
  The hot kernels in :mod:`pymbar_tpu.ops` therefore provide compensated
  float32 ("double-word") Pallas paths selected via :func:`working_dtype`.

Environment variables
---------------------
``PYMBAR_TPU_DISABLE_X64``
    Truthy ("1", "true", "yes", case-insensitive) skips enabling x64 — the
    analog of the reference's ``PYMBAR_DISABLE_JAX`` toggle
    (reference mbar_solvers.py:18-23).
``PYMBAR_TPU_FORCE_DTYPE``
    "float32" or "float64": override :func:`working_dtype`.
"""

import os

import jax
import numpy as np

_TRUTHY = ("1", "true", "yes")


def _env_truthy(name):
    return os.environ.get(name, "").strip().lower() in _TRUTHY


X64_ENABLED = False
if not _env_truthy("PYMBAR_TPU_DISABLE_X64"):
    jax.config.update("jax_enable_x64", True)
    X64_ENABLED = True


def working_dtype():
    """The dtype the solver core computes in on the default backend."""
    forced = os.environ.get("PYMBAR_TPU_FORCE_DTYPE", "").strip().lower()
    if forced == "float32":
        return np.float32
    if forced == "float64":
        return np.float64
    if not X64_ENABLED:
        return np.float32
    return np.float64


def default_backend():
    try:
        return jax.default_backend()
    except RuntimeError:  # pragma: no cover - no devices at all
        return "cpu"


def on_tpu():
    return default_backend() == "tpu"
