"""Global numeric configuration for pymbar_tpu.

The MBAR equations need ~1e-12 relative precision in their logsumexp
accumulations (reference: pymbar 4.x mbar_solvers.py:142-171 forces
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

# Persistent compilation cache: the first compile of each kernel shape costs
# 15-60 s on a remote-compile TPU frontend, and a fresh process would pay it
# all again.  Cache serialized executables on disk so repeat runs (benches,
# production re-solves, notebook restarts) skip straight to execution.
# Opt out with PYMBAR_TPU_NO_COMPILE_CACHE=1 or redirect the directory with
# PYMBAR_TPU_CACHE_DIR.
if not _env_truthy("PYMBAR_TPU_NO_COMPILE_CACHE"):
    _cache_dir = os.environ.get(
        "PYMBAR_TPU_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except (OSError, AttributeError):  # read-only FS or too-old jax: best effort
        pass


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
