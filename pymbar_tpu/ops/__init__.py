"""Device-side numeric kernels (JAX/XLA/Pallas) for pymbar_tpu.

The reference's "native layer" was optional numexpr/JAX acceleration of a
NumPy core (pymbar 4.x mbar_solvers.py:14-97).  Here the always-on
JAX core lives in :mod:`pymbar_tpu.ops.mbar_core`, the stable reductions in
:mod:`pymbar_tpu.ops.logsumexp`, and the fused TPU kernels in
:mod:`pymbar_tpu.ops.pallas_kernels`.
"""

from pymbar_tpu.ops.logsumexp import logsumexp
from pymbar_tpu.ops.mbar_core import (
    mbar_gradient,
    mbar_hessian,
    mbar_log_W_nk,
    mbar_objective,
    mbar_objective_and_gradient,
    mbar_W_nk,
    precondition_u_kn,
    self_consistent_update,
    validate_inputs,
)

__all__ = [
    "logsumexp",
    "mbar_gradient",
    "mbar_hessian",
    "mbar_log_W_nk",
    "mbar_objective",
    "mbar_objective_and_gradient",
    "mbar_W_nk",
    "precondition_u_kn",
    "self_consistent_update",
    "validate_inputs",
]
