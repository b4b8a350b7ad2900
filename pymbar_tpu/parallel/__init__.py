"""Multi-chip scale-out: sample-axis (N) sharding over a jax.sharding.Mesh.

The reference is single-process/single-device (see SURVEY.md §2.8); this
package is the NEW TPU-native scaling layer: u_kn sharded along n across
devices, logsumexp/Gram reductions finished with psum over ICI.
"""

from pymbar_tpu.parallel.sharding import (
    default_mesh,
    shard_dd_planes,
    sharded_fused_lognum_dd,
    sharded_solve_mbar_dd,
    mesh_2d,
    shard_u_kn,
    sharded_core_stats,
    sharded_gram,
    sharded_log_denominator,
    sharded_solve_mbar,
    sharded2d_core_stats,
    sharded2d_solve_mbar,
    shard_u_kn_2d,
)

__all__ = [
    "default_mesh",
    "shard_u_kn",
    "sharded_core_stats",
    "sharded_gram",
    "sharded_log_denominator",
    "sharded_solve_mbar",
    "shard_dd_planes",
    "sharded_fused_lognum_dd",
    "sharded_solve_mbar_dd",
    "mesh_2d",
    "shard_u_kn_2d",
    "sharded2d_core_stats",
    "sharded2d_solve_mbar",
]
