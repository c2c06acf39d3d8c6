"""Multi-chip scaling over TPU device meshes.

The reference scales with shared-memory threads over time/batch ranges
(Constellation.zig:327-385); the TPU-native equivalent is a
``jax.sharding.Mesh`` with the satellite axis laid out over ICI and the
dense (n_times, n_sats) grid partitioned by ``NamedSharding`` — XLA
inserts zero collectives for the embarrassingly-parallel propagate and a
ring all-gather only where screening needs all-vs-all positions.
"""

from .mesh import (make_mesh, pad_catalog, propagate_sharded,
                   propagate_sharded_fast, shard_catalog,
                   stage_sharded_fast)

__all__ = ["make_mesh", "pad_catalog", "shard_catalog",
           "propagate_sharded", "propagate_sharded_fast",
           "stage_sharded_fast"]
