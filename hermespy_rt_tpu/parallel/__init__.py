"""Multi-chip parallelism: meshes, shard_map tracing, collectives."""
from .sharding import (default_mesh, trace_paths_sharded,
                       TriShardedSceneAccess, initialize_distributed)

__all__ = ["default_mesh", "trace_paths_sharded", "TriShardedSceneAccess",
           "initialize_distributed"]
