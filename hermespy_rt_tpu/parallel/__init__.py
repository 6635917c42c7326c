"""Multi-chip parallelism: meshes, shard_map tracing, collectives."""
