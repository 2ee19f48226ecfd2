"""Multi-chip / multi-host scaling: meshes, shard_map pipelines, collectives."""
