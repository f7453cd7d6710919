"""Device-mesh sharding and distributed optimization (pjit / shard_map)."""
