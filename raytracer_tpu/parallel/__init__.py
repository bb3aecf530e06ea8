"""Device-mesh parallelism: pixel/sample sharding over TPU meshes."""
