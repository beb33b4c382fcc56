"""Ray Data stage builders (map_batches bodies and actor-pool classes)."""
