"""Ray Data stage UDFs (stateless map_batches fns + actor-pool classes)."""
