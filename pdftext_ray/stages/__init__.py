"""Ray Data batch stages (map_batches UDFs and actor-pool classes)."""
