"""Ray Data stage implementations (map_batches callables, group kernels)."""
