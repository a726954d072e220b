"""Cross-stage state: union-find, checkpoints/manifests."""
