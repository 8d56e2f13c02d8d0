"""Device compute ops: fused XLA building blocks for the hot paths."""
