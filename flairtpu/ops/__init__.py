"""Device compute ops: Pallas kernels + XLA building blocks for the hot paths."""
