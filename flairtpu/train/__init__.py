"""Training runtime: jitted SPMD train/eval steps, schedulers, checkpoints,
early stopping, TensorBoard logging — the Lightning-Trainer replacement."""
