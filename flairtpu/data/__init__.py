"""Host-side input pipeline: manifests, metadata encoding, patch loading.

Normalization and geometric augmentation have both host (numpy) and device
(jnp, fused into the jitted step) implementations; the training loop uses the
device path so the TPU does the math and the host pipeline stays I/O-bound.
"""
