"""flairtpu — TPU-native rebuild of the FLAIR-1 land-cover framework.

A from-scratch JAX/Flax/Pallas framework with the capabilities of the
IGN FLAIR-1 baseline (reference: Draghoyns/FLAIR-1):

- ``flair`` CLI: patch-level train / predict / metrics over 512x512,
  5-channel (R,G,B,NIR,Elevation) aerial patches (13/15/19 classes).
- ``flair-detect`` CLI: sliding-window inference over arbitrarily large
  georeferenced TIFFs with overlap-margin stitching.

Compute runs through XLA:TPU (jit/pjit over a device mesh, bf16 on the
MXU, fused XLA zone-detect hot path — custom Pallas kernels were benchmarked and lost to the compiler, see PERFORMANCE.md); raster I/O is a
first-party GeoTIFF codec (pure Python + native C++ fast paths) since the
framework does not depend on GDAL.
"""

__version__ = "0.2.0"
