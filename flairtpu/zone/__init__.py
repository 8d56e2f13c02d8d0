"""Zone detection: sliding-window inference over large GeoTIFFs.

TPU-native rebuild of the reference ``src/zone_detect`` package: tile-grid
slicing (grid), overlap/weight maps (weights), the batched inference engine
with fused on-device stitching (engine), strategy comparison sweeps (compare)
and department batch mode (batch).
"""
