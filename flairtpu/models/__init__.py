"""Model zoo: Flax segmentation models + torch checkpoint conversion.

- :mod:`flairtpu.models.resnet` — ResNet-18/34/50 encoders (torchvision
  topology, NHWC).
- :mod:`flairtpu.models.unet` — U-Net decoder + segmentation head matching
  segmentation-models-pytorch 0.3.3.
- :mod:`flairtpu.models.metadata_mlp` — 45-d metadata encoder + encoder-feature
  fusion (reference src/flair/model.py:56-62, 82-92).
- :mod:`flairtpu.models.factory` — ``create_model(config)`` provider dispatch
  (reference src/flair/model.py:20-50).
- :mod:`flairtpu.models.convert` — torch ``.pth``/``.ckpt`` state dicts to
  Flax variables (reference src/zone_detect/model.py:61-88 semantics).
"""

from flairtpu.models.factory import FlairSegmentationModel, create_model  # noqa: F401
