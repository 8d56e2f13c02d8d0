"""Model zoo: Flax segmentation models + torch checkpoint conversion.

- :mod:`flairtpu.models.resnet` — ResNet-18/34/50/101/152 + ResNeXt-50/101
  encoders (torchvision topology, NHWC).
- :mod:`flairtpu.models.unet` — U-Net / U-Net++ decoders + segmentation head
  matching segmentation-models-pytorch 0.3.3 (incl. the inner-crop decode
  fast path for zone exact clipping).
- :mod:`flairtpu.models.deeplab` — DeepLabV3+ ASPP decoder (smp topology).
- :mod:`flairtpu.models.smp_extra` — FPN, PSPNet, LinkNet and DeepLabV3
  (non-plus) decoders, completing the smp architecture set.
- :mod:`flairtpu.models.efficientnet` — EfficientNet-b0..b7 smp encoders
  (TF static same padding, SE/swish/drop-connect).
- :mod:`flairtpu.models.tv_encoders` — the torchvision-backed smp encoder
  families: mobilenet_v2, vgg11..vgg19(_bn), densenet121/161/169/201.
- :mod:`flairtpu.models.senet` / ``xception`` / ``dpn`` / ``inception`` /
  ``mit`` — the pretrainedmodels-backed smp encoder families (se_resnet,
  se_resnext, senet154, xception, dpn68..131, inceptionv4,
  inceptionresnetv2) and smp's vendored SegFormer backbone (mit_b0..b5),
  completing smp 0.3.3's full non-timm encoder surface.
- :mod:`flairtpu.models.timm_efficientnet` / ``resnest`` / ``res2net`` /
  ``timm_mobilenetv3`` / ``sknet`` / ``regnet`` / ``gernet`` — the
  timm-wrapper smp encoder families (66 encoder strings) — and
  :mod:`flairtpu.models.mobileone` (s0..s4, Apple's reparameterizable
  family smp vendors natively). Together with the WSL resnext101 width
  ladder this completes smp 0.3.3's ENTIRE natively-registered encoder
  surface (124 encoder strings): every ``<encoder>_<arch>`` string the
  reference factory accepts (src/flair/model.py:35-41) dispatches, except
  the unbounded ``tu-`` timm-universal prefix (targeted config error).
- :mod:`flairtpu.models.segformer` / ``swin_upernet`` / ``convnext_upernet`` /
  ``beit_upernet`` (also serving Data2Vec-Vision) / ``dpt`` / ``mobilevit`` /
  ``mobilenet_v2`` — the HuggingFace-provider families (the full transformers
  ``AutoModelForSemanticSegmentation`` registry), parity-tested against
  transformers.
- :mod:`flairtpu.models.metadata_mlp` — 45-d metadata encoder + encoder-feature
  fusion (reference src/flair/model.py:56-62, 82-92).
- :mod:`flairtpu.models.factory` — ``create_model(config)`` provider dispatch
  (reference src/flair/model.py:20-50).
- :mod:`flairtpu.models.convert` — torch ``.pth``/``.ckpt`` state dicts to
  Flax variables (reference src/zone_detect/model.py:61-88 semantics).
"""

from flairtpu.models.factory import FlairSegmentationModel, create_model  # noqa: F401
