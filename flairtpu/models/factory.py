"""Model factory: config -> Flax segmentation model.

Provider dispatch mirrors the reference FLAIR_ModelFactory
(src/flair/model.py:20-50, src/zone_detect/model.py:12-58):

- ``SegmentationModelsPytorch`` + ``encoder_decoder: <encoder>_<arch>`` ->
  first-party Flax ports of ALL 9 smp 0.3.3 architectures (unet,
  unetplusplus, manet, linknet, fpn, pspnet, deeplabv3, deeplabv3plus,
  pan) over the resnet encoder family, weight-compatible with the
  published FLAIR-INC ``.pth`` checkpoints via
  :mod:`flairtpu.models.convert`.
- ``HuggingFace`` -> first-party Flax ports dispatched by org model name,
  covering the entire transformers ``AutoModelForSemanticSegmentation``
  registry the reference can load (model.py:43-50): SegFormer b0-b5
  (``nvidia/segformer*``), Swin-UperNet (``openmmlab/upernet-swin-*``, the
  reference default), ConvNeXt-UperNet (``openmmlab/upernet-convnext-*``),
  BEiT-UperNet (``microsoft/beit-*``), Data2Vec-Vision
  (``facebook/data2vec-vision-*``), DPT (``Intel/dpt-large-ade``),
  MobileViT (``apple/deeplabv3-mobilevit-*``), MobileViTV2
  (``apple/mobilevitv2-*``) and MobileNetV2
  (``google/deeplabv3_mobilenet_v2_*``); unsupported org models raise
  with a clear message listing the supported families.

The returned module computes in ``dtype`` (bf16 by default on TPU for MXU
throughput) with fp32 parameters and fp32 logits.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from flairtpu.models.metadata_mlp import MetadataMLP, fuse_metadata
from flairtpu.models.resnet import RESNET_SPECS, ResNetEncoder
from flairtpu.models.unet import SegmentationHead, UnetDecoder

# smp SegmentationHead upsampling factor (UpsamplingBilinear2d):
# deeplabv3plus/fpn/pan emit stride-4 maps, deeplabv3/pspnet stride-8
HEAD_UPSAMPLE = {"deeplabv3plus": 4, "fpn": 4, "pan": 4,
                 "deeplabv3": 8, "pspnet": 8}

# architectures with a margin-cropped zone decode fast path (decode()'s
# ``inner_margin``): unet via the plan_inner_crops backward-interval walk,
# the strided-head archs via the windowed align-corners upsample. linknet /
# manet / unetplusplus decode full-res through non-local block structures
# and keep the full-decode + crop path.
INNER_DECODE_ARCHS = frozenset({"unet", *HEAD_UPSAMPLE})


class FlairSegmentationModel(nn.Module):
    """Encoder/decoder/head with optional metadata fusion (train+infer).

    arch 'unet' mirrors smp Unet (full-stride encoder, skip decoder, 3x3
    head); arch 'deeplabv3plus' mirrors smp DeepLabV3Plus (output-stride-16
    dilated encoder, ASPP decoder, 1x1 head + 4x align-corners upsample).
    """

    encoder_name: str = "resnet34"
    arch: str = "unet"
    classes: int = 13
    use_metadata: bool = False
    # jax.checkpoint the encoder blocks (and unet decoder blocks) on the
    # backward pass — the TPU-native answer to "effective batch beyond HBM"
    # together with accumulate_steps (train/loop.py)
    remat: bool = False
    # space-to-depth stem execution (resnet family; see resnet.StemConv)
    s2d_stem: bool = False
    dtype: Any = jnp.float32

    def _make_encoder(self, **kw):
        """Encoder family dispatch (resnet/resnext, efficientnet, and the
        torchvision-backed mobilenet_v2/vgg/densenet families)."""
        if self.encoder_name.startswith("timm-resnest"):
            from flairtpu.models.resnest import ResNestEncoder

            return ResNestEncoder(name_spec=self.encoder_name,
                                  remat=self.remat, dtype=self.dtype, **kw)
        if self.encoder_name.startswith(("timm-res2net", "timm-res2next")):
            from flairtpu.models.res2net import Res2NetEncoder

            return Res2NetEncoder(name_spec=self.encoder_name,
                                  remat=self.remat, dtype=self.dtype, **kw)
        if self.encoder_name.startswith(("timm-skresnet", "timm-skresnext")):
            from flairtpu.models.sknet import SKNetEncoder

            return SKNetEncoder(name_spec=self.encoder_name,
                                remat=self.remat, dtype=self.dtype, **kw)
        if self.encoder_name.startswith("timm-regnet"):
            from flairtpu.models.regnet import RegNetEncoder

            return RegNetEncoder(name_spec=self.encoder_name,
                                 remat=self.remat, dtype=self.dtype, **kw)
        if self.encoder_name.startswith("timm-mobilenetv3"):
            from flairtpu.models.timm_mobilenetv3 import TimmMobileNetV3Encoder

            return TimmMobileNetV3Encoder(name_spec=self.encoder_name,
                                          remat=self.remat, dtype=self.dtype,
                                          **kw)
        if self.encoder_name.startswith("timm-gernet"):
            from flairtpu.models.gernet import GERNetEncoder

            return GERNetEncoder(name_spec=self.encoder_name,
                                 remat=self.remat, dtype=self.dtype, **kw)
        if self.encoder_name.startswith("timm-"):
            from flairtpu.models.timm_efficientnet import TimmEfficientNetEncoder

            return TimmEfficientNetEncoder(name_spec=self.encoder_name,
                                           remat=self.remat, dtype=self.dtype,
                                           **kw)
        if self.encoder_name.startswith("efficientnet"):
            from flairtpu.models.efficientnet import EfficientNetEncoder

            return EfficientNetEncoder(name_spec=self.encoder_name,
                                       remat=self.remat, dtype=self.dtype, **kw)
        if self.encoder_name.startswith("mobileone"):
            from flairtpu.models.mobileone import MobileOneEncoder

            return MobileOneEncoder(name_spec=self.encoder_name,
                                    remat=self.remat, dtype=self.dtype, **kw)
        if self.encoder_name == "mobilenet_v2":
            from flairtpu.models.tv_encoders import MobileNetV2SmpEncoder

            return MobileNetV2SmpEncoder(remat=self.remat, dtype=self.dtype,
                                         **kw)
        if self.encoder_name.startswith("vgg"):
            from flairtpu.models.tv_encoders import VGGEncoder

            return VGGEncoder(name_spec=self.encoder_name, remat=self.remat,
                              dtype=self.dtype, **kw)
        if self.encoder_name.startswith("densenet"):
            from flairtpu.models.tv_encoders import DenseNetEncoder

            return DenseNetEncoder(name_spec=self.encoder_name,
                                   remat=self.remat, dtype=self.dtype, **kw)
        if self.encoder_name.startswith(("se_resnet", "se_resnext", "senet")):
            from flairtpu.models.senet import SENetEncoder

            return SENetEncoder(name_spec=self.encoder_name, remat=self.remat,
                                dtype=self.dtype, **kw)
        if self.encoder_name == "xception":
            from flairtpu.models.xception import XceptionEncoder

            return XceptionEncoder(remat=self.remat, dtype=self.dtype, **kw)
        if self.encoder_name.startswith("mit_"):
            from flairtpu.models.mit import MiTSmpEncoder

            return MiTSmpEncoder(name_spec=self.encoder_name,
                                 remat=self.remat, dtype=self.dtype, **kw)
        if self.encoder_name.startswith("inception"):
            from flairtpu.models.inception import (InceptionResNetV2Encoder,
                                                   InceptionV4Encoder)

            cls = (InceptionV4Encoder if self.encoder_name == "inceptionv4"
                   else InceptionResNetV2Encoder)
            return cls(remat=self.remat, dtype=self.dtype, **kw)
        if self.encoder_name.startswith("dpn"):
            from flairtpu.models.dpn import DPNEncoder

            return DPNEncoder(name_spec=self.encoder_name, remat=self.remat,
                              dtype=self.dtype, **kw)
        return ResNetEncoder(name_spec=self.encoder_name, remat=self.remat,
                             s2d_stem=self.s2d_stem, dtype=self.dtype, **kw)

    def setup(self):
        if self.arch == "unet":
            self.encoder = self._make_encoder()
            self.decoder = UnetDecoder(remat=self.remat, dtype=self.dtype)
            self.segmentation_head = SegmentationHead(self.classes, dtype=self.dtype)
        elif self.arch == "unetplusplus":
            from flairtpu.models.unet import UnetPlusPlusDecoder

            self.encoder = self._make_encoder()
            self.decoder = UnetPlusPlusDecoder(dtype=self.dtype)
            self.segmentation_head = SegmentationHead(self.classes, dtype=self.dtype)
        elif self.arch == "deeplabv3plus":
            from flairtpu.models.deeplab import DeepLabV3PlusDecoder

            self.encoder = self._make_encoder(output_stride=16)
            self.decoder = DeepLabV3PlusDecoder(dtype=self.dtype)
            self.segmentation_head = SegmentationHead(self.classes, kernel=1,
                                                      dtype=self.dtype)
        elif self.arch == "deeplabv3":
            from flairtpu.models.smp_extra import DeepLabV3Decoder

            self.encoder = self._make_encoder(output_stride=8)
            self.decoder = DeepLabV3Decoder(dtype=self.dtype)
            self.segmentation_head = SegmentationHead(self.classes, kernel=1,
                                                      dtype=self.dtype)
        elif self.arch == "fpn":
            from flairtpu.models.smp_extra import FPNDecoder

            self.encoder = self._make_encoder()
            self.decoder = FPNDecoder(dtype=self.dtype)
            self.segmentation_head = SegmentationHead(self.classes, kernel=1,
                                                      dtype=self.dtype)
        elif self.arch == "pspnet":
            from flairtpu.models.smp_extra import PSPDecoder

            self.encoder = self._make_encoder(depth=3)
            self.decoder = PSPDecoder(dtype=self.dtype)
            self.segmentation_head = SegmentationHead(self.classes, kernel=3,
                                                      dtype=self.dtype)
        elif self.arch == "linknet":
            from flairtpu.models.smp_extra import LinknetDecoder

            self.encoder = self._make_encoder()
            self.decoder = LinknetDecoder(dtype=self.dtype)
            self.segmentation_head = SegmentationHead(self.classes, kernel=1,
                                                      dtype=self.dtype)
        elif self.arch == "manet":
            from flairtpu.models.manet import MAnetDecoder

            self.encoder = self._make_encoder()
            self.decoder = MAnetDecoder(dtype=self.dtype)
            self.segmentation_head = SegmentationHead(self.classes, kernel=3,
                                                      dtype=self.dtype)
        elif self.arch == "pan":
            from flairtpu.models.pan import PANDecoder

            # smp's PAN hardcodes encoder_output_stride=16 (decoders/pan/model.py)
            self.encoder = self._make_encoder(output_stride=16)
            self.decoder = PANDecoder(dtype=self.dtype)
            self.segmentation_head = SegmentationHead(self.classes, kernel=3,
                                                      dtype=self.dtype)
        else:
            raise NotImplementedError(
                f"architecture {self.arch!r} not ported (supported: "
                "unet, unetplusplus, manet, linknet, fpn, pspnet, "
                "deeplabv3, deeplabv3plus, pan)")
        if self.use_metadata:
            self.metadata_mlp = MetadataMLP(dtype=self.dtype)

    def __call__(self, x: jax.Array, mtd: jax.Array | None = None,
                 train: bool = False,
                 inner_margin: int | None = None) -> jax.Array:
        """x: (B, H, W, C) in NHWC. Returns fp32 logits (B, H, W, classes).

        ``inner_margin`` (arch 'unet' only): decode just the margin-cropped
        interior via the plan_inner_crops fast path — returns
        (B, H-2m, W-2m, classes) logits BIT-IDENTICAL to cropping the full
        output (the zone exact-clipping hot path; ~3.5x less decoder work at
        the FLAIR 512/128 geometry).
        """
        feats = self.encoder(x.astype(self.dtype), train=train)
        if self.use_metadata:
            if mtd is None:
                raise ValueError("use_metadata=True but no metadata passed")
            emb = self.metadata_mlp(mtd, train=train)
            feats = feats[:-1] + [fuse_metadata(feats[-1], emb)]
        return self.decode(feats, train=train, inner_margin=inner_margin)

    def decode(self, feats: list[jax.Array], train: bool = False,
               inner_margin: int | None = None) -> jax.Array:
        """Decoder + head on precomputed encoder features — the post-encoder
        slice of ``__call__``. Also the entry point for the int8-quantized
        zone path (models/quantize.py), whose encoder runs outside Flax:
        ``model.apply(variables, feats, method="decode")``.

        ``feats[0]`` must be the input-resolution feature (smp's identity
        stage 0) — the inner-margin plan and the bilinear upsample factors
        derive the tile size from it.
        """
        if inner_margin is not None:
            m = inner_margin
            S = feats[0].shape[1]
            if self.arch == "unet":
                y, off = self.decoder(feats, train=train, inner_margin=m)
                logits = self.segmentation_head(y)
                logits = logits[:, m - off : S - m - off, m - off : S - m - off, :]
                return logits.astype(jnp.float32)
            if self.arch not in HEAD_UPSAMPLE:
                raise NotImplementedError(
                    "inner_margin supports arch 'unet' and the strided-head "
                    f"archs ({', '.join(sorted(HEAD_UPSAMPLE))})")
            # strided-head archs: decode at stride (the decoder needs global
            # context — PSP/ASPP pooling — so it runs full), apply the head on
            # the small map, then compute ONLY the interior rows/cols of the
            # align-corners upsample (same dot products as full-upsample +
            # crop, within reduction-order rounding; the (B, S, S, K) map is
            # never materialized)
            from flairtpu.models.deeplab import upsample_align_corners_window

            y = self.decoder(feats, train=train)
            logits = self.segmentation_head(y)
            up = HEAD_UPSAMPLE[self.arch]
            logits = upsample_align_corners_window(
                logits, (up * logits.shape[1], up * logits.shape[2]), m, S - m)
            return logits.astype(jnp.float32)
        y = self.decoder(feats, train=train)
        logits = self.segmentation_head(y)
        up = HEAD_UPSAMPLE.get(self.arch, 1)
        if up > 1:
            from flairtpu.models.deeplab import upsample_align_corners

            B, H, W, _ = logits.shape
            logits = upsample_align_corners(logits, (up * H, up * W))
        return logits.astype(jnp.float32)


def create_model(config: dict, dtype: Any = jnp.float32) -> FlairSegmentationModel:
    """Build the model described by a flair/zone-detect config dict."""
    mf = config["model_framework"]
    provider = mf["model_provider"]
    n_classes = config.get("n_classes") or len(config["classes"])

    if provider == "SegmentationModelsPytorch":
        # name validation lives in the registry, shared with config-time
        # checks (flairtpu/models/registry.py) so the two can never drift
        from flairtpu.models.registry import check_smp

        chans = config.get("channels")
        encoder, arch = check_smp(
            mf["SegmentationModelsPytorch"]["encoder_decoder"],
            n_channels=len(chans) if chans else None)
        return FlairSegmentationModel(
            encoder_name=encoder,
            arch=arch,
            classes=int(n_classes),
            use_metadata=bool(config.get("use_metadata", False)),
            remat=bool(config.get("remat", False)),
            s2d_stem=bool(config.get("s2d_stem", False)),
            dtype=dtype,
        )

    if provider == "HuggingFace":
        from flairtpu.models.segformer import create_hf_model

        return create_hf_model(mf["HuggingFace"]["org_model"], int(n_classes),
                               dtype, remat=bool(config.get("remat", False)),
                               remat_policy=config.get("remat_policy"))

    raise ValueError(
        "model_provider should be either HuggingFace or SegmentationModelsPytorch, "
        f"got {provider!r}")


def init_model(model: FlairSegmentationModel, input_shape: tuple[int, ...],
               seed: int = 0, metadata: bool | None = None):
    """Initialize variables; returns (params, batch_stats)."""
    rng = jax.random.PRNGKey(seed)
    x = jnp.zeros(input_shape, jnp.float32)
    use_md = model.use_metadata if metadata is None else metadata
    args = (x, jnp.zeros((input_shape[0], 45), jnp.float32)) if use_md else (x,)
    # jit the init: eager init dispatches hundreds of tiny ops, which is
    # pathologically slow on remote/tunneled TPU backends (~100s vs ~2s)
    variables = jax.jit(partial(model.init, train=False))(rng, *args)
    return variables["params"], variables.get("batch_stats", {})
