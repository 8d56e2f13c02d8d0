"""Model factory: config -> Flax segmentation model.

Provider dispatch mirrors the reference FLAIR_ModelFactory
(src/flair/model.py:20-50, src/zone_detect/model.py:12-58):

- ``SegmentationModelsPytorch`` + ``encoder_decoder: resnet34_unet`` (and the
  other resnet encoders) -> first-party Flax ResNet-U-Net, weight-compatible
  with the published FLAIR-INC ``.pth`` checkpoints via
  :mod:`flairtpu.models.convert`.
- ``HuggingFace`` -> first-party Flax ports dispatched by org model name:
  SegFormer b0-b5 (``nvidia/segformer*``), Swin-UperNet
  (``openmmlab/upernet-swin-*``, the reference default) and ConvNeXt-UperNet
  (``openmmlab/upernet-convnext-*``); unsupported org models raise with a
  clear message listing the supported families.

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


class FlairSegmentationModel(nn.Module):
    """Encoder/decoder/head with optional metadata fusion (train+infer)."""

    encoder_name: str = "resnet34"
    classes: int = 13
    use_metadata: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = ResNetEncoder(name_spec=self.encoder_name, dtype=self.dtype)
        self.decoder = UnetDecoder(dtype=self.dtype)
        self.segmentation_head = SegmentationHead(self.classes, dtype=self.dtype)
        if self.use_metadata:
            self.metadata_mlp = MetadataMLP(dtype=self.dtype)

    def __call__(self, x: jax.Array, mtd: jax.Array | None = None,
                 train: bool = False) -> jax.Array:
        """x: (B, H, W, C) in NHWC. Returns fp32 logits (B, H, W, classes)."""
        feats = self.encoder(x.astype(self.dtype), train=train)
        if self.use_metadata:
            if mtd is None:
                raise ValueError("use_metadata=True but no metadata passed")
            emb = self.metadata_mlp(mtd, train=train)
            feats = feats[:-1] + [fuse_metadata(feats[-1], emb)]
        y = self.decoder(feats, train=train)
        logits = self.segmentation_head(y)
        return logits.astype(jnp.float32)


def create_model(config: dict, dtype: Any = jnp.float32) -> FlairSegmentationModel:
    """Build the model described by a flair/zone-detect config dict."""
    mf = config["model_framework"]
    provider = mf["model_provider"]
    n_classes = config.get("n_classes") or len(config["classes"])

    if provider == "SegmentationModelsPytorch":
        encoder, arch = mf["SegmentationModelsPytorch"]["encoder_decoder"].split("_")
        if arch != "unet":
            raise NotImplementedError(
                f"architecture {arch!r} not yet ported (supported: unet)")
        if encoder not in RESNET_SPECS:
            raise NotImplementedError(
                f"encoder {encoder!r} not yet ported (supported: {sorted(RESNET_SPECS)})")
        return FlairSegmentationModel(
            encoder_name=encoder,
            classes=int(n_classes),
            use_metadata=bool(config.get("use_metadata", False)),
            dtype=dtype,
        )

    if provider == "HuggingFace":
        from flairtpu.models.segformer import create_hf_model

        return create_hf_model(mf["HuggingFace"]["org_model"], int(n_classes), dtype)

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
