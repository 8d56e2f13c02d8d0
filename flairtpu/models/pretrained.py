"""Pretrained-encoder initialization from bare classifier checkpoints.

The reference never trains encoders from scratch: ``smp.create_model``
defaults ``encoder_weights="imagenet"`` (ref src/flair/model.py:35-41), which
makes smp download an ImageNet *classifier* state dict (torchvision /
efficientnet-pytorch / timm / pretrainedmodels format), load it into the
encoder, and adapt the first conv from 3 input channels to ``in_channels``
(smp ``encoders/_utils.py patch_first_conv``: cyclic channel repeat scaled by
``3 / in_channels``; channel-sum for 1-channel inputs).

flairtpu has no model-zoo egress, so the knob is explicit: the train config's
``init_encoder_weights: <path>.pth`` accepts exactly those bare classifier
state dicts and reproduces the same pipeline:

1. classifier-head tensors are dropped (``fc.`` / ``classifier.`` /
   ``last_linear.`` / ``_fc.`` ... per family — smp's encoders delete the
   same modules, cf. tests/smp_manifests);
2. the first 3-channel conv is channel-adapted with smp's rule;
3. keys are renamed into the smp *encoder* namespace (``encoder.`` prefix;
   ``encoder.model.`` for timm-mobilenetv3, which smp nests under
   ``self.model``) and mapped by the existing family converters
   (:mod:`flairtpu.models.convert`) into ``params/encoder`` +
   ``batch_stats/encoder`` Flax subtrees;
4. the encoder subtree is strictly validated (full coverage, exact shapes) —
   a partially-initialized encoder is an error, never a silent fallback.

The decoder and segmentation head keep their random init, matching the
reference: smp pretrains only the encoder (decoders are always random), and
a different head class count is expected (ImageNet has 1000 classes, FLAIR
13/19).
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Mapping

import numpy as np

# classifier-head key prefixes safe to drop for every supported family: no
# encoder keeps top-level tensors under these names
_COMMON_HEAD_PREFIXES = (
    "fc.", "classifier.", "last_linear.", "head.", "global_pool.", "logits.")
# efficientnet-pytorch head (after the blocks; smp's EfficientNetEncoder
# carries only _conv_stem/_bn0/_blocks — see tests/smp_manifests)
_EN_HEAD_PREFIXES = (
    "_fc.", "_conv_head.", "_bn1.", "_avg_pooling.", "_dropout.", "_swish.")
# timm efficientnet/mobilenetv3 head (smp keeps conv_stem/bn1/blocks only)
_TIMM_HEAD_PREFIXES = ("conv_head.", "bn2.", "flatten.", "act2.")

# families whose classifier -> encoder path is implemented and tested; other
# encoder names raise with a clear message instead of mis-converting
_SUPPORTED_PREFIXES = (
    "resnet", "resnext", "senet154", "se_resnet", "se_resnext",
    "efficientnet", "timm-efficientnet", "timm-mobilenetv3",
    "timm-resnest", "timm-res2net", "timm-res2next", "timm-skresnet",
    "timm-skresnext", "timm-regnet", "timm-gernet",
    "mobilenet_v2", "vgg", "densenet", "xception",
    "inceptionv4", "inceptionresnetv2", "dpn",
    "mobileone", "mit",
)

# Apple MobileOne classifier head (smp's MobileOneEncoder deletes gap+linear
# and pops linear.* on load)
_MOBILEONE_HEAD_PREFIXES = ("linear.", "gap.")

# torchvision's historical densenet zoo serialization splits norm/conv names
# (``denselayer1.norm.1.weight``); torchvision and smp both re-key on load
# (smp DenseNetEncoder.load_state_dict uses this exact pattern)
_DENSENET_REKEY = re.compile(
    r"^(.*denselayer\d+\.(?:norm|relu|conv))\."
    r"((?:[12])\.(?:weight|bias|running_mean|running_var))$")


def _drop_prefixes(encoder_name: str) -> tuple[str, ...]:
    drops = list(_COMMON_HEAD_PREFIXES)
    if encoder_name.startswith("efficientnet"):
        drops += _EN_HEAD_PREFIXES
    if encoder_name.startswith(("timm-efficientnet", "timm-mobilenetv3")):
        drops += _TIMM_HEAD_PREFIXES
    if encoder_name.startswith("mobileone"):
        drops += _MOBILEONE_HEAD_PREFIXES
    return tuple(drops)


def _adapt_conv(w: np.ndarray, in_channels: int, default: int) -> np.ndarray:
    """smp's first-conv channel rule on one OIHW conv weight."""
    if in_channels == 1:
        return w.sum(axis=1, keepdims=True).astype(w.dtype)
    new = np.stack([w[:, i % default] for i in range(in_channels)], axis=1)
    return (new * (default / in_channels)).astype(w.dtype)


def patch_first_conv(sd: Mapping[str, np.ndarray], in_channels: int,
                     default: int = 3) -> dict[str, np.ndarray]:
    """smp ``patch_first_conv`` parity on a state dict.

    Finds the first ``default``-input-channel conv weight in key order (smp
    iterates modules for the first Conv2d with ``in_channels == 3``) and
    rebuilds it for ``in_channels``: channel-sum for 1, else cyclic channel
    repeat scaled by ``default / in_channels``.
    """
    key = next(
        (k for k, v in sd.items()
         if k.endswith("weight") and getattr(np.asarray(v), "ndim", 0) == 4
         and np.asarray(v).shape[1] == default),
        None)
    if key is None:
        raise ValueError(
            f"no {default}-input-channel conv found to adapt to "
            f"{in_channels} channels — is this a bare ImageNet classifier "
            "state dict?")
    out = dict(sd)
    if in_channels == default:
        return out
    out[key] = _adapt_conv(np.asarray(sd[key]), in_channels, default)
    return out


def patch_mobileone_stem(sd: Mapping[str, np.ndarray], in_channels: int,
                         default: int = 3) -> dict[str, np.ndarray]:
    """MobileOne stem adaptation: EVERY stage0 input branch gets the rule.

    MobileOne's stage0 block reads the raw input through num_conv_branches
    3x3 ConvBN branches plus a 1x1 rbr_scale branch — all of them consume
    ``in_channels``. smp's generic ``patch_first_conv`` mutates only the
    first matching Conv2d module, which cannot yield a runnable multi-branch
    stem at in_channels != 3 (DEVIATIONS.md #17); flairtpu applies smp's
    channel rule to every stage0 conv that reads the input.
    """
    keys = [k for k, v in sd.items()
            if k.startswith("stage0.") and k.endswith("weight")
            and getattr(np.asarray(v), "ndim", 0) == 4
            and np.asarray(v).shape[1] == default]
    if not keys:
        raise ValueError(
            f"no {default}-input-channel stage0 conv found to adapt to "
            f"{in_channels} channels — is this a bare MobileOne classifier "
            "state dict?")
    out = dict(sd)
    if in_channels == default:
        return out
    for k in keys:
        out[k] = _adapt_conv(np.asarray(sd[k]), in_channels, default)
    return out


def classifier_to_encoder_state_dict(
        sd: Mapping[str, np.ndarray], encoder_name: str,
        in_channels: int) -> dict[str, np.ndarray]:
    """Bare ImageNet classifier state dict -> smp-encoder-namespace dict."""
    if not encoder_name.startswith(_SUPPORTED_PREFIXES):
        raise ValueError(
            f"init_encoder_weights: encoder family of {encoder_name!r} has "
            "no classifier-checkpoint converter (supported prefixes: "
            f"{', '.join(_SUPPORTED_PREFIXES)})")
    if encoder_name.startswith("densenet"):
        sd = {_DENSENET_REKEY.sub(r"\1\2", k): v for k, v in sd.items()}
    drops = _drop_prefixes(encoder_name)
    sd = {k: v for k, v in sd.items()
          if not k.startswith(drops) and not k.endswith("num_batches_tracked")}
    if not sd:
        raise ValueError("init_encoder_weights: state dict is empty after "
                         "dropping classifier-head keys")
    if encoder_name.startswith("mobileone"):
        sd = patch_mobileone_stem(sd, in_channels)
    else:
        sd = patch_first_conv(sd, in_channels)
    prefix = ("encoder.model." if encoder_name.startswith("timm-mobilenetv3")
              else "encoder.")
    return {prefix + k: v for k, v in sd.items()}


def init_encoder_from_classifier(
        path: str | Path, encoder_name: str, in_channels: int,
        variables: dict) -> dict:
    """Load a bare classifier ``.pth`` into the model's encoder subtree.

    Returns a new ``{'params', 'batch_stats'}`` dict whose encoder subtrees
    come from the checkpoint; everything else (decoder, head, metadata MLP)
    keeps the values in ``variables``. Raises when the converted encoder
    does not cover the model's encoder exactly (missing/unexpected keys or
    any shape mismatch).
    """
    from flairtpu.models import convert

    sd = convert.load_torch_state_dict(path)
    enc_sd = classifier_to_encoder_state_dict(sd, encoder_name, in_channels)
    enc = convert.torch_to_flax(enc_sd)
    ref = {"params": {"encoder": variables["params"]["encoder"]},
           "batch_stats": {"encoder": variables.get("batch_stats", {}).get(
               "encoder", {})}}
    if not ref["batch_stats"]["encoder"]:
        ref.pop("batch_stats")
        enc.pop("batch_stats", None)
    convert.validate_against(enc, ref, strict=True)
    out = {"params": dict(variables["params"]),
           "batch_stats": dict(variables.get("batch_stats", {}))}
    out["params"]["encoder"] = enc["params"]["encoder"]
    if "batch_stats" in enc and enc["batch_stats"].get("encoder"):
        out["batch_stats"]["encoder"] = enc["batch_stats"]["encoder"]
    return out
