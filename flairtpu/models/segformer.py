"""HuggingFace-provider models (reference src/flair/model.py:43-50).

The reference delegates to ``AutoModelForSemanticSegmentation`` (torch). The
TPU-native port implements the needed families in Flax. Not yet ported; the
factory raises with a clear message so SegmentationModelsPytorch users (the
published FLAIR-INC weights, the benchmark path) are unaffected.
"""

from __future__ import annotations


def create_hf_model(org_model: str, n_classes: int, dtype):
    raise NotImplementedError(
        f"HuggingFace provider model {org_model!r} is not yet ported to the TPU-native "
        "model zoo. Supported today: model_provider=SegmentationModelsPytorch with "
        "encoder_decoder in {resnet18,resnet34,resnet50,resnet101}_unet."
    )
