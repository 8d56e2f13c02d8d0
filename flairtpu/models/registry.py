"""Model-name registry: pure-string dispatch shared by config validation
and the model factories.

The reference defers model-name errors to construction time (smp/transformers
raise deep inside ``FLAIR_ModelFactory``, src/flair/model.py:35-50, often
after 30s of imports); here the same strings are validated at config time
with zero heavy imports, and the factories route through the same functions
so the two can never drift (tests/test_config.py locks the agreement).

``check_smp`` mirrors the reference's ``encoder_decoder`` split
(src/flair/model.py:35-41) and ``hf_family`` the org-model dispatch
(src/flair/model.py:43-50) over the transformers
AutoModelForSemanticSegmentation registry.
"""

from __future__ import annotations

import re

# smp architectures ported to Flax (smp.create_model's arch argument) —
# the complete smp 0.3.3 set
SMP_ARCHS = ("unet", "unetplusplus", "manet", "linknet", "fpn", "pspnet",
             "deeplabv3", "deeplabv3plus", "pan")

# encoder families ported to Flax (smp.create_model's encoder_name argument)
RESNET_ENCODERS = ("resnet18", "resnet34", "resnet50", "resnet101",
                   "resnet152", "resnext50_32x4d", "resnext101_32x4d",
                   "resnext101_32x8d", "resnext101_32x16d",
                   "resnext101_32x32d", "resnext101_32x48d")
EFFICIENTNET_ENCODERS = tuple(f"efficientnet-b{i}" for i in range(8))
MOBILENET_ENCODERS = ("mobilenet_v2",)
MOBILEONE_ENCODERS = tuple(f"mobileone_s{i}" for i in range(5))
VGG_ENCODERS = tuple(n for b in ("vgg11", "vgg13", "vgg16", "vgg19")
                     for n in (b, b + "_bn"))
DENSENET_ENCODERS = ("densenet121", "densenet161", "densenet169", "densenet201")
SENET_ENCODERS = ("se_resnet50", "se_resnet101", "se_resnet152",
                  "se_resnext50_32x4d", "se_resnext101_32x4d", "senet154")
XCEPTION_ENCODERS = ("xception",)
MIT_ENCODERS = tuple(f"mit_b{i}" for i in range(6))
DPN_ENCODERS = ("dpn68", "dpn68b", "dpn92", "dpn98", "dpn107", "dpn131")
INCEPTION_ENCODERS = ("inceptionresnetv2", "inceptionv4")
TIMM_EFFICIENTNET_ENCODERS = (
    tuple(f"timm-efficientnet-b{i}" for i in range(9))
    + ("timm-efficientnet-l2",)
    + tuple(f"timm-tf_efficientnet_lite{i}" for i in range(5)))
RESNEST_ENCODERS = ("timm-resnest14d", "timm-resnest26d", "timm-resnest50d",
                    "timm-resnest101e", "timm-resnest200e",
                    "timm-resnest269e", "timm-resnest50d_4s2x40d",
                    "timm-resnest50d_1s4x24d")
RES2NET_ENCODERS = ("timm-res2net50_26w_4s", "timm-res2net101_26w_4s",
                    "timm-res2net50_26w_6s", "timm-res2net50_26w_8s",
                    "timm-res2net50_48w_2s", "timm-res2net50_14w_8s",
                    "timm-res2next50")
MOBILENETV3_ENCODERS = tuple(
    f"timm-mobilenetv3_{m}_{w}" for m in ("large", "small")
    for w in ("075", "100", "minimal_100"))
SKNET_ENCODERS = ("timm-skresnet18", "timm-skresnet34",
                  "timm-skresnext50_32x4d")
REGNET_ENCODERS = tuple(
    f"timm-regnet{f}_{s}" for f in ("x", "y")
    for s in ("002", "004", "006", "008", "016", "032", "040", "064",
              "080", "120", "160", "320"))
GERNET_ENCODERS = ("timm-gernet_s", "timm-gernet_m", "timm-gernet_l")
SMP_ENCODERS = (RESNET_ENCODERS + EFFICIENTNET_ENCODERS + MOBILENET_ENCODERS
                + MOBILEONE_ENCODERS
                + VGG_ENCODERS + DENSENET_ENCODERS + SENET_ENCODERS
                + XCEPTION_ENCODERS + MIT_ENCODERS + DPN_ENCODERS
                + INCEPTION_ENCODERS + TIMM_EFFICIENTNET_ENCODERS
                + RESNEST_ENCODERS + RES2NET_ENCODERS
                + MOBILENETV3_ENCODERS + SKNET_ENCODERS + REGNET_ENCODERS
                + GERNET_ENCODERS)

# smp's VGG/DenseNet/Xception/InceptionV4/InceptionResNetV2 encoders override
# make_dilated to raise (pooling downsampling can't be dilated), so the archs
# that request a dilated encoder — deeplabv3/deeplabv3plus (encoders/_base.py)
# and pan (its model hardcodes encoder_output_stride=16) — fail for these
# encoders in smp too
_NO_DILATION_ENCODERS = frozenset(VGG_ENCODERS + DENSENET_ENCODERS
                                  + XCEPTION_ENCODERS + MIT_ENCODERS
                                  + INCEPTION_ENCODERS + RESNEST_ENCODERS
                                  + RES2NET_ENCODERS)
_DILATED_ARCHS = frozenset({"deeplabv3", "deeplabv3plus", "pan"})


def check_smp(encoder_decoder: str,
              n_channels: int | None = None) -> tuple[str, str]:
    """Split ``<encoder>_<arch>`` and validate both parts; returns (encoder, arch).

    Uses rsplit (vs the reference's bare split, src/flair/model.py:35) so
    underscore encoder names like resnext50_32x4d that crash the reference
    still parse.
    """
    if "_" not in encoder_decoder:
        raise NotImplementedError(
            f"encoder_decoder {encoder_decoder!r} is not of the form "
            "'<encoder>_<architecture>' (e.g. resnet34_unet)")
    encoder, arch = encoder_decoder.rsplit("_", 1)
    if arch not in SMP_ARCHS:
        raise NotImplementedError(
            f"architecture {arch!r} not ported (supported: "
            + ", ".join(SMP_ARCHS) + ")")
    if encoder not in SMP_ENCODERS:
        if encoder.startswith("tu-"):
            # smp's TimmUniversalEncoder wraps ANY timm model behind the
            # 'tu-' prefix — an unbounded surface that cannot be ported
            # model-by-model. Every encoder smp 0.3.3 registers natively
            # (including all its timm-* wrapper families) IS ported; point
            # the user at the equivalent registered name when one exists.
            hint = encoder[3:]
            matches = [e for e in SMP_ENCODERS
                       if hint and e in (hint, "timm-" + hint)]
            suggestion = (f" — did you mean {matches[0]!r}?" if matches
                          else "")
            raise NotImplementedError(
                f"encoder {encoder!r}: the smp 'tu-' (timm-universal) "
                "prefix wraps arbitrary timm models and is not ported; "
                "every encoder registered natively by smp 0.3.3 is "
                f"supported{suggestion}")
        raise NotImplementedError(
            f"encoder {encoder!r} not ported (supported: "
            + ", ".join(SMP_ENCODERS) + ")")
    if arch in _DILATED_ARCHS and encoder in _NO_DILATION_ENCODERS:
        if encoder in MIT_ENCODERS:
            # smp MixVisionTransformerEncoder.make_dilated
            raise ValueError(
                "MixVisionTransformer encoder does not support dilated "
                f"mode, so {arch!r} cannot use {encoder!r} — smp raises "
                "the same way (smp/encoders/mix_transformer.py)")
        if encoder in RES2NET_ENCODERS:
            # DEVIATION (#16 family): smp's replace_strides_with_dilation
            # leaves the is_first blocks' stride-2 AvgPool2d in place, so
            # the dilated stage's first block crashes inside torch.cat
            raise ValueError(
                f"Res2Net encoders cannot be dilated ({arch!r} with "
                f"{encoder!r}): smp's replace_strides_with_dilation keeps "
                "the is_first AvgPool2d stride and crashes in torch.cat — "
                "flairtpu fails fast instead (see DEVIATIONS.md #16)")
        if encoder in RESNEST_ENCODERS:
            # DEVIATION: smp does NOT raise here, but its make_dilated only
            # rewrites Conv2d strides while ResNeSt carries every stride-2
            # in an AvgPool2d, so smp silently keeps output stride 32 and
            # the dilated archs produce wrong-sized logits (DEVIATIONS.md)
            raise ValueError(
                f"ResNeSt encoders cannot be dilated ({arch!r} with "
                f"{encoder!r}): the strides live in avd/avg_down pools "
                "that smp's replace_strides_with_dilation does not "
                "rewrite — smp silently computes stride-32 features here; "
                "flairtpu fails fast instead (see DEVIATIONS.md)")
        family = ("VGG" if encoder.startswith("vgg") else
                  "Xception" if encoder == "xception" else
                  "InceptionV4" if encoder == "inceptionv4" else
                  "InceptionResnetV2" if encoder == "inceptionresnetv2" else
                  "DenseNet")
        raise ValueError(
            f"{family} encoders do not support dilated mode (pooling "
            f"downsampling), so {arch!r} cannot use {encoder!r} — smp "
            "raises the same way (smp/encoders/vgg.py, densenet.py, "
            "xception.py make_dilated)")
    if encoder in MIT_ENCODERS and arch in ("linknet", "unetplusplus"):
        # smp's UnetPlusPlus model raises explicitly for mit encoders, and
        # Linknet crashes inside torch (its decoder creates a Conv2d with 0
        # output channels from the zero-channel stride-2 dummy feature) —
        # both verified against the torch decoder mirrors
        raise ValueError(
            f"{arch!r} does not support the Mix-Vision-Transformer "
            f"encoders ({encoder!r}): the mit pyramid has a zero-channel "
            "stride-2 feature that breaks these decoders in smp as well")
    if (encoder in MIT_ENCODERS and n_channels is not None
            and n_channels != 3):
        # smp MixVisionTransformerEncoder.set_in_channels
        raise ValueError(
            "MixVisionTransformer encoder does not support in_channels "
            f"setting other than 3 (got {n_channels} channels) — smp "
            "raises the same way (smp/encoders/mix_transformer.py)")
    return encoder, arch


_SEGFORMER_RE = re.compile(r"(?:mit-|segformer-)?(b[0-5])")
_SWIN_RE = re.compile(r"swin-(tiny|small|base|large)")
_CONVNEXT_RE = re.compile(r"convnext-(tiny|small|base|large|xlarge)")
_MOBILEVITV2_RE = re.compile(r"mobilevitv2-(\d+\.\d+)")
_MOBILEVIT_RE = re.compile(r"mobilevit-(xx-small|x-small|small)")
_DPT_RE = re.compile(r"dpt-(base|large)")
_BEIT_RE = re.compile(r"(?:beit|data2vec-vision)-(base|large)")
_MNV2_RE = re.compile(r"_(\d+\.\d+)_")  # google/deeplabv3_mobilenet_v2_1.0_513

HF_FAMILIES = ("segformer", "swin", "convnext", "beit", "dpt", "mobilevit",
               "mobilevitv2", "mobilenet_v2")


def hf_family(org_model: str) -> tuple[str, str]:
    """Classify an HF org/model string; returns (family, size-spec).

    Families cover the complete AutoModelForSemanticSegmentation registry the
    reference can load (src/flair/model.py:43-50). Raises NotImplementedError
    with guidance for anything outside the ported zoo.
    """
    name = org_model.lower()
    if "dpt" in name:
        if "hybrid" in name:
            # R50+ViT-B/16 (Intel/dpt-hybrid-*); only the base ViT hybrid
            # was ever released
            return "dpt", "hybrid"
        dm = _DPT_RE.search(name)
        if not dm:
            raise NotImplementedError(
                f"DPT size in {org_model!r} is not ported (supported: "
                "dpt-base, dpt-large, dpt-hybrid, e.g. Intel/dpt-large-ade).")
        return "dpt", dm.group(1)
    if "mobilenet_v2" in name or "mobilenet-v2" in name:
        dm = _MNV2_RE.search(name)
        return "mobilenet_v2", dm.group(1) if dm else "1.0"
    if "mobilevitv2" in name:
        mv = _MOBILEVITV2_RE.search(name)
        if not mv:
            raise NotImplementedError(
                f"MobileViTV2 width in {org_model!r} is not ported (supported: "
                "width-multiplier names like apple/mobilevitv2-1.0-imagenet1k-256).")
        return "mobilevitv2", mv.group(1)
    if "mobilevit" in name:
        mv = _MOBILEVIT_RE.search(name)
        if not mv:
            raise NotImplementedError(
                f"MobileViT size in {org_model!r} is not ported (supported: "
                "small, x-small, xx-small, e.g. apple/deeplabv3-mobilevit-small).")
        return "mobilevit", mv.group(1)
    if "beit" in name or "data2vec" in name:
        bm = _BEIT_RE.search(name)
        if not bm:
            raise NotImplementedError(
                f"BEiT size in {org_model!r} is not ported (supported: "
                "beit-base, beit-large, data2vec-vision-base/large, e.g. "
                "microsoft/beit-base-finetuned-ade-640-640).")
        return "beit", bm.group(1)
    sw = _SWIN_RE.search(name)
    cn = _CONVNEXT_RE.search(name)
    if "upernet" in name or sw or cn:
        if sw:
            return "swin", sw.group(1)
        if cn:
            return "convnext", cn.group(1)
        raise NotImplementedError(
            f"UperNet backbone in {org_model!r} is not ported (supported: "
            "swin-tiny/small/base/large, convnext-tiny/small/base/large/xlarge, "
            "beit-base/large).")
    m = _SEGFORMER_RE.search(name)
    if not m:
        raise NotImplementedError(
            f"HuggingFace model {org_model!r} is not in the ported TPU-native zoo. "
            "Supported: SegFormer (nvidia/segformer-b0..b5, nvidia/mit-b0..b5), "
            "UperNet-Swin (openmmlab/upernet-swin-tiny/small/base/large), "
            "UperNet-ConvNeXt (openmmlab/upernet-convnext-*), BEiT "
            "(microsoft/beit-base/large-finetuned-ade-*), Data2Vec-Vision "
            "(facebook/data2vec-vision-base/large), DPT incl. hybrid "
            "(Intel/dpt-large-ade, Intel/dpt-hybrid-midas), "
            "MobileViT (apple/deeplabv3-mobilevit-*), MobileViTV2 "
            "(apple/mobilevitv2-*) and MobileNetV2 "
            "(google/deeplabv3_mobilenet_v2_*). For ResNet-U-Net use "
            "the SegmentationModelsPytorch provider.")
    return "segformer", m.group(1)


def validate_model_framework(mf: dict, n_channels: int | None = None) -> None:
    """Config-time model-name check (raises NotImplementedError on gaps)."""
    provider = mf.get("model_provider")
    if provider == "SegmentationModelsPytorch":
        check_smp(mf["SegmentationModelsPytorch"]["encoder_decoder"],
                  n_channels=n_channels)
    elif provider == "HuggingFace":
        hf_family(mf["HuggingFace"]["org_model"])
