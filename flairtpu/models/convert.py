"""torch checkpoint -> Flax variables converter.

Loads the reference ecosystem's artifacts — bare smp ``.pth`` state dicts
(e.g. FLAIR-INC_rgbie_15cl_resnet34-unet_weights.pth) and Lightning ``.ckpt``
files — and maps them onto :class:`flairtpu.models.factory.FlairSegmentationModel`
variables. Key handling mirrors the reference loader (src/zone_detect/model.py:61-88):
``.ckpt`` unwraps ``state_dict`` and strips the ``model.seg_model.`` prefix;
unlike the reference, the metadata MLP (``model.enc.enc_mlp.*``) is also
recovered when present.

Layout transforms: torch conv (O, I, kH, kW) -> flax (kH, kW, I, O);
torch linear (out, in) -> flax (in, out); BatchNorm weight/bias ->
scale/bias and running stats -> batch_stats.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Mapping

import numpy as np


def load_torch_state_dict(path: str | Path) -> dict[str, np.ndarray]:
    """Read a .pth/.ckpt file into {torch_key: np.ndarray} (host, fp32-as-is)."""
    import torch

    obj = torch.load(str(path), map_location="cpu", weights_only=True)
    if str(path).endswith(".ckpt") and isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if hasattr(obj, "state_dict") and not isinstance(obj, dict):
        obj = obj.state_dict()
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in obj.items()}


def normalize_keys(sd: Mapping[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Strip Lightning wrappers: model.seg_model.* -> *, keep model.enc.* MLP."""
    first = next(iter(sd), "")
    if "model.seg_model." in first or any(k.startswith("model.seg_model.") for k in sd):
        out = {}
        for k, v in sd.items():
            if k.startswith("model.seg_model."):
                out[k[len("model.seg_model."):]] = v
            elif k.startswith("model.enc."):
                out[k[len("model."):]] = v  # enc.enc_mlp.*
            # criterion.*, optimizer state etc. are dropped
        return out
    return dict(sd)


_LAYER_RE = re.compile(r"^encoder\.layer(\d+)\.(\d+)\.(.+)$")
# EfficientNet encoder (smp wraps efficientnet-pytorch: encoder._conv_stem /
# encoder._blocks.{j}.{_expand_conv,_bn0,_depthwise_conv,_bn1,_se_reduce,
# _se_expand,_project_conv,_bn2})
_EN_CONV_RE = re.compile(
    r"^encoder\._blocks\.(\d+)\."
    r"(_expand_conv|_depthwise_conv|_project_conv|_se_reduce|_se_expand)"
    r"\.(weight|bias)$")
_EN_BN_RE = re.compile(r"^encoder\._blocks\.(\d+)\.(_bn0|_bn1|_bn2)\.(.+)$")
_EN_CONV_NAME = {"_expand_conv": "expand_conv", "_depthwise_conv": "dw_conv",
                 "_project_conv": "project_conv", "_se_reduce": "se_reduce",
                 "_se_expand": "se_expand"}
_EN_BN_NAME = {"_bn0": "expand_bn", "_bn1": "dw_bn", "_bn2": "project_bn"}
# torchvision-backed smp encoders (models/tv_encoders.py): mobilenet_v2
# (torchvision features.{i} InvertedResiduals + ConvBNReLU stem/head), vgg
# (flat conv/bn Sequential indices) and densenet (named blocks/transitions)
_TV_STEM_RE = re.compile(r"^encoder\.features\.(0|18)\.([01])\.(.+)$")
_TV_IR_RE = re.compile(r"^encoder\.features\.(\d+)\.conv\.(.+)$")
_TV_VGG_RE = re.compile(
    r"^encoder\.features\.(\d+)\."
    r"(weight|bias|running_mean|running_var|num_batches_tracked)$")
_TV_DN_RE = re.compile(r"^encoder\.features\.([a-z][\w.]*)\.([^.]+)$")
# Xception encoder (models/xception.py): block{i}.rep.{j} separable stacks,
# block{i}.skip/skipbn residuals, conv3/conv4 exit-flow separables; flax
# submodules are named by the torch Sequential index (rep{j}_dw/_pw/_bn)
_XC_BLOCK_RE = re.compile(r"^encoder\.block(\d+)\.(.+)$")
_XC_EXIT_RE = re.compile(r"^encoder\.conv([34])\.(conv1|pointwise)\.weight$")
_XC_BN_RE = re.compile(r"^encoder\.bn([1-4])\.(.+)$")
# smp Mix-Vision-Transformer encoder (models/mit.py; smp vendors NVlabs'
# segformer backbone): patch_embed{s}, block{s}.{j} (fused kv linear, split
# into the Flax key/value pair), final norm{s} LayerNorms.  Matched BEFORE
# the xception block regex (mit block keys are block{s}.{j}.*, xception's
# are block{i}.rep/skip*).
# DPN encoder (models/dpn.py): features.conv{s}_{i} dual-path blocks with
# BnActConv submodules, features.conv1_1 stem, features.conv5_bn_ac tail
_DPN_RE = re.compile(r"^encoder\.features\.(conv\d+_\d+|conv5_bn_ac)\.(.+)$")
# timm-EfficientNet encoder (models/timm_efficientnet.py): conv_stem/bn1
# stem (bn1 shares the xception stem-BN rename path), nested
# blocks.{stage}.{idx} Sequential with conv_pw/conv_dw/conv_pwl, bn1/bn2/
# bn3 and se.conv_reduce/se.conv_expand leaves
_TIMM_EN_RE = re.compile(r"^encoder\.blocks\.(\d+)\.(\d+)\.(.+)$")
# timm-resnest deep stem (models/resnest.py): conv1 is a Sequential with
# convs at 0/3/6 and BNs at 1/4 (the outer bn1 shares the xception rename)
_RESNEST_STEM_RE = re.compile(r"^encoder\.conv1\.(\d)\.(.+)$")
# timm-mobilenetv3 (models/timm_mobilenetv3.py): smp holds the timm model
# under self.model, so every key carries an extra "model." prefix
_MNV3_RE = re.compile(r"^encoder\.model\.(.+)$")
# timm-regnet (models/regnet.py): stem ConvNormAct + s{k}.b{i} stages with
# conv1/conv2/conv3 ConvNormActs, regnety se.fc1/fc2, downsample ConvNorm
_REGNET_RE = re.compile(r"^encoder\.(s[1-4])\.(b\d+)\.(.+)$")
# timm-gernet (models/gernet.py): ByobNet stages.{s}.{i} blocks of named
# ConvNormActs (conv1_kxk/conv2_kxk/conv1_1x1/conv3_1x1/shortcut) plus the
# 1x1 final_conv; the stem shares the regnet stem.{conv,bn} branch
_GERNET_RE = re.compile(
    r"^encoder\.(?:stages\.(\d+)\.(\d+)\.)?"
    r"(final_conv|conv1_kxk|conv2_kxk|conv1_1x1|conv3_1x1|shortcut)"
    r"\.(conv|bn)\.(.+)$")
# mobileone (models/mobileone.py): stage0 + stage{n}.{i} blocks of
# rbr_conv.{j}/rbr_scale ConvBN branches, bare-BN rbr_skip, se.reduce/expand
_MOBILEONE_RE = re.compile(
    r"^encoder\.stage(\d)(?:\.(\d+))?\."
    r"(rbr_conv\.\d+|rbr_scale|rbr_skip|se\.reduce|se\.expand)\.(.+)$")
# Inception encoders (models/inception.py).  InceptionV4 keys live in a
# numeric features.{i} Sequential whose rest is always conv.weight / bn.* /
# conv.{conv,bn}.* (Mixed_3a/5a) / branch*... — distinct from mobilenet_v2's
# features.{i}.conv.{j}... and vgg's flat features.{i}.{leaf}.
# InceptionResNetV2 uses named top attrs (conv2d_1a, mixed_5b, repeat.{j},
# block8, ...).  Both are matched BEFORE the xception block regex (the irv2
# ``block8`` top attr collides with xception's block{i} names) and before
# the mobilenet InvertedResidual regex.
_INC4_RE = re.compile(
    r"^encoder\.features\.(\d+)\."
    r"(conv\.weight|bn\.[a-z_]+|conv\.(?:conv|bn)\.[a-z_]+|branch.+)$")
_IRV2_RE = re.compile(
    r"^encoder\.(conv2d_\d+[ab]|mixed_\d+[ab]|repeat(?:_\d+)?\.\d+|block8)"
    r"\.(.+)$")
_MIT_EMBED_RE = re.compile(
    r"^encoder\.patch_embed([1-4])\.(proj|norm)\.(weight|bias)$")
_MIT_BLOCK_RE = re.compile(r"^encoder\.block([1-4])\.(\d+)\.(.+)$")
_MIT_NORM_RE = re.compile(r"^encoder\.norm([1-4])\.(weight|bias)$")
# torch leaf path within a mit block -> (flax submodule path, tensor kind)
_MIT_LEAF = {
    "norm1": (("norm1",), "ln"),
    "norm2": (("norm2",), "ln"),
    "attn.q": (("attn", "query"), "linear"),
    "attn.proj": (("attn", "out"), "linear"),
    "attn.sr": (("attn", "sr"), "conv"),
    "attn.norm": (("attn", "sr_norm"), "ln"),
    "mlp.fc1": (("mlp", "dense1"), "linear"),
    "mlp.dwconv.dwconv": (("mlp", "dwconv"), "conv"),
    "mlp.fc2": (("mlp", "dense2"), "linear"),
}


def _densenet_flax_path(path: str) -> tuple[str, ...]:
    """features.<dotted torch name> -> tv_encoders flax module path."""
    parts = path.split(".")
    if len(parts) == 1:
        return (parts[0],)  # conv0 / norm0 / norm5
    if parts[0].startswith("denseblock") and len(parts) == 3:
        b = parts[0][len("denseblock"):]
        l = parts[1][len("denselayer"):]
        return (f"db{b}_l{l}", parts[2])  # DenseLayer submodule
    if parts[0].startswith("transition") and len(parts) == 2:
        return (f"tr{parts[0][len('transition'):]}_{parts[1]}",)
    raise KeyError(f"unrecognized densenet encoder path {path!r}")
_BLOCK_RE = re.compile(r"^decoder\.blocks\.(x_\d+_\d+|\d+)\.(conv[12])\.([01])\.(.+)$")
_MLP_RE = re.compile(r"^enc\.enc_mlp\.(\d+)\.(weight|bias)$")
_DEEPLAB_RE = re.compile(r"^decoder\.(aspp|block1|block2)\.(.+)$")
# FPN: p5 / pN.skip_conv laterals + seg_blocks.{i}.block.{j}.block.{0 conv,1 gn}
_FPN_LATERAL_RE = re.compile(r"^decoder\.p(\d)(?:\.skip_conv)?\.(weight|bias)$")
_FPN_SEG_RE = re.compile(
    r"^decoder\.seg_blocks\.(\d+)\.block\.(\d+)\.block\.([01])\.(weight|bias)$")
# PSPNet: psp.blocks.{i}.pool.1.{0 conv,1 bn} + decoder.conv.{0,1}
_PSP_RE = re.compile(r"^decoder\.(?:psp\.blocks\.(\d+)\.pool\.1|conv)\.([01])\.(.+)$")
# LinkNet: blocks.{i}.block.{0 Conv2dReLU,1 TransposeX2,2 Conv2dReLU}.{sub}
_LINKNET_RE = re.compile(r"^decoder\.blocks\.(\d+)\.block\.([012])\.([012])\.(.+)$")
# DeepLabV3 (non-plus, nn.Sequential decoder): decoder.{0 ASPP,1 conv,2 bn}
_DLV3_RE = re.compile(r"^decoder\.([012])\.(.+)$")
# MAnet: center PAB convs + blocks.{i}.{hl_conv,SE_ll,SE_hl} (the MFAB
# conv1/conv2 fusion convs share the unet _BLOCK_RE path)
_MANET_CENTER_RE = re.compile(
    r"^decoder\.center\.(top_conv|center_conv|bottom_conv|out_conv)\.(weight|bias)$")
_MANET_HL_RE = re.compile(
    r"^decoder\.blocks\.(\d+)\.hl_conv\.([01])\.([01])\.(.+)$")
_MANET_SE_RE = re.compile(
    r"^decoder\.blocks\.(\d+)\.SE_(ll|hl)\.([13])\.(weight|bias)$")
# PAN: fpa/gau ConvBnRelu submodules (keys <mod>.conv.* / <mod>.bn.*)
_PAN_RE = re.compile(r"^decoder\.(fpa|gau[123])\.(.+)$")
# PAN Sequential-position -> flax submodule name
_PAN_FPA_SUB = {"branch1.1": "branch1", "mid.0": "mid", "down1.1": "down1",
                "down2.1": "down2", "down3.1": "down3_0", "down3.2": "down3_1",
                "conv1": "conv1", "conv2": "conv2"}

_BN_PARAM = {"weight": ("params", "scale"), "bias": ("params", "bias")}
_BN_STATS = {"running_mean": ("batch_stats", "mean"), "running_var": ("batch_stats", "var")}


def _convert_tensor(torch_key_leaf: str, arr: np.ndarray, kind: str) -> np.ndarray:
    if kind == "conv" and torch_key_leaf == "weight":
        return np.transpose(arr, (2, 3, 1, 0))
    if kind == "linear" and torch_key_leaf == "weight":
        return arr.T
    return arr


def _bn_dest(leaf: str):
    """Return (collection, flax_leaf) for a batchnorm tensor, or None to skip."""
    if leaf in _BN_PARAM:
        return _BN_PARAM[leaf]
    if leaf in _BN_STATS:
        return _BN_STATS[leaf]
    if leaf == "num_batches_tracked":
        return None
    raise KeyError(f"unexpected batchnorm leaf {leaf!r}")


def torch_to_flax(sd: Mapping[str, np.ndarray]) -> dict[str, dict]:
    """Map a normalized smp-style state dict to {'params':..., 'batch_stats':...}."""
    params: dict = {}
    stats: dict = {}
    vgg_bn_idx: set | None = None  # lazily: features indices with running stats

    def put(collection: str, path: tuple[str, ...], value: np.ndarray):
        tree = params if collection == "params" else stats
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def put_bn(module_path: tuple[str, ...], leaf: str, arr: np.ndarray):
        dest = _bn_dest(leaf)
        if dest is None:
            return
        coll, flax_leaf = dest
        put(coll, module_path + (flax_leaf,), arr)

    for key, arr in sd.items():
        arr = np.asarray(arr)
        # --- encoder stem (resnet conv1/bn1; xception also conv2/bn2-4) ---
        if key in ("encoder.conv1.weight", "encoder.conv2.weight"):
            put("params", ("encoder", key.split(".")[1], "kernel"),
                _convert_tensor("weight", arr, "conv"))
            continue
        # --- mit (mix-vision-transformer) encoder ---
        m = _MIT_EMBED_RE.match(key)
        if m:
            s, sub, leaf = m.groups()
            mod = ("encoder", f"embed{int(s) - 1}")
            if sub == "proj":
                put("params", mod + ("proj", "kernel" if leaf == "weight" else "bias"),
                    _convert_tensor(leaf, arr, "conv"))
            else:  # LayerNorm
                put("params", mod + ("norm", "scale" if leaf == "weight" else "bias"),
                    arr)
            continue
        m = _MIT_BLOCK_RE.match(key)
        if m:
            s, j, rest = m.groups()
            mod = ("encoder", f"block{int(s) - 1}_{j}")
            sub, leaf = rest.rsplit(".", 1)
            if sub == "attn.kv":
                # NVlabs fused kv Linear: first C output rows are key, the
                # last C are value (reshape(B, N, 2, heads, hd) order)
                C = arr.shape[0] // 2
                for half, nm in ((arr[:C], "key"), (arr[C:], "value")):
                    put("params",
                        mod + ("attn", nm, "kernel" if leaf == "weight" else "bias"),
                        _convert_tensor(leaf, half, "linear"))
                continue
            path, kind = _MIT_LEAF[sub]
            if kind == "ln":
                put("params",
                    mod + path + ("scale" if leaf == "weight" else "bias",), arr)
            else:
                put("params",
                    mod + path + ("kernel" if leaf == "weight" else "bias",),
                    _convert_tensor(leaf, arr, kind))
            continue
        m = _MIT_NORM_RE.match(key)
        if m:
            s, leaf = m.groups()
            put("params", ("encoder", f"norm{int(s) - 1}",
                           "scale" if leaf == "weight" else "bias"), arr)
            continue
        # --- inception encoders (BasicConv conv/bn leaves, Sequential
        # branch indices flattened to branch{k}_{j} flax names, residual
        # blocks' biased 1x1 `conv2d`) ---
        def _put_inception(mod_prefix: tuple[str, ...], rest: str,
                           arr=arr) -> None:
            parts = rest.split(".")
            leaf, sub = parts[-1], parts[-2]
            mod = mod_prefix + (("_".join(parts[:-2]),) if parts[:-2] else ())
            if sub == "bn":
                put_bn(mod + ("bn",), leaf, arr)
            elif sub == "conv":
                put("params", mod + ("conv", "kernel"),
                    _convert_tensor("weight", arr, "conv"))
            elif sub == "conv2d":  # Block35/17/8 residual 1x1, bias=True
                put("params",
                    mod + ("conv2d", "kernel" if leaf == "weight" else "bias"),
                    _convert_tensor(leaf, arr, "conv"))
            else:
                raise KeyError(f"unrecognized inception encoder key {key!r}")

        m = _INC4_RE.match(key)
        if m:
            i, rest = m.groups()
            _put_inception(("encoder", f"features{i}"), rest)
            continue
        m = _IRV2_RE.match(key)
        if m:
            top, rest = m.groups()
            # xception's block{i} names include block8 — its rest starts
            # rep/skip, the irv2 residual block's starts branch/conv2d
            if top != "block8" or rest.split(".", 1)[0] in (
                    "branch0", "branch1", "conv2d"):
                _put_inception(("encoder", top.replace(".", "_")), rest)
                continue
        m = _XC_BN_RE.match(key)
        if m:
            put_bn(("encoder", f"bn{m.group(1)}"), key.rsplit(".", 1)[1], arr)
            continue
        # --- xception exit-flow separables (conv3/conv4) ---
        m = _XC_EXIT_RE.match(key)
        if m:
            i, sub = m.groups()
            which = "dw" if sub == "conv1" else "pw"
            put("params", ("encoder", f"conv{i}_{which}", "kernel"),
                _convert_tensor("weight", arr, "conv"))
            continue
        # --- xception blocks ---
        m = _XC_BLOCK_RE.match(key)
        if m:
            i, rest = m.groups()
            mod = ("encoder", f"block{i}")
            parts = rest.split(".")
            leaf = parts[-1]
            if parts[0] == "rep":
                j = parts[1]
                if len(parts) == 4:  # rep.{j}.{conv1|pointwise}.weight
                    which = "dw" if parts[2] == "conv1" else "pw"
                    put("params", mod + (f"rep{j}_{which}", "kernel"),
                        _convert_tensor("weight", arr, "conv"))
                else:  # rep.{j}.{bn leaf}
                    put_bn(mod + (f"rep{j}_bn",), leaf, arr)
            elif parts[0] == "skip":
                put("params", mod + ("skip", "kernel"),
                    _convert_tensor("weight", arr, "conv"))
            elif parts[0] == "skipbn":
                put_bn(mod + ("skipbn",), leaf, arr)
            else:
                raise KeyError(f"unrecognized xception encoder key {key!r}")
            continue
        # --- timm-mobilenetv3 encoder (extra model. prefix) ---
        m = _MNV3_RE.match(key)
        if m:
            rest_all = m.group(1)
            if rest_all == "conv_stem.weight":
                put("params", ("encoder", "conv_stem", "kernel"),
                    _convert_tensor("weight", arr, "conv"))
            elif rest_all.startswith("bn1."):
                put_bn(("encoder", "bn1"), rest_all.rsplit(".", 1)[1], arr)
            elif rest_all.startswith("blocks."):
                _, s, i, *parts = rest_all.split(".")
                mod = ("encoder", f"s{s}_b{i}")
                leaf = parts[-1]
                if parts[0].startswith("bn"):
                    put_bn(mod + (parts[0],), leaf, arr)
                elif parts[0] == "se":
                    put("params",
                        mod + (parts[1].replace("conv_", "se_"),
                               "kernel" if leaf == "weight" else leaf),
                        _convert_tensor(leaf, arr, "conv"))
                elif parts[0].startswith("conv"):
                    put("params", mod + (parts[0], "kernel"),
                        _convert_tensor("weight", arr, "conv"))
                else:
                    raise KeyError(
                        f"unrecognized mobilenetv3 encoder key {key!r}")
            else:
                raise KeyError(
                    f"unrecognized mobilenetv3 encoder key {key!r}")
            continue
        # --- timm-efficientnet encoder ---
        if key == "encoder.conv_stem.weight":
            put("params", ("encoder", "conv_stem", "kernel"),
                _convert_tensor("weight", arr, "conv"))
            continue
        m = _TIMM_EN_RE.match(key)
        if m:
            s, i, rest = m.groups()
            mod = ("encoder", f"s{s}_b{i}")
            parts = rest.split(".")
            leaf = parts[-1]
            if parts[0].startswith("bn"):
                put_bn(mod + (parts[0],), leaf, arr)
            elif parts[0] == "se":
                put("params", mod + (parts[1].replace("conv_", "se_"),
                                     "kernel" if leaf == "weight" else leaf),
                    _convert_tensor(leaf, arr, "conv"))
            elif parts[0].startswith("conv_"):
                put("params", mod + (parts[0], "kernel"),
                    _convert_tensor("weight", arr, "conv"))
            else:
                raise KeyError(
                    f"unrecognized timm-efficientnet encoder key {key!r}")
            continue
        # --- efficientnet encoder ---
        if key == "encoder._conv_stem.weight":
            put("params", ("encoder", "stem_conv", "kernel"),
                _convert_tensor("weight", arr, "conv"))
            continue
        if key.startswith("encoder._bn0."):
            put_bn(("encoder", "stem_bn"), key.rsplit(".", 1)[1], arr)
            continue
        m = _EN_CONV_RE.match(key)
        if m:
            j, name, leaf = m.groups()
            put("params", ("encoder", f"block{j}", _EN_CONV_NAME[name],
                           "kernel" if leaf == "weight" else leaf),
                _convert_tensor(leaf, arr, "conv"))
            continue
        m = _EN_BN_RE.match(key)
        if m:
            j, name, leaf = m.groups()
            put_bn(("encoder", f"block{j}", _EN_BN_NAME[name]), leaf, arr)
            continue
        # --- mobilenet_v2 encoder stem/head (ConvBNReLU at features.0/.18) ---
        m = _TV_STEM_RE.match(key)
        if m:
            i, sub, leaf = m.groups()
            if sub == "0":
                put("params", ("encoder", f"f{i}_conv", "kernel"),
                    _convert_tensor("weight", arr, "conv"))
            else:
                put_bn(("encoder", f"f{i}_bn"), leaf, arr)
            continue
        # --- mobilenet_v2 encoder blocks (torchvision InvertedResidual) ---
        m = _TV_IR_RE.match(key)
        if m:
            i, rest = m.groups()
            parts = rest.split(".")
            mod = ("encoder", f"f{i}")
            # torchvision width-1.0 layout: features.1 is the lone
            # expand_ratio-1 block (conv = [dw ConvBNReLU, project, bn]);
            # all others are [expand, dw, project, bn]
            expandless = i == "1"
            if len(parts) == 3:  # ConvBNReLU member: (j, 0 conv | 1 bn, leaf)
                j, sub, leaf = parts
                name = "dw" if (expandless or j == "1") else "expand"
                if sub == "0":
                    put("params", mod + (name, "kernel"),
                        _convert_tensor("weight", arr, "conv"))
                else:
                    put_bn(mod + (f"{name}_bn",), leaf, arr)
            else:  # (j, leaf): the 1x1 linear projection conv or its BN
                leaf = parts[1]
                if leaf == "weight" and arr.ndim == 4:
                    put("params", mod + ("project", "kernel"),
                        _convert_tensor("weight", arr, "conv"))
                else:
                    put_bn(mod + ("project_bn",), leaf, arr)
            continue
        # --- vgg encoder (flat torchvision features indices) ---
        m = _TV_VGG_RE.match(key)
        if m:
            i, leaf = m.groups()
            if vgg_bn_idx is None:
                vgg_bn_idx = {
                    k.split(".")[2] for k in sd
                    if k.startswith("encoder.features.")
                    and k.endswith(".running_mean") and k.count(".") == 3}
            if i in vgg_bn_idx:
                put_bn(("encoder", f"f{i}"), leaf, arr)
            else:  # conv (bias=True in torchvision VGG)
                put("params", ("encoder", f"f{i}",
                               "kernel" if leaf == "weight" else leaf),
                    _convert_tensor(leaf, arr, "conv"))
            continue
        # --- dpn encoder (named dual-path blocks; BEFORE densenet, whose
        # catch-all features regex would swallow these keys) ---
        m = _DPN_RE.match(key)
        if m:
            blk, rest = m.groups()
            parts = rest.split(".")
            leaf = parts[-1]
            if parts[-2] == "bn":
                put_bn(("encoder", blk) + tuple(parts[:-1]), leaf, arr)
            elif leaf == "weight":
                # <sub>.conv.weight or the b-flavor c1x1_c1/c1x1_c2.weight
                put("params",
                    ("encoder", blk) + tuple(parts[:-1]) + ("kernel",),
                    _convert_tensor("weight", arr, "conv"))
            else:
                raise KeyError(f"unrecognized dpn encoder key {key!r}")
            continue
        # --- densenet encoder (named blocks/transitions) ---
        m = _TV_DN_RE.match(key)
        if m:
            path, leaf = m.groups()
            mod = ("encoder",) + _densenet_flax_path(path)
            if mod[-1].startswith("conv") or mod[-1].endswith("conv"):
                put("params", mod + ("kernel",),
                    _convert_tensor("weight", arr, "conv"))
            else:
                put_bn(mod, leaf, arr)
            continue
        # --- timm-regnet ---
        if key.startswith("encoder.stem."):
            _, _, sub, leaf = key.split(".")
            if sub == "conv":
                put("params", ("encoder", "stem", "conv", "kernel"),
                    _convert_tensor("weight", arr, "conv"))
            else:
                put_bn(("encoder", "stem", "bn"), leaf, arr)
            continue
        m = _REGNET_RE.match(key)
        if m:
            s, b, rest = m.groups()
            mod = ("encoder", f"{s}_{b}")
            parts = rest.split(".")
            leaf = parts[-1]
            if parts[0] == "se":
                put("params", mod + ("se", parts[1],
                                     "kernel" if leaf == "weight" else leaf),
                    _convert_tensor(leaf, arr, "conv"))
            elif parts[1] == "conv":
                put("params", mod + (parts[0], "conv", "kernel"),
                    _convert_tensor("weight", arr, "conv"))
            elif parts[1] == "bn":
                put_bn(mod + (parts[0], "bn"), leaf, arr)
            else:
                raise KeyError(f"unrecognized regnet encoder key {key!r}")
            continue
        # --- mobileone ---
        m = _MOBILEONE_RE.match(key)
        if m:
            sn, bi, sub, rest = m.groups()
            mod = ("encoder",
                   f"stage{sn}" + (f"_{bi}" if bi is not None else ""))
            if sub.startswith("rbr_conv."):
                sub = "rbr_conv_" + sub.split(".")[1]
            if sub == "rbr_skip":  # bare BN branch
                put_bn(mod + ("rbr_skip",), rest, arr)
            elif sub.startswith("se."):
                put("params", mod + ("se", sub.split(".")[1],
                                     "kernel" if rest == "weight" else rest),
                    _convert_tensor(rest, arr, "conv"))
            elif rest.startswith("conv."):
                put("params", mod + (sub, "conv", "kernel"),
                    _convert_tensor("weight", arr, "conv"))
            else:  # bn.*
                put_bn(mod + (sub, "bn"), rest.split(".", 1)[1], arr)
            continue
        # --- timm-gernet (ByobNet) ---
        m = _GERNET_RE.match(key)
        if m:
            s, i, sub, kind, leaf = m.groups()
            mod = (("encoder", f"stages_{s}_{i}", sub) if s is not None
                   else ("encoder", sub))
            if kind == "conv":
                put("params", mod + ("conv", "kernel"),
                    _convert_tensor("weight", arr, "conv"))
            else:
                put_bn(mod + ("bn",), leaf, arr)
            continue
        # --- timm-resnest deep stem ---
        m = _RESNEST_STEM_RE.match(key)
        if m:
            i, rest = m.groups()
            if i in ("0", "3", "6"):
                put("params", ("encoder", f"conv1_{i}", "kernel"),
                    _convert_tensor("weight", arr, "conv"))
            else:  # 1 / 4: stem BNs
                put_bn(("encoder", f"conv1_{i}"), rest.rsplit(".", 1)[-1], arr)
            continue
        # --- senet encoder stem (pretrainedmodels layer0: conv1..3/bn1..3) ---
        if key.startswith("encoder.layer0."):
            _, _, name, leaf = key.split(".")
            if name.startswith("conv"):
                put("params", ("encoder", f"layer0_{name}", "kernel"),
                    _convert_tensor("weight", arr, "conv"))
            else:
                put_bn(("encoder", f"layer0_{name}"), leaf, arr)
            continue
        # --- encoder stages ---
        m = _LAYER_RE.match(key)
        if m:
            stage, unit, rest = m.group(1), m.group(2), m.group(3)
            mod = ("encoder", f"layer{stage}_{unit}")
            if rest.startswith("se_module."):
                # senet SEModule: fc1/fc2 are biased 1x1 convs
                _, fc, leaf = rest.split(".")
                put("params", mod + (f"se_{fc}",
                                     "kernel" if leaf == "weight" else leaf),
                    _convert_tensor(leaf, arr, "conv"))
            elif rest.startswith("convs."):
                # res2net Bottle2neck hierarchical 3x3s (ModuleList)
                _, i2, leaf = rest.split(".")
                put("params", mod + (f"convs_{i2}", "kernel"),
                    _convert_tensor(leaf, arr, "conv"))
            elif rest.startswith("bns."):
                _, i2, leaf = rest.split(".")
                put_bn(mod + (f"bns_{i2}",), leaf, arr)
            elif rest[:5] in ("conv1", "conv2", "conv3") \
                    and rest.count(".") >= 2:
                # nested conv{n} submodules: resnest SplAtConv2d
                # (conv2.{conv,bn0,fc1,bn1,fc2}), sknet SelectiveKernel
                # (conv{n}.paths.{i}.{conv,bn}, conv{n}.attn.{fc_reduce,
                # bn,fc_select}) and ConvNormAct (conv{n}.{conv,bn})
                parts2 = rest.split(".")
                top, leaf = parts2[0], parts2[-1]
                subs: list[str] = []
                j2 = 1
                while j2 < len(parts2) - 1:
                    if parts2[j2] == "paths":
                        subs.append(f"paths_{parts2[j2 + 1]}")
                        j2 += 2
                    else:
                        subs.append(parts2[j2])
                        j2 += 1
                if subs[-1].startswith("bn"):
                    put_bn(mod + (top,) + tuple(subs), leaf, arr)
                else:
                    put("params",
                        mod + (top,) + tuple(subs)
                        + ("kernel" if leaf == "weight" else leaf,),
                        _convert_tensor(leaf, arr, "conv"))
            elif rest.startswith("conv"):
                name, leaf = rest.split(".", 1)
                put("params", mod + (name, "kernel" if leaf == "weight" else leaf),
                    _convert_tensor(leaf, arr, "conv"))
            elif rest.startswith("bn"):
                name, leaf = rest.split(".", 1)
                put_bn(mod + (name,), leaf, arr)
            elif rest.startswith("downsample.0."):
                put("params", mod + ("downsample_conv", "kernel"),
                    _convert_tensor("weight", arr, "conv"))
            elif rest.startswith("downsample.1.") and arr.ndim == 4:
                # resnest avg_down: downsample.{0 pool, 1 conv, 2 bn}
                put("params", mod + ("downsample_conv", "kernel"),
                    _convert_tensor("weight", arr, "conv"))
            elif rest.startswith("downsample.1."):
                put_bn(mod + ("downsample_bn",), rest.rsplit(".", 1)[1], arr)
            elif rest.startswith("downsample.2."):
                put_bn(mod + ("downsample_bn",), rest.rsplit(".", 1)[1], arr)
            else:
                raise KeyError(f"unrecognized encoder key {key!r}")
            continue
        # --- decoder blocks (Conv2dReLU: .0 conv / .1 bn) ---
        m = _BLOCK_RE.match(key)
        if m:
            i, convname, sub, leaf = m.groups()
            # unet blocks are indexed ('0'.. -> block0..); unet++ nodes keep
            # smp's x_{depth}_{layer} names verbatim
            mod = ("decoder", i if i.startswith("x_") else f"block{i}")
            if sub == "0":
                put("params", mod + (convname, "kernel" if leaf == "weight" else leaf),
                    _convert_tensor(leaf, arr, "conv"))
            else:
                put_bn(mod + (f"bn{convname[-1]}",), leaf, arr)
            continue
        # --- FPN decoder (smp decoders/fpn/decoder.py) ---
        m = _FPN_LATERAL_RE.match(key)
        if m:
            level, leaf = m.groups()
            mod = "p5" if level == "5" else f"p{level}_skip"
            put("params", ("decoder", mod, "kernel" if leaf == "weight" else leaf),
                _convert_tensor(leaf, arr, "conv"))
            continue
        m = _FPN_SEG_RE.match(key)
        if m:
            i, j, sub, leaf = m.groups()
            mod = ("decoder", f"seg{i}_c{j}")
            if sub == "0":  # conv
                put("params", mod + ("conv", "kernel"),
                    _convert_tensor("weight", arr, "conv"))
            else:  # GroupNorm affine
                put("params", mod + ("gn", "scale" if leaf == "weight" else "bias"),
                    arr)
            continue
        # --- LinkNet decoder (smp decoders/linknet/decoder.py) ---
        m = _LINKNET_RE.match(key)
        if m:
            i, part, sub, leaf = m.groups()
            blk = ("decoder", f"block{i}")
            if part in ("0", "2"):  # Conv2dReLU reduce/expand
                mod = blk + ("conv_in" if part == "0" else "conv_out",)
                if sub == "0":
                    put("params", mod + ("conv", "kernel"),
                        _convert_tensor("weight", arr, "conv"))
                else:
                    put_bn(mod + ("bn",), leaf, arr)
            else:  # TransposeX2: ConvTranspose2d + BN (+ ReLU)
                if sub == "0":
                    if leaf == "weight":  # (I, O, kH, kW) -> flipped (kH, kW, I, O)
                        put("params", blk + ("convt", "kernel"),
                            np.transpose(arr[:, :, ::-1, ::-1], (2, 3, 0, 1)).copy())
                    else:
                        put("params", blk + ("convt", "bias"), arr)
                else:
                    put_bn(blk + ("convt_bn",), leaf, arr)
            continue
        # --- MAnet decoder (smp decoders/manet/decoder.py) ---
        m = _MANET_CENTER_RE.match(key)
        if m:
            name, leaf = m.groups()
            put("params", ("decoder", "center", name,
                           "kernel" if leaf == "weight" else leaf),
                _convert_tensor(leaf, arr, "conv"))
            continue
        m = _MANET_HL_RE.match(key)
        if m:
            i, j, sub, leaf = m.groups()
            mod = ("decoder", f"block{i}")
            if sub == "0":  # Conv2dReLU conv
                put("params", mod + (f"hl{j}_conv", "kernel"),
                    _convert_tensor("weight", arr, "conv"))
            else:
                put_bn(mod + (f"hl{j}_bn",), leaf, arr)
            continue
        m = _MANET_SE_RE.match(key)
        if m:
            i, which, idx, leaf = m.groups()
            fc = "fc0" if idx == "1" else "fc1"  # Sequential(pool,conv,relu,conv,sigmoid)
            put("params", ("decoder", f"block{i}", f"se_{which}", fc,
                           "kernel" if leaf == "weight" else leaf),
                _convert_tensor(leaf, arr, "conv"))
            continue
        # --- PAN decoder (smp decoders/pan/decoder.py) ---
        m = _PAN_RE.match(key)
        if m:
            top, rest = m.groups()
            parts = rest.split(".")
            leaf = parts[-1]
            kind = parts[-2]  # conv | bn
            pos = ".".join(parts[:-2])  # e.g. branch1.1 / conv1 / 1 (gau conv1)
            if top == "fpa":
                sub = _PAN_FPA_SUB[pos]
            else:  # gau: conv1.1 -> conv1 (SE gate), conv2 -> conv2
                sub = "conv1" if pos.startswith("conv1") else "conv2"
            mod = ("decoder", top, sub)
            if kind == "conv":
                put("params", mod + ("conv", "kernel" if leaf == "weight" else leaf),
                    _convert_tensor(leaf, arr, "conv"))
            else:
                put_bn(mod + ("bn",), leaf, arr)
            continue
        # --- PSPNet decoder (smp decoders/pspnet/decoder.py) ---
        m = _PSP_RE.match(key)
        if m:
            i, sub, leaf = m.groups()
            mod = ("decoder", "conv" if i is None else f"psp_block{i}")
            if sub == "0":
                put("params", mod + ("conv", "kernel"),
                    _convert_tensor("weight", arr, "conv"))
            else:
                put_bn(mod + ("bn",), leaf, arr)
            continue
        # --- DeepLabV3 non-plus decoder (smp DeepLabV3Decoder Sequential) ---
        m = _DLV3_RE.match(key)
        if m and not key.startswith(("decoder.blocks.", "decoder.psp.")):
            idx, rest = m.group(1), m.group(2).split(".")
            leaf = rest[-1]
            if idx == "1":  # 3x3 conv after ASPP
                put("params", ("decoder", "out_conv", "kernel"),
                    _convert_tensor("weight", arr, "conv"))
            elif idx == "2":  # its BN
                put_bn(("decoder", "out_bn"), leaf, arr)
            elif rest[0] == "convs":
                i = int(rest[1])
                if i == 0:  # 1x1 branch: Sequential(conv, bn, relu)
                    mod = ("decoder", "aspp_conv")
                    if rest[2] == "0":
                        put("params", mod + ("conv", "kernel"),
                            _convert_tensor("weight", arr, "conv"))
                    else:
                        put_bn(mod + ("bn",), leaf, arr)
                elif i in (1, 2, 3):  # plain atrous conv branches
                    if rest[2] == "0":
                        put("params", ("decoder", f"aspp_atrous{i - 1}_conv",
                                       "kernel"),
                            _convert_tensor("weight", arr, "conv"))
                    else:
                        put_bn(("decoder", f"aspp_atrous{i - 1}_bn"), leaf, arr)
                else:  # pooling branch: Sequential(pool, conv, bn, relu)
                    if rest[2] == "1":
                        put("params", ("decoder", "aspp_pool", "conv", "kernel"),
                            _convert_tensor("weight", arr, "conv"))
                    else:
                        put_bn(("decoder", "aspp_pool", "bn"), leaf, arr)
            elif rest[0] == "project":
                mod = ("decoder", "aspp_project")
                if rest[1] == "0":
                    put("params", mod + ("conv", "kernel"),
                        _convert_tensor("weight", arr, "conv"))
                else:
                    put_bn(mod + ("bn",), leaf, arr)
            else:
                raise KeyError(f"unrecognized deeplabv3 decoder key {key!r}")
            continue
        # --- DeepLabV3+ decoder (smp decoders/deeplabv3/decoder.py) ---
        m = _DEEPLAB_RE.match(key)
        if m:
            top, rest = m.group(1), m.group(2).split(".")
            leaf = rest[-1]

            def put_convbn(mod, sub):
                # sub: ('0', leaf)=conv / ('1', leaf)=bn for _ConvBnRelu-shaped
                if sub[0] == "0":
                    put("params", mod + ("conv", "kernel"),
                        _convert_tensor("weight", arr, "conv"))
                else:
                    put_bn(mod + ("bn",), sub[1], arr)

            def put_sepbn(mod, sub):
                # SeparableConv2d is Sequential(depthwise, pointwise); module
                # layout: sep/{dw,pw} + bn
                if sub[0] == "0":  # separable conv
                    which = "dw" if sub[1] == "0" else "pw"
                    put("params", mod + ("sep", which,
                                         "kernel" if sub[2] == "weight" else sub[2]),
                        _convert_tensor(sub[2], arr, "conv"))
                else:  # bn
                    put_bn(mod + ("bn",), sub[1], arr)

            if top == "block1":
                put_convbn(("decoder", "block1"), rest)
            elif top == "block2":
                put_sepbn(("decoder", "block2"), rest)
            elif rest[0] == "0" and rest[1] == "convs":
                i = int(rest[2])
                if i == 0:  # 1x1 conv branch
                    put_convbn(("decoder", "aspp_conv"), rest[3:])
                elif i in (1, 2, 3):  # separable atrous branches
                    put_sepbn(("decoder", f"aspp_sep{i - 1}"), rest[3:])
                else:  # pooling branch: Sequential(pool, conv, bn, relu)
                    if rest[3] == "1":
                        put("params", ("decoder", "aspp_pool", "conv", "kernel"),
                            _convert_tensor("weight", arr, "conv"))
                    else:
                        put_bn(("decoder", "aspp_pool", "bn"), leaf, arr)
            elif rest[0] == "0" and rest[1] == "project":
                put_convbn(("decoder", "aspp_project"), rest[2:])
            elif rest[0] == "1":  # aspp.1 = SeparableConv2d (out block)
                which = "dw" if rest[1] == "0" else "pw"
                put("params", ("decoder", "aspp_out", "sep", which,
                               "kernel" if leaf == "weight" else leaf),
                    _convert_tensor(leaf, arr, "conv"))
            elif rest[0] == "2":  # aspp.2 = BatchNorm
                put_bn(("decoder", "aspp_out", "bn"), leaf, arr)
            else:
                raise KeyError(f"unrecognized deeplab decoder key {key!r}")
            continue
        # --- head ---
        if key.startswith("segmentation_head.0."):
            leaf = key.rsplit(".", 1)[1]
            put("params", ("segmentation_head", "conv",
                           "kernel" if leaf == "weight" else leaf),
                _convert_tensor(leaf, arr, "conv"))
            continue
        # --- metadata MLP (enc.enc_mlp.{0,3,6}) ---
        m = _MLP_RE.match(key)
        if m:
            idx, leaf = int(m.group(1)), m.group(2)
            fc = {0: "fc0", 3: "fc1", 6: "fc2"}[idx]
            put("params", ("metadata_mlp", fc, "kernel" if leaf == "weight" else leaf),
                _convert_tensor(leaf, arr, "linear"))
            continue
        if key.startswith(("criterion.", "optimizer.")) or key.endswith("num_batches_tracked"):
            continue
        raise KeyError(f"unrecognized checkpoint key {key!r}")

    return {"params": params, "batch_stats": stats}


def _tree_paths(tree, prefix=()):  # leaves as sorted path tuples
    out = []
    for k, v in tree.items():
        if isinstance(v, dict):
            out += _tree_paths(v, prefix + (k,))
        else:
            out.append(prefix + (k,))
    return out


def validate_against(variables: dict, reference: dict, strict: bool = True) -> list[str]:
    """Compare converted variables to a model-initialized tree (strict load).

    Returns a list of problems (missing/unexpected/shape-mismatch); raises when
    strict and problems exist — the analog of torch ``load_state_dict(strict=True)``
    (reference src/zone_detect/model.py:88).
    """
    problems = []
    for coll in ("params", "batch_stats"):
        got = set(_tree_paths(variables.get(coll, {})))
        want = set(_tree_paths(reference.get(coll, {})))
        for p in sorted(want - got):
            problems.append(f"missing {coll}: {'/'.join(p)}")
        for p in sorted(got - want):
            problems.append(f"unexpected {coll}: {'/'.join(p)}")
        for p in sorted(got & want):
            a = _tree_get(variables[coll], p)
            b = _tree_get(reference[coll], p)
            if tuple(np.shape(a)) != tuple(np.shape(b)):
                problems.append(
                    f"shape mismatch {coll} {'/'.join(p)}: {np.shape(a)} vs {np.shape(b)}")
    if strict and problems:
        raise ValueError("checkpoint does not match model:\n  " + "\n  ".join(problems))
    return problems


def _tree_get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def any_state_dict_to_flax(sd: Mapping[str, np.ndarray]) -> dict:
    """Dispatch a torch state dict to its family converter by key signature.

    Families: smp resnet-unet (and the other 8 smp archs, same key layout),
    SegFormer, Swin/ConvNeXt-UperNet, BEiT, Data2Vec-Vision, DPT, MobileViT,
    MobileViTV2, MobileNetV2. Ordering matters: BEiT/DPT/MobileViT also carry
    decode_head./segmentation_head. keys, so the prefix checks for their
    backbones run before the generic SegFormer/smp fallbacks
    (tests/test_converter_dispatch.py locks the routing).
    """
    if any(k.startswith("backbone.") for k in sd):
        # swin keys: backbone.encoder.layers.*; convnext: backbone.encoder.stages.*
        if any(k.startswith("backbone.encoder.stages.") for k in sd):
            from flairtpu.models.convnext_upernet import hf_convnext_upernet_torch_to_flax

            return hf_convnext_upernet_torch_to_flax(dict(sd))
        from flairtpu.models.swin_upernet import hf_upernet_torch_to_flax

        return hf_upernet_torch_to_flax(dict(sd))
    if any(k.startswith("dpt.") for k in sd):
        from flairtpu.models.dpt import hf_dpt_torch_to_flax

        return hf_dpt_torch_to_flax(dict(sd))
    if any(k.startswith("mobilenet_v2.") for k in sd):
        from flairtpu.models.mobilenet_v2 import hf_mobilenet_v2_torch_to_flax

        return hf_mobilenet_v2_torch_to_flax(dict(sd))
    if any(k.startswith("mobilevitv2.") for k in sd):
        from flairtpu.models.mobilevitv2 import hf_mobilevitv2_torch_to_flax

        return hf_mobilevitv2_torch_to_flax(dict(sd))
    if any(k.startswith("mobilevit.") for k in sd):
        from flairtpu.models.mobilevit import hf_mobilevit_torch_to_flax

        return hf_mobilevit_torch_to_flax(dict(sd))
    if any(k.startswith(("beit.", "data2vec_vision.")) for k in sd):
        # BEiT/Data2Vec-Vision checkpoints also carry decode_head.* keys, so
        # this branch must precede the SegFormer check below.
        from flairtpu.models.beit_upernet import hf_beit_torch_to_flax

        return hf_beit_torch_to_flax(dict(sd))
    if any(k.startswith(("segformer.", "decode_head.")) for k in sd):
        from flairtpu.models.segformer import hf_torch_to_flax

        return hf_torch_to_flax(dict(sd))
    return torch_to_flax(sd)


def load_checkpoint_variables(path: str | Path, reference: dict | None = None,
                              strict: bool = True) -> dict:
    """One-call load: torch file -> flax variables, optionally validated."""
    sd = normalize_keys(load_torch_state_dict(path))
    variables = any_state_dict_to_flax(sd)
    if reference is not None:
        validate_against(variables, reference, strict=strict)
    return variables


def checkpoint_num_classes(sd: Mapping[str, np.ndarray]) -> int | None:
    """Infer the class count from head/criterion tensors (flair/main.py:106-111)."""
    for key in ("segmentation_head.0.weight", "criterion.weight"):
        if key in sd:
            return int(sd[key].shape[0])
    for key in sd:
        if key.endswith("classifier.weight"):
            return int(sd[key].shape[0])
    return None
