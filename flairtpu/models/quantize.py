"""Post-training int8 quantization (w8a8) of ResNet encoders for zone inference.

TPU v5e's MXU executes int8 x int8 -> int32 at twice the bf16 rate (394 TOPS
vs 197 TFLOP/s peak), and the zone-detect forward is encoder-dominated
(~70% of the wall time at the FLAIR 512/128 geometry — PERFORMANCE.md). This
module makes that headroom reachable without touching the float checkpoint
path:

- BatchNorm is folded into each conv (inference-only algebra: scale by
  gamma/sqrt(var+eps), shift by beta - mean*gamma/sqrt(var+eps)).
- Weights are quantized per-output-channel, activations per-tensor with
  symmetric scales calibrated on tiles read from the target zone itself
  (no external calibration set needed).
- The encoder then runs with int8 convs accumulating in int32; dequant,
  bias, ReLU and the residual adds stay in fp32 (cheap VPU epilogues XLA
  fuses into the convs). The decoder/head and every stitching mode are the
  unmodified production modules fed through ``FlairSegmentationModel.decode``,
  so all archs whose encoder is a plain ResNet family member quantize.

Opt-in via the detect config key ``quantize: int8``; the reference has no
quantization at all (fp32 torch end to end), so this is a beyond-reference
serving feature. Accuracy: standard PTQ behavior — per-channel weight
scales keep logit error small, but outputs are NOT bit-identical to the
float path; tests/test_quantize.py bounds the drift and the e2e argmax
disagreement on the toy zone.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from flairtpu.data.normalize import normalize_device
from flairtpu.models.resnet import _BN_EPS, RESNET_SPECS, max_pool_3x3_s2

_DN = ("NHWC", "HWIO", "NHWC")

# encoder construction knobs per arch (mirrors FlairSegmentationModel.setup)
_ARCH_ENCODER = {"deeplabv3plus": (16, 5), "deeplabv3": (8, 5),
                 "pan": (16, 5), "pspnet": (32, 3)}


# ---------------------------------------------------------------------------
# BN folding
# ---------------------------------------------------------------------------

def fold_encoder(params: dict, batch_stats: dict) -> dict:
    """Fold BatchNorm into the conv weights of a ResNet encoder.

    Returns a flat ``{name: {"w": (k,k,ci,co) f32, "b": (co,) f32}}`` over
    conv sites named ``stem``, ``layer{s}_{u}/conv{i}`` and
    ``layer{s}_{u}/downsample``.
    """
    enc_p, enc_s = params["encoder"], batch_stats["encoder"]

    def fold(kernel, bn_p, bn_s):
        g = bn_p["scale"] / jnp.sqrt(bn_s["var"] + _BN_EPS)
        return {"w": (kernel * g).astype(jnp.float32),
                "b": (bn_p["bias"] - bn_s["mean"] * g).astype(jnp.float32)}

    out = {"stem": fold(enc_p["conv1"]["kernel"], enc_p["bn1"], enc_s["bn1"])}
    for name, blk in enc_p.items():
        if not name.startswith("layer"):
            continue
        for i in (1, 2, 3):
            if f"conv{i}" in blk:
                out[f"{name}/conv{i}"] = fold(
                    blk[f"conv{i}"]["kernel"], blk[f"bn{i}"],
                    enc_s[name][f"bn{i}"])
        if "downsample_conv" in blk:
            out[f"{name}/downsample"] = fold(
                blk["downsample_conv"]["kernel"], blk["downsample_bn"],
                enc_s[name]["downsample_bn"])
    return out


# ---------------------------------------------------------------------------
# the encoder walk (shared by the calibration and quantized passes)
# ---------------------------------------------------------------------------

def walk_features(spec: str, conv_fn, x: jax.Array, output_stride: int = 32,
                  depth: int = 5) -> list[jax.Array]:
    """Recompute ResNetEncoder.__call__'s feature pyramid with ``conv_fn``.

    ``conv_fn(name, x, stride, padding, dilation, groups)`` must apply the
    folded conv+bias at that site. Topology (stage/dilation/downsample laws)
    mirrors models/resnet.py ResNetEncoder exactly; tests lock the float
    walk against the Flax module.
    """
    kind, units, groups, base_width = RESNET_SPECS[spec]
    expansion = 1 if kind == "basic" else 4
    feats = [x]
    y = jax.nn.relu(conv_fn("stem", x, 2, 3, 1, 1))
    feats.append(y)

    y = max_pool_3x3_s2(y)
    in_ch = 64
    dilations = {32: {}, 16: {3: 2}, 8: {2: 2, 3: 4}}[output_stride]
    for stage, n_units in enumerate(units[:max(depth - 1, 0)]):
        width = 64 * (2 ** stage)
        dilation = dilations.get(stage, 1)
        stride = 1 if stage == 0 or dilation > 1 else 2
        for u in range(n_units):
            first = u == 0
            needs_ds = first and (in_ch != width * expansion or
                                  (stage != 0 and dilation == 1))
            name = f"layer{stage + 1}_{u}"
            s = stride if first else 1
            identity = y
            if kind == "basic":
                z = jax.nn.relu(conv_fn(f"{name}/conv1", y, s, dilation,
                                        dilation, 1))
                z = conv_fn(f"{name}/conv2", z, 1, dilation, dilation, 1)
            else:
                z = jax.nn.relu(conv_fn(f"{name}/conv1", y, 1, 0, 1, 1))
                z = jax.nn.relu(conv_fn(f"{name}/conv2", z, s, dilation,
                                        dilation, groups))
                z = conv_fn(f"{name}/conv3", z, 1, 0, 1, 1)
            if needs_ds:
                identity = conv_fn(f"{name}/downsample", y, s, 0, 1, 1)
            y = jax.nn.relu(z + identity)
            in_ch = width * expansion
        feats.append(y)
    return feats


def _float_conv(folded: dict, maxes: dict | None):
    """Folded-float conv site; optionally records per-site input absmax."""

    def conv_fn(name, x, stride, padding, dilation, groups):
        if maxes is not None:
            maxes[name] = jnp.max(jnp.abs(x))
        c = folded[name]
        y = jax.lax.conv_general_dilated(
            x, c["w"], (stride, stride), ((padding, padding), (padding, padding)),
            rhs_dilation=(dilation, dilation), feature_group_count=groups,
            dimension_numbers=_DN)
        return y + c["b"]

    return conv_fn


def _quant_conv(qparams: dict):
    """int8 conv site: requantize input, int8xint8->int32, dequant+bias."""

    def conv_fn(name, x, stride, padding, dilation, groups):
        c = qparams[name]
        q = jnp.clip(jnp.round(x / c["sx"]), -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            q, c["wq"], (stride, stride), ((padding, padding), (padding, padding)),
            rhs_dilation=(dilation, dilation), feature_group_count=groups,
            dimension_numbers=_DN, preferred_element_type=jnp.int32)
        return y.astype(jnp.float32) * c["deq"] + c["b"]

    return conv_fn


# ---------------------------------------------------------------------------
# calibration + weight quantization
# ---------------------------------------------------------------------------

def calibrate(spec: str, folded: dict, batches_u8, norm: dict,
              output_stride: int = 32, depth: int = 5) -> dict:
    """Per-conv-site input absmax over calibration batches (uint8 tiles).

    One jitted pass per batch; the running max stays on device and is
    fetched ONCE at the end (tunnel corollary in CLAUDE.md: never a D2H per
    iteration).
    """

    @jax.jit
    def run(img_u8):
        x = normalize_device(img_u8, src_dtype=np.uint8, **norm)
        maxes: dict = {}
        walk_features(spec, _float_conv(folded, maxes), x, output_stride, depth)
        return maxes

    agg = None
    for b in batches_u8:
        m = run(jnp.asarray(b))
        agg = m if agg is None else {k: jnp.maximum(agg[k], m[k]) for k in m}
    names = sorted(agg)
    vals = np.asarray(jnp.stack([agg[n] for n in names]))  # single fetch
    return {n: float(v) for n, v in zip(names, vals)}


def quantize_folded(folded: dict, act_max: dict) -> dict:
    """Symmetric per-output-channel weights + per-tensor activation scales."""
    qp = {}
    for name, c in folded.items():
        sw = jnp.maximum(jnp.max(jnp.abs(c["w"]), axis=(0, 1, 2)), 1e-12) / 127.0
        wq = jnp.clip(jnp.round(c["w"] / sw), -127, 127).astype(jnp.int8)
        sx = max(float(act_max[name]), 1e-12) / 127.0
        qp[name] = {"wq": wq, "sx": jnp.float32(sx),
                    "deq": (sw * sx).astype(jnp.float32), "b": c["b"]}
    return qp


# ---------------------------------------------------------------------------
# the drop-in model wrapper
# ---------------------------------------------------------------------------

class QuantizedZoneModel:
    """Duck-types the model interface the zone engines use (.apply/.arch):
    int8 encoder walk outside Flax, then the unmodified decoder/head via
    ``FlairSegmentationModel.decode``. Inference only."""

    def __init__(self, model, qparams: dict, output_stride: int, depth: int):
        self._model = model
        self.qparams = qparams
        self._os = output_stride
        self._depth = depth

    def __getattr__(self, name):  # arch, encoder_name, dtype, ...
        return getattr(self._model, name)

    def apply(self, variables, x, mtd=None, train: bool = False,
              inner_margin: int | None = None):
        if train:
            raise ValueError("QuantizedZoneModel is inference-only")
        if mtd is not None:
            raise ValueError("metadata fusion is not supported with quantize")
        feats = walk_features(self._model.encoder_name, _quant_conv(self.qparams),
                              x, self._os, self._depth)
        return self._model.apply(variables, feats, train=False,
                                 inner_margin=inner_margin, method="decode")


def quantize_model(config: dict, model, params, batch_stats,
                   calib_batches) -> QuantizedZoneModel:
    """Fold + calibrate + quantize ``model``'s encoder for zone inference.

    ``calib_batches``: iterable of (B, S, S, C) uint8 arrays, normalized
    on device with the config's ``norma_task`` exactly like production.
    """
    if model.encoder_name not in RESNET_SPECS:
        raise ValueError(
            f"quantize: int8 supports the ResNet encoder families "
            f"({', '.join(sorted(RESNET_SPECS))}); got {model.encoder_name!r}")
    if getattr(model, "use_metadata", False):
        raise ValueError("quantize: int8 does not support use_metadata")
    output_stride, depth = _ARCH_ENCODER.get(model.arch, (32, 5))
    norma = config["norma_task"][0]
    norm = dict(norm_type=norma["norm_type"],
                means=tuple(norma.get("norm_means") or ()),
                stds=tuple(norma.get("norm_stds") or ()))
    folded = fold_encoder(params, batch_stats)
    act_max = calibrate(model.encoder_name, folded, calib_batches, norm,
                        output_stride, depth)
    qparams = quantize_folded(folded, act_max)
    return QuantizedZoneModel(model, qparams, output_stride, depth)


def read_calibration_batches(config: dict, n_tiles: int = 16,
                             batch: int = 4) -> list[np.ndarray]:
    """Read up to ``n_tiles`` tiles evenly spread over the zone's grid."""
    from flairtpu.io import TiffReader
    from flairtpu.io.tiff import Window
    from flairtpu.zone.grid import get_stride, slice_grid

    size, margin = int(config["img_pixels_detection"]), int(config["margin"])
    stride = get_stride(config)[0]
    out = []
    with TiffReader(config["input_img_path"], cache_blocks=64) as r:
        grid = slice_grid(r.width, r.height, size, margin, stride,
                          r.transform, r.crs)
        tiles = grid.tiles
        idx = np.unique(np.linspace(0, len(tiles) - 1,
                                    min(n_tiles, len(tiles))).astype(int))
        sel = [tiles[i] for i in idx]
        for i in range(0, len(sel), batch):
            imgs = [np.moveaxis(
                r.read(config["channels"],
                       window=Window(t.col0, t.row0, size, size),
                       boundless=True), 0, -1) for t in sel[i:i + batch]]
            out.append(np.stack(imgs).astype(np.uint8))
    return out
