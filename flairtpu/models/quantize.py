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
  fuses into the convs — between consecutive convs the whole
  dequant->relu->requant chain fuses into the producing conv's epilogue, so
  only int8 activations round-trip HBM).
- For arch 'unet' (the flagship) the DEEP decoder blocks quantize the same
  way (BN-folded, per-channel weights, calibrated activations) via a walk
  that reproduces the Flax decoder including the inner-margin interval
  plan. The ``int8_decoder`` knob (bool or block count 0..5, default 2 from
  the on-chip sweep in PERFORMANCE.md) bounds the quantized region: shallow
  blocks run at 128-512px with 16-64 channels where requantize epilogues
  are an HBM-bound net loss, so they stay folded-float; the segmentation
  head always stays float. Other archs keep their unmodified float
  decoder/head through ``FlairSegmentationModel.decode``, so all archs
  whose encoder is a plain ResNet family member still quantize their
  encoder.

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

def _fold_bn(kernel, bn_p, bn_s) -> dict:
    g = bn_p["scale"] / jnp.sqrt(bn_s["var"] + _BN_EPS)
    return {"w": (kernel * g).astype(jnp.float32),
            "b": (bn_p["bias"] - bn_s["mean"] * g).astype(jnp.float32)}


def fold_encoder(params: dict, batch_stats: dict) -> dict:
    """Fold BatchNorm into the conv weights of a ResNet encoder.

    Returns a flat ``{name: {"w": (k,k,ci,co) f32, "b": (co,) f32}}`` over
    conv sites named ``stem``, ``layer{s}_{u}/conv{i}`` and
    ``layer{s}_{u}/downsample``.
    """
    enc_p, enc_s = params["encoder"], batch_stats["encoder"]
    fold = _fold_bn

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


def fold_unet_decoder(params: dict, batch_stats: dict) -> dict:
    """Fold BN into the unet DecoderBlock convs (models/unet.py:48).

    Flat ``{"block{i}/conv{1,2}": {"w", "b"}}``; the segmentation head has no
    BN and stays float (it is ~0.1% of decoder FLOPs and argmax-precision
    critical).
    """
    dec_p, dec_s = params["decoder"], batch_stats["decoder"]
    out = {}
    for name, blk in dec_p.items():
        if not name.startswith("block"):
            continue
        for i in (1, 2):
            out[f"{name}/conv{i}"] = _fold_bn(
                blk[f"conv{i}"]["kernel"], blk[f"bn{i}"], dec_s[name][f"bn{i}"])
    return out


def walk_unet_decode(conv_fn, feats: list, inner_margin: int | None,
                     n_blocks: int = 5):
    """Recompute UnetDecoder.__call__ (models/unet.py:128) with ``conv_fn``.

    ``conv_fn(name, x)`` applies the block's folded 3x3/s1/SAME conv+bias.
    Both the full decode and the inner-margin interval plan
    (models/unet.plan_inner_crops) are reproduced exactly; returns
    ``(x, offset)`` like the Flax inner path (offset 0 for full decode).
    Float parity with the Flax decoder is test-locked (tests/test_quantize.py).
    """
    from flairtpu.models.unet import plan_inner_crops, upsample2x_nearest

    def block(name, x, skip):
        if skip is not None:
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        x = jax.nn.relu(conv_fn(f"{name}/conv1", x))
        return jax.nn.relu(conv_fn(f"{name}/conv2", x))

    feats_r = feats[1:][::-1]
    x, skips = feats_r[0], feats_r[1:]
    if inner_margin is None:
        for i in range(n_blocks):
            x = upsample2x_nearest(x)
            x = block(f"block{i}", x, skips[i] if i < len(skips) else None)
        return x, 0

    size = feats[0].shape[1]
    plans = plan_inner_crops(size, inner_margin, n_blocks)
    p0 = plans[0]["pre"]
    x = x[:, p0[0]:p0[1], p0[0]:p0[1], :]
    off = p0[0]
    for i in range(n_blocks):
        lo, hi = plans[i]["post"]
        x = upsample2x_nearest(x)
        x = x[:, lo - 2 * off : hi - 2 * off, lo - 2 * off : hi - 2 * off, :]
        skip = skips[i][:, lo:hi, lo:hi, :] if i < len(skips) else None
        x = block(f"block{i}", x, skip)
        off = lo
    return x, off


def _float_conv(folded: dict, maxes: dict | None):
    """Folded-float conv site; optionally records per-site input absmax."""

    def conv_fn(name, x, stride=1, padding=1, dilation=1, groups=1):
        if maxes is not None:
            maxes[name] = jnp.max(jnp.abs(x))
        c = folded[name]
        # sites may hold bf16 weights (bn_fold); match the input to them
        y = jax.lax.conv_general_dilated(
            x.astype(c["w"].dtype), c["w"], (stride, stride),
            ((padding, padding), (padding, padding)),
            rhs_dilation=(dilation, dilation), feature_group_count=groups,
            dimension_numbers=_DN)
        return y + c["b"]

    return conv_fn


def _quant_conv(qparams: dict):
    """int8 conv site: requantize input, int8xint8->int32, dequant+bias."""

    def conv_fn(name, x, stride=1, padding=1, dilation=1, groups=1):
        c = qparams[name]
        q = jnp.clip(jnp.round(x / c["sx"]), -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            q, c["wq"], (stride, stride), ((padding, padding), (padding, padding)),
            rhs_dilation=(dilation, dilation), feature_group_count=groups,
            dimension_numbers=_DN, preferred_element_type=jnp.int32)
        return y.astype(jnp.float32) * c["deq"] + c["b"]

    return conv_fn


def _mixed_conv(qparams: dict, folded: dict):
    """Per-site dispatch: int8 for sites in ``qparams``, folded-float else.

    Used for the partially-quantized decoder: the deep blocks (low spatial
    resolution, high channel count) earn their int8 MXU discount, while the
    shallow blocks' requantize epilogues are HBM-bound losses at 16-32
    channels and stay folded-float (measured: PERFORMANCE.md int8 decoder
    sweep)."""
    qc, fc = _quant_conv(qparams), _float_conv(folded, None)

    def conv_fn(name, x, stride=1, padding=1, dilation=1, groups=1):
        fn = qc if name in qparams else fc
        return fn(name, x, stride, padding, dilation, groups)

    return conv_fn


# ---------------------------------------------------------------------------
# calibration + weight quantization
# ---------------------------------------------------------------------------

def calibrate(spec: str, folded: dict, batches_u8, norm: dict,
              output_stride: int = 32, depth: int = 5,
              folded_dec: dict | None = None) -> dict:
    """Per-conv-site input absmax over calibration batches (uint8 tiles).

    One jitted pass per batch; the running max stays on device and is
    fetched ONCE at the end (tunnel corollary in CLAUDE.md: never a D2H per
    iteration). With ``folded_dec``, the float unet decoder runs on the
    float encoder features and its sites calibrate too (keys ``dec/<site>``);
    full decode is used — its activation ranges are a superset of any
    inner-margin interior.
    """

    @jax.jit
    def run(img_u8):
        x = normalize_device(img_u8, src_dtype=np.uint8, **norm)
        maxes: dict = {}
        feats = walk_features(spec, _float_conv(folded, maxes), x,
                              output_stride, depth)
        if folded_dec is not None:
            dec_maxes: dict = {}
            walk_unet_decode(_float_conv(folded_dec, dec_maxes), feats, None)
            maxes.update({f"dec/{k}": v for k, v in dec_maxes.items()})
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
    int8 encoder walk outside Flax, then either the int8 unet decoder walk
    (``dec_qparams`` set; head stays float) or the unmodified float
    decoder/head via ``FlairSegmentationModel.decode``. Inference only."""

    def __init__(self, model, qparams: dict, output_stride: int, depth: int,
                 dec_qparams: dict | None = None,
                 dec_folded: dict | None = None, head_dtype=jnp.float32,
                 feats_fn=None):
        self._model = model
        self.qparams = qparams
        self.dec_qparams = dec_qparams
        self.dec_folded = dec_folded or {}
        self._os = output_stride
        self._depth = depth
        self._head_dtype = head_dtype
        # encoder walk override (the MiT family — models/quantize_mit.py);
        # None = the ResNet walk below
        self._feats_fn = feats_fn

    def __getattr__(self, name):  # arch, encoder_name, dtype, ...
        return getattr(self._model, name)

    def apply(self, variables, x, mtd=None, train: bool = False,
              inner_margin: int | None = None):
        if train:
            raise ValueError("QuantizedZoneModel is inference-only")
        if mtd is not None:
            raise ValueError("metadata fusion is not supported with quantize")
        if self._feats_fn is not None:
            feats = self._feats_fn(x)
        else:
            feats = walk_features(self._model.encoder_name,
                                  _quant_conv(self.qparams),
                                  x, self._os, self._depth)
        if self.dec_qparams is None:
            return self._model.apply(variables, feats, train=False,
                                     inner_margin=inner_margin, method="decode")
        y, off = walk_unet_decode(
            _mixed_conv(self.dec_qparams, self.dec_folded), feats, inner_margin)
        head = variables["params"]["segmentation_head"]["conv"]
        logits = jax.lax.conv_general_dilated(
            y.astype(self._head_dtype),
            head["kernel"].astype(self._head_dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=_DN) + head["bias"].astype(self._head_dtype)
        if inner_margin is not None:
            m, S = inner_margin, x.shape[1]
            logits = logits[:, m - off : S - m - off, m - off : S - m - off, :]
        return logits.astype(jnp.float32)


# How many unet decoder blocks go int8 by default (block0..block{N-1}, the
# deep/low-resolution end). Set from the on-chip sweep (PERFORMANCE.md "int8
# decoder depth sweep"): 2 measured best (+31.7% over float at batch 128,
# beating encoder-only's +29%); blocks 2-4 run at 128-512px with 16-64
# channels where the requantize epilogue is an HBM-bound net loss (dec=5
# measured barely above float).
DEFAULT_DECODER_BLOCKS = 2


def decoder_quant_blocks(config: dict) -> int:
    """Resolve the ``int8_decoder`` knob to a block count 0..5."""
    raw = config.get("int8_decoder", True)
    if raw is True:
        return DEFAULT_DECODER_BLOCKS
    if raw is False or raw is None:
        return 0
    n = int(raw)
    if not 0 <= n <= 5:
        raise ValueError(f"int8_decoder: expected a bool or 0..5, got {raw!r}")
    return n


def quantize_model(config: dict, model, params, batch_stats,
                   calib_batches, float_dtype=None) -> QuantizedZoneModel:
    """Fold + calibrate + quantize ``model``'s encoder for zone inference.

    ``calib_batches``: iterable of (B, S, S, C) uint8 arrays, normalized
    on device with the config's ``norma_task`` exactly like production.
    ``float_dtype`` (the ``bn_fold`` composition): run the folded-FLOAT
    sites — the shallow decoder blocks and the head — in this dtype
    instead of fp32 (bf16 on TPU removes their f32 epilogue round trips).
    """
    if model.encoder_name not in RESNET_SPECS:
        if model.encoder_name.startswith("mit_"):
            return _quantize_mit_model(config, model, params, batch_stats,
                                       calib_batches, float_dtype)
        raise ValueError(
            f"quantize: int8 supports the ResNet encoder families "
            f"({', '.join(sorted(RESNET_SPECS))}) and mit_b0..b5; "
            f"got {model.encoder_name!r}")
    if getattr(model, "use_metadata", False):
        raise ValueError("quantize: int8 does not support use_metadata")
    output_stride, depth = _ARCH_ENCODER.get(model.arch, (32, 5))
    norma = config["norma_task"][0]
    norm = dict(norm_type=norma["norm_type"],
                means=tuple(norma.get("norm_means") or ()),
                stds=tuple(norma.get("norm_stds") or ()))
    folded = fold_encoder(params, batch_stats)
    # unet also quantizes its DEEP decoder blocks (VERDICT r3 #3). The
    # `int8_decoder` knob is a bool or a block count 0..5: block0..block{N-1}
    # (the low-resolution, high-channel ones) go int8, the rest stay
    # folded-float, the head always stays float. The default comes from the
    # on-chip sweep in PERFORMANCE.md: shallow blocks (16-32 channels at
    # 128-256px) LOSE throughput to HBM-bound requantize epilogues.
    n_q = decoder_quant_blocks(config) if model.arch == "unet" else 0
    folded_dec = fold_unet_decoder(params, batch_stats) if n_q else None
    act_max = calibrate(model.encoder_name, folded, calib_batches, norm,
                        output_stride, depth, folded_dec=folded_dec)
    qparams = quantize_folded(folded, {k: act_max[k] for k in folded})
    dec_q = dec_f = None
    if n_q:
        q_sites = {k: v for k, v in folded_dec.items() if int(k[5]) < n_q}
        dec_q = quantize_folded(
            q_sites, {k: act_max[f"dec/{k}"] for k in q_sites})
        dec_f = {k: v for k, v in folded_dec.items() if k not in q_sites}
        if float_dtype is not None:
            dec_f = {k: {"w": v["w"].astype(float_dtype),
                         "b": v["b"].astype(float_dtype)}
                     for k, v in dec_f.items()}
    return QuantizedZoneModel(model, qparams, output_stride, depth, dec_q,
                              dec_f,
                              head_dtype=float_dtype or jnp.float32)


def _quantize_mit_model(config, model, params, batch_stats, calib_batches,
                        float_dtype=None) -> QuantizedZoneModel:
    """int8 for the MiT attention family (models/quantize_mit.py): dense
    qkv/proj/mlp + strided embed/sr convs w8a8; LN/softmax/GELU/dwconv and
    the activation x activation einsums stay float. The unet decoder's
    deep blocks quantize exactly like the ResNet path."""
    from flairtpu.models.quantize_mit import (float_sites, quant_sites,
                                              quantize_mit_sites,
                                              walk_mit_features)

    if getattr(model, "use_metadata", False):
        raise ValueError("quantize: int8 does not support use_metadata")
    norma = config["norma_task"][0]
    norm = dict(norm_type=norma["norm_type"],
                means=tuple(norma.get("norm_means") or ()),
                stds=tuple(norma.get("norm_stds") or ()))
    enc = params["encoder"]
    n_q = decoder_quant_blocks(config) if model.arch == "unet" else 0
    folded_dec = fold_unet_decoder(params, batch_stats) if n_q else None

    @jax.jit
    def run(img_u8):
        x = normalize_device(img_u8, src_dtype=np.uint8, **norm)
        maxes: dict = {}
        dense_fn, conv_fn = float_sites(maxes, jnp.float32)
        feats = walk_mit_features(model.encoder_name, dense_fn, conv_fn,
                                  enc, x, dtype=jnp.float32)
        if folded_dec is not None:
            dec_maxes: dict = {}
            walk_unet_decode(_float_conv(folded_dec, dec_maxes), feats, None)
            maxes.update({f"dec/{k}": v for k, v in dec_maxes.items()})
        return maxes

    agg = None
    for b in calib_batches:
        m = run(jnp.asarray(b))
        agg = m if agg is None else {k: jnp.maximum(agg[k], m[k]) for k in m}
    names = sorted(agg)
    vals = np.asarray(jnp.stack([agg[n] for n in names]))  # single fetch
    act_max = {n: float(v) for n, v in zip(names, vals)}

    qparams = quantize_mit_sites(
        enc, {k: v for k, v in act_max.items() if not k.startswith("dec/")})
    dec_q = dec_f = None
    if n_q:
        q_sites = {k: v for k, v in folded_dec.items() if int(k[5]) < n_q}
        dec_q = quantize_folded(
            q_sites, {k: act_max[f"dec/{k}"] for k in q_sites})
        dec_f = {k: v for k, v in folded_dec.items() if k not in q_sites}
        if float_dtype is not None:
            dec_f = {k: {"w": v["w"].astype(float_dtype),
                         "b": v["b"].astype(float_dtype)}
                     for k, v in dec_f.items()}
    wdtype = float_dtype or jnp.float32
    dense_fn, conv_fn = quant_sites(qparams, wdtype)

    def feats_fn(x):
        return walk_mit_features(model.encoder_name, dense_fn, conv_fn,
                                 enc, x, dtype=wdtype)

    return QuantizedZoneModel(model, qparams, 32, 5, dec_q, dec_f,
                              head_dtype=float_dtype or jnp.float32,
                              feats_fn=feats_fn)


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
