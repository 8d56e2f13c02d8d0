"""Float BN-fold for zone inference (``bn_fold: true`` — perf config).

The production float zone forward keeps BatchNorm inference arithmetic in
fp32 for torch parity, which makes XLA materialize fp32 BN epilogues and
fp32 intermediate features (the stem alone writes a f32[B,256,256,64] map
— see the trace in benchmarks/trace_zone_forward.py). At inference BN is a
per-channel affine, so it folds into the convs exactly like the int8 path's
prep (models/quantize.py fold_encoder / fold_unet_decoder) — but keeping
FLOAT weights in the model's compute dtype. The whole walk then runs as
pure bf16 conv+bias(+relu) chains with no BN epilogues or f32 round trips.

Measured on the chip (benchmarks/bn_fold_float.py, batch 128, 512/128
inner decode): 2625.7 vs 2051.1 patches/s (+28%) with 0.9885 argmax
agreement on random weights — it also beats int8 dec=2 (2286.9), whose
float sites run fp32. PERFORMANCE.md round 5 records the run.

Like ``quantize: int8`` this is opt-in and NOT bit-parity: outputs drift
at bf16 rounding scale (drift bounds in tests/test_fold.py). Composition
with ``quantize: int8`` is supported: quantize_model(..., float_dtype=...)
casts the int8 path's folded-float sites to the compute dtype.

The reference has no analog (fp32 torch end to end) — beyond-reference
serving feature, same category as int8 PTQ.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from flairtpu.models.quantize import (_ARCH_ENCODER, _DN, RESNET_SPECS,
                                      _float_conv, fold_encoder,
                                      fold_unet_decoder, walk_features,
                                      walk_unet_decode)


def _cast_sites(folded: dict, dtype) -> dict:
    return {k: {"w": v["w"].astype(dtype), "b": v["b"].astype(dtype)}
            for k, v in folded.items()}


class FoldedZoneModel:
    """BN-folded float zone inference (.apply/.arch duck type, like
    QuantizedZoneModel). unet runs the fully folded encoder+decoder walk
    (full and inner-margin); other archs run the folded encoder and the
    unmodified float decoder/head via ``FlairSegmentationModel.decode``.
    Inference only."""

    def __init__(self, model, enc_folded: dict, dec_folded: dict | None,
                 dtype):
        self._model = model
        self.enc_folded = enc_folded
        self.dec_folded = dec_folded
        self._dtype = dtype
        self._os, self._depth = _ARCH_ENCODER.get(model.arch, (32, 5))

    def __getattr__(self, name):  # arch, encoder_name, dtype, ...
        return getattr(self._model, name)

    def apply(self, variables, x, mtd=None, train: bool = False,
              inner_margin: int | None = None):
        if train:
            raise ValueError("FoldedZoneModel is inference-only")
        if mtd is not None:
            raise ValueError("metadata fusion is not supported with bn_fold")
        feats = walk_features(self._model.encoder_name,
                              _float_conv(self.enc_folded, None),
                              x.astype(self._dtype), self._os, self._depth)
        if self.dec_folded is None:
            return self._model.apply(variables, feats, train=False,
                                     inner_margin=inner_margin, method="decode")
        y, off = walk_unet_decode(_float_conv(self.dec_folded, None), feats,
                                  inner_margin)
        head = variables["params"]["segmentation_head"]["conv"]
        logits = jax.lax.conv_general_dilated(
            y, head["kernel"].astype(self._dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=_DN) + head["bias"].astype(self._dtype)
        if inner_margin is not None:
            m, S = inner_margin, x.shape[1]
            logits = logits[:, m - off : S - m - off, m - off : S - m - off, :]
        return logits.astype(jnp.float32)


def fold_model(model, params, batch_stats) -> FoldedZoneModel:
    """Fold BN into float conv weights in the model's compute dtype."""
    if model.encoder_name not in RESNET_SPECS:
        raise ValueError(
            f"bn_fold: supports the ResNet encoder families "
            f"({', '.join(sorted(RESNET_SPECS))}); got {model.encoder_name!r}")
    if getattr(model, "use_metadata", False):
        raise ValueError("bn_fold: use_metadata is not supported")
    dtype = getattr(model, "dtype", jnp.float32)
    enc = _cast_sites(fold_encoder(params, batch_stats), dtype)
    dec = (_cast_sites(fold_unet_decoder(params, batch_stats), dtype)
           if model.arch == "unet" else None)
    return FoldedZoneModel(model, enc, dec, dtype)
