"""int8 PTQ for the MiT / SegFormer attention family (builder ROADMAP r5 #2).

Extends ``quantize: int8`` beyond the ResNet conv encoders to smp's
``mit_b0..b5`` Mix-Vision-Transformer encoders (reference accepts
``mit_b*_<arch>`` through its smp factory, src/flair/model.py:35-41): the
weight matmuls — query/key/value/out projections, the MixFFN dense1/dense2
(the FLOPs bulk), and the strided patch-embed / spatial-reduction convs —
run w8a8 (per-output-channel weights, zone-calibrated per-tensor
activations, int32 accumulation). LayerNorm, softmax, GELU and the
depthwise 3x3 stay float, and the attention's activation x activation
einsums (q.k / attn.v) stay bf16: quantizing those needs dynamic
per-batch scales whose rescale traffic is exactly the HBM-bound epilogue
loss the decoder depth sweep measured (PERFORMANCE.md round 4).

The walk reproduces :class:`flairtpu.models.mit.MiTSmpEncoder` /
``segformer.MiTEncoder`` outside Flax with pluggable dense/conv sites,
float parity is test-locked (tests/test_quantize_mit.py), and the zone
integration reuses ``QuantizedZoneModel`` via its ``feats_fn`` hook.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from flairtpu.models.segformer import _LN_EPS, SEGFORMER_SPECS

_DN = ("NHWC", "HWIO", "NHWC")


def _ln(x, p, dtype):
    """flax LayerNorm semantics (fast variance, f32 stats)."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = jnp.maximum((xf * xf).mean(-1, keepdims=True) - mu * mu, 0.0)
    y = (xf - mu) * jax.lax.rsqrt(var + _LN_EPS)
    return (y * p["scale"] + p["bias"]).astype(dtype)


def walk_mit_features(name_spec: str, dense_fn, conv_fn, enc_params: dict,
                      x: jax.Array, depth: int = 5, dtype=jnp.float32):
    """Recompute MiTSmpEncoder.__call__'s 6-feature pyramid.

    ``dense_fn(site, x2d, p)`` applies a (possibly quantized) Dense;
    ``conv_fn(site, x, p, stride, padding, groups)`` a (possibly
    quantized) Conv. Topology mirrors models/mit.py + models/segformer.py
    exactly; the float walk is parity-locked against the Flax module.
    """
    cfg = SEGFORMER_SPECS[name_spec[len("mit_"):]]
    B, H, W, _ = x.shape
    x = x.astype(dtype)
    feats = [x, jnp.zeros((B, H // 2, W // 2, 0), x.dtype)]
    y = x

    def attn(site, p, xn, heads, sr):
        Bh, Hh, Wh, C = xn.shape
        hd = C // heads
        q = dense_fn(f"{site}/query", xn, p["query"])
        q = q.reshape(Bh, Hh * Wh, heads, hd)
        kv_in = xn
        if sr > 1:
            kv_in = conv_fn(f"{site}/sr", xn, p["sr"], sr, 0, 1)
            kv_in = _ln(kv_in, p["sr_norm"], dtype)
        n2 = kv_in.shape[1] * kv_in.shape[2]
        k = dense_fn(f"{site}/key", kv_in, p["key"]).reshape(
            Bh, n2, heads, hd)
        v = dense_fn(f"{site}/value", kv_in, p["value"]).reshape(
            Bh, n2, heads, hd)
        a = jnp.einsum("bnhd,bmhd->bhnm", q, k) / jnp.sqrt(hd).astype(q.dtype)
        a = jax.nn.softmax(a.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", a, v).reshape(Bh, Hh, Wh, C)
        return dense_fn(f"{site}/out", out, p["out"])

    def ffn(site, p, xn):
        h = dense_fn(f"{site}/dense1", xn, p["dense1"])
        dim4 = h.shape[-1]
        h = conv_fn(f"{site}/dwconv", h, p["dwconv"], 1, 1, dim4)
        h = jax.nn.gelu(h, approximate=False)
        return dense_fn(f"{site}/dense2", h, p["dense2"])

    for i, (dim, depth_i, heads, sr) in enumerate(
            zip(cfg["dims"], cfg["depths"], cfg["heads"], cfg["srs"])):
        if i >= depth - 1:
            break
        ep = enc_params[f"embed{i}"]
        k = 7 if i == 0 else 3
        y = conv_fn(f"embed{i}/proj", y, ep["proj"], 4 if i == 0 else 2,
                    k // 2, 1)
        y = _ln(y, ep["norm"], dtype)
        for j in range(depth_i):
            bp = enc_params[f"block{i}_{j}"]
            site = f"block{i}_{j}"
            y = y + attn(f"{site}/attn", bp["attn"],
                         _ln(y, bp["norm1"], dtype), heads, sr)
            y = y + ffn(f"{site}/mlp", bp["mlp"], _ln(y, bp["norm2"], dtype))
        y = _ln(y, enc_params[f"norm{i}"], dtype)
        feats.append(y)
    return feats


# ---------------------------------------------------------------------------
# float sites (calibration) and quantized sites
# ---------------------------------------------------------------------------

def float_sites(maxes: dict | None, dtype):
    def dense_fn(site, x, p):
        if maxes is not None:
            maxes[site] = jnp.max(jnp.abs(x))
        w = p["kernel"].astype(dtype)
        return (jnp.einsum("...i,io->...o", x.astype(dtype), w)
                + p["bias"].astype(dtype))

    def conv_fn(site, x, p, stride, padding, groups):
        if maxes is not None and groups == 1:
            maxes[site] = jnp.max(jnp.abs(x))
        w = p["kernel"].astype(dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), w, (stride, stride),
            ((padding, padding), (padding, padding)),
            feature_group_count=groups, dimension_numbers=_DN)
        return y + p["bias"].astype(dtype)

    return dense_fn, conv_fn


def quant_sites(qparams: dict, dtype):
    """int8 where a site was quantized; float (dtype) otherwise."""
    f_dense, f_conv = float_sites(None, dtype)

    def dense_fn(site, x, p):
        c = qparams.get(site)
        if c is None:
            return f_dense(site, x, p)
        q = jnp.clip(jnp.round(x / c["sx"]), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(
            q, c["wq"], dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * c["deq"] + c["b"]).astype(dtype)

    def conv_fn(site, x, p, stride, padding, groups):
        c = qparams.get(site)
        if c is None:
            return f_conv(site, x, p, stride, padding, groups)
        q = jnp.clip(jnp.round(x / c["sx"]), -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            q, c["wq"], (stride, stride),
            ((padding, padding), (padding, padding)),
            feature_group_count=groups, dimension_numbers=_DN,
            preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * c["deq"] + c["b"]).astype(dtype)

    return dense_fn, conv_fn


def quantize_mit_sites(enc_params: dict, act_max: dict) -> dict:
    """Per-output-channel weight + calibrated activation scales for every
    calibrated site (dense kernels (Ci, Co); conv kernels (kh, kw, Ci, Co))."""
    qp = {}
    for site, amax in act_max.items():
        p = enc_params
        for part in site.split("/"):
            p = p[part]
        w = np.asarray(p["kernel"], np.float32)
        axes = tuple(range(w.ndim - 1))
        sw = np.maximum(np.abs(w).max(axis=axes), 1e-12) / 127.0
        wq = np.clip(np.round(w / sw), -127, 127).astype(np.int8)
        sx = max(float(amax), 1e-12) / 127.0
        qp[site] = {"wq": jnp.asarray(wq), "sx": jnp.float32(sx),
                    "deq": jnp.asarray((sw * sx).astype(np.float32)),
                    "b": jnp.asarray(np.asarray(p["bias"], np.float32))}
    return qp
