"""AOT model export for production serving (jax.export / StableHLO).

The reference deploys by shipping a torch checkpoint and re-running the
Python model code at the destination. The TPU-native serving story is
ahead-of-time compilation: export the jitted forward (uint8 NHWC patches in,
payload out) as a serialized StableHLO artifact that any JAX runtime of a
compatible version can deserialize and call — no model code, no weights
file, no Python class definitions at the serving site.

Payloads:
- ``logits``  — fp32 (B, S, S, K) class logits
- ``argmax``  — (uint8 class plane, uint8 confidence 0..255), the
  flair-detect per-tile payload (fused softmax/argmax, margin optional)

Weights are baked into the artifact as constants (donated to the runtime's
constant pool). Export is lowered for the requested platforms — e.g. export
on a CPU dev box with ``platforms=("tpu", "cpu")`` and serve on TPU.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from flairtpu.data.normalize import normalize_device
from flairtpu.models.factory import create_model, init_model


def _load_variables(model, weights: str | Path | None, n_channels: int,
                    size: int):
    params, stats = init_model(model, (1, size, size, n_channels))
    if weights is None:
        return params, stats
    weights = str(weights)
    if weights.endswith(".msgpack"):
        from flairtpu.train.checkpoints import load_weights_msgpack

        variables = load_weights_msgpack(weights)
    else:
        from flairtpu.models.convert import load_checkpoint_variables

        variables = load_checkpoint_variables(
            weights, {"params": params, "batch_stats": stats})
    return variables["params"], variables.get("batch_stats", {})


def build_forward(config: dict, weights: str | Path | None = None,
                  payload: str = "logits", margin: int = 0, dtype=None):
    """Return (fn, example_input) for the serving forward.

    fn: uint8 (B, S, S, C) -> payload. Normalization (the config's
    norma_task / norm_type) runs inside the function, so the serving input
    is the raw raster window.
    """
    if dtype is None:
        dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model = create_model(config, dtype=dtype)
    size = int(config.get("img_pixels_detection") or 512)
    n_ch = len(config["channels"])
    params, stats = _load_variables(model, weights, n_ch, size)
    norma = (config.get("norma_task") or [{}])[0]
    norm = dict(norm_type=norma.get("norm_type", config.get("norm_type", "scaling")),
                means=tuple(norma.get("norm_means", config.get("norm_means")) or ()),
                stds=tuple(norma.get("norm_stds", config.get("norm_stds")) or ()))

    def forward(img_u8):
        x = normalize_device(img_u8, src_dtype=np.uint8, **norm)
        logits = model.apply({"params": params, "batch_stats": stats}, x,
                             train=False)
        if margin:
            m = margin
            logits = logits[:, m:-m, m:-m, :]
        if payload == "logits":
            return logits
        from flairtpu.ops.fused import softmax_argmax_ref

        arg, prob = softmax_argmax_ref(logits)
        return arg.astype(jnp.uint8), jnp.round(prob * 255).astype(jnp.uint8)

    batch = int(config.get("batch_size", 8))
    example = jax.ShapeDtypeStruct((batch, size, size, n_ch), jnp.uint8)
    return forward, example


def export_model(config: dict, out_path: str | Path,
                 weights: str | Path | None = None, payload: str = "logits",
                 margin: int = 0, platforms: tuple[str, ...] | None = None,
                 dtype=None) -> Path:
    """Export the serving forward as a serialized StableHLO artifact."""
    from jax import export as jexport

    forward, example = build_forward(config, weights, payload, margin, dtype)
    kwargs = {}
    if platforms:
        kwargs["platforms"] = list(platforms)
    exported = jexport.export(jax.jit(forward), **kwargs)(example)
    data = exported.serialize()
    out_path = Path(out_path)
    out_path.write_bytes(data)
    return out_path


def load_exported(path: str | Path):
    """Deserialize an exported artifact; returns a callable (uint8 batch -> payload)."""
    from jax import export as jexport

    exported = jexport.deserialize(bytearray(Path(path).read_bytes()))
    return lambda *args: exported.call(*args)
