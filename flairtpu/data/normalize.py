"""Channel normalization (reference src/flair/data_loader.py:9-30 semantics).

Three modes: ``scaling`` (integer types to [0, 1], skimage img_as_float
semantics), ``custom`` (per-channel (x - mean) / std), ``without``. Host
(numpy) and device (jnp, channels-last) variants; the device variant is what
the jitted train/infer steps fuse with the first conv.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class NormalizationError(SystemExit):
    pass


def _check(norm_type: str, means, stds):
    if norm_type not in ("scaling", "custom", "without"):
        raise NormalizationError(
            "Normalization argument should be 'scaling', 'custom' or 'without'.")
    if norm_type == "custom" and len(means) != len(stds):
        raise NormalizationError(
            "If custom, provided normalization means and stds should be of same length.")


def scale_factor(dtype) -> float:
    """img_as_float: unsigned ints scale by their max; floats pass through."""
    dt = np.dtype(dtype)
    if dt.kind == "u":
        return float(np.iinfo(dt).max)
    if dt.kind == "i":
        return float(np.iinfo(dt).max)
    return 1.0


def normalize_host(img: np.ndarray, norm_type: str = "scaling",
                   means=(), stds=()) -> np.ndarray:
    """img: (C, H, W) host array (band-major like a raster read)."""
    _check(norm_type, means, stds)
    if norm_type == "custom":
        out = img.astype(np.float64)
        for i in range(out.shape[0]):
            out[i] = (out[i] - means[i]) / stds[i]
        return out
    if norm_type == "scaling":
        return img.astype(np.float64) / scale_factor(img.dtype)
    return img


def normalize_device(img: jnp.ndarray, norm_type: str, means, stds,
                     src_dtype=np.uint8, out_dtype=jnp.float32) -> jnp.ndarray:
    """img: (..., C) channels-last device array; static norm parameters."""
    _check(norm_type, means, stds)
    x = img.astype(out_dtype)
    if norm_type == "custom":
        mean = jnp.asarray(means, out_dtype)
        inv_std = 1.0 / jnp.asarray(stds, out_dtype)
        return (x - mean) * inv_std
    if norm_type == "scaling":
        return x / scale_factor(src_dtype)
    return x
