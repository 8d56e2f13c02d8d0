"""Geometric augmentations as fused on-device XLA ops.

Reproduces the reference's albumentations pipeline (tasks_utils.py:37-41):
VerticalFlip(p=0.5) -> HorizontalFlip(p=0.5) -> RandomRotate90(p=0.5, with k
drawn uniformly from {0,1,2,3} when applied — albumentations' get_params
includes k=0). Instead of mutating numpy arrays in DataLoader workers, the
whole batch is transformed on device inside the jitted train step: flips and
rot90 are layout ops XLA fuses into the surrounding computation for free.

Image batches are NHWC; masks are (B, H, W) integer labels and get the same
spatial transform.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _rot90(x: jax.Array, k: jax.Array) -> jax.Array:
    """rot90 on axes (0, 1) of a single sample, k traced in {0,1,2,3}.

    np.rot90 k=1 == transpose + flip axis 0 (counter-clockwise).
    """
    branches = [
        lambda a: a,
        lambda a: jnp.flip(jnp.swapaxes(a, 0, 1), axis=0),
        lambda a: jnp.flip(jnp.flip(a, axis=0), axis=1),
        lambda a: jnp.flip(jnp.swapaxes(a, 0, 1), axis=1),
    ]
    return jax.lax.switch(k, branches, x)


def _augment_one(img: jax.Array, msk: jax.Array, key: jax.Array):
    """img (H, W, C), msk (H, W). Square patches (rot90 keeps shapes static)."""
    k_v, k_h, k_r, k_k = jax.random.split(key, 4)
    do_v = jax.random.bernoulli(k_v)
    do_h = jax.random.bernoulli(k_h)
    do_r = jax.random.bernoulli(k_r)
    k = jnp.where(do_r, jax.random.randint(k_k, (), 0, 4), 0)

    img = jnp.where(do_v, jnp.flip(img, axis=0), img)
    msk = jnp.where(do_v, jnp.flip(msk, axis=0), msk)
    img = jnp.where(do_h, jnp.flip(img, axis=1), img)
    msk = jnp.where(do_h, jnp.flip(msk, axis=1), msk)
    img = _rot90(img, k)
    msk = _rot90(msk, k)
    return img, msk


def augment_batch(images: jax.Array, masks: jax.Array, rng: jax.Array):
    """Vectorized per-sample D4 augmentation. images (B,H,W,C), masks (B,H,W)."""
    keys = jax.random.split(rng, images.shape[0])
    return jax.vmap(_augment_one)(images, masks, keys)
