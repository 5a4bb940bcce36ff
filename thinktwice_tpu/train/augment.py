"""Image augmentation for student training: the imgaug curriculum, in JAX.

≡ code/datasets/pipelines/transform.py ImageTransformMulti (:171-216):
blur/noise/dropout whose strength ramps with training progress, applied
before ImageNet normalization. Here: brightness/contrast jitter, additive
gaussian noise, channel dropout and a box-blur, each gated by a curriculum
scalar in [0, 1] (reference ramps with batch count). Pure jnp so it fuses
into the (jitted) train step — no host-side image workers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _box_blur(img, k: int = 3):
    """(..., H, W, C) mean filter via separable cumsum trick (cheap, fixed k)."""
    pad = k // 2
    x = jnp.pad(img, [(0, 0)] * (img.ndim - 3) + [(pad, pad), (pad, pad), (0, 0)],
                mode="edge")
    # separable mean
    x = sum(jnp.roll(x, s, axis=-3) for s in range(-pad, pad + 1)) / k
    x = sum(jnp.roll(x, s, axis=-2) for s in range(-pad, pad + 1)) / k
    return x[..., pad:-pad, pad:-pad, :]


def augment_images(rng, imgs, strength):
    """imgs (..., H, W, 3) in [0, 1]; strength scalar in [0, 1] (curriculum).

    Returns perturbed images in [0, 1]. Each sub-augmentation draws its own
    switch so samples see diverse corruption combinations."""
    k = jax.random.split(rng, 6)
    s = jnp.asarray(strength)

    bright = 1.0 + 0.3 * s * jax.random.uniform(k[0], (), minval=-1.0, maxval=1.0)
    contrast = 1.0 + 0.3 * s * jax.random.uniform(k[1], (), minval=-1.0, maxval=1.0)
    out = (imgs - 0.5) * contrast + 0.5
    out = out * bright

    noise_sigma = 0.05 * s * jax.random.uniform(k[2], ())
    out = out + noise_sigma * jax.random.normal(k[3], imgs.shape)

    do_blur = jax.random.bernoulli(k[4], 0.3 * s)
    out = jnp.where(do_blur, _box_blur(out), out)

    # channel dropout (coarse cutout of one channel scaled down)
    do_drop = jax.random.bernoulli(k[5], 0.2 * s)
    ch = jax.random.randint(jax.random.fold_in(k[5], 1), (), 0, 3)
    mask = jax.nn.one_hot(ch, 3) * 0.5
    out = jnp.where(do_drop, out * (1.0 - mask), out)

    return jnp.clip(out, 0.0, 1.0)


def curriculum(step, ramp_steps: int = 10_000):
    """Strength ramp with training progress (ImageTransformMulti's batch-count
    ramp)."""
    return jnp.clip(step / ramp_steps, 0.0, 1.0)
