"""Bilinear grid sampling (the torch `F.grid_sample` uses in the reference:
lidar BEV lookup in the Look module, thinktwice_decoder.py:79-85, and the IDA
undistortion pipeline, transform.py) as XLA gathers."""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample_2d(img, coords, align_corners: bool = False):
    """img (H, W, C); coords (..., 2) in pixel units (x, y). Zero padding
    outside. -> (..., C)."""
    H, W = img.shape[0], img.shape[1]
    x, y = coords[..., 0], coords[..., 1]
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx, fy = x - x0, y - y0

    def tap(xi, yi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        v = img[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        return jnp.where(inb[..., None], v, 0.0)

    return (
        tap(x0, y0) * ((1 - fx) * (1 - fy))[..., None]
        + tap(x0 + 1, y0) * (fx * (1 - fy))[..., None]
        + tap(x0, y0 + 1) * ((1 - fx) * fy)[..., None]
        + tap(x0 + 1, y0 + 1) * (fx * fy)[..., None]
    )


def grid_sample_norm(img, coords_norm):
    """coords in [-1, 1] normalized convention (torch align_corners=False)."""
    H, W = img.shape[0], img.shape[1]
    x = (coords_norm[..., 0] + 1.0) * 0.5 * W - 0.5
    y = (coords_norm[..., 1] + 1.0) * 0.5 * H - 0.5
    return grid_sample_2d(img, jnp.stack([x, y], axis=-1))
