"""Multi-scale deformable attention as gathers + bilinear interpolation.

The reference loads mmcv's CUDA ms_deform_attn kernels
(code/model_code/dense_heads/multi_scale_deformable_attn_function.py:24-25,
fwd/bwd Function wrappers :45-196); its own pure-torch fallback
(`multi_scale_deformable_attn_pytorch`, :22) shows the op is exactly
grid-sample + weighted sum — which is what XLA compiles well: the bilinear
taps become vectorized gathers, the weighted reduction fuses, and autodiff
provides the backward. Query counts here are tiny (<= a few hundred per
sample), so this is bandwidth-trivial next to the conv stacks.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def ms_deform_attn(
    value: jax.Array,                 # (B, sum_l H_l*W_l, n_heads, head_dim)
    spatial_shapes: Sequence[tuple[int, int]],  # [(H_l, W_l)] static
    sampling_locations: jax.Array,    # (B, Q, n_heads, n_levels, n_points, 2) in [0,1]
    attention_weights: jax.Array,     # (B, Q, n_heads, n_levels, n_points)
) -> jax.Array:
    """-> (B, Q, n_heads * head_dim). Semantics of
    mmcv.ops.multi_scale_deform_attn (align_corners=False grid_sample,
    zero padding)."""
    B, _, n_heads, head_dim = value.shape
    Q = sampling_locations.shape[1]
    n_levels = len(spatial_shapes)

    # split the flattened value into per-level feature maps
    sizes = [h * w for h, w in spatial_shapes]
    offsets = [0]
    for s in sizes:
        offsets.append(offsets[-1] + s)

    out = jnp.zeros((B, Q, n_heads, head_dim), value.dtype)
    for lvl, (H, W) in enumerate(spatial_shapes):
        v = value[:, offsets[lvl] : offsets[lvl + 1]]           # (B, HW, h, d)
        v = v.reshape(B, H, W, n_heads, head_dim)

        loc = sampling_locations[:, :, :, lvl]                  # (B, Q, h, P, 2)
        # normalized [0,1] -> pixel coords, align_corners=False convention
        x = loc[..., 0] * W - 0.5
        y = loc[..., 1] * H - 0.5
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        fx, fy = x - x0, y - y0

        def tap(xi, yi, v=v, H=H, W=W):
            inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            xi_c = jnp.clip(xi, 0, W - 1)
            yi_c = jnp.clip(yi, 0, H - 1)
            # gather per batch & head: v (B, H, W, h, d), idx (B, Q, h, P)
            b_idx = jnp.arange(B)[:, None, None, None]
            h_idx = jnp.arange(v.shape[3])[None, None, :, None]
            g = v[b_idx, yi_c, xi_c, h_idx]                     # (B, Q, h, P, d)
            return jnp.where(inb[..., None], g, 0.0)

        sampled = (
            tap(x0, y0) * ((1 - fx) * (1 - fy))[..., None]
            + tap(x0 + 1, y0) * (fx * (1 - fy))[..., None]
            + tap(x0, y0 + 1) * ((1 - fx) * fy)[..., None]
            + tap(x0 + 1, y0 + 1) * (fx * fy)[..., None]
        )                                                        # (B, Q, h, P, d)
        w = attention_weights[:, :, :, lvl, :, None]             # (B, Q, h, P, 1)
        out = out + jnp.sum(sampled * w, axis=3)

    return out.reshape(B, Q, n_heads * head_dim)
