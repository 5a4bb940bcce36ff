"""Multi-scale deformable attention as gathers + bilinear interpolation.

The reference loads mmcv's CUDA ms_deform_attn kernels
(code/model_code/dense_heads/multi_scale_deformable_attn_function.py:24-25,
fwd/bwd Function wrappers :45-196); its own pure-torch fallback
(`multi_scale_deformable_attn_pytorch`, :22) shows the op is exactly
grid-sample + weighted sum — which is what XLA compiles well: the bilinear
taps become vectorized gathers, the weighted reduction fuses, and autodiff
provides the backward. Query counts here are tiny (<= a few hundred per
sample), so this is bandwidth-trivial next to the conv stacks.

TPU layout note: `value` is taken CHANNEL-FUSED as (B, sum HW, C) rather
than the CUDA kernel's (B, sum HW, n_heads, C/n_heads). TPU tiling is
T(8, 128) on the two minor axes, so a trailing head_dim of 32 pads 4x —
at training batch sizes the value tensor (and every remat copy and gradient
of it XLA keeps for the 5 refine layers x 4 cams x 2 decoder passes) blew
a 15.75G HBM budget at 57G. With C=256 minor the tensor tiles exactly.
Heads still sample at their own locations; each gather pulls the full C
channels (Q is tiny, so the 8x gather amplification is noise) and a masked
head-mixing reduction keeps only each head's own channel block.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def ms_deform_attn(
    value: jax.Array,                 # (B, sum_l H_l*W_l, C) channel-fused
    spatial_shapes: Sequence[tuple[int, int]],  # [(H_l, W_l)] static
    sampling_locations: jax.Array,    # (B, Q, n_heads, n_levels, n_points, 2) in [0,1]
    attention_weights: jax.Array,     # (B, Q, n_heads, n_levels, n_points)
) -> jax.Array:
    """-> (B, Q, C). Semantics of mmcv.ops.multi_scale_deform_attn
    (align_corners=False grid_sample, zero padding): head h attends at its
    own locations and contributes channels [h*C/H, (h+1)*C/H)."""
    B, _, C = value.shape
    Q, n_heads = sampling_locations.shape[1], sampling_locations.shape[2]
    head_dim = C // n_heads

    # split the flattened value into per-level feature maps
    sizes = [h * w for h, w in spatial_shapes]
    offsets = [0]
    for s in sizes:
        offsets.append(offsets[-1] + s)

    # head h keeps its own channel block after the full-channel gather
    head_mask = jnp.repeat(
        jnp.eye(n_heads, dtype=value.dtype), head_dim, axis=1
    )                                                           # (h, C)

    out = jnp.zeros((B, Q, C), value.dtype)
    for lvl, (H, W) in enumerate(spatial_shapes):
        v = value[:, offsets[lvl] : offsets[lvl + 1]]           # (B, HW, C)
        v = v.reshape(B, H, W, C)

        loc = sampling_locations[:, :, :, lvl]                  # (B, Q, h, P, 2)
        # normalized [0,1] -> pixel coords, align_corners=False convention
        x = loc[..., 0] * W - 0.5
        y = loc[..., 1] * H - 0.5
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        # sub-pixel fractions computed in the location dtype (f32), then
        # cast to the value dtype so a bf16 value keeps the whole
        # interpolation (and the output) in bf16
        fx = (x - x0).astype(value.dtype)
        fy = (y - y0).astype(value.dtype)

        def tap(xi, yi, v=v, H=H, W=W):
            inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            xi_c = jnp.clip(xi, 0, W - 1)
            yi_c = jnp.clip(yi, 0, H - 1)
            # gather full channels per (batch, query, head, point) location
            b_idx = jnp.arange(B)[:, None, None, None]
            g = v[b_idx, yi_c, xi_c]                            # (B, Q, h, P, C)
            return jnp.where(inb[..., None], g, 0.0)

        sampled = (
            tap(x0, y0) * ((1 - fx) * (1 - fy))[..., None]
            + tap(x0 + 1, y0) * (fx * (1 - fy))[..., None]
            + tap(x0, y0 + 1) * ((1 - fx) * fy)[..., None]
            + tap(x0 + 1, y0 + 1) * (fx * fy)[..., None]
        )                                                        # (B, Q, h, P, C)
        w = attention_weights[:, :, :, lvl, :, None]             # (B, Q, h, P, 1)
        per_head = jnp.sum(sampled * w, axis=3)                  # (B, Q, h, C)
        out = out + jnp.einsum("bqhc,hc->bqc", per_head, head_mask)

    return out
