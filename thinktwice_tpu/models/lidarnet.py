"""Lidar BEV encoder: dense pillar encoder replacing spconv.

The reference LidarNet (code/model_code/backbones/lidarnet.py:24-96) is the
mmdet3d MVX pipeline: CUDA voxelize (0.057 m cells, caps 120k/160k voxels,
configs/thinktwice.py:160-166) -> HardSimpleVFE (mean of point features) ->
spconv SparseEncoder over a 41x672x672 grid -> SECOND -> SECONDFPN.

spconv has no TPU analog (SURVEY §7.4 item 5); at this point-cloud-range the
idiomatic TPU re-design is a *pillar* grid at 0.2286 m (168x168 after the
conv stack input of 336x336) encoded densely:
- voxelization = segment_mean over pillar ids (fixed capacity, masked points
  — no 120k-voxel cap needed since pillars are dense),
- the sparse 3D encoder becomes a dense 2D conv stack (the z extent was
  already collapsed to BEV by the reference's own pipeline),
- SECOND/SECONDFPN keep their layer structure with GroupNorm.

Output: high-res BEV (B, 84, 84, 512) consumed by the fusion convs
(encoder_decoder_framework.py conv_lidar downsamples 84->42->21) and the
decoder's lidar look branch.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from thinktwice_tpu.config import ModelConfig
from thinktwice_tpu.models.layers import ConvGN

POINT_FEATS = 5            # x, y, z, intensity, dt


def pillarize(points, mask, cfg: ModelConfig, grid: int | None = None):
    """points (P, 5) in ego frame, mask (P,) valid -> (grid, grid, 8) mean
    pillar features (HardSimpleVFE semantics: mean of raw features; plus
    count and mean offsets for a richer but still param-free encoding)."""
    grid = grid or cfg.lidar_pillar_grid
    cell_x = (cfg.bev_x_max - cfg.bev_x_min) / grid
    cell_y = (cfg.bev_y_max - cfg.bev_y_min) / grid
    xi = jnp.floor((points[:, 0] - cfg.bev_x_min) / cell_x).astype(jnp.int32)
    yi = jnp.floor((points[:, 1] - cfg.bev_y_min) / cell_y).astype(jnp.int32)
    inb = mask & (xi >= 0) & (xi < grid) & (yi >= 0) & (yi < grid)
    pid = jnp.where(inb, yi * grid + xi, grid * grid)

    feats = jnp.where(inb[:, None], points, 0.0)
    sums = jax.ops.segment_sum(feats, pid, num_segments=grid * grid + 1)
    cnt = jax.ops.segment_sum(
        inb.astype(jnp.float32), pid, num_segments=grid * grid + 1
    )
    mean = sums[:-1] / jnp.maximum(cnt[:-1, None], 1.0)
    occ = (cnt[:-1] > 0).astype(jnp.float32)
    logcnt = jnp.log1p(cnt[:-1])
    out = jnp.concatenate([mean, occ[:, None], logcnt[:, None]], axis=-1)
    return out.reshape(grid, grid, POINT_FEATS + 2)


class LidarNet(nn.Module):
    """(B, P, 5) points + (B, P) mask -> (B, 84, 84, 512) BEV features."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, points, mask):
        pillars = jax.vmap(lambda p, m: pillarize(p, m, self.cfg))(points, mask)

        # bf16 conv trunk (same rationale as the camera trunk, lss.py);
        # output cast back to f32 below for the fusion/decoder path
        pillars = pillars.astype(jnp.bfloat16)
        bf16 = jnp.bfloat16
        x = ConvGN(32, dtype=bf16)(pillars)            # grid (336 default)
        x = ConvGN(64, stride=2, dtype=bf16)(x)        # grid/2
        x = ConvGN(64, dtype=bf16)(x)
        x = ConvGN(128, stride=2, dtype=bf16)(x)       # grid/4 (84 default)
        # SECOND-style blocks at stride 1 and 2
        a = x
        for _ in range(3):
            a = ConvGN(128, dtype=bf16)(a)
        b = ConvGN(256, stride=2, dtype=bf16)(a)       # grid/8
        for _ in range(3):
            b = ConvGN(256, dtype=bf16)(b)
        # SECONDFPN: upsample b, concat -> 512 channels
        b_up = jax.image.resize(
            b, (b.shape[0], a.shape[1], a.shape[2], b.shape[-1]), "nearest"
        )
        b_up = ConvGN(256, kernel=1, dtype=bf16)(b_up)
        a = ConvGN(256, kernel=1, dtype=bf16)(a)
        out = jnp.concatenate([a, b_up], axis=-1)    # (B, grid/4, grid/4, 512)
        # the fusion convs expect the high-res lidar BEV at 4x the model BEV
        # grid (84 for 21; encoder_decoder conv_lidar downsamples 84->42->21)
        hr = 4 * self.cfg.bev_size
        if out.shape[1] != hr:
            out = jax.image.resize(
                out, (out.shape[0], hr, hr, out.shape[-1]), "nearest"
            )
        return out.astype(jnp.float32)
