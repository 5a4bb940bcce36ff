"""Pallas TPU kernel: batched ray vs oriented-box intersection.

The XLA formulation in sensors/raycast.ray_boxes materializes ~8 (R, N)
f32 intermediates (slab entry/exit per axis) — for a 4-camera render that is
hundreds of MB of HBM traffic per frame. This kernel tiles rays into VMEM
((8, 128) vectors), keeps every per-box quantity in registers while looping
boxes with `fori_loop`, and writes only the final (t_min, box_idx) per ray:
O(R) HBM traffic instead of O(R x N).

Box layout: (N, 8) f32 rows [x, y, yaw, ext_x, ext_y, z_top, active, z_base];
rays as component-planar (P, LANES) blocks so the lane dimension is 128-wide.
z_base (default 0) supports elevated fixtures like traffic-light heads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_T = 1e6
SUBLANES = 8
LANES = 128
TILE = SUBLANES * LANES  # rays per kernel invocation


def _kernel(boxes_ref, rays_ref, t_ref, idx_ref, *, n_boxes: int):
    """boxes_ref (N, 8) VMEM; rays_ref (1, 6, S, L) VMEM block (components
    ox oy oz dx dy dz); t_ref/idx_ref (1, S, L)."""
    ox = rays_ref[0, 0]
    oy = rays_ref[0, 1]
    oz = rays_ref[0, 2]
    dx = rays_ref[0, 3]
    dy = rays_ref[0, 4]
    dz = rays_ref[0, 5]

    eps = 1e-9
    dxs = jnp.where(jnp.abs(dx) < eps, eps, dx)
    dys = jnp.where(jnp.abs(dy) < eps, eps, dy)
    dzs = jnp.where(jnp.abs(dz) < eps, eps, dz)

    def body(i, carry):
        t_best, idx_best = carry
        bx = boxes_ref[i, 0]
        by = boxes_ref[i, 1]
        yaw = boxes_ref[i, 2]
        ex = boxes_ref[i, 3]
        ey = boxes_ref[i, 4]
        hz = boxes_ref[i, 5]
        act = boxes_ref[i, 6]
        z0 = boxes_ref[i, 7]

        c = jnp.cos(yaw)
        s = jnp.sin(yaw)
        # ray in box frame
        rx = ox - bx
        ry = oy - by
        lx = rx * c + ry * s
        ly = -rx * s + ry * c
        ldx = dx * c + dy * s
        ldy = -dx * s + dy * c
        ldxs = jnp.where(jnp.abs(ldx) < eps, eps, ldx)
        ldys = jnp.where(jnp.abs(ldy) < eps, eps, ldy)

        tx1 = (-ex - lx) / ldxs
        tx2 = (ex - lx) / ldxs
        ty1 = (-ey - ly) / ldys
        ty2 = (ey - ly) / ldys
        tz1 = (z0 - oz) / dzs
        tz2 = (hz - oz) / dzs

        t_near = jnp.maximum(
            jnp.maximum(jnp.minimum(tx1, tx2), jnp.minimum(ty1, ty2)),
            jnp.minimum(tz1, tz2),
        )
        t_far = jnp.minimum(
            jnp.minimum(jnp.maximum(tx1, tx2), jnp.maximum(ty1, ty2)),
            jnp.maximum(tz1, tz2),
        )
        hit = (t_near <= t_far) & (t_far > 0.0) & (act > 0.5)
        t_hit = jnp.where(hit, jnp.maximum(t_near, 0.0), MAX_T)
        better = t_hit < t_best
        t_best = jnp.where(better, t_hit, t_best)
        idx_best = jnp.where(better, i, idx_best)
        return t_best, idx_best

    t0 = jnp.full((SUBLANES, LANES), MAX_T, jnp.float32)
    i0 = jnp.full((SUBLANES, LANES), -1, jnp.int32)
    t_best, idx_best = jax.lax.fori_loop(0, n_boxes, body, (t0, i0))
    t_ref[0] = t_best
    idx_ref[0] = idx_best


@functools.partial(jax.jit, static_argnames=("interpret",))
def ray_boxes_pallas(origins, dirs, box_pose, box_active, interpret: bool = False):
    """Drop-in replacement for sensors.raycast.ray_boxes.

    origins/dirs (R, 3); box_pose (N, 6) or (N, 7) with trailing z_base;
    box_active (N,) -> (t_min (R,), idx (R,)).
    """
    R = origins.shape[0]
    N = box_pose.shape[0]
    n_tiles = (R + TILE - 1) // TILE
    Rp = n_tiles * TILE

    def planar(a3):
        comp = jnp.transpose(a3, (1, 0))                     # (3, R)
        comp = jnp.pad(comp, ((0, 0), (0, Rp - R)))
        return comp.reshape(3, n_tiles, SUBLANES, LANES)

    rays = jnp.concatenate([planar(origins), planar(dirs)], axis=0)
    rays = jnp.transpose(rays, (1, 0, 2, 3))                 # (tiles, 6, S, L)

    z0 = (
        box_pose[:, 6:7]
        if box_pose.shape[1] > 6
        else jnp.zeros((N, 1), box_pose.dtype)
    )
    boxes = jnp.concatenate(
        [
            box_pose[:, :6].astype(jnp.float32),
            box_active.astype(jnp.float32)[:, None],
            z0.astype(jnp.float32),
        ],
        axis=-1,
    )                                                        # (N, 8)

    t, idx = pl.pallas_call(
        functools.partial(_kernel, n_boxes=N),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((N, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 6, SUBLANES, LANES), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, SUBLANES, LANES), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, SUBLANES, LANES), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, SUBLANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, SUBLANES, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(boxes, rays)

    t = t.reshape(Rp)[:R]
    idx = idx.reshape(Rp)[:R]
    return t, jnp.where(t < MAX_T, idx, -1)
