"""Shared ray-casting core for the camera raster and lidar.

The reference gets RGB/depth/semantic cameras and lidar from UE4 sensor
actors inside the CARLA server (spawned by AgentWrapper.setup_sensors,
leaderboard/leaderboard/autoagents/agent_wrapper.py:99-230) — out-of-process
renders streamed over TCP. Here the scene is analytic: a textured ground
plane (the town rasters) + oriented boxes (vehicles, walkers) + traffic-light
poles, intersected in one fused batch of slab tests. Semantics and depth come
from the same intersection, so camera RGB / depth / semantic and lidar all
share this kernel.

Semantic ids follow the CARLA palette subset the reference trains on
(configs/thinktwice.py seg_label_idxs + 3 TL colors; loading.py LoadSeg):
0 none/sky, 1 road, 2 sidewalk, 3 lane marking, 4 vehicle, 5 walker,
6 terrain, 7 pole, 8 tl_green, 9 tl_yellow, 10 tl_red.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from thinktwice_tpu.maps.town import TownMap

SEM_NONE, SEM_ROAD, SEM_SIDEWALK, SEM_LANE, SEM_VEHICLE, SEM_WALKER = 0, 1, 2, 3, 4, 5
SEM_TERRAIN, SEM_POLE, SEM_TL_GREEN, SEM_TL_YELLOW, SEM_TL_RED = 6, 7, 8, 9, 10
N_SEM_CLASSES = 11

VEHICLE_HEIGHT = 1.6
WALKER_HEIGHT = 1.8
MAX_T = 1e6


def ray_ground(origins, dirs):
    """Rays vs z=0 plane. origins (..., 3), dirs (..., 3) -> t (...,)
    (MAX_T when no forward hit)."""
    dz = dirs[..., 2]
    t = -origins[..., 2] / jnp.where(jnp.abs(dz) < 1e-9, -1e-9, dz)
    return jnp.where((t > 0) & (dz < 0), t, MAX_T)


def ray_boxes(origins, dirs, box_pose, box_active):
    """Slab test against N upright boxes.

    origins/dirs (R, 3); box_pose (N, 6) = x, y, yaw, ex, ey, z_top, or
    (N, 7) with a trailing z_base column for elevated fixtures (traffic-light
    heads). Returns (t_min (R,), idx (R,)) of the nearest hit (MAX_T / -1 if
    none).
    """
    pos = box_pose[:, :2]
    yaw = box_pose[:, 2]
    ext = box_pose[:, 3:5]
    hgt = box_pose[:, 5]
    z0 = box_pose[:, 6] if box_pose.shape[1] > 6 else jnp.zeros_like(hgt)

    c, s = jnp.cos(yaw), jnp.sin(yaw)
    # ray in box frame: rel (R, N, 2)
    rel = origins[:, None, :2] - pos[None]
    lx = rel[..., 0] * c[None] + rel[..., 1] * s[None]
    ly = -rel[..., 0] * s[None] + rel[..., 1] * c[None]
    dx = dirs[:, None, 0] * c[None] + dirs[:, None, 1] * s[None]
    dy = -dirs[:, None, 0] * s[None] + dirs[:, None, 1] * c[None]
    lz = origins[:, None, 2] - 0.0
    dz = dirs[:, None, 2]

    def slab(p, d, lo, hi):
        d_safe = jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
        t1 = (lo - p) / d_safe
        t2 = (hi - p) / d_safe
        return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

    tx1, tx2 = slab(lx, dx, -ext[None, :, 0], ext[None, :, 0])
    ty1, ty2 = slab(ly, dy, -ext[None, :, 1], ext[None, :, 1])
    tz1, tz2 = slab(lz, dz, z0[None], hgt[None])

    t_near = jnp.maximum(jnp.maximum(tx1, ty1), tz1)
    t_far = jnp.minimum(jnp.minimum(tx2, ty2), tz2)
    hit = (t_near <= t_far) & (t_far > 0) & box_active[None]
    t_hit = jnp.where(hit, jnp.maximum(t_near, 0.0), MAX_T)

    t_min = jnp.min(t_hit, axis=1)
    idx = jnp.argmin(t_hit, axis=1)
    return t_min, jnp.where(t_min < MAX_T, idx, -1)


def sample_ground_semantic(town: TownMap, pts_xy):
    """Ground-plane semantics at world xy (..., 2) from the town rasters."""
    px = town.world_to_pixel(pts_xy)
    H, W = town.road.shape
    xi = jnp.clip(px[..., 0].astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(px[..., 1].astype(jnp.int32), 0, H - 1)
    road = town.road[yi, xi] > 0
    side = town.sidewalk[yi, xi] > 0
    lane = town.lane_all[yi, xi] > 0
    return jnp.where(
        lane & road,
        SEM_LANE,
        jnp.where(road, SEM_ROAD, jnp.where(side, SEM_SIDEWALK, SEM_TERRAIN)),
    )


def _pad7(pose):
    """Pad a (N, 6) box-pose array with a zero z_base column -> (N, 7)."""
    if pose.shape[-1] >= 7:
        return pose
    return jnp.concatenate(
        [pose, jnp.zeros((pose.shape[0], 1), pose.dtype)], axis=-1
    )


def cast_scene(town: TownMap, origins, dirs, veh_pose, veh_active,
               wlk_pose, wlk_active, use_pallas: bool | None = None,
               extra_pose=None, extra_active=None, extra_class=None):
    """Full scene intersection.

    origins/dirs (R, 3) world frame; veh_pose (V, 6); wlk_pose (W, 6).
    extra_pose (E, 7) optional classed static boxes (traffic-light poles and
    state-colored heads — traffic_light_boxes) with per-box semantic ids in
    extra_class (E,). Returns dict: t (R,) depth along ray, semantic (R,)
    int32, shade (R,) in [0,1] for simple lambert shading.

    On TPU the box intersection runs as the Pallas kernel
    (ops/raycast_pallas.py — bit-identical, ~30x faster at camera scale by
    keeping per-box slab tests in registers instead of (R, N) HBM arrays).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    t_g = ray_ground(origins, dirs)
    V = veh_pose.shape[0]
    W = wlk_pose.shape[0]
    poses = [_pad7(veh_pose), _pad7(wlk_pose)]
    actives = [veh_active, wlk_active]
    # per-box semantic class table (box hit -> class via one gather)
    classes = [
        jnp.full((V,), SEM_VEHICLE, jnp.int32),
        jnp.full((W,), SEM_WALKER, jnp.int32),
    ]
    if extra_pose is not None:
        poses.append(_pad7(extra_pose))
        actives.append(extra_active)
        classes.append(extra_class.astype(jnp.int32))
    all_pose = jnp.concatenate(poses, axis=0)
    all_active = jnp.concatenate(actives, axis=0)
    class_table = jnp.concatenate(classes, axis=0)
    if use_pallas:
        from thinktwice_tpu.ops.raycast_pallas import ray_boxes_pallas

        t_b, idx_b = ray_boxes_pallas(origins, dirs, all_pose, all_active)
    else:
        t_b, idx_b = ray_boxes(origins, dirs, all_pose, all_active)

    hit_box = (idx_b >= 0) & (t_b <= t_g)
    hit_g = (t_g < MAX_T) & ~hit_box
    t = jnp.minimum(t_g, t_b)

    ground_pts = origins[:, :2] + t_g[:, None] * dirs[:, :2]
    g_sem = sample_ground_semantic(town, ground_pts)

    box_sem = class_table[jnp.maximum(idx_b, 0)]
    sem = jnp.where(hit_box, box_sem, jnp.where(hit_g, g_sem, SEM_NONE))
    # cheap shading: ground lit from above; boxes shaded by view angle
    shade = jnp.where(
        hit_g,
        1.0,
        jnp.clip(0.45 + 0.55 * jnp.abs(dirs[:, 2]) + 0.2 * jnp.abs(dirs[:, 0]), 0.0, 1.0),
    )
    return {"t": jnp.where(t < MAX_T, t, 0.0), "semantic": sem, "shade": shade,
            "hit": t < MAX_T}


def box_pose_from_state(pos, yaw, extent, height):
    """(N,2),(N,),(N,2),scalar -> (N, 6) box pose array."""
    n = pos.shape[0]
    return jnp.concatenate(
        [pos, yaw[:, None], extent, jnp.full((n, 1), height)], axis=-1
    )


# traffic-light fixture geometry (roadside signal: pole + elevated head)
TL_POLE_OFFSET_M = 3.2      # lateral offset from the stop point to the pole
TL_POLE_HALF_M = 0.15
TL_POLE_TOP_M = 4.6
TL_HEAD_HALF_M = 0.35
TL_HEAD_BASE_M = 4.6
TL_HEAD_TOP_M = 5.9


def traffic_light_boxes(town: TownMap, tl_states):
    """Camera-visible traffic-light fixtures -> (pose (2*NL, 7), active,
    class).

    The reference's student sees traffic-light color as 3 seg classes split
    out of the camera segmentation (loading.py:96-160, seg classes in
    configs/thinktwice.py:151-158); CARLA renders the physical fixtures. Here
    each light becomes a SEM_POLE pole at the right-hand roadside of its stop
    point plus an elevated head box whose class tracks the live phase
    (SEM_TL_GREEN/YELLOW/RED) so a camera at the stop line sees the color.
    """
    right = jnp.stack([-jnp.sin(town.tl_yaw), jnp.cos(town.tl_yaw)], axis=-1)
    base = town.tl_pos + TL_POLE_OFFSET_M * right              # (NL, 2)
    nl = base.shape[0]
    pole = jnp.concatenate(
        [
            base,
            town.tl_yaw[:, None],
            jnp.full((nl, 2), TL_POLE_HALF_M),
            jnp.full((nl, 1), TL_POLE_TOP_M),
            jnp.zeros((nl, 1)),
        ],
        axis=-1,
    )
    head = jnp.concatenate(
        [
            base,
            town.tl_yaw[:, None],
            jnp.full((nl, 2), TL_HEAD_HALF_M),
            jnp.full((nl, 1), TL_HEAD_TOP_M),
            jnp.full((nl, 1), TL_HEAD_BASE_M),
        ],
        axis=-1,
    )
    pose = jnp.concatenate([pole, head], axis=0)               # (2NL, 7)
    active = jnp.concatenate([town.tl_valid, town.tl_valid])
    head_class = SEM_TL_GREEN + tl_states.astype(jnp.int32)    # 0/1/2 -> 8/9/10
    cls = jnp.concatenate(
        [jnp.full((nl,), SEM_POLE, jnp.int32), head_class]
    )
    return pose, active, cls
