"""Multi-camera RGB / depth / semantic raster (in-graph UE4 sensor stand-in).

Produces the student model's inputs and the depth/seg supervision targets in
one pass: RGB from the semantic palette + lambert shading, depth in meters
(the reference decodes UE4's RGB-encoded depth, loading.py LoadDepth:88-91 —
ours is directly metric), and the semantic ids the seg head trains against
(loading.py LoadSeg label remap), including the 3 traffic-light color classes
rendered as physical pole+head fixtures (raycast.traffic_light_boxes).

Geometry matches models/rig.py (ideal pinhole, no distortion — the fov-150
undistortion pipeline D3/X3 exists in the reference only to *undo* UE4's lens
model; an in-graph renderer never distorts in the first place, SURVEY §7.4
item 2)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from thinktwice_tpu.config import CameraConfig
from thinktwice_tpu.maps.town import TownMap
from thinktwice_tpu.models import rig as rig_lib
from thinktwice_tpu.sensors.raycast import (
    VEHICLE_HEIGHT,
    WALKER_HEIGHT,
    box_pose_from_state,
    cast_scene,
    traffic_light_boxes,
)
from thinktwice_tpu.sim.state import WorldState

# semantic id -> RGB (coarse CARLA-like palette)
PALETTE = jnp.asarray(
    [
        [70, 130, 180],    # 0 sky
        [90, 90, 90],      # 1 road
        [160, 160, 160],   # 2 sidewalk
        [230, 230, 230],   # 3 lane marking
        [30, 60, 150],     # 4 vehicle
        [220, 20, 60],     # 5 walker
        [70, 120, 50],     # 6 terrain
        [140, 140, 120],   # 7 pole
        [0, 220, 0],       # 8 tl green
        [230, 220, 0],     # 9 tl yellow
        [230, 0, 0],       # 10 tl red
    ],
    jnp.float32,
) / 255.0


def _pixel_rays(cfg: CameraConfig):
    """Camera-frame unit ray directions for every pixel -> (H, W, 3)."""
    K = rig_lib.intrinsics(cfg)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    us = jnp.arange(cfg.width) + 0.5
    vs = jnp.arange(cfg.height) + 0.5
    x = (us[None, :] - cx) / fx
    y = (vs[:, None] - cy) / fy
    d = jnp.stack(
        [jnp.broadcast_to(x, (cfg.height, cfg.width)),
         jnp.broadcast_to(y, (cfg.height, cfg.width)),
         jnp.ones((cfg.height, cfg.width))],
        axis=-1,
    )
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def render_cameras(
    cfg: CameraConfig,
    town: TownMap,
    ego_pos,
    ego_yaw,
    veh_pose,      # (V, 6) world boxes (from box_pose_from_state)
    veh_active,
    wlk_pose,
    wlk_active,
    tl_states=None,  # (NL,) light phases; renders fixtures when given
    weather=None,    # (10,) sim.weather params; modulates light/fog/rain
    rng=None,        # PRNG key for rain noise (weather only)
):
    """-> dict rgb (N, H, W, 3) in [0,1], depth (N, H, W) meters along the
    optical axis, semantic (N, H, W) int32."""
    extra = (None, None, None)
    if tl_states is not None:
        extra = traffic_light_boxes(town, tl_states)
    cam_dirs = _pixel_rays(cfg)                            # (H, W, 3) cam frame
    c2e = jnp.asarray(rig_lib.cam_to_ego(cfg))             # (N, 4, 4)

    # ego -> world rotation
    ce, se = jnp.cos(ego_yaw), jnp.sin(ego_yaw)
    R_ego = jnp.asarray([[ce, -se, 0.0], [se, ce, 0.0], [0.0, 0.0, 1.0]])
    origin_world = jnp.concatenate([ego_pos, jnp.zeros((1,))])

    outs_rgb, outs_depth, outs_sem = [], [], []
    H, W = cfg.height, cfg.width
    for cam in range(cfg.n_cams):  # static unroll; each cam is one big batch
        R = R_ego @ c2e[cam, :3, :3]
        t = origin_world + R_ego @ c2e[cam, :3, 3]
        dirs = jnp.einsum("ij,hwj->hwi", R, cam_dirs).reshape(-1, 3)
        origins = jnp.broadcast_to(t, (H * W, 3))
        hit = cast_scene(
            town, origins, dirs, veh_pose, veh_active, wlk_pose, wlk_active,
            extra_pose=extra[0], extra_active=extra[1], extra_class=extra[2],
        )
        sem = hit["semantic"].reshape(H, W)
        rgb = PALETTE[sem] * hit["shade"].reshape(H, W)[..., None]
        # distance along the optical axis (z-depth) like UE4 depth cameras
        z_axis = R[:, 2]
        zdepth = hit["t"] * jnp.einsum("rj,j->r", dirs, z_axis)
        outs_rgb.append(rgb)
        outs_depth.append(jnp.where(hit["hit"], zdepth, 0.0).reshape(H, W))
        outs_sem.append(sem)

    rgb = jnp.stack(outs_rgb)
    depth = jnp.stack(outs_depth)
    sem = jnp.stack(outs_sem)
    if weather is not None:
        rgb = apply_weather(rgb, depth, sem, weather, rng)
    return {"rgb": rgb, "depth": depth, "semantic": sem}


def apply_weather(rgb, depth, sem, weather, rng=None):
    """Photometric weather model over the rendered frames (the UE4 renderer's
    lighting/fog/rain as analytic terms; parameters per sim/weather.py).

    - sun altitude -> ambient brightness (night < 0 deg, evaluator:387);
    - cloudiness -> dimming + desaturation;
    - fog density/falloff -> exponential blend toward the sky color with
      optical depth along the ray (CARLA's exponential height fog, flattened);
    - precipitation -> additive noise (rain clutter) when an rng is given.
    """
    from thinktwice_tpu.sim.weather import (
        W_ALTITUDE, W_CLOUD, W_FOG_DENSITY, W_FOG_FALLOFF, W_RAIN,
    )

    alt = jnp.deg2rad(weather[W_ALTITUDE])
    sun = jnp.clip(jnp.sin(alt), 0.0, 1.0)
    brightness = 0.15 + 0.85 * sun                        # night floor 0.15
    cloud = weather[W_CLOUD] / 100.0
    brightness = brightness * (1.0 - 0.25 * cloud)
    gray = jnp.mean(rgb, axis=-1, keepdims=True)
    out = (rgb * (1.0 - 0.3 * cloud) + gray * 0.3 * cloud) * brightness

    sigma = weather[W_FOG_DENSITY] / 100.0 * 0.03 * jnp.maximum(
        weather[W_FOG_FALLOFF], 0.1
    )
    hit = (sem > 0) | (depth > 0)
    trans = jnp.where(hit, jnp.exp(-sigma * depth), 1.0)[..., None]
    fog_color = jnp.asarray([0.65, 0.66, 0.68]) * brightness
    out = out * trans + fog_color * (1.0 - trans)

    rain = weather[W_RAIN] / 100.0
    if rng is not None:
        out = out + 0.08 * rain * jax.random.normal(rng, out.shape)
    return jnp.clip(out, 0.0, 1.0)


def cameras_from_state(cfg: CameraConfig, town: TownMap, state: WorldState):
    from thinktwice_tpu.maps.town import traffic_light_states

    veh_pose = box_pose_from_state(
        state.traffic.pos, state.traffic.yaw, state.traffic.extent, VEHICLE_HEIGHT
    )
    wlk_pose = box_pose_from_state(
        state.walkers.pos, state.walkers.yaw, state.walkers.extent, WALKER_HEIGHT
    )
    return render_cameras(
        cfg, town, state.ego.pos, state.ego.yaw,
        veh_pose, state.traffic.active, wlk_pose, state.walkers.active,
        tl_states=traffic_light_states(town, state.time_s),
        weather=state.weather,
        rng=jax.random.fold_in(state.rng, state.tick),
    )
