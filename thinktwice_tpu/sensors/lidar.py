"""Ray-cast lidar (in-graph stand-in for CARLA's ray_cast lidar sensor,
spawned with 64 channels / 85 m range / 600k pts/s at
agent_wrapper.py:170-181 and consumed 2-sweep-merged by the agents).

Beams are a fixed (n_beams x n_azimuth) grid; a 20 Hz tick sweeps the full
azimuth circle (the reference's 10 Hz rotation produces half-scans that the
agents stitch over two ticks — roach_ap_agent:597-603, thinktwice_agent lidar
merge; here a full scan per call plus the same two-sweep ego-motion merge
utility gives the identical downstream point layout).

Points are returned in the ego frame as (N, 4): x, y, z, intensity, plus a
validity mask (fixed capacity = n_beams * n_azimuth, masked where no hit
within range)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from thinktwice_tpu.config import LidarConfig
from thinktwice_tpu.maps.town import TownMap
from thinktwice_tpu.sensors.raycast import (
    VEHICLE_HEIGHT,
    WALKER_HEIGHT,
    box_pose_from_state,
    cast_scene,
)
from thinktwice_tpu.sim.state import WorldState


def _beam_dirs(cfg: LidarConfig):
    """(B*A, 3) unit directions in the ego frame (x fwd, z up)."""
    elev = jnp.deg2rad(
        jnp.linspace(cfg.upper_fov, cfg.lower_fov, cfg.n_beams)
    )
    azim = jnp.linspace(0.0, 2 * jnp.pi, cfg.n_azimuth, endpoint=False)
    ce, se = jnp.cos(elev)[:, None], jnp.sin(elev)[:, None]
    ca, sa = jnp.cos(azim)[None, :], jnp.sin(azim)[None, :]
    d = jnp.stack(
        [
            jnp.broadcast_to(ce * ca, (cfg.n_beams, cfg.n_azimuth)),
            jnp.broadcast_to(ce * sa, (cfg.n_beams, cfg.n_azimuth)),
            jnp.broadcast_to(se, (cfg.n_beams, cfg.n_azimuth)),
        ],
        axis=-1,
    )
    return d.reshape(-1, 3)


def render_lidar(
    cfg: LidarConfig,
    town: TownMap,
    ego_pos,
    ego_yaw,
    veh_pose,
    veh_active,
    wlk_pose,
    wlk_active,
):
    """-> (points (R, 4) ego frame, mask (R,))."""
    dirs_ego = _beam_dirs(cfg)
    c, s = jnp.cos(ego_yaw), jnp.sin(ego_yaw)
    R = jnp.asarray([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    dirs = dirs_ego @ R.T
    origin = jnp.concatenate([ego_pos, jnp.asarray([cfg.z_mount])])
    origins = jnp.broadcast_to(origin, (dirs.shape[0], 3))

    hit = cast_scene(town, origins, dirs, veh_pose, veh_active, wlk_pose, wlk_active)
    t = hit["t"]
    valid = hit["hit"] & (t > 0.5) & (t < cfg.max_range)
    pts_ego = dirs_ego * t[:, None]
    pts_ego = pts_ego + jnp.asarray([0.0, 0.0, cfg.z_mount])
    intensity = jnp.clip(1.0 - t / cfg.max_range, 0.0, 1.0)
    points = jnp.concatenate([pts_ego, intensity[:, None]], axis=-1)
    return jnp.where(valid[:, None], points, 0.0), valid


def lidar_from_state(cfg: LidarConfig, town: TownMap, state: WorldState):
    veh_pose = box_pose_from_state(
        state.traffic.pos, state.traffic.yaw, state.traffic.extent, VEHICLE_HEIGHT
    )
    wlk_pose = box_pose_from_state(
        state.walkers.pos, state.walkers.yaw, state.walkers.extent, WALKER_HEIGHT
    )
    points, mask = render_lidar(
        cfg, town, state.ego.pos, state.ego.yaw,
        veh_pose, state.traffic.active, wlk_pose, state.walkers.active,
    )
    # weather: rain drops returns (clutter absorbs beams), wetness jitters
    # ranges — the real sensor's behavior CARLA models with its
    # atmosphere_attenuation_rate/dropoff params
    from thinktwice_tpu.sim.weather import W_RAIN, W_WETNESS

    rain = state.weather[W_RAIN] / 100.0
    wet = state.weather[W_WETNESS] / 100.0
    rng = jax.random.fold_in(state.rng, state.tick + 7919)
    k1, k2 = jax.random.split(rng)
    keep = jax.random.uniform(k1, mask.shape) > 0.25 * rain
    mask = mask & keep
    jitter = 0.03 * wet * jax.random.normal(k2, points[:, :3].shape)
    points = points.at[:, :3].add(jnp.where(mask[:, None], jitter, 0.0))
    return jnp.where(mask[:, None], points, 0.0), mask


def merge_sweeps(points_now, mask_now, points_prev, mask_prev,
                 ego_now, ego_prev):
    """Two-sweep merge with ego-motion compensation + timestamp channel
    (union2one multi-sweep concat, carla_dataset.py:314-328): the previous
    sweep's points are re-expressed in the current ego frame and tagged with
    dt=1 in the 5th feature."""
    pos_now, yaw_now = ego_now
    pos_prev, yaw_prev = ego_prev
    cp, sp = jnp.cos(yaw_prev), jnp.sin(yaw_prev)
    cn, sn = jnp.cos(-yaw_now), jnp.sin(-yaw_now)
    # prev ego -> world
    xw = points_prev[:, 0] * cp - points_prev[:, 1] * sp + pos_prev[0]
    yw = points_prev[:, 0] * sp + points_prev[:, 1] * cp + pos_prev[1]
    # world -> now ego
    dx, dy = xw - pos_now[0], yw - pos_now[1]
    xn = dx * cn - dy * sn
    yn = dx * sn + dy * cn
    prev_in_now = jnp.stack(
        [xn, yn, points_prev[:, 2], points_prev[:, 3]], axis=-1
    )
    now5 = jnp.concatenate(
        [points_now, jnp.zeros((points_now.shape[0], 1))], axis=-1
    )
    prev5 = jnp.concatenate(
        [prev_in_now, jnp.ones((prev_in_now.shape[0], 1))], axis=-1
    )
    points = jnp.concatenate([now5, prev5], axis=0)
    mask = jnp.concatenate([mask_now, mask_prev], axis=0)
    return jnp.where(mask[:, None], points, 0.0), mask
