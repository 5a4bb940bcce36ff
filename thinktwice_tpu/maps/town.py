"""Static per-town world description as a pytree of fixed-shape arrays.

The reference splits static world knowledge across three services:
- pre-baked H5 rasters consumed by the Roach BEV rasterizer
  (roach/obs_manager/birdview/chauffeurnet.py:64-73),
- the CARLA map API (OpenDRIVE) queried live for lane topology / routing
  (agents/navigation/global_route_planner.py),
- TrafficLightHandler's stop-line tables (roach/utils/traffic_light.py:81-199).

Here all of it is compiled offline into one `TownMap` pytree that rides into
jit: rasters as uint8 arrays, the drivable-lane network as a successor-linked
waypoint soup (fixed capacity, masked), and traffic-light / stop-sign tables
as flat arrays. Everything is static per town, so a rollout closes over it.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TownMap:
    # --- rasters (row = y pixel, col = x pixel; Roach H5 convention:
    #     px = pixels_per_meter * (world - world_offset), raster[py, px]) ---
    road: jax.Array            # (H, W) uint8 0/1
    lane_all: jax.Array        # (H, W) uint8 0/1
    lane_broken: jax.Array     # (H, W) uint8 0/1
    sidewalk: jax.Array        # (H, W) uint8 0/1
    world_offset: jax.Array    # (2,) f32 meters
    pixels_per_meter: jax.Array  # () f32

    # --- drivable lane network (traffic NPC routes) ---
    lane_pts: jax.Array        # (L, 2) f32 waypoint positions, ~2 m spacing
    lane_yaw: jax.Array        # (L,)  f32 heading at waypoint
    lane_next: jax.Array       # (L,)  i32 successor waypoint index
    lane_valid: jax.Array      # (L,)  bool

    # --- analytic road geometry (thick segments) --------------------------
    # The BEV rasterizer draws static layers from these instead of gathering
    # from the big rasters: on TPU a 28M-point gather from a 1232^2 table
    # costs ~240 ms/64 worlds while the equivalent distance-to-segment masks
    # cost ~10 ms (measured; see sensors/birdview.py). Rasters are kept for
    # point queries (criteria, ground semantics) where only a handful of
    # gathers happen per step.
    road_segs: jax.Array       # (RS, 5) x1, y1, x2, y2, half_width
    road_seg_valid: jax.Array  # (RS,) bool
    lane_segs: jax.Array       # (LS, 6) x1, y1, x2, y2, half_width, broken(0/1)
    lane_seg_valid: jax.Array  # (LS,) bool

    # --- traffic lights ---
    tl_pos: jax.Array          # (NL, 2) f32 stop point (on approach lane)
    tl_yaw: jax.Array          # (NL,)  f32 approach heading
    tl_stopline: jax.Array     # (NL, 2, 2) f32 stop-line segment endpoints
    tl_group: jax.Array        # (NL,) i32 junction group id
    tl_slot: jax.Array         # (NL,) i32 phase slot within group
    tl_nslots: jax.Array       # (NL,) i32 number of slots in this group
    tl_valid: jax.Array        # (NL,) bool

    # --- stop signs ---
    stop_pos: jax.Array        # (NS, 2)
    stop_yaw: jax.Array        # (NS,)
    stop_valid: jax.Array      # (NS,) bool

    # --- spawn points (x, y, yaw) for traffic ---
    spawn: jax.Array           # (SP, 3)
    spawn_valid: jax.Array     # (SP,) bool
    spawn_wp: jax.Array        # (SP,) i32 lane waypoint index at each spawn —
                               # lets step_world recycle a deadlocked NPC onto
                               # a spawn without an O(V x L) nearest-lane scan

    def world_to_pixel(self, xy):
        """(..., 2) world meters -> (..., 2) float pixel coords (px, py)."""
        return self.pixels_per_meter * (xy - self.world_offset)


# Traffic-light cycle constants (CARLA 0.9.10 defaults: green 10 s, yellow 3 s,
# all-red clearance 2 s; junction groups alternate which slot is green).
TL_GREEN_S = 10.0
TL_YELLOW_S = 3.0
TL_RED_CLEAR_S = 2.0
TL_SLOT_S = TL_GREEN_S + TL_YELLOW_S + TL_RED_CLEAR_S

# state encoding shared with sim: 0 = green, 1 = yellow, 2 = red
TL_GREEN, TL_YELLOW, TL_RED = 0, 1, 2


def traffic_light_states(town: TownMap, t: jax.Array) -> jax.Array:
    """Vectorized light phase at sim time t (seconds) -> (NL,) int32 states.

    Each junction group cycles through `nslots` slots of TL_SLOT_S seconds;
    a light is green for the first TL_GREEN_S of its own slot, yellow for the
    next TL_YELLOW_S, red otherwise (including the clearance interval and all
    other slots). Mirrors CARLA's grouped-light behavior that
    TrafficLightHandler observes (roach/utils/traffic_light.py).
    """
    nslots = jnp.maximum(town.tl_nslots, 1)
    cycle = nslots.astype(jnp.float32) * TL_SLOT_S
    tmod = jnp.mod(t, cycle)
    slot_now = jnp.floor(tmod / TL_SLOT_S).astype(jnp.int32)
    t_in_slot = tmod - slot_now.astype(jnp.float32) * TL_SLOT_S
    my_slot = slot_now == town.tl_slot
    state = jnp.where(
        my_slot & (t_in_slot < TL_GREEN_S),
        TL_GREEN,
        jnp.where(my_slot & (t_in_slot < TL_GREEN_S + TL_YELLOW_S), TL_YELLOW, TL_RED),
    )
    return jnp.where(town.tl_valid, state, TL_RED)


# ---------------------------------------------------------------------------
# Route densification (host-side, numpy): replaces interpolate_trajectory
# (leaderboard/leaderboard/utils/route_manipulation.py:21-160), which runs the
# GlobalRoutePlanner A* over the CARLA lane graph. Route XMLs carry posed
# keypoints (x, y, yaw), so a C1 Hermite spline through them reproduces the
# lane-following path without OpenDRIVE.
# ---------------------------------------------------------------------------

def _hermite(p0, t0, p1, t1, s):
    """Cubic Hermite between posed points. s in [0,1], shape (K,)."""
    h00 = 2 * s**3 - 3 * s**2 + 1
    h10 = s**3 - 2 * s**2 + s
    h01 = -2 * s**3 + 3 * s**2
    h11 = s**3 - s**2
    return (
        h00[:, None] * p0 + h10[:, None] * t0 + h01[:, None] * p1 + h11[:, None] * t1
    )


def interpolate_route(
    keypoints_xy: np.ndarray,
    keypoints_yaw_deg: np.ndarray,
    spacing: float = 1.0,
    max_len: int | None = None,
) -> np.ndarray:
    """Dense route from posed keypoints.

    Returns (N, 3) array of (x, y, yaw_rad) at ~`spacing` meters. If max_len
    is given, pads (repeating the final point) or truncates to exactly max_len.
    """
    kp = np.asarray(keypoints_xy, np.float64)
    yaw = np.deg2rad(np.asarray(keypoints_yaw_deg, np.float64))
    pts = []
    for i in range(len(kp) - 1):
        p0, p1 = kp[i], kp[i + 1]
        d = np.linalg.norm(p1 - p0)
        if d < 1e-6:
            continue
        # tangent magnitude = segment length gives a taut, lane-like spline
        t0 = d * np.array([np.cos(yaw[i]), np.sin(yaw[i])])
        t1 = d * np.array([np.cos(yaw[i + 1]), np.sin(yaw[i + 1])])
        n = max(int(np.ceil(d / spacing)), 1)
        s = np.arange(n) / n
        pts.append(_hermite(p0, t0, p1, t1, s))
    pts.append(kp[-1:])
    dense = np.concatenate(pts, axis=0)
    # headings from finite differences
    diffs = np.diff(dense, axis=0)
    hdg = np.arctan2(diffs[:, 1], diffs[:, 0])
    hdg = np.concatenate([hdg, hdg[-1:]])
    route = np.concatenate([dense, hdg[:, None]], axis=1).astype(np.float32)
    if max_len is not None:
        if len(route) >= max_len:
            route = route[:max_len]
        else:
            pad = np.repeat(route[-1:], max_len - len(route), axis=0)
            route = np.concatenate([route, pad], axis=0)
    return route


def densify_polyline(xy: np.ndarray, spacing: float = 2.0) -> np.ndarray:
    """Piecewise-linear resample of a polyline at ~spacing meters -> (N, 2)."""
    xy = np.asarray(xy, np.float64)
    seglen = np.linalg.norm(np.diff(xy, axis=0), axis=1)
    cum = np.concatenate([[0.0], np.cumsum(seglen)])
    total = cum[-1]
    n = max(int(np.floor(total / spacing)) + 1, 2)
    s = np.linspace(0.0, total, n)
    out = np.stack(
        [np.interp(s, cum, xy[:, 0]), np.interp(s, cum, xy[:, 1])], axis=1
    )
    return out.astype(np.float32)


def route_length(route_xyyaw: np.ndarray) -> float:
    """Polyline length in meters of an (N, >=2) route array."""
    d = np.diff(np.asarray(route_xyyaw)[:, :2], axis=0)
    return float(np.linalg.norm(d, axis=1).sum())


def pad_rows(a: np.ndarray, n: int, fill: float = 0.0) -> np.ndarray:
    """Pad/truncate the leading axis to n rows."""
    a = np.asarray(a)
    if len(a) >= n:
        return a[:n]
    pad_shape = (n - len(a),) + a.shape[1:]
    return np.concatenate([a, np.full(pad_shape, fill, a.dtype)], axis=0)
