"""SE(2)/box geometry helpers shared by sim, sensors and criteria.

Pure jnp, shape-polymorphic over leading batch dims. The world frame is the
CARLA map frame (x east, y south in UE4's left-handed convention — we keep the
raw (x, y, yaw) numbers so reference map rasters / routes load unchanged; all
formulas below are frame-agnostic).
"""

from __future__ import annotations

import jax.numpy as jnp


def wrap_angle(a):
    """Wrap to (-pi, pi]."""
    return jnp.arctan2(jnp.sin(a), jnp.cos(a))


def rot2d(yaw):
    """(...,) yaw -> (..., 2, 2) rotation matrix (world_from_local)."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def world_from_local(pos, yaw, pts_local):
    """Transform local (..., N, 2) points into world frame given pose (..., 2), (...,)."""
    R = rot2d(yaw)
    return pos[..., None, :] + jnp.einsum("...ij,...nj->...ni", R, pts_local)


def local_from_world(pos, yaw, pts_world):
    """Inverse of world_from_local."""
    R = rot2d(-yaw)
    return jnp.einsum("...ij,...nj->...ni", R, pts_world - pos[..., None, :])


def sweep_to_key(pos_sweep, yaw_sweep, pos_key, yaw_key):
    """SE(3) 4x4 mapping sweep-ego coordinates into key-ego coordinates.

    The reference's curr2key ego-motion compensation
    (carla_dataset.py:290-312, consumed by lss.py:667-687): a point fixed in
    the world expressed in the sweep frame maps to the same world point
    expressed in the key frame. x_key = R(yaw_key)^T (R(yaw_sweep) x_sweep +
    pos_sweep - pos_key); z is untouched. Broadcasts over leading dims.
    """
    dyaw = yaw_sweep - yaw_key
    c, s = jnp.cos(dyaw), jnp.sin(dyaw)
    dp = pos_sweep - pos_key                                   # world frame
    ck, sk = jnp.cos(yaw_key), jnp.sin(yaw_key)
    tx = dp[..., 0] * ck + dp[..., 1] * sk
    ty = -dp[..., 0] * sk + dp[..., 1] * ck
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, zero, tx], axis=-1),
            jnp.stack([s, c, zero, ty], axis=-1),
            jnp.stack([zero, zero, one, zero], axis=-1),
            jnp.stack([zero, zero, zero, one], axis=-1),
        ],
        axis=-2,
    )


def box_corners(pos, yaw, extent):
    """OBB corners. pos (..., 2), yaw (...,), extent (..., 2) half-sizes ->
    (..., 4, 2) counter-clockwise corners."""
    ex, ey = extent[..., 0], extent[..., 1]
    local = jnp.stack(
        [
            jnp.stack([ex, ey], axis=-1),
            jnp.stack([-ex, ey], axis=-1),
            jnp.stack([-ex, -ey], axis=-1),
            jnp.stack([ex, -ey], axis=-1),
        ],
        axis=-2,
    )
    return world_from_local(pos, yaw, local)


def obb_overlap(pos_a, yaw_a, ext_a, pos_b, yaw_b, ext_b):
    """Separating-axis OBB vs OBB intersection test.

    All args broadcastable; returns boolean (...,). Replaces the CARLA
    collision sensor (atomic_criteria.py CollisionTest) with an analytic test.
    """
    d = pos_b - pos_a  # (..., 2)

    def axes(yaw):
        c, s = jnp.cos(yaw), jnp.sin(yaw)
        ax = jnp.stack([c, s], axis=-1)       # local x in world
        ay = jnp.stack([-s, c], axis=-1)      # local y in world
        return ax, ay

    axa, aya = axes(yaw_a)
    axb, ayb = axes(yaw_b)

    def sep(axis):
        # projected half-extent of each box on `axis` + center distance test
        ra = jnp.abs(jnp.sum(axa * axis, -1)) * ext_a[..., 0] + jnp.abs(
            jnp.sum(aya * axis, -1)
        ) * ext_a[..., 1]
        rb = jnp.abs(jnp.sum(axb * axis, -1)) * ext_b[..., 0] + jnp.abs(
            jnp.sum(ayb * axis, -1)
        ) * ext_b[..., 1]
        return jnp.abs(jnp.sum(d * axis, -1)) > ra + rb

    separated = sep(axa) | sep(aya) | sep(axb) | sep(ayb)
    return ~separated


def point_in_obb(pts, pos, yaw, extent):
    """pts (..., N, 2) vs one box per batch element -> bool (..., N)."""
    local = local_from_world(pos, yaw, pts)
    return (jnp.abs(local[..., 0]) <= extent[..., None, 0]) & (
        jnp.abs(local[..., 1]) <= extent[..., None, 1]
    )


def segment_distance(p, a, b):
    """Distance from points p (..., 2) to segments (a, b) (..., 2)."""
    ab = b - a
    t = jnp.sum((p - a) * ab, -1) / jnp.maximum(jnp.sum(ab * ab, -1), 1e-9)
    t = jnp.clip(t, 0.0, 1.0)
    proj = a + t[..., None] * ab
    return jnp.linalg.norm(p - proj, axis=-1)


def segments_intersect(p1, p2, q1, q2):
    """Proper segment intersection test (used for stop-line crossing, mirroring
    RunningRedLightTest's line-crossing check in atomic_criteria.py:1696-1882)."""

    def cross(o, a, b):
        return (a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1]) - (
            a[..., 1] - o[..., 1]
        ) * (b[..., 0] - o[..., 0])

    d1 = cross(q1, q2, p1)
    d2 = cross(q1, q2, p2)
    d3 = cross(p1, p2, q1)
    d4 = cross(p1, p2, q2)
    return ((d1 * d2) < 0) & ((d3 * d4) < 0)
