import jax.numpy as jnp
import numpy as np

from thinktwice_tpu.geometry import (
    box_corners,
    obb_overlap,
    point_in_obb,
    segment_distance,
    segments_intersect,
    wrap_angle,
)


def test_wrap_angle():
    # 3*pi wraps to +/-pi (sign is numerical noise at the branch point)
    assert np.isclose(abs(float(wrap_angle(jnp.asarray(3 * np.pi)))), np.pi)
    assert np.isclose(abs(float(wrap_angle(jnp.asarray(-3 * np.pi)))), np.pi)
    assert np.isclose(float(wrap_angle(jnp.asarray(0.3))), 0.3)
    assert np.isclose(float(wrap_angle(jnp.asarray(np.pi + 0.1))), -np.pi + 0.1)


def test_box_corners_axis_aligned():
    c = box_corners(jnp.zeros(2), jnp.zeros(()), jnp.asarray([2.0, 1.0]))
    got = {tuple(np.round(np.asarray(p), 5)) for p in c}
    assert got == {(2.0, 1.0), (-2.0, 1.0), (-2.0, -1.0), (2.0, -1.0)}


def test_obb_overlap_cases():
    z = jnp.zeros(())
    e = jnp.asarray([1.0, 1.0])
    # identical boxes overlap
    assert bool(obb_overlap(jnp.zeros(2), z, e, jnp.zeros(2), z, e))
    # far apart
    assert not bool(obb_overlap(jnp.zeros(2), z, e, jnp.asarray([5.0, 0.0]), z, e))
    # touching edge-to-edge within numerical contact
    assert bool(obb_overlap(jnp.zeros(2), z, e, jnp.asarray([1.9, 0.0]), z, e))
    # rotated 45deg box close to corner: diagonal reach sqrt(2)
    yaw45 = jnp.asarray(np.pi / 4)
    assert bool(
        obb_overlap(jnp.zeros(2), z, e, jnp.asarray([2.3, 0.0]), yaw45, e)
    )
    assert not bool(
        obb_overlap(jnp.zeros(2), z, e, jnp.asarray([2.5, 0.0]), yaw45, e)
    )


def test_point_in_obb_rotated():
    pts = jnp.asarray([[1.4, 1.4], [2.5, 0.0], [0.0, 0.0]])
    # box rotated 45 deg with half-extent (2, 0.5): local x axis along diagonal
    inside = point_in_obb(
        pts, jnp.zeros(2), jnp.asarray(np.pi / 4), jnp.asarray([2.0, 0.5])
    )
    assert bool(inside[0])       # on the diagonal
    assert not bool(inside[1])   # off-axis
    assert bool(inside[2])       # center


def test_segment_distance():
    d = segment_distance(
        jnp.asarray([0.0, 1.0]), jnp.asarray([-1.0, 0.0]), jnp.asarray([1.0, 0.0])
    )
    assert np.isclose(float(d), 1.0)
    # beyond endpoint
    d2 = segment_distance(
        jnp.asarray([3.0, 0.0]), jnp.asarray([-1.0, 0.0]), jnp.asarray([1.0, 0.0])
    )
    assert np.isclose(float(d2), 2.0)


def test_segments_intersect():
    a = segments_intersect(
        jnp.asarray([0.0, -1.0]),
        jnp.asarray([0.0, 1.0]),
        jnp.asarray([-1.0, 0.0]),
        jnp.asarray([1.0, 0.0]),
    )
    assert bool(a)
    b = segments_intersect(
        jnp.asarray([0.0, 1.0]),
        jnp.asarray([0.0, 2.0]),
        jnp.asarray([-1.0, 0.0]),
        jnp.asarray([1.0, 0.0]),
    )
    assert not bool(b)
