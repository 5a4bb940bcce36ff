"""Birdview raster tests: geometry conventions match the Roach ObsManager
(ego 40 px from bottom, heading up, 5 px/m, channel layout/values)."""

import jax
import jax.numpy as jnp
import numpy as np

from thinktwice_tpu.sensors.birdview import birdview_from_state, render_birdview
from thinktwice_tpu.sim.reset import reset_world
from thinktwice_tpu.sim.step import step_world

JIT_STEP = jax.jit(step_world, static_argnums=0)


def straight_route(x0=10.0, y=-1.75, length=150.0, n=256):
    xs = np.linspace(x0, x0 + length, n)
    r = np.stack([xs, np.full_like(xs, y), np.zeros_like(xs)], axis=1)
    return jnp.asarray(r, jnp.float32)


def render(small_cfg, town, st):
    return np.asarray(
        jax.jit(birdview_from_state, static_argnums=0)(small_cfg.birdview, town, st)
    )


def test_channel_count_and_range(small_cfg, town):
    st = reset_world(small_cfg, town, straight_route(), jax.random.key(0))
    bv = render(small_cfg, town, st)
    assert bv.shape == (small_cfg.birdview.n_channels, 192, 192)
    assert bv.min() >= 0.0 and bv.max() <= 1.0


def test_road_under_ego(small_cfg, town):
    st = reset_world(small_cfg, town, straight_route(), jax.random.key(0))
    bv = render(small_cfg, town, st)
    # ego pixel: row H - pixels_ev_to_bottom, middle column
    r = 192 - small_cfg.birdview.pixels_ev_to_bottom
    c = 96
    assert bv[0, r, c] > 0.5          # road under ego
    assert bv[1, r, c] > 0.5          # route passes through ego
    # top rows ahead on the road lane too (route straight ahead)
    assert bv[0, 30, c] > 0.5


def test_route_channel_orientation(small_cfg, town):
    # route heads +x; ego yaw 0 -> route renders as a vertical stripe up the
    # middle, not horizontal
    st = reset_world(small_cfg, town, straight_route(), jax.random.key(0))
    bv = render(small_cfg, town, st)
    col_band = bv[1, :, 90:102].sum()
    row_band = bv[1, 148:156, :].sum()
    assert col_band > row_band


def test_vehicle_history_channels(small_cfg, town):
    import dataclasses

    st = reset_world(small_cfg, town, straight_route(), jax.random.key(0))
    tr = st.traffic
    # park a car 10 m ahead of ego
    tr = dataclasses.replace(
        tr,
        pos=tr.pos.at[0].set(st.ego.pos + jnp.asarray([10.0, 0.0])),
        yaw=tr.yaw.at[0].set(0.0),
        speed=tr.speed.at[0].set(0.0),
        active=tr.active.at[0].set(True),
    )
    st = dataclasses.replace(st, traffic=tr)
    # tick a few times so history fills
    for _ in range(3):
        st, _ = JIT_STEP(small_cfg, town, st, jnp.zeros(3))
    bv = render(small_cfg, town, st)
    # latest vehicle channel (idx -1 -> channel 6) has the car ~10 m ahead
    # = 50 px above ego row
    r = 192 - small_cfg.birdview.pixels_ev_to_bottom - 50
    assert bv[6, r, 96] > 0.5
    # ego itself is NOT rendered in vehicle channels
    r_ego = 192 - small_cfg.birdview.pixels_ev_to_bottom
    assert bv[6, r_ego, 96] < 0.5


def test_tl_channel_values(small_cfg, town):
    # eastbound lane of the y=100 road is y=98.25; interior junction at
    # (100, 100) has its eastbound stop point at x=94.5 -> start 20 m short
    st = reset_world(
        small_cfg, town,
        straight_route(x0=74.0, y=98.25, length=120.0), jax.random.key(0)
    )
    for _ in range(2):
        st, _ = JIT_STEP(small_cfg, town, st, jnp.zeros(3))
    bv = render(small_cfg, town, st)
    tl_latest = bv[11 + 3]  # last history idx -> channel 14
    vals = set(np.round(np.unique(tl_latest).astype(np.float64), 3))
    # only the legal palette appears: 0, 80/255, 170/255, 255/255
    legal = {0.0, round(80 / 255, 3), round(170 / 255, 3), 1.0}
    assert vals <= legal
    # the route crosses the interior junction at (100, 100): some stop line
    # should be visible ahead
    assert tl_latest.sum() > 0


def test_vmap_over_worlds(small_cfg, town):
    routes = jnp.stack([straight_route(), straight_route(y=1.75)])
    keys = jax.random.split(jax.random.key(0), 2)
    sts = jax.vmap(lambda r, k: reset_world(small_cfg, town, r, k))(routes, keys)
    bvs = jax.jit(
        jax.vmap(lambda s: birdview_from_state(small_cfg.birdview, town, s))
    )(sts)
    assert bvs.shape == (2, small_cfg.birdview.n_channels, 192, 192)


def test_segment_cull_equivalence():
    """The distance cull must not change the rendered mask: a big random
    segment table (> CULL_K rows) where < CULL_K rows are within reach must
    rasterize identically culled and unculled."""
    from thinktwice_tpu.sensors.birdview import (
        _cull_segments,
        _segments_mask,
        CULL_K,
    )

    rng = np.random.default_rng(0)
    n = CULL_K * 3
    # ~600 segments near the origin, the rest far away
    near = rng.uniform(-40, 40, size=(600, 2))
    far = rng.uniform(500, 900, size=(n - 600, 2))
    a = np.concatenate([near, far]).astype(np.float32)
    b = a + rng.uniform(-8, 8, size=a.shape).astype(np.float32)
    hw = rng.uniform(0.2, 2.0, size=n).astype(np.float32)
    segs = jnp.asarray(np.concatenate([a, b, hw[:, None]], axis=1))
    valid = jnp.asarray(rng.random(n) < 0.9)

    pts = jnp.asarray(rng.uniform(-38, 38, size=(512, 2)).astype(np.float32))
    full = _segments_mask(pts, segs[:, 0:2], segs[:, 2:4], valid, segs[:, 4])
    csegs, cvalid = _cull_segments(segs, valid, jnp.zeros(2), 60.0)
    culled = _segments_mask(
        pts, csegs[:, 0:2], csegs[:, 2:4], cvalid, csegs[:, 4]
    )
    assert csegs.shape[0] == CULL_K
    np.testing.assert_array_equal(np.asarray(full), np.asarray(culled))
