"""RunningRedLightTest + NPC light obedience on the procedural town.

The interior junction sits at (100, 100); the eastbound approach's stop line
crosses (94.5, 98.25). Eastbound lights (slot 0) are green for t in [0, 10)
and red during slot 1's window [15, 30) of each 30 s cycle.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from thinktwice_tpu.sim.reset import reset_world
from thinktwice_tpu.sim.step import step_world

JIT_STEP = jax.jit(step_world, static_argnums=0)


def eastbound_route(n=256):
    xs = np.linspace(80.0, 180.0, n)
    return jnp.asarray(
        np.stack([xs, np.full_like(xs, 98.25), np.zeros_like(xs)], 1), jnp.float32
    )


def test_running_red_light_scored(small_cfg, town):
    st = reset_world(small_cfg, town, eastbound_route(), jax.random.key(0))
    # idle through the green window, then launch into the red one
    for _ in range(300):  # 15 s
        st, _ = JIT_STEP(small_cfg, town, st, jnp.zeros(3))
    for _ in range(300):
        st, _ = JIT_STEP(small_cfg, town, st, jnp.asarray([0.0, 1.0, 0.0]))
    assert float(st.ego.pos[0]) > 95.0  # crossed the stop line
    assert int(st.criteria.n_red_light) == 1


def test_crossing_on_green_not_scored(small_cfg, town):
    st = reset_world(small_cfg, town, eastbound_route(), jax.random.key(0))
    # drive immediately: ~14.5 m to the stop line; full throttle reaches it
    # within the first green+yellow window only if fast enough — use the
    # second green window instead: wait a full cycle (30 s) then go
    for _ in range(600):
        st, _ = JIT_STEP(small_cfg, town, st, jnp.zeros(3))
    for _ in range(200):  # 10 s of green
        st, _ = JIT_STEP(small_cfg, town, st, jnp.asarray([0.0, 1.0, 0.0]))
    if float(st.ego.pos[0]) > 95.0:  # only assert if it actually crossed
        assert int(st.criteria.n_red_light) == 0


def test_npc_stops_at_red(small_cfg, town):
    # park the ego far away; spawn one NPC eastbound approaching the junction
    st = reset_world(
        small_cfg, town, eastbound_route(), jax.random.key(0)
    )
    st = dataclasses.replace(
        st,
        ego=dataclasses.replace(st.ego, pos=jnp.asarray([5.0, -300.0])),
    )
    tr = st.traffic
    from thinktwice_tpu.sim.reset import nearest_lane_idx

    npc_pos = jnp.asarray([70.0, 98.25])
    tr = dataclasses.replace(
        tr,
        pos=tr.pos.at[0].set(npc_pos),
        yaw=tr.yaw.at[0].set(0.0),
        speed=tr.speed.at[0].set(5.0),
        wp_idx=tr.wp_idx.at[0].set(nearest_lane_idx(town, npc_pos[None])[0]),
        active=tr.active.at[0].set(True),
    )
    st = dataclasses.replace(st, traffic=tr)
    # run 16 s: the light turns red at t=10 (yellow) / 13; the NPC must not
    # pass the stop line at x=94.5 while it is red
    crossed_on_red = False
    for k in range(320):
        st, _ = JIT_STEP(small_cfg, town, st, jnp.zeros(3))
        t = (k + 1) * 0.05
        x = float(st.traffic.pos[0, 0])
        if 15.0 < t < 28.0 and x > 96.0:
            crossed_on_red = True
    assert not crossed_on_red, float(st.traffic.pos[0, 0])
