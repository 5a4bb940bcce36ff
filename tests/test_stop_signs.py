"""RunningStopTest criteria: stop-sign zone state machine."""

import jax
import jax.numpy as jnp
import numpy as np

from thinktwice_tpu.sim.reset import reset_world
from thinktwice_tpu.sim.step import step_world

JIT_STEP = jax.jit(step_world, static_argnums=0)


def route_through_stop(town, n=256):
    """Eastbound along the perimeter's bottom road through the stop sign at
    the (0,0) corner approach (stop at (-9.5, -1.75), heading +x)."""
    xs = np.linspace(-30.0, 60.0, n)
    return jnp.asarray(
        np.stack([xs, np.full_like(xs, -1.75), np.zeros_like(xs)], 1), jnp.float32
    )


def test_blowing_through_stop_scores_infraction(small_cfg, town):
    assert int(np.asarray(town.stop_valid).sum()) >= 4
    st = reset_world(small_cfg, town, route_through_stop(town), jax.random.key(0))
    for _ in range(500):
        st, ev = JIT_STEP(small_cfg, town, st, jnp.asarray([0.0, 1.0, 0.0]))
    assert int(st.criteria.n_stop_sign) >= 1


def test_stopping_clears_the_zone(small_cfg, town):
    st = reset_world(small_cfg, town, route_through_stop(town), jax.random.key(0))
    # drive toward the zone, then stop inside it, then continue
    for _ in range(280):
        st, _ = JIT_STEP(small_cfg, town, st, jnp.asarray([0.0, 0.6, 0.0]))
        if bool(st.criteria.stop_in_zone.any()):
            break
    assert bool(st.criteria.stop_in_zone.any()), float(st.ego.pos[0])
    for _ in range(60):  # full brake to standstill inside the zone
        st, _ = JIT_STEP(small_cfg, town, st, jnp.asarray([0.0, 0.0, 1.0]))
    assert float(st.ego.speed) < 0.05
    for _ in range(400):
        st, _ = JIT_STEP(small_cfg, town, st, jnp.asarray([0.0, 1.0, 0.0]))
    assert int(st.criteria.n_stop_sign) == 0


def test_unreachable_lateral_sign_does_not_bind_autopilot(small_cfg, town):
    """red_sign_caps lateral bound: an aligned sign ~4.5 m off-axis with
    |ahead| < 1.5 must not pin v_sign to 0 — its Euclidean-4 m criteria zone
    is unreachable from the ego's lane, so stop_has_stopped could never
    latch and the ego would park forever (Longest6 Town03 r15 stall)."""
    import dataclasses

    from thinktwice_tpu.agents.autopilot import red_sign_caps

    st = reset_world(small_cfg, town, route_through_stop(town), jax.random.key(0))
    sp = np.asarray(town.stop_pos)
    sv = np.asarray(town.stop_valid)
    k = int(np.argmax(sv))
    # park the ego beside sign k: same heading as the sign, 4.5 m lateral,
    # 0.5 m before it longitudinally
    syaw = float(np.asarray(town.stop_yaw)[k])
    fwd = np.array([np.cos(syaw), np.sin(syaw)])
    left = np.array([-fwd[1], fwd[0]])
    ego_pos = sp[k] - 0.5 * fwd + 4.5 * left
    ego = dataclasses.replace(
        st.ego,
        pos=jnp.asarray(ego_pos, jnp.float32),
        yaw=jnp.asarray(syaw, jnp.float32),
        speed=jnp.asarray(0.0, jnp.float32),
    )
    st = dataclasses.replace(st, ego=ego)
    _, _, v_sign, _ = red_sign_caps(small_cfg, town, st)
    assert float(v_sign) > 1.0, float(v_sign)  # not pinned by the far sign

    # control: directly upstream of the sign (in lane), it DOES bind
    ego2 = dataclasses.replace(
        st.ego, pos=jnp.asarray(sp[k] - 6.0 * fwd + 1.5 * left, jnp.float32)
    )
    st2 = dataclasses.replace(st, ego=ego2)
    _, _, v_sign2, _ = red_sign_caps(small_cfg, town, st2)
    assert float(v_sign2) < 6.0, float(v_sign2)
