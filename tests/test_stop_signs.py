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
