"""Bicycle model golden tests: jnp implementation vs a straight-line numpy
re-derivation of the reference EgoModel arithmetic
(leaderboard/team_code/thinktwice_agent.py:92-130)."""

import math

import jax.numpy as jnp
import numpy as np

from thinktwice_tpu.config import SimConfig
from thinktwice_tpu.sim.dynamics import bicycle_step, point_mass_step

CFG = SimConfig()


def ref_ego_model(locs, yaw, spd, steer, throt, brake, dt):
    """Reference arithmetic, scalar numpy."""
    front_wb, rear_wb = -0.090769015, 1.4178275
    steer_gain, brake_accel, throt_accel = 0.36848336, -4.952399, 0.5633837
    accel = brake_accel if brake else throt_accel * throt
    wheel = steer_gain * steer
    beta = math.atan(rear_wb / (front_wb + rear_wb) * math.tan(wheel))
    nx = locs[0] + spd * math.cos(yaw + beta) * dt
    ny = locs[1] + spd * math.sin(yaw + beta) * dt
    nyaw = yaw + spd / rear_wb * math.sin(beta) * dt
    nspd = max(spd + accel * dt, 0.0)
    return (nx, ny), nyaw, nspd


def test_bicycle_matches_reference_arithmetic():
    cases = [
        ((0.0, 0.0), 0.0, 5.0, 0.3, 0.8, 0.0),
        ((10.0, -4.0), 1.2, 2.0, -0.5, 0.0, 1.0),
        ((1.0, 1.0), -2.0, 0.0, 0.0, 1.0, 0.0),
        ((0.0, 0.0), 3.0, 8.0, 1.0, 0.5, 0.0),
    ]
    for locs, yaw, spd, steer, throt, brake in cases:
        (rx, ry), ryaw, rspd = ref_ego_model(locs, yaw, spd, steer, throt, brake, CFG.dt)
        pos, nyaw, nspd = bicycle_step(
            CFG,
            jnp.asarray(locs),
            jnp.asarray(yaw),
            jnp.asarray(spd),
            jnp.asarray(steer),
            jnp.asarray(throt),
            jnp.asarray(brake),
            drag=0.0,
        )
        np.testing.assert_allclose(np.asarray(pos), [rx, ry], rtol=1e-5)
        # our yaw is wrapped; compare via sin/cos
        np.testing.assert_allclose(
            [np.sin(float(nyaw)), np.cos(float(nyaw))],
            [np.sin(ryaw), np.cos(ryaw)],
            atol=1e-5,
        )
        np.testing.assert_allclose(float(nspd), rspd, rtol=1e-5)


def test_bicycle_batched():
    n = 7
    pos = jnp.zeros((n, 2))
    yaw = jnp.linspace(0, 1, n)
    spd = jnp.full((n,), 3.0)
    p, y, s = bicycle_step(
        CFG, pos, yaw, spd, jnp.zeros(n), jnp.ones(n), jnp.zeros(n), drag=0.0
    )
    assert p.shape == (n, 2) and y.shape == (n,) and s.shape == (n,)
    assert np.all(np.asarray(s) > 3.0)


def test_speed_never_negative():
    _, _, s = bicycle_step(
        CFG,
        jnp.zeros(2),
        jnp.zeros(()),
        jnp.asarray(0.1),
        jnp.zeros(()),
        jnp.zeros(()),
        jnp.ones(()),
        drag=0.0,
    )
    assert float(s) == 0.0


def test_drag_limits_top_speed():
    import jax

    def body(_, carry):
        pos, yaw, spd = carry
        return bicycle_step(
            CFG, pos, yaw, spd, jnp.zeros(()), jnp.ones(()), jnp.zeros(()),
            drag=CFG.drag,
        )

    @jax.jit
    def run():
        return jax.lax.fori_loop(
            0, 4000, body, (jnp.zeros(2), jnp.zeros(()), jnp.asarray(0.0))
        )

    _, _, spd = run()
    v = float(spd)
    assert 20.0 < v < 30.0  # ~ throt_accel / drag


def test_point_mass():
    p, y, s = point_mass_step(
        jnp.zeros(2), jnp.zeros(()), jnp.asarray(2.0), jnp.asarray(0.0),
        jnp.asarray(0.0), 0.5
    )
    np.testing.assert_allclose(np.asarray(p), [1.0, 0.0], atol=1e-6)
