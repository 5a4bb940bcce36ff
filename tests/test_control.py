"""PID + ThinkTwice control-path tests (control_pid / fusion rules)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from thinktwice_tpu.agents.pid import pid_init, pid_step
from thinktwice_tpu.agents.thinktwice import (
    agent_init,
    control_pid,
    fuse_controls,
    process_action,
)


def test_pid_proportional_only_first_step():
    st = pid_init(4)
    out, st = pid_step(st, jnp.asarray(1.0), kp=2.0, ki=1.0, kd=1.0)
    # first step: no integral/derivative (window not filled)
    np.testing.assert_allclose(float(out), 2.0)


def test_pid_integral_and_derivative():
    st = pid_init(4)
    _, st = pid_step(st, jnp.asarray(1.0), 0.0, 1.0, 0.0)
    out_i, st2 = pid_step(st, jnp.asarray(1.0), 0.0, 1.0, 0.0)
    np.testing.assert_allclose(float(out_i), 1.0)  # mean of [1, 1]
    st = pid_init(4)
    _, st = pid_step(st, jnp.asarray(1.0), 0.0, 0.0, 1.0)
    out_d, _ = pid_step(st, jnp.asarray(3.0), 0.0, 0.0, 1.0)
    np.testing.assert_allclose(float(out_d), 2.0)  # 3 - 1


def test_process_action_throttle_and_brake():
    # alpha >> beta on acc dim -> mode near 1 -> throttle
    s, t, b = process_action(jnp.asarray([5.0, 2.0]), jnp.asarray([1.5, 2.0]))
    assert float(t) > 0.5 and float(b) == 0.0
    # beta >> alpha -> mode near 0 -> full brake after rescale
    s, t, b = process_action(jnp.asarray([1.2, 2.0]), jnp.asarray([6.0, 2.0]))
    assert float(b) > 0.5 and float(t) == 0.0


def test_control_pid_straight_line():
    agent = agent_init()
    wps = jnp.asarray([[1.2, 0.0], [2.4, 0.0], [3.6, 0.0], [4.8, 0.0]])
    steer, throttle, brake, v_des, agent = control_pid(
        agent, wps, jnp.asarray(1.0), jnp.asarray([10.0, 0.0])
    )
    np.testing.assert_allclose(float(steer), 0.0, atol=1e-5)
    assert not bool(brake)
    assert float(throttle) > 0.0
    np.testing.assert_allclose(float(v_des), 2.4, atol=1e-5)


def test_control_pid_brake_when_target_speed_low():
    agent = agent_init()
    wps = jnp.asarray([[0.05, 0.0], [0.1, 0.0], [0.15, 0.0], [0.2, 0.0]])
    _, throttle, brake, v_des, _ = control_pid(
        agent, wps, jnp.asarray(3.0), jnp.asarray([10.0, 0.0])
    )
    assert bool(brake)  # desired speed 0.1 < BRAKE_SPEED and overspeed
    assert float(throttle) == 0.0


def test_control_pid_turn_steers_toward_waypoints():
    agent = agent_init()
    wps = jnp.asarray([[1.0, 1.0], [2.0, 2.0], [3.0, 3.0], [4.0, 4.0]])
    steer, _, _, _, _ = control_pid(
        agent, wps, jnp.asarray(2.0), jnp.asarray([3.0, 3.0])
    )
    assert float(steer) > 0.1  # positive y = right in our frame


def test_fusion_brake_dominates():
    agent = agent_init()
    ctrl, agent = fuse_controls(
        agent,
        jnp.asarray(0.0), jnp.asarray(0.8), jnp.asarray(0.5),  # net brakes 0.5
        jnp.asarray(0.0), jnp.asarray(0.7), jnp.asarray(False),
        jnp.asarray(2.0), jnp.asarray(False),
    )
    assert float(ctrl[2]) == 1.0  # brake wins


def test_fusion_speed_clamp():
    agent = agent_init()
    ctrl, _ = fuse_controls(
        agent,
        jnp.asarray(0.0), jnp.asarray(1.0), jnp.asarray(0.0),
        jnp.asarray(0.0), jnp.asarray(1.0), jnp.asarray(False),
        jnp.asarray(5.0), jnp.asarray(False),  # above 3.55 straight limit
    )
    assert float(ctrl[1]) == 0.0


def test_fusion_creep_after_stuck():
    agent = agent_init()
    ctrl = None
    for _ in range(25):
        ctrl, agent = fuse_controls(
            agent,
            jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(0.0),
            jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(True),
            jnp.asarray(0.0), jnp.asarray(False),
        )
    # after CREEP_STUCK_TICKS of standstill, creep throttle engages
    assert float(ctrl[1]) > 0.3
    assert float(ctrl[2]) == 0.0
