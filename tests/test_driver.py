"""Closed-loop ThinkTwice driver: model-in-the-loop rollout (Config-3 smoke,
tiny model — validates the full sense->plan->act->step graph compiles and
produces sane controls)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thinktwice_tpu.agents.thinktwice_driver import (
    driver_init,
    make_thinktwice_driver,
)
from thinktwice_tpu.sim.reset import reset_world
from thinktwice_tpu.sim.step import step_world
from thinktwice_tpu.train.loop import init_model_params, make_model
from tests.test_pipeline import TINY, straight_route


@pytest.fixture(scope="module")
def driver_setup():
    model = make_model(TINY, backbone_depth=10)
    n_rays = TINY.lidar.n_beams * TINY.lidar.n_azimuth
    params = init_model_params(TINY, model, jax.random.key(0), n_points=n_rays)
    return model, params


def test_driver_step(town, driver_setup):
    model, params = driver_setup
    st = reset_world(TINY, town, straight_route(), jax.random.key(0))
    policy = make_thinktwice_driver(TINY, model, params)

    @jax.jit
    def one(st, drv):
        ctrl, drv = policy(TINY, town, st, drv)
        st2, _ = step_world(TINY, town, st, ctrl)
        return st2, drv, ctrl

    drv = driver_init()
    for _ in range(3):
        st, drv, ctrl = one(st, drv)
    c = np.asarray(ctrl)
    assert c.shape == (3,)
    assert -1.0 <= c[0] <= 1.0 and 0.0 <= c[1] <= 1.0 and 0.0 <= c[2] <= 1.0
    assert np.isfinite(np.asarray(st.ego.pos)).all()


def test_driver_two_sweep_history(town, driver_setup):
    """2-sweep driver: ring buffer carries the 0.5 s-old frame (VERDICT r1
    #5 — the reference's 31-frame queue at thinktwice_agent.py:425-444)."""
    model = make_model(TINY, backbone_depth=10, n_sweeps=2)
    n_rays = TINY.lidar.n_beams * TINY.lidar.n_azimuth
    params = init_model_params(
        TINY, model, jax.random.key(0), n_points=2 * n_rays
    )
    st = reset_world(TINY, town, straight_route(), jax.random.key(0))
    policy = make_thinktwice_driver(TINY, model, params)

    @jax.jit
    def one(st, drv):
        ctrl, drv = policy(TINY, town, st, drv)
        st2, _ = step_world(TINY, town, st, ctrl)
        return st2, drv, ctrl

    from thinktwice_tpu.agents.thinktwice_driver import HIST_TICKS

    drv = driver_init(TINY, n_sweeps=2)
    poses = []
    for _ in range(HIST_TICKS + 2):
        poses.append(np.asarray(st.ego.pos))
        st, drv, ctrl = one(st, drv)
    assert int(drv.tick) == HIST_TICKS + 2
    # after warmup the ring slot about to be overwritten holds the frame
    # from exactly HIST_TICKS ago
    slot = int(drv.tick) % HIST_TICKS
    np.testing.assert_allclose(
        np.asarray(drv.pos_ring[0][slot]),
        poses[int(drv.tick) - HIST_TICKS],
        atol=1e-5,
    )
    c = np.asarray(ctrl)
    assert np.isfinite(c).all()


def test_driver_rollout_scan(town, driver_setup):
    from thinktwice_tpu.agents.thinktwice_driver import rollout_thinktwice

    model, params = driver_setup
    st = reset_world(TINY, town, straight_route(), jax.random.key(1))
    final = jax.jit(
        rollout_thinktwice, static_argnums=(0, 2, 5)
    )(TINY, town, model, params, st, 10)
    assert int(final.tick) == 10
    assert np.isfinite(np.asarray(final.ego.pos)).all()


def test_evaluate_routes_stateful_driver(town, driver_setup, tmp_path):
    """The student eval path: evaluate_routes with a stateful policy carry
    (scripts/eval_town05.py --agent student). Exercises carry batching,
    per-segment threading, and the leaderboard document end-to-end."""
    from thinktwice_tpu.harness.evaluator import evaluate_routes

    model, params = driver_setup
    policy = make_thinktwice_driver(TINY, model, params)

    def policy_fn(cfg_, town_, state, carry):
        return policy(cfg_, town_, state, carry)

    out = str(tmp_path / "student_eval.json")
    r = np.asarray(straight_route())
    g = evaluate_routes(
        TINY, town, [r, r], ["r0", "r1"],
        policy_fn=policy_fn,
        policy_init=lambda: driver_init(TINY, model.n_sweeps),
        n_vehicles=2,
        worlds_per_batch=2,
        segment_steps=64,
        max_steps=128,
        out_path=out,
    )
    assert 0.0 <= g["scores"]["score_composed"] <= 100.0
    import json

    doc = json.load(open(out))
    assert len(doc["_checkpoint"]["records"]) == 2
    # per-route game durations are real tick counts, not the scan horizon
    for rec in doc["_checkpoint"]["records"]:
        assert 0.0 < rec["meta"]["duration_game"] <= 128 * 0.05 + 1e-6
