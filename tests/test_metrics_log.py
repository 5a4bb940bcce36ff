"""Recorder + MetricsLog (harness/metrics_log.py — SURVEY §2.1 S8)."""

import numpy as np
import jax

from thinktwice_tpu.agents.autopilot import autopilot_control
from thinktwice_tpu.config import Config, SimConfig
from thinktwice_tpu.harness.metrics_log import (
    MetricsLog,
    distance_between,
    distance_to_route,
    load,
    record_rollout,
    save,
)
from thinktwice_tpu.maps.procedural import make_grid_town
from thinktwice_tpu.sim.reset import reset_world


def _world():
    cfg = Config(sim=SimConfig(max_vehicles=8, max_walkers=4,
                               max_route_len=256, max_scenarios=4))
    town = make_grid_town(n_blocks=2, block=100.0)
    xs = np.linspace(5.0, 120.0, 256)
    route = np.stack([xs, np.full_like(xs, 98.25), np.zeros_like(xs)], 1)
    state = reset_world(cfg, town, route.astype(np.float32),
                        jax.random.key(0), n_vehicles=6)
    return cfg, town, route, state


def test_record_and_query(tmp_path):
    cfg, town, route, state = _world()
    final, frames = record_rollout(cfg, town, state, autopilot_control,
                                   n_steps=64, every=4)
    log = MetricsLog(frames)
    F = log.get_total_frame_count()
    assert F == 16
    # elapsed time grows by every*dt between frames
    np.testing.assert_allclose(
        log.get_elapsed_time(1) - log.get_elapsed_time(0),
        4 * cfg.sim.dt, rtol=1e-5)

    # ego moved forward along +x on the straight route
    p0, _ = log.get_actor_transform(0, 0)
    p1, _ = log.get_actor_transform(0, F - 1)
    assert p1[0] > p0[0]

    # vehicle ids + per-frame queries are consistent with the arrays
    vids = log.get_actor_ids_with_type_id("vehicle.*")
    assert vids == list(range(1, cfg.sim.max_vehicles + 1))
    pv, yv = log.get_actor_transform(vids[0], 3)
    np.testing.assert_allclose(pv, frames["traffic_pos"][3, 0])

    # example metrics: shapes + route distance small for a route follower
    d = distance_between(log, 0, vids[0])
    assert d.shape == (F,)
    dr = distance_to_route(log, route[:, :2])
    assert dr.shape == (F,)
    assert float(dr.max()) < 5.0

    # save / load roundtrip
    p = tmp_path / "rollout.npz"
    save(str(p), frames)
    frames2 = load(str(p))
    np.testing.assert_allclose(frames2["ego_pos"], frames["ego_pos"])


def test_criteria_series_monotone():
    cfg, town, route, state = _world()
    _, frames = record_rollout(cfg, town, state, autopilot_control,
                               n_steps=64, every=8)
    log = MetricsLog(frames)
    comp = log.get_criterion_series("route_completion")
    assert np.all(np.diff(comp) >= -1e-6)
