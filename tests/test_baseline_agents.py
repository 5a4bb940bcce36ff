"""Baseline harness agents (SURVEY H10): npc_control / dummy_control."""

import numpy as np

from thinktwice_tpu.agents.baseline import dummy_control, npc_control
from thinktwice_tpu.harness.evaluator import evaluate_routes


def straight_route(y, length=60.0, n=128):
    xs = np.linspace(8.0, 8.0 + length, n)
    return np.stack([xs, np.full_like(xs, y), np.zeros_like(xs)], axis=1)


def test_npc_agent_completes_empty_route(small_cfg, town, tmp_path):
    g = evaluate_routes(
        small_cfg, town, [straight_route(-1.75)], ["r0"],
        policy_fn=npc_control,
        n_vehicles=0,
        worlds_per_batch=1,
        out_path=str(tmp_path / "npc.json"),
        max_steps=1500,
    )
    assert g["scores"]["score_route"] > 60.0, g


def test_dummy_agent_runs_through_harness(small_cfg, town, tmp_path):
    # the dummy agent just drives straight; the harness must still produce a
    # well-formed record (any score), like the reference's plumbing smoke
    g = evaluate_routes(
        small_cfg, town, [straight_route(-1.75)], ["r0"],
        policy_fn=dummy_control,
        n_vehicles=0,
        worlds_per_batch=1,
        out_path=str(tmp_path / "dummy.json"),
        max_steps=300,
    )
    assert 0.0 <= g["scores"]["score_composed"] <= 100.0
