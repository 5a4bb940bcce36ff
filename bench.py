"""Benchmark: aggregate env-steps/sec over 64 vmapped worlds (BASELINE.json
north-star; reference bound: 20 steps/s per world, one world per GPU process).

Config-5 shape: 64 parallel worlds on the IMPORTED Town05 map (reference H5 +
real training routes), 120-vehicle background traffic, walker capacity,
adversarial scenario slots armed along each route, full criteria — driven
closed-loop by the Roach privileged expert (birdview raster -> policy net ->
control at 10 Hz like roach_ap_agent_data_collection.py:462). Falls back to
the procedural grid town when the reference assets are absent.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 1000 (the >=1000 steps/s target on v5e-8).

--profile writes a jax.profiler trace (SURVEY §5.1) to runs/profile/.
"""

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from thinktwice_tpu.jaxenv import setup as _jax_setup

_jax_setup()

from thinktwice_tpu.agents.expert import expert_control
from thinktwice_tpu.agents.roach import RoachPolicy
from thinktwice_tpu.config import Config, SimConfig
from thinktwice_tpu.harness.evaluator import build_route_scenarios
from thinktwice_tpu.harness.route_parser import ScenarioTrigger
from thinktwice_tpu.sim.reset import reset_world
from thinktwice_tpu.sim.step import step_world

N_WORLDS = 64
N_STEPS = 200           # timed ticks per world
POLICY_EVERY = 2        # 10 Hz policy at the 20 Hz tick (reference cadence)
N_VEHICLES = 120        # Town05 Long traffic amount (route_scenario.py:492)
MAX_ROUTE_LEN = 384

H5 = "/root/reference/roach/obs_manager/birdview/maps/Town05.h5"
ROUTES_XML = (
    "/root/reference/leaderboard/data/routes_for_open_loop_training/"
    "routes_town05_00.xml"
)
REPO = os.path.dirname(os.path.abspath(__file__))


def town05_world(cfg):
    """Imported Town05 + 64 real training routes + scenario slots."""
    from thinktwice_tpu.harness.route_parser import parse_routes_file
    from thinktwice_tpu.maps.compile_h5 import compile_town

    from thinktwice_tpu.maps.router import raster_planner

    specs = parse_routes_file(ROUTES_XML)
    planner = raster_planner(H5)
    routes = []
    for s in specs:
        raw = s.dense(spacing=1.0, planner=planner)
        length = float(np.linalg.norm(np.diff(raw[:, :2], axis=0), axis=1).sum())
        if length < 100.0 or length > MAX_ROUTE_LEN - 10:
            continue
        routes.append(s.dense(spacing=1.0, max_len=MAX_ROUTE_LEN, planner=planner))
        if len(routes) >= N_WORLDS:
            break
    from thinktwice_tpu.maps.cache import town05_cached

    # honest world: raised caps match scripts/eval_town05.py; strict=True
    # fails loudly instead of silently truncating ~12% of segments
    # (VERDICT r2 weak #3)
    town = town05_cached(H5, [ROUTES_XML], max_lane_pts=49152,
                         max_road_segs=8192, max_lane_segs=8192, strict=True)
    scens = []
    for r in routes:
        n = len(r)
        trigs = [
            ScenarioTrigger("Scenario3", r[n // 3, :2].astype(np.float64),
                            np.rad2deg(r[n // 3, 2])),
            ScenarioTrigger("Scenario7", r[2 * n // 3, :2].astype(np.float64),
                            np.rad2deg(r[2 * n // 3, 2])),
        ]
        scens.append(build_route_scenarios(cfg, r, trigs))
    return town, jnp.asarray(np.stack(routes), jnp.float32), scens


def grid_world(cfg):
    from thinktwice_tpu.maps.procedural import make_grid_town

    town = make_grid_town(n_blocks=2, block=100.0)
    routes = []
    for i in range(N_WORLDS):
        lane_y = 98.25 if i % 2 == 0 else 198.25
        x0 = 5.0 + (i % 8) * 2.0
        xs = np.linspace(x0, x0 + 180.0, MAX_ROUTE_LEN)
        routes.append(
            np.stack([xs, np.full_like(xs, lane_y), np.zeros_like(xs)], axis=1)
        )
    return town, jnp.asarray(np.stack(routes), jnp.float32), None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", action="store_true",
                    help="write a jax.profiler trace to runs/profile/")
    ap.add_argument("--steps", type=int, default=N_STEPS)
    args, _ = ap.parse_known_args()

    cfg = Config(
        sim=SimConfig(
            max_vehicles=N_VEHICLES + 8,
            max_walkers=8,
            max_lights=256,
            max_stop_signs=32,
            max_route_len=MAX_ROUTE_LEN,
            max_scenarios=8,
        )
    )
    on_town05 = os.path.exists(H5) and os.path.exists(ROUTES_XML)
    if on_town05:
        town, routes, scens = town05_world(cfg)
    else:
        town, routes, scens = grid_world(cfg)

    policy = RoachPolicy(
        features_dim=cfg.roach.features_dim,
        states_neurons=cfg.roach.states_neurons,
        policy_head_arch=cfg.roach.policy_head,
        value_head_arch=cfg.roach.value_head,
        action_dim=cfg.roach.action_dim,
    )
    params = policy.init(
        jax.random.key(0),
        jnp.zeros((1, cfg.birdview.n_channels, 192, 192)),
        jnp.zeros((1, cfg.roach.state_dim)),
    )
    # use the best trained expert when available so the benchmark exercises
    # real driving behavior (traffic interactions, light stops). Committed
    # msgpack archives are preferred (they survive a re-clone — round 3's
    # orbax-only checkpoints did not); live orbax dirs are the fallback for
    # in-progress runs. Order = best closed-loop Town05 Long score first.
    candidates = []
    for run_name in ("roach_rl6", "roach_rl5", "roach_bc5", "roach_bc3",
                     "roach_bc4", "roach_bc", "roach_town05_v2",
                     "roach_town05", "roach_ppo"):
        candidates.append(os.path.join(REPO, "runs", run_name,
                                       "params.msgpack"))
        candidates.append(os.path.join(REPO, "runs", run_name, "ckpt"))
    for ckpt in candidates:
        if os.path.exists(ckpt):
            try:
                from thinktwice_tpu.train.checkpoint import restore_pytree

                params = restore_pytree(ckpt, params)
                print(f"bench expert weights: {ckpt}")
                break
            except Exception:
                pass  # random weights measure the same compute

    keys = jax.random.split(jax.random.key(42), N_WORLDS)
    if scens is not None:
        scen_b = jax.tree.map(lambda *xs: jnp.stack(xs), *scens)
        states = jax.vmap(
            lambda r, k, sc: reset_world(
                cfg, town, r, k, n_vehicles=N_VEHICLES, scenario=sc
            )
        )(routes, keys, scen_b)
    else:
        states = jax.vmap(
            lambda r, k: reset_world(cfg, town, r, k, n_vehicles=N_VEHICLES)
        )(routes, keys)

    def macro_step(states, _):
        """POLICY_EVERY ticks: one policy eval, held control."""
        ctrl = jax.vmap(lambda s: expert_control(cfg, params, town, s)[0])(states)
        for _ in range(POLICY_EVERY):
            states, _ev = jax.vmap(
                lambda s, c: step_world(cfg, town, s, c)
            )(states, ctrl)
        return states, None

    n_macro = args.steps // POLICY_EVERY

    @jax.jit
    def run(states):
        return jax.lax.scan(macro_step, states, None, length=n_macro)[0]

    # warmup/compile
    warm = run(states)
    jax.block_until_ready(warm.tick)

    if args.profile:
        os.makedirs(os.path.join(REPO, "runs", "profile"), exist_ok=True)
        jax.profiler.start_trace(os.path.join(REPO, "runs", "profile"))

    t0 = time.perf_counter()
    out = run(states)
    jax.block_until_ready(out.tick)
    dt = time.perf_counter() - t0

    if args.profile:
        jax.profiler.stop_trace()

    total_env_steps = N_WORLDS * args.steps
    steps_per_sec = total_env_steps / dt
    name = "town05" if on_town05 else "grid"
    print(
        json.dumps(
            {
                "metric": f"env_steps_per_sec_64worlds_roach_{name}",
                "value": round(steps_per_sec, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(steps_per_sec / 1000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
