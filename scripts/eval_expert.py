"""Closed-loop Driving-Score evaluation of the (PPO-trained) Roach expert.

Usage: python scripts/eval_expert.py [--ckpt runs/roach_ppo/ckpt] [--routes N]

Runs the expert policy (birdview -> XtMaCNN -> Beta mode + hazard brake)
through the route evaluator with traffic, and prints the leaderboard-schema
scores — the Config-2 milestone of SURVEY §7.2 step 4.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax
import jax.numpy as jnp
import numpy as np

from thinktwice_tpu.agents.expert import expert_control
from thinktwice_tpu.agents.roach import RoachPolicy
from thinktwice_tpu.config import Config, SimConfig
from thinktwice_tpu.harness.evaluator import evaluate_routes
from thinktwice_tpu.maps.procedural import make_grid_town
from thinktwice_tpu.train import checkpoint as ckpt_lib


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="runs/roach_ppo/ckpt")
    ap.add_argument("--n-routes", type=int, default=8)
    ap.add_argument("--vehicles", type=int, default=8)
    ap.add_argument("--out", default="runs/roach_ppo/eval_results.json")
    args = ap.parse_args()

    cfg = Config(
        sim=SimConfig(max_vehicles=16, max_walkers=4, max_route_len=256,
                      max_scenarios=4)
    )
    town = make_grid_town(2, 100.0)

    policy = RoachPolicy()
    params = policy.init(
        jax.random.key(0),
        jnp.zeros((1, cfg.birdview.n_channels, 192, 192)),
        jnp.zeros((1, cfg.roach.state_dim)),
    )
    if os.path.isdir(args.ckpt):
        params = ckpt_lib.restore_pytree(args.ckpt, params)
        print(f"loaded expert from {args.ckpt}")
    else:
        print("WARNING: random-weight expert (no checkpoint found)")

    # the same route family PPO trained on (straight lane runs with junctions)
    from train_roach_ppo import build_routes

    route_arr = np.asarray(build_routes(args.n_routes))
    routes = [route_arr[i] for i in range(args.n_routes)]
    ids = [f"exp{i}" for i in range(args.n_routes)]

    def policy_fn(cfg_, town_, state):
        control, _ = expert_control(cfg, params, town_, state)
        return control

    g = evaluate_routes(
        cfg, town, routes, ids,
        policy_fn=policy_fn,
        n_vehicles=args.vehicles,
        worlds_per_batch=args.n_routes,
        out_path=args.out,
    )
    print(json.dumps(g["scores"], indent=2))
    print(json.dumps(g["infractions"], indent=2))


if __name__ == "__main__":
    main()
