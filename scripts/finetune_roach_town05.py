"""PPO-polish the behavior-cloned Roach expert on Town05 (TPU).

Usage:
  python scripts/finetune_roach_town05.py --init runs/roach_bc5/params.msgpack \
      [--iters N] [--out runs/roach_rl5]

The reference expert is a PPO policy (roach/models/ppo_policy.py loads
carla-roach's 11.8M-step checkpoint); BC alone plateaus at DS ~33 on Town05
Long with blocked/inertia failures (runs/expert_bc3_town05_long.json — the
clone idles behind stopped vehicles where the teacher accelerates). PPO's
reward attacks exactly that: idling pays -p_time and forfeits r_progress,
so the plateau states get direct gradient. Setup mirrors the BC distribution:
same Town05 route bank, scenarios armed, traffic, 10 Hz action cadence
(policy_every=2, the deployment cadence), and a KL anchor to the frozen BC
policy so junction turning is not forgotten while the blocked behavior is
optimized away.
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from thinktwice_tpu.jaxenv import setup as _jax_setup

_jax_setup()

from thinktwice_tpu.config import Config, SimConfig
from thinktwice_tpu.maps.cache import town05_cached
from thinktwice_tpu.maps.router import raster_planner
from thinktwice_tpu.train import checkpoint as ckpt_lib
from thinktwice_tpu.train.ppo import PPOConfig, make_ppo

from train_bc_town05 import (  # noqa: E402  (same route/scenario recipe)
    BANK,
    H5,
    MAX_ROUTE_LEN,
    ROUTES,
    build_scenario_bank,
    load_routes,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--init", default="runs/roach_bc5/params.msgpack",
                    help="BC warm-start params (msgpack archive or orbax dir)")
    ap.add_argument("--iters", type=int, default=150)
    ap.add_argument("--envs", type=int, default=24)
    ap.add_argument("--steps", type=int, default=128,
                    help="macro steps per rollout (2 ticks each)")
    ap.add_argument("--vehicles", type=int, default=48)
    ap.add_argument("--lr", type=float, default=3e-5)
    ap.add_argument("--anchor", type=float, default=0.05,
                    help="KL(BC || current) coefficient")
    ap.add_argument("--red-scale", type=float, default=1.0,
                    help="multiplier on the red-light infraction penalty "
                         "(second-stage polish when reds dominate the eval "
                         "penalty)")
    ap.add_argument("--out", default="runs/roach_rl5")
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    planner = raster_planner(H5)
    town = town05_cached(H5, [ROUTES] + BANK, max_lane_pts=49152,
                         max_road_segs=8192, max_lane_segs=8192)
    bank = load_routes(planner)
    print(f"route bank: {len(bank)} routes", flush=True)

    cfg = Config(sim=SimConfig(
        max_vehicles=args.vehicles + 8, max_walkers=8,
        max_lights=256, max_stop_signs=32, max_route_len=MAX_ROUTE_LEN,
        max_scenarios=8))
    routes = jnp.asarray(bank, jnp.float32)
    scen_bank = build_scenario_bank(cfg, town, bank)

    pcfg = PPOConfig(n_envs=args.envs, n_steps=args.steps, n_epochs=4,
                     minibatch=512, lr=args.lr, n_vehicles=args.vehicles,
                     policy_every=2, anchor_coef=args.anchor,
                     red_light_scale=args.red_scale)

    # template params to restore the BC warm start into
    from thinktwice_tpu.agents.roach import RoachPolicy

    policy = RoachPolicy(
        features_dim=cfg.roach.features_dim,
        states_neurons=cfg.roach.states_neurons,
        policy_head_arch=cfg.roach.policy_head,
        value_head_arch=cfg.roach.value_head,
        action_dim=cfg.roach.action_dim,
    )
    template = policy.init(
        jax.random.key(0),
        jnp.zeros((1, cfg.birdview.n_channels, 192, 192)),
        jnp.zeros((1, cfg.roach.state_dim)),
    )
    bc_params = ckpt_lib.restore_pytree(os.path.abspath(args.init), template)
    print(f"warm start from {args.init}", flush=True)

    init_fn, iterate_fn = make_ppo(cfg, pcfg, town, routes,
                                   scenarios=scen_bank,
                                   anchor_params=bc_params)
    _, opt_state, env_states = init_fn(jax.random.key(1))
    params = bc_params

    os.makedirs(args.out, exist_ok=True)
    ckpt_dir = os.path.join(os.path.abspath(args.out), "ckpt")
    if args.resume and os.path.isdir(ckpt_dir):
        params = ckpt_lib.restore_pytree(ckpt_dir, params)
        print("resumed params")

    log = open(os.path.join(args.out, "metrics.jsonl"), "a")
    t0 = time.time()
    for it in range(args.iters):
        params, opt_state, env_states, m = iterate_fn(
            params, opt_state, env_states, jax.random.key(3000 + it)
        )
        rec = {k: round(float(v), 5) for k, v in m.items()}
        rec["iter"] = it
        rec["wall_s"] = round(time.time() - t0, 1)
        line = json.dumps(rec)
        print(line, flush=True)
        log.write(line + "\n")
        log.flush()
        if (it + 1) % 25 == 0 or it == args.iters - 1:
            hp = jax.device_get(params)
            ckpt_lib.save_pytree(ckpt_dir, hp)
            ckpt_lib.archive_params(
                os.path.join(os.path.dirname(ckpt_dir), "params.msgpack"), hp)
    log.close()


if __name__ == "__main__":
    main()
