"""Train the Roach expert with PPO on imported Town05 (real map geometry).

Usage: python scripts/train_roach_town05.py [--iters N] [--envs W] [--out DIR]

Round-1 trained the expert on a procedural grid town; its Driving Score on
real Town05 Long was ~1 (curb scrapes + route deviation on curved roads).
This trains directly on the Town05 map imported from the reference H5, with
episodes drawn from the reference's 190-route Town05 training bank
(leaderboard/data/routes_for_open_loop_training/routes_town05_*.xml) and
background traffic, so the policy sees junctions, curves, and red lights.
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
from thinktwice_tpu.harness.route_parser import parse_routes_file
from thinktwice_tpu.maps.compile_h5 import compile_town
from thinktwice_tpu.maps.router import raster_planner
from thinktwice_tpu.train import checkpoint as ckpt_lib
from thinktwice_tpu.train.ppo import PPOConfig, make_ppo

H5 = "/root/reference/roach/obs_manager/birdview/maps/Town05.h5"
TRAIN_GLOB = (
    "/root/reference/leaderboard/data/routes_for_open_loop_training/"
    "routes_town05_0*.xml"
)

MAX_ROUTE_LEN = 384  # training routes are <= 285 m at 1 m spacing


def load_route_bank(n_files: int = 4, min_len_m: float = 40.0,
                    max_routes: int = 256):
    """(NR, MAX_ROUTE_LEN, 3) dense route bank + polylines for the map."""
    specs = []
    for f in sorted(glob.glob(TRAIN_GLOB))[:n_files]:
        specs.extend(parse_routes_file(f))
    planner = raster_planner(H5)
    routes, polys = [], []
    for s in specs:
        raw = s.dense(spacing=1.0, planner=planner)
        d = s.dense(spacing=1.0, max_len=MAX_ROUTE_LEN, planner=planner)
        length = float(np.linalg.norm(np.diff(raw[:, :2], axis=0), axis=1).sum())
        if length < min_len_m or length > MAX_ROUTE_LEN - 10:
            continue
        routes.append(d)
        polys.append(raw)
        if len(routes) >= max_routes:
            break
    return np.stack(routes), polys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1500)
    ap.add_argument("--envs", type=int, default=32)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--vehicles", type=int, default=16)
    ap.add_argument("--out", default="runs/roach_town05")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--init-from", default="",
                    help="warm-start params from another ckpt dir")
    args = ap.parse_args()

    bank, polys = load_route_bank()
    print(f"route bank: {len(bank)} routes")
    town = compile_town(H5, polys, max_lane_pts=49152, max_road_segs=8192,
                        max_lane_segs=8192)
    n_tl = int(np.asarray(town.tl_valid).sum())
    print(f"Town05 compiled: {n_tl} traffic lights")

    cfg = Config(
        sim=SimConfig(
            max_vehicles=max(args.vehicles, 8),
            max_walkers=4,
            max_lights=256,
            max_stop_signs=32,
            max_route_len=MAX_ROUTE_LEN,
            max_scenarios=4,
        )
    )
    routes = jnp.asarray(bank, jnp.float32)
    pcfg = PPOConfig(
        n_envs=args.envs, n_steps=args.steps, n_epochs=4,
        minibatch=512, lr=3e-4, n_vehicles=args.vehicles,
    )
    init_fn, iterate_fn = make_ppo(cfg, pcfg, town, routes)
    params, opt_state, env_states = init_fn(jax.random.key(0))

    os.makedirs(args.out, exist_ok=True)
    ckpt_dir = os.path.join(os.path.abspath(args.out), "ckpt")
    if args.resume and os.path.isdir(ckpt_dir):
        params = ckpt_lib.restore_pytree(ckpt_dir, params)
        print("resumed params")
    elif args.init_from and os.path.isdir(args.init_from):
        params = ckpt_lib.restore_pytree(os.path.abspath(args.init_from), params)
        print(f"warm-started from {args.init_from}")

    log = open(os.path.join(args.out, "metrics.jsonl"), "a")
    t0 = time.time()
    steps_per_iter = args.envs * args.steps
    for it in range(args.iters):
        params, opt_state, env_states, m = iterate_fn(
            params, opt_state, env_states, jax.random.key(1000 + it)
        )
        if it % 5 == 0 or it == args.iters - 1:
            rec = {k: round(float(v), 5) for k, v in m.items()}
            rec["iter"] = it
            rec["env_steps"] = (it + 1) * steps_per_iter
            rec["wall_s"] = round(time.time() - t0, 1)
            line = json.dumps(rec)
            print(line, flush=True)
            log.write(line + "\n")
            log.flush()
        if (it + 1) % 100 == 0 or it == args.iters - 1:
            hp = jax.device_get(params)
            ckpt_lib.save_pytree(ckpt_dir, hp)
            # durable single-file snapshot (committable; the orbax
            # dir is gitignored and does not survive a re-clone)
            ckpt_lib.archive_params(
                os.path.join(os.path.dirname(ckpt_dir), 'params.msgpack'), hp)
    log.close()


if __name__ == "__main__":
    main()
