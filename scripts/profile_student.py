"""Profile the student closed-loop eval tick (the Town05 Long student path).

Round-3 reality: the student eval ran ~19x slower than real time (2 routes
= 4 h wall, runs/student_town05_long_eval.log), which makes the reference's
headline 10-route benchmark infeasible to run. This script attributes one
policy macro step (camera render / lidar / model forward / world ticks),
vmapped over W worlds, so the hot component can be attacked directly.

Usage: python scripts/profile_student.py [--worlds 2] [--trace]
"""

import argparse
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

from thinktwice_tpu.agents.thinktwice_driver import (
    driver_init,
    make_thinktwice_driver,
)
from thinktwice_tpu.config import Config, SimConfig
from thinktwice_tpu.harness.route_parser import parse_routes_file
from thinktwice_tpu.maps.cache import town05_cached
from thinktwice_tpu.maps.router import raster_planner
from thinktwice_tpu.sensors.camera import cameras_from_state
from thinktwice_tpu.sensors.lidar import lidar_from_state
from thinktwice_tpu.sim.reset import reset_world
from thinktwice_tpu.sim.step import step_world
from thinktwice_tpu.train import checkpoint as ckpt_lib
from thinktwice_tpu.train.loop import init_model_params, make_model

H5 = "/root/reference/roach/obs_manager/birdview/maps/Town05.h5"
ROUTES = (
    "/root/reference/leaderboard/data/routes_for_evaluation/"
    "routes_town05_long.xml"
)


def timeit(fn, n=5, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn())
    ts = []
    for _ in range(n):
        t0 = time.time()
        jax.block_until_ready(fn())
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", type=int, default=2)
    ap.add_argument("--vehicles", type=int, default=120)
    ap.add_argument("--sweeps", type=int, default=2)
    ap.add_argument("--backbone", type=int, default=50)
    ap.add_argument("--ckpt", default="runs/student_town05/params.msgpack")
    ap.add_argument("--policy-every", type=int, default=2)
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--out", default="runs/profile_student.json")
    args = ap.parse_args()

    specs = parse_routes_file(ROUTES)[: args.worlds]
    planner = raster_planner(H5)
    town = town05_cached(H5, [ROUTES], max_lane_pts=49152,
                         max_road_segs=8192, max_lane_segs=8192)
    cfg = Config(sim=SimConfig(
        max_vehicles=args.vehicles + 8, max_walkers=16, max_lights=256,
        max_stop_signs=32, max_route_len=2304, max_scenarios=8))

    routes = jnp.asarray(np.stack([
        s.dense(spacing=1.0, max_len=cfg.sim.max_route_len, planner=planner)
        for s in specs
    ]))
    keys = jax.random.split(jax.random.key(0), args.worlds)
    states = jax.jit(jax.vmap(lambda r, k: reset_world(
        cfg, town, r, k, n_vehicles=args.vehicles)))(routes, keys)

    model = make_model(cfg, backbone_depth=args.backbone, n_sweeps=args.sweeps)
    params = init_model_params(cfg, model, jax.random.key(1))
    if os.path.exists(args.ckpt):
        params = ckpt_lib.restore_pytree(os.path.abspath(args.ckpt), params)
        print(f"loaded {args.ckpt}")
    n_params = sum(x.size for x in jax.tree.leaves(params))

    policy = make_thinktwice_driver(cfg, model)

    # --- components ---
    cam_j = jax.jit(jax.vmap(lambda s: cameras_from_state(cfg.camera, town, s)))
    lid_j = jax.jit(jax.vmap(lambda s: lidar_from_state(cfg.lidar, town, s)))
    t_cam = timeit(lambda: cam_j(states))
    t_lid = timeit(lambda: lid_j(states))

    # full policy call (render + model + control fusion)
    def pol(states, carries, pp):
        return jax.vmap(
            lambda s, c: policy(cfg, town, s, c, pp)
        )(states, carries)

    pol_j = jax.jit(pol)
    carries = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[driver_init(cfg, args.sweeps, 10 // args.policy_every)
          for _ in range(args.worlds)],
    )
    t_pol = timeit(lambda: pol_j(states, carries, params))

    # two world ticks (the policy_every=2 hold)
    def ticks(states, ctrl):
        def one(s, c):
            s, _ = step_world(cfg, town, s, c)
            s, _ = step_world(cfg, town, s, c)
            return s
        return jax.vmap(one)(states, ctrl)

    ticks_j = jax.jit(ticks)
    ctrl0 = jnp.zeros((args.worlds, 3))
    t_ticks = timeit(lambda: ticks_j(states, ctrl0))

    # full macro step (policy + hold ticks) — what the evaluator scans
    def macro(states, carries, pp):
        ctrl, carries = pol(states, carries, pp)
        def one(s, c):
            s, _ = step_world(cfg, town, s, c)
            for _ in range(args.policy_every - 1):
                s, _ = step_world(cfg, town, s, c)
            return s
        return jax.vmap(one)(states, ctrl), carries

    macro_j = jax.jit(macro)
    t_macro = timeit(lambda: macro_j(states, carries, params))

    if args.trace:
        with jax.profiler.trace("/tmp/student_trace"):
            jax.block_until_ready(macro_j(states, carries, params))
        print("trace -> /tmp/student_trace")

    res = {
        "worlds": args.worlds,
        "params_m": round(n_params / 1e6, 1),
        "cam_render_s": round(t_cam, 4),
        "lidar_s": round(t_lid, 4),
        "policy_call_s": round(t_pol, 4),
        "two_ticks_s": round(t_ticks, 4),
        "macro_step_s": round(t_macro, 4),
        "model_fwd_s_est": round(t_pol - t_cam - t_lid, 4),
        "sim_ticks_per_s": round(args.policy_every / t_macro, 2),
        "eval_hours_10routes_est": round(
            # ~2.5 km worst route, 0.8 s/m timeout, 20 Hz, 10 worlds batched
            0.8 * 2500 * 20 * t_macro / args.policy_every / 3600, 2),
    }
    print(json.dumps(res, indent=1))
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
