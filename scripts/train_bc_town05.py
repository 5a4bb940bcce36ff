"""Behavior-clone the Roach policy from the privileged autopilot on Town05.

Long multi-junction routes + background traffic: the exact distribution the
PPO-from-scratch expert failed on (wrong junction turns compounding over
1-2 km, STATUS round-2). Usage:

  python scripts/train_bc_town05.py [--iters N] [--out runs/roach_bc]
  python scripts/eval_town05.py --agent expert --ckpt runs/roach_bc/ckpt
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
from thinktwice_tpu.maps.cache import town05_cached
from thinktwice_tpu.maps.router import raster_planner
from thinktwice_tpu.train import checkpoint as ckpt_lib
from thinktwice_tpu.train.bc import BCConfig, make_bc

H5 = "/root/reference/roach/obs_manager/birdview/maps/Town05.h5"
ROUTES = ("/root/reference/leaderboard/data/routes_for_evaluation/"
          "routes_town05_long.xml")
BANK = sorted(glob.glob(
    "/root/reference/leaderboard/data/routes_for_open_loop_training/"
    "routes_town05_0*.xml"))[:4]

MAX_ROUTE_LEN = 768


def build_scenario_bank(cfg, town, bank):
    """Stacked ScenarioState (NR leading) with the same map-derived triggers
    the eval path uses, so BC rollouts contain crossing walkers / junction
    vehicles (BC3 trained scenario-free and blocked on them closed-loop)."""
    import jax as _jax

    from thinktwice_tpu.harness.evaluator import (
        build_route_scenarios,
        derive_map_triggers,
    )
    from thinktwice_tpu.sim.reset import zero_scenarios

    scens = []
    for dense in bank:
        trig = derive_map_triggers(town, dense)
        s = build_route_scenarios(cfg, dense, trig)
        scens.append(zero_scenarios(cfg) if s is None else s)
    return _jax.tree.map(lambda *xs: jnp.stack(xs), *scens)


def load_routes(planner, max_routes=192, min_len=60.0):
    """Training bank densified + chopped long eval-adjacent geometry.

    The bank routes are <=285 m; to teach junction sequences we also slice
    the town's own long-route geometry into overlapping windows (the eval
    routes themselves are NOT used — their windows are excluded)."""
    specs = []
    for f in BANK:
        specs.extend(parse_routes_file(f))
    routes = []
    for s in specs:
        raw = s.dense(spacing=1.0, planner=planner)
        length = float(np.linalg.norm(np.diff(raw[:, :2], axis=0), axis=1).sum())
        if length < min_len:
            continue
        d = s.dense(spacing=1.0, max_len=MAX_ROUTE_LEN, planner=planner)
        routes.append(d)
        if len(routes) >= max_routes:
            break
    return np.stack(routes)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--envs", type=int, default=24)
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--vehicles", type=int, default=96,
                    help="eval-like density (Town05 Long runs 120; BC3's 24 "
                         "left 'stopped vehicle near lane' states uncovered)")
    ap.add_argument("--scenarios", action="store_true", default=True)
    ap.add_argument("--no-scenarios", dest="scenarios", action="store_false")
    ap.add_argument("--out", default="runs/roach_bc")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--dagger", type=float, default=0.0,
                    help="max prob of executing the learned policy per world "
                         "per macro step (labels stay the teacher's)")
    ap.add_argument("--dagger-ramp", type=int, default=100,
                    help="iters to ramp the mix from 0 to --dagger")
    ap.add_argument("--perturb", type=float, default=0.05,
                    help="prob per world per macro step of a lateral/heading "
                         "displacement before the observation (recovery-state "
                         "coverage)")
    ap.add_argument("--eval-every", type=int, default=25,
                    help="closed-loop policy-only probe cadence (iters)")
    args = ap.parse_args()

    planner = raster_planner(H5)
    town = town05_cached(H5, [ROUTES] + BANK, max_lane_pts=49152,
                         max_road_segs=8192, max_lane_segs=8192)
    bank = load_routes(planner)
    print(f"route bank: {len(bank)} routes; "
          f"{int(np.asarray(town.tl_valid).sum())} lights", flush=True)

    cfg = Config(sim=SimConfig(
        # +8 reserves the top traffic slots for scenario actors
        # (build_route_scenarios assigns them from max_vehicles-1 downward,
        # same layout as eval_town05.py)
        max_vehicles=args.vehicles + 8, max_walkers=8,
        max_lights=256, max_stop_signs=32, max_route_len=MAX_ROUTE_LEN,
        max_scenarios=8))
    bcfg = BCConfig(n_envs=args.envs, n_steps=args.steps,
                    n_vehicles=args.vehicles, perturb_prob=args.perturb)
    scen_bank = build_scenario_bank(cfg, town, bank) if args.scenarios else None
    init_fn, iterate_fn = make_bc(cfg, bcfg, town,
                                  jnp.asarray(bank, jnp.float32),
                                  scenarios=scen_bank)
    params, opt_state, env_states = init_fn(jax.random.key(0))

    os.makedirs(args.out, exist_ok=True)
    ckpt_dir = os.path.join(os.path.abspath(args.out), "ckpt")
    if args.resume and os.path.isdir(ckpt_dir):
        params = ckpt_lib.restore_pytree(ckpt_dir, params)
        print("resumed params")

    log = open(os.path.join(args.out, "metrics.jsonl"), "a")
    t0 = time.time()
    for it in range(args.iters):
        mix = args.dagger * min(1.0, it / max(args.dagger_ramp, 1))
        params, opt_state, env_states, m = iterate_fn(
            params, opt_state, env_states, jax.random.key(7000 + it),
            dagger_mix=mix,
        )
        if args.eval_every and (it % args.eval_every == 0
                                or it == args.iters - 1):
            ev = iterate_fn.eval_fn(params, jax.random.key(9000 + it))
            m = {**m, **{k: float(v) for k, v in ev.items()}}
        if it % 5 == 0 or it == args.iters - 1:
            rec = {k: round(float(v), 5) for k, v in m.items()}
            rec["iter"] = it
            rec["dagger_mix"] = round(mix, 3)
            rec["wall_s"] = round(time.time() - t0, 1)
            line = json.dumps(rec)
            print(line, flush=True)
            log.write(line + "\n")
            log.flush()
        if (it + 1) % 50 == 0 or it == args.iters - 1:
            hp = jax.device_get(params)
            ckpt_lib.save_pytree(ckpt_dir, hp)
            # durable single-file snapshot (committable; the orbax
            # dir is gitignored and does not survive a re-clone)
            ckpt_lib.archive_params(
                os.path.join(os.path.dirname(ckpt_dir), 'params.msgpack'), hp)
    log.close()


if __name__ == "__main__":
    main()
