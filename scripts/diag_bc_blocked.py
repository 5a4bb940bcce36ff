"""Why does the BC expert block on Town05 Long eval routes?

Rolls the BC checkpoint closed-loop on the blocked eval routes (full eval
config: 120 vehicles + derived scenarios) and records per-macro-step
telemetry. At the end prints, for the final (stuck) state of each world:
the policy's own Beta-mode action, whether the rule-based hazard brake was
overriding it, the autopilot teacher's action at the same state, distances
to the governing red light and nearest vehicle — separating four block
causes: (a) policy brakes on its own, (b) hazard_brake latch, (c) NPC wall,
(d) red-light wait that never releases.

Usage: python scripts/diag_bc_blocked.py [--ckpt runs/roach_bc3/ckpt]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from thinktwice_tpu.jaxenv import setup as _jax_setup

_jax_setup()

from thinktwice_tpu.agents.autopilot import autopilot_control
from thinktwice_tpu.agents.expert import (
    expert_control,
    hazard_brake,
    state_vector,
)
from thinktwice_tpu.agents.roach import RoachPolicy, acc_to_control, beta_mode
from thinktwice_tpu.config import Config, SimConfig
from thinktwice_tpu.harness.evaluator import (
    build_route_scenarios,
    derive_map_triggers,
)
from thinktwice_tpu.harness.route_parser import parse_routes_file
from thinktwice_tpu.maps.cache import town05_cached
from thinktwice_tpu.maps.router import raster_planner
from thinktwice_tpu.maps.town import traffic_light_states
from thinktwice_tpu.sensors.birdview import birdview_from_state
from thinktwice_tpu.sim.reset import reset_world
from thinktwice_tpu.sim.step import step_world
from thinktwice_tpu.sim.traffic import _red_light_dist
from thinktwice_tpu.train import checkpoint as ckpt_lib

H5 = "/root/reference/roach/obs_manager/birdview/maps/Town05.h5"
ROUTES = ("/root/reference/leaderboard/data/routes_for_evaluation/"
          "routes_town05_long.xml")
BLOCKED = [18, 20, 22, 23, 24]   # BC3 "Agent got blocked" routes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="runs/roach_bc3/ckpt")
    ap.add_argument("--vehicles", type=int, default=120)
    ap.add_argument("--ticks", type=int, default=8192)
    args = ap.parse_args()

    import glob as _glob
    bank_files = sorted(_glob.glob(
        "/root/reference/leaderboard/data/routes_for_open_loop_training/"
        "routes_town05_0*.xml"))[:4]
    town = town05_cached(H5, [ROUTES] + bank_files, max_lane_pts=49152,
                         max_road_segs=8192, max_lane_segs=8192, strict=True)
    planner = raster_planner(H5)
    specs = {int(s.route_id): s for s in parse_routes_file(ROUTES)}

    cfg = Config(sim=SimConfig(
        max_vehicles=args.vehicles + 8, max_walkers=16, max_lights=256,
        max_stop_signs=32, max_route_len=2304, max_scenarios=8))

    policy = RoachPolicy()
    params = policy.init(
        jax.random.key(0),
        jnp.zeros((1, cfg.birdview.n_channels, 192, 192)),
        jnp.zeros((1, cfg.roach.state_dim)),
    )
    params = ckpt_lib.restore_pytree(os.path.abspath(args.ckpt), params)

    states = []
    for rid in BLOCKED:
        dense = specs[rid].dense(spacing=1.0, max_len=cfg.sim.max_route_len,
                                 planner=planner)
        trig = derive_map_triggers(town, dense)
        scen = build_route_scenarios(cfg, dense, trig)
        st = reset_world(cfg, town, jnp.asarray(dense, jnp.float32),
                         jax.random.key(0), n_vehicles=args.vehicles,
                         scenario=scen)
        states.append(st)
    states = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    W = len(BLOCKED)

    @jax.jit
    def macro(states):
        def one(st):
            ctrl, _ = expert_control(cfg, params, town, st)
            for _ in range(2):
                st, _ev = step_world(cfg, town, st, ctrl)
            return st
        states = jax.vmap(one)(states)
        tele = {
            "speed": states.ego.speed,
            "rc": states.criteria.route_completion,
            "done": states.criteria.done,
            "blocked_s": states.criteria.blocked_s,
        }
        return states, tele

    tel = []
    for k in range(args.ticks // 2):
        states, t = macro(states)
        if k % 64 == 0:
            tel.append({kk: np.asarray(v) for kk, v in t.items()})
            print(f"t={k*2*0.05:7.1f}s  speed="
                  f"{np.asarray(t['speed']).round(2)}  rc="
                  f"{(np.asarray(t['rc'])).round(1)}  done="
                  f"{np.asarray(t['done']).astype(int)}", flush=True)
        if bool(np.all(np.asarray(t["done"]))):
            break

    # post-mortem at the final state of each world
    @jax.jit
    def post(states):
        def one(st):
            bv = birdview_from_state(cfg.birdview, town, st)
            sv = state_vector(st)
            out = policy.apply(params, bv[None], sv[None])
            pol_act = beta_mode(out["alpha"], out["beta"])[0]
            pol_ctrl = acc_to_control(pol_act[None])[0]
            hz = hazard_brake(cfg, st)
            ap_ctrl = autopilot_control(cfg, town, st)
            tls = traffic_light_states(town, st.time_s)
            d_red = _red_light_dist(town, tls, st.ego.pos[None],
                                    st.ego.yaw[None])[0]
            # nearest active vehicle distance ahead-ish
            rel = st.traffic.pos - st.ego.pos[None]
            d = jnp.linalg.norm(rel, axis=-1)
            d = jnp.where(st.traffic.active, d, jnp.inf)
            near = jnp.min(d)
            near_i = jnp.argmin(d)
            return {
                "pol_acc_steer": pol_act,
                "pol_ctrl": pol_ctrl,
                "hazard": hz,
                "ap_ctrl": ap_ctrl,
                "d_red": d_red,
                "near_veh_m": near,
                "near_veh_speed": st.traffic.speed[near_i],
                "speed": st.ego.speed,
                "rc": st.criteria.route_completion,
                "blocked_s": st.criteria.blocked_s,
                "alpha": out["alpha"][0],
                "beta": out["beta"][0],
            }
        return jax.vmap(one)(states)

    pm = {k: np.asarray(v) for k, v in post(states).items()}
    for i, rid in enumerate(BLOCKED):
        print(f"\n== route {rid}: rc={pm['rc'][i]:.1f}% "
              f"speed={pm['speed'][i]:.2f} blocked_s={pm['blocked_s'][i]:.0f}")
        print(f"   policy mode(acc,steer)={pm['pol_acc_steer'][i].round(3)} "
              f"-> ctrl(steer,thr,brk)={pm['pol_ctrl'][i].round(3)} "
              f"alpha={pm['alpha'][i].round(2)} beta={pm['beta'][i].round(2)}")
        print(f"   hazard_brake={bool(pm['hazard'][i])}  "
              f"teacher ctrl={pm['ap_ctrl'][i].round(3)}")
        print(f"   d_red={pm['d_red'][i]:.1f}m  nearest veh "
              f"{pm['near_veh_m'][i]:.1f}m @ {pm['near_veh_speed'][i]:.2f}m/s")


if __name__ == "__main__":
    main()
