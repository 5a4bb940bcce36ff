"""Diagnose the universal 'Agent got blocked' failure on Town05 Long.

Runs the rule-based autopilot on one eval route and records per-tick
telemetry: ego speed, route completion, forward gap, NPC fleet speeds.
Separates agent failure (can't follow the route with zero traffic) from
world failure (NPC gridlock walls the ego in).
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
from thinktwice_tpu.config import Config, SimConfig
from thinktwice_tpu.harness.evaluator import build_route_scenarios, derive_map_triggers
from thinktwice_tpu.harness.route_parser import parse_routes_file
from thinktwice_tpu.maps.cache import town05_cached
from thinktwice_tpu.maps.router import raster_planner
from thinktwice_tpu.sim.reset import reset_world
from thinktwice_tpu.sim.step import step_world
from thinktwice_tpu.sim.traffic import _front_gap

H5 = "/root/reference/roach/obs_manager/birdview/maps/Town05.h5"
ROUTES = ("/root/reference/leaderboard/data/routes_for_evaluation/"
          "routes_town05_long.xml")
BANK = sorted(__import__("glob").glob(
    "/root/reference/leaderboard/data/routes_for_open_loop_training/"
    "routes_town05_0*.xml"))[:4]


def get_town():
    return town05_cached(
        H5, [ROUTES] + BANK, max_lane_pts=49152, max_road_segs=8192,
        max_lane_segs=8192)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--route", type=int, default=0)
    ap.add_argument("--vehicles", type=int, default=120)
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--scenarios", action="store_true")
    ap.add_argument("--agent", choices=["autopilot", "expert"],
                    default="autopilot",
                    help="expert = RL6 policy + rule-brake stack, with the "
                         "per-brake attribution the expert path lacks in "
                         "expert_control (VERDICT r4 task 6: route 18/20 "
                         "blocks are expert-specific — the autopilot clears "
                         "them)")
    ap.add_argument("--ckpt", default="runs/roach_rl6/params.msgpack")
    ap.add_argument("--policy-every", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    town = get_town()
    print(f"town: {int(np.asarray(town.tl_valid).sum())} lights, "
          f"{int(np.asarray(town.spawn_valid).sum())} spawns, "
          f"{int(np.asarray(town.lane_valid).sum())} lane pts")

    cfg = Config(sim=SimConfig(
        max_vehicles=max(args.vehicles + 8, 16), max_walkers=16,
        max_lights=256, max_stop_signs=32, max_route_len=2304,
        max_scenarios=8))

    planner = raster_planner(H5)
    spec = parse_routes_file(ROUTES)[args.route]
    dense = spec.dense(spacing=1.0, max_len=cfg.sim.max_route_len,
                       planner=planner)
    scen = None
    if args.scenarios:
        scen = build_route_scenarios(cfg, dense, derive_map_triggers(town, dense))
    R = cfg.sim.max_route_len
    if len(dense) < R:
        dense = np.concatenate([dense, np.repeat(dense[-1:], R - len(dense), 0)])
    dense = jnp.asarray(dense[:R], jnp.float32)

    state = reset_world(cfg, town, dense, jax.random.key(args.seed),
                        n_vehicles=args.vehicles, scenario=scen)

    if args.agent == "expert":
        from thinktwice_tpu.agents.expert import expert_control, hazard_brake
        from thinktwice_tpu.agents.autopilot import (
            junction_yield, red_sign_caps)
        from thinktwice_tpu.agents.roach import RoachPolicy
        from thinktwice_tpu.train import checkpoint as ckpt_lib

        policy = RoachPolicy()
        rparams = policy.init(
            jax.random.key(0),
            jnp.zeros((1, cfg.birdview.n_channels, 192, 192)),
            jnp.zeros((1, cfg.roach.state_dim)),
        )
        rparams = ckpt_lib.restore_archive(args.ckpt, rparams)
        print(f"expert loaded from {args.ckpt}")

        def control_fn(st):
            ctrl, _ = expert_control(cfg, rparams, town, st)
            # the same caps the expert's rule brake reads, as debug taps
            v_red, d_red, v_sign, d_sign = red_sign_caps(cfg, town, st)
            v_yield, d_conf, _ = junction_yield(cfg, town, st)
            dbg = dict(
                v_red=v_red, v_sign=v_sign, v_yield=v_yield,
                d_red=d_red, d_sign=d_sign, d_conf=d_conf,
                v_gap=jnp.asarray(1e4),
                hazard=hazard_brake(cfg, st, stopped_cone=True),
            )
            return ctrl, dbg
    else:
        def control_fn(st):
            return autopilot_control(cfg, town, st, debug=True)

    pe = max(args.policy_every, 1)

    @jax.jit
    def run_chunk(state):
        def body(st, _):
            ctrl, dbg = control_fn(st)
            st2, ev = step_world(cfg, town, st, ctrl)
            for _k in range(pe - 1):   # zero-order hold like the evaluator
                st2, ev = step_world(cfg, town, st2, ctrl)
            all_pos = jnp.concatenate([st2.traffic.pos, st2.walkers.pos], 0)
            all_yaw = jnp.concatenate([st2.traffic.yaw, st2.walkers.yaw], 0)
            all_ext = jnp.concatenate([st2.traffic.extent, st2.walkers.extent], 0)
            all_act = jnp.concatenate([st2.traffic.active, st2.walkers.active], 0)
            gap = _front_gap(st2.ego.pos[None], st2.ego.yaw[None],
                             st2.ego.speed[None], all_pos, all_yaw, all_ext,
                             all_act, jnp.zeros((1, all_pos.shape[0]), bool))[0]
            act = st2.traffic.active
            npc_speed = jnp.sum(jnp.where(act, st2.traffic.speed, 0.0)) / \
                jnp.maximum(jnp.sum(act), 1)
            npc_stopped = jnp.sum(act & (st2.traffic.speed < 0.3))
            d_npc = jnp.where(act, jnp.linalg.norm(
                st2.traffic.pos - st2.ego.pos[None], axis=-1), 1e9)
            tel = dict(
                speed=st2.ego.speed, comp=st2.criteria.route_completion,
                gap=gap, npc_speed=npc_speed, npc_stopped=npc_stopped,
                nearest_npc=jnp.min(d_npc), pos=st2.ego.pos,
                blocked_s=st2.criteria.blocked_s,
                n_layout=st2.criteria.n_collision_static,
                n_veh=st2.criteria.n_collision_vehicle,
                done=st2.criteria.done,
                ctrl=ctrl,
                dbg=dbg,
            )
            return st2, tel

        return jax.lax.scan(body, state, None, length=200)

    for chunk in range(args.steps // 200):
        state, tel = run_chunk(state)
        t = jax.device_get(jax.tree.map(lambda x: x[-1], tel))
        # attribute stalled ticks in this chunk to the binding v_des term
        d = jax.device_get(tel["dbg"])
        stall = jax.device_get(tel["speed"]) < 0.3
        n = max(int(stall.sum()), 1)
        attrib = {
            "red": int((stall & (d["v_red"] < 0.3)).sum()),
            "gap": int((stall & (d["v_gap"] < 0.3)).sum()),
            "hazard": int((stall & d["hazard"]).sum()),
            "sign": int((stall & (d["v_sign"] < 0.3)).sum()),
            "yield": int((stall & (d["v_yield"] < 0.3)).sum())
            if "v_yield" in d else 0,
        }
        print(f"t={(chunk + 1) * 200 * pe * 0.05:6.0f}s comp={t['comp']:.3f} "
              f"v={t['speed']:4.1f} gap={min(float(t['gap']), 999):5.1f} "
              f"npc_v={t['npc_speed']:4.2f} npc_stop={t['npc_stopped']:3d} "
              f"near={t['nearest_npc']:5.1f} blocked={t['blocked_s']:4.1f} "
              f"lay={t['n_layout']} veh={t['n_veh']} "
              f"pos=({t['pos'][0]:.0f},{t['pos'][1]:.0f}) "
              f"ctrl={np.round(np.asarray(t['ctrl']), 2)} "
              f"stall={int(stall.sum())}/200 of which {attrib}",
              flush=True)
        if bool(t["done"]):
            print("DONE:", {k: bool(jax.device_get(getattr(state.criteria, k)))
                            for k in ["blocked", "timeout", "route_deviation",
                                      "finished"]})
            break


if __name__ == "__main__":
    main()
