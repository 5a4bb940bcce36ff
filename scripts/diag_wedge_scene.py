"""Dump the local scene geometry at a junction wedge (Longest6 diagnosis).

Steps a route with the autopilot for --ticks, then prints every actor within
--radius of the ego: position, yaw, speed, current waypoint, and its next 8
lane path points — plus the ego's next route points. Lets us see whether a
nose-to-nose wedge is real CARLA-like geometry or an artifact of our junction
lane links cutting the corner into the ego's lane.
"""

import argparse
import glob
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
from thinktwice_tpu.harness.evaluator import (
    build_route_scenarios,
    derive_map_triggers,
)
from thinktwice_tpu.harness.route_parser import parse_routes_file
from thinktwice_tpu.maps.cache import town05_cached
from thinktwice_tpu.sim.reset import reset_world
from thinktwice_tpu.sim.step import step_world

MAPS = "/root/reference/roach/obs_manager/birdview/maps"
ROUTES = ("/root/reference/leaderboard/data/longest6/"
          "longest6_split/longest_weathers_%s.xml")
BANK = ("/root/reference/leaderboard/data/routes_for_open_loop_training")
MAX_ROUTE_LEN = 3072
CARLA_SPAWN_POINTS = {"Town01": 255, "Town02": 101, "Town03": 265,
                      "Town04": 372, "Town05": 302, "Town06": 436}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--town", default="Town03")
    ap.add_argument("--route", type=int, default=15)
    ap.add_argument("--ticks", type=int, default=1200)
    ap.add_argument("--radius", type=float, default=18.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    # mirror scripts/diag_longest6.py setup exactly
    import scripts.diag_longest6 as dl

    h5 = os.path.join(MAPS, f"{args.town}.h5")
    bank_files = sorted(glob.glob(
        os.path.join(BANK, f"routes_{args.town.lower()}_*.xml")))[:4]
    town = town05_cached(h5, [dl.ROUTES] + bank_files, town=args.town,
                         max_lane_pts=49152, max_road_segs=8192,
                         max_lane_segs=8192, strict=True)
    n_veh = CARLA_SPAWN_POINTS[args.town]
    cfg = Config(sim=SimConfig(
        max_vehicles=n_veh + 8, max_walkers=16, max_lights=256,
        max_stop_signs=32, max_route_len=MAX_ROUTE_LEN, max_scenarios=8))
    specs = [s for s in parse_routes_file(dl.ROUTES)
             if f"_{s.route_id}" == f"_{args.route}"]
    spec = specs[0]
    from thinktwice_tpu.maps.router import raster_planner

    planner = raster_planner(h5)
    dense = spec.dense(spacing=1.0, max_len=cfg.sim.max_route_len,
                       planner=planner)
    scen = build_route_scenarios(cfg, dense, derive_map_triggers(town, dense))
    R = cfg.sim.max_route_len
    if len(dense) < R:
        dense = np.concatenate([dense, np.repeat(dense[-1:], R - len(dense), 0)])
    dense = jnp.asarray(dense[:R], jnp.float32)
    state = reset_world(cfg, town, dense, jax.random.key(args.seed),
                        n_vehicles=n_veh, scenario=scen)

    @jax.jit
    def chunk(st):
        def body(s, _):
            ctrl, _ = autopilot_control(cfg, town, s, debug=True)
            s2, _ = step_world(cfg, town, s, ctrl)
            return s2, None
        st, _ = jax.lax.scan(body, st, None, length=100)
        return st

    for k in range(args.ticks // 100):
        state = chunk(state)
        if (k + 1) % 4 == 0:
            print(f"tick {(k+1)*100}: ego v={float(state.ego.speed):.2f} "
                  f"comp={float(state.criteria.route_completion):.3f}",
                  flush=True)

    st = jax.device_get(state)
    lane_pts = np.asarray(town.lane_pts)
    lane_yaw = np.asarray(town.lane_yaw)
    lane_next = np.asarray(town.lane_next)
    ego = st.ego
    print(f"\nEGO pos=({ego.pos[0]:.1f},{ego.pos[1]:.1f}) "
          f"yaw={np.degrees(ego.yaw):.0f}deg v={ego.speed:.2f} "
          f"ext={np.round(np.asarray(ego.extent),2)}")
    ridx = int(st.criteria.route_idx)
    rpts = np.asarray(st.route[ridx:ridx + 16, :2])
    print("EGO route ahead:",
          " ".join(f"({p[0]:.1f},{p[1]:.1f})" for p in rpts[::3]))
    d = np.linalg.norm(st.traffic.pos - ego.pos[None], axis=-1)
    near = np.where((d < args.radius) & st.traffic.active)[0]
    scen_actors = set(np.asarray(st.scenario.actor_idx)[
        np.asarray(st.scenario.state) >= 0].tolist())
    for i in near:
        wp = int(st.traffic.wp_idx[i])
        path = [wp]
        for _ in range(8):
            path.append(int(lane_next[path[-1]]))
        pp = lane_pts[path]
        print(f"v{i} pos=({st.traffic.pos[i,0]:.1f},{st.traffic.pos[i,1]:.1f}) "
              f"yaw={np.degrees(st.traffic.yaw[i]):.0f}deg "
              f"v={st.traffic.speed[i]:.2f} d={d[i]:.1f} "
              f"stop_s={st.traffic.stop_s[i]:.1f} "
              f"scen={'Y' if i in scen_actors else 'n'} "
              f"ext={np.round(np.asarray(st.traffic.extent[i]),2)}")
        print("   path:",
              " ".join(f"({p[0]:.1f},{p[1]:.1f})" for p in pp))


if __name__ == "__main__":
    main()
