"""Locate layout (curb) collisions for the autopilot on a Town05 route.

Records every tick where the static-collision latch rises, plus the route
point, then inspects the sidewalk raster in a window around each hit to
separate route-geometry problems (route drawn over the curb) from control
problems (ego corner-cutting off a good route)."""

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
from thinktwice_tpu.harness.route_parser import parse_routes_file
from thinktwice_tpu.maps.cache import town05_cached
from thinktwice_tpu.maps.router import raster_planner
from thinktwice_tpu.sim.reset import reset_world
from thinktwice_tpu.sim.step import step_world
from scripts.diag_blocked import H5, ROUTES, BANK, get_town


def main():
    route_i = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    town = get_town()
    cfg = Config(sim=SimConfig(
        max_vehicles=16, max_walkers=16, max_lights=256, max_stop_signs=32,
        max_route_len=2304, max_scenarios=8))
    planner = raster_planner(H5)
    spec = parse_routes_file(ROUTES)[route_i]
    dense = spec.dense(spacing=1.0, max_len=cfg.sim.max_route_len,
                       planner=planner)
    R = cfg.sim.max_route_len
    nd = len(dense)
    if nd < R:
        dense = np.concatenate([dense, np.repeat(dense[-1:], R - nd, 0)])
    dense_j = jnp.asarray(dense[:R], jnp.float32)

    state = reset_world(cfg, town, dense_j, jax.random.key(0), n_vehicles=0)

    @jax.jit
    def run(state):
        def body(st, _):
            ctrl = autopilot_control(cfg, town, st)
            st2, ev = step_world(cfg, town, st, ctrl)
            return st2, dict(pos=st2.ego.pos, yaw=st2.ego.yaw,
                             hit=ev.collision_static,
                             ridx=st2.criteria.route_idx)
        return jax.lax.scan(body, state, None, length=8000)

    state, tel = run(state)
    tel = jax.device_get(tel)
    hits = np.nonzero(tel["hit"])[0]
    print(f"{len(hits)} layout collisions")
    sw = np.asarray(town.sidewalk)
    ppm = float(town.pixels_per_meter)
    off = np.asarray(town.world_offset)
    for t in hits[:30]:
        p = tel["pos"][t]
        ridx = tel["ridx"][t]
        rpt = dense[min(ridx, nd - 1), :2]
        d_route = np.linalg.norm(p - rpt)
        # is the route point itself on sidewalk?
        rp_px = ((rpt - off) * ppm).astype(int)
        p_px = ((p - off) * ppm).astype(int)
        r_on_sw = sw[rp_px[1], rp_px[0]]
        e_on_sw = sw[p_px[1], p_px[0]]
        # route curvature in a +-5m window
        lo, hi = max(ridx - 5, 0), min(ridx + 6, nd - 1)
        seg = dense[lo:hi, 2]
        curv = np.abs(np.unwrap(seg)[-1] - np.unwrap(seg)[0])
        print(f"t={t} pos=({p[0]:7.1f},{p[1]:7.1f}) yaw={tel['yaw'][t]:5.2f} "
              f"d_route={d_route:4.1f} route_on_sw={int(r_on_sw)} "
              f"ego_on_sw={int(e_on_sw)} turn_5m={np.rad2deg(curv):5.1f}deg")


if __name__ == "__main__":
    main()
