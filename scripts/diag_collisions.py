"""Record the geometry of every ego-vehicle collision on a Town05 route:
who hit whom (relative position in the ego frame, both speeds/headings), so
the fix targets the real conflict mode instead of a guess."""

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
from thinktwice_tpu.geometry import obb_overlap, wrap_angle
from thinktwice_tpu.harness.route_parser import parse_routes_file
from thinktwice_tpu.maps.router import raster_planner
from thinktwice_tpu.harness.evaluator import build_route_scenarios, derive_map_triggers
from thinktwice_tpu.sim.reset import reset_world
from thinktwice_tpu.sim.step import step_world
from scripts.diag_blocked import H5, ROUTES, get_town


def main():
    route_i = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    n_veh = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    town = get_town()
    cfg = Config(sim=SimConfig(
        max_vehicles=n_veh + 8, max_walkers=16, max_lights=256,
        max_stop_signs=32, max_route_len=2304, max_scenarios=8))
    planner = raster_planner(H5)
    spec = parse_routes_file(ROUTES)[route_i]
    dense = spec.dense(spacing=1.0, max_len=cfg.sim.max_route_len,
                       planner=planner)
    R = cfg.sim.max_route_len
    if len(dense) < R:
        dense = np.concatenate([dense, np.repeat(dense[-1:], R - len(dense), 0)])
    dense_j = jnp.asarray(dense[:R], jnp.float32)
    scen = build_route_scenarios(cfg, dense, derive_map_triggers(town, dense))
    # replicate eval_town05's world init exactly: per-route key from one
    # split of the run seed, plus the route XML's weather
    rng, sub = jax.random.split(jax.random.key(0))
    keys = jax.random.split(sub, 10)
    state = reset_world(cfg, town, dense_j, keys[route_i],
                        n_vehicles=n_veh, scenario=scen,
                        weather=jnp.asarray(spec.weather, jnp.float32))

    @jax.jit
    def run(state):
        def body(st, _):
            ctrl = autopilot_control(cfg, town, st)
            st2, ev = step_world(cfg, town, st, ctrl)
            hits = obb_overlap(
                st2.ego.pos[None], st2.ego.yaw[None], st2.ego.extent[None],
                st2.traffic.pos, st2.traffic.yaw, st2.traffic.extent,
            ) & st2.traffic.active
            k = jnp.argmax(hits)
            scen_slot = jnp.any(
                (st2.scenario.state > 0) & (st2.scenario.actor_idx == k)
            ) | jnp.any(
                (st2.scenario.state > 0) & (st2.scenario.kind == 7)
                & (st2.scenario.param[:, 3].astype(jnp.int32) == k)
            )
            rel = st2.traffic.pos[k] - st2.ego.pos
            c, s = jnp.cos(-st2.ego.yaw), jnp.sin(-st2.ego.yaw)
            rel_ego = jnp.stack([rel[0] * c - rel[1] * s,
                                 rel[0] * s + rel[1] * c])
            tel = dict(
                hit=ev.collision_vehicle,
                ego_speed=st2.ego.speed,
                other_speed=st2.traffic.speed[k],
                other_stop_s=st2.traffic.stop_s[k],
                rel=rel_ego,
                dyaw=wrap_angle(st2.traffic.yaw[k] - st2.ego.yaw),
                slot=k, scen_slot=scen_slot,
                comp=st2.criteria.route_completion,
                done=st2.criteria.done,
            )
            return st2, tel
        return jax.lax.scan(body, state, None, length=20000)

    state, tel = run(state)
    tel = jax.device_get(tel)
    hits = np.nonzero(tel["hit"])[0]
    print(f"{len(hits)} ego-vehicle collisions, "
          f"final comp={float(tel['comp'][-1]):.2f}")
    for t in hits:
        r = tel["rel"][t]
        print(f"t={t*0.05:6.1f}s comp={tel['comp'][t]:.2f} "
              f"v_ego={tel['ego_speed'][t]:4.1f} v_oth={tel['other_speed'][t]:4.1f} "
              f"oth_stop_s={tel['other_stop_s'][t]:5.1f} "
              f"rel_ego=({r[0]:5.1f},{r[1]:5.1f}) "
              f"dyaw={np.rad2deg(tel['dyaw'][t]):6.0f}deg "
              f"slot={tel['slot'][t]} scen={bool(tel['scen_slot'][t])}")


if __name__ == "__main__":
    main()
