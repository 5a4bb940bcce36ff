"""Run an OpenSCENARIO (.xosc) file closed-loop (SURVEY §2.1 S8 demo).

The srunner equivalent is `scenario_runner.py --openscenario FILE`: parse the
storyboard, spawn the entities, drive the ego, evaluate criteria. Here:
`harness/openscenario.py` compiles the subset storyboard into our vectorized
scenario arrays, the ego follows a straight route synthesized from its Init
teleport pose (the xosc examples have no route — srunner drives them with
manual_control or an agent the user supplies), and the in-graph autopilot +
criteria produce the verdict.

Usage:
  python scripts/run_xosc.py /root/reference/scenario_runner/srunner/examples/FollowLeadingVehicle.xosc
  python scripts/run_xosc.py FILE --steps 1200
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from thinktwice_tpu.jaxenv import setup as _jax_setup

_jax_setup()

import jax
import jax.numpy as jnp

from thinktwice_tpu.agents.autopilot import autopilot_control
from thinktwice_tpu.config import Config, SimConfig
from thinktwice_tpu.harness.openscenario import parse_xosc, to_scenario_arrays
from thinktwice_tpu.sim.reset import make_scenarios, reset_world
from thinktwice_tpu.sim.step import step_world

MAPS = "/root/reference/roach/obs_manager/birdview/maps"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("xosc")
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--vehicles", type=int, default=0,
                    help="background traffic on top of scenario entities")
    args = ap.parse_args()

    osc = parse_xosc(args.xosc)
    print(f"{os.path.basename(args.xosc)}: town={osc.town} "
          f"entities={[e.name for e in osc.entities]} "
          f"duration={osc.duration_s or 'open'}s")
    for u in osc.unsupported:
        print(f"  [subset] unsupported: {u}")

    cfg = Config(sim=SimConfig(
        max_vehicles=max(args.vehicles + 8, 16), max_walkers=8,
        max_lights=256, max_stop_signs=32, max_route_len=512,
        max_scenarios=8))

    h5 = os.path.join(MAPS, f"{osc.town}.h5")
    if osc.town and os.path.exists(h5):
        from thinktwice_tpu.maps.cache import town05_cached

        town = town05_cached(h5, [], town=osc.town)
    else:
        from thinktwice_tpu.maps.procedural import make_grid_town

        town = make_grid_town(n_blocks=2, block=100.0)
        print(f"  (no H5 for {osc.town!r}; procedural grid town)")

    # route: straight ahead from the ego's Init pose; when the hero used a
    # LanePosition (outside the subset), start 30 m behind the first entity
    # along its heading so follow/cross geometry still makes sense
    if osc.ego_pos is not None:
        origin = np.asarray(osc.ego_pos)
        yaw = osc.ego_yaw
    elif osc.entities:
        e = osc.entities[0]
        yaw = e.yaw
        origin = np.asarray(e.pos) - 30.0 * np.asarray(
            [np.cos(yaw), np.sin(yaw)])
    else:
        origin, yaw = np.asarray((10.0, 98.25)), 0.0
    s = np.arange(cfg.sim.max_route_len, dtype=np.float32)
    route = np.stack([
        origin[0] + s * np.cos(yaw),
        origin[1] + s * np.sin(yaw),
        np.full_like(s, yaw, dtype=np.float32),
    ], axis=1)

    arrs = to_scenario_arrays(osc, cfg.sim.max_vehicles, cfg.sim.max_walkers)
    scen = make_scenarios(cfg, **arrs) if arrs else None
    weather = (jnp.asarray(osc.weather, jnp.float32)
               if osc.weather is not None else None)
    state = reset_world(cfg, town, jnp.asarray(route), jax.random.key(0),
                        n_vehicles=args.vehicles, scenario=scen,
                        weather=weather)

    @jax.jit
    def chunk(st):
        def body(s, _):
            ctrl = autopilot_control(cfg, town, s)
            s2, _ = step_world(cfg, town, s, ctrl)
            return s2, None
        st2, _ = jax.lax.scan(body, st, None, length=100)
        return st2

    for i in range(args.steps // 100):
        state = chunk(state)
        c = jax.device_get(state.criteria)
        print(f"t={(i + 1) * 5:5.0f}s comp={float(c.route_completion):.3f} "
              f"veh={int(c.n_collision_vehicle)} "
              f"walker={int(c.n_collision_walker)} "
              f"red={int(c.n_red_light)} done={bool(c.done)}", flush=True)
        if bool(c.done):
            break
    print("verdict:", {k: bool(getattr(jax.device_get(state.criteria), k))
                       for k in ("finished", "blocked", "timeout")})


if __name__ == "__main__":
    main()
