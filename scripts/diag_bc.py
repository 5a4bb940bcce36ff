"""Why does the BC expert stand still closed-loop? Roll it on a training-bank
route and print per-50-tick telemetry plus the raw Beta params at spawn."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from thinktwice_tpu.jaxenv import setup as _jax_setup

_jax_setup()

from thinktwice_tpu.agents.expert import expert_control, state_vector
from thinktwice_tpu.agents.roach import RoachPolicy, beta_mode
from thinktwice_tpu.config import Config, SimConfig
from thinktwice_tpu.maps.router import raster_planner
from thinktwice_tpu.sensors.birdview import birdview_from_state
from thinktwice_tpu.sim.reset import reset_world
from thinktwice_tpu.sim.step import step_world
from thinktwice_tpu.train import checkpoint as ckpt_lib
from scripts.train_bc_town05 import BANK, H5, MAX_ROUTE_LEN, ROUTES, load_routes
from thinktwice_tpu.maps.cache import town05_cached


def main():
    n_veh = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    town = town05_cached(H5, [ROUTES] + BANK, max_lane_pts=49152,
                         max_road_segs=8192, max_lane_segs=8192)
    planner = raster_planner(H5)
    bank = load_routes(planner)
    cfg = Config(sim=SimConfig(
        max_vehicles=max(n_veh, 8), max_walkers=4, max_lights=256,
        max_stop_signs=32, max_route_len=MAX_ROUTE_LEN, max_scenarios=4))

    policy = RoachPolicy()
    params = policy.init(
        jax.random.key(0),
        jnp.zeros((1, cfg.birdview.n_channels, 192, 192)),
        jnp.zeros((1, cfg.roach.state_dim)),
    )
    params = ckpt_lib.restore_pytree(os.path.abspath("runs/roach_bc/ckpt"), params)

    route = jnp.asarray(bank[3], jnp.float32)
    state = reset_world(cfg, town, route, jax.random.key(5), n_vehicles=n_veh)

    bv = birdview_from_state(cfg.birdview, town, state)
    sv = state_vector(state)
    out = policy.apply(params, bv[None], sv[None])
    a = beta_mode(out["alpha"], out["beta"])[0]
    print("spawn: alpha", np.asarray(out["alpha"][0]).round(2),
          "beta", np.asarray(out["beta"][0]).round(2),
          "mode(acc,steer)", np.asarray(a).round(3))
    print("bv channel means:", np.asarray(bv.mean(axis=(1, 2))).round(4))

    @jax.jit
    def run(state):
        def body(st, _):
            ctrl, _sup = expert_control(cfg, params, town, st)
            st2, _ = step_world(cfg, town, st, ctrl)
            return st2, dict(v=st2.ego.speed, comp=st2.criteria.route_completion,
                             ctrl=ctrl, done=st2.criteria.done)
        return jax.lax.scan(body, state, None, length=1200)

    state, tel = run(state)
    tel = jax.device_get(tel)
    for t in range(0, 1200, 100):
        print(f"t={t*0.05:5.1f}s v={tel['v'][t]:4.1f} comp={tel['comp'][t]:.3f} "
              f"ctrl={np.round(np.asarray(tel['ctrl'][t]), 2)} done={bool(tel['done'][t])}")


if __name__ == "__main__":
    main()
