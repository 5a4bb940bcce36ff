"""Component-level timing of the Config-5 benchmark macro step.

Decomposes bench.py's workload (64 worlds, imported Town05, 120 vehicles,
Roach expert at 10 Hz) into separately-jitted stages so the env-steps/s
budget can be attributed:

  birdview   - the ChauffeurNet raster (sensors/birdview.py)
  policy     - XtMaCNN forward (agents/roach.py) on the rendered obs
  expert     - full expert_control (render + policy + hazard brake)
  step2      - two step_world ticks (traffic + criteria + history)
  macro      - the fused production macro step (expert + 2 ticks)

Usage: python scripts/profile_bench.py [--steps 20]
Writes runs/profile_components.json and prints per-stage ms / 64 worlds.
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


def timed(fn, *args, n=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    import bench
    from thinktwice_tpu.agents.expert import expert_control, state_vector
    from thinktwice_tpu.agents.roach import RoachPolicy
    from thinktwice_tpu.config import Config, SimConfig
    from thinktwice_tpu.sensors.birdview import birdview_from_state
    from thinktwice_tpu.sim.reset import reset_world
    from thinktwice_tpu.sim.step import step_world
    from thinktwice_tpu.harness.evaluator import build_route_scenarios

    cfg = Config(sim=SimConfig(
        max_vehicles=bench.N_VEHICLES + 8, max_walkers=8, max_lights=256,
        max_stop_signs=32, max_route_len=bench.MAX_ROUTE_LEN, max_scenarios=8))
    town, routes, scens = bench.town05_world(cfg)

    policy = RoachPolicy(
        features_dim=cfg.roach.features_dim,
        states_neurons=cfg.roach.states_neurons,
        policy_head_arch=cfg.roach.policy_head,
        value_head_arch=cfg.roach.value_head,
        action_dim=cfg.roach.action_dim,
    )
    params = policy.init(
        jax.random.key(0),
        jnp.zeros((1, cfg.birdview.n_channels, 192, 192)),
        jnp.zeros((1, cfg.roach.state_dim)),
    )

    keys = jax.random.split(jax.random.key(42), bench.N_WORLDS)
    scen_b = jax.tree.map(lambda *xs: jnp.stack(xs), *scens)
    states = jax.vmap(
        lambda r, k, sc: reset_world(cfg, town, r, k,
                                     n_vehicles=bench.N_VEHICLES, scenario=sc)
    )(routes, keys, scen_b)

    # --- stages, each its own jit ------------------------------------------
    @jax.jit
    def f_birdview(states):
        return jax.vmap(
            lambda s: birdview_from_state(cfg.birdview, town, s))(states)

    bv = f_birdview(states)

    @jax.jit
    def f_policy(bv, sv):
        return policy.apply(params, bv, sv)["alpha"]

    sv = jax.jit(jax.vmap(state_vector))(states)

    @jax.jit
    def f_expert(states):
        return jax.vmap(
            lambda s: expert_control(cfg, params, town, s)[0])(states)

    ctrl = f_expert(states)

    @jax.jit
    def f_step2(states, ctrl):
        for _ in range(2):
            states, _ = jax.vmap(
                lambda s, c: step_world(cfg, town, s, c))(states, ctrl)
        return states

    @jax.jit
    def f_macro(states):
        ctrl = jax.vmap(
            lambda s: expert_control(cfg, params, town, s)[0])(states)
        for _ in range(2):
            states, _ = jax.vmap(
                lambda s, c: step_world(cfg, town, s, c))(states, ctrl)
        return states

    n = args.steps
    res = {
        "birdview_ms": timed(f_birdview, states, n=n),
        "policy_ms": timed(f_policy, bv, sv, n=n),
        "expert_ms": timed(f_expert, states, n=n),
        "step2_ms": timed(f_step2, states, ctrl, n=n),
        "macro_ms": timed(f_macro, states, n=n),
    }
    res["implied_env_steps_per_sec"] = 2 * bench.N_WORLDS / (
        res["macro_ms"] / 1e3)
    for k, v in res.items():
        print(f"{k:28s} {v:10.2f}")
    os.makedirs("runs", exist_ok=True)
    with open("runs/profile_components.json", "w") as f:
        json.dump({k: round(v, 3) for k, v in res.items()}, f, indent=1)
    print("-> runs/profile_components.json")


if __name__ == "__main__":
    main()
