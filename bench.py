"""Benchmark: aggregate env-steps/sec over 64 vmapped worlds (BASELINE.json
north-star; reference bound: 20 steps/s per world, one world per GPU process).

Config-5 shape: 64 parallel worlds driven closed-loop by the Roach privileged
expert (birdview raster -> policy net -> control, policy at 10 Hz like
roach_ap_agent_data_collection.py:462), full traffic + criteria per tick.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 1000 (the >=1000 steps/s target on v5e-8).
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax
import jax.numpy as jnp
import numpy as np

from thinktwice_tpu.agents.expert import expert_control
from thinktwice_tpu.agents.roach import RoachPolicy
from thinktwice_tpu.config import Config, SimConfig
from thinktwice_tpu.maps.procedural import make_grid_town
from thinktwice_tpu.sim.reset import reset_world
from thinktwice_tpu.sim.step import step_world

N_WORLDS = 64
N_STEPS = 200           # timed ticks per world
POLICY_EVERY = 2        # 10 Hz policy at the 20 Hz tick (reference cadence)
N_VEHICLES = 32


def build_routes(town, n, rng):
    """Straight lane-following routes across the grid, one per world."""
    rows = [98.25, 198.25, 1.75 - 3.5]
    routes = []
    for i in range(n):
        y = rows[i % 2] if True else rows[0]
        x0 = 5.0 + (i % 8) * 2.0
        xs = np.linspace(x0, x0 + 180.0, 256)
        lane_y = 98.25 if i % 2 == 0 else 198.25
        routes.append(
            np.stack([xs, np.full_like(xs, lane_y), np.zeros_like(xs)], axis=1)
        )
    return jnp.asarray(np.stack(routes), jnp.float32)


def main():
    cfg = Config(
        sim=SimConfig(
            max_vehicles=N_VEHICLES,
            max_walkers=8,
            max_route_len=256,
            max_scenarios=8,
        )
    )
    town = make_grid_town(n_blocks=2, block=100.0)

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
    # use the PPO-trained expert when available so the benchmark exercises
    # real driving behavior (traffic interactions, light stops)
    ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "runs", "roach_ppo", "ckpt")
    if os.path.isdir(ckpt):
        try:
            from thinktwice_tpu.train.checkpoint import restore_pytree

            params = restore_pytree(ckpt, params)
        except Exception:
            pass  # random weights measure the same compute

    routes = build_routes(town, N_WORLDS, 0)
    keys = jax.random.split(jax.random.key(42), N_WORLDS)
    states = jax.vmap(
        lambda r, k: reset_world(cfg, town, r, k, n_vehicles=N_VEHICLES)
    )(routes, keys)

    def macro_step(states, _):
        """POLICY_EVERY ticks: one policy eval, held control."""
        ctrl = jax.vmap(lambda s: expert_control(cfg, params, town, s)[0])(states)
        for _ in range(POLICY_EVERY):
            states, _ev = jax.vmap(
                lambda s, c: step_world(cfg, town, s, c)
            )(states, ctrl)
        return states, None

    n_macro = N_STEPS // POLICY_EVERY

    @jax.jit
    def run(states):
        return jax.lax.scan(macro_step, states, None, length=n_macro)[0]

    # warmup/compile
    warm = run(states)
    jax.block_until_ready(warm.tick)

    t0 = time.perf_counter()
    out = run(states)
    jax.block_until_ready(out.tick)
    dt = time.perf_counter() - t0

    total_env_steps = N_WORLDS * N_STEPS
    steps_per_sec = total_env_steps / dt
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec_64worlds_roach",
                "value": round(steps_per_sec, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(steps_per_sec / 1000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
