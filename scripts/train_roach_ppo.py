"""Train the Roach expert with PPO on the in-graph world (TPU).

Usage: python scripts/train_roach_ppo.py [--iters N] [--envs W] [--out DIR]

Produces orbax checkpoints of the policy params + a JSONL metric log. The
reference never trains Roach in-repo (it loads carla-roach's 11.8M-step
checkpoint); with the vectorized in-graph env this runs at hundreds of
thousands of env-steps per minute on one chip.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax
import jax.numpy as jnp
import numpy as np

from thinktwice_tpu.config import Config, SimConfig
from thinktwice_tpu.maps.procedural import make_grid_town
from thinktwice_tpu.train import checkpoint as ckpt_lib
from thinktwice_tpu.train.ppo import PPOConfig, make_ppo


def build_routes(n_envs: int, n_blocks: int = 2, block: float = 100.0):
    """Varied straight + turning routes over the grid town lanes."""
    half = 1.75
    rows = [g + half for g in range(0, int(n_blocks * block) + 1, int(block))]
    cols = [g - half for g in range(0, int(n_blocks * block) + 1, int(block))]
    routes = []
    rng = np.random.RandomState(0)
    for i in range(n_envs):
        kind = i % 4
        length = 160.0
        n = 256
        if kind == 0:    # eastbound on a row
            y = rows[i % len(rows)] - 2 * half  # right lane y = g - 1.75
            xs = np.linspace(5.0, 5.0 + length, n)
            r = np.stack([xs, np.full_like(xs, y + 0), np.zeros_like(xs)], 1)
            r[:, 1] = rows[i % len(rows)] - 2 * half
        elif kind == 1:  # westbound
            y = rows[i % len(rows)]
            xs = np.linspace(5.0 + length, 5.0, n)
            r = np.stack([xs, np.full_like(xs, y), np.full_like(xs, np.pi)], 1)
        elif kind == 2:  # northbound on a column (right lane x = g + 1.75)
            x = cols[i % len(cols)] + 2 * half
            ys = np.linspace(5.0, 5.0 + length, n)
            r = np.stack([np.full_like(ys, x), ys, np.full_like(ys, np.pi / 2)], 1)
        else:            # southbound
            x = cols[i % len(cols)]
            ys = np.linspace(5.0 + length, 5.0, n)
            r = np.stack([np.full_like(ys, x), ys, np.full_like(ys, -np.pi / 2)], 1)
        routes.append(r)
    return jnp.asarray(np.stack(routes), jnp.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--envs", type=int, default=32)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--out", default="runs/roach_ppo")
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    cfg = Config(
        sim=SimConfig(max_vehicles=8, max_walkers=4, max_route_len=256,
                      max_scenarios=4)
    )
    town = make_grid_town(2, 100.0)
    routes = build_routes(args.envs)
    pcfg = PPOConfig(n_envs=args.envs, n_steps=args.steps, n_epochs=4,
                     minibatch=512, lr=3e-4)
    init_fn, iterate_fn = make_ppo(cfg, pcfg, town, routes)
    params, opt_state, env_states = init_fn(jax.random.key(0))

    os.makedirs(args.out, exist_ok=True)
    ckpt_dir = os.path.join(os.path.abspath(args.out), "ckpt")
    if args.resume and os.path.isdir(ckpt_dir):
        params = ckpt_lib.restore_pytree(ckpt_dir, params)
        print("resumed params")

    log = open(os.path.join(args.out, "metrics.jsonl"), "a")
    t0 = time.time()
    steps_per_iter = args.envs * args.steps
    for it in range(args.iters):
        params, opt_state, env_states, m = iterate_fn(
            params, opt_state, env_states, jax.random.key(1000 + it)
        )
        rec = {k: round(float(v), 5) for k, v in m.items()}
        rec["iter"] = it
        rec["env_steps"] = (it + 1) * steps_per_iter
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
