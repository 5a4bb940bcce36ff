"""CLI entry points: collect / train / evaluate / benchmark.

The reference drives everything through env-var bash scripts
(leaderboard/scripts/*.sh: ROUTES/SCENARIOS/CHECKPOINT_ENDPOINT/ports...) and
torch.distributed.launch (docs/TRAIN.md). Here one argparse tree; no env-var
behavior switches (SURVEY §5.6).

    python -m thinktwice_tpu.cli evaluate --routes <xml> --agent autopilot
    python -m thinktwice_tpu.cli collect  --frames 64 --out data/run0
    python -m thinktwice_tpu.cli train    --steps 100 --ckpt-dir ckpts
    python -m thinktwice_tpu.cli benchmark
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")


def _configure_jax():
    """The installed TPU plugin ignores the JAX_PLATFORMS/cache env vars, so
    honor them through the config API before any backend initialization
    (tests force CPU this way; see tests/conftest.py)."""
    import jax

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _build_world(args):
    from thinktwice_tpu.config import Config, SimConfig
    from thinktwice_tpu.maps.procedural import make_grid_town

    cfg = Config(
        sim=SimConfig(
            max_vehicles=args.vehicles if args.vehicles > 0 else 32,
            max_walkers=16,
            max_route_len=args.route_len,
            max_scenarios=16,
        )
    )
    town = make_grid_town(n_blocks=args.blocks, block=100.0)
    return cfg, town


def cmd_evaluate(args):
    import numpy as np

    from thinktwice_tpu.agents.autopilot import autopilot_control
    from thinktwice_tpu.harness.evaluator import evaluate_routes
    from thinktwice_tpu.harness.route_parser import parse_routes_file
    from thinktwice_tpu.harness.statistics import PENALTY_STOP

    cfg, town = _build_world(args)

    scenarios = None
    if args.routes:
        specs = parse_routes_file(args.routes)
        routes = [s.dense(spacing=1.0) for s in specs]
        ids = [s.route_id for s in specs]
        if args.scenarios:
            from thinktwice_tpu.harness.evaluator import build_route_scenarios
            from thinktwice_tpu.harness.route_parser import (
                match_scenarios_to_route,
                parse_scenarios_file,
            )

            scenarios = []
            for spec, dense in zip(specs, routes):
                trigs = parse_scenarios_file(args.scenarios, spec.town)
                matched = match_scenarios_to_route(trigs, dense)
                scenarios.append(build_route_scenarios(cfg, dense, matched))
    else:
        # built-in smoke routes on the procedural town
        routes, ids = [], []
        for i in range(args.n_routes):
            xs = np.linspace(5.0, 180.0, 256)
            y = 98.25 if i % 2 == 0 else 198.25
            routes.append(
                np.stack([xs, np.full_like(xs, y), np.zeros_like(xs)], 1)
            )
            ids.append(str(i))

    assert args.agent == "autopilot", "round-1 CLI supports the autopilot agent"
    g = evaluate_routes(
        cfg, town, routes, ids,
        policy_fn=autopilot_control,
        n_vehicles=args.vehicles,
        worlds_per_batch=args.batch,
        out_path=args.out,
        resume=args.resume,
        stop_penalty=1.0 if args.benchmark == "longest6" else PENALTY_STOP,
        scenarios=scenarios,
    )
    print(json.dumps(g["scores"], indent=2))


def cmd_collect(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from thinktwice_tpu.agents.roach import RoachPolicy
    from thinktwice_tpu.sim.reset import reset_world
    from thinktwice_tpu.train.collect import collect_batch, frames_to_batch
    from thinktwice_tpu.train.checkpoint import save_pytree

    cfg, town = _build_world(args)
    policy = RoachPolicy()
    params = policy.init(
        jax.random.key(0),
        jnp.zeros((1, cfg.birdview.n_channels, 192, 192)),
        jnp.zeros((1, cfg.roach.state_dim)),
    )
    xs = np.linspace(5.0, 180.0, 256)
    route = jnp.asarray(
        np.stack([xs, np.full_like(xs, 98.25), np.zeros_like(xs)], 1), jnp.float32
    )
    st = reset_world(cfg, town, route, jax.random.key(args.seed),
                     n_vehicles=args.vehicles)
    final, frames, sensors = jax.jit(
        collect_batch, static_argnums=(0, 4)
    )(cfg, params, town, st, args.frames)
    batch = frames_to_batch(cfg, frames, sensors)
    os.makedirs(args.out, exist_ok=True)
    save_pytree(os.path.join(args.out, "batch"), jax.device_get(batch))
    print(f"collected {args.frames} frames -> {args.out} "
          f"(completion {float(final.criteria.route_completion):.2%})")


def cmd_train(args):
    """Train the student on in-graph collected data (tiny-config friendly)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from thinktwice_tpu.agents.roach import RoachPolicy
    from thinktwice_tpu.train import checkpoint as ckpt_lib
    from thinktwice_tpu.train.loop import collect_stream, make_model, train

    cfg, town = _build_world(args)
    policy = RoachPolicy()
    rparams = policy.init(
        jax.random.key(0),
        jnp.zeros((1, cfg.birdview.n_channels, 192, 192)),
        jnp.zeros((1, cfg.roach.state_dim)),
    )
    if args.roach_ckpt:
        rparams = ckpt_lib.restore_pytree(args.roach_ckpt, rparams)
    xs = np.linspace(5.0, 180.0, 256)
    routes = jnp.asarray(
        np.stack(
            [
                np.stack([xs, np.full_like(xs, 98.25), np.zeros_like(xs)], 1),
                np.stack([xs, np.full_like(xs, 198.25), np.zeros_like(xs)], 1),
            ]
        ),
        jnp.float32,
    )
    model = make_model(cfg, backbone_depth=args.backbone)
    batches = collect_stream(
        cfg, rparams, town, routes, jax.random.key(cfg.train.seed),
        frames_per_chunk=args.frames_per_chunk, n_vehicles=args.vehicles,
    )
    train(
        cfg, model, batches, n_steps=args.steps,
        ckpt_dir=args.ckpt_dir, log_path=os.path.join(args.ckpt_dir, "train.jsonl")
        if args.ckpt_dir else None,
        resume=args.resume,
    )


def cmd_benchmark(args):
    import subprocess

    subprocess.run([sys.executable, os.path.join(os.path.dirname(__file__), "..", "bench.py")])


def main():
    _configure_jax()
    p = argparse.ArgumentParser(prog="thinktwice_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--vehicles", type=int, default=16)
        sp.add_argument("--blocks", type=int, default=2)
        sp.add_argument("--route-len", type=int, default=1024)
        sp.add_argument("--seed", type=int, default=0)

    e = sub.add_parser("evaluate")
    common(e)
    e.add_argument("--routes", default=None, help="route XML (reference format)")
    e.add_argument("--scenarios", default=None,
                   help="scenario JSON (reference format)")
    e.add_argument("--agent", default="autopilot")
    e.add_argument("--n-routes", type=int, default=4)
    e.add_argument("--batch", type=int, default=4)
    e.add_argument("--out", default=None)
    e.add_argument("--resume", action="store_true")
    e.add_argument("--benchmark", default="town05long")
    e.set_defaults(fn=cmd_evaluate)

    c = sub.add_parser("collect")
    common(c)
    c.add_argument("--frames", type=int, default=32)
    c.add_argument("--out", default="data/run0")
    c.set_defaults(fn=cmd_collect)

    t = sub.add_parser("train")
    common(t)
    t.add_argument("--steps", type=int, default=100)
    t.add_argument("--ckpt-dir", default="ckpts")
    t.add_argument("--backbone", type=int, default=50)
    t.add_argument("--frames-per-chunk", type=int, default=12,
                   help="frames collected per chunk; batch = chunk - pred_len")
    t.add_argument("--roach-ckpt", default=None,
                   help="orbax dir of PPO-trained expert params")
    t.add_argument("--resume", action="store_true")
    t.set_defaults(fn=cmd_train)

    b = sub.add_parser("benchmark")
    b.set_defaults(fn=cmd_benchmark)

    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
