"""Profile the flagship student train step (VERDICT r3 #4).

Usage: python scripts/profile_train.py [--grad-accum K] [--trace]

Round-3 status: 13.5 s/step (collect 5.3 + grad 8.2) at batch 28 with
grad_accum 14, self-described "overhead-bound, not MXU-bound". This script
attributes the time: collect chunk, full train step, forward-only loss, a
cost-analysis FLOP count -> achieved FLOP/s vs the v5e peak (197 TF bf16),
and optionally a jax.profiler trace for op-level drill-down.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from thinktwice_tpu.jaxenv import setup as _jax_setup

_jax_setup()

from thinktwice_tpu.agents.roach import RoachPolicy
from thinktwice_tpu.config import Config, SimConfig, TrainConfig
from thinktwice_tpu.train import checkpoint as ckpt_lib
from thinktwice_tpu.train.loop import (
    collect_stream,
    init_model_params,
    make_model,
    model_loss_fn,
)
from thinktwice_tpu.train.train_step import create_train_state, make_train_step

from train_student_town05 import (  # noqa: E402
    H5,
    MAX_ROUTE_LEN,
    TRAIN_GLOB,
    load_routes,
)

V5E_PEAK_BF16 = 197e12


def timeit(fn, n=3, warmup=1):
    for _ in range(warmup):
        jax.block_until_ready(fn())
    ts = []
    for _ in range(n):
        t0 = time.time()
        jax.block_until_ready(fn())
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grad-accum", type=int, default=14)
    ap.add_argument("--worlds", type=int, default=4)
    ap.add_argument("--frames-per-chunk", type=int, default=12)
    ap.add_argument("--vehicles", type=int, default=24)
    ap.add_argument("--sweeps", type=int, default=2)
    ap.add_argument("--trace", action="store_true",
                    help="write a jax.profiler trace of one step")
    ap.add_argument("--out", default="runs/profile_train.json")
    args = ap.parse_args()

    bank, _ = load_routes()
    import glob as _glob

    from thinktwice_tpu.maps.cache import town05_cached

    routes = jnp.asarray(bank[8:], jnp.float32)
    town = town05_cached(
        H5,
        ["/root/reference/leaderboard/data/routes_for_evaluation/"
         "routes_town05_long.xml"] + sorted(_glob.glob(TRAIN_GLOB))[:4],
        max_lane_pts=49152, max_road_segs=8192, max_lane_segs=8192)

    cfg = Config(
        sim=SimConfig(max_vehicles=args.vehicles + 8, max_walkers=4,
                      max_lights=256, max_stop_signs=32,
                      max_route_len=MAX_ROUTE_LEN, max_scenarios=4),
        train=TrainConfig(grad_accum=args.grad_accum),
    )
    policy = RoachPolicy()
    rparams = policy.init(
        jax.random.key(0),
        jnp.zeros((1, cfg.birdview.n_channels, 192, 192)),
        jnp.zeros((1, cfg.roach.state_dim)),
    )

    model = make_model(cfg, backbone_depth=50, n_sweeps=args.sweeps)
    batches = collect_stream(
        cfg, rparams, town, routes, jax.random.key(0),
        frames_per_chunk=args.frames_per_chunk, n_vehicles=args.vehicles,
        n_sweeps=args.sweeps, n_worlds=args.worlds,
    )

    print("collect: compiling + first chunk...", flush=True)
    t0 = time.time()
    batch = next(batches)
    jax.block_until_ready(batch["imgs"])
    print(f"first chunk (incl compile): {time.time()-t0:.1f}s", flush=True)
    t_collect = timeit(lambda: jax.tree.map(
        lambda x: x, next(batches)), n=3, warmup=1)
    B = batch["imgs"].shape[0]
    print(f"collect chunk: {t_collect:.2f}s for {B} examples", flush=True)

    params = init_model_params(cfg, model, jax.random.key(1))
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"params: {n_params/1e6:.1f}M", flush=True)
    state = create_train_state(cfg, params)
    loss_fn = model_loss_fn(cfg, model)
    step_fn = make_train_step(cfg, loss_fn)

    # forward-only loss on one microbatch
    K = args.grad_accum
    # proportional slice per leaf: per-camera leaves (gt_depth/gt_seg) carry
    # B*n_cams rows, so each microbatch takes shape[0]//K of every leaf
    mb = jax.tree.map(lambda x: x[: max(x.shape[0] // K, 1)], batch)
    fwd = jax.jit(lambda p, b: loss_fn(p, b)[0])
    t_fwd_mb = timeit(lambda: fwd(state.params, mb))
    print(f"fwd loss, 1 microbatch ({max(B//K,1)} ex): {t_fwd_mb:.3f}s",
          flush=True)

    # grad on one microbatch (what the accum scan repeats K times)
    gradf = jax.jit(lambda p, b: jax.grad(
        lambda pp: loss_fn(pp, b)[0])(p))
    t_grad_mb = timeit(lambda: gradf(state.params, mb))
    print(f"grad, 1 microbatch: {t_grad_mb:.3f}s  (xK={K} -> "
          f"{t_grad_mb*K:.1f}s)", flush=True)

    # full train step
    t_step = timeit(lambda: step_fn(state, batch)[1]["loss"], n=3)
    print(f"train step (K={K}): {t_step:.2f}s", flush=True)

    # FLOP accounting (VERDICT r4 task 3): XLA's cost analysis counts a
    # lax.scan body ONCE regardless of trip count, so the whole-step number
    # under-counts the K-trip accumulation scan. Report both the per-
    # microbatch grad FLOPs (from its own compiled program — no scan
    # inside) and step FLOPs = K x grad_mb + optimizer, explicitly.
    flops = flops_grad_mb = None
    try:
        comp = gradf.lower(state.params, mb).compile()
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops_grad_mb = float(ca.get("flops", 0.0))
        comp = jax.jit(step_fn).lower(state, batch).compile()
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
    except Exception as e:  # axon may not expose cost analysis
        print(f"cost_analysis unavailable: {e}", flush=True)
    if flops_grad_mb:
        step_true = flops_grad_mb * K
        print(f"grad FLOPs per microbatch: {flops_grad_mb/1e12:.2f} TF "
              f"(x{K} trips = {step_true/1e12:.2f} TF/step; whole-step "
              f"cost_analysis reports {flops/1e12:.2f} TF, scan body "
              f"counted once)", flush=True)
        mfu_mb = flops_grad_mb / t_grad_mb / V5E_PEAK_BF16
        mfu = step_true / t_step / V5E_PEAK_BF16
        print(f"achieved: {flops_grad_mb/t_grad_mb/1e12:.1f} TF/s in the "
              f"grad microbatch (MFU {100*mfu_mb:.1f}%), "
              f"{step_true/t_step/1e12:.1f} TF/s across the step "
              f"(MFU {100*mfu:.1f}%) of v5e bf16 peak", flush=True)

    if args.trace:
        tdir = os.path.join(os.path.dirname(os.path.abspath(args.out)),
                            "trace_train")
        with jax.profiler.trace(tdir):
            jax.block_until_ready(step_fn(state, batch)[1]["loss"])
        print(f"trace written to {tdir}", flush=True)

    import json

    rec = {
        "batch": int(B),
        "grad_accum": K,
        "collect_s": round(t_collect, 3),
        "fwd_microbatch_s": round(t_fwd_mb, 4),
        "grad_microbatch_s": round(t_grad_mb, 4),
        "step_s": round(t_step, 3),
        "flops": flops,
        "flops_grad_microbatch": flops_grad_mb,
        "flops_step_true": (flops_grad_mb * K) if flops_grad_mb else None,
        "params_m": round(n_params / 1e6, 1),
    }
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
