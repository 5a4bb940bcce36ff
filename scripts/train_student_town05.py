"""Train the ThinkTwice student on Town05 with in-graph expert collection.

Usage: python scripts/train_student_town05.py [--steps N] [--out DIR]

The end-to-end distillation pipeline on the real map: the PPO-trained Roach
expert drives diverse Town05 training routes with traffic, sensors render
in-graph, batches assemble with future-frame supervision (incl. the future
Roach grids for the teacher-forcing distillation terms), and the flagship
encoder-decoder trains with IDA + mirror augmentation. Held-out routes give
val acceptance metrics (docs/DATA_PREP.md:57: current_throttle_brake_offset
< 0.1, longitudinal_offset < 0.2 — measured on data the model never trained
on, unlike round 1's training-stream numbers).
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

from thinktwice_tpu.agents.roach import RoachPolicy
from thinktwice_tpu.config import Config, SimConfig, TrainConfig
from thinktwice_tpu.harness.evaluator import (
    build_route_scenarios,
    derive_map_triggers,
)
from thinktwice_tpu.harness.route_parser import parse_routes_file
from thinktwice_tpu.maps.compile_h5 import compile_town
from thinktwice_tpu.maps.router import raster_planner
from thinktwice_tpu.train import checkpoint as ckpt_lib
from thinktwice_tpu.train.loop import collect_stream, make_model, train

H5 = "/root/reference/roach/obs_manager/birdview/maps/Town05.h5"
TRAIN_GLOB = (
    "/root/reference/leaderboard/data/routes_for_open_loop_training/"
    "routes_town05_0*.xml"
)
MAX_ROUTE_LEN = 384


def load_routes(n_files=4, min_len=60.0, max_routes=96):
    specs = []
    for f in sorted(glob.glob(TRAIN_GLOB))[:n_files]:
        specs.extend(parse_routes_file(f))
    planner = raster_planner(H5)
    routes, polys = [], []
    for s in specs:
        raw = s.dense(spacing=1.0, planner=planner)
        length = float(np.linalg.norm(np.diff(raw[:, :2], axis=0), axis=1).sum())
        if length < min_len or length > MAX_ROUTE_LEN - 10:
            continue
        routes.append(s.dense(spacing=1.0, max_len=MAX_ROUTE_LEN,
                               planner=planner))
        polys.append(raw)
        if len(routes) >= max_routes:
            break
    return np.stack(routes), polys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--backbone", type=int, default=50)
    ap.add_argument("--sweeps", type=int, default=2)
    ap.add_argument("--vehicles", type=int, default=24)
    ap.add_argument("--frames-per-chunk", type=int, default=12)
    ap.add_argument("--worlds", type=int, default=4,
                    help="vmapped rolling collection worlds per batch")
    ap.add_argument("--expert-ckpt", default="runs/roach_town05/ckpt")
    ap.add_argument("--out", default="runs/student_town05")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--eval-every", type=int, default=250)
    ap.add_argument("--ckpt-every", type=int, default=250)
    ap.add_argument("--grad-accum", type=int, default=7,
                    help="microbatches per step (must divide the batch "
                         "worlds*(frames_per_chunk-pred_len-(sweeps-1))); "
                         "bounds activation HBM to one microbatch")
    ap.add_argument("--img-h", type=int, default=0,
                    help="override image height (VERDICT r4 task 8: quantify "
                         "the 256x512 flagship vs the reference's 448x896, "
                         "configs/thinktwice.py ida final_dim)")
    ap.add_argument("--img-w", type=int, default=0)
    ap.add_argument("--lr-total-steps", type=int, default=60_000,
                    help="cosine-decay horizon (TrainConfig.total_steps): "
                         "set to the planned TOTAL optimizer steps so the "
                         "LR actually anneals over the run instead of "
                         "sitting at peak (the reference's cosine spans its "
                         "full 60-epoch budget, configs/thinktwice.py:288)")
    ap.add_argument("--reuse", type=int, default=1,
                    help="optimizer steps per collected chunk (fresh "
                         "mirror/IDA augmentation per use; amortizes the "
                         "in-graph render like the reference's 60-epoch "
                         "reuse of its fixed dataset)")
    args = ap.parse_args()

    bank, polys = load_routes()
    n_val = 8
    train_routes = jnp.asarray(bank[n_val:], jnp.float32)
    val_routes = jnp.asarray(bank[:n_val], jnp.float32)
    from thinktwice_tpu.maps.cache import town05_cached

    eval_routes_xml = ("/root/reference/leaderboard/data/"
                      "routes_for_evaluation/routes_town05_long.xml")
    town = town05_cached(
        H5, [eval_routes_xml] + sorted(glob.glob(TRAIN_GLOB))[:4],
        max_lane_pts=49152, max_road_segs=8192, max_lane_segs=8192)
    print(f"routes: {len(bank) - n_val} train / {n_val} val")

    cfg = Config(
        sim=SimConfig(
            # +8 slots reserved above background traffic for scenario actors
            max_vehicles=args.vehicles + 8,
            max_walkers=4,
            max_lights=256,
            max_stop_signs=32,
            max_route_len=MAX_ROUTE_LEN,
            max_scenarios=4,
        ),
        train=TrainConfig(grad_accum=args.grad_accum,
                          total_steps=args.lr_total_steps),
    )
    if args.img_h and args.img_w:
        import dataclasses as _dc

        from thinktwice_tpu.config import CameraConfig, ModelConfig

        cfg = _dc.replace(
            cfg,
            model=_dc.replace(cfg.model, img_height=args.img_h,
                              img_width=args.img_w),
            camera=_dc.replace(cfg.camera, height=args.img_h,
                               width=args.img_w),
        )
        print(f"image resolution override: {args.img_h}x{args.img_w}")

    # adversarial-scenario bank per route (the reference's collection runs
    # with scenarios active, so the expert demonstrates reactions and the
    # student sees walkers/crossing traffic in its training frames)
    def scen_bank(route_arr):
        scens = [
            build_route_scenarios(
                cfg, np.asarray(r), derive_map_triggers(town, np.asarray(r),
                                                        n_walker_triggers=2)
            )
            for r in route_arr
        ]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *scens)

    train_scens = scen_bank(train_routes)
    val_scens = scen_bank(val_routes)

    policy = RoachPolicy()
    rparams = policy.init(
        jax.random.key(0),
        jnp.zeros((1, cfg.birdview.n_channels, 192, 192)),
        jnp.zeros((1, cfg.roach.state_dim)),
    )
    rparams = ckpt_lib.restore_pytree(os.path.abspath(args.expert_ckpt), rparams)
    print(f"expert loaded from {args.expert_ckpt}")

    model = make_model(cfg, backbone_depth=args.backbone, n_sweeps=args.sweeps)
    batches = collect_stream(
        cfg, rparams, town, train_routes, jax.random.key(cfg.train.seed),
        frames_per_chunk=args.frames_per_chunk, n_vehicles=args.vehicles,
        n_sweeps=args.sweeps, n_worlds=args.worlds, scenarios=train_scens,
    )

    def val_batches_fn(n_chunks: int = 4):
        stream = collect_stream(
            cfg, rparams, town, val_routes, jax.random.key(999),
            frames_per_chunk=args.frames_per_chunk, n_vehicles=args.vehicles,
            n_sweeps=args.sweeps, n_worlds=2, scenarios=val_scens,
        )
        return [next(stream) for _ in range(n_chunks)]

    os.makedirs(args.out, exist_ok=True)
    train(
        cfg, model, batches, n_steps=args.steps,
        ckpt_dir=os.path.join(os.path.abspath(args.out), "ckpt"),
        log_path=os.path.join(args.out, "train.jsonl"),
        resume=args.resume,
        augment_mirror=True,
        augment_ida=True,
        val_batches_fn=val_batches_fn,
        eval_every=args.eval_every,
        ckpt_every=args.ckpt_every,
        reuse_batches=args.reuse,
    )


if __name__ == "__main__":
    main()
