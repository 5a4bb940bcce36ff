"""Training driver: the mmcv EpochBasedRunner stack as a plain loop.

Reference equivalent: code/apis/mmdet_train.py:28-201 (DDP model, AdamW,
epoch runner with LR/ckpt/logger/eval hooks) fed by dataloader workers doing
PNG decode + augmentation. Here the data either comes from the in-graph
collector (expert drives, sensors render — no files at all) or from the
reference on-disk dataset; the train step is the mesh-sharded jit from
train_step.py; checkpoints via orbax; metrics to stdout/JSONL.
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from thinktwice_tpu.config import Config
from thinktwice_tpu.maps.town import TownMap
from thinktwice_tpu.models import rig as rig_lib
from thinktwice_tpu.models.encoder_decoder import ThinkTwiceModel, total_loss
from thinktwice_tpu.sim.reset import reset_world
from thinktwice_tpu.train import checkpoint as ckpt_lib
from thinktwice_tpu.train.collect import collect_batch, frames_to_batch
from thinktwice_tpu.train.train_step import (
    TrainState,
    create_train_state,
    make_train_step,
)


def make_model(cfg: Config, backbone_depth: int = 50, n_sweeps: int = 1):
    return ThinkTwiceModel(
        cfg.model, backbone_depth=backbone_depth, n_sweeps=n_sweeps,
        use_lidar=True,
    )


def model_loss_fn(cfg: Config, model: ThinkTwiceModel):
    c2e = jnp.asarray(rig_lib.cam_to_ego(cfg.camera))
    K = jnp.asarray(rig_lib.intrinsics(cfg.camera))
    e2i = jnp.asarray(rig_lib.ego_to_img(cfg.camera))

    # remat lives INSIDE the model at structural boundaries (per ResNet
    # block, per decoder refine layer — see models/resnet.py, decoder.py).
    # A whole-model jax.checkpoint on top of those nested remats made the
    # XLA scheduler retain 57-91 GB of temps on the 15.75 GB chip.

    def loss_fn(params, batch):
        outs = model.apply(
            params,
            batch["imgs"], batch["points"], batch["points_mask"],
            batch["speed"], batch["target_point"], batch["command"],
            c2e, K, e2i,
            batch.get("teacher_wp"), batch.get("teacher_ctrl_sp"),
            sweep2key=batch.get("sweep2key"),
            ida=batch.get("ida"),
        )
        return total_loss(cfg.model, outs, batch)

    return loss_fn


def init_model_params(cfg: Config, model: ThinkTwiceModel, rng, n_points: int = 1024):
    B, N = 1, cfg.camera.n_cams
    m = cfg.model
    args = [
        jnp.zeros((B, model.n_sweeps, N, m.img_height, m.img_width, 3)),
        jnp.zeros((B, n_points, 5)),
        jnp.ones((B, n_points), bool),
        jnp.zeros((B,)),
        jnp.zeros((B, 2)),
        jnp.zeros((B, 6)),
        jnp.asarray(rig_lib.cam_to_ego(cfg.camera)),
        jnp.asarray(rig_lib.intrinsics(cfg.camera)),
        jnp.asarray(rig_lib.ego_to_img(cfg.camera)),
        jnp.zeros((B, m.pred_len, 2)),
        jnp.ones((B, m.pred_len, 4)),
    ]
    return jax.jit(model.init)(rng, *args)


def collect_stream(
    cfg: Config,
    roach_params,
    town: TownMap,
    routes,                # (W, R, 3) array of routes for the world batch
    rng,
    frames_per_chunk: int = 16,
    n_vehicles: int = 8,
    n_sweeps: int = 1,
    n_worlds: int = 1,
    scenarios=None,        # optional (NR,)-stacked ScenarioState bank
) -> Iterator[dict]:
    """Infinite stream of training batches from in-graph expert rollouts.

    Each yield collects `frames_per_chunk` frames from `n_worlds` vmapped
    rolling worlds (each on its own route — consecutive batches mix worlds,
    so examples are not one temporally-correlated trajectory) and converts
    them to n_worlds x (frames_per_chunk - pred_len - (n_sweeps-1)) examples.
    World states persist across chunks (so mid- and late-route data is
    collected); a world only resets — onto the next route, round-robin —
    once its criteria report done (terminal or route finished)."""
    collect_v = jax.jit(
        jax.vmap(collect_batch, in_axes=(None, None, None, 0, None)),
        static_argnums=(0, 4),
    )
    b2b_v = jax.jit(
        jax.vmap(
            lambda f, s: frames_to_batch(
                cfg, f, s, cfg.model.pred_len, n_sweeps=n_sweeps
            )
        )
    )
    reset_v = jax.jit(
        jax.vmap(
            lambda route, key, scen: reset_world(
                cfg, town, route, key, n_vehicles=n_vehicles, scenario=scen
            )
        )
    )

    from thinktwice_tpu.sim.state import zero_scenarios

    NR = routes.shape[0]
    next_route = 0

    def fresh_states(n, done_mask=None):
        """Full-batch vmapped reset (one compiled program); fresh routes are
        consumed only for the worlds that actually reset, so the route
        round-robin is not stride-aliased by the batch size."""
        nonlocal next_route, rng
        idxs = []
        for i in range(n):
            if done_mask is None or done_mask[i]:
                idxs.append(next_route % NR)
                next_route += 1
            else:
                idxs.append(0)  # discarded by the jnp.where merge
        rng, sub = jax.random.split(rng)
        ids = jnp.asarray(idxs)
        if scenarios is not None:
            scen = jax.tree.map(lambda x: x[ids], scenarios)
        else:
            z = zero_scenarios(cfg)
            scen = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (n,) + x.shape), z
            )
        return reset_v(routes[ids], jax.random.split(sub, n), scen)

    states = fresh_states(n_worlds)
    while True:
        done = np.asarray(jax.device_get(states.criteria.done))
        if done.any():
            # round-robin the finished worlds onto the next routes
            fresh = fresh_states(n_worlds, done)
            dmask = jnp.asarray(done)
            states = jax.tree.map(
                lambda f, s: jnp.where(
                    jnp.reshape(dmask, dmask.shape + (1,) * (f.ndim - 1)), f, s
                ),
                fresh, states,
            )
        states, frames, sensors = collect_v(
            cfg, roach_params, town, states, frames_per_chunk
        )
        batch = b2b_v(frames, sensors)
        # (W, B, ...) -> (W*B, ...): one training batch mixing all worlds
        yield jax.tree.map(
            lambda x: x.reshape((-1,) + x.shape[2:]), batch
        )


def make_eval_fn(cfg: Config, model: ThinkTwiceModel):
    """Validation pass ≡ the reference's CustomEvalHook
    (code/core/evaluation/eval_hooks.py:30-153): run the same losses over val
    batches without gradients and average the log_vars."""
    loss_fn = model_loss_fn(cfg, model)

    @jax.jit
    def eval_batch(params, batch):
        _, metrics = loss_fn(params, batch)
        return metrics

    def evaluate(params, val_batches) -> dict:
        acc: dict = {}
        n = 0
        for batch in val_batches:
            m = eval_batch(params, batch)
            for k, v in m.items():
                acc[k] = acc.get(k, 0.0) + float(v)
            n += 1
        return {f"val_{k}": v / max(n, 1) for k, v in acc.items()}

    return evaluate


def train(
    cfg: Config,
    model: ThinkTwiceModel,
    batches: Iterator[dict],
    n_steps: int,
    ckpt_dir: str | None = None,
    log_path: str | None = None,
    resume: bool = False,
    params=None,
    log_every: int = 10,
    ckpt_every: int = 500,
    val_batches_fn=None,
    eval_every: int = 500,
    augment_mirror: bool = False,
    augment_ida: bool = False,
    reuse_batches: int = 1,
):
    """Run n_steps of training over the batch stream. Returns TrainState.

    reuse_batches > 1 runs that many optimizer steps per collected chunk
    (fresh mirror/IDA augmentation each use). The in-graph collect is the
    reference's entire dataloader+fleet stage; reusing each chunk a few
    times mirrors the reference's epoch-style reuse of a fixed dataset
    (60 epochs over 189K frames, docs/TRAIN.md:8) while amortizing the
    render cost — round 3's 13.5 s/step was 5.3 s collect + 8.2 s grad."""
    if params is None:
        params = init_model_params(cfg, model, jax.random.key(cfg.train.seed))
    state = create_train_state(cfg, params)
    if resume and ckpt_dir:
        try:
            state = ckpt_lib.restore_train_state(ckpt_dir, state)
            print(f"resumed from step {int(state.step)}")
        except FileNotFoundError:
            # The orbax dir is gitignored; after a re-clone only the
            # committed params.msgpack survives (ADVICE r3). Resume the
            # params from it (fresh optimizer state) rather than silently
            # restarting from scratch.
            archive = os.path.join(os.path.dirname(ckpt_dir),
                                   "params.msgpack")
            if os.path.exists(archive):
                params = ckpt_lib.restore_archive(archive, state.params)
                state = create_train_state(cfg, params)
                print(f"no orbax checkpoint in {ckpt_dir}; resumed params "
                      f"from {archive} (fresh opt state)")
            else:
                print(f"no checkpoint in {ckpt_dir} and no params.msgpack "
                      "archive; starting from scratch")

    step_fn = make_train_step(cfg, model_loss_fn(cfg, model))
    # jit the augmentations once: called eagerly they dispatch hundreds of
    # ops per step through the (tunneled) device — measured ~3 s/step of
    # pure dispatch latency on top of the 4.6 s compiled train step
    from thinktwice_tpu.train.augment import ida_augment, maybe_mirror

    mirror_j = jax.jit(maybe_mirror)
    ida_j = jax.jit(ida_augment)
    logf = open(log_path, "a") if log_path else None
    aug_rng = jax.random.key(cfg.train.seed + 1)
    t0 = time.time()
    collect_s = grad_s = 0.0
    raw_batch = None
    for i in range(n_steps):
        tc = time.time()
        if raw_batch is None or i % max(reuse_batches, 1) == 0:
            raw_batch = next(batches)
            jax.block_until_ready(raw_batch["imgs"])
        batch = raw_batch
        collect_s += time.time() - tc
        tg = time.time()
        if augment_mirror:
            aug_rng, sub = jax.random.split(aug_rng)
            batch = mirror_j(sub, batch)
        if augment_ida:
            aug_rng, sub = jax.random.split(aug_rng)
            batch = ida_j(sub, batch)
        state, metrics = step_fn(state, batch)
        jax.block_until_ready(metrics["loss"])
        grad_s += time.time() - tg
        if (i + 1) % log_every == 0 or i == 0:
            host = {
                k: round(float(v), 5)
                for k, v in metrics.items()
            }
            host["step"] = int(state.step)
            host["wall_s"] = round(time.time() - t0, 1)
            host["collect_s"] = round(collect_s, 1)
            host["grad_s"] = round(grad_s, 1)
            line = json.dumps(host)
            print(line, flush=True)
            if logf:
                logf.write(line + "\n")
                logf.flush()
        if ckpt_dir and (int(state.step) % ckpt_every == 0):
            ckpt_lib.save_train_state(ckpt_dir, state)
            # durable params-only snapshot next to the gitignored orbax dir
            # (lossless msgpack, small enough to commit — see archive_params)
            ckpt_lib.archive_params(
                os.path.join(os.path.dirname(ckpt_dir), "params.msgpack"),
                state.params)
        if val_batches_fn is not None and (int(state.step) % eval_every == 0):
            ev = make_eval_fn(cfg, model)(state.params, val_batches_fn())
            line = json.dumps({**ev, "step": int(state.step)})
            print(line, flush=True)
            if logf:
                logf.write(line + "\n")
                logf.flush()
    if ckpt_dir:
        ckpt_lib.save_train_state(ckpt_dir, state)
        ckpt_lib.archive_params(
            os.path.join(os.path.dirname(ckpt_dir), "params.msgpack"),
            state.params)
    if logf:
        logf.close()
    return state
