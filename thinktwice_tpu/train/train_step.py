"""pjit training step: data-parallel over a device mesh.

Replaces the reference's mmcv trainer stack (code/apis/mmdet_train.py:28-201:
MMDistributedDataParallel with NCCL allreduce, SyncBN, EpochBasedRunner with
LR hooks) with the TPU-native formulation:

- one `Mesh` with a `data` axis; the batch is sharded over it, parameters are
  replicated; XLA inserts the gradient all-reduce over ICI (§2.10/§5.8 of
  SURVEY.md — the reference's only parallelism is DP, so a 1-axis mesh is
  parity; the mesh generalizes to more axes when needed),
- optax AdamW (lr 1e-4, weight decay 0.01) + linear-warmup cosine schedule +
  global-norm clip 35 (configs/thinktwice.py optimizer/lr_config,
  grad_clip=35 from mmcv optimizer_config),
- loss-scalar metrics are averaged across devices by the same jit (the
  explicit allreduce at encoder_decoder_framework.py:436-438 falls out of the
  SPMD program).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from thinktwice_tpu.config import Config


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    t = cfg.train
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=t.lr * 1e-3,
        peak_value=t.lr,
        warmup_steps=t.warmup_steps,
        decay_steps=t.total_steps,
        end_value=t.lr * 1e-2,
    )
    return optax.chain(
        optax.clip_by_global_norm(t.grad_clip),
        optax.adamw(schedule, weight_decay=t.weight_decay),
    )


def create_train_state(cfg: Config, params) -> TrainState:
    tx = make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
    )


def data_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(devices, axis_names=("data",))


def shard_batch(mesh: Mesh, batch):
    """Place a host batch sharded on axis 0 over the data axis."""
    sharding = NamedSharding(mesh, P("data"))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def make_train_step(
    cfg: Config, loss_fn: Callable[[Any, Any], tuple[jax.Array, dict]]
):
    """loss_fn(params, batch) -> (scalar loss, metrics dict). Returns a jitted
    (state, batch) -> (state, metrics). Under a mesh-sharded batch the grads
    all-reduce automatically."""
    tx = make_optimizer(cfg)

    K = cfg.train.grad_accum
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    @jax.jit
    def step(state: TrainState, batch):
        if K <= 1:
            (loss, metrics), grads = grad_fn(state.params, batch)
        else:
            # microbatch accumulation: (B, ...) -> (K, B/K, ...), scan the
            # grad over chunks; peak activation memory = one chunk's
            mbs = jax.tree.map(
                lambda x: x.reshape((K, x.shape[0] // K) + x.shape[1:]),
                batch,
            )
            mb0 = jax.tree.map(lambda x: x[0], mbs)
            (_, m_shape), g_shape = jax.eval_shape(grad_fn, state.params, mb0)
            zeros = lambda t: jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), t
            )

            def body(carry, mb):
                gs, ls, ms = carry
                (l, m), g = grad_fn(state.params, mb)
                return (
                    jax.tree.map(jnp.add, gs, g),
                    ls + l,
                    jax.tree.map(jnp.add, ms, m),
                ), None

            (gsum, lsum, msum), _ = jax.lax.scan(
                body, (zeros(g_shape), jnp.zeros(()), zeros(m_shape)), mbs
            )
            grads = jax.tree.map(lambda x: x / K, gsum)
            loss = lsum / K
            metrics = jax.tree.map(lambda x: x / K, msum)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            TrainState(step=state.step + 1, params=new_params, opt_state=new_opt),
            metrics,
        )

    return step
