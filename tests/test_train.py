"""Training-step + sharding + checkpoint tests (8 virtual CPU devices)."""

import jax
import jax.numpy as jnp
import numpy as np

from thinktwice_tpu.config import Config, TrainConfig
from thinktwice_tpu.train.train_step import (
    TrainState,
    create_train_state,
    data_mesh,
    make_train_step,
    replicate,
    shard_batch,
)


def tiny_loss(params, batch):
    pred = batch["x"] @ params["w"]
    loss = jnp.mean((pred - batch["y"]) ** 2)
    return loss, {"loss": loss}


def make_state(cfg):
    params = {"w": jnp.ones((4, 2))}
    return create_train_state(cfg, params)


def test_train_step_decreases_loss():
    cfg = Config(train=TrainConfig(lr=0.05, warmup_steps=1, total_steps=100))
    state = make_state(cfg)
    step = make_train_step(cfg, tiny_loss)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(32, 4), jnp.float32)
    y = jnp.zeros((32, 2))
    batch = {"x": x, "y": y}
    losses = []
    for _ in range(30):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.7
    assert int(state.step) == 30


def test_train_step_sharded_matches_single(eight_devices):
    cfg = Config(train=TrainConfig(lr=0.01, warmup_steps=1, total_steps=100))
    mesh = data_mesh(eight_devices)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(16, 4), jnp.float32)
    y = jnp.asarray(rng.randn(16, 2), jnp.float32)
    batch = {"x": x, "y": y}

    state1 = make_state(cfg)
    step = make_train_step(cfg, tiny_loss)
    state1, m1 = step(state1, batch)

    state2 = replicate(mesh, make_state(cfg))
    sharded = shard_batch(mesh, batch)
    state2, m2 = step(state2, sharded)

    np.testing.assert_allclose(
        np.asarray(state1.params["w"]), np.asarray(state2.params["w"]),
        rtol=1e-5,
    )
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)


def test_grad_clipping_applied():
    cfg = Config(train=TrainConfig(lr=1.0, warmup_steps=1, total_steps=10,
                                   grad_clip=1e-6))
    state = make_state(cfg)
    step = make_train_step(cfg, tiny_loss)
    batch = {"x": jnp.ones((8, 4)) * 100, "y": jnp.zeros((8, 2))}
    w0 = np.asarray(state.params["w"]).copy()
    state, _ = step(state, batch)
    # with an extreme clip the update is microscopic
    assert np.abs(np.asarray(state.params["w"]) - w0).max() < 1e-3


def test_checkpoint_roundtrip(tmp_path):
    from thinktwice_tpu.train.checkpoint import (
        restore_train_state,
        save_train_state,
    )

    cfg = Config()
    state = make_state(cfg)
    state = TrainState(
        step=jnp.asarray(7, jnp.int32),
        params={"w": jnp.full((4, 2), 3.14)},
        opt_state=state.opt_state,
    )
    save_train_state(str(tmp_path / "ckpt"), state)
    template = make_state(cfg)
    restored = restore_train_state(str(tmp_path / "ckpt"), template)
    assert int(restored.step) == 7
    np.testing.assert_allclose(np.asarray(restored.params["w"]), 3.14)


def test_grad_accum_matches_full_batch():
    """grad_accum=K must produce the same update as one full-batch step
    (mean-of-chunk-grads == full-batch grad for a mean loss)."""
    cfg1 = Config(train=TrainConfig(lr=0.05, warmup_steps=1, total_steps=100))
    cfgK = Config(train=TrainConfig(lr=0.05, warmup_steps=1, total_steps=100,
                                    grad_accum=4))
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(32, 4), jnp.float32)
    y = jnp.asarray(rng.randn(32, 2), jnp.float32)
    batch = {"x": x, "y": y}
    s1 = make_state(cfg1)
    sK = make_state(cfgK)
    step1 = make_train_step(cfg1, tiny_loss)
    stepK = make_train_step(cfgK, tiny_loss)
    for _ in range(3):
        s1, m1 = step1(s1, batch)
        sK, mK = stepK(sK, batch)
    np.testing.assert_allclose(
        np.asarray(s1.params["w"]), np.asarray(sK.params["w"]),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(float(m1["loss"]), float(mK["loss"]), rtol=1e-5)
