"""Full-loop integration: expert collects with sensors -> batches -> train
steps reduce the loss (tiny config, the is_dev-style smoke of docs/TRAIN.md)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thinktwice_tpu.agents.roach import RoachPolicy
from thinktwice_tpu.config import (
    CameraConfig,
    Config,
    LidarConfig,
    ModelConfig,
    SimConfig,
    TrainConfig,
)
from thinktwice_tpu.sim.reset import reset_world
from thinktwice_tpu.train.collect import collect_batch, frames_to_batch
from thinktwice_tpu.train.loop import (
    init_model_params,
    make_model,
    model_loss_fn,
    train,
)
from thinktwice_tpu.train.train_step import create_train_state, make_train_step

TINY = Config(
    sim=SimConfig(max_vehicles=8, max_walkers=4, max_route_len=256, max_scenarios=4),
    camera=CameraConfig(height=32, width=64),
    lidar=LidarConfig(n_beams=4, n_azimuth=64),
    model=ModelConfig(
        img_height=32, img_width=64, refine_num=1,
        bev_channels=64, n_depth_bins=16, lidar_pillar_grid=84,
    ),
    train=TrainConfig(lr=1e-3, warmup_steps=2, total_steps=50),
)


def straight_route(n=256):
    xs = np.linspace(10.0, 160.0, n)
    return jnp.asarray(
        np.stack([xs, np.full_like(xs, -1.75), np.zeros_like(xs)], 1), jnp.float32
    )


@pytest.fixture(scope="module")
def collected(town):
    policy = RoachPolicy()
    rparams = policy.init(
        jax.random.key(0),
        jnp.zeros((1, TINY.birdview.n_channels, 192, 192)),
        jnp.zeros((1, TINY.roach.state_dim)),
    )
    st = reset_world(TINY, town, straight_route(), jax.random.key(1), n_vehicles=4)
    final, frames, sensors = jax.jit(collect_batch, static_argnums=(0, 4))(
        TINY, rparams, town, st, 8
    )
    return final, frames, sensors


def test_collection_shapes(collected):
    final, frames, sensors = collected
    assert frames.pos.shape == (8, 2)
    assert sensors["rgb"].shape == (8, 4, 32, 64, 3)
    assert sensors["lidar"].shape[0] == 8
    # the expert drove (policy net is random; hazard brake may slow it)
    assert float(final.tick) == 80
    sup = frames.supervision
    assert sup["features"].shape == (8, 256)
    assert sup["cnn_features"][0].shape == (8, 32, 21, 21)


def test_frames_to_batch(collected):
    _, frames, sensors = collected
    batch = frames_to_batch(TINY, frames, sensors, pred_len=4)
    n = 4  # 8 frames - pred_len
    assert batch["imgs"].shape == (n, 1, 4, 32, 64, 3)
    assert batch["gt_waypoints"].shape == (n, 4, 2)
    assert batch["teacher_ctrl_sp"].shape == (n, 4, 4)
    assert batch["roach_cnn"][0].shape == (n, 21, 21, 32)
    assert batch["gt_seg"].shape == (n * 4, 8, 16)
    # waypoints are in the current ego frame: mostly forward for a straight run
    assert float(batch["gt_waypoints"][..., 0].mean()) >= 0.0


def test_train_on_collected(collected):
    _, frames, sensors = collected
    batch = frames_to_batch(TINY, frames, sensors, pred_len=4)
    model = make_model(TINY, backbone_depth=10)
    params = init_model_params(TINY, model, jax.random.key(0), n_points=batch["points"].shape[1])
    state = create_train_state(TINY, params)
    step = make_train_step(TINY, model_loss_fn(TINY, model))
    losses = []
    for _ in range(8):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    # overfitting a single tiny batch must reduce the loss
    assert losses[-1] < losses[0], losses


def test_collect_stream_multiworld(town):
    """Vmapped multi-world stream: batches mix n_worlds rolling worlds and
    worlds advance (persist) across chunks."""
    from thinktwice_tpu.train.loop import collect_stream

    policy = RoachPolicy()
    rparams = policy.init(
        jax.random.key(0),
        jnp.zeros((1, TINY.birdview.n_channels, 192, 192)),
        jnp.zeros((1, TINY.roach.state_dim)),
    )
    routes = jnp.stack([straight_route(), straight_route()])
    from thinktwice_tpu.harness.evaluator import build_route_scenarios
    from thinktwice_tpu.harness.route_parser import ScenarioTrigger

    r_np = np.asarray(straight_route())
    trig = [ScenarioTrigger("Scenario3", r_np[100, :2].astype(np.float64), 0.0)]
    scen = build_route_scenarios(TINY, r_np, trig)
    scens = jax.tree.map(lambda *x: jnp.stack(x), *[scen, scen])
    stream = collect_stream(
        TINY, rparams, town, routes, jax.random.key(3),
        frames_per_chunk=6, n_vehicles=2, n_worlds=2, scenarios=scens,
    )
    b1 = next(stream)
    b2 = next(stream)
    n_per_world = 6 - TINY.model.pred_len  # 2 examples per world
    assert b1["imgs"].shape[0] == 2 * n_per_world
    assert np.isfinite(np.asarray(b1["imgs"])).all()
    assert np.isfinite(np.asarray(b1["teacher_wp"])).all()
    # the second chunk continues the same worlds further along the route
    assert float(b2["speed"].mean()) >= 0.0
    assert not np.allclose(np.asarray(b1["target_point"]),
                           np.asarray(b2["target_point"]))
