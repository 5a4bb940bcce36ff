"""Multi-sweep (history-frame) student path: batch assembly + model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thinktwice_tpu.agents.roach import RoachPolicy
from thinktwice_tpu.sim.reset import reset_world
from thinktwice_tpu.train.collect import collect_batch, frames_to_batch
from tests.test_pipeline import TINY, straight_route


@pytest.fixture(scope="module")
def collected(town):
    policy = RoachPolicy()
    rparams = policy.init(
        jax.random.key(0),
        jnp.zeros((1, TINY.birdview.n_channels, 192, 192)),
        jnp.zeros((1, TINY.roach.state_dim)),
    )
    st = reset_world(TINY, town, straight_route(), jax.random.key(1))
    _, frames, sensors = jax.jit(collect_batch, static_argnums=(0, 4))(
        TINY, rparams, town, st, 8
    )
    return frames, sensors


def test_two_sweep_batch_shapes(collected):
    frames, sensors = collected
    batch = frames_to_batch(TINY, frames, sensors, pred_len=4, n_sweeps=2)
    n = 8 - 4 - 1
    assert batch["imgs"].shape == (n, 2, 4, 32, 64, 3)
    # lidar doubled by the merge, with dt channel flagging the old sweep
    R = sensors["lidar"].shape[1]
    assert batch["points"].shape == (n, 2 * R, 5)
    dt_vals = np.unique(np.asarray(batch["points"][..., 4]))
    assert set(np.round(dt_vals, 3)) <= {0.0, 1.0}
    # newest sweep must match the single-sweep batch at the matching index
    single = frames_to_batch(TINY, frames, sensors, pred_len=4, n_sweeps=1)
    np.testing.assert_allclose(
        np.asarray(batch["imgs"][:, 1]), np.asarray(single["imgs"][1:, 0]),
        atol=1e-6,
    )


def test_multisweep_model_forward(collected):
    from thinktwice_tpu.models import rig as rig_lib
    from thinktwice_tpu.models.encoder_decoder import ThinkTwiceModel

    frames, sensors = collected
    batch = frames_to_batch(TINY, frames, sensors, pred_len=4, n_sweeps=2)
    model = ThinkTwiceModel(TINY.model, backbone_depth=10, n_sweeps=2,
                            use_lidar=True)
    args = (
        batch["imgs"][:1],
        batch["points"][:1],
        batch["points_mask"][:1],
        batch["speed"][:1],
        batch["target_point"][:1],
        batch["command"][:1],
        jnp.asarray(rig_lib.cam_to_ego(TINY.camera)),
        jnp.asarray(rig_lib.intrinsics(TINY.camera)),
        jnp.asarray(rig_lib.ego_to_img(TINY.camera)),
    )
    params = jax.jit(model.init)(jax.random.key(0), *args)
    outs = jax.jit(model.apply)(params, *args)
    assert outs["pred_wp"].shape[0] == 1
    assert np.isfinite(np.asarray(outs["pred_wp"])).all()
