"""World-mirror augmentation: involution, geometric consistency, loss gating."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thinktwice_tpu.agents.roach import RoachPolicy
from thinktwice_tpu.sim.reset import reset_world
from thinktwice_tpu.train.augment import maybe_mirror, mirror_batch
from thinktwice_tpu.train.collect import collect_batch, frames_to_batch
from tests.test_pipeline import TINY, straight_route


@pytest.fixture(scope="module")
def batch(town):
    policy = RoachPolicy()
    rparams = policy.init(
        jax.random.key(0),
        jnp.zeros((1, TINY.birdview.n_channels, 192, 192)),
        jnp.zeros((1, TINY.roach.state_dim)),
    )
    st = reset_world(TINY, town, straight_route(), jax.random.key(1), n_vehicles=4)
    _, frames, sensors = jax.jit(collect_batch, static_argnums=(0, 4))(
        TINY, rparams, town, st, 8
    )
    return frames_to_batch(TINY, frames, sensors)


def test_mirror_involutive(batch):
    m2 = mirror_batch(mirror_batch(batch))
    for k in ("imgs", "points", "gt_waypoints", "target_point",
              "action_alpha", "action_beta", "teacher_ctrl_sp",
              "command", "gt_depth", "gt_seg"):
        np.testing.assert_allclose(
            np.asarray(m2[k]), np.asarray(batch[k]), atol=1e-6, err_msg=k
        )


def test_mirror_geometry(batch):
    m = mirror_batch(batch)
    # waypoint y negated, x unchanged
    np.testing.assert_allclose(
        np.asarray(m["gt_waypoints"][..., 0]),
        np.asarray(batch["gt_waypoints"][..., 0]),
    )
    np.testing.assert_allclose(
        np.asarray(m["gt_waypoints"][..., 1]),
        -np.asarray(batch["gt_waypoints"][..., 1]),
    )
    # front camera image mirrored horizontally
    np.testing.assert_allclose(
        np.asarray(m["imgs"][:, :, 0]),
        np.asarray(batch["imgs"][:, :, 0, :, ::-1]),
    )
    # left/right cameras swapped (and mirrored)
    np.testing.assert_allclose(
        np.asarray(m["imgs"][:, :, 1]),
        np.asarray(batch["imgs"][:, :, 2, :, ::-1]),
    )
    # steer Beta params swapped, acc unchanged
    np.testing.assert_allclose(
        np.asarray(m["action_alpha"][:, 0]), np.asarray(batch["action_alpha"][:, 0])
    )
    np.testing.assert_allclose(
        np.asarray(m["action_alpha"][:, 1]), np.asarray(batch["action_beta"][:, 1])
    )
    # distillation gated off
    assert float(m["distil_weight"]) == 0.0


def test_maybe_mirror_and_loss(batch):
    from thinktwice_tpu.models.encoder_decoder import decoder_loss

    m = maybe_mirror(jax.random.key(3), batch)  # either branch is valid
    assert "distil_weight" in m
    # losses stay finite on a mirrored batch with a mock outs dict shaped
    # from the batch itself (cheap: reuse targets as predictions)
    B, T = batch["gt_waypoints"].shape[:2]
    R = 2
    outs = {
        "pred_wp": jnp.tile(batch["gt_waypoints"][:, None], (1, R, 1, 1)),
        "mu_branches": jnp.tile(batch["action_alpha"][:, None], (1, R, 1)),
        "sigma_branches": jnp.tile(batch["action_beta"][:, None], (1, R, 1)),
        "future_mu": jnp.tile(batch["future_action_alpha"][:, None], (1, R, 1, 1)),
        "future_sigma": jnp.tile(batch["future_action_beta"][:, None], (1, R, 1, 1)),
        "pred_speed": batch["gt_speed"][:, None],
        "pred_value_traj": batch["gt_value"][:, None],
        "pred_value_ctrl": batch["gt_value"][:, None],
        "pred_features_traj": batch["roach_features"],
        "pred_features_ctrl": batch["roach_features"],
        "mid_feature": batch["roach_cnn"],
    }
    mirrored = mirror_batch(batch)
    losses = decoder_loss(TINY.model, outs, mirrored)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    # gated terms are exactly zero on the mirrored batch
    assert float(losses["distil_loss"]) == 0.0
    assert float(losses["features_loss"]) == 0.0
