"""Model-stack tests on a tiny config (CPU-budget friendly)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thinktwice_tpu.config import CameraConfig, Config, ModelConfig
from thinktwice_tpu.models import rig as rig_lib
from thinktwice_tpu.models.decoder import inv_softplus
from thinktwice_tpu.models.encoder_decoder import (
    ThinkTwiceModel,
    bev_to_bird,
    beta_kl,
    total_loss,
)

MCFG = ModelConfig(img_height=32, img_width=64, refine_num=1)
CCFG = CameraConfig(height=32, width=64)
B, N, P = 1, 4, 256


@pytest.fixture(scope="module")
def model_and_args():
    model = ThinkTwiceModel(MCFG, backbone_depth=18, n_sweeps=1, use_lidar=True)
    args = (
        jnp.zeros((B, 1, N, 32, 64, 3)),
        jnp.zeros((B, P, 5)),
        jnp.ones((B, P), bool),
        jnp.zeros((B,)),
        jnp.asarray([[10.0, 0.0]]),
        jnp.zeros((B, 6)),
        jnp.asarray(rig_lib.cam_to_ego(CCFG)),
        jnp.asarray(rig_lib.intrinsics(CCFG)),
        jnp.asarray(rig_lib.ego_to_img(CCFG)),
        jnp.zeros((B, 4, 2)),
        jnp.ones((B, 4, 4)),
    )
    params = jax.jit(model.init)(jax.random.key(0), *args)
    outs = jax.jit(model.apply)(params, *args)
    return model, params, args, outs


def test_output_shapes(model_and_args):
    _, _, _, outs = model_and_args
    R = MCFG.refine_num
    assert outs["pred_wp"].shape == (B, R + 1, 4, 2)
    assert outs["mu_branches"].shape == (B, R + 1, 2)
    assert outs["sigma_branches"].shape == (B, R + 1, 2)
    assert outs["future_mu"].shape == (B, R + 1, 3, 2)
    assert outs["pred_speed"].shape == (B, 1)
    assert outs["depth"].shape[-1] == MCFG.n_depth_bins
    assert outs["seg"].shape[-1] == MCFG.n_seg_classes
    assert outs["teacher_pred_wp_offset"].shape == (B, R, 4, 2)
    # Beta params strictly positive (post-softplus clamp)
    assert float(outs["mu_branches"].min()) >= 1e-3
    # distillation grids mirror Roach XtMaCNN shapes
    shapes = [tuple(m.shape[1:]) for m in outs["mid_feature"]]
    assert shapes == [(21, 21, 32), (10, 10, 64), (4, 4, 128), (2, 2, 256)]


def test_loss_finite_and_grads(model_and_args):
    model, params, args, _ = model_and_args
    batch = dict(
        gt_waypoints=jnp.ones((B, 4, 2)),
        action_alpha=jnp.full((B, 2), 2.0),
        action_beta=jnp.full((B, 2), 2.0),
        future_action_alpha=jnp.full((B, 3, 2), 2.0),
        future_action_beta=jnp.full((B, 3, 2), 2.0),
        gt_speed=jnp.full((B,), 3.0),
        gt_value=jnp.zeros((B,)),
        roach_features=jnp.zeros((B, 256)),
        roach_cnn=(
            jnp.zeros((B, 21, 21, 32)),
            jnp.zeros((B, 10, 10, 64)),
            jnp.zeros((B, 4, 4, 128)),
            jnp.zeros((B, 2, 2, 256)),
        ),
        gt_depth=jnp.full((B * N, 32, 64), 5.0),
        gt_seg=jnp.zeros((B * N, 8, 16), jnp.int32),
    )

    def loss_of(p):
        outs = model.apply(p, *args)
        return total_loss(MCFG, outs, batch)[0]

    loss, grads = jax.jit(jax.value_and_grad(loss_of))(params)
    assert np.isfinite(float(loss))
    gn = jnp.sqrt(
        sum(jnp.sum(g**2) for g in jax.tree.leaves(grads))
    )
    assert np.isfinite(float(gn)) and float(gn) > 0


def test_bev_to_bird_orientation():
    # single channel BEV: mark the cell at max x (farthest ahead), y=min
    bev = jnp.zeros((1, 4, 4, 1))
    bev = bev.at[0, 0, 3, 0].set(1.0)   # yi=0 (y min), xi=3 (x max)
    bird = bev_to_bird(bev)
    assert bird.shape == (1, 4, 4, 1)
    # farthest ahead -> row 0; y_min is leftmost -> col 0
    assert float(bird[0, 0, 0, 0]) == 1.0


def test_beta_kl_zero_for_identical():
    a = jnp.asarray([2.0, 3.0])
    b = jnp.asarray([1.5, 4.0])
    np.testing.assert_allclose(np.asarray(beta_kl(a, b, a, b)), 0.0, atol=1e-5)
    # KL > 0 for different distributions
    assert float(beta_kl(a, b, a + 1, b).sum()) > 0


def test_inv_softplus_roundtrip():
    x = jnp.asarray([0.1, 1.0, 5.0])
    y = jax.nn.softplus(inv_softplus(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-4)
