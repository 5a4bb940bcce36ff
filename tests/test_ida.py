"""IDA geometric augmentation: affine warp + ida_mat bookkeeping
(reference: transform.py IDAImageTransform:221-378; geometry consumption at
lss.py:474-496, DepthNet conditioning :209-232)."""

import jax
import jax.numpy as jnp
import numpy as np

from thinktwice_tpu.train.augment import _warp_affine, ida_augment, sample_ida_mats


def test_sample_ida_mats_affine_semantics():
    rng = jax.random.key(0)
    B, N, H, W = 2, 4, 32, 64
    ida = np.asarray(sample_ida_mats(rng, B, N, H, W, (1.05, 1.15), flip_p=0.5))
    assert ida.shape == (B, N, 4, 4)
    s = ida[..., 1, 1]
    assert (s >= 1.05 - 1e-6).all() and (s <= 1.15 + 1e-6).all()
    # bottom-aligned vertical crop: raw bottom row maps to augmented bottom row
    y_bottom = s * (H - 1) + ida[..., 1, 3]
    np.testing.assert_allclose(y_bottom, (H - 1) * np.ones_like(s), atol=s.max())
    # flipped cameras have negative x scale
    flipped = ida[..., 0, 0] < 0
    assert flipped.any() and (~flipped).any()
    np.testing.assert_allclose(np.abs(ida[..., 0, 0]), s, atol=1e-6)


def test_warp_affine_identity_and_flip():
    img = jnp.asarray(np.random.RandomState(0).rand(16, 24, 3), jnp.float32)
    ident = jnp.eye(4)
    out = _warp_affine(img, ident)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)
    # pure flip: A = [[-1,0],[0,1]], t = [W-1, 0]
    flip = jnp.eye(4).at[0, 0].set(-1.0).at[0, 3].set(24 - 1.0)
    out_f = np.asarray(_warp_affine(img, flip))
    np.testing.assert_allclose(out_f, np.asarray(img)[:, ::-1], atol=1e-4)


def test_frustum_ida_inverse_consistency():
    """Unprojecting an ida-transformed pixel with the ida must equal
    unprojecting the raw pixel without it (lss.py:493-496 semantics)."""
    from thinktwice_tpu.models.lss import frustum_to_ego

    K = jnp.asarray([[100.0, 0, 32], [0, 100.0, 16], [0, 0, 1]])
    c2e = jnp.eye(4)
    ida = jnp.eye(4).at[0, 0].set(1.1).at[1, 1].set(1.1)
    ida = ida.at[0, 3].set(-3.0).at[1, 3].set(-2.0)
    u_raw, v_raw, d = 20.0, 10.0, 8.0
    u_aug = 1.1 * u_raw - 3.0
    v_aug = 1.1 * v_raw - 2.0
    fr_raw = jnp.asarray([[[[u_raw, v_raw, d]]]])
    fr_aug = jnp.asarray([[[[u_aug, v_aug, d]]]])
    Kinv = jnp.linalg.inv(K)
    ego_raw = frustum_to_ego(fr_raw, c2e, Kinv)
    ego_aug = frustum_to_ego(fr_aug, c2e, Kinv, ida=ida)
    np.testing.assert_allclose(
        np.asarray(ego_aug), np.asarray(ego_raw), atol=1e-4
    )


def test_project_to_cams_ida_composition():
    """Projection with ida equals A @ (projection without ida)."""
    from thinktwice_tpu.models import rig as rig_lib
    from thinktwice_tpu.models.decoder import project_to_cams
    from thinktwice_tpu.config import CameraConfig

    ccfg = CameraConfig(height=32, width=64)
    e2i = jnp.asarray(rig_lib.ego_to_img(ccfg))
    pts = jnp.asarray([[[6.0, 1.0, 0.5], [10.0, -2.0, 1.0]]])
    base, valid0 = project_to_cams(pts, e2i, (32, 64))
    ida = jnp.broadcast_to(
        jnp.eye(4).at[0, 0].set(1.1).at[0, 3].set(-4.0), (1, 4, 4, 4)
    )
    aug, _ = project_to_cams(pts, e2i, (32, 64), ida=ida)
    # compare in pixel units where the base projection is valid
    bu = np.asarray(base)[..., 0] * 64
    au = np.asarray(aug)[..., 0] * 64
    m = np.asarray(valid0)
    np.testing.assert_allclose(au[m], 1.1 * bu[m] - 4.0, atol=1e-3)


def test_ida_augment_batch_and_model_forward():
    from thinktwice_tpu.models import rig as rig_lib
    from thinktwice_tpu.models.encoder_decoder import ThinkTwiceModel
    from thinktwice_tpu.config import CameraConfig, ModelConfig

    mcfg = ModelConfig(img_height=32, img_width=64, refine_num=1,
                       bev_channels=64, n_depth_bins=8, lidar_pillar_grid=84)
    ccfg = CameraConfig(height=32, width=64)
    B, N = 2, 4
    rng = np.random.RandomState(1)
    batch = {
        "imgs": jnp.asarray(rng.rand(B, 1, N, 32, 64, 3), jnp.float32),
        "gt_depth": jnp.asarray(rng.rand(B * N, 32, 64), jnp.float32) * 20,
        "gt_seg": jnp.asarray(
            rng.randint(0, 5, (B * N, 8, 16)), jnp.int32
        ),
    }
    out = ida_augment(jax.random.key(0), batch)
    assert out["ida"].shape == (B, N, 4, 4)
    assert out["imgs"].shape == batch["imgs"].shape
    assert out["gt_seg"].dtype == batch["gt_seg"].dtype
    # identity limits reproduce the input
    out_id = ida_augment(
        jax.random.key(0), batch, resize_lim=(1.0, 1.0), flip_p=0.0
    )
    np.testing.assert_allclose(
        np.asarray(out_id["imgs"]), np.asarray(batch["imgs"]), atol=1e-4
    )

    model = ThinkTwiceModel(mcfg, backbone_depth=10, n_sweeps=1,
                            use_lidar=True)
    args = (
        out["imgs"],
        jnp.zeros((B, 64, 5)),
        jnp.ones((B, 64), bool),
        jnp.zeros((B,)),
        jnp.zeros((B, 2)),
        jnp.zeros((B, 6)),
        jnp.asarray(rig_lib.cam_to_ego(ccfg)),
        jnp.asarray(rig_lib.intrinsics(ccfg)),
        jnp.asarray(rig_lib.ego_to_img(ccfg)),
    )
    params = jax.jit(model.init)(jax.random.key(0), *args, ida=out["ida"])
    outs = jax.jit(lambda p, *a: model.apply(p, *a, ida=out["ida"]))(
        params, *args
    )
    assert np.isfinite(np.asarray(outs["pred_wp"])).all()
    # params are ida-shape-agnostic: same tree without ida
    outs2 = model.apply(params, *args)
    assert np.isfinite(np.asarray(outs2["pred_wp"])).all()
