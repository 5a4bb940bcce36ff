"""Full ThinkTwice model: camera+lidar -> BEV -> cascaded decoder, + losses.

Assembles the stack of code/encoder_decoder_framework.py:23-491:
- sensor encoders (LSS camera, LidarNet) with the Roach-orientation BEV
  alignment (:241-246),
- measurement encoder (speed + target point + command -> 128, :59-64),
- BEV fusion convs + the shared flattening pyramid
  (build_fusion_and_flatten_network_for_BEV:81-138, get_fusion_feat:213-235),
- ThinkTwiceDecoder with teacher forcing,
- the training losses of forward_train (:148-191) + decoder.loss
  (thinktwice_decoder.py:535-620): waypoint smooth-L1 across refine layers,
  Beta-KL action losses (current x15, future x3.75), speed/value/feature
  losses, Roach cnn-feature distillation at the 21/10/4/2 grids, teacher
  offset regression to zero, depth CE and segmentation focal losses, and the
  open-loop diagnostic metrics (current_throttle_brake_offset,
  longitudinal_offset — the acceptance thresholds of docs/DATA_PREP.md:57).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from thinktwice_tpu.config import ModelConfig
from thinktwice_tpu.models.decoder import BEVPyramid, ThinkTwiceDecoder
from thinktwice_tpu.models.layers import MLP, ConvGN, SEBasicBlock
from thinktwice_tpu.models.lidarnet import LidarNet
from thinktwice_tpu.models.lss import DOWNSAMPLE, MultiSweepLSS


def bev_to_bird(bev):
    """(.., ny, nx, C) metric BEV (x fwd along cols, y right along rows) ->
    bird orientation (row 0 = farthest ahead, col = right), the Roach frame
    the decoder and distillation operate in (the reference's
    rot90+flip, encoder_decoder_framework.py:241-246)."""
    return jnp.flip(jnp.swapaxes(bev, -3, -2), axis=-3)


class ThinkTwiceModel(nn.Module):
    cfg: ModelConfig
    backbone_depth: int = 50
    n_sweeps: int = 1
    use_lidar: bool = True
    use_lidar_look: bool = False

    @nn.compact
    def __call__(
        self,
        imgs,                 # (B, T_sweeps, N, H, W, 3) normalized
        points,               # (B, P, 5)
        points_mask,          # (B, P)
        speed,                # (B,)
        target_point,         # (B, 2)
        command,              # (B, 6) one-hot
        cam2ego,              # (N, 4, 4)
        intrinsics,           # (3, 3)
        ego2img,              # (N, 4, 4)
        teacher_wp=None,      # (B, T, 2) GT waypoints (teacher forcing)
        teacher_ctrl_sp=None, # (B, T, 4) GT softplus-space ctrl (alpha, beta)
        sweep2key=None,       # (B, T_sweeps, 4, 4) ego(t)->ego(key) transforms
        ida=None,             # (B, N, 4, 4) IDA pixel transforms (augment)
    ):
        m = self.cfg
        B = imgs.shape[0]

        cam_out = MultiSweepLSS(
            m, self.backbone_depth, self.n_sweeps, name="img_encoder"
        )(imgs, cam2ego, intrinsics, sweep2key=sweep2key, ida=ida)
        cam_bev = bev_to_bird(cam_out["bev"])                  # (B, 21, 21, 256)

        # measurement encoder (:59-64): 1 + 2 + 6 -> 128
        state = jnp.concatenate(
            [speed[:, None], target_point, command], axis=-1
        )
        measurement = MLP([128, 128], final_act=True, name="measurements_encoder")(state)

        # fusion (get_fusion_feat:213-235) — bf16 like the trunks; the BEV
        # state handed to the decoder cascade is cast back to f32 there
        bf16 = jnp.bfloat16
        C = m.bev_channels
        cam_bev = cam_bev.astype(bf16)
        h = ConvGN(C, dtype=bf16)(cam_bev)
        h = ConvGN(C, act=False, dtype=bf16)(h)
        cam_red = nn.relu(h + cam_bev)

        lidar_hr = None
        if self.use_lidar:
            lid = LidarNet(m, name="lidar_encoder")(points, points_mask)
            lid = bev_to_bird(lid)                             # (B, 84, 84, 512)
            lidar_hr = lid
            p = ConvGN(C, stride=2, dtype=bf16)(lid)           # 42
            pts_red = ConvGN(C, stride=2, dtype=bf16)(p)       # 21
            f = ConvGN(C, act=False, dtype=bf16)(
                ConvGN(C, dtype=bf16)(
                    jnp.concatenate([cam_red, pts_red], axis=-1))
            )
            bev_feats = nn.relu(f + cam_red + pts_red)
        else:
            bev_feats = cam_red

        grid32 = SEBasicBlock(32, name="MLP21", dtype=bf16)(
            nn.relu(nn.Conv(32, (3, 3), padding="SAME", name="_256_to_32",
                            dtype=bf16)(bev_feats))
        )
        # the 21x21x32 decoder state rides f32 residual chains (decoder.py);
        # only the layer internals compute in bf16
        grid32 = grid32.astype(jnp.float32)
        pyramid = BEVPyramid(name="bev_pyramid", dtype=bf16)
        flat_feat, mids = pyramid(grid32)
        flat_feat = flat_feat.astype(jnp.float32)

        # FPN features reorganized for the look module
        fpn = cam_out["fpn_feats"]
        N = cam2ego.shape[0]
        cam_embeds = self.param(
            "cams_embeds", nn.initializers.truncated_normal(0.02), (N, 256)
        )
        level_embeds = self.param(
            "level_embeds", nn.initializers.truncated_normal(0.02), (4, 256)
        )
        spatial_shapes = tuple((f.shape[1], f.shape[2]) for f in fpn)
        maps, flat_vals = [], []
        for lvl, f in enumerate(fpn):
            # bf16 value tensors: these (N, B, sumHW, 256) arrays and their
            # per-refine-layer gather gradients dominated the decoder's HBM
            # (OOM dump at microbatch 4, runs/profile_k7.log)
            f = nn.Conv(256, (1, 1), name=f"fpn_linear{lvl}", dtype=bf16)(f)
            hw = f.shape[1] * f.shape[2]
            f = f.reshape(B, N, f.shape[1], f.shape[2], 256)
            maps.append(f)
            fv = f.reshape(B, N, hw, 256)
            fv = (fv + cam_embeds[None, :, None, :].astype(bf16)
                  + level_embeds[None, None, None, lvl].astype(bf16))
            flat_vals.append(fv)
        value = jnp.concatenate(flat_vals, axis=2)             # (B, N, sumHW, 256)
        # channel-fused layout (heads split inside ms_deform_attn): a
        # trailing head_dim=32 axis pads 4x under TPU T(8,128) tiling and
        # blew HBM on the training batch (see ops/deform_attn.py)
        value_cams = jnp.moveaxis(value, 1, 0)                 # (N, B, sumHW, 256)
        fpn_value = {"maps": maps, "flat": value_cams}

        outs = ThinkTwiceDecoder(m, self.use_lidar_look, name="decoder",
                                 dtype=bf16)(
            flat_feat, grid32, measurement, ego2img, fpn_value,
            spatial_shapes, pyramid, lidar_hr,
            teacher_wp=teacher_wp, teacher_ctrl_sp=teacher_ctrl_sp,
            ida=ida,
        )
        outs["depth"] = cam_out["depth"]
        outs["seg"] = cam_out["seg"]
        outs["mid_feature"] = mids
        outs["measurement"] = measurement
        # every loss consumes f32: cast any bf16 leaf (refine/teacher feature
        # stacks, mids) in one sweep at the model boundary
        return jax.tree.map(
            lambda x: x.astype(jnp.float32)
            if x.dtype == jnp.bfloat16 else x,
            outs,
        )


# ---------------------------------------------------------------------------
# Losses (decoder.loss, thinktwice_decoder.py:535-620 +
# forward_train depth/seg terms, encoder_decoder_framework.py:148-191)
# ---------------------------------------------------------------------------

def smooth_l1(x):
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def clamped_sl1(x, cap: float = 5.0):
    """Elementwise smooth-L1 clamped at `cap` — the reference's
    torch.clamp(F.smooth_l1_loss(..., reduction="none"), -5, 5) used by all
    distillation terms (thinktwice_decoder.py:591-619)."""
    return jnp.minimum(smooth_l1(x), cap)


def beta_kl(a1, b1, a2, b2):
    """KL( Beta(a1,b1) || Beta(a2,b2) ), elementwise."""
    dg = jax.scipy.special.digamma
    lbeta = (
        jax.scipy.special.gammaln(a2)
        + jax.scipy.special.gammaln(b2)
        - jax.scipy.special.gammaln(a2 + b2)
        - (
            jax.scipy.special.gammaln(a1)
            + jax.scipy.special.gammaln(b1)
            - jax.scipy.special.gammaln(a1 + b1)
        )
    )
    return (
        lbeta
        + (a1 - a2) * dg(a1)
        + (b1 - b2) * dg(b1)
        + (a2 - a1 + b2 - b1) * dg(a1 + b1)
    )


def beta_mode_01(alpha, beta):
    mode = (alpha - 1) / jnp.maximum(alpha + beta - 2, 1e-9)
    mean = alpha / jnp.maximum(alpha + beta, 1e-5)
    return jnp.where(
        (alpha > 1) & (beta > 1),
        mode,
        jnp.where(
            (alpha <= 1) & (beta > 1),
            0.0,
            jnp.where((alpha > 1) & (beta <= 1), 1.0, mean),
        ),
    )


WP_LOSS_WEIGHT = 15.0          # thinktwice_decoder.py:286-287
ACTION_LOSS_WEIGHT = 15.0
FUTURE_ACTION_WEIGHT = 15.0 / 4.0
SPEED_WEIGHT = 0.05            # configs/thinktwice.py:59-61
VALUE_WEIGHT = 0.001
FEATURES_WEIGHT = 0.05
DISTIL_WEIGHTS = (0.25, 1.0 / 3.0, 0.25, 1.0 / 11.0)  # :285 per-grid
TEACHER_OFFSET_WEIGHT = 1.0
DEPTH_WEIGHT = 3.0             # lss depth_loss scaling
SEG_WEIGHT = 1.0


def decoder_loss(cfg: ModelConfig, outs: dict, batch: dict) -> dict[str, jax.Array]:
    """batch keys: gt_waypoints (B, T, 2), action_alpha/beta (B, 2),
    future_action_alpha/beta (B, T-1, 2), gt_speed (B,), gt_value (B,),
    roach_features (B, 256), roach_cnn (tuple of 4 grids, bird frame NHWC)."""
    losses = {}
    pred_wp = outs["pred_wp"]                                  # (B, R+1, T, 2)
    gt_wp = batch["gt_waypoints"][:, None]
    losses["wp_loss"] = WP_LOSS_WEIGHT * jnp.mean(
        smooth_l1(pred_wp - gt_wp)
    )

    # Beta KL on the current action across refine layers
    a_p = outs["mu_branches"]                                  # (B, R+1, 2)
    b_p = outs["sigma_branches"]
    a_g = jnp.clip(batch["action_alpha"], 1e-3)[:, None]
    b_g = jnp.clip(batch["action_beta"], 1e-3)[:, None]
    losses["action_loss"] = ACTION_LOSS_WEIGHT * jnp.mean(
        beta_kl(a_g, b_g, a_p, b_p)
    )

    if "future_action_alpha" in batch:
        fa_p = outs["future_mu"]                               # (B, R+1, T-1, 2)
        fb_p = outs["future_sigma"]
        fa_g = jnp.clip(batch["future_action_alpha"], 1e-3)[:, None]
        fb_g = jnp.clip(batch["future_action_beta"], 1e-3)[:, None]
        losses["future_action_loss"] = FUTURE_ACTION_WEIGHT * jnp.mean(
            beta_kl(fa_g, fb_g, fa_p, fb_p)
        )

    losses["speed_loss"] = SPEED_WEIGHT * jnp.mean(
        jnp.abs(outs["pred_speed"][:, 0] - batch["gt_speed"])
    )
    v = batch["gt_value"]
    losses["value_loss"] = VALUE_WEIGHT * (
        jnp.mean((outs["pred_value_traj"][:, 0] - v) ** 2)
        + jnp.mean((outs["pred_value_ctrl"][:, 0] - v) ** 2)
    )
    # distil_weight gates the Roach-feature terms (mirror augmentation sets 0
    # because conv features are not mirror-equivariant; train/augment.py).
    # Scalar OR per-example (B,): per-example mirroring keeps the distillation
    # signal from the unmirrored half of every batch instead of losing whole
    # steps (the weighted mean renormalizes by the surviving examples).
    dw = jnp.asarray(batch.get("distil_weight", 1.0))

    def wmean(x):
        """dw-weighted mean: x reduced per example first."""
        per_ex = jnp.mean(x, axis=tuple(range(1, x.ndim)))
        if dw.ndim == 0:
            return dw * jnp.mean(per_ex)
        return jnp.sum(dw * per_ex) / jnp.maximum(jnp.sum(dw), 1e-6)

    if "roach_features" in batch:
        rf = batch["roach_features"]
        losses["features_loss"] = FEATURES_WEIGHT * (
            wmean((outs["pred_features_traj"] - rf) ** 2)
            + wmean((outs["pred_features_ctrl"] - rf) ** 2)
        )
    if "roach_cnn" in batch:
        distil = 0.0
        for w, pred, gt in zip(DISTIL_WEIGHTS, outs["mid_feature"], batch["roach_cnn"]):
            distil = distil + w * wmean((pred - gt) ** 2)
        losses["distil_loss"] = distil

        # refine-layer distillation (thinktwice_decoder.py:593-598): every
        # refine layer's updated BEV is pulled to the Roach 21x21 grid and the
        # updated flattened feature to the Roach 256-d feature; smooth-L1
        # clamped at 5 per element like the reference's torch.clamp(..., 5.0)
        cnn21 = batch["roach_cnn"][0]                          # (B, 21, 21, 32)
        if "refine_BEV_feature" in outs:
            losses["refine_BEV_feature_loss"] = (
                DISTIL_WEIGHTS[0] * wmean(
                    clamped_sl1(outs["refine_BEV_feature"] - cnn21[:, None])
                )
            )
        if "roach_features" in batch and "refine_flat_feature" in outs:
            losses["refine_flattened_feature_loss"] = (
                FEATURES_WEIGHT * 0.1 * wmean(
                    clamped_sl1(
                        outs["refine_flat_feature"]
                        - batch["roach_features"][:, None]
                    )
                )
            )

    if "teacher_pred_wp_offset" in outs:
        losses["teacher_offset_loss"] = TEACHER_OFFSET_WEIGHT * (
            jnp.mean(outs["teacher_pred_wp_offset"] ** 2)
            + jnp.mean(outs["teacher_pred_ctrl_offset"] ** 2)
        )
        # teacher-pass distillation (thinktwice_decoder.py:604-620)
        if "future_roach_cnn21" in batch and "teacher_future_BEV_feature" in outs:
            # future-BEV rollouts vs the FUTURE frames' Roach 21x21 grids:
            # pred (B, R, T, 21, 21, 32), gt (B, T, 21, 21, 32)
            losses["teacher_future_BEV_feature_loss"] = (
                DISTIL_WEIGHTS[0] * wmean(
                    clamped_sl1(
                        outs["teacher_future_BEV_feature"]
                        - batch["future_roach_cnn21"][:, None]
                    )
                )
            )
        if "roach_cnn" in batch and "teacher_refine_BEV_feature" in outs:
            losses["teacher_refine_BEV_feature_loss"] = (
                DISTIL_WEIGHTS[0] * wmean(
                    clamped_sl1(
                        outs["teacher_refine_BEV_feature"]
                        - batch["roach_cnn"][0][:, None]
                    )
                )
            )
        if "roach_features" in batch and "teacher_refine_flat_feature" in outs:
            losses["teacher_refine_flattened_feature_loss"] = (
                FEATURES_WEIGHT * wmean(
                    clamped_sl1(
                        outs["teacher_refine_flat_feature"]
                        - batch["roach_features"][:, None]
                    )
                )
            )

    # ---- open-loop diagnostic metrics (:549-560; not part of the loss) ----
    act = beta_mode_01(a_p[:, -1], b_p[:, -1]) * 2.0 - 1.0     # final layer
    act_gt = beta_mode_01(a_g[:, 0], b_g[:, 0]) * 2.0 - 1.0
    losses["metric_current_throttle_brake_offset"] = jax.lax.stop_gradient(
        jnp.mean(jnp.abs(act[:, 0] - act_gt[:, 0]))
    )
    losses["metric_steer_offset"] = jax.lax.stop_gradient(
        jnp.mean(jnp.abs(act[:, 1] - act_gt[:, 1]))
    )
    wp_err = pred_wp[:, -1] - batch["gt_waypoints"]
    losses["metric_longitudinal_offset"] = jax.lax.stop_gradient(
        jnp.mean(jnp.abs(wp_err[..., 0]))
    )
    losses["metric_lateral_offset"] = jax.lax.stop_gradient(
        jnp.mean(jnp.abs(wp_err[..., 1]))
    )
    return losses


def depth_loss(cfg: ModelConfig, depth_logits, gt_depth):
    """Per-cell depth classification (get_downsampled_gt_depth semantics,
    encoder_decoder_framework.py:443-482: min-pool GT depth over the
    downsample window, one-hot binning, BCE on valid cells).

    depth_logits (BN, h, w, D); gt_depth (BN, H, W) meters (0 = invalid).
    """
    BN, h, w, D = depth_logits.shape
    ds = DOWNSAMPLE
    g = gt_depth[:, : h * ds, : w * ds].reshape(BN, h, ds, w, ds)
    g = jnp.where(g > 0, g, jnp.inf)
    g = jnp.min(g, axis=(2, 4))                                # min-pool
    valid = jnp.isfinite(g) & (g >= cfg.depth_min)
    bins = jnp.clip(
        ((g - cfg.depth_min) / cfg.depth_step).astype(jnp.int32), 0, D - 1
    )
    logp = jax.nn.log_softmax(depth_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, bins[..., None], axis=-1)[..., 0]
    return DEPTH_WEIGHT * jnp.sum(nll * valid) / jnp.maximum(valid.sum(), 1.0)


def seg_focal_loss(seg_logits, gt_seg, gamma: float = 2.0, alpha: float = 0.25):
    """Focal loss (code/utils.py FocalLoss:31-47). seg_logits (BN, h, w, K);
    gt_seg (BN, h, w) int labels (matched resolution)."""
    logp = jax.nn.log_softmax(seg_logits, axis=-1)
    lp = jnp.take_along_axis(logp, gt_seg[..., None], axis=-1)[..., 0]
    p = jnp.exp(lp)
    return SEG_WEIGHT * jnp.mean(-alpha * (1 - p) ** gamma * lp)


def total_loss(cfg: ModelConfig, outs: dict, batch: dict):
    losses = decoder_loss(cfg, outs, batch)
    if "gt_depth" in batch:
        losses["depth_loss"] = depth_loss(cfg, outs["depth"], batch["gt_depth"])
    if "gt_seg" in batch:
        losses["seg_loss"] = seg_focal_loss(outs["seg"], batch["gt_seg"])
    total = sum(v for k, v in losses.items() if not k.startswith("metric_"))
    losses["loss"] = total
    return total, losses
