"""LSS camera encoder: lift-splat-shoot with camera-aware depth (BEVDepth
style), re-designed for TPU.

Capability parity with the reference LSS backbone
(open_loop_training/code/model_code/backbones/lss.py:20-724):
- ResNet + PAFPN multi-scale image features (:515-527),
- DepthNet at stride 16: camera-parameter SE conditioning, residual blocks,
  ASPP, 80 depth bins [1, 41) @ 0.5 m + 256 context channels (:161-240;
  the single DCN layer there is replaced by a plain conv — N6 in SURVEY §2.3,
  accuracy-neutral deviation),
- UNet-style segmentation head over FPN features with seg->feature
  reinjection (:260-282, :407-439),
- frustum -> ego geometry (:454-512) and voxel pooling to the 21x21 Roach
  BEV grid (x [-8, 30.4], y [-19.2, 19.2], 1.8285 m cells;
  configs/thinktwice.py:132-136).

TPU re-design notes: the CUDA scatter-add voxel_pooling (N2) becomes the
factored matmul pooling in ops/voxel_pool.lift_splat_pool (scatter only
scalars, contract context on the MXU). Multi-sweep support follows the
reference (:689-723): history sweeps run under stop_gradient and merge via a
1x1 conv.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from thinktwice_tpu.config import ModelConfig
from thinktwice_tpu.models.layers import ConvGN, SEModule
from thinktwice_tpu.models.resnet import PAFPN, ResNet
from thinktwice_tpu.ops.voxel_pool import lift_splat_pool

DOWNSAMPLE = 16  # DepthNet operates on the stride-16 FPN level


class ASPP(nn.Module):
    """Atrous pyramid (lss.py ASPP) with dilations 1/2/3 + global pooling."""

    features: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        conv = lambda *a, **kw: nn.Conv(*a, dtype=self.dtype, **kw)
        branches = [conv(self.features, (1, 1))(x)]
        for rate in (2, 3):
            branches.append(
                conv(
                    self.features, (3, 3), kernel_dilation=(rate, rate),
                    padding="SAME",
                )(x)
            )
        gp = jnp.mean(x, axis=(1, 2), keepdims=True)
        gp = conv(self.features, (1, 1))(gp)
        branches.append(jnp.broadcast_to(gp, branches[0].shape))
        h = jnp.concatenate(branches, axis=-1)
        return nn.relu(conv(self.features, (1, 1))(h))


class DepthNet(nn.Module):
    """Stride-16 feature -> (depth logits D, context C), SE-conditioned on
    flattened camera parameters (lss.py DepthNet:161-240)."""

    n_depth_bins: int
    context_channels: int
    mid_channels: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, x, cam_params):
        """x (B*N, h, w, Cin); cam_params (B*N, P) flattened intrinsics +
        extrinsics (+ida when augmenting)."""
        x = ConvGN(self.mid_channels, dtype=self.dtype)(x)

        # camera-aware SE: MLP(cam params) -> per-channel scale
        se = nn.relu(nn.Dense(self.mid_channels, dtype=self.dtype)(cam_params))
        se = nn.sigmoid(nn.Dense(self.mid_channels, dtype=self.dtype)(se))
        x = x * se[:, None, None, :]

        context = nn.Conv(self.context_channels, (1, 1), dtype=self.dtype)(x)

        d = x
        for _ in range(3):  # 3 x BasicBlock
            h = ConvGN(self.mid_channels, dtype=self.dtype)(d)
            h = ConvGN(self.mid_channels, act=False, dtype=self.dtype)(h)
            d = nn.relu(d + h)
        d = ASPP(self.mid_channels, dtype=self.dtype)(d)
        depth = nn.Conv(self.n_depth_bins, (1, 1), dtype=self.dtype)(d)
        return depth, context


class SegHead(nn.Module):
    """UNet-ish seg head over the 4 FPN levels -> logits at 1/4 input res
    (reference outputs 1/2; we stop one level earlier — the loss downsamples
    GT to match either way, encoder_decoder_framework.py:485-491)."""

    n_classes: int
    dtype: Any = None

    @nn.compact
    def __call__(self, fpn_feats):
        x = fpn_feats[-1]
        for skip in fpn_feats[-2::-1]:
            b, h, w, c = skip.shape
            x = jax.image.resize(x, (b, h, w, x.shape[-1]), "nearest")
            x = ConvGN(256, dtype=self.dtype)(jnp.concatenate([x, skip], axis=-1))
        seg = nn.Conv(self.n_classes, (1, 1), dtype=self.dtype)(x)
        feat = ConvGN(64, dtype=self.dtype)(x)  # reinjection features
        return seg, feat


def make_frustum(cfg: ModelConfig, h: int, w: int):
    """(D, h, w, 3) of (u_px, v_px, depth_m) at feature-cell centers."""
    ds = cfg.depth_min + cfg.depth_step * jnp.arange(cfg.n_depth_bins)
    us = (jnp.arange(w) + 0.5) * DOWNSAMPLE
    vs = (jnp.arange(h) + 0.5) * DOWNSAMPLE
    D = cfg.n_depth_bins
    u = jnp.broadcast_to(us[None, None, :], (D, h, w))
    v = jnp.broadcast_to(vs[None, :, None], (D, h, w))
    d = jnp.broadcast_to(ds[:, None, None], (D, h, w))
    return jnp.stack([u, v, d], axis=-1)


def frustum_to_ego(frustum, cam2ego, intrin_inv, ida=None):
    """frustum (D, h, w, 3); cam2ego (4, 4); intrin_inv (3, 3) -> ego xyz.

    (lss.py get_geometry:454-512.) With `ida` (4, 4) the frustum's pixel
    coordinates live in AUGMENTED image space and are mapped back through
    ida^-1 before unprojection (the reference's ida_mat.inverse() at
    lss.py:493-496)."""
    u, v, d = frustum[..., 0], frustum[..., 1], frustum[..., 2]
    if ida is not None:
        det = ida[0, 0] * ida[1, 1]
        u = (u - ida[0, 3]) * (ida[1, 1] / det)
        v = (v - ida[1, 3]) * (ida[0, 0] / det)
    pix = jnp.stack([u * d, v * d, d], axis=-1)
    cam = jnp.einsum("ij,dhwj->dhwi", intrin_inv, pix)
    return (
        jnp.einsum("ij,dhwj->dhwi", cam2ego[:3, :3], cam) + cam2ego[:3, 3]
    )


class LSS(nn.Module):
    """Multi-camera -> BEV. Returns dict:
    bev (B, ny, nx, C), fpn_feats list[(B*N, h, w, 256)], depth logits
    (B*N, h, w, D), seg logits (B*N, H/4, W/4, n_seg)."""

    cfg: ModelConfig
    backbone_depth: int = 50

    @nn.compact
    def __call__(self, imgs, cam2ego, intrinsics, ego2key=None, ida=None):
        """imgs (B, N, H, W, 3) normalized; cam2ego (N, 4, 4);
        intrinsics (3, 3) shared; ego2key (B, 4, 4) optional per-sample
        transform from this sweep's ego frame into the key frame (the
        reference's curr2key composition, lss.py:667-687) — identity/None for
        the key sweep; ida (B, N, 4, 4) optional augmented-from-raw pixel
        transforms (train.augment.ida_augment)."""
        m = self.cfg
        B, N, H, W, _ = imgs.shape
        # bf16 trunk: the conv stacks (backbone/neck/seg/depth) carry the
        # bulk of training activations — half-precision halves that HBM and
        # feeds the MXU its native dtype; geometry, softmax-pooling and all
        # losses stay f32 (GroupNorm accumulates f32 internally)
        x = imgs.reshape(B * N, H, W, 3).astype(jnp.bfloat16)

        # the backbone remats per residual block internally (see
        # models/resnet.py) — the standard TPU memory/FLOPs trade with a
        # bounded backward peak
        bf16 = jnp.bfloat16
        feats = ResNet(self.backbone_depth, dtype=bf16, name="backbone")(x)
        fpn = nn.remat(PAFPN)(256, dtype=bf16, name="neck")(feats)

        seg, seg_feat = nn.remat(SegHead)(
            m.n_seg_classes, dtype=bf16, name="seg_head"
        )(fpn)

        # seg -> feature reinjection at stride 16 (lss.py:407-439,587-591)
        f16 = fpn[2]
        h, w = f16.shape[1], f16.shape[2]
        seg_ds = nn.avg_pool(seg_feat, (4, 4), strides=(4, 4))
        f16 = f16 + nn.Conv(256, (1, 1), dtype=bf16, name="seg_reinject")(seg_ds)

        # camera-param conditioning incl. the 6 ida affine entries
        # (lss.py:209-232 — intrin + ida[0,0],[0,1],[0,3],[1,0],[1,1],[1,3]
        # + extrinsics; identity ida when not augmenting)
        if ida is None:
            ida_entries = jnp.tile(
                jnp.asarray([1.0, 0.0, 0.0, 0.0, 1.0, 0.0]), (B * N, 1)
            )
        else:
            ida_entries = jnp.stack(
                [
                    ida[..., 0, 0], ida[..., 0, 1], ida[..., 0, 3],
                    ida[..., 1, 0], ida[..., 1, 1], ida[..., 1, 3],
                ],
                axis=-1,
            ).reshape(B * N, 6)
        cam_params = jnp.concatenate(
            [
                jnp.tile(intrinsics.reshape(1, 9), (B * N, 1)),
                ida_entries,
                jnp.tile(cam2ego[:, :3, :].reshape(N, 12), (B, 1)),
            ],
            axis=-1,
        )
        depth_logits, context = DepthNet(
            m.n_depth_bins, m.bev_channels, dtype=bf16, name="depth_net"
        )(f16, cam_params)

        depth_logits = depth_logits.astype(jnp.float32)
        context = context.astype(jnp.float32)
        depth_prob = jax.nn.softmax(depth_logits, axis=-1)    # (B*N, h, w, D)

        frustum = make_frustum(m, h, w)
        intrin_inv = jnp.linalg.inv(intrinsics)
        if ida is not None:
            # per-(sample, camera) geometry: ida varies across the batch
            geom_bn = jax.vmap(
                jax.vmap(
                    lambda c2e, a: frustum_to_ego(frustum, c2e, intrin_inv, a),
                    in_axes=(0, 0),
                ),
                in_axes=(None, 0),
            )(cam2ego, ida)                                   # (B, N, D, h, w, 3)
        else:
            geom_bn = None
        geom = jax.vmap(lambda c2e: frustum_to_ego(frustum, c2e, intrin_inv))(
            cam2ego
        )                                                     # (N, D, h, w, 3)

        cell = (m.bev_x_max - m.bev_x_min) / m.bev_size
        geom_flat = geom.reshape(N, m.n_depth_bins, h * w, 3)

        dp = depth_prob.reshape(B, N, h * w, m.n_depth_bins)
        dp = jnp.moveaxis(dp, -1, 2)                          # (B, N, D, hw)
        ctx = context.reshape(B, N, h * w, m.bev_channels)

        def pool_one(geom_b, dp_b, ctx_b):
            return lift_splat_pool(
                geom_b, dp_b, ctx_b,
                x_min=m.bev_x_min, y_min=m.bev_y_min, cell=cell,
                nx=m.bev_size, ny=m.bev_size,
                z_min=-4.0, z_max=10.0,
            )

        geom_b = None
        if geom_bn is not None:
            geom_b = geom_bn.reshape(B, N, m.n_depth_bins, h * w, 3)
        if ego2key is not None:
            # per-sample ego-motion compensation: frustum points move into
            # the key ego frame before pooling, so a history sweep's BEV
            # lands on the same cells as the key sweep's
            if geom_b is None:
                rot = jnp.einsum("bij,ndpj->bndpi", ego2key[:, :3, :3], geom_flat)
            else:
                rot = jnp.einsum("bij,bndpj->bndpi", ego2key[:, :3, :3], geom_b)
            geom_b = rot + ego2key[:, None, None, None, :3, 3]
        if geom_b is not None:
            bev = jax.vmap(pool_one)(geom_b, dp, ctx)
        else:
            bev = jax.vmap(lambda d, c: pool_one(geom_flat, d, c))(dp, ctx)

        return {
            "bev": bev,
            "fpn_feats": [f.astype(jnp.float32) for f in fpn],
            "depth": depth_logits,
            "seg": seg.astype(jnp.float32),
        }


class MultiSweepLSS(nn.Module):
    """Key frame + history sweeps (no grad), concat + 1x1 merge
    (lss.py:689-723)."""

    cfg: ModelConfig
    backbone_depth: int = 50
    n_sweeps: int = 1

    @nn.compact
    def __call__(self, imgs_sweeps, cam2ego, intrinsics, sweep2key=None,
                 ida=None):
        """imgs_sweeps (B, T, N, H, W, 3), T = n_sweeps (newest last);
        sweep2key (B, T, 4, 4) optional per-sweep ego(t)->ego(key)
        transforms (geometry.sweep_to_key; identity for the key sweep).
        Without it history sweeps pool into their own ego frame — at 6 m/s
        that is a ~3 m BEV misalignment, so pass it whenever the ego moves
        (the reference always does, carla_dataset.py:290-312). ida
        (B, N, 4, 4) applies to every sweep (IDAImageTransform samples per
        camera and reuses across frames)."""
        lss = LSS(self.cfg, self.backbone_depth, name="lss")
        out = lss(imgs_sweeps[:, -1], cam2ego, intrinsics, ida=ida)
        if self.n_sweeps > 1:
            bevs = [out["bev"]]
            for t in range(self.n_sweeps - 1):
                e2k = None if sweep2key is None else sweep2key[:, t]
                hist = lss(
                    jax.lax.stop_gradient(imgs_sweeps[:, t]), cam2ego,
                    intrinsics,
                    ego2key=None
                    if e2k is None
                    else jax.lax.stop_gradient(e2k),
                    ida=ida,
                )
                bevs.append(jax.lax.stop_gradient(hist["bev"]))
            merged = jnp.concatenate(bevs, axis=-1)
            out["bev"] = nn.Conv(
                self.cfg.bev_channels, (1, 1), name="sweep_merge"
            )(merged)
        return out
