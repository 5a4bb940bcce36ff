"""Image augmentation for student training: the imgaug curriculum, in JAX.

≡ code/datasets/pipelines/transform.py ImageTransformMulti (:171-216):
blur/noise/dropout whose strength ramps with training progress, applied
before ImageNet normalization. Here: brightness/contrast jitter, additive
gaussian noise, channel dropout and a box-blur, each gated by a curriculum
scalar in [0, 1] (reference ramps with batch count). Pure jnp so it fuses
into the (jitted) train step — no host-side image workers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _box_blur(img, k: int = 3):
    """(..., H, W, C) mean filter via separable cumsum trick (cheap, fixed k)."""
    pad = k // 2
    x = jnp.pad(img, [(0, 0)] * (img.ndim - 3) + [(pad, pad), (pad, pad), (0, 0)],
                mode="edge")
    # separable mean
    x = sum(jnp.roll(x, s, axis=-3) for s in range(-pad, pad + 1)) / k
    x = sum(jnp.roll(x, s, axis=-2) for s in range(-pad, pad + 1)) / k
    return x[..., pad:-pad, pad:-pad, :]


def augment_images(rng, imgs, strength):
    """imgs (..., H, W, 3) in [0, 1]; strength scalar in [0, 1] (curriculum).

    Returns perturbed images in [0, 1]. Each sub-augmentation draws its own
    switch so samples see diverse corruption combinations."""
    k = jax.random.split(rng, 6)
    s = jnp.asarray(strength)

    bright = 1.0 + 0.3 * s * jax.random.uniform(k[0], (), minval=-1.0, maxval=1.0)
    contrast = 1.0 + 0.3 * s * jax.random.uniform(k[1], (), minval=-1.0, maxval=1.0)
    out = (imgs - 0.5) * contrast + 0.5
    out = out * bright

    noise_sigma = 0.05 * s * jax.random.uniform(k[2], ())
    out = out + noise_sigma * jax.random.normal(k[3], imgs.shape)

    do_blur = jax.random.bernoulli(k[4], 0.3 * s)
    out = jnp.where(do_blur, _box_blur(out), out)

    # channel dropout (coarse cutout of one channel scaled down)
    do_drop = jax.random.bernoulli(k[5], 0.2 * s)
    ch = jax.random.randint(jax.random.fold_in(k[5], 1), (), 0, 3)
    mask = jax.nn.one_hot(ch, 3) * 0.5
    out = jnp.where(do_drop, out * (1.0 - mask), out)

    return jnp.clip(out, 0.0, 1.0)


def curriculum(step, ramp_steps: int = 10_000):
    """Strength ramp with training progress (ImageTransformMulti's batch-count
    ramp)."""
    return jnp.clip(step / ramp_steps, 0.0, 1.0)


# ---------------------------------------------------------------------------
# IDA geometric augmentation (BEVDepth-style resize/crop/flip with 4x4
# ida_mat bookkeeping; transform.py IDAImageTransform:221-341 + img_transform
# :346-378). The reference renders at 1600x900 and crops to 448x896; our
# images are already at final size, so the augmentation is an upscale
# (resize_lim >= 1) + random crop of the overflow + random horizontal flip,
# realized as ONE continuous affine warp per camera (grid-sample, static
# shapes — no dynamic crops under jit). The sampled 4x4 ida_mat rides into
# the model: LSS unprojects frustum pixels through ida^-1 and DepthNet's
# camera-param MLP sees the 6 affine entries (lss.py:209-232, :474-496).
# ---------------------------------------------------------------------------


def sample_ida_mats(rng, B, N, H, W, resize_lim=(1.0, 1.15), flip_p=0.5):
    """-> (B, N, 4, 4) f32 augmented-from-raw pixel transforms.

    p_aug = A[:2,:2] @ p_raw + A[:2,3]; bottom-aligned vertical crop
    (bot_pct_lim = (0,0) in the reference config), uniform horizontal crop,
    per-camera flip."""
    k1, k2, k3 = jax.random.split(rng, 3)
    s = jax.random.uniform(
        k1, (B, N), minval=resize_lim[0], maxval=resize_lim[1]
    )
    crop_h = s * H - H                                     # bottom-aligned
    crop_w = jax.random.uniform(k2, (B, N)) * (s * W - W)
    flip = jax.random.bernoulli(k3, flip_p, (B, N))

    # rot = diag(s, s); flip maps x' -> (W - 1) - x', composed with
    # scale+crop: x_aug = (W - 1) - s*x + crop_w
    sx = jnp.where(flip, -s, s)
    tx = jnp.where(flip, (W - 1.0) + crop_w, -crop_w)
    ida = jnp.zeros((B, N, 4, 4))
    ida = ida.at[..., 0, 0].set(sx)
    ida = ida.at[..., 1, 1].set(s)
    ida = ida.at[..., 0, 3].set(tx)
    ida = ida.at[..., 1, 3].set(-crop_h)
    ida = ida.at[..., 2, 2].set(1.0)
    ida = ida.at[..., 3, 3].set(1.0)
    return ida


def _warp_affine(img, ida, ds: float = 1.0, nearest: bool = False):
    """Warp one image (H, W[, C]) into augmented space: output pixel p_out
    (at resolution 1/ds of the ida's pixel units) samples the input at
    ida^-1 @ p_out."""
    from thinktwice_tpu.ops.grid_sample import grid_sample_2d

    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    H, W = img.shape[0], img.shape[1]
    A = ida
    det = A[0, 0] * A[1, 1]
    inv00 = A[1, 1] / det
    inv11 = A[0, 0] / det
    ys = (jnp.arange(H) + 0.5) * ds - 0.5
    xs = (jnp.arange(W) + 0.5) * ds - 0.5
    gx, gy = jnp.meshgrid(xs, ys)
    rx = inv00 * (gx - A[0, 3])
    ry = inv11 * (gy - A[1, 3])
    coords = jnp.stack([rx, ry], axis=-1) / ds
    if nearest:
        coords = jnp.round(coords)
    out = grid_sample_2d(img, coords)
    return out[..., 0] if squeeze else out


def ida_augment(rng, batch: dict, resize_lim=(1.0, 1.15), flip_p=0.5) -> dict:
    """Apply IDA to a training batch: warps imgs (all sweeps, same per-camera
    transform — IDAImageTransform samples per cam_id and reuses it for every
    frame_id), gt_depth and gt_seg; adds batch['ida'] (B, N, 4, 4)."""
    out = dict(batch)
    imgs = batch["imgs"]                                    # (B, T, N, H, W, 3)
    B, T, N, H, W, _ = imgs.shape
    ida = sample_ida_mats(rng, B, N, H, W, resize_lim, flip_p)

    warp_btn = jax.vmap(  # over B
        jax.vmap(  # over T
            jax.vmap(_warp_affine, in_axes=(0, 0)),  # over N
            in_axes=(0, None),
        )
    )
    out["imgs"] = warp_btn(imgs, ida)
    ida_flat = ida.reshape(B * N, 4, 4)
    if batch.get("gt_depth") is not None:
        out["gt_depth"] = jax.vmap(
            lambda g, a: _warp_affine(g, a, nearest=True)
        )(batch["gt_depth"], ida_flat)
    if batch.get("gt_seg") is not None:
        g = batch["gt_seg"]
        ds = H / g.shape[1]
        out["gt_seg"] = jax.vmap(
            lambda gi, a: _warp_affine(
                gi.astype(jnp.float32), a, ds=ds, nearest=True
            ).astype(gi.dtype)
        )(g, ida_flat)
    out["ida"] = ida
    return out


# ---------------------------------------------------------------------------
# Geometric flip augmentation (the role of rand_flip in the BEVDepth IDA
# pipeline, transform.py ida_aug_conf): mirror the whole world about the
# ego's longitudinal axis. Because scene, supervision, and sensors are all
# generated in-graph, the geometric quantities transform exactly:
#   images:   horizontal mirror of each camera + swap left/right cameras
#   lidar:    y -> -y
#   targets:  waypoint/target y -> -y; steering Beta params swapped
# Requires a laterally symmetric camera rig (ours: yaws 0, -90, 90, 180).
#
# The Roach feature/CNN distillation targets are NOT mirror-equivariant
# (conv features of a mirrored input != mirrored features), so mirrored
# batches zero those loss terms via batch["distil_weight"] — the behavior-
# cloning terms get the augmentation, distillation trains on the unmirrored
# half.
# ---------------------------------------------------------------------------

# camera order (front, left, right, back) -> mirrored order
_CAM_SWAP = (0, 2, 1, 3)


def mirror_batch(batch: dict) -> dict:
    """Mirror a training batch about the ego x-axis. Involutive:
    mirror(mirror(b)) == b."""
    out = dict(batch)
    imgs = batch["imgs"]                                # (B, T, N, H, W, 3)
    out["imgs"] = imgs[:, :, _CAM_SWAP, :, ::-1]

    def flip_y(x):
        return x.at[..., 1].multiply(-1.0)

    out["points"] = flip_y(batch["points"])
    out["target_point"] = flip_y(batch["target_point"])
    out["gt_waypoints"] = flip_y(batch["gt_waypoints"])
    if "teacher_wp" in batch and batch["teacher_wp"] is not None:
        out["teacher_wp"] = flip_y(batch["teacher_wp"])

    # Beta action (acc, steer): steer s in [-1,1] maps to Beta on [0,1] via
    # (s+1)/2; mirroring steer negates s, i.e. swaps (alpha, beta) of the
    # steer dim. Acc dim is unchanged.
    def swap_steer(a, b):
        a2 = a.at[..., 1].set(b[..., 1])
        b2 = b.at[..., 1].set(a[..., 1])
        return a2, b2

    for ka, kb in (
        ("action_alpha", "action_beta"),
        ("future_action_alpha", "future_action_beta"),
    ):
        if ka in batch:
            out[ka], out[kb] = swap_steer(batch[ka], batch[kb])
    if "teacher_ctrl_sp" in batch and batch["teacher_ctrl_sp"] is not None:
        t = batch["teacher_ctrl_sp"]                    # (B, T, 4) = a_acc a_st b_acc b_st
        out["teacher_ctrl_sp"] = t[..., jnp.asarray([0, 3, 2, 1])]

    # command one-hot (reference indexing, train.collect): swap LEFT(0) with
    # RIGHT(1) and CHANGELANELEFT(4) with CHANGELANERIGHT(5)
    if "command" in batch:
        out["command"] = batch["command"][..., jnp.asarray([1, 0, 2, 3, 5, 4])]

    # per-sweep ego-motion transforms conjugate by the mirror F=diag(1,-1,1,1)
    if "sweep2key" in batch:
        F = jnp.diag(jnp.asarray([1.0, -1.0, 1.0, 1.0]))
        out["sweep2key"] = jnp.einsum(
            "ij,...jk,kl->...il", F, batch["sweep2key"], F
        )

    # per-camera GT maps: mirror horizontally + swap cameras. Stored flat as
    # (B*N, h, w[, ...]) with N = 4.
    for key in ("gt_depth", "gt_seg"):
        if key in batch and batch[key] is not None:
            g = batch[key]
            B_N = g.shape[0]
            g = g.reshape(B_N // 4, 4, *g.shape[1:])
            g = g[:, _CAM_SWAP, :, ::-1]
            out[key] = g.reshape(B_N, *g.shape[2:])

    # distillation targets are not mirror-equivariant: gate them off
    out["distil_weight"] = jnp.zeros(())
    return out


def maybe_mirror(rng, batch: dict, per_example: bool = True) -> dict:
    """Mirror augmentation with static shapes.

    per_example=True mirrors each example independently (p=0.5) and emits a
    per-example (B,) distil_weight — the unmirrored half of every batch keeps
    its Roach distillation signal (whole-batch mirroring zeroed ALL
    distillation terms on half the training steps). per_example=False is the
    round-2 whole-batch behavior."""
    batch = dict(batch)
    B = batch["imgs"].shape[0]
    prev_dw = batch.pop("distil_weight", jnp.ones((B,)))
    prev_dw = jnp.broadcast_to(jnp.asarray(prev_dw), (B,))
    mirrored = mirror_batch(batch)
    mirrored.pop("distil_weight", None)
    if per_example:
        do = jax.random.bernoulli(rng, 0.5, (B,))
    else:
        do = jnp.broadcast_to(jax.random.bernoulli(rng), (B,))

    def sel_leaf(a, b):
        if a is None:
            return None
        if a.shape[:1] == (B,):
            m = jnp.reshape(do, (B,) + (1,) * (a.ndim - 1))
        elif a.shape[:1] == (4 * B,):     # per-camera flat gt_depth/gt_seg
            m = jnp.reshape(
                jnp.repeat(do, 4), (4 * B,) + (1,) * (a.ndim - 1)
            )
        else:                             # global (rig constants etc.)
            return a
        return jnp.where(m, b, a)

    out = {
        k: jax.tree.map(sel_leaf, batch[k], mirrored[k]) for k in batch
    }
    out["distil_weight"] = jnp.where(do, 0.0, prev_dw)
    return out
