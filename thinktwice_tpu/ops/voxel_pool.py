"""Lift-splat voxel pooling: scatter-add frustum features into a BEV grid.

TPU-native replacement for the reference's CUDA op
(open_loop_training/ops/voxel_pooling/src/voxel_pooling_forward_cuda.cu:9-56 —
one thread per frustum point doing per-channel atomicAdd into (B, Y, X, C),
with a hand-written backward gathering grads via a saved pos_memo).

Here the same contraction is a `segment_sum` over flattened voxel ids: XLA
lowers it to a sorted scatter-add that tiles onto the VPU, and the backward
pass (a gather) falls out of autodiff for free — no pos_memo, no custom VJP.
Out-of-grid points map to an overflow bin that is sliced away.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def voxel_pool(
    geom_xyz: jax.Array,    # (..., N, 3) ego-frame coords of frustum points
    feats: jax.Array,       # (..., N, C) per-point features
    x_min: float,
    y_min: float,
    cell: float,
    nx: int,
    ny: int,
    z_min: float = -10.0,
    z_max: float = 10.0,
) -> jax.Array:
    """-> (..., ny, nx, C) pooled BEV features.

    Leading batch axes are handled by vmap-style reshaping; N is the flattened
    (cams x depth x h x w) frustum size.
    """
    batch_shape = geom_xyz.shape[:-2]
    N = geom_xyz.shape[-2]
    C = feats.shape[-1]
    g = geom_xyz.reshape(-1, N, 3)
    f = feats.reshape(-1, N, C)

    xi = jnp.floor((g[..., 0] - x_min) / cell).astype(jnp.int32)
    yi = jnp.floor((g[..., 1] - y_min) / cell).astype(jnp.int32)
    inb = (
        (xi >= 0)
        & (xi < nx)
        & (yi >= 0)
        & (yi < ny)
        & (g[..., 2] >= z_min)
        & (g[..., 2] <= z_max)
    )
    flat = jnp.where(inb, yi * nx + xi, nx * ny)  # overflow bin at the end

    def pool_one(flat_b, f_b):
        return jax.ops.segment_sum(f_b, flat_b, num_segments=nx * ny + 1)

    pooled = jax.vmap(pool_one)(flat, f)          # (B, nx*ny+1, C)
    bev = pooled[:, : nx * ny].reshape(-1, ny, nx, C)
    return bev.reshape(*batch_shape, ny, nx, C)


def lift_splat_pool(
    geom_xyz: jax.Array,    # (N_cam, D, HW, 3) frustum points in ego frame
    depth_prob: jax.Array,  # (N_cam, D, HW) softmaxed depth distribution
    context: jax.Array,     # (N_cam, HW, C) per-pixel context features
    x_min: float,
    y_min: float,
    cell: float,
    nx: int,
    ny: int,
    z_min: float = -10.0,
    z_max: float = 10.0,
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Lift-splat pooling WITHOUT materializing the depth (x) context outer
    product.

    `precision` controls the final (cells x NHW) @ (NHW x C) contraction:
    HIGHEST keeps full f32 (bit-comparable to the scatter formulation);
    DEFAULT lets the MXU use bf16 inputs (~1e-2 relative error, fine for
    training and ~3x faster on TPU).

    The CUDA reference (and a naive JAX port) first forms the full frustum
    feature tensor depth ⊗ context of size N*D*HW*C (~40M floats here) and
    then scatter-adds it. On TPU that tensor is pure HBM traffic. Instead,
    factor the pooling:

        bev[cell, c] = Σ_{n,d,hw} [bin(n,d,hw)=cell] * depth(n,d,hw) * ctx(n,hw,c)
                     = Σ_{n,hw} W[cell, (n,hw)] * ctx[(n,hw), c]

    with W[cell, nhw] = Σ_d [bin=cell] * depth — a scalar scatter over only
    N*D*HW points — followed by a (cells x NHW) @ (NHW x C) matmul that runs
    on the MXU. ~250x less scatter traffic than the direct form; backward is
    autodiff through segment_sum + dot.

    Returns (ny, nx, C). vmap over the batch axis.
    """
    N, D, HW, _ = geom_xyz.shape
    C = context.shape[-1]

    xi = jnp.floor((geom_xyz[..., 0] - x_min) / cell).astype(jnp.int32)
    yi = jnp.floor((geom_xyz[..., 1] - y_min) / cell).astype(jnp.int32)
    inb = (
        (xi >= 0) & (xi < nx) & (yi >= 0) & (yi < ny)
        & (geom_xyz[..., 2] >= z_min) & (geom_xyz[..., 2] <= z_max)
    )
    cell_id = jnp.where(inb, yi * nx + xi, nx * ny)          # (N, D, HW)

    nhw = (
        jax.lax.broadcasted_iota(jnp.int32, (N, D, HW), 0) * HW
        + jax.lax.broadcasted_iota(jnp.int32, (N, D, HW), 2)
    )
    flat_id = cell_id * (N * HW) + nhw                       # (N, D, HW)
    w = jax.ops.segment_sum(
        depth_prob.reshape(-1),
        flat_id.reshape(-1),
        num_segments=(nx * ny + 1) * N * HW,
    ).reshape(nx * ny + 1, N * HW)[: nx * ny]                # (cells, NHW)

    ctx = context.reshape(N * HW, C)
    bev = jnp.dot(
        w, ctx, preferred_element_type=jnp.float32, precision=precision
    )
    return bev.reshape(ny, nx, C)
