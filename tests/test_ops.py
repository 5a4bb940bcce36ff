"""Unit tests for TPU-native ops: voxel pooling, grid sample, deform attn."""

import jax
import jax.numpy as jnp
import numpy as np

from thinktwice_tpu.ops.deform_attn import ms_deform_attn
from thinktwice_tpu.ops.grid_sample import grid_sample_2d, grid_sample_norm
from thinktwice_tpu.ops.voxel_pool import lift_splat_pool, voxel_pool


def test_voxel_pool_scatter():
    # two points into distinct cells, one out of grid
    geom = jnp.asarray(
        [[[0.5, 0.5, 0.0], [2.5, 0.5, 0.0], [99.0, 0.0, 0.0]]]
    )  # (1, 3, 3)
    feats = jnp.asarray([[[1.0, 2.0], [3.0, 4.0], [100.0, 100.0]]])
    bev = voxel_pool(geom, feats, x_min=0.0, y_min=0.0, cell=1.0, nx=4, ny=4)
    assert bev.shape == (1, 4, 4, 2)
    np.testing.assert_allclose(np.asarray(bev[0, 0, 0]), [1.0, 2.0])
    np.testing.assert_allclose(np.asarray(bev[0, 0, 2]), [3.0, 4.0])
    assert float(jnp.sum(bev)) == 10.0  # out-of-grid dropped


def test_voxel_pool_accumulates():
    geom = jnp.asarray([[[0.1, 0.1, 0.0], [0.9, 0.9, 0.0]]])
    feats = jnp.ones((1, 2, 3))
    bev = voxel_pool(geom, feats, 0.0, 0.0, 1.0, 2, 2)
    np.testing.assert_allclose(np.asarray(bev[0, 0, 0]), [2.0, 2.0, 2.0])


def test_lift_splat_pool_matches_naive():
    """Factored matmul pooling == naive outer-product + scatter."""
    rng = np.random.RandomState(0)
    N, D, HW, C = 2, 5, 12, 7
    geom = jnp.asarray(rng.uniform(-2, 6, (N, D, HW, 3)), jnp.float32)
    dp = jax.nn.softmax(jnp.asarray(rng.randn(N, D, HW), jnp.float32), axis=1)
    ctx = jnp.asarray(rng.randn(N, HW, C), jnp.float32)

    bev = lift_splat_pool(geom, dp, ctx, x_min=0.0, y_min=0.0, cell=1.0,
                          nx=4, ny=4)

    # naive: materialize product then scatter
    prod = dp[..., None] * ctx[:, None]                 # (N, D, HW, C)
    bev_naive = voxel_pool(
        geom.reshape(1, -1, 3), prod.reshape(1, -1, C),
        x_min=0.0, y_min=0.0, cell=1.0, nx=4, ny=4,
    )[0]
    np.testing.assert_allclose(
        np.asarray(bev), np.asarray(bev_naive), rtol=1e-4, atol=1e-5
    )


def test_lift_splat_pool_grad():
    geom = jnp.asarray(np.random.RandomState(1).uniform(0, 4, (1, 3, 4, 3)), jnp.float32)
    dp = jnp.ones((1, 3, 4)) / 3.0
    ctx = jnp.ones((1, 4, 2))

    def f(ctx):
        return jnp.sum(
            lift_splat_pool(geom, dp, ctx, 0.0, 0.0, 1.0, 4, 4) ** 2
        )

    g = jax.grad(f)(ctx)
    assert np.isfinite(np.asarray(g)).all()


def test_grid_sample_identity():
    img = jnp.arange(12.0).reshape(3, 4, 1)
    # sample exactly at pixel centers
    coords = jnp.asarray([[1.0, 1.0], [2.0, 2.0], [0.0, 0.0]])
    out = grid_sample_2d(img, coords)
    np.testing.assert_allclose(np.asarray(out[:, 0]), [5.0, 10.0, 0.0])


def test_grid_sample_interpolation_and_padding():
    img = jnp.asarray([[0.0, 2.0], [4.0, 6.0]]).reshape(2, 2, 1)
    out = grid_sample_2d(img, jnp.asarray([[0.5, 0.5]]))
    np.testing.assert_allclose(np.asarray(out[0, 0]), 3.0)
    # far outside -> 0
    out2 = grid_sample_2d(img, jnp.asarray([[-5.0, -5.0]]))
    np.testing.assert_allclose(np.asarray(out2[0, 0]), 0.0)


def test_grid_sample_norm_convention():
    img = jnp.arange(16.0).reshape(4, 4, 1)
    # center of the image in normalized coords
    out = grid_sample_norm(img, jnp.asarray([[0.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(out[0, 0]), 7.5)


def test_ms_deform_attn_uniform_weights():
    """With one level, zero offsets at the same point, output = sampled value
    scaled by summed weights."""
    B, Q, h, d = 1, 2, 2, 4
    H = W = 4
    value = jnp.ones((B, H * W, h * d))
    locs = jnp.full((B, Q, h, 1, 3, 2), 0.5)  # center, 3 points
    weights = jnp.full((B, Q, h, 1, 3), 1.0 / 3.0)
    out = ms_deform_attn(value, [(H, W)], locs, weights)
    assert out.shape == (B, Q, h * d)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-5)


def test_ms_deform_attn_out_of_bounds_zero():
    B, Q, h, d = 1, 1, 1, 2
    value = jnp.ones((B, 4, h * d))
    locs = jnp.full((B, Q, h, 1, 1, 2), 5.0)  # far outside
    weights = jnp.ones((B, Q, h, 1, 1))
    out = ms_deform_attn(value, [(2, 2)], locs, weights)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_ms_deform_attn_matches_per_head_reference():
    """The channel-fused TPU layout must be numerically identical to the
    CUDA kernel's per-head semantics (multi_scale_deformable_attn_pytorch):
    head h samples at its own locations and owns channel block h."""
    rng = np.random.default_rng(0)
    B, Q, h, d, P = 2, 5, 4, 8, 3
    shapes = [(6, 9), (3, 4)]
    sum_hw = sum(H * W for H, W in shapes)
    value = jnp.asarray(rng.normal(size=(B, sum_hw, h * d)), jnp.float32)
    locs = jnp.asarray(rng.uniform(-0.1, 1.1, (B, Q, h, 2, P, 2)), jnp.float32)
    weights = jax.nn.softmax(
        jnp.asarray(rng.normal(size=(B, Q, h, 2 * P)), jnp.float32), axis=-1
    ).reshape(B, Q, h, 2, P)
    out = ms_deform_attn(value, shapes, locs, weights)

    # reference: per-head bilinear grid-sample with zero padding
    ref = np.zeros((B, Q, h, d), np.float32)
    v_np = np.asarray(value).reshape(B, sum_hw, h, d)
    offs = [0, shapes[0][0] * shapes[0][1]]
    for lvl, (H, W) in enumerate(shapes):
        vl = v_np[:, offs[lvl] : offs[lvl] + H * W].reshape(B, H, W, h, d)
        for b in range(B):
            for q in range(Q):
                for hh in range(h):
                    for p in range(P):
                        x = float(locs[b, q, hh, lvl, p, 0]) * W - 0.5
                        y = float(locs[b, q, hh, lvl, p, 1]) * H - 0.5
                        x0, y0 = int(np.floor(x)), int(np.floor(y))
                        fx, fy = x - x0, y - y0
                        acc = np.zeros(d, np.float32)
                        for dx, dy, wgt in [
                            (0, 0, (1 - fx) * (1 - fy)),
                            (1, 0, fx * (1 - fy)),
                            (0, 1, (1 - fx) * fy),
                            (1, 1, fx * fy),
                        ]:
                            xi, yi = x0 + dx, y0 + dy
                            if 0 <= xi < W and 0 <= yi < H:
                                acc += wgt * vl[b, yi, xi, hh]
                        ref[b, q, hh] += float(weights[b, q, hh, lvl, p]) * acc
    np.testing.assert_allclose(
        np.asarray(out), ref.reshape(B, Q, h * d), rtol=2e-5, atol=2e-5
    )
