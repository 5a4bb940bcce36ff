"""Pallas raycast kernel vs the XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from thinktwice_tpu.ops.raycast_pallas import ray_boxes_pallas
from thinktwice_tpu.sensors.raycast import ray_boxes


def test_matches_xla_reference():
    rng = np.random.RandomState(0)
    R, N = 512, 24
    origins = jnp.asarray(rng.uniform(-5, 5, (R, 3)).astype(np.float32))
    origins = origins.at[:, 2].set(1.5)
    d = rng.randn(R, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    dirs = jnp.asarray(d)
    pose = np.zeros((N, 6), np.float32)
    pose[:, 0:2] = rng.uniform(-30, 30, (N, 2))
    pose[:, 2] = rng.uniform(-3, 3, N)
    pose[:, 3] = 2.4
    pose[:, 4] = 1.1
    pose[:, 5] = 1.6
    pose = jnp.asarray(pose)
    act = jnp.asarray(rng.rand(N) > 0.2)

    t_ref, i_ref = ray_boxes(origins, dirs, pose, act)
    t_pal, i_pal = ray_boxes_pallas(origins, dirs, pose, act, interpret=True)

    t_ref, t_pal = np.asarray(t_ref), np.asarray(t_pal)
    hit_ref, hit_pal = t_ref < 1e5, t_pal < 1e5
    np.testing.assert_array_equal(hit_ref, hit_pal)
    np.testing.assert_allclose(t_ref[hit_ref], t_pal[hit_pal], rtol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(i_ref)[hit_ref], np.asarray(i_pal)[hit_pal]
    )


def test_non_multiple_of_tile():
    # R not a multiple of 1024 exercises the padding path
    origins = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (77, 1))
    dirs = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (77, 1))
    pose = jnp.asarray([[10.0, 0.0, 0.0, 2.0, 1.0, 1.5]])
    act = jnp.ones((1,), bool)
    t, idx = ray_boxes_pallas(origins, dirs, pose, act, interpret=True)
    np.testing.assert_allclose(np.asarray(t), 8.0, rtol=1e-6)
    assert (np.asarray(idx) == 0).all()
