"""Router (A*), random routes, augmentation, expert noiser."""

import jax
import jax.numpy as jnp
import numpy as np

from thinktwice_tpu.agents.noiser import apply_noise, noise_for_tick
from thinktwice_tpu.maps.router import build_graph, generate_random_routes, plan_route
from thinktwice_tpu.train.augment import augment_images, curriculum


def test_plan_route_same_loop(town):
    g = build_graph(town)
    # two points on the same block loop
    r = plan_route(g, [10.0, -1.75], [80.0, -1.75])
    assert r is not None
    length = np.linalg.norm(np.diff(r[:, :2], axis=0), axis=1).sum()
    assert 60.0 < length < 120.0


def test_plan_route_across_loops(town):
    g = build_graph(town)
    # from the bottom road to the top road requires junction/lane-change links
    r = plan_route(g, [50.0, -1.75], [50.0, 201.75])
    assert r is not None
    # roughly 200+ meters of travel
    length = np.linalg.norm(np.diff(r[:, :2], axis=0), axis=1).sum()
    assert length > 180.0


def test_generate_random_routes(town):
    routes = generate_random_routes(town, 4, min_length=80.0, seed=3)
    assert len(routes) == 4
    for r in routes:
        assert r.shape[1] == 3
        length = np.linalg.norm(np.diff(r[:, :2], axis=0), axis=1).sum()
        assert length >= 80.0


def test_augment_preserves_range_and_shape():
    rng = jax.random.key(0)
    imgs = jax.random.uniform(rng, (2, 16, 24, 3))
    out = augment_images(jax.random.key(1), imgs, 1.0)
    assert out.shape == imgs.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    # strength 0 => identity
    out0 = augment_images(jax.random.key(1), imgs, 0.0)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(imgs), atol=1e-6)


def test_curriculum_ramp():
    assert float(curriculum(0)) == 0.0
    assert float(curriculum(5_000)) == 0.5
    assert float(curriculum(50_000)) == 1.0


def test_noiser_episodes():
    rng = jax.random.key(42)
    vals = np.asarray(
        [float(noise_for_tick(rng, jnp.asarray(t), 0.05)) for t in range(0, 20000, 50)]
    )
    assert np.abs(vals).max() > 0.05       # episodes do happen
    assert (vals == 0.0).mean() > 0.7      # but most of the time it's quiet
    ctrl = apply_noise(rng, jnp.asarray(100), jnp.asarray([0.0, 0.5, 0.0]))
    assert ctrl.shape == (3,)
    assert -1.0 <= float(ctrl[0]) <= 1.0
