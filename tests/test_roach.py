"""Roach policy architecture + Beta action head tests."""

import jax
import jax.numpy as jnp
import numpy as np

from thinktwice_tpu.agents.roach import (
    RoachPolicy,
    acc_to_control,
    beta_log_prob,
    beta_mode,
    beta_sample,
)


def test_policy_shapes():
    model = RoachPolicy()
    bv = jnp.zeros((2, 15, 192, 192))
    sv = jnp.zeros((2, 6))
    params = model.init(jax.random.key(0), bv, sv)
    out = model.apply(params, bv, sv)
    assert out["alpha"].shape == (2, 2)
    assert out["beta"].shape == (2, 2)
    assert out["value"].shape == (2, 1)
    assert out["features"].shape == (2, 256)
    # XtMaCNN conv pyramid spatial sizes (192 input, VALID convs):
    # 94, 45, 21, 10, 4, 2 — the last four are the distillation grids
    sizes = [f.shape[-1] for f in out["cnn_features"]]
    assert sizes == [94, 45, 21, 10, 4, 2]
    chans = [f.shape[1] for f in out["cnn_features"]]
    assert chans == [8, 16, 32, 64, 128, 256]
    # softplus outputs are positive
    assert float(out["alpha"].min()) > 0
    assert float(out["beta"].min()) > 0


def test_param_count_is_plausible():
    model = RoachPolicy()
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 15, 192, 192)), jnp.zeros((1, 6))
    )
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    # reference XtMaCNN+heads is ~1.5M params
    assert 0.8e6 < n < 3e6, n


def test_beta_mode_branches():
    # interior mode (alpha, beta > 1): (a-1)/(a+b-2)
    a = jnp.asarray([[2.0, 3.0]])
    b = jnp.asarray([[2.0, 2.0]])
    m = np.asarray(beta_mode(a, b))
    np.testing.assert_allclose(m[0, 0], 2 * (1.0 / 2.0) - 1, atol=1e-6)
    np.testing.assert_allclose(m[0, 1], 2 * (2.0 / 3.0) - 1, atol=1e-6)
    # edge: alpha<=1, beta>1 -> 0 -> -1 after rescale
    m2 = np.asarray(beta_mode(jnp.asarray([[0.5]]), jnp.asarray([[2.0]])))
    np.testing.assert_allclose(m2[0, 0], -1.0)
    # edge: alpha>1, beta<=1 -> 1 -> +1
    m3 = np.asarray(beta_mode(jnp.asarray([[2.0]]), jnp.asarray([[0.5]])))
    np.testing.assert_allclose(m3[0, 0], 1.0)
    # both <= 1: mean
    m4 = np.asarray(beta_mode(jnp.asarray([[0.5]]), jnp.asarray([[0.5]])))
    np.testing.assert_allclose(m4[0, 0], 0.0, atol=1e-6)


def test_beta_sample_in_range():
    s = beta_sample(jax.random.key(0), jnp.full((1000,), 2.0), jnp.full((1000,), 2.0))
    s = np.asarray(s)
    assert s.min() >= -1 and s.max() <= 1
    assert abs(s.mean()) < 0.1  # symmetric Beta(2,2) centered


def test_beta_log_prob_uniform():
    # Beta(1,1) is uniform on [0,1]; density 1 -> logp 0 per dim
    lp = beta_log_prob(
        jnp.asarray([[0.2, -0.4]]), jnp.ones((1, 2)), jnp.ones((1, 2))
    )
    np.testing.assert_allclose(np.asarray(lp), 0.0, atol=1e-4)  # f32 gammaln


def test_acc_to_control():
    c = np.asarray(acc_to_control(jnp.asarray([[0.7, -0.3], [-0.5, 0.2]])))
    np.testing.assert_allclose(c[0], [-0.3, 0.7, 0.0], atol=1e-6)
    np.testing.assert_allclose(c[1], [0.2, 0.0, 0.5], atol=1e-6)
