"""Behavior-cloning trainer smoke test: one iterate on tiny shapes must run,
produce finite metrics, and reduce the action error over a few iterations."""

import jax
import jax.numpy as jnp
import numpy as np

from thinktwice_tpu.train.bc import BCConfig, control_to_acc, make_bc


def test_control_to_acc_roundtrip():
    from thinktwice_tpu.agents.roach import acc_to_control

    ctrl = jnp.asarray([[0.3, 0.7, 0.0], [-0.2, 0.0, 1.0]])
    acc = control_to_acc(ctrl)
    back = acc_to_control(acc)
    np.testing.assert_allclose(np.asarray(back), np.asarray(ctrl), atol=1e-6)


def test_bc_iterate(small_cfg, town):
    cfg = small_cfg
    routes = np.stack(
        [
            np.stack([np.linspace(5, 180, 256), np.full(256, 98.25),
                      np.zeros(256)], axis=1),
            np.stack([np.linspace(10, 185, 256), np.full(256, 198.25),
                      np.zeros(256)], axis=1),
        ]
    ).astype(np.float32)
    bcfg = BCConfig(n_envs=2, n_steps=8, minibatch=8, n_epochs=1,
                    n_vehicles=2)
    init_fn, iterate_fn = make_bc(cfg, bcfg, town, jnp.asarray(routes))
    params, opt_state, env_states = init_fn(jax.random.key(0))
    m0 = None
    for it in range(3):
        params, opt_state, env_states, m = iterate_fn(
            params, opt_state, env_states, jax.random.key(it)
        )
        for k, v in m.items():
            assert np.isfinite(float(v)), (k, v)
        if m0 is None:
            m0 = m
    assert float(m["bc_nll"]) < float(m0["bc_nll"])


def test_bc_perturb_and_eval_probe(small_cfg, town):
    """Perturbation-recovery rollouts must still produce finite metrics, and
    the closed-loop probe must return the plateau-visibility fields."""
    cfg = small_cfg
    routes = np.stack(
        [
            np.stack([np.linspace(5, 180, 256), np.full(256, 98.25),
                      np.zeros(256)], axis=1),
            np.stack([np.linspace(10, 185, 256), np.full(256, 198.25),
                      np.zeros(256)], axis=1),
        ]
    ).astype(np.float32)
    bcfg = BCConfig(n_envs=2, n_steps=8, minibatch=8, n_epochs=1,
                    n_vehicles=2, perturb_prob=0.5, eval_envs=2,
                    eval_steps=8)
    init_fn, iterate_fn = make_bc(cfg, bcfg, town, jnp.asarray(routes))
    params, opt_state, env_states = init_fn(jax.random.key(0))
    params, opt_state, env_states, m = iterate_fn(
        params, opt_state, env_states, jax.random.key(1)
    )
    for k, v in m.items():
        assert np.isfinite(float(v)), (k, v)
    ev = iterate_fn.eval_fn(params, jax.random.key(2))
    for k in ("cl_completion", "cl_collisions", "cl_red", "cl_done",
              "cl_speed"):
        assert np.isfinite(float(ev[k])), (k, ev[k])
    assert 0.0 <= float(ev["cl_completion"]) <= 1.0
