"""PPO trainer unit tests (tiny env, one iterate on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from thinktwice_tpu.train import ppo as ppo_lib
from thinktwice_tpu.train.ppo import PPOConfig, make_ppo
from tests.test_pipeline import TINY, straight_route


def test_beta_entropy_uniform():
    # Beta(1,1) is uniform: differential entropy 0 per dim
    e = ppo_lib._beta_entropy(jnp.ones((1, 2)), jnp.ones((1, 2)))
    np.testing.assert_allclose(np.asarray(e), 0.0, atol=1e-4)
    # concentration reduces entropy
    e2 = ppo_lib._beta_entropy(jnp.full((1, 2), 8.0), jnp.full((1, 2), 8.0))
    assert float(e2[0]) < 0.0


def test_sample_logp_consistent():
    rng = jax.random.key(0)
    a = jnp.full((256, 2), 3.0)
    b = jnp.full((256, 2), 2.0)
    act, logp = ppo_lib._beta_sample_and_logp(rng, a, b)
    assert np.asarray(act).min() >= -1 and np.asarray(act).max() <= 1
    from thinktwice_tpu.agents.roach import beta_log_prob

    np.testing.assert_allclose(
        np.asarray(logp), np.asarray(beta_log_prob(act, a, b)), rtol=1e-5
    )


def test_ppo_iterate_runs(town):
    W = 2
    routes = jnp.stack([straight_route(), straight_route()])
    pcfg = PPOConfig(n_envs=W, n_steps=8, n_epochs=1, minibatch=8)
    init_fn, iterate_fn = make_ppo(TINY, pcfg, town, routes)
    params, opt_state, env_states = init_fn(jax.random.key(0))
    p0 = jax.tree.leaves(params)[0].copy()
    params, opt_state, env_states, m = iterate_fn(
        params, opt_state, env_states, jax.random.key(1)
    )
    for k in ("pg_loss", "v_loss", "entropy", "kl", "mean_reward"):
        assert np.isfinite(float(m[k])), k
    # parameters actually updated
    assert not np.allclose(np.asarray(jax.tree.leaves(params)[0]), np.asarray(p0))


def test_reward_penalizes_collision(town):
    import dataclasses

    from thinktwice_tpu.sim.reset import reset_world
    from thinktwice_tpu.sim.state import Events

    st = reset_world(TINY, town, straight_route(), jax.random.key(0))
    ev_none = Events(
        collision_vehicle=jnp.asarray(False),
        collision_walker=jnp.asarray(False),
        collision_static=jnp.asarray(False),
        red_light=jnp.asarray(False),
        stop_sign=jnp.asarray(False),
        route_complete=jnp.asarray(False),
    )
    ev_crash = dataclasses.replace(ev_none, collision_vehicle=jnp.asarray(True))
    r_clean, comps = ppo_lib.compute_reward(st, st, ev_none)
    r_crash, comps_crash = ppo_lib.compute_reward(st, st, ev_crash)
    assert float(r_crash) <= float(r_clean) - ppo_lib.P_COLLISION + 1e-5
    # components sum to the reward and the collision term carries the hit
    assert abs(sum(float(v) for v in comps.values()) - float(r_clean)) < 1e-5
    assert float(comps_crash["p_collision"]) == -ppo_lib.P_COLLISION


def test_hazard_desired_speed(town):
    """Red/yellow stop line ahead on the approach -> desired 0; green or
    behind -> DESIRED_SPEED (carla-roach's hazard-adaptive speed target)."""
    import dataclasses

    from thinktwice_tpu.maps.town import TL_SLOT_S, traffic_light_states
    from thinktwice_tpu.sim.reset import reset_world

    st = reset_world(TINY, town, straight_route(), jax.random.key(0))
    tl_pos = np.asarray(town.tl_pos)
    valid = np.asarray(town.tl_valid)
    k = int(np.nonzero(valid)[0][0])
    yaw = float(np.asarray(town.tl_yaw)[k])

    # place the ego 8 m before the stop line on the approach heading
    back = np.asarray([np.cos(yaw), np.sin(yaw)]) * -8.0
    ego = dataclasses.replace(
        st.ego,
        pos=jnp.asarray(tl_pos[k] + back, jnp.float32),
        yaw=jnp.asarray(yaw, jnp.float32),
    )

    # scan a whole phase cycle: desired must be 0 whenever the light is
    # non-green and DESIRED_SPEED whenever it is green
    hits = {0: set(), 1: set(), 2: set()}
    for t in np.linspace(0.0, float(2 * TL_SLOT_S), 16):
        s = dataclasses.replace(st, ego=ego,
                                tick=jnp.asarray(round(t / 0.05), jnp.int32))
        want_stop = int(np.asarray(traffic_light_states(town, s.time_s))[k]) != 0
        d = float(ppo_lib.hazard_desired_speed(TINY, town, s))
        assert d == (0.0 if want_stop else ppo_lib.DESIRED_SPEED), t
        hits[int(np.asarray(traffic_light_states(town, s.time_s))[k])].add(t)
    assert hits[0] and (hits[1] or hits[2])  # both branches exercised

    # same light, ego past the line -> no hazard regardless of phase
    fwd = np.asarray([np.cos(yaw), np.sin(yaw)]) * 3.0
    ego2 = dataclasses.replace(ego, pos=jnp.asarray(tl_pos[k] + fwd, jnp.float32))
    for t in np.linspace(0.0, float(TL_SLOT_S), 6):
        s = dataclasses.replace(st, ego=ego2,
                                tick=jnp.asarray(round(t / 0.05), jnp.int32))
        assert float(ppo_lib.hazard_desired_speed(TINY, town, s)) == ppo_lib.DESIRED_SPEED


def test_ppo_macro_cadence_and_anchor(town):
    """policy_every=2 + frozen-anchor KL: one iterate runs, anchor_kl is
    finite, and a huge anchor coefficient pins the params to the anchor
    harder than a zero one (the fine-tune recipe's forgetting guard)."""
    W = 2
    routes = jnp.stack([straight_route(), straight_route()])
    pcfg = PPOConfig(n_envs=W, n_steps=8, n_epochs=1, minibatch=8,
                     policy_every=2, anchor_coef=0.1)
    init_fn, _ = make_ppo(TINY, pcfg, town, routes)
    anchor, _, _ = init_fn(jax.random.key(5))

    def drift(coef):
        cfg_i = PPOConfig(n_envs=W, n_steps=8, n_epochs=1, minibatch=8,
                          policy_every=2, anchor_coef=coef)
        init_i, it_i = make_ppo(TINY, cfg_i, town, routes,
                                anchor_params=anchor)
        _, opt_state, env_states = init_i(jax.random.key(5))
        params = anchor
        m = None
        for k in range(2):
            params, opt_state, env_states, m = it_i(
                params, opt_state, env_states, jax.random.key(10 + k))
        assert np.isfinite(float(m["pg_loss"]))
        assert "anchor_kl" in m if coef > 0 else True
        return float(
            sum(np.abs(np.asarray(a) - np.asarray(b)).sum()
                for a, b in zip(jax.tree.leaves(params),
                                jax.tree.leaves(anchor))))

    assert drift(1000.0) < drift(0.0)
