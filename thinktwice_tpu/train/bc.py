"""Behavior-cloning pretrainer for the Roach expert policy.

The reference's expert is a PPO policy trained against a CARLA fleet
(roach/models/ppo.py; the repo only ships the checkpoint). Round-1/2 PPO from
scratch learned lane-keeping but not reliable junction turns on Town05 Long
(DS 1.8: wrong turns compound over 1-2 km routes). This module bootstraps the
same policy network from the privileged rule-based autopilot
(agents/autopilot.py), which reads the route directly and turns correctly —
the classic BC-warm-start-then-RL-polish recipe.

Everything is one jit program per iteration, same shape as train/ppo.py:
- rollout: W vmapped worlds driven by the autopilot with exploration steer
  noise (DAgger-lite: the noise pushes the ego off-center so the dataset
  contains corrective actions), recording (birdview u8, state_vec, action)
  at the expert's 10 Hz cadence;
- update: Beta negative-log-likelihood on the recorded actions (with label
  jitter so the Beta concentration stays finite) + discounted-return value
  regression so the PPO fine-tune starts from a sane critic.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax

from thinktwice_tpu.agents.autopilot import autopilot_control
from thinktwice_tpu.agents.expert import state_vector
from thinktwice_tpu.agents.roach import RoachPolicy, beta_log_prob
from thinktwice_tpu.config import Config
from thinktwice_tpu.maps.town import TownMap
from thinktwice_tpu.sensors.birdview import birdview_from_state
from thinktwice_tpu.sim.reset import reset_world
from thinktwice_tpu.sim.step import step_world
from thinktwice_tpu.train.ppo import compute_reward, hazard_desired_speed

GAMMA = 0.99
ACTION_JITTER = 0.03     # label smoothing on [-1,1] actions
CONC_PENALTY = 1e-4      # keeps alpha+beta from running away on clean labels
VALUE_COEF = 0.25


def control_to_acc(control):
    """(steer, throttle, brake) -> (acc, steer) in [-1, 1] — inverse of
    roach.acc_to_control (rl_birdview_wrapper acc_as_action)."""
    steer = control[..., 0]
    acc = control[..., 1] - control[..., 2]
    return jnp.stack([acc, steer], axis=-1)


@dataclasses.dataclass
class BCConfig:
    n_envs: int = 24
    n_steps: int = 256          # sim ticks per rollout (record every 2nd)
    steer_noise: float = 0.08   # exploration noise on the applied steering
    minibatch: int = 256
    n_epochs: int = 2
    lr: float = 3e-4
    n_vehicles: int = 24
    seed: int = 0
    # True-DAgger execution mixing: with prob `dagger_mix` a world executes
    # the LEARNED policy's action this macro step (labels stay the teacher's)
    # so the dataset covers the states the policy actually visits. Ramped
    # from 0 by the caller (executing a random-init policy wastes rollouts).
    dagger_mix: float = 0.0
    # Recovery-state coverage beyond steering noise (VERDICT r2 #8): with
    # prob `perturb_prob` per world per macro step the ego is displaced
    # laterally up to `perturb_lat` meters and rotated up to `perturb_yaw`
    # rad BEFORE the observation, so the teacher labels the corrective
    # action from the off-lane / wrong-heading states that actually kill
    # closed-loop routes (displaced into the oncoming lane, clipped curbs).
    perturb_prob: float = 0.0
    perturb_lat: float = 1.5
    perturb_yaw: float = 0.35
    # Periodic closed-loop probe (VERDICT r2 #1): policy-only rollouts on
    # the held-out tail of the route bank, so BC plateaus are visible
    # without a separate manual eval run.
    eval_envs: int = 8
    eval_steps: int = 768       # sim ticks (~38 s of game time)


def make_bc(cfg: Config, bcfg: BCConfig, town: TownMap, routes,
            scenarios=None):
    """routes: (NR, R, 3) dense route bank; scenarios: optional stacked
    ScenarioState with leading dim NR (one per route — zero_scenarios rows
    for routes without triggers), so the rollout worlds contain the same
    crossing-walker / junction-vehicle events as the eval distribution.
    Returns (init_fn, iterate_fn).

    BC4 diagnosis note (scripts/diag_bc_blocked.py): the BC3 clone's blocked
    eval failures were all the POLICY idling or full-braking behind a
    stopped vehicle 7-10 m away while the teacher commanded throttle 0.85 —
    states almost absent from 24-vehicle scenario-free training rollouts.
    Train at eval-like density with scenarios and weight the restart frames
    up (see loss_fn)."""
    policy = RoachPolicy(
        features_dim=cfg.roach.features_dim,
        states_neurons=cfg.roach.states_neurons,
        policy_head_arch=cfg.roach.policy_head,
        value_head_arch=cfg.roach.value_head,
        action_dim=cfg.roach.action_dim,
    )
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(bcfg.lr))
    W = bcfg.n_envs
    NR = routes.shape[0]

    # the tail eval_envs routes are held out for the closed-loop probe
    NR_TRAIN = max(NR - bcfg.eval_envs, 1)

    def _route_scenario(idx):
        if scenarios is None:
            return None
        return jax.tree.map(lambda x: x[idx], scenarios)

    def reset_env(i, rng):
        rk, rr = jax.random.split(rng)
        idx = jax.random.randint(jax.random.fold_in(rk, i), (), 0, NR_TRAIN)
        return reset_world(cfg, town, routes[idx], rr,
                           n_vehicles=bcfg.n_vehicles,
                           scenario=_route_scenario(idx))

    def maybe_reset(state, done, rng, env_idx):
        fresh = reset_env(env_idx, rng)
        return jax.tree.map(
            lambda f, s: jnp.where(
                done if f.ndim == 0 else jnp.reshape(done, (1,) * f.ndim), f, s
            ),
            fresh, state,
        )

    def init_fn(rng):
        rp, re = jax.random.split(rng)
        params = policy.init(
            rp,
            jnp.zeros((1, cfg.birdview.n_channels, 192, 192)),
            jnp.zeros((1, cfg.roach.state_dim)),
        )
        env_states = jax.vmap(reset_env)(
            jnp.arange(W), jax.random.split(re, W)
        )
        return params, tx.init(params), env_states

    @jax.jit
    def rollout_fn(params, env_states, rng, dagger_mix):
        """Drive the autopilot teacher; one frame per 10 Hz macro step (the
        expert's decision cadence — also keeps the stored birdview buffer at
        half the tick count, which is what fits HBM). With prob `dagger_mix`
        a world executes the learned policy instead (true DAgger: the labels
        are always the teacher's corrective action at the visited state)."""
        from thinktwice_tpu.agents.roach import acc_to_control, beta_mode

        def macro(carry, _):
            states, rng = carry
            rng, rn, rr, rd, rp = jax.random.split(rng, 5)
            if bcfg.perturb_prob > 0.0:
                # displace/rotate the ego BEFORE the observation so the
                # recorded frame is (off-lane state, teacher's recovery)
                do_p = jax.random.bernoulli(rp, bcfg.perturb_prob, (W,))
                lat = bcfg.perturb_lat * jax.random.uniform(
                    jax.random.fold_in(rp, 1), (W,), minval=-1.0, maxval=1.0)
                dyaw = bcfg.perturb_yaw * jax.random.uniform(
                    jax.random.fold_in(rp, 2), (W,), minval=-1.0, maxval=1.0)
                ego = states.ego
                right = jnp.stack(
                    [-jnp.sin(ego.yaw), jnp.cos(ego.yaw)], axis=-1)
                states = dataclasses.replace(
                    states,
                    ego=dataclasses.replace(
                        ego,
                        pos=ego.pos + jnp.where(
                            do_p[:, None], lat[:, None] * right, 0.0),
                        yaw=ego.yaw + jnp.where(do_p, dyaw, 0.0),
                    ),
                )
            bv = jax.vmap(lambda s: birdview_from_state(cfg.birdview, town, s))(
                states
            )
            sv = jax.vmap(state_vector)(states)
            ctrl = jax.vmap(lambda s: autopilot_control(cfg, town, s))(states)
            # exploration noise on the applied steering only — the RECORDED
            # label stays the teacher's clean action (DAgger-style: noisy
            # execution, expert labels)
            noise = bcfg.steer_noise * jax.random.normal(rn, (W,))
            ctrl_exec = ctrl.at[:, 0].add(noise)
            out = policy.apply(params, bv, sv)
            pol_ctrl = acc_to_control(beta_mode(out["alpha"], out["beta"]))
            use_pol = jax.random.bernoulli(rd, dagger_mix, (W,))
            ctrl_exec = jnp.where(use_pol[:, None], pol_ctrl, ctrl_exec)
            rew_sum = jnp.zeros((W,))
            for _k in range(2):
                new_states, events = jax.vmap(
                    lambda s, c: step_world(cfg, town, s, c)
                )(states, ctrl_exec)
                desired = jax.vmap(
                    lambda s: hazard_desired_speed(cfg, town, s)
                )(states)
                rew, _ = jax.vmap(compute_reward)(
                    states, new_states, events, desired
                )
                rew_sum = rew_sum + rew
                states = new_states
            done = states.criteria.done
            states = jax.vmap(maybe_reset)(
                states, done, jax.random.split(rr, W), jnp.arange(W)
            )
            frame = {
                "bv_u8": (bv * 255.0).astype(jnp.uint8),
                "sv": sv,
                "action": control_to_acc(ctrl),
                "reward": rew_sum,
                "done": done,
            }
            return (states, rng), frame

        (env_states, _), traj = jax.lax.scan(
            macro, (env_states, rng), None, length=bcfg.n_steps // 2
        )
        return env_states, traj

    def discounted_returns(traj):
        g2 = GAMMA * GAMMA   # one macro frame = two sim ticks

        def back(carry, t):
            ret = t["reward"] + g2 * carry * (1.0 - t["done"].astype(jnp.float32))
            return ret, ret

        _, rets = jax.lax.scan(
            back, jnp.zeros(traj["reward"].shape[1]), traj, reverse=True
        )
        return rets

    def loss_fn(params, batch, rng):
        bv = batch["bv_u8"].astype(jnp.float32) / 255.0
        out = policy.apply(params, bv, batch["sv"])
        jit_a = jnp.clip(
            batch["action"]
            + ACTION_JITTER * jax.random.normal(rng, batch["action"].shape),
            -0.999, 0.999,
        )
        # Inertia fix: a teacher that waits at lights/queues produces ~40%
        # stopped-and-braking frames; uniform BC then learns "speed 0 ->
        # brake" and the clone parks itself at spawn (observed: closed-loop
        # completion 3% while action MAE was 0.06). Downweight frames where
        # the ego is already stopped AND the label is brake — the moving
        # data (including brake onsets, which stay at full weight) dominates
        # the gradient, but stop-at-red is still supervised.
        # BC4 (diag_bc_blocked): "stopped + idle" labels (acc ~ 0, throttle
        # 0.02) are as absorbing as explicit brake labels — extend the
        # downweight from acc < -0.3 to acc < 0.1. And the RESTART frames
        # (ego stopped, teacher accelerating away — the exact boundary the
        # blocked clone gets wrong) are rare; upweight them 3x.
        stopped = batch["sv"][:, 4] < 0.3
        hold_label = batch["action"][:, 0] < 0.1
        restart_label = batch["action"][:, 0] > 0.3
        w = jnp.where(stopped & hold_label, 0.2, 1.0)
        w = jnp.where(stopped & restart_label, 3.0, w)
        w = w / jnp.mean(w)
        per = -beta_log_prob(jit_a, out["alpha"], out["beta"])
        nll = jnp.mean(w[:, None] * per)
        v_err = jnp.mean((out["value"][:, 0] - batch["ret"]) ** 2)
        conc = jnp.mean(out["alpha"] + out["beta"])
        loss = nll + VALUE_COEF * v_err + CONC_PENALTY * conc
        # action-error diagnostic: Beta mode vs label
        from thinktwice_tpu.agents.roach import beta_mode

        mode = beta_mode(out["alpha"], out["beta"])
        mae = jnp.mean(jnp.abs(mode - batch["action"]))
        return loss, {"bc_nll": nll, "v_mse": v_err, "conc": conc,
                      "action_mae": mae}

    @jax.jit
    def update_fn(params, opt_state, flat, rng):
        n = flat["action"].shape[0]
        mb_size = min(bcfg.minibatch, n)
        nmb = max(n // mb_size, 1)

        def epoch(carry, erng):
            params, opt_state = carry
            e1, e2 = jax.random.split(erng)
            perm = jax.random.permutation(e1, n)

            def mb(carry, i):
                params, opt_state = carry
                idx = jax.lax.dynamic_slice_in_dim(
                    perm, i * mb_size, mb_size
                )
                batch = jax.tree.map(lambda x: x[idx], flat)
                (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, batch, jax.random.fold_in(e2, i)
                )
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), aux

            (params, opt_state), auxs = jax.lax.scan(
                mb, (params, opt_state), jnp.arange(nmb)
            )
            return (params, opt_state), auxs

        (params, opt_state), auxs = jax.lax.scan(
            epoch, (params, opt_state), jax.random.split(rng, bcfg.n_epochs)
        )
        return params, opt_state, jax.tree.map(lambda x: x[-1, -1], auxs)

    @jax.jit
    def eval_fn(params, rng):
        """Policy-only closed-loop probe on the held-out tail routes: no
        teacher, no noise, mode actions. Done worlds freeze (step_world), so
        the final criteria hold each route's outcome. Returns plateau-visible
        metrics for the BC loop (VERDICT r2 #1)."""
        from thinktwice_tpu.agents.roach import acc_to_control, beta_mode

        E = bcfg.eval_envs
        idxs = (NR - 1 - jnp.arange(E)) % NR
        states = jax.vmap(
            lambda i, k: reset_world(cfg, town, routes[i], k,
                                     n_vehicles=bcfg.n_vehicles,
                                     scenario=_route_scenario(i))
        )(idxs, jax.random.split(rng, E))

        def macro(states, _):
            bv = jax.vmap(
                lambda s: birdview_from_state(cfg.birdview, town, s)
            )(states)
            sv = jax.vmap(state_vector)(states)
            out = policy.apply(params, bv, sv)
            ctrl = acc_to_control(beta_mode(out["alpha"], out["beta"]))
            speed = states.ego.speed
            for _k in range(2):
                states, _ev = jax.vmap(
                    lambda s, c: step_world(cfg, town, s, c)
                )(states, ctrl)
            return states, speed

        states, speeds = jax.lax.scan(
            macro, states, None, length=bcfg.eval_steps // 2
        )
        c = states.criteria
        return {
            "cl_completion": jnp.mean(c.route_completion),
            "cl_collisions": jnp.sum(
                c.n_collision_vehicle + c.n_collision_walker
                + c.n_collision_static
            ).astype(jnp.float32),
            "cl_red": jnp.sum(c.n_red_light).astype(jnp.float32),
            "cl_done": jnp.sum(c.done).astype(jnp.float32),
            "cl_speed": jnp.mean(speeds),
        }

    def iterate_fn(params, opt_state, env_states, rng, dagger_mix=None):
        r1, r2 = jax.random.split(rng)
        mix = bcfg.dagger_mix if dagger_mix is None else dagger_mix
        env_states, traj = rollout_fn(
            params, env_states, r1, jnp.float32(mix)
        )
        rets = jax.jit(discounted_returns)(traj)
        flat = {
            "bv_u8": traj["bv_u8"].reshape(-1, *traj["bv_u8"].shape[2:]),
            "sv": traj["sv"].reshape(-1, traj["sv"].shape[-1]),
            "action": traj["action"].reshape(-1, 2),
            "ret": rets.reshape(-1),
        }
        params, opt_state, metrics = update_fn(params, opt_state, flat, r2)
        metrics = dict(metrics)
        metrics["mean_reward"] = traj["reward"].mean()
        metrics["mean_speed"] = traj["sv"][..., 4].mean()
        metrics["dones"] = traj["done"].sum()
        return params, opt_state, env_states, metrics

    # expose the jitted stages for profiling/diagnostics
    iterate_fn.rollout_fn = rollout_fn
    iterate_fn.update_fn = update_fn
    iterate_fn.eval_fn = eval_fn
    return init_fn, iterate_fn
