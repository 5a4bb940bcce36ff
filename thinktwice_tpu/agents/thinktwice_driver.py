"""ThinkTwice closed-loop driver: cameras+lidar -> model -> fused control,
entirely in-graph (BASELINE.json Config-3: "closed-loop ThinkTwice ... camera
render + lift-splat BEV, PID control in-graph").

Replaces ThinkTwiceAgent.run_step (leaderboard/team_code/thinktwice_agent.py:
369-529) minus the host-side plumbing the in-graph world makes obsolete:
- sensor queue / cv2 color conversion -> direct raster tensors,
- GPS smoothing via the EgoModel buffer (:92-130,547-559) -> exact ego state
  (the sim's pose *is* the bicycle model; the reference smooths noisy GNSS),
- the 31-frame temporal queue (:425-444) -> rolling sensor history in the
  carry (single-sweep here; multi-sweep wiring = ModelConfig.n_sweeps).

Control path parity (:456-529): process_action (Beta mode) + control_pid
(waypoint PID) fused by the rules in agents/thinktwice.fuse_controls,
including the stuck-creep behavior.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from thinktwice_tpu.agents import thinktwice as tw
from thinktwice_tpu.config import Config
from thinktwice_tpu.maps.town import TownMap
from thinktwice_tpu.models import rig as rig_lib
from thinktwice_tpu.models.encoder_decoder import ThinkTwiceModel
from thinktwice_tpu.sensors.camera import cameras_from_state
from thinktwice_tpu.sensors.lidar import lidar_from_state
from thinktwice_tpu.sim.state import WorldState
from thinktwice_tpu.train.collect import IMAGENET_MEAN, IMAGENET_STD, command_onehot


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DriverState:
    agent: tw.AgentState


def driver_init() -> DriverState:
    return DriverState(agent=tw.agent_init())


def _target_point(state: WorldState, lookahead_m: float = 50.0):
    idx = state.criteria.route_idx
    cum = state.route_cumlen
    tidx = jnp.clip(
        jnp.searchsorted(cum, cum[idx] + lookahead_m), 0, state.route.shape[0] - 1
    )
    rel = state.route[tidx, :2] - state.ego.pos
    c, s = jnp.cos(-state.ego.yaw), jnp.sin(-state.ego.yaw)
    return jnp.stack([rel[0] * c - rel[1] * s, rel[0] * s + rel[1] * c])


def make_thinktwice_driver(cfg: Config, model: ThinkTwiceModel, params):
    """Returns (policy_fn(cfg, town, state, driver) -> (control, driver'))."""
    c2e = jnp.asarray(rig_lib.cam_to_ego(cfg.camera))
    K = jnp.asarray(rig_lib.intrinsics(cfg.camera))
    e2i = jnp.asarray(rig_lib.ego_to_img(cfg.camera))

    def policy_fn(cfg_, town: TownMap, state: WorldState, driver: DriverState):
        cams = cameras_from_state(cfg.camera, town, state)
        pts, pts_mask = lidar_from_state(cfg.lidar, town, state)
        pts5 = jnp.concatenate(
            [pts, jnp.zeros((pts.shape[0], 1))], axis=-1
        )  # dt channel (single sweep)

        imgs = (cams["rgb"] - IMAGENET_MEAN) / IMAGENET_STD
        imgs = imgs[None, None]                              # (1, 1, N, H, W, 3)
        tp = _target_point(state)
        cmd = command_onehot(tp[None])[0]

        outs = model.apply(
            params,
            imgs,
            pts5[None],
            pts_mask[None],
            state.ego.speed[None],
            tp[None],
            cmd[None],
            c2e, K, e2i,
        )
        # final refine layer's action head
        alpha = outs["mu_branches"][0, -1]
        beta = outs["sigma_branches"][0, -1]
        steer_n, throt_n, brake_n = tw.process_action(alpha, beta)

        wps = outs["pred_wp"][0, -1]                         # (T, 2) ego frame
        steer_p, throt_p, brake_p, _vdes, agent = tw.control_pid(
            driver.agent, wps, state.ego.speed, tp
        )
        is_turning = jnp.abs(jnp.arctan2(tp[1], tp[0])) > 0.25
        control, agent = tw.fuse_controls(
            agent, steer_n, throt_n, brake_n,
            steer_p, throt_p, brake_p,
            state.ego.speed, is_turning,
        )
        return control, DriverState(agent=agent)

    return policy_fn


def rollout_thinktwice(
    cfg: Config, town: TownMap, model, params, state: WorldState,
    n_steps: int, policy_every: int = 1,
):
    """Closed-loop scan with the ThinkTwice driver (policy every tick, like
    the reference's 20 Hz inference cadence after warmup)."""
    from thinktwice_tpu.sim.step import step_world

    policy = make_thinktwice_driver(cfg, model, params)

    def body(carry, _):
        st, drv, held = carry
        ctrl, drv = policy(cfg, town, st, drv)
        st2, _ = step_world(cfg, town, st, ctrl)
        return (st2, drv, ctrl), None

    (final, _, _), _ = jax.lax.scan(
        body, (state, driver_init(), jnp.zeros(3)), None, length=n_steps
    )
    return final
