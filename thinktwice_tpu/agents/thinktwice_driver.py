"""ThinkTwice closed-loop driver: cameras+lidar -> model -> fused control,
entirely in-graph (BASELINE.json Config-3: "closed-loop ThinkTwice ... camera
render + lift-splat BEV, PID control in-graph").

Replaces ThinkTwiceAgent.run_step (leaderboard/team_code/thinktwice_agent.py:
369-529) minus the host-side plumbing the in-graph world makes obsolete:
- sensor queue / cv2 color conversion -> direct raster tensors,
- GPS smoothing via the EgoModel buffer (:92-130,547-559) -> exact ego state
  (the sim's pose *is* the bicycle model; the reference smooths noisy GNSS),
- the 31-frame temporal queue (:425-444) -> a 10-tick ring buffer in the
  carry: with the model's history_query at [-1, 0] and dataset cadence 2 Hz,
  the history sweep is the frame exactly 0.5 s (10 ticks) ago, ego-motion
  compensated into the key frame via geometry.sweep_to_key (curr2key).

Control path parity (:456-529): process_action (Beta mode) + control_pid
(waypoint PID) fused by the rules in agents/thinktwice.fuse_controls,
including the stuck-creep behavior.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from thinktwice_tpu.agents import thinktwice as tw
from thinktwice_tpu.config import Config
from thinktwice_tpu.geometry import sweep_to_key
from thinktwice_tpu.maps.town import TownMap
from thinktwice_tpu.models import rig as rig_lib
from thinktwice_tpu.models.encoder_decoder import ThinkTwiceModel
from thinktwice_tpu.sensors.camera import cameras_from_state
from thinktwice_tpu.sensors.lidar import lidar_from_state, merge_sweeps
from thinktwice_tpu.sim.state import WorldState
from thinktwice_tpu.train.collect import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    route_command,
)

HIST_TICKS = 10  # 0.5 s at 20 Hz — the 2 Hz history cadence of the reference


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DriverState:
    agent: tw.AgentState
    tick: jax.Array                       # () i32
    # ring buffers of raw sensor frames + ego poses, newest overwrites
    # slot tick % HIST_TICKS (empty tuple when n_sweeps == 1)
    rgb_ring: tuple = ()                  # ((HIST, N, H, W, 3),) raw [0,1]
    pts_ring: tuple = ()                  # ((HIST, P, 4),)
    mask_ring: tuple = ()                 # ((HIST, P),)
    pos_ring: tuple = ()                  # ((HIST, 2),)
    yaw_ring: tuple = ()                  # ((HIST,),)


def driver_init(
    cfg: Optional[Config] = None, n_sweeps: int = 1,
    hist_len: int = HIST_TICKS,
) -> DriverState:
    """`hist_len` = ring slots between the key frame and the history sweep,
    in POLICY CALLS. At 20 Hz inference that is 10 (0.5 s); when the
    evaluator runs the policy every k-th sim tick (policy_every=k), pass
    10 // k so the history frame stays exactly 0.5 s old."""
    base = DriverState(agent=tw.agent_init(), tick=jnp.asarray(0, jnp.int32))
    if n_sweeps <= 1:
        return base
    cam, lid = cfg.camera, cfg.lidar
    P = lid.n_beams * lid.n_azimuth
    return dataclasses.replace(
        base,
        rgb_ring=(jnp.zeros((hist_len, cam.n_cams, cam.height, cam.width, 3)),),
        pts_ring=(jnp.zeros((hist_len, P, 4)),),
        mask_ring=(jnp.zeros((hist_len, P), bool),),
        pos_ring=(jnp.zeros((hist_len, 2)),),
        yaw_ring=(jnp.zeros((hist_len,)),),
    )


def _target_point(state: WorldState, lookahead_m: float = 50.0):
    idx = state.criteria.route_idx
    cum = state.route_cumlen
    tidx = jnp.clip(
        jnp.searchsorted(cum, cum[idx] + lookahead_m), 0, state.route.shape[0] - 1
    )
    rel = state.route[tidx, :2] - state.ego.pos
    c, s = jnp.cos(-state.ego.yaw), jnp.sin(-state.ego.yaw)
    return jnp.stack([rel[0] * c - rel[1] * s, rel[0] * s + rel[1] * c])


def make_thinktwice_driver(cfg: Config, model: ThinkTwiceModel, params=None):
    """Returns (policy_fn(cfg, town, state, driver[, params]) ->
    (control, driver')). Pass params=None here and supply them per call
    (harness.evaluator's policy_params) so the ~400 MB parameter tree rides
    into jit as an argument instead of being inlined as HLO constants —
    constant-embedding blew the remote-compile request size limit."""
    c2e = jnp.asarray(rig_lib.cam_to_ego(cfg.camera))
    K = jnp.asarray(rig_lib.intrinsics(cfg.camera))
    e2i = jnp.asarray(rig_lib.ego_to_img(cfg.camera))
    n_sweeps = model.n_sweeps

    def policy_fn(cfg_, town: TownMap, state: WorldState, driver: DriverState,
                  call_params=None):
        p_ = call_params if call_params is not None else params
        cams = cameras_from_state(cfg.camera, town, state)
        pts, pts_mask = lidar_from_state(cfg.lidar, town, state)
        rgb_now = cams["rgb"]
        pos, yaw = state.ego.pos, state.ego.yaw

        if n_sweeps >= 2:
            ring_len = driver.rgb_ring[0].shape[0]
            slot = jnp.mod(driver.tick, ring_len)
            warm = driver.tick >= ring_len
            # the slot we are about to overwrite holds the frame from
            # exactly HIST_TICKS ticks ago; before warmup use the current one
            def pick(ring, now):
                return jnp.where(warm, ring[slot], now)

            h_rgb = pick(driver.rgb_ring[0], rgb_now)
            h_pts = pick(driver.pts_ring[0], pts)
            h_mask = jnp.where(warm, driver.mask_ring[0][slot], pts_mask)
            h_pos = jnp.where(warm, driver.pos_ring[0][slot], pos)
            h_yaw = jnp.where(warm, driver.yaw_ring[0][slot], yaw)

            imgs = jnp.stack([h_rgb, rgb_now], axis=0)        # (T, N, H, W, 3)
            imgs = ((imgs - IMAGENET_MEAN) / IMAGENET_STD)[None]
            s2k = jnp.stack(
                [sweep_to_key(h_pos, h_yaw, pos, yaw), jnp.eye(4)], axis=0
            )[None]                                           # (1, T, 4, 4)
            pts5, pts_mask_m = merge_sweeps(
                pts, pts_mask, h_pts, h_mask, (pos, yaw), (h_pos, h_yaw)
            )
            driver = dataclasses.replace(
                driver,
                rgb_ring=(driver.rgb_ring[0].at[slot].set(rgb_now),),
                pts_ring=(driver.pts_ring[0].at[slot].set(pts),),
                mask_ring=(driver.mask_ring[0].at[slot].set(pts_mask),),
                pos_ring=(driver.pos_ring[0].at[slot].set(pos),),
                yaw_ring=(driver.yaw_ring[0].at[slot].set(yaw),),
            )
        else:
            imgs = (rgb_now - IMAGENET_MEAN) / IMAGENET_STD
            imgs = imgs[None, None]                           # (1, 1, N, H, W, 3)
            s2k = None
            pts5 = jnp.concatenate(
                [pts, jnp.zeros((pts.shape[0], 1))], axis=-1
            )  # dt channel (single sweep)
            pts_mask_m = pts_mask

        tp = _target_point(state)
        cmd = jax.nn.one_hot(
            route_command(town, state.route, state.criteria.route_idx), 6
        )

        outs = model.apply(
            p_,
            imgs,
            pts5[None],
            pts_mask_m[None],
            state.ego.speed[None],
            tp[None],
            cmd[None],
            c2e, K, e2i,
            sweep2key=s2k,
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
        driver = dataclasses.replace(
            driver, agent=agent, tick=driver.tick + 1
        )
        return control, driver

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
        body,
        (state, driver_init(cfg, model.n_sweeps), jnp.zeros(3)),
        None,
        length=n_steps,
    )
    return final
