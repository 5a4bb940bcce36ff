"""In-graph dataset collection: expert drives, sensors render, batches
assemble — the whole reference data-collection fleet in one jit.

Reference pipeline being replaced (SURVEY §3.2): N independent (CARLA server
+ roach_ap_agent_data_collection.py) process pairs dump PNG/npy/JSON per
frame at 2 Hz; generate_metadata.py builds an index; CarlaDataset +
pipelines re-load and re-augment them. Here `collect_batch` rolls the expert
for n_frames macro-steps (10 ticks each), renders cameras + lidar at every
saved frame, and `frames_to_batch` turns the trajectory into supervised
training examples with future-frame targets (waypoints in the current ego
frame ≡ offset_then_rotate, carla_dataset.py:115-203; future Roach actions
≡ :154-176).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from thinktwice_tpu.agents.expert import Frame, _target_point, expert_control
from thinktwice_tpu.config import Config
from thinktwice_tpu.maps.town import TownMap
from thinktwice_tpu.sensors.camera import cameras_from_state
from thinktwice_tpu.sensors.lidar import lidar_from_state
from thinktwice_tpu.sim.state import WorldState
from thinktwice_tpu.sim.step import step_world

IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


def collect_batch(
    cfg: Config,
    roach_params,
    town: TownMap,
    state: WorldState,
    n_frames: int,
    ticks_per_frame: int = 10,
    policy_every: int = 2,
):
    """-> (final_state, frames, sensors) where frames is a stacked Frame
    pytree and sensors holds rgb/depth/semantic/lidar per frame."""

    def macro(carry, _):
        st, held = carry
        ctrl_now, sup = expert_control(cfg, roach_params, town, st)
        cams = cameras_from_state(cfg.camera, town, st)
        pts4, pts_mask = lidar_from_state(cfg.lidar, town, st)
        # dt sweep channel (0 = current sweep; merge_sweeps sets 1 for history)
        pts = jnp.concatenate(
            [pts4, jnp.zeros((pts4.shape[0], 1))], axis=-1
        )
        frame = Frame(
            pos=st.ego.pos,
            yaw=st.ego.yaw,
            speed=st.ego.speed,
            control=ctrl_now,
            target_point=_target_point(st),
            route_completion=st.criteria.route_completion,
            command=route_command(town, st.route, st.criteria.route_idx),
            supervision=sup,
        )
        sensors = {
            "rgb": cams["rgb"],
            "depth": cams["depth"],
            "semantic": cams["semantic"],
            "lidar": pts,
            "lidar_mask": pts_mask,
        }

        def tick(inner, k):
            st_i, held_i = inner
            recompute = (k % policy_every) == 0

            def fresh():
                c, _ = expert_control(cfg, roach_params, town, st_i)
                return c

            ctrl = jax.lax.cond(recompute, fresh, lambda: held_i)
            st_o, _ = step_world(cfg, town, st_i, ctrl)
            return (st_o, ctrl), None

        (st, held), _ = jax.lax.scan(
            tick, (st, ctrl_now), jnp.arange(ticks_per_frame)
        )
        return (st, held), (frame, sensors)

    (final, _), (frames, sensors) = jax.lax.scan(
        macro, (state, jnp.zeros(3)), None, length=n_frames
    )
    return final, frames, sensors


def _rotate_into(yaw, vec):
    c, s = jnp.cos(-yaw), jnp.sin(-yaw)
    return jnp.stack(
        [vec[..., 0] * c - vec[..., 1] * s, vec[..., 0] * s + vec[..., 1] * c],
        axis=-1,
    )


def command_onehot(target_point):
    """Fallback command from the ego-frame target point when no route
    context is available. Classes use the REFERENCE indexing
    (carla_dataset.py:155-165, RoadOption - 1): 0 LEFT, 1 RIGHT, 2 STRAIGHT,
    3 LANEFOLLOW, 4 CHANGELANELEFT, 5 CHANGELANERIGHT."""
    angle = jnp.arctan2(target_point[..., 1], target_point[..., 0])
    cmd = jnp.where(
        angle < -0.3, 0, jnp.where(angle > 0.3, 1, 3)
    )
    return jax.nn.one_hot(cmd, 6)


# reference command classes (global_route_planner.py RoadOption - 1)
CMD_LEFT, CMD_RIGHT, CMD_STRAIGHT = 0, 1, 2
CMD_LANEFOLLOW, CMD_CHANGELEFT, CMD_CHANGERIGHT = 3, 4, 5


def route_command(town: TownMap, route, route_idx, lookahead_pts: int = 35):
    """6-way RoadOption command class from the route geometry ahead
    (≡ the A* planner's turn decisions, global_route_planner.py:20-387,
    consumed as measurements['target_command']).

    Heading change over the next ~35 m classifies turns; small heading
    change with large lateral displacement classifies lane changes; small
    change near a signalized junction is STRAIGHT; else LANEFOLLOW.
    Returns a () int32 class in the reference indexing (RoadOption - 1).
    """
    R = route.shape[0]
    j = jnp.clip(route_idx + lookahead_pts, 0, R - 1)
    mid = jnp.clip(route_idx + lookahead_pts // 2, 0, R - 1)
    hdg0 = route[route_idx, 2]
    hdg1 = route[j, 2]
    dh = jnp.arctan2(jnp.sin(hdg1 - hdg0), jnp.cos(hdg1 - hdg0))
    rel = route[j, :2] - route[route_idx, :2]
    # lateral displacement in the frame of the current route heading
    lat = -jnp.sin(hdg0) * rel[0] + jnp.cos(hdg0) * rel[1]
    d_junction = jnp.min(
        jnp.where(
            town.tl_valid,
            jnp.linalg.norm(town.tl_pos - route[mid, :2][None], axis=-1),
            1e9,
        )
    )
    turning = jnp.abs(dh) > 0.35
    changing = (~turning) & (jnp.abs(dh) < 0.15) & (jnp.abs(lat) > 2.5)
    near_junction = d_junction < 15.0
    cmd = jnp.where(
        turning,
        jnp.where(dh < 0, CMD_LEFT, CMD_RIGHT),
        jnp.where(
            changing,
            jnp.where(lat < 0, CMD_CHANGELEFT, CMD_CHANGERIGHT),
            jnp.where(near_junction, CMD_STRAIGHT, CMD_LANEFOLLOW),
        ),
    )
    return cmd.astype(jnp.int32)


def frames_to_batch(cfg: Config, frames: Frame, sensors: dict,
                    pred_len: int = 4, n_sweeps: int = 1):
    """Stacked frames (F, ...) -> model batch of F - pred_len - (n_sweeps-1)
    examples.

    Future targets are shifts of the same trajectory: example i uses frames
    i+1..i+pred_len for GT waypoints (current-ego frame) and future Roach
    actions — replacing the reference's 5-JSON-5-npy random reads per item
    (carla_dataset.py:115-203) with pure slicing. With n_sweeps=2 the history
    camera sweep is the previous saved frame (the reference's
    history_query_index_lis = [-1, 0] at the same 2 Hz cadence) and the lidar
    is the two-sweep ego-motion merge of union2one."""
    F = frames.pos.shape[0]
    n = F - pred_len - (n_sweeps - 1)
    idx = jnp.arange(n) + (n_sweeps - 1)

    pos, yaw = frames.pos, frames.yaw
    gt_wp = []
    for k in range(1, pred_len + 1):
        rel = pos[idx + k] - pos[idx]
        gt_wp.append(_rotate_into(yaw[idx], rel))
    gt_wp = jnp.stack(gt_wp, axis=1)                       # (n, T, 2)

    sup = frames.supervision
    alpha, beta = sup["alpha"], sup["beta"]
    # only_ap_brake override (carla_dataset.py:178-196): the accel dim's Beta
    # params become (0.8, 5.5) — a braking prior — while the steering dim
    # keeps Roach's values
    oab = sup["only_ap_brake"]
    alpha = alpha.at[:, 0].set(jnp.where(oab, 0.8, alpha[:, 0]))
    beta = beta.at[:, 0].set(jnp.where(oab, 5.5, beta[:, 0]))

    fut_a, fut_b = [], []
    for k in range(1, pred_len):
        fut_a.append(alpha[idx + k])
        fut_b.append(beta[idx + k])

    # future-frame Roach 21x21 grids (frames i+1..i+pred_len) — targets for
    # teacher_future_BEV_feature_loss (thinktwice_decoder.py:604-612)
    cnn21 = jnp.moveaxis(sup["cnn_features"][0], 1, -1)        # (F, 21, 21, 32)
    future_cnn21 = jnp.stack(
        [cnn21[idx + k] for k in range(1, pred_len + 1)], axis=1
    )                                                          # (n, T, 21, 21, 32)

    sweep_rgb = [
        sensors["rgb"][idx - (n_sweeps - 1 - t)] for t in range(n_sweeps)
    ]                                                      # oldest first
    rgb = jnp.stack(sweep_rgb, axis=1)                     # (n, T_sw, N, H, W, 3)
    imgs = (rgb - IMAGENET_MEAN) / IMAGENET_STD

    # per-sweep ego(t)->ego(key) transforms for camera ego-motion
    # compensation (geometry.sweep_to_key ≡ curr2key, carla_dataset:290-312)
    from thinktwice_tpu.geometry import sweep_to_key

    sweep2key = jnp.stack(
        [
            sweep_to_key(
                pos[idx - (n_sweeps - 1 - t)], yaw[idx - (n_sweeps - 1 - t)],
                pos[idx], yaw[idx],
            )
            for t in range(n_sweeps)
        ],
        axis=1,
    )                                                      # (n, T_sw, 4, 4)

    if n_sweeps >= 2:
        from thinktwice_tpu.sensors.lidar import merge_sweeps

        def merge_one(i):
            return merge_sweeps(
                sensors["lidar"][i][:, :4], sensors["lidar_mask"][i],
                sensors["lidar"][i - 1][:, :4], sensors["lidar_mask"][i - 1],
                (frames.pos[i], frames.yaw[i]),
                (frames.pos[i - 1], frames.yaw[i - 1]),
            )

        points, points_mask = jax.vmap(merge_one)(idx)
    else:
        points, points_mask = sensors["lidar"][idx], sensors["lidar_mask"][idx]

    batch = {
        "imgs": imgs,
        "sweep2key": sweep2key,
        "points": points,
        "points_mask": points_mask,
        "speed": frames.speed[idx],
        "target_point": frames.target_point[idx],
        "command": jax.nn.one_hot(frames.command[idx], 6),
        "gt_waypoints": gt_wp,
        "action_alpha": alpha[idx],
        "action_beta": beta[idx],
        "future_action_alpha": jnp.stack(fut_a, axis=1),
        "future_action_beta": jnp.stack(fut_b, axis=1),
        "gt_speed": frames.speed[idx],
        "gt_value": sup["value"][idx],
        "roach_features": sup["features"][idx],
        "roach_cnn": tuple(
            jnp.moveaxis(g[idx], 1, -1) for g in sup["cnn_features"]
        ),  # NCHW -> NHWC
        "future_roach_cnn21": future_cnn21,
        "gt_depth": sensors["depth"][idx].reshape(
            -1, *sensors["depth"].shape[2:]
        ),
        "gt_seg": None,  # filled below at matched resolution
        "teacher_wp": gt_wp,
        # teacher ctrl over the pred horizon: current + the T-1 future actions
        # (decoder teacher forcing, thinktwice_decoder.py:496-500)
        "teacher_ctrl_sp": jnp.concatenate(
            [
                jnp.stack([alpha[idx], *fut_a], axis=1),
                jnp.stack([beta[idx], *fut_b], axis=1),
            ],
            axis=-1,
        ),
    }
    sem = sensors["semantic"][idx]                         # (n, N, H, W)
    sem4 = sem[:, :, ::4, ::4]                             # match seg head res
    batch["gt_seg"] = sem4.reshape(-1, *sem4.shape[2:])
    return batch
