"""Export collected rollouts to the reference's on-disk dataset layout.

Inverse of train/reference_dataset.py: writes, per route folder, the same
files roach_ap_agent_data_collection.py save() produces (:571-642) —
rgb_*/NNNN.png, depth_*/NNNN.png (16-bit), seg_*/NNNN.png, lidar/NNNN.npy,
measurements/NNNN.json, supervision/NNNN.npy — so the original torch training
stack (or our native loader) can consume data collected by the in-graph sim.
"""

from __future__ import annotations

import json
import os

import numpy as np

CAMERAS = ("rgb_front", "rgb_left", "rgb_right", "rgb_back")


def export_route(
    out_dir: str,
    frames,           # stacked agents.expert.Frame pytree (host numpy)
    sensors: dict,    # rgb (F, N, H, W, 3) [0,1], depth, semantic, lidar, mask
) -> int:
    """Writes one route folder; returns the number of frames written."""
    from PIL import Image

    F = int(np.asarray(frames.pos).shape[0])
    subdirs = list(CAMERAS)
    subdirs += [c.replace("rgb", "depth") for c in CAMERAS]
    subdirs += [c.replace("rgb", "seg") for c in CAMERAS]
    subdirs += ["lidar", "measurements", "supervision"]
    for d in subdirs:
        os.makedirs(os.path.join(out_dir, d), exist_ok=True)

    rgb = np.asarray(sensors["rgb"])
    depth = np.asarray(sensors["depth"])
    sem = np.asarray(sensors["semantic"])
    lidar = np.asarray(sensors["lidar"])
    lidar_mask = np.asarray(sensors["lidar_mask"])
    pos = np.asarray(frames.pos)
    yaw = np.asarray(frames.yaw)
    speed = np.asarray(frames.speed)
    control = np.asarray(frames.control)
    target = np.asarray(frames.target_point)
    sup = {k: np.asarray(v) for k, v in frames.supervision.items()
           if k != "cnn_features"}
    cnn = [np.asarray(g) for g in frames.supervision["cnn_features"]]

    # world-frame kinematics for the reference measurement schema
    # (roach_ap_agent save():607-626). Frames are 2 Hz, so acceleration /
    # angular velocity come from finite differences at that cadence.
    fwd = np.stack([np.cos(yaw), np.sin(yaw)], axis=-1)
    vel = speed[:, None] * fwd                              # (F, 2) world
    dt = 0.5
    accel = np.gradient(vel, dt, axis=0)
    yaw_unwrapped = np.unwrap(yaw)
    yaw_rate = np.gradient(yaw_unwrapped, dt)
    # target point back to world frame: frames carry it ego-relative
    c, s = np.cos(yaw), np.sin(yaw)
    target_world = pos + np.stack(
        [target[:, 0] * c - target[:, 1] * s,
         target[:, 0] * s + target[:, 1] * c], axis=-1,
    )
    # RoadOption ints (global_route_planner.py RoadOption: LEFT=1 ..
    # CHANGELANERIGHT=6). Frames carry the 0-5 class (train.collect
    # route_command = RoadOption - 1); the reference JSON stores the raw int.
    if hasattr(frames, "command"):
        target_command = np.asarray(frames.command).astype(int) + 1
    else:
        bearing = np.arctan2(target[:, 1], target[:, 0])
        target_command = np.where(
            bearing < -0.3, 1, np.where(bearing > 0.3, 2, 4)
        ).astype(int)

    for i in range(F):
        tag = f"{i:04d}"
        for c, cam in enumerate(CAMERAS):
            Image.fromarray(
                (rgb[i, c] * 255).astype(np.uint8)
            ).save(os.path.join(out_dir, cam, tag + ".png"))
            # depth in centimeters as 16-bit png (metric, lossless to 655 m)
            d16 = np.clip(depth[i, c] * 100.0, 0, 65535).astype(np.uint16)
            Image.fromarray(d16).save(
                os.path.join(out_dir, cam.replace("rgb", "depth"), tag + ".png")
            )
            Image.fromarray(sem[i, c].astype(np.uint8)).save(
                os.path.join(out_dir, cam.replace("rgb", "seg"), tag + ".png")
            )
        np.save(
            os.path.join(out_dir, "lidar", tag + ".npy"),
            lidar[i][lidar_mask[i]],
        )
        # Convention note: the reference's CarlaDataset swaps axes and
        # subtracts pi/2 from theta (carla_dataset.py:120-125). Writing our
        # world (x, y, theta) raw makes those transforms cancel exactly:
        # R(theta-pi/2)^T R(-pi/2) = R(theta)^T, so the ego-frame waypoints /
        # target points it computes equal ours (tests/test_export_roundtrip).
        meas = {
            "x": float(pos[i, 0]),
            "y": float(pos[i, 1]),
            "theta": float(yaw[i]),
            "speed": float(speed[i]),
            "acceleration": [float(accel[i, 0]), float(accel[i, 1]), 0.0],
            "angular_velocity": [0.0, 0.0, float(yaw_rate[i])],
            "x_target": float(target_world[i, 0]),
            "y_target": float(target_world[i, 1]),
            "target_command": int(target_command[i]),
            "target_point": target[i].tolist(),
            "command": int(target_command[i]),
            "steer": float(control[i, 0]),
            "throttle": float(control[i, 1]),
            "brake": float(control[i, 2]),
        }
        with open(os.path.join(out_dir, "measurements", tag + ".json"), "w") as f:
            json.dump(meas, f)
        sup_i = {
            "action": sup["action"][i],
            "action_mu": sup["alpha"][i],
            "action_sigma": sup["beta"][i],
            "value": sup["value"][i],
            "features": sup["features"][i],
            "cnn_features": [g[i] for g in cnn],
            "only_ap_brake": bool(sup["only_ap_brake"][i]),
        }
        np.save(
            os.path.join(out_dir, "supervision", tag + ".npy"),
            sup_i, allow_pickle=True,
        )
    return F


def export_metadata(root: str, out_pkl: str | None = None) -> dict:
    """dataset_metadata.pkl ≡ dataset/tools/generate_metadata.py output."""
    import pickle

    meta = {}
    for d in sorted(os.listdir(root)):
        mdir = os.path.join(root, d, "measurements")
        if os.path.isdir(mdir):
            meta[d] = len(os.listdir(mdir))
    if out_pkl:
        with open(out_pkl, "wb") as f:
            pickle.dump(meta, f)
    return meta
