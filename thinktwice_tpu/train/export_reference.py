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
        meas = {
            "x": float(pos[i, 0]),
            "y": float(pos[i, 1]),
            "theta": float(yaw[i]),
            "speed": float(speed[i]),
            "target_point": target[i].tolist(),
            "command": 0,
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
