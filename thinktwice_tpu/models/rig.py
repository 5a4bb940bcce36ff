"""Camera rig geometry: intrinsics/extrinsics for the 4-camera setup.

The reference hard-codes calibrated LIDAR2CAM / LIDAR2IMG matrices for its
fov-150 distorted UE4 cameras (code/datasets/pipelines/transform.py:17-63,
derived offline by camera_calibration/). Our in-graph camera raster is an
ideal pinhole, so the rig is generated analytically from the camera config:
4 cameras at ego-frame yaws (0, -90, 90, 180) deg, mounted at cam_height,
with intrinsics from the fov.

Conventions: ego frame x forward, y right(ish — consistent with the world
frame used everywhere), z up. Camera frame: z forward (optical axis),
x right, y down (standard CV). Image: u right, v down.
"""

from __future__ import annotations

import numpy as np

from thinktwice_tpu.config import CameraConfig


def intrinsics(cfg: CameraConfig) -> np.ndarray:
    """(3, 3) pinhole K shared by all cameras."""
    f = cfg.width / (2.0 * np.tan(np.deg2rad(cfg.fov_deg) / 2.0))
    return np.asarray(
        [[f, 0.0, cfg.width / 2.0], [0.0, f, cfg.height / 2.0], [0.0, 0.0, 1.0]],
        np.float32,
    )


def cam_to_ego(cfg: CameraConfig) -> np.ndarray:
    """(N, 4, 4) cam->ego transforms (R | t)."""
    mats = []
    for yaw_deg in cfg.cam_yaws:
        yaw = np.deg2rad(yaw_deg)
        # optical axis in ego frame
        fwd = np.asarray([np.cos(yaw), np.sin(yaw), 0.0])
        right = np.asarray([-np.sin(yaw), np.cos(yaw), 0.0])  # ego-right of view
        down = np.asarray([0.0, 0.0, -1.0])
        R = np.stack([right, down, fwd], axis=1)  # columns = cam x,y,z in ego
        t = np.asarray([0.0, 0.0, cfg.cam_height])
        M = np.eye(4, dtype=np.float32)
        M[:3, :3] = R
        M[:3, 3] = t
        mats.append(M)
    return np.stack(mats)


def ego_to_img(cfg: CameraConfig) -> np.ndarray:
    """(N, 4, 4) ego->image projective matrices (the reference's lidar2img,
    transform.py LIDAR2IMG): x_img ~ K @ [R|t]^-1 @ x_ego."""
    K4 = np.eye(4, dtype=np.float32)
    K4[:3, :3] = intrinsics(cfg)
    c2e = cam_to_ego(cfg)
    return np.stack([K4 @ np.linalg.inv(M) for M in c2e])
