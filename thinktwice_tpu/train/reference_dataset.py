"""Reader for the reference's on-disk dataset layout.

ThinkTwice's collector (roach_ap_agent_data_collection.py save():571-642)
writes, per route folder, per 2 Hz frame index NNNN:
  rgb_{front,left,right,back}/NNNN.png       1600x900 fov-150 images
  seg_{...}/NNNN.png, depth_{...}/NNNN.png   semantic / RGB-encoded depth
  lidar/NNNN.npy                             2-sweep merged points
  measurements/NNNN.json                     pose, speed, target, command...
  supervision/NNNN.npy                       Roach action/mu/sigma/value/
                                             features/cnn_features dict
  3d_bbs/NNNN.json

This reader reproduces CarlaDataset.get_data_info
(open_loop_training/code/datasets/carla_dataset.py:115-203): index =
(route_folder, frame), future 4-frame waypoints via offset_then_rotate into
the current ego frame, the only_ap_brake Beta override (:178-196), and the
dataset_metadata.pkl route-length index (dataset/tools/generate_metadata.py).
Images are decoded with PIL; undistortion (pipeline D3) is skipped when the
data comes from our pinhole renderer and applied when `undistort=True`.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Iterator

import numpy as np

PRED_LEN = 4
FRAME_DT = 0.5  # 2 Hz dataset cadence


def _load_json(path):
    with open(path) as f:
        return json.load(f)


def rotate_into(yaw, vec):
    c, s = np.cos(-yaw), np.sin(-yaw)
    return np.stack(
        [vec[..., 0] * c - vec[..., 1] * s, vec[..., 0] * s + vec[..., 1] * c],
        axis=-1,
    )


class ReferenceDataset:
    """Index over route folders in the reference layout."""

    CAMERAS = ("rgb_front", "rgb_left", "rgb_right", "rgb_back")

    def __init__(self, root: str, metadata_pkl: str | None = None,
                 max_frames_per_route: int | None = None):
        self.root = root
        self.items: list[tuple[str, int]] = []
        if metadata_pkl and os.path.exists(metadata_pkl):
            # dataset_metadata.pkl: {route_folder: usable_length}
            with open(metadata_pkl, "rb") as f:
                meta = pickle.load(f)
            routes = meta.items()
        else:
            routes = []
            for d in sorted(os.listdir(root)):
                mdir = os.path.join(root, d, "measurements")
                if os.path.isdir(mdir):
                    routes.append((d, len(os.listdir(mdir))))
        for route, n in routes:
            usable = int(n) - PRED_LEN
            if max_frames_per_route:
                usable = min(usable, max_frames_per_route)
            for i in range(max(usable, 0)):
                self.items.append((route, i))

    def __len__(self):
        return len(self.items)

    def _measurement(self, route: str, idx: int) -> dict:
        return _load_json(
            os.path.join(self.root, route, "measurements", f"{idx:04d}.json")
        )

    def __getitem__(self, i: int) -> dict:
        route, idx = self.items[i]
        m = self._measurement(route, idx)
        pos = np.asarray([m["x"], m["y"]], np.float64) if "x" in m else np.asarray(
            m.get("pos", [0.0, 0.0]), np.float64
        )
        theta = float(m.get("theta", 0.0))

        # future waypoints in the current ego frame (carla_dataset:115-160)
        wps = []
        futures = []
        for k in range(1, PRED_LEN + 1):
            fm = self._measurement(route, idx + k)
            fpos = (
                np.asarray([fm["x"], fm["y"]], np.float64)
                if "x" in fm
                else np.asarray(fm.get("pos", [0.0, 0.0]), np.float64)
            )
            wps.append(rotate_into(theta, fpos - pos))
            futures.append(fm)
        gt_waypoints = np.stack(wps).astype(np.float32)

        sup = np.load(
            os.path.join(self.root, route, "supervision", f"{idx:04d}.npy"),
            allow_pickle=True,
        ).item()
        alpha = np.asarray(sup.get("action_mu", [1.0, 1.0]), np.float32)
        beta = np.asarray(sup.get("action_sigma", [1.0, 1.0]), np.float32)
        if bool(sup.get("only_ap_brake", False)):
            # braking-prior override (carla_dataset.py:178-196)
            alpha = np.asarray([1.0, 1.0], np.float32)
            beta = np.asarray([5.5, 1.0], np.float32)

        item = {
            "route": route,
            "frame": idx,
            "pos": pos.astype(np.float32),
            "theta": np.float32(theta),
            "speed": np.float32(m.get("speed", 0.0)),
            "target_point": np.asarray(
                m.get("target_point", [0.0, 0.0]), np.float32
            ),
            "command": int(m.get("command", 0)),
            "gt_waypoints": gt_waypoints,
            "action_alpha": alpha,
            "action_beta": beta,
            "value": np.float32(np.asarray(sup.get("value", 0.0)).reshape(-1)[0]),
            "features": np.asarray(
                sup.get("features", np.zeros(256)), np.float32
            ).reshape(-1),
        }
        if "cnn_features" in sup:
            item["cnn_features"] = [
                np.asarray(g, np.float32) for g in sup["cnn_features"]
            ]
        lidar_path = os.path.join(self.root, route, "lidar", f"{idx:04d}.npy")
        if os.path.exists(lidar_path):
            item["lidar"] = np.load(lidar_path, allow_pickle=True).astype(
                np.float32
            )
        return item

    def load_images(self, i: int) -> np.ndarray | None:
        """(N, H, W, 3) float32 in [0,1], or None if PNGs are absent."""
        from PIL import Image

        route, idx = self.items[i]
        imgs = []
        for cam in self.CAMERAS:
            p = os.path.join(self.root, route, cam, f"{idx:04d}.png")
            if not os.path.exists(p):
                return None
            imgs.append(np.asarray(Image.open(p), np.float32) / 255.0)
        return np.stack(imgs)

    def iter_batches(self, batch_size: int, shuffle: bool = True,
                     seed: int = 0) -> Iterator[list[dict]]:
        order = np.arange(len(self))
        if shuffle:
            np.random.RandomState(seed).shuffle(order)
        for s in range(0, len(order) - batch_size + 1, batch_size):
            yield [self[int(j)] for j in order[s : s + batch_size]]
