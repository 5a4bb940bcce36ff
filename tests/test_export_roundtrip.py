"""Dataset format round-trip: in-graph collection -> reference layout on disk
-> ReferenceDataset + native C++ loader read it back."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thinktwice_tpu.agents.roach import RoachPolicy
from thinktwice_tpu.sim.reset import reset_world
from thinktwice_tpu.train.collect import collect_batch
from thinktwice_tpu.train.export_reference import export_metadata, export_route
from thinktwice_tpu.train.reference_dataset import ReferenceDataset
from tests.test_pipeline import TINY, straight_route

pytest.importorskip("PIL.Image")


@pytest.fixture(scope="module")
def exported(town, tmp_path_factory):
    root = tmp_path_factory.mktemp("refds")
    policy = RoachPolicy()
    rparams = policy.init(
        jax.random.key(0),
        jnp.zeros((1, TINY.birdview.n_channels, 192, 192)),
        jnp.zeros((1, TINY.roach.state_dim)),
    )
    st = reset_world(TINY, town, straight_route(), jax.random.key(1))
    _, frames, sensors = jax.jit(collect_batch, static_argnums=(0, 4))(
        TINY, rparams, town, st, 7
    )
    frames = jax.device_get(frames)
    sensors = jax.device_get(sensors)
    n = export_route(str(root / "town01_00"), frames, sensors)
    assert n == 7
    return str(root), frames, sensors


def test_reference_reader_roundtrip(exported):
    root, frames, sensors = exported
    meta = export_metadata(root)
    assert meta == {"town01_00": 7}
    ds = ReferenceDataset(root)
    assert len(ds) == 3  # 7 frames - PRED_LEN
    item = ds[0]
    np.testing.assert_allclose(item["pos"], np.asarray(frames.pos[0]), atol=1e-5)
    np.testing.assert_allclose(
        item["speed"], float(frames.speed[0]), atol=1e-5
    )
    assert item["features"].shape == (256,)
    assert len(item["cnn_features"]) == 4
    # future waypoints finite and mostly forward on a straight route
    assert np.isfinite(item["gt_waypoints"]).all()
    imgs = ds.load_images(0)
    assert imgs.shape == (4, TINY.camera.height, TINY.camera.width, 3)
    np.testing.assert_allclose(
        imgs[0], np.asarray(sensors["rgb"][0, 0]), atol=2 / 255
    )


def test_reference_measurement_schema(exported):
    """Exported measurements carry every key the reference CarlaDataset
    reads (get_data_info:115-165), and its axis-swap + theta-pi/2 transform
    reproduces our ego-frame waypoints exactly (ADVICE r1 #4)."""
    import json
    import os

    root, frames, sensors = exported
    ds = ReferenceDataset(root)
    m = json.load(open(os.path.join(root, "town01_00", "measurements",
                                    "0000.json")))
    for key in ("x", "y", "theta", "speed", "acceleration",
                "angular_velocity", "x_target", "y_target", "target_command"):
        assert key in m, key
    assert len(m["acceleration"]) == 3 and len(m["angular_velocity"]) == 3
    assert m["target_command"] in (1, 2, 3, 4, 5, 6)

    # reproduce the reference's coordinate pipeline
    def swap(x, y):
        return np.asarray([y, -x])

    theta = m["theta"] - np.pi / 2
    ego = swap(m["x"], m["y"])
    R = np.array([[np.cos(theta), -np.sin(theta)],
                  [np.sin(theta), np.cos(theta)]])
    fm = json.load(open(os.path.join(root, "town01_00", "measurements",
                                     "0001.json")))
    wp_ref = R.T @ (swap(fm["x"], fm["y"]) - ego)
    np.testing.assert_allclose(wp_ref, ds[0]["gt_waypoints"][0], atol=1e-4)
    tp_ref = R.T @ (swap(m["x_target"], m["y_target"]) - ego)
    np.testing.assert_allclose(tp_ref, ds[0]["target_point"], atol=1e-4)


def test_reference_reader_depth_seg_futures(exported):
    root, frames, sensors = exported
    ds = ReferenceDataset(root)
    item = ds[0]
    # future supervision present with only_ap_brake-style shapes
    assert item["future_action_alpha"].shape == (4, 2)
    assert item["future_features"].shape == (4, 256)
    assert item["future_grid_features"].shape[0] == 4
    d = ds.load_depth(0)
    assert d is not None and d.shape[0] == 4
    np.testing.assert_allclose(
        d[0], np.asarray(sensors["depth"][0, 0]), atol=0.011
    )
    s = ds.load_seg(0)
    assert s is not None and s.shape == d.shape
    assert s.dtype == np.int32


def test_remap_seg_tl_split():
    """HSV traffic-light color split on a synthetic CARLA-id seg map
    (loading.py LoadSeg:96-160)."""
    from thinktwice_tpu.train.reference_dataset import remap_seg

    src = np.zeros((32, 32), np.uint8)
    src[2:6, 2:10] = 7        # road -> class 4
    src[10:16, 10:16] = 18    # traffic light blob (36 px, >= 20)
    src[25:27, 25:27] = 18    # tiny blob (< 20 px) -> stays class 8+0? no: skipped -> 0
    # blob = dark housing pixels (lower the mean saturation, as in real
    # CARLA TL crops) + a lit disc; CARLA red ~ hue 340 deg (cv2 170),
    # green ~ cyan-green 160 deg (cv2 80) — the reference's ranges
    rgb = np.zeros((32, 32, 3), np.uint8)
    rgb[10:16, 10:16] = [40, 40, 40]
    rgb[11:14, 11:14] = [255, 0, 85]    # red lamp
    seg = remap_seg(src, rgb)
    assert (seg[2:6, 2:10] == 4).all()          # road is index 4 in the list
    assert (seg[10:16, 10:16] == 8 + 1).all()   # tl idx 8 + red offset 1
    assert (seg[25:27, 25:27] == 0).all()       # tiny blob skipped
    # green light
    rgb[11:14, 11:14] = [0, 255, 170]
    seg_g = remap_seg(src, rgb)
    assert (seg_g[10:16, 10:16] == 8 + 2).all()


def test_only_ap_brake_override_dims():
    """The override touches only the accel dim (carla_dataset.py:178-196)."""
    from thinktwice_tpu.train.reference_dataset import ReferenceDataset

    sup = {
        "action_mu": np.asarray([2.0, 3.0], np.float32),
        "action_sigma": np.asarray([4.0, 5.0], np.float32),
        "only_ap_brake": True,
    }
    a, b = ReferenceDataset._beta_params(sup)
    np.testing.assert_allclose(a, [0.8, 3.0])
    np.testing.assert_allclose(b, [5.5, 5.0])
    sup["only_ap_brake"] = False
    a, b = ReferenceDataset._beta_params(sup)
    np.testing.assert_allclose(a, [2.0, 3.0])
    np.testing.assert_allclose(b, [4.0, 5.0])


def test_native_loader_reads_export(exported):
    root, frames, sensors = exported
    from thinktwice_tpu.train.native_loader import NativeImageLoader

    dl = NativeImageLoader(root, n_threads=2)
    assert len(dl) == 7
    dl.start(seed=0, shuffle=False)
    imgs, idxs = dl.next_batch(3)
    assert imgs.shape[0] == 3
    ref = (np.asarray(sensors["rgb"][int(idxs[0]), 0]) * 255).astype(np.uint8)
    np.testing.assert_array_equal(imgs[0, 0], ref)
    dl.close()
