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
