"""Native C++ dataloader: build, scan, decode, prefetch round-trip."""

import os

import numpy as np
import pytest

PIL = pytest.importorskip("PIL.Image")


@pytest.fixture(scope="module")
def fake_dataset(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("ds")
    rng = np.random.RandomState(0)
    frames = {}
    for route in ["town01_r0", "town01_r1"]:
        for cam in ["rgb_front", "rgb_left"]:
            os.makedirs(root / route / cam)
        for i in range(5):
            for cam in ["rgb_front", "rgb_left"]:
                arr = rng.randint(0, 255, (24, 32, 3), np.uint8)
                frames[(route, f"{i:04d}.png", cam)] = arr
                Image.fromarray(arr).save(root / route / cam / f"{i:04d}.png")
    return str(root), frames


def test_scan_and_shapes(fake_dataset):
    from thinktwice_tpu.train.native_loader import NativeImageLoader

    root, _ = fake_dataset
    dl = NativeImageLoader(root, cameras=("rgb_front", "rgb_left"), n_threads=2)
    assert len(dl) == 10
    assert (dl.img_h, dl.img_w, dl.n_cams) == (24, 32, 2)
    route, frame = dl.item_id(0)
    assert route.startswith("town01") and frame.endswith(".png")
    dl.close()


def test_decode_matches_pil(fake_dataset):
    from thinktwice_tpu.train.native_loader import NativeImageLoader

    root, frames = fake_dataset
    dl = NativeImageLoader(root, cameras=("rgb_front", "rgb_left"), n_threads=2)
    dl.start(seed=0, shuffle=False)
    imgs, idxs = dl.next_batch(4)
    assert imgs.shape == (4, 2, 24, 32, 3)
    for b in range(4):
        route, frame = dl.item_id(int(idxs[b]))
        np.testing.assert_array_equal(imgs[b, 0], frames[(route, frame, "rgb_front")])
        np.testing.assert_array_equal(imgs[b, 1], frames[(route, frame, "rgb_left")])
    dl.close()


def test_epoch_exhausts_and_shuffles(fake_dataset):
    from thinktwice_tpu.train.native_loader import NativeImageLoader

    root, _ = fake_dataset
    dl = NativeImageLoader(root, cameras=("rgb_front", "rgb_left"), n_threads=3)
    dl.start(seed=1, shuffle=True)
    seen = []
    while True:
        imgs, idxs = dl.next_batch(3)
        if len(idxs) == 0:
            break
        seen.extend(idxs.tolist())
    assert sorted(seen) == list(range(10))  # every frame exactly once
    dl.start(seed=2, shuffle=True)
    imgs2, idxs2 = dl.next_batch(10)
    assert sorted(idxs2.tolist()) == list(range(10))
    dl.close()
