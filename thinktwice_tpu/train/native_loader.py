"""ctypes bridge to the native C++ dataset loader (native/dataloader.cpp).

The reference decodes 12 PNGs per item inside Python dataloader workers
(code/datasets/pipelines/loading.py, 8 workers/GPU); here a libpng thread
pool owns the decode and prefetch, and Python receives assembled uint8 image
batches plus frame indices it joins with the (tiny, pickled) supervision via
train/reference_dataset.ReferenceDataset.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SO = os.path.join(_REPO, "native", "build", "libttdataloader.so")


def _build_if_needed() -> str:
    src = os.path.join(_REPO, "native", "dataloader.cpp")
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(src):
        subprocess.run(["make", "-C", os.path.join(_REPO, "native")], check=True)
    return _SO


class NativeImageLoader:
    """Prefetching image-batch loader over a reference-layout dataset root."""

    def __init__(self, root: str, cameras=("rgb_front", "rgb_left", "rgb_right", "rgb_back"),
                 n_threads: int = 4):
        lib = ctypes.CDLL(_build_if_needed())
        lib.dl_create.restype = ctypes.c_void_p
        lib.dl_create.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
        lib.dl_len.restype = ctypes.c_int64
        lib.dl_len.argtypes = [ctypes.c_void_p]
        lib.dl_image_shape.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.dl_start.argtypes = [ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int]
        lib.dl_next.restype = ctypes.c_int64
        lib.dl_next.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.dl_item.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.c_char_p, ctypes.c_int64,
        ]
        lib.dl_destroy.argtypes = [ctypes.c_void_p]
        self._lib = lib
        self._h = lib.dl_create(
            root.encode(), ",".join(cameras).encode(), n_threads
        )
        h = ctypes.c_int64()
        w = ctypes.c_int64()
        n = ctypes.c_int64()
        lib.dl_image_shape(self._h, ctypes.byref(h), ctypes.byref(w), ctypes.byref(n))
        self.img_h, self.img_w, self.n_cams = h.value, w.value, n.value

    def __len__(self) -> int:
        return int(self._lib.dl_len(self._h))

    def item_id(self, i: int) -> tuple[str, str]:
        route = ctypes.create_string_buffer(512)
        frame = ctypes.create_string_buffer(64)
        self._lib.dl_item(self._h, i, route, 512, frame, 64)
        return route.value.decode(), frame.value.decode()

    def start(self, seed: int = 0, shuffle: bool = True) -> None:
        self._lib.dl_start(self._h, seed, int(shuffle))

    def next_batch(self, batch_size: int):
        """-> (images uint8 (n, n_cams, H, W, 3), indices (n,)) with
        n <= batch_size; n == 0 signals the epoch end."""
        images = np.empty(
            (batch_size, self.n_cams, self.img_h, self.img_w, 3), np.uint8
        )
        idxs = np.empty((batch_size,), np.int64)
        n = self._lib.dl_next(
            self._h,
            batch_size,
            images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            idxs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return images[:n], idxs[:n]

    def close(self) -> None:
        if self._h:
            self._lib.dl_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
