"""Disk cache for compiled towns.

`compile_town` (maps/compile_h5.py) runs a raster A* planner over every route
polyline on the host; for Town05 with the full training bank that is minutes
of single-core work per process. The result is a flat pytree of arrays, so it
round-trips losslessly through one .npz file. The cache key covers the H5
source and the compile arguments, mirroring how the reference bakes its
per-town H5 maps once and ships them (roach/obs_manager/birdview/maps/).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os

import numpy as np

from thinktwice_tpu.maps.town import TownMap

CACHE_DIR = os.environ.get(
    "THINKTWICE_TOWN_CACHE", os.path.expanduser("~/.cache/thinktwice_towns")
)


def save_town(path: str, town: TownMap) -> None:
    arrs = {
        f.name: np.asarray(getattr(town, f.name))
        for f in dataclasses.fields(TownMap)
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **arrs)


def load_town(path: str) -> TownMap:
    import jax.numpy as jnp

    with np.load(path) as z:
        return TownMap(**{k: jnp.asarray(z[k]) for k in z.files})


def town05_cached(
    h5_path: str,
    routes_files: list[str],
    n_bank_files: int = 4,
    max_bank_routes: int = 200,
    **compile_kwargs,
) -> TownMap:
    """Compile (or load) a town keyed on the H5 file + route sources + args.

    routes_files: XML files whose routes seed the lane network (eval routes
    first, then training-bank files for town-wide NPC coverage).
    """
    sig = {
        "h5": h5_path,
        "h5_mtime": os.path.getmtime(h5_path),
        "routes": routes_files,
        "n_bank": n_bank_files,
        "max_bank": max_bank_routes,
        "kwargs": {k: str(v) for k, v in sorted(compile_kwargs.items())},
        "v": 13,  # bump to invalidate after compile_town or planner changes
    }
    key = hashlib.sha1(json.dumps(sig, sort_keys=True).encode()).hexdigest()[:16]
    path = os.path.join(CACHE_DIR, f"town_{key}.npz")
    if os.path.exists(path):
        return load_town(path)

    from thinktwice_tpu.maps.compile_h5 import compile_town
    from thinktwice_tpu.maps.router import raster_planner
    from thinktwice_tpu.harness.route_parser import parse_routes_file

    planner = raster_planner(h5_path)
    polylines = []
    for f in routes_files:
        for s in parse_routes_file(f):
            polylines.append(s.dense(spacing=2.0, planner=planner))
    town = compile_town(h5_path, polylines[: len(polylines)], **compile_kwargs)
    save_town(path, town)
    return town
