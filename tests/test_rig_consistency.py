"""Renderer <-> model geometry consistency: a world point visible in the
camera raster must project to the same pixel through the model's ego2img
matrices (the lidar2img path the look module uses)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from thinktwice_tpu.config import CameraConfig
from thinktwice_tpu.models import rig as rig_lib
from thinktwice_tpu.sensors import raycast
from thinktwice_tpu.sensors.camera import cameras_from_state
from thinktwice_tpu.sim.reset import reset_world

CAM = CameraConfig(height=64, width=128)


def test_projection_matches_render(small_cfg, town):
    import tests.test_sensors as ts

    # ego at route start (10, -1.75, yaw 0); box 8 m ahead
    box_pos = np.array([18.0, -1.75])
    st = ts._state_with_actor(small_cfg, town, veh_at=box_pos.tolist())
    out = jax.jit(cameras_from_state, static_argnums=0)(CAM, town, st)
    sem = np.asarray(out["semantic"][0])  # front camera

    # project the box's top-center point into the front camera via the rig
    ego_pos = np.asarray(st.ego.pos)
    e2i = rig_lib.ego_to_img(CAM)[0]
    p_ego = np.array([box_pos[0] - ego_pos[0], box_pos[1] - ego_pos[1], 0.8, 1.0])
    proj = e2i @ p_ego
    u, v = proj[0] / proj[2], proj[1] / proj[2]
    assert 0 <= u < CAM.width and 0 <= v < CAM.height

    # the rendered vehicle must cover that pixel (within a small window)
    vi, ui = int(round(v)), int(round(u))
    window = sem[max(vi - 2, 0) : vi + 3, max(ui - 2, 0) : ui + 3]
    assert (window == raycast.SEM_VEHICLE).any(), (u, v, np.unique(sem))


def test_depth_matches_projection(small_cfg, town):
    import tests.test_sensors as ts

    st = ts._state_with_actor(small_cfg, town, veh_at=[18.0, -1.75])
    out = jax.jit(cameras_from_state, static_argnums=0)(CAM, town, st)
    sem = np.asarray(out["semantic"][0])
    depth = np.asarray(out["depth"][0])
    vmask = sem == raycast.SEM_VEHICLE
    assert vmask.any()
    # the box front face is 8 - 2.45 = 5.55 m ahead of the ego center
    d = depth[vmask]
    assert 4.5 < d.min() < 6.5


def test_birdview_rgb_debug(small_cfg, town):
    from thinktwice_tpu.sensors.birdview import (
        birdview_from_state,
        render_birdview_rgb,
    )
    import tests.test_sensors as ts

    st = ts._state_with_actor(small_cfg, town, veh_at=[20.0, -1.75])
    masks = jax.jit(birdview_from_state, static_argnums=0)(
        small_cfg.birdview, town, st
    )
    rgb = render_birdview_rgb(small_cfg.birdview, masks, st.ego.extent)
    assert rgb.shape == (192, 192, 3)
    arr = np.asarray(rgb)
    assert arr.min() >= 0.0 and arr.max() <= 1.0
    # road gray exists and the ego white box is painted
    assert (arr.max(axis=-1) > 0.9).any()
