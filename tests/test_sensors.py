"""Camera raster + lidar ray-cast tests (tiny resolutions)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from thinktwice_tpu.config import CameraConfig, LidarConfig
from thinktwice_tpu.sensors import raycast
from thinktwice_tpu.sensors.camera import cameras_from_state, render_cameras
from thinktwice_tpu.sensors.lidar import lidar_from_state, merge_sweeps
from thinktwice_tpu.sim.reset import reset_world

CAM = CameraConfig(height=32, width=64)
LID = LidarConfig(n_beams=8, n_azimuth=64)


def straight_route(x0=10.0, y=-1.75, length=150.0, n=256):
    xs = np.linspace(x0, x0 + length, n)
    return jnp.asarray(
        np.stack([xs, np.full_like(xs, y), np.zeros_like(xs)], 1), jnp.float32
    )


def _state_with_actor(small_cfg, town, veh_at=None, wlk_at=None):
    st = reset_world(small_cfg, town, straight_route(), jax.random.key(0))
    if veh_at is not None:
        tr = st.traffic
        tr = dataclasses.replace(
            tr,
            pos=tr.pos.at[0].set(jnp.asarray(veh_at)),
            yaw=tr.yaw.at[0].set(0.0),
            active=tr.active.at[0].set(True),
        )
        st = dataclasses.replace(st, traffic=tr)
    if wlk_at is not None:
        wk = st.walkers
        wk = dataclasses.replace(
            wk,
            pos=wk.pos.at[0].set(jnp.asarray(wlk_at)),
            active=wk.active.at[0].set(True),
        )
        st = dataclasses.replace(st, walkers=wk)
    return st


def test_ray_ground():
    o = jnp.asarray([[0.0, 0.0, 2.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t = raycast.ray_ground(o, d)
    np.testing.assert_allclose(np.asarray(t), [2.0])
    # upward ray never hits
    t2 = raycast.ray_ground(o, jnp.asarray([[0.0, 0.0, 1.0]]))
    assert float(t2[0]) >= raycast.MAX_T


def test_ray_boxes_hit_and_miss():
    pose = jnp.asarray([[10.0, 0.0, 0.0, 2.0, 1.0, 1.5]])
    act = jnp.ones((1,), bool)
    o = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 5.0, 1.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    t, idx = raycast.ray_boxes(o, d, pose, act)
    np.testing.assert_allclose(float(t[0]), 8.0)  # front face at x=8
    assert int(idx[0]) == 0
    assert float(t[1]) >= raycast.MAX_T and int(idx[1]) == -1


def test_camera_sees_vehicle_and_ground(small_cfg, town):
    st = _state_with_actor(small_cfg, town, veh_at=[20.0, -1.75])
    out = jax.jit(cameras_from_state, static_argnums=0)(CAM, town, st)
    rgb, depth, sem = out["rgb"], out["depth"], out["semantic"]
    assert rgb.shape == (4, 32, 64, 3)
    front_sem = np.asarray(sem[0])
    assert (front_sem == raycast.SEM_VEHICLE).any()    # car visible ahead
    assert (front_sem == raycast.SEM_ROAD).any()       # road below horizon
    # upper rows are sky (never hit)
    assert (front_sem[0] == raycast.SEM_NONE).all()
    # depth at the vehicle ~ 10 m (20 - ego_pos 10 - extent 2.45)
    vmask = front_sem == raycast.SEM_VEHICLE
    d = np.asarray(depth[0])[vmask]
    assert 5.0 < d.min() < 9.0
    # back camera must not see it
    assert not (np.asarray(sem[3]) == raycast.SEM_VEHICLE).any()


def test_camera_semantic_walker(small_cfg, town):
    # close enough that the 0.8 m-wide box spans >1 px at fov-150 / 64 px
    st = _state_with_actor(small_cfg, town, wlk_at=[13.0, -1.75])
    out = jax.jit(cameras_from_state, static_argnums=0)(CAM, town, st)
    assert (np.asarray(out["semantic"][0]) == raycast.SEM_WALKER).any()


def test_lidar_points(small_cfg, town):
    st = _state_with_actor(small_cfg, town, veh_at=[20.0, -1.75])
    pts, mask = jax.jit(lidar_from_state, static_argnums=0)(LID, town, st)
    assert pts.shape == (8 * 64, 4)
    m = np.asarray(mask)
    assert m.sum() > 50  # ground + vehicle returns
    p = np.asarray(pts)[m]
    # all ranges within sensor bounds
    r = np.linalg.norm(p[:, :3] - np.array([0, 0, LID.z_mount]), axis=1)
    assert r.max() < LID.max_range + 1.0
    # some points on the vehicle (x ~ 7-10 ahead in ego frame, z > 0.2)
    near_veh = (np.abs(p[:, 0] - 9.0) < 2.5) & (np.abs(p[:, 1]) < 1.5) & (p[:, 2] > 0.1)
    assert near_veh.any()


def test_camera_sees_traffic_light(small_cfg, town):
    """A red light's head must be visible (SEM_TL_RED) from a camera at its
    stop point looking along the approach heading — the reference gives the
    student TL color as 3 seg classes (loading.py:96-160); VERDICT r1 #1."""
    import numpy as np
    from thinktwice_tpu.maps.town import TL_RED

    tl_pos = np.asarray(town.tl_pos)
    tl_yaw = np.asarray(town.tl_yaw)
    valid = np.asarray(town.tl_valid)
    assert valid.any()
    i = int(np.argmax(valid))
    # stand 12 m before the stop point, facing the light
    yaw = float(tl_yaw[i])
    pos = tl_pos[i] - 12.0 * np.asarray([np.cos(yaw), np.sin(yaw)])

    st = _state_with_actor(small_cfg, town)
    veh_pose = jnp.zeros((1, 6))
    veh_act = jnp.zeros((1,), bool)
    tl_states = jnp.full(tl_pos.shape[0], TL_RED, jnp.int32)
    out = render_cameras(
        CAM, town, jnp.asarray(pos, jnp.float32), jnp.asarray(yaw),
        veh_pose, veh_act, veh_pose, veh_act, tl_states=tl_states,
    )
    front = np.asarray(out["semantic"][0])
    assert (front == raycast.SEM_TL_RED).any(), np.unique(front)
    assert (front == raycast.SEM_POLE).any()
    # green state renders the green class instead
    out_g = render_cameras(
        CAM, town, jnp.asarray(pos, jnp.float32), jnp.asarray(yaw),
        veh_pose, veh_act, veh_pose, veh_act,
        tl_states=jnp.zeros(tl_pos.shape[0], jnp.int32),
    )
    front_g = np.asarray(out_g["semantic"][0])
    assert (front_g == raycast.SEM_TL_GREEN).any()
    assert not (front_g == raycast.SEM_TL_RED).any()


def test_cameras_from_state_render_lights(small_cfg, town):
    """The state-driven camera path renders live light fixtures (phase from
    sim time)."""
    st = _state_with_actor(small_cfg, town)
    # park the ego 12 m before the first light, facing it, so the fixture
    # subtends pixels at this tiny 32x64 resolution
    i = int(np.argmax(np.asarray(town.tl_valid)))
    yaw = float(np.asarray(town.tl_yaw)[i])
    pos = np.asarray(town.tl_pos)[i] - 12.0 * np.asarray(
        [np.cos(yaw), np.sin(yaw)]
    )
    st = dataclasses.replace(
        st,
        ego=dataclasses.replace(
            st.ego, pos=jnp.asarray(pos, jnp.float32), yaw=jnp.asarray(yaw)
        ),
    )
    out = jax.jit(cameras_from_state, static_argnums=0)(CAM, town, st)
    sem = np.asarray(out["semantic"])
    tl_any = np.isin(
        sem,
        [raycast.SEM_TL_GREEN, raycast.SEM_TL_YELLOW, raycast.SEM_TL_RED,
         raycast.SEM_POLE],
    )
    assert tl_any.any()


def test_merge_sweeps_ego_motion():
    # previous sweep observed from 1 m behind: its points shift -1 m in x
    pts_prev = jnp.asarray([[5.0, 0.0, 0.5, 1.0]])
    pts_now = jnp.asarray([[3.0, 0.0, 0.5, 1.0]])
    mask = jnp.ones((1,), bool)
    merged, m = merge_sweeps(
        pts_now, mask, pts_prev, mask,
        (jnp.asarray([1.0, 0.0]), jnp.asarray(0.0)),
        (jnp.asarray([0.0, 0.0]), jnp.asarray(0.0)),
    )
    assert merged.shape == (2, 5)
    np.testing.assert_allclose(np.asarray(merged[0]), [3.0, 0.0, 0.5, 1.0, 0.0])
    np.testing.assert_allclose(
        np.asarray(merged[1]), [4.0, 0.0, 0.5, 1.0, 1.0], atol=1e-6
    )
