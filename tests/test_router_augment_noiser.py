"""Router (A*), random routes, augmentation, expert noiser."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thinktwice_tpu.agents.noiser import apply_noise, noise_for_tick
from thinktwice_tpu.maps.router import build_graph, generate_random_routes, plan_route
from thinktwice_tpu.train.augment import augment_images, curriculum


def test_plan_route_same_loop(town):
    g = build_graph(town)
    # two points on the same block loop
    r = plan_route(g, [10.0, -1.75], [80.0, -1.75])
    assert r is not None
    length = np.linalg.norm(np.diff(r[:, :2], axis=0), axis=1).sum()
    assert 60.0 < length < 120.0


def test_plan_route_across_loops(town):
    g = build_graph(town)
    # from the bottom road to the top road requires junction/lane-change links
    r = plan_route(g, [50.0, -1.75], [50.0, 201.75])
    assert r is not None
    # roughly 200+ meters of travel
    length = np.linalg.norm(np.diff(r[:, :2], axis=0), axis=1).sum()
    assert length > 180.0


def test_generate_random_routes(town):
    routes = generate_random_routes(town, 4, min_length=80.0, seed=3)
    assert len(routes) == 4
    for r in routes:
        assert r.shape[1] == 3
        length = np.linalg.norm(np.diff(r[:, :2], axis=0), axis=1).sum()
        assert length >= 80.0


def test_augment_preserves_range_and_shape():
    rng = jax.random.key(0)
    imgs = jax.random.uniform(rng, (2, 16, 24, 3))
    out = augment_images(jax.random.key(1), imgs, 1.0)
    assert out.shape == imgs.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    # strength 0 => identity
    out0 = augment_images(jax.random.key(1), imgs, 0.0)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(imgs), atol=1e-6)


def test_curriculum_ramp():
    assert float(curriculum(0)) == 0.0
    assert float(curriculum(5_000)) == 0.5
    assert float(curriculum(50_000)) == 1.0


def test_noiser_episodes():
    rng = jax.random.key(42)
    vals = np.asarray(
        [float(noise_for_tick(rng, jnp.asarray(t), 0.05)) for t in range(0, 20000, 50)]
    )
    assert np.abs(vals).max() > 0.05       # episodes do happen
    assert (vals == 0.0).mean() > 0.7      # but most of the time it's quiet
    ctrl = apply_noise(rng, jnp.asarray(100), jnp.asarray([0.0, 0.5, 0.0]))
    assert ctrl.shape == (3,)
    assert -1.0 <= float(ctrl[0]) <= 1.0


# --- rightmost-lane positioning + waypoint-pointer regression tests --------

H5_T05 = "/root/reference/roach/obs_manager/birdview/maps/Town05.h5"
BANK_T05 = ("/root/reference/leaderboard/data/routes_for_open_loop_training/"
            "routes_town05_00.xml")


@pytest.fixture(scope="module")
def t05_planner():
    import os

    if not os.path.exists(H5_T05):
        pytest.skip("reference assets not mounted")
    from thinktwice_tpu.maps.router import raster_planner

    return raster_planner(H5_T05)


def test_opposing_routes_get_separate_lanes(t05_planner):
    """A road driven in both directions must yield two physically separate
    polylines (right-hand traffic) — the round-2 planner put both on the A*
    road-center line, which made opposing NPC chains collide head-on."""
    import os

    if not os.path.exists(BANK_T05):
        pytest.skip("reference assets not mounted")
    from scipy.spatial import cKDTree

    from thinktwice_tpu.harness.route_parser import parse_routes_file

    seps = []
    for s in parse_routes_file(BANK_T05)[:4]:
        kp = np.asarray(s.keypoints, np.float64)[:, :2]
        fwd = t05_planner.plan(kp, spacing=2.0)[:, :2]
        rev = t05_planner.plan(kp[::-1], spacing=2.0)[:, :2]
        d, _ = cKDTree(rev).query(fwd)
        core = d[5:-5] if len(d) > 12 else d
        seps.append(np.median(core))
        assert t05_planner._on_road(fwd, min_edge_m=0.5).mean() > 0.97
    # median separation approximately two lane-centers apart (>= 2.5 m)
    assert np.median(seps) > 2.5, f"opposing routes overlap: {seps}"


def _chain_town(n=24, spacing=2.0):
    """Minimal TownMap stand-in with a straight +x lane chain."""
    class _T:
        pass

    t = _T()
    t.lane_pts = jnp.asarray(
        np.stack([np.arange(n) * spacing, np.zeros(n)], axis=1), jnp.float32
    )
    t.lane_yaw = jnp.zeros((n,), jnp.float32)
    t.lane_next = jnp.asarray(np.r_[np.arange(1, n), n - 1], jnp.int32)
    t.lane_valid = jnp.ones((n,), bool)
    return t


def test_advance_wp_passes_abeam():
    """The pointer advances when the vehicle passes abeam of its target even
    if it never came within 2.5 m (displaced after a yield)."""
    from thinktwice_tpu.sim.traffic import _advance_wp

    t = _chain_town()
    # vehicle 4 m to the side of wp 3, slightly past it
    pos = jnp.asarray([[6.5, 4.0]], jnp.float32)
    wp = jnp.asarray([3], jnp.int32)
    wp2 = _advance_wp(t, wp, pos, jnp.zeros((1,)))
    assert int(wp2[0]) > 3


def test_advance_wp_orbit_breaker_relocks():
    """A pointer left far behind re-locks onto the closest nearby hop instead
    of making pure pursuit orbit a stale target (the Town05 junction
    collision mode: wp frozen 5+ s while the NPC circles into the ego)."""
    from thinktwice_tpu.sim.traffic import _advance_wp

    t = _chain_town()
    # vehicle beside hop 9; pointer stuck at 2 (14 m behind, within the
    # 12 m near-chain gate measured to the advanced hop 3)
    pos = jnp.asarray([[18.0, 2.6]], jnp.float32)
    wp = jnp.asarray([2], jnp.int32)
    for _ in range(4):
        wp = _advance_wp(t, wp, pos, jnp.zeros((1,)))
    d = float(jnp.linalg.norm(t.lane_pts[wp[0]] - pos[0]))
    assert d < 4.0, f"pointer did not re-lock: {d} m away"


def test_advance_wp_keeps_remote_loop_link():
    """A remote successor (route-loop link) is NOT walked past: the step's
    guarded teleport must land exactly on the loop target."""
    from thinktwice_tpu.sim.traffic import _advance_wp

    t = _chain_town()
    # vehicle at hop 0 whose successor chain is remote (pointer at far end)
    pos = jnp.asarray([[46.0, 0.0]], jnp.float32)   # at hop 23 (the tail)
    wp = jnp.asarray([23], jnp.int32)
    # retarget the tail's successor to hop 0 (loop link), vehicle at tail
    t.lane_next = t.lane_next.at[23].set(0)
    wp2 = _advance_wp(t, wp, pos, jnp.zeros((1,)))
    # advanced to the loop link (hop 0, 46 m away) and stays there
    assert int(wp2[0]) == 0
