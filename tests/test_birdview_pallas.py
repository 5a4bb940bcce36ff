"""Pallas birdview kernel vs the XLA renderer (interpret mode on CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from thinktwice_tpu.ops.birdview_pallas import render_birdview_pallas
from thinktwice_tpu.sensors.birdview import render_birdview
from thinktwice_tpu.sim.reset import reset_world
from thinktwice_tpu.sim.step import step_world

JIT_STEP = jax.jit(step_world, static_argnums=0)


def rich_state(small_cfg, town):
    """A state with traffic, a walker, light history, near a junction."""
    xs = np.linspace(74.0, 194.0, 256)
    route = jnp.asarray(
        np.stack([xs, np.full_like(xs, 98.25), np.zeros_like(xs)], 1), jnp.float32
    )
    st = reset_world(small_cfg, town, route, jax.random.key(0), n_vehicles=8)
    wk = st.walkers
    wk = dataclasses.replace(
        wk,
        pos=wk.pos.at[0].set(jnp.asarray([85.0, 95.0])),
        active=wk.active.at[0].set(True),
    )
    st = dataclasses.replace(st, walkers=wk)
    for _ in range(6):
        st, _ = JIT_STEP(small_cfg, town, st, jnp.asarray([0.0, 0.5, 0.0]))
    return st


def test_pallas_birdview_matches_xla(small_cfg, town):
    st = rich_state(small_cfg, town)
    cfg = small_cfg.birdview
    idx = st.criteria.route_idx
    win = jnp.clip(idx + jnp.arange(cfg.n_route_points), 0, st.route.shape[0] - 1)
    route_window = st.route[win, :2]

    ref = np.asarray(
        render_birdview(cfg, town, st.ego.pos, st.ego.yaw, st.history, route_window)
    )
    pal = np.asarray(
        render_birdview_pallas(
            cfg, town, st.ego.pos, st.ego.yaw, st.history, route_window,
            interpret=True,
        )
    )
    assert pal.shape == ref.shape
    # every channel identical (both are analytic coverage of the same
    # primitives; only float rounding at boundaries can differ)
    mismatch = np.abs(pal - ref) > 1e-6
    frac = mismatch.mean()
    assert frac < 2e-3, (frac, np.argwhere(mismatch.any(axis=(1, 2))))
    # content sanity: road, route, vehicles, lights all present
    assert pal[0].sum() > 100
    assert pal[1].sum() > 100
    assert pal[3:7].sum() > 0
    assert pal[11:].sum() > 0
