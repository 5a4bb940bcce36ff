"""World reset: route -> initial WorldState.

Replaces the per-route setup ladder in
leaderboard_evaluator._load_and_run_scenario (leaderboard_evaluator.py:295-438)
+ RouteScenario._initialize_actors (route_scenario.py:473-508, which spawns
120-500 background vehicles) with one jittable function, so vmapped world
batches reset in-graph (fresh routes/rngs per world replace per-route process
teardown).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from thinktwice_tpu.config import Config
from thinktwice_tpu.maps.town import TownMap
from thinktwice_tpu.sim import weather as weather_lib
from thinktwice_tpu.sim.state import (
    EgoState,
    ScenarioState,
    TrafficState,
    WalkerState,
    WorldState,
    zero_criteria,
    zero_history,
    zero_scenarios,
)

VEHICLE_EXTENT = (2.45, 1.06)   # lincoln.mkz2017-class half-sizes
WALKER_EXTENT = (0.4, 0.4)


def route_cumlen(route: jax.Array) -> jax.Array:
    d = jnp.linalg.norm(jnp.diff(route[:, :2], axis=0), axis=-1)
    return jnp.concatenate([jnp.zeros((1,)), jnp.cumsum(d)])


def nearest_lane_idx(town: TownMap, xy: jax.Array) -> jax.Array:
    """(..., 2) -> (...,) index of nearest valid lane waypoint."""
    d = jnp.linalg.norm(
        town.lane_pts[None, :, :] - xy[..., None, :], axis=-1
    )
    d = jnp.where(town.lane_valid[None, :], d, 1e9)
    return jnp.argmin(d, axis=-1).astype(jnp.int32)


def reset_world(
    cfg: Config,
    town: TownMap,
    route: jax.Array,          # (R, 3) dense (x, y, yaw)
    rng: jax.Array,
    n_vehicles: int = 0,
    scenario: ScenarioState | None = None,
    weather: jax.Array | None = None,   # (10,) sim.weather params
) -> WorldState:
    sim = cfg.sim
    V, W = sim.max_vehicles, sim.max_walkers
    rng, rng_spawn = jax.random.split(rng)

    ego = EgoState(
        pos=route[0, :2],
        yaw=route[0, 2],
        speed=jnp.zeros(()),
        extent=jnp.asarray([sim.ego_extent_x, sim.ego_extent_y]),
        control=jnp.zeros((3,)),
    )

    # --- traffic spawn: random valid spawn points away from the ego --------
    d_ego = jnp.linalg.norm(town.spawn[:, :2] - ego.pos[None], axis=-1)
    score = (
        jax.random.uniform(rng_spawn, (town.spawn.shape[0],))
        + town.spawn_valid.astype(jnp.float32)
        + (d_ego > 15.0).astype(jnp.float32)
    )
    # valid & far spawns score in (2, 3); others lower — top_k picks them first
    _, pick = jax.lax.top_k(score, V)
    chosen = town.spawn[pick]                     # (V, 3)
    chosen_ok = town.spawn_valid[pick] & (d_ego[pick] > 15.0)
    slot_on = jnp.arange(V) < n_vehicles
    active = slot_on & chosen_ok

    traffic = TrafficState(
        pos=chosen[:, :2],
        yaw=chosen[:, 2],
        speed=jnp.zeros((V,)),
        extent=jnp.tile(jnp.asarray(VEHICLE_EXTENT)[None], (V, 1)),
        wp_idx=nearest_lane_idx(town, chosen[:, :2]),
        active=active,
        stop_s=jnp.zeros((V,)),
    )

    walkers = WalkerState(
        pos=jnp.full((W, 2), 1e6),
        yaw=jnp.zeros((W,)),
        speed=jnp.zeros((W,)),
        extent=jnp.tile(jnp.asarray(WALKER_EXTENT)[None], (W, 1)),
        active=jnp.zeros((W,), bool),
    )

    cum = route_cumlen(route)
    return WorldState(
        tick=jnp.zeros((), jnp.int32),
        ego=ego,
        traffic=traffic,
        walkers=walkers,
        route=route,
        route_cumlen=cum,
        route_len_m=cum[-1],
        criteria=zero_criteria(
            cfg,
            n_lights=town.tl_valid.shape[0],
            n_stops=town.stop_valid.shape[0],
        ),
        history=zero_history(cfg, n_lights=town.tl_valid.shape[0]),
        scenario=scenario if scenario is not None else zero_scenarios(cfg),
        rng=rng,
        weather=(
            jnp.asarray(weather, jnp.float32)
            if weather is not None
            else jnp.asarray(weather_lib.DEFAULT)
        ),
    )


def make_scenarios(
    cfg: Config,
    kinds: np.ndarray,          # (k,) int
    trigger_pos: np.ndarray,    # (k, 2)
    actor_idx: np.ndarray,      # (k,)
    params: np.ndarray,         # (k, 4)
) -> ScenarioState:
    """Host-side helper padding scenario specs into the fixed slots."""
    S = cfg.sim.max_scenarios
    base = zero_scenarios(cfg)
    k = len(kinds)
    assert k <= S
    return dataclasses.replace(
        base,
        kind=base.kind.at[:k].set(jnp.asarray(kinds, jnp.int32)),
        trigger_pos=base.trigger_pos.at[:k].set(jnp.asarray(trigger_pos, jnp.float32)),
        actor_idx=base.actor_idx.at[:k].set(jnp.asarray(actor_idx, jnp.int32)),
        param=base.param.at[:k].set(jnp.asarray(params, jnp.float32)),
    )
