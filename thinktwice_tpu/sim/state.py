"""WorldState: the entire simulated world as one fixed-shape pytree.

This replaces the reference's scattered mutable world: the CARLA server's actor
registry, CarlaDataProvider's per-tick caches
(scenario_runner/srunner/scenariomanager/carla_data_provider.py:32-831),
GameTime (timer.py:17-80), the py_trees blackboard, and the criteria objects'
internal counters (atomic_criteria.py). Every field is a fixed-capacity masked
array so `step_world` jits once and `vmap` batches worlds.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from thinktwice_tpu.config import Config


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EgoState:
    pos: jax.Array          # (2,) f32 world meters
    yaw: jax.Array          # () f32 rad
    speed: jax.Array        # () f32 m/s (forward scalar, bicycle model)
    extent: jax.Array       # (2,) f32 half-sizes
    control: jax.Array      # (3,) f32 last applied (steer, throttle, brake)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TrafficState:
    pos: jax.Array          # (V, 2)
    yaw: jax.Array          # (V,)
    speed: jax.Array        # (V,)
    extent: jax.Array       # (V, 2)
    wp_idx: jax.Array       # (V,) i32 current target index into town.lane_pts
    active: jax.Array       # (V,) bool
    stop_s: jax.Array       # (V,) f32 continuous seconds stationary; feeds the
                            # recycle rule (step_world) that stands in for
                            # CARLA TrafficManager's ability to keep global
                            # flow (deadlocked NPCs respawn on a far lane)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WalkerState:
    pos: jax.Array          # (W, 2)
    yaw: jax.Array          # (W,)
    speed: jax.Array        # (W,)
    extent: jax.Array       # (W, 2)
    active: jax.Array       # (W,) bool


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CriteriaState:
    """Infraction accumulators ≡ the reference's criteria node internals
    (atomic_criteria.py: CollisionTest, RouteCompletionTest, InRouteTest,
    OutsideRouteLanesTest, RunningRedLightTest, RunningStopTest,
    ActorSpeedAboveThresholdTest)."""

    # event counts
    n_collision_vehicle: jax.Array   # () i32
    n_collision_walker: jax.Array
    n_collision_static: jax.Array
    n_red_light: jax.Array
    n_stop_sign: jax.Array

    # latches to avoid double counting a single physical event
    collision_latch: jax.Array       # (3,) bool — [vehicle, walker, static], true
                                     # while ego still overlapping that category
    collision_cd: jax.Array          # (3,) f32 per-category refractory seconds —
                                     # CollisionTest dedups repeated hits on the
                                     # same object (atomic_criteria.py:
                                     # registered_collisions + distance gate);
                                     # a curb graze toggling the latch every few
                                     # ticks must not score dozens of events
    coll_pos: jax.Array              # (2,) f32 — ego position at the last
                                     # counted collision; CollisionTest ignores
                                     # new hits within MIN_AREA_OF_COLLISION
                                     # (3 m) of a registered location and only
                                     # forgets it once the ego moves
                                     # MAX_AREA_OF_COLLISION (5 m) away
                                     # (atomic_criteria.py:299-345,394-399) —
                                     # a stationary grind is ONE event
    coll_pos_valid: jax.Array        # () bool
    tl_latch: jax.Array              # (NL,) bool — light already scored this approach
    stop_in_zone: jax.Array          # (NS,) bool
    stop_has_stopped: jax.Array      # (NS,) bool

    # route progress
    route_idx: jax.Array             # () i32 furthest matched route waypoint
    route_completion: jax.Array      # () f32 in [0, 1]
    route_deviation: jax.Array       # () bool (InRouteTest fail)

    # outside-route-lanes accounting (meters driven off-lane vs total)
    dist_driven: jax.Array           # () f32
    dist_offlane: jax.Array          # () f32

    # blocked timer
    blocked_s: jax.Array             # () f32 continuous seconds below speed threshold
    blocked: jax.Array               # () bool terminal
    slow_s: jax.Array                # () f32 continuous seconds below 2 m/s —
                                     # the latch for the NPCs' courtesy yield:
                                     # unlike blocked_s it does NOT reset
                                     # while the ego creeps through a junction
                                     # wedge, so the yielded stream stays
                                     # yielded until the ego truly clears
                                     # (sim/traffic.py courtesy rule)

    timeout: jax.Array               # () bool terminal
    finished: jax.Array              # () bool route completed
    done: jax.Array                  # () bool any terminal condition
    ticks: jax.Array                 # () i32 criteria updates seen; freezes at
                                     # done (world freeze), so final value is
                                     # the route's real game duration in ticks


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HistoryState:
    """Ring buffers feeding the birdview rasterizer's history channels
    (chauffeurnet.py history_queue, maxlen 20, idx [-16,-11,-6,-1])."""

    veh_pose: jax.Array     # (Hh, V, 5)  x, y, yaw, ext_x, ext_y
    veh_active: jax.Array   # (Hh, V) bool
    wlk_pose: jax.Array     # (Hh, W, 5)
    wlk_active: jax.Array   # (Hh, W) bool
    tl_state: jax.Array     # (Hh, NL) i8
    ptr: jax.Array          # () i32 ring write pointer (next slot)
    count: jax.Array        # () i32 number of valid entries (saturates at Hh)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ScenarioState:
    """Adversarial scenario slots (≡ RouteScenario's triggered sub-scenarios,
    route_scenario.py:388-441 + ScenarioTriggerer). Each slot is a small state
    machine keyed by `kind`; actors it controls live in the shared traffic /
    walker arrays (indices in `actor_idx`)."""

    kind: jax.Array         # (S,) i32 scenario type id (0 = empty)
    trigger_pos: jax.Array  # (S, 2) f32
    state: jax.Array        # (S,) i32 0=armed, 1=running, 2=done
    timer: jax.Array        # (S,) f32 seconds in current state
    actor_idx: jax.Array    # (S,) i32 index of the controlled actor slot
    param: jax.Array        # (S, 4) f32 per-kind parameters


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WorldState:
    tick: jax.Array         # () i32
    ego: EgoState
    traffic: TrafficState
    walkers: WalkerState
    route: jax.Array        # (R, 3) dense route (x, y, yaw)
    route_cumlen: jax.Array  # (R,) f32 cumulative meters at each waypoint
    route_len_m: jax.Array  # () f32
    criteria: CriteriaState
    history: HistoryState
    scenario: ScenarioState
    rng: jax.Array          # PRNG key
    weather: jax.Array      # (10,) f32 CARLA WeatherParameters (sim.weather)

    @property
    def time_s(self) -> jax.Array:
        # GameTime equivalent (timer.py:17-80): ticks x fixed dt
        return self.tick.astype(jnp.float32) * 0.05


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Events:
    """Per-step event pulses (≈ TrafficEvents) for logging/scenario logic."""

    collision_vehicle: jax.Array  # () bool
    collision_walker: jax.Array
    collision_static: jax.Array
    red_light: jax.Array
    stop_sign: jax.Array
    route_complete: jax.Array


def zero_criteria(cfg: Config, n_lights: int | None = None, n_stops: int | None = None) -> CriteriaState:
    """Latch arrays are sized to the *town's* light/stop capacities (they are
    per-map tables), falling back to cfg capacities."""
    z32 = jnp.zeros((), jnp.int32)
    zf = jnp.zeros((), jnp.float32)
    zb = jnp.zeros((), bool)
    return CriteriaState(
        n_collision_vehicle=z32,
        n_collision_walker=z32,
        n_collision_static=z32,
        n_red_light=z32,
        n_stop_sign=z32,
        collision_latch=jnp.zeros((3,), bool),
        collision_cd=jnp.zeros((3,), jnp.float32),
        coll_pos=jnp.zeros((2,), jnp.float32),
        coll_pos_valid=zb,
        tl_latch=jnp.zeros((n_lights or cfg.sim.max_lights,), bool),
        stop_in_zone=jnp.zeros((n_stops or cfg.sim.max_stop_signs,), bool),
        stop_has_stopped=jnp.zeros((n_stops or cfg.sim.max_stop_signs,), bool),
        route_idx=z32,
        route_completion=zf,
        route_deviation=zb,
        dist_driven=zf,
        dist_offlane=zf,
        blocked_s=zf,
        blocked=zb,
        slow_s=zf,
        timeout=zb,
        finished=zb,
        done=zb,
        ticks=z32,
    )


def zero_history(cfg: Config, n_lights: int | None = None) -> HistoryState:
    Hh = cfg.birdview.history_len
    V, W = cfg.sim.max_vehicles, cfg.sim.max_walkers
    NL = n_lights or cfg.sim.max_lights
    return HistoryState(
        veh_pose=jnp.zeros((Hh, V, 5), jnp.float32),
        veh_active=jnp.zeros((Hh, V), bool),
        wlk_pose=jnp.zeros((Hh, W, 5), jnp.float32),
        wlk_active=jnp.zeros((Hh, W), bool),
        tl_state=jnp.full((Hh, NL), 2, jnp.int8),
        ptr=jnp.zeros((), jnp.int32),
        count=jnp.zeros((), jnp.int32),
    )


def zero_scenarios(cfg: Config) -> ScenarioState:
    S = cfg.sim.max_scenarios
    return ScenarioState(
        kind=jnp.zeros((S,), jnp.int32),
        trigger_pos=jnp.zeros((S, 2), jnp.float32),
        state=jnp.zeros((S,), jnp.int32),
        timer=jnp.zeros((S,), jnp.float32),
        actor_idx=jnp.zeros((S,), jnp.int32),
        param=jnp.zeros((S, 4), jnp.float32),
    )
