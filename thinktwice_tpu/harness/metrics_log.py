"""Rollout recorder + metrics log (SURVEY §2.1 S8, srunner/metrics).

The reference's metrics framework replays a CARLA binary recorder log and
exposes per-frame queries for user metrics
(scenario_runner/srunner/metrics/tools/metrics_log.py: get_actor_transform,
get_actor_velocity, get_ego_vehicle_id, get_elapsed_time, ...;
examples/distance_between_vehicles.py). TPU re-design: the world is a pytree
of arrays, so "recording" is literally stacking downsampled WorldState
snapshots — `record_rollout` scans the sim with a tap every `every` ticks
and returns dense (F, ...) arrays; `MetricsLog` gives the reference's query
surface over them; metric functions are plain numpy over the frame axis
(vectorized — no per-frame Python loop needed, but the per-frame getters
exist for parity).  Saved as one .npz per rollout (`save`/`load`)."""

from __future__ import annotations

import numpy as np


def record_rollout(cfg, town, state, policy_fn, n_steps: int,
                   every: int = 4):
    """Roll ONE world `n_steps` ticks, snapshotting every `every` ticks.

    Returns (final_state, frames dict of (F, ...) arrays). The scan carries
    the world; the tap stacks ego pose/speed/control, all traffic poses,
    walker poses and the criteria counters — the same quantities the CARLA
    recorder keeps per frame."""
    import jax
    import jax.numpy as jnp

    from thinktwice_tpu.sim.step import step_world

    def body(st, _):
        ctrl = policy_fn(cfg, town, st)
        st2, _ = step_world(cfg, town, st, ctrl)
        return st2, st2

    def chunk(st, _):
        st2, traj = jax.lax.scan(body, st, None, length=every)
        last = jax.tree.map(lambda x: x[-1], traj)
        tap = dict(
            tick=last.tick,
            time_s=last.time_s,
            ego_pos=last.ego.pos, ego_yaw=last.ego.yaw,
            ego_speed=last.ego.speed, ego_control=last.ego.control,
            traffic_pos=last.traffic.pos, traffic_yaw=last.traffic.yaw,
            traffic_speed=last.traffic.speed,
            traffic_active=last.traffic.active,
            walker_pos=last.walkers.pos, walker_active=last.walkers.active,
            route_completion=last.criteria.route_completion,
            n_collision_vehicle=last.criteria.n_collision_vehicle,
            n_collision_static=last.criteria.n_collision_static,
            n_red_light=last.criteria.n_red_light,
            blocked_s=last.criteria.blocked_s,
            done=last.criteria.done,
        )
        return st2, tap

    @jax.jit
    def run(st):
        return jax.lax.scan(chunk, st, None, length=n_steps // every)

    final, frames = run(state)
    return final, {k: np.asarray(v) for k, v in frames.items()}


def save(path: str, frames: dict) -> None:
    np.savez_compressed(path, **frames)


def load(path: str) -> dict:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


class MetricsLog:
    """Frame-query surface over a recorded rollout (metrics_log.py parity).

    Actor ids: 0 = ego, 1..V = traffic slots, V+1.. = walker slots."""

    def __init__(self, frames: dict):
        self.f = frames
        self.V = frames["traffic_pos"].shape[1]
        self.W = frames["walker_pos"].shape[1]

    # --- frame bookkeeping (get_total_frame_count / get_elapsed_time) ----
    def get_total_frame_count(self) -> int:
        return len(self.f["tick"])

    def get_elapsed_time(self, frame: int) -> float:
        return float(self.f["time_s"][frame])

    def get_ego_vehicle_id(self) -> int:
        return 0

    def get_actor_ids_with_type_id(self, kind: str):
        if kind.startswith("vehicle"):
            return list(range(1, self.V + 1))
        if kind.startswith("walker"):
            return list(range(self.V + 1, self.V + 1 + self.W))
        return [0]

    def get_actor_alive_frames(self, actor_id: int):
        """(first, last) frame the actor is active (slot-recycled actors
        count alive while their slot is active)."""
        act = self._active_series(actor_id)
        idx = np.nonzero(act)[0]
        if len(idx) == 0:
            return None, None
        return int(idx[0]), int(idx[-1])

    # --- per-frame state (get_actor_transform / get_actor_velocity) ------
    def _active_series(self, actor_id: int):
        if actor_id == 0:
            return np.ones(self.get_total_frame_count(), bool)
        if actor_id <= self.V:
            return self.f["traffic_active"][:, actor_id - 1]
        return self.f["walker_active"][:, actor_id - self.V - 1]

    def get_actor_transform(self, actor_id: int, frame: int):
        """-> (pos (2,), yaw) like carla.Transform(location, rotation)."""
        if actor_id == 0:
            return self.f["ego_pos"][frame], float(self.f["ego_yaw"][frame])
        if actor_id <= self.V:
            i = actor_id - 1
            return (self.f["traffic_pos"][frame, i],
                    float(self.f["traffic_yaw"][frame, i]))
        i = actor_id - self.V - 1
        return self.f["walker_pos"][frame, i], 0.0

    def get_all_actor_transforms(self, actor_id: int):
        if actor_id == 0:
            return self.f["ego_pos"], self.f["ego_yaw"]
        if actor_id <= self.V:
            i = actor_id - 1
            return self.f["traffic_pos"][:, i], self.f["traffic_yaw"][:, i]
        i = actor_id - self.V - 1
        return self.f["walker_pos"][:, i], np.zeros(len(self.f["tick"]))

    def get_actor_velocity(self, actor_id: int, frame: int) -> float:
        if actor_id == 0:
            return float(self.f["ego_speed"][frame])
        if actor_id <= self.V:
            return float(self.f["traffic_speed"][frame, actor_id - 1])
        return 0.0

    # --- criteria series (criteria_filter.py example) --------------------
    def get_criterion_series(self, name: str):
        return self.f[name]


# --- example metrics (srunner/metrics/examples ports, vectorized) --------

def distance_between(log: MetricsLog, id_a: int, id_b: int) -> np.ndarray:
    """Per-frame distance between two actors
    (examples/distance_between_vehicles.py)."""
    pa, _ = log.get_all_actor_transforms(id_a)
    pb, _ = log.get_all_actor_transforms(id_b)
    return np.linalg.norm(pa - pb, axis=-1)


def distance_to_route(log: MetricsLog, route_xy: np.ndarray) -> np.ndarray:
    """Per-frame ego cross-track distance to the dense route
    (examples/distance_to_lane_center.py analog — lane center := route)."""
    ego, _ = log.get_all_actor_transforms(0)
    d = np.linalg.norm(ego[:, None, :] - route_xy[None, :, :], axis=-1)
    return d.min(axis=1)
