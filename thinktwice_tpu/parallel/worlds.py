"""World-parallel rollouts: vmap within a chip, shard_map across the mesh.

This is the scale axis of the rebuild (SURVEY §2.10): the reference evaluates
one world per (CARLA server + agent) process pair per GPU, parallelized by
hand-managed ports (docs/DATA_PREP.md:8-18). Here a batch of worlds is a
leading axis on the WorldState pytree: `vmap(step_world)` batches within a
chip and `shard_map` over a 1-axis mesh spreads world groups across chips —
collectives only at metric-aggregation time.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from thinktwice_tpu.config import Config
from thinktwice_tpu.maps.town import TownMap
from thinktwice_tpu.sim.reset import reset_world
from thinktwice_tpu.sim.step import step_world


def make_world_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(devices, axis_names=("worlds",))


def batched_reset(cfg: Config, town: TownMap, routes, rngs, n_vehicles: int = 0):
    """routes (W, R, 3); rngs (W,) keys -> stacked WorldState."""
    return jax.vmap(
        lambda r, k: reset_world(cfg, town, r, k, n_vehicles=n_vehicles)
    )(routes, rngs)


def batched_rollout(
    cfg: Config,
    town: TownMap,
    states,
    policy_fn,
    n_steps: int,
    mesh: Mesh | None = None,
):
    """Roll W worlds for n_steps with an in-graph policy.

    policy_fn(cfg, town, state) -> (3,) control, applied per world via vmap.
    With a mesh, world batches are sharded over the `worlds` axis and each
    device scans its shard locally (no cross-device traffic inside the loop).
    Returns the final stacked WorldState; aggregate event counts from it
    with summarize_events().
    """

    def body(carry, _):
        st = carry
        ctrl = jax.vmap(lambda s: policy_fn(cfg, town, s))(st)
        st2, ev = jax.vmap(lambda s, c: step_world(cfg, town, s, c))(st, ctrl)
        return st2, None

    def run(states_shard):
        final, _ = jax.lax.scan(body, states_shard, None, length=n_steps)
        return final

    if mesh is None:
        return jax.jit(run)(states)

    sharding = NamedSharding(mesh, P("worlds"))
    states = jax.tree.map(lambda x: jax.device_put(x, sharding), states)
    # the per-world scan is embarrassingly parallel: jit with sharded inputs
    # lets XLA partition it over the mesh without any collectives
    return jax.jit(run, out_shardings=jax.tree.map(lambda _: sharding, states))(
        states
    )


def summarize_events(final_states) -> dict:
    """Host-side aggregation of per-world criteria into scalar counts."""
    crit = final_states.criteria
    return {
        "worlds": int(crit.route_completion.shape[0]),
        "mean_completion": float(jnp.mean(crit.route_completion)),
        "finished": int(jnp.sum(crit.finished)),
        "blocked": int(jnp.sum(crit.blocked)),
        "collisions_vehicle": int(jnp.sum(crit.n_collision_vehicle)),
        "collisions_walker": int(jnp.sum(crit.n_collision_walker)),
        "red_lights": int(jnp.sum(crit.n_red_light)),
    }
