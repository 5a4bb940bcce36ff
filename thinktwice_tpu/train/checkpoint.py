"""Checkpoint / resume via orbax.

Covers the reference's checkpoint surface (SURVEY §5.4):
- training: per-interval param+opt-state snapshots with resume
  (mmcv checkpoint_config interval=1; train.py --resume-from),
- eval/collect: the route-progress ledger lives in the results JSON
  (harness.statistics.resume_done_indices),
- rollout state: the full (rng, world_state, route index) pytree can be
  saved/restored for mid-run resume — cheap because WorldState is already a
  pytree of arrays.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp

from thinktwice_tpu.train.train_step import TrainState


def _manager(ckpt_dir: str, max_to_keep: int = 5) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
    )


def save_train_state(ckpt_dir: str, state: TrainState, step: int | None = None):
    mgr = _manager(ckpt_dir)
    step = int(state.step) if step is None else step
    mgr.save(step, args=ocp.args.StandardSave(
        {"step": state.step, "params": state.params, "opt_state": state.opt_state}
    ))
    mgr.wait_until_finished()
    mgr.close()


def restore_train_state(ckpt_dir: str, template: TrainState) -> TrainState:
    """Restore the latest snapshot into the shape of `template`."""
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    if step is None:
        mgr.close()
        raise FileNotFoundError(f"no checkpoint in {ckpt_dir}")
    restored = mgr.restore(
        step,
        args=ocp.args.StandardRestore(
            {"step": template.step, "params": template.params,
             "opt_state": template.opt_state}
        ),
    )
    mgr.close()
    return TrainState(
        step=restored["step"],
        params=restored["params"],
        opt_state=restored["opt_state"],
    )


def archive_params(path: str, params: Any, cast_floats=None):
    """Single-file params-only snapshot (flax msgpack), small enough to
    commit to git.

    Orbax run checkpoints are gitignored (they carry optimizer state and
    multiple steps), so they do not survive a fresh clone — round 3 lost
    the trained roach_bc3/bc4 experts and the evaluated student that way.
    Flagship weights get archived through here and the .msgpack committed
    alongside the run's metrics.

    By default (`cast_floats=None`) every leaf keeps its stored dtype, so
    the archive reproduces the evaluated weights bit-exactly (flax modules
    with `dtype=bfloat16` compute in bf16 but still *store* f32 params;
    casting those to bf16 — the old default — was lossy for every module
    that computes in f32, e.g. the decoder heads). Pass an explicit dtype
    (e.g. jnp.bfloat16) only when a smaller, knowingly-lossy archive is
    wanted. Float detection covers extension dtypes (ml_dtypes bfloat16),
    which `np.issubdtype` alone misses.
    """
    import jax.numpy as jnp
    import numpy as np
    from flax import serialization

    def cast(x):
        x = np.asarray(x)
        if cast_floats is not None and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(cast_floats)
        return x

    data = serialization.to_bytes(jax.tree.map(cast, params))
    # atomic replace: a watchdog/queue may kill the trainer at any moment,
    # and a truncated msgpack would silently poison the next eval's weights
    path = os.path.abspath(path)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def restore_archive(path: str, template: Any) -> Any:
    """Load an archive_params file into the dtypes/structure of template."""
    import numpy as np
    from flax import serialization

    with open(os.path.abspath(path), "rb") as f:
        restored = serialization.from_bytes(template, f.read())
    return jax.tree.map(
        lambda r, t: np.asarray(r).astype(np.asarray(t).dtype), restored,
        template)


def save_pytree(path: str, tree: Any):
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()


def restore_pytree(path: str, template: Any) -> Any:
    if path.endswith(".msgpack"):       # archive_params single-file snapshot
        return restore_archive(path, template)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)
