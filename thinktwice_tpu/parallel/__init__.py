from thinktwice_tpu.parallel.worlds import (
    batched_reset,
    batched_rollout,
    make_world_mesh,
)

__all__ = ["batched_reset", "batched_rollout", "make_world_mesh"]
