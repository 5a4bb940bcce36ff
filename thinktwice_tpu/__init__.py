"""thinktwice_tpu — a TPU-native end-to-end autonomous-driving framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
OpenDriveLab/ThinkTwice (CVPR 2023 "Think Twice before Driving"):

- an in-graph closed-loop world (ego + traffic dynamics, scenario triggers,
  infraction criteria) replacing the CARLA server + leaderboard driver
  (reference: leaderboard/leaderboard/leaderboard_evaluator.py,
  scenario_runner/srunner/scenariomanager/),
- Pallas/XLA sensor models (privileged BEV raster, multi-camera raster,
  lidar ray-cast) replacing UE4 sensor actors,
- a Roach-style privileged expert and the ThinkTwice camera+lidar->BEV
  encoder with cascaded look-and-predict decoder as flax modules,
- pjit/shard_map batched rollouts over a device mesh replacing
  one-world-per-GPU-process evaluation.

Everything under `jit` is pure-functional: the world is a pytree, the step is
`(state, action, rng) -> state`, and rollouts are `lax.scan`.
"""

__version__ = "0.1.0"
