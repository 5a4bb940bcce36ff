from thinktwice_tpu.sim.state import (
    EgoState,
    TrafficState,
    WalkerState,
    CriteriaState,
    HistoryState,
    WorldState,
    Events,
)
from thinktwice_tpu.sim.step import step_world, rollout
from thinktwice_tpu.sim.reset import reset_world

__all__ = [
    "EgoState",
    "TrafficState",
    "WalkerState",
    "CriteriaState",
    "HistoryState",
    "WorldState",
    "Events",
    "step_world",
    "rollout",
    "reset_world",
]
