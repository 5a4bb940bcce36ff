"""Single typed config tree for sim + sensors + model + training.

The reference spreads configuration over three systems (mmcv Python configs,
env-vars consumed at import time, OmegaConf YAML — see SURVEY.md §5.6). Here
one frozen-dataclass tree feeds everything; all fields are static at trace
time so jit sees fixed shapes.

Behavioral constants are taken from the reference (cited per-field) so the
rebuilt world matches the reference spec:
- sim tick:        leaderboard/leaderboard/leaderboard_evaluator.py:263-266
- bicycle model:   leaderboard/team_code/thinktwice_agent.py:96-102
- birdview raster: roach/config/config_agent.yaml:45-58
- scoring:         leaderboard/leaderboard/utils/statistics_manager.py:22-30
- BEV model grid:  open_loop_training/configs/thinktwice.py:132-136
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """World-step semantics."""

    dt: float = 0.05                # 20 Hz sync tick (leaderboard_evaluator.py:263-266)
    max_vehicles: int = 128         # fixed-capacity traffic slots (town05long spawns 120,
                                    # route_scenario.py:492-494; masked beyond n_active)
    max_walkers: int = 32
    max_lights: int = 64
    max_stop_signs: int = 32
    max_route_len: int = 1024       # dense interpolated route waypoints @ ~1 m
    max_scenarios: int = 32         # triggered adversarial scenario slots per route

    # Kinematic bicycle constants (World-on-Rails tuned; thinktwice_agent.py:96-102).
    front_wb: float = -0.090769015
    rear_wb: float = 1.4178275
    steer_gain: float = 0.36848336
    brake_accel: float = -4.952399
    throt_accel: float = 0.5633837
    drag: float = 0.02              # extra speed-proportional decel so top speed
                                    # saturates (~28 m/s); 0.0 = exact EgoModel

    # Traffic (NPC) policy constants — replaces CARLA TrafficManager defaults
    # (autopilot at ~70% of 30 km/h speed limit, keep-gap behavior).
    npc_cruise_speed: float = 6.0   # m/s
    npc_accel: float = 3.0          # m/s^2 (queue drain rate; 2.0 left the
                                    # fleet ~40% stopped town-wide on Town05)
    npc_decel: float = 6.0          # m/s^2
    npc_gap: float = 4.5            # m desired standstill front gap
    npc_time_headway: float = 1.2   # s
    npc_max_yaw_rate: float = 1.2   # rad/s
    npc_lookahead: float = 6.0      # m pure-pursuit lookahead
    tl_stop_distance: float = 24.0  # m start braking for red within this
    npc_recycle_s: float = 20.0     # NPC stationary this long -> respawn on a
                                    # free lane (outlasts any red phase; stands
                                    # in for TrafficManager's global flow —
                                    # without it queue deadlocks are permanent)
    courtesy_yield: bool = True     # NPCs hold short of a long-blocked ego's
                                    # route (liveness deviation from CARLA TM,
                                    # sim/traffic.py; False = reference-strict
                                    # dynamics for A/B measurement)

    # Route progress / failure semantics.
    blocked_speed: float = 0.1      # m/s  (route_scenario.py:579-583)
    blocked_time: float = 90.0      # s    (ActorSpeedAboveThresholdTest)
    timeout_per_meter: float = 0.8  # s/m  (route_scenario.py:52-54)
    timeout_base: float = 5.0       # s
    offroute_allowance: float = 30.0   # m  (InRouteTest WINDOWS_SIZE-ish deviation cap)
    offlane_allowed_dist: float = 1.3  # m  (OutsideRouteLanesTest ALLOWED_OUT_DISTANCE)

    # Default ego box half-extents (CARLA lincoln.mkz2017-class sedan).
    ego_extent_x: float = 2.45
    ego_extent_y: float = 1.06


@dataclasses.dataclass(frozen=True)
class BirdviewConfig:
    """Roach privileged BEV raster (roach/config/config_agent.yaml:45-58)."""

    width: int = 192                 # pixels, square
    pixels_ev_to_bottom: int = 40
    pixels_per_meter: float = 5.0
    history_idx: Tuple[int, ...] = (-16, -11, -6, -1)
    history_len: int = 16            # depth of the in-carry history ring
    scale_bbox: bool = True          # actor boxes scaled 1.0/2.0 with 0.8 m floor
                                     # (chauffeurnet.py:_get_surrounding_actors)
    route_thickness: float = 8.0     # px half-thickness ~ cv.polylines thickness=16
    stopline_thickness: float = 3.0  # px half-thickness ~ cv.line thickness=6
    n_route_points: int = 80         # route waypoints rasterized (chauffeurnet.py:133)

    @property
    def n_channels(self) -> int:
        # road, route, lane, 4x vehicles, 4x walkers, 4x (tl+stop)
        return 3 + 3 * len(self.history_idx)


@dataclasses.dataclass(frozen=True)
class CameraConfig:
    """Multi-camera raster: 4 cams, fov ~150, mirroring the reference rig
    (thinktwice_agent.py:231-293; training size configs/thinktwice.py)."""

    n_cams: int = 4
    height: int = 256
    width: int = 512
    fov_deg: float = 150.0
    # yaw of each camera relative to ego heading: front, left, right, back
    cam_yaws: Tuple[float, ...] = (0.0, -90.0, 90.0, 180.0)
    cam_height: float = 1.8          # mount height (m)
    max_depth: float = 60.0


@dataclasses.dataclass(frozen=True)
class LidarConfig:
    """Ray-cast lidar ~ CARLA 64-channel spec (agent_wrapper.py:170-181)."""

    n_beams: int = 64
    n_azimuth: int = 1024
    upper_fov: float = 10.0
    lower_fov: float = -30.0
    max_range: float = 85.0
    z_mount: float = 2.5


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """ThinkTwice encoder/decoder dims (open_loop_training/configs/thinktwice.py)."""

    bev_size: int = 21               # 21x21 BEV cells (configs/thinktwice.py:132-136)
    bev_x_min: float = -8.0
    bev_x_max: float = 30.4
    bev_y_min: float = -19.2
    bev_y_max: float = 19.2
    bev_channels: int = 256
    n_depth_bins: int = 80           # [1, 41) @ 0.5 m  (lss.py DepthNet)
    depth_min: float = 1.0
    depth_step: float = 0.5
    n_seg_classes: int = 12          # 9 CARLA classes + 3 TL colors
    pred_len: int = 4                # future waypoints/ctrl steps
    refine_num: int = 5              # cascaded decoder layers (thinktwice_decoder.py)
    measurement_dim: int = 128
    feature_dim: int = 256
    n_attn_heads: int = 8
    n_attn_points: int = 8
    n_attn_levels: int = 4
    n_z_anchors: int = 15            # z-levels for look-module 3D anchors
    img_height: int = 256
    img_width: int = 512
    lidar_pillar_grid: int = 336     # dense pillar grid edge (models/lidarnet)


@dataclasses.dataclass(frozen=True)
class RoachConfig:
    """Privileged expert (roach/models/ppo_policy.py, torch_layers.py)."""

    features_dim: int = 256
    states_neurons: Tuple[int, ...] = (256,)
    policy_head: Tuple[int, ...] = (256, 256)
    value_head: Tuple[int, ...] = (256, 256)
    action_dim: int = 2              # (acc, steer) Beta-distributed
    state_dim: int = 6               # throttle, steer, brake, gear, vel_x, vel_y
                                     # (roach/utils/rl_birdview_wrapper.py)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 1e-4                 # AdamW (configs/thinktwice.py:282-285)
    weight_decay: float = 0.01
    warmup_steps: int = 500
    total_steps: int = 60_000
    batch_size: int = 8              # per device (docs/TRAIN.md batch 8/GPU)
    grad_clip: float = 35.0          # mmcv optimizer_config grad_clip
    seed: int = 0
    grad_accum: int = 1              # microbatches per optimizer step: the
    # batch splits into grad_accum chunks scanned sequentially, bounding
    # activation HBM to one chunk (lax.scan serializes by construction —
    # robust to XLA scheduler regressions, unlike remat hints)


@dataclasses.dataclass(frozen=True)
class Config:
    sim: SimConfig = dataclasses.field(default_factory=SimConfig)
    birdview: BirdviewConfig = dataclasses.field(default_factory=BirdviewConfig)
    camera: CameraConfig = dataclasses.field(default_factory=CameraConfig)
    lidar: LidarConfig = dataclasses.field(default_factory=LidarConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    roach: RoachConfig = dataclasses.field(default_factory=RoachConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


# Benchmark presets (route_scenario.py:492-497, statistics_manager.py:27-30).
def town05_long_config() -> Config:
    return Config(sim=SimConfig(max_vehicles=128))


def longest6_config() -> Config:
    # 500 background vehicles; stop penalty waived in scoring (see harness.statistics).
    return Config(sim=SimConfig(max_vehicles=512))


DEFAULT = Config()
