"""mbt_gym_tpu — a TPU-native, JAX/XLA-first rebuild of the capabilities of
JJJerome/mbt_gym: model-based limit-order-book trading environments
(market making and optimal execution) as fused, jittable, shardable pure
functions stepping tens of thousands of Monte-Carlo trajectories in lockstep.
"""

from mbt_gym_tpu.types import (
    ASK_INDEX,
    ASSET_PRICE_INDEX,
    BID_INDEX,
    CASH_INDEX,
    EnvState,
    INVENTORY_INDEX,
    SlotNoise,
    StepNoise,
    StepResult,
    TIME_INDEX,
    Trajectory,
)
from mbt_gym_tpu.dispatch import DispatchDecision, dispatch_report
from mbt_gym_tpu.env import EnvConfig, default_dynamics, reset, step, observe
from mbt_gym_tpu.rollout import RolloutResult, episode_stats, jit_rollout, mc_episode_stats, rollout

__version__ = "0.1.0"

__all__ = [
    "ASK_INDEX",
    "ASSET_PRICE_INDEX",
    "BID_INDEX",
    "CASH_INDEX",
    "DispatchDecision",
    "dispatch_report",
    "EnvConfig",
    "EnvState",
    "INVENTORY_INDEX",
    "RolloutResult",
    "SlotNoise",
    "StepNoise",
    "StepResult",
    "TIME_INDEX",
    "Trajectory",
    "default_dynamics",
    "episode_stats",
    "jit_rollout",
    "mc_episode_stats",
    "observe",
    "reset",
    "rollout",
    "step",
]
