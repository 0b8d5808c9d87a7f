"""Offline reward-normalisation utility.

The reference computes a reward scaling inside ``TradingEnvironment.__init__``
by deep-copying the env and simulating 100k inventory-neutral trajectories
with the fixed risk-neutral action ``1/fill_exponent``
(TradingEnvironment.py:90-94,329-343) — a hidden multi-second side effect of
construction.  Here it is an explicit utility: compute once, then pass the
result as ``EnvConfig.reward_scaling``.
"""
from __future__ import annotations

import dataclasses

import jax

from mbt_gym_tpu.agents.baseline import fixed_action_policy
from mbt_gym_tpu.dynamics import LimitOrderDynamics
from mbt_gym_tpu.env import EnvConfig
from mbt_gym_tpu.processes.arrivals import PoissonArrivals
from mbt_gym_tpu.processes.fills import ExponentialFill
from mbt_gym_tpu.rollout import jit_rollout


def compute_inventory_neutral_reward_scaling(
    cfg: EnvConfig, key: jax.Array, num_total_trajectories: int = 100_000
) -> float:
    """scaling = 1 / (mean per-step reward * n_steps) under the fixed
    risk-neutral quote, from a fresh full-horizon simulation."""
    dynamics = cfg.dynamics
    assert isinstance(dynamics, LimitOrderDynamics) and isinstance(
        dynamics.arrival_model, PoissonArrivals
    ) and isinstance(dynamics.fill_probability_model, ExponentialFill), (
        "Arrival model must be Poisson and fill probability model must be "
        "exponential to scale rewards"  # TradingEnvironment.py:91-94
    )
    fixed_action = 1.0 / dynamics.fill_probability_model.fill_exponent
    sim_cfg = dataclasses.replace(
        cfg,
        start_time=0.0,
        num_trajectories=num_total_trajectories,
        reward_scaling=None,
        normalise_action_space=False,
    )
    policy = fixed_action_policy([fixed_action, fixed_action])
    res = jit_rollout(sim_cfg, policy, None, key)
    mean_episode_reward = float(res.trajectory.rewards.mean()) * cfg.n_steps
    return 1.0 / mean_episode_reward


def with_normalised_rewards(
    cfg: EnvConfig, key: jax.Array, num_total_trajectories: int = 100_000
) -> EnvConfig:
    """One-call counterpart of the reference's ``normalise_rewards=True``
    constructor flag (TradingEnvironment.py:90-94): returns a config whose
    ``reward_scaling`` was computed from a fresh inventory-neutral
    simulation — the construction-time side effect made explicit."""
    scaling = compute_inventory_neutral_reward_scaling(cfg, key, num_total_trajectories)
    return dataclasses.replace(cfg, reward_scaling=scaling)
