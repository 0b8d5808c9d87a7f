"""Functional counterparts of ``mbt_gym/gym/wrappers.py``.

The reference wraps stateful gym envs; here the same capabilities are
config/function transforms that stay inside the jitted program:

- :func:`reduce_observation` / :class:`ReducedObsPolicy` — train/act on a
  column subset (ReduceStateSizeWrapper, wrappers.py:10-43);
- env-level ``normalise_observation_space`` already covers
  ``NormaliseASObservation`` (wrappers.py:46-76); :func:`normalise_obs` is
  the standalone functional variant;
- :class:`TerminalRewardScaling` — rescale the terminal-step reward
  (RemoveTerminalRewards, wrappers.py:79-105).

For gym-API wrappers over the interop adapter see ``mbt_gym_tpu.gym_compat``.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mbt_gym_tpu.env import EnvConfig
from mbt_gym_tpu.types import INVENTORY_INDEX, TIME_INDEX

DEFAULT_REDUCED_INDICES = (INVENTORY_INDEX, TIME_INDEX)


def reduce_observation(obs: jax.Array, indices: Sequence[int] = DEFAULT_REDUCED_INDICES) -> jax.Array:
    return obs[:, jnp.asarray(tuple(indices))]


def reduced_obs_policy(policy, indices: Sequence[int] = DEFAULT_REDUCED_INDICES):
    """Adapt a policy trained on reduced observations to the full obs."""

    def wrapped(params, obs, state):
        return policy(params, reduce_observation(obs, indices), state)

    return wrapped


def reduced_observation_bounds(
    cfg: EnvConfig, indices: Sequence[int] = DEFAULT_REDUCED_INDICES
) -> Tuple[np.ndarray, np.ndarray]:
    low, high = cfg.observation_bounds()
    idx = list(indices)
    return low[idx], high[idx]


def normalise_obs(cfg: EnvConfig, obs: jax.Array, inverse: bool = False) -> jax.Array:
    """Standalone linear map of the observation space to [-1, 1]
    (NormaliseASObservation, wrappers.py:46-76)."""
    low, high = cfg.observation_bounds()
    gradient = (high - low) / 2
    if inverse:
        return (obs + 1.0) * gradient + low
    return (obs - low) / gradient - 1.0


@dataclasses.dataclass(frozen=True)
class TerminalRewardScaling:
    """Rescale the reward at the terminal step by ``scale`` — the
    generalisation of RemoveTerminalRewards' ``phi/alpha`` rescaling
    (wrappers.py:96-105)."""

    base: object
    scale: float

    def calculate(self, current, action, next, is_terminal, aux):
        reward = self.base.calculate(current, action, next, is_terminal, aux)
        terminal = jnp.asarray(is_terminal, dtype=reward.dtype)
        return reward * (1.0 + terminal * (self.scale - 1.0))
