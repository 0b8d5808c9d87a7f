"""Gym-API interop (counterparts of ``TradingEnvironment(gym.Env)`` and
``StableBaselinesTradingEnvironment``).

The TPU engine's native interface is pure functions; these adapters wrap it
in the stateful APIs external RL stacks expect:

- :class:`GymTradingEnv` — a gymnasium ``Env`` stepping all N trajectories
  per call with batched arrays, exactly like the reference's batched
  ``TradingEnvironment`` (its observation/action spaces describe one
  trajectory; arrays carry a leading N axis).
- :class:`VecTradingEnv` — Stable-Baselines3 ``VecEnv``-shaped adapter
  (step_async/step_wait/reset, terminal-observation autoreset convention,
  StableBaselinesTradingEnvironment.py:25-37).  Duck-typed so it works
  without SB3 installed; if SB3 is importable it is registered as a virtual
  subclass of ``stable_baselines3.common.vec_env.VecEnv``.

Each adapter holds a jitted step closure: per-call overhead is one dispatch,
not a Python re-trace.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import numpy as np

from mbt_gym_tpu import env as env_lib
from mbt_gym_tpu.dynamics import AtTheTouchDynamics
from mbt_gym_tpu.env import EnvConfig

try:  # pragma: no cover - import guard
    import gymnasium

    _GYM_BASE = gymnasium.Env
except Exception:  # pragma: no cover
    gymnasium = None
    _GYM_BASE = object


@partial(jax.jit, static_argnums=(0,))
def _jit_step(cfg, state, action):
    return env_lib.step(cfg, state, action)


@partial(jax.jit, static_argnums=(0,))
def _jit_reset(cfg, key):
    return env_lib.reset(cfg, key)


def _build_spaces(cfg: EnvConfig):
    """(observation_space, action_space) for one trajectory (gymnasium)."""
    assert gymnasium is not None, "gymnasium is required for gym-API spaces"
    obs_low, obs_high = cfg.observation_bounds()
    if cfg.normalise_observation_space:
        obs_low, obs_high = -np.ones_like(obs_low), np.ones_like(obs_high)
    observation_space = gymnasium.spaces.Box(
        low=obs_low.astype(np.float32), high=obs_high.astype(np.float32)
    )
    if isinstance(cfg.dynamics, AtTheTouchDynamics):
        action_space = gymnasium.spaces.MultiBinary(2)  # ModelDynamics.py:166-167
    else:
        act_low, act_high = cfg.action_bounds()
        if cfg.normalise_action_space:
            act_low, act_high = -np.ones_like(act_low), np.ones_like(act_high)
        action_space = gymnasium.spaces.Box(
            low=act_low.astype(np.float32), high=act_high.astype(np.float32)
        )
    return observation_space, action_space


class GymTradingEnv(_GYM_BASE):
    """Batched gymnasium adapter over the pure-functional engine."""

    metadata = {"render_modes": ["human"]}

    def __init__(self, cfg: EnvConfig, seed: Optional[int] = None):
        assert gymnasium is not None, "gymnasium is required for GymTradingEnv"
        self.cfg = cfg
        self._key = jax.random.PRNGKey(0 if seed is None else seed)
        self._state = None
        self.observation_space, self.action_space = _build_spaces(cfg)

    @property
    def num_trajectories(self) -> int:
        return self.cfg.num_trajectories

    @property
    def n_steps(self) -> int:
        return self.cfg.n_steps

    def seed(self, seed: Optional[int] = None):
        self._key = jax.random.PRNGKey(0 if seed is None else seed)

    def reset(self, *, seed: Optional[int] = None, options=None):
        if seed is not None:
            self.seed(seed)
        self._key, reset_key = jax.random.split(self._key)
        self._state, obs = _jit_reset(self.cfg, reset_key)
        return np.asarray(obs), {}

    def step(self, action):
        action = np.asarray(action, dtype=self.cfg.dtype).reshape(
            self.cfg.num_trajectories, self.cfg.action_dim
        )
        res = _jit_step(self.cfg, self._state, action)
        self._state = res.state
        terminated = np.asarray(res.done)
        truncated = np.zeros_like(terminated)
        return np.asarray(res.obs), np.asarray(res.reward), terminated, truncated, {}


class VecTradingEnv:
    """SB3 ``VecEnv``-shaped adapter with the terminal-observation autoreset
    convention (StableBaselinesTradingEnvironment.py:28-37)."""

    def __init__(self, cfg: EnvConfig, seed: Optional[int] = None,
                 store_terminal_observation_info: bool = True):
        self.cfg = cfg
        self.num_envs = cfg.num_trajectories
        self.store_terminal_observation_info = store_terminal_observation_info
        self._key = jax.random.PRNGKey(0 if seed is None else seed)
        self._state = None
        self._actions = None
        # SB3's BaseAlgorithm reads these before training starts.
        if gymnasium is not None:
            self.observation_space, self.action_space = _build_spaces(cfg)
        self.render_mode = None

    def reset(self):
        self._key, reset_key = jax.random.split(self._key)
        self._state, obs = _jit_reset(self.cfg, reset_key)
        return np.asarray(obs)

    def step_async(self, actions) -> None:
        self._actions = actions

    def step_wait(self):
        res = _jit_step(
            self.cfg,
            self._state,
            np.asarray(self._actions, dtype=self.cfg.dtype).reshape(
                self.num_envs, self.cfg.action_dim
            ),
        )
        self._state = res.state
        obs = np.asarray(res.obs)
        rewards = np.asarray(res.reward)
        dones = np.asarray(res.done)
        infos = [{} for _ in range(self.num_envs)]
        if dones.min():
            if self.store_terminal_observation_info:
                for i in range(self.num_envs):
                    infos[i]["terminal_observation"] = obs[i, :]
            obs = self.reset()
        return obs, rewards, dones, infos

    def step(self, actions):
        self.step_async(actions)
        return self.step_wait()

    def seed(self, seed: Optional[int] = None):
        self._key = jax.random.PRNGKey(0 if seed is None else seed)

    def close(self) -> None:
        pass


try:  # pragma: no cover - optional SB3 registration
    from stable_baselines3.common.vec_env import VecEnv as _SB3VecEnv

    _SB3VecEnv.register(VecTradingEnv)  # type: ignore[attr-defined]
except Exception:
    pass
