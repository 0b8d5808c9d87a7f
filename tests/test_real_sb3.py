"""REAL Stable-Baselines3 against the adapters (VERDICT r2 items 1/3).

SB3 is not installable in this container (no network), so these tests
``importorskip`` — CI installs ``stable_baselines3`` + ``torch`` in a
dedicated job (.github/workflows/ci.yml, "sb3" job) and runs them for real.
Counterpart of the reference's actual training stack:
``StableBaselinesTradingEnvironment`` driven by SB3 PPO
(/root/reference/mbt_gym/gym/StableBaselinesTradingEnvironment.py:11-66,
experiments/helpers.py:68-96), including the reduced-observation workflow
(``wrap_env`` = ReduceStateSizeWrapper -> SB3, experiments/helpers.py:63-65).
"""
import dataclasses

import numpy as np
import pytest

sb3 = pytest.importorskip("stable_baselines3")

import jax  # noqa: E402

from mbt_gym_tpu.gym_compat import VecTradingEnv  # noqa: E402
from mbt_gym_tpu.types import INVENTORY_INDEX, TIME_INDEX  # noqa: E402
from mbt_gym_tpu.utils.config import as_env_config  # noqa: E402


def _cfg(n_envs=16, n_steps=20):
    return dataclasses.replace(
        as_env_config(num_trajectories=n_envs, n_steps=n_steps),
        normalise_observation_space=True, normalise_action_space=True,
    )


def test_real_sb3_ppo_learns_through_adapter():
    """PPO("MlpPolicy", VecTradingEnv).learn(...) — actual SB3 exercising
    step_async/step_wait, autoreset infos and the VecEnv surface."""
    venv = VecTradingEnv(_cfg(), seed=0)
    from stable_baselines3.common.vec_env import VecEnv

    assert isinstance(venv, VecEnv)  # virtual-subclass registration
    model = sb3.PPO(
        "MlpPolicy", venv, n_steps=32, batch_size=128, n_epochs=2,
        policy_kwargs={"net_arch": [32, 32]}, verbose=0, seed=1,
    )
    model.learn(total_timesteps=2048)
    assert model.num_timesteps >= 2048


def test_real_sb3_predict_through_rollout():
    """A trained SB3 model drives the jitted on-device rollout via
    ``sb3_policy`` (SbAgent.get_action counterpart, SbAgent.py:19-23)."""
    from mbt_gym_tpu.agents.external import sb3_policy
    from mbt_gym_tpu.rollout import jit_rollout

    cfg = _cfg(n_envs=8, n_steps=10)
    venv = VecTradingEnv(cfg, seed=0)
    model = sb3.PPO(
        "MlpPolicy", venv, n_steps=16, batch_size=64, n_epochs=1,
        policy_kwargs={"net_arch": [16]}, verbose=0, seed=1,
    )
    model.learn(total_timesteps=256)
    policy = sb3_policy(model)
    res = jit_rollout(cfg, policy, None, jax.random.PRNGKey(3))
    rewards = np.asarray(res.trajectory.rewards)
    assert rewards.shape[0] == cfg.n_steps and np.isfinite(rewards).all()


def test_real_sb3_reduced_observation_training():
    """The reference's actual RL workflow trains on [INVENTORY, TIME] only
    (experiments/helpers.py:63-65); ``observation_indices`` reproduces it
    without an external wrapper."""
    venv = VecTradingEnv(
        _cfg(), seed=0, observation_indices=(INVENTORY_INDEX, TIME_INDEX)
    )
    assert venv.observation_space.shape == (2,)
    model = sb3.PPO(
        "MlpPolicy", venv, n_steps=32, batch_size=128, n_epochs=2,
        policy_kwargs={"net_arch": [16, 16]}, verbose=0, seed=1,
    )
    model.learn(total_timesteps=1024)
    obs = venv.reset()
    action, _ = model.predict(obs, deterministic=True)
    assert action.shape == (venv.num_envs, venv.action_space.shape[0])
