"""Native ``gymnasium.vector.VectorEnv`` adapter — beyond-reference interop
for gymnasium-native RL stacks (the reference only ships an SB3 VecEnv
adapter).  Exercises the gymnasium >= 1.0 NEXT_STEP autoreset contract AND
a real third-party consumer (gymnasium's own vector wrappers)."""
import dataclasses

import numpy as np
import pytest

gymnasium = pytest.importorskip("gymnasium")

from mbt_gym_tpu.gym_compat import VectorTradingEnv  # noqa: E402
from mbt_gym_tpu.types import INVENTORY_INDEX, TIME_INDEX  # noqa: E402
from mbt_gym_tpu.utils.config import as_env_config  # noqa: E402


def _cfg(n_envs=8, n_steps=5):
    return dataclasses.replace(
        as_env_config(num_trajectories=n_envs, n_steps=n_steps),
        normalise_observation_space=True, normalise_action_space=True,
    )


def test_vector_env_contract_and_autoreset():
    from gymnasium.vector import AutoresetMode, VectorEnv

    cfg = _cfg()
    env = VectorTradingEnv(cfg, seed=0)
    assert isinstance(env, VectorEnv)
    assert env.metadata["autoreset_mode"] == AutoresetMode.NEXT_STEP
    assert env.single_observation_space.shape == (cfg.state_dim,)
    assert env.observation_space.shape == (8, cfg.state_dim)
    assert env.action_space.shape == (8, cfg.action_dim)

    obs, info = env.reset(seed=3)
    assert obs.shape == (8, cfg.state_dim) and info == {}
    action = np.zeros((8, cfg.action_dim), np.float32)
    for t in range(cfg.n_steps):
        obs, rew, term, trunc, _ = env.step(action)
        assert rew.shape == (8,) and not trunc.any()
    assert term.all()  # terminal step returns FINAL obs with terminations
    final_time = obs[:, TIME_INDEX].copy()
    # NEXT_STEP: the following step ignores actions and resets everything
    obs2, rew2, term2, trunc2, _ = env.step(action)
    assert not term2.any() and not trunc2.any() and (rew2 == 0).all()
    assert (obs2[:, TIME_INDEX] < final_time).all()  # time rewound by reset
    # and stepping continues normally afterwards
    obs3, _, term3, _, _ = env.step(action)
    assert not term3.any()
    env.close()


def test_vector_env_seed_reproducible_and_reduced_obs():
    cfg = _cfg()
    a = VectorTradingEnv(cfg)
    b = VectorTradingEnv(cfg)
    oa, _ = a.reset(seed=11)
    ob, _ = b.reset(seed=11)
    np.testing.assert_array_equal(oa, ob)

    red = VectorTradingEnv(
        cfg, seed=11, observation_indices=(INVENTORY_INDEX, TIME_INDEX)
    )
    assert red.single_observation_space.shape == (2,)
    obs, _ = red.reset(seed=11)
    np.testing.assert_array_equal(obs, oa[:, [1, 2]])


def test_vector_env_with_gymnasium_wrapper():
    """A real gymnasium consumer: RecordEpisodeStatistics must accumulate
    correct episode returns/lengths through the adapter's autoreset."""
    from gymnasium.wrappers.vector import RecordEpisodeStatistics

    cfg = _cfg(n_envs=4, n_steps=6)
    env = RecordEpisodeStatistics(VectorTradingEnv(cfg, seed=0))
    obs, _ = env.reset(seed=5)
    action = np.zeros((4, cfg.action_dim), np.float32)
    total = np.zeros(4)
    infos = {}
    for t in range(cfg.n_steps):
        obs, rew, term, trunc, infos = env.step(action)
        total += np.asarray(rew)
    assert term.all() and "episode" in infos
    np.testing.assert_allclose(infos["episode"]["r"], total, rtol=1e-5)
    np.testing.assert_array_equal(infos["episode"]["l"], [cfg.n_steps] * 4)
    env.close()
