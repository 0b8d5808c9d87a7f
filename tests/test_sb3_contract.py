"""SB3 ``VecEnv`` contract conformance for :class:`VecTradingEnv`.

SB3 is not installable in this container, so this file vendors a minimal
driver reproducing exactly how ``stable_baselines3.common`` exercises a
``VecEnv`` during ``BaseAlgorithm.learn`` (sb3 1.6.2, the reference's pin):

- ``_wrap_env`` probes ``env_is_wrapped(Monitor)`` before wrapping with
  ``VecMonitor`` (base_class.py), and reads ``num_envs`` / spaces /
  ``render_mode``;
- ``VecEnvWrapper.__getattr__`` resolves attributes recursively through
  ``getattr_depth_check`` (base_vec_env.py);
- ``collect_rollouts`` loops ``step_async``/``step_wait`` and reads
  ``infos[i]["terminal_observation"]`` on done;
- callbacks use ``get_attr``/``set_attr``/``env_method`` with None / int /
  list index forms.

The reference adapter inherits this surface from ``VecEnv``
(StableBaselinesTradingEnvironment.py:11-66) but stubs get_attr/set_attr/
env_method to ``None``; VecTradingEnv implements them with DummyVecEnv
semantics.
"""
from __future__ import annotations

import numpy as np
import pytest

from mbt_gym_tpu.gym_compat import ActionInfoCalculator, VecTradingEnv
from mbt_gym_tpu.utils.config import as_env_config


class _FakeMonitorWrapper:  # stands in for stable_baselines3 Monitor probes
    pass


class MiniVecEnvWrapper:
    """Vendored mimic of SB3's ``VecEnvWrapper`` (base_vec_env.py):
    delegates stepping, forwards unknown attributes via ``__getattr__`` with
    the same depth-check protocol SB3 uses to detect shadowing."""

    def __init__(self, venv):
        self.venv = venv
        self.num_envs = venv.num_envs
        self.observation_space = venv.observation_space
        self.action_space = venv.action_space

    def reset(self):
        return self.venv.reset()

    def step_async(self, actions):
        self.venv.step_async(actions)

    def step_wait(self):
        return self.venv.step_wait()

    def step(self, actions):
        self.step_async(actions)
        return self.step_wait()

    def __getattr__(self, name):
        # SB3's getattr_recursive, condensed.
        if name in self.__dict__:
            return self.__dict__[name]
        return getattr(self.venv, name)

    def getattr_depth_check(self, name, already_found):
        if name in self.__dict__ and already_found:
            return f"{type(self).__module__}.{type(self).__name__}"
        return self.venv.getattr_depth_check(name, name in self.__dict__)


REQUIRED_API = [
    # stable_baselines3.common.vec_env.base_vec_env.VecEnv abstract methods
    "reset", "step_async", "step_wait", "close", "get_attr", "set_attr",
    "env_method", "env_is_wrapped", "seed", "step", "get_images", "render",
    "getattr_depth_check",
]


@pytest.fixture(scope="module")
def venv():
    cfg = as_env_config(num_trajectories=8, n_steps=5)
    return VecTradingEnv(cfg, seed=3)


def test_full_vecenv_api_present(venv):
    for name in REQUIRED_API:
        assert callable(getattr(venv, name)), f"VecEnv API missing: {name}"
    for attr in ["num_envs", "observation_space", "action_space", "render_mode", "unwrapped"]:
        assert hasattr(venv, attr)


def test_wrap_env_probe_sequence(venv):
    """The exact calls SB3's BaseAlgorithm._wrap_env makes before learn()."""
    wrapped = venv.env_is_wrapped(_FakeMonitorWrapper)
    assert wrapped == [False] * venv.num_envs
    assert not any(wrapped)  # -> SB3 would wrap with VecMonitor
    assert venv.env_is_wrapped(_FakeMonitorWrapper, indices=0) == [False]
    assert venv.env_is_wrapped(_FakeMonitorWrapper, indices=[1, 3]) == [False, False]
    assert venv.get_attr("render_mode") == [None] * venv.num_envs


def test_attr_and_method_plumbing(venv):
    assert venv.get_attr("num_envs") == [8] * 8
    assert venv.get_attr("n_steps", indices=2) == [venv.cfg.n_steps]
    venv.set_attr("render_mode", "human")
    assert venv.get_attr("render_mode", indices=[0, 5]) == ["human", "human"]
    venv.set_attr("render_mode", None)
    seeds = venv.env_method("seed", 11)
    assert len(seeds) == venv.num_envs
    assert venv.env_method("seed", 11, indices=[0]) == [[11] * venv.num_envs]


def test_getattr_depth_check(venv):
    assert venv.getattr_depth_check("step_wait", already_found=False) is None
    assert venv.getattr_depth_check("step_wait", already_found=True) == (
        "mbt_gym_tpu.gym_compat.VecTradingEnv"
    )
    assert venv.getattr_depth_check("no_such_attribute", already_found=True) is None


def test_learn_loop_through_wrapper():
    """Drive a full episode + autoreset through a VecMonitor-style wrapper,
    exactly as collect_rollouts does."""
    cfg = as_env_config(num_trajectories=8, n_steps=5)
    env = MiniVecEnvWrapper(VecTradingEnv(cfg, seed=0))
    # attribute forwarding through the wrapper (SB3 reads these via getattr)
    assert env.n_steps == 5
    assert env.getattr_depth_check("cfg", False) is None

    obs = env.reset()
    assert obs.shape == (8, cfg.state_dim)
    for t in range(2 * cfg.n_steps):  # two episodes: exercises autoreset
        actions = np.full((8, 2), 0.5, dtype=np.float32)
        obs, rewards, dones, infos = env.step(actions)
        assert obs.shape == (8, cfg.state_dim)
        assert rewards.shape == (8,)
        terminal = (t % cfg.n_steps) == cfg.n_steps - 1
        assert bool(dones.min()) == terminal
        if terminal:
            # SB3 convention: terminal obs stashed per env, obs already reset
            assert all("terminal_observation" in info for info in infos)
            term_obs = infos[0]["terminal_observation"]
            assert term_obs.shape == (cfg.state_dim,)
            assert term_obs[2] == pytest.approx(cfg.terminal_time)  # time col
            assert obs[0, 2] == pytest.approx(0.0)  # fresh episode clock
        else:
            assert all("terminal_observation" not in info for info in infos)


def test_per_step_infos_vecmonitor_consumer():
    """A VecMonitor-style consumer sees the reference's terminal-step
    action-mean infos mid-training (info_calculators.py:36-52 intent)."""
    cfg = as_env_config(num_trajectories=4, n_steps=3)
    calc = ActionInfoCalculator(num_trajectories=4, action_dim=2)
    env = VecTradingEnv(cfg, seed=1, info_calculator=calc)
    env.reset()
    seen = []
    for t in range(cfg.n_steps):
        action = np.full((4, 2), float(t + 1), dtype=np.float32)
        _, _, dones, infos = env.step(action)
        seen.append(infos)
    # Non-terminal steps: empty info dicts (no terminal_observation either).
    assert seen[0][0] == {} and seen[1][0] == {}
    # Terminal step: mean over the *recorded* (non-terminal) actions — the
    # reference returns before recording the terminal action
    # (info_calculators.py:35-44), so the mean is over actions 1.0 and 2.0.
    term = seen[-1]
    assert term[2]["action_0"] == pytest.approx(1.5)
    assert term[2]["action_1"] == pytest.approx(1.5)
    assert "terminal_observation" in term[2]
    # Autoreset also reset the calculator for the next episode.
    assert calc._count == 0


def test_gym_adapter_info_calculator():
    pytest.importorskip("gymnasium")
    from mbt_gym_tpu.gym_compat import GymTradingEnv

    cfg = as_env_config(num_trajectories=4, n_steps=3)
    calc = ActionInfoCalculator(num_trajectories=4, action_dim=2)
    env = GymTradingEnv(cfg, seed=1, info_calculator=calc)
    env.reset()
    action = np.full((4, 2), 2.0, dtype=np.float32)
    _, _, term, _, info = env.step(action)
    assert not term.any() and info == [{}] * 4
    env.step(action)
    _, _, term, _, info = env.step(action)
    assert term.all()
    assert info[0]["action_0"] == pytest.approx(2.0)


def test_reduced_observation_adapter():
    """``observation_indices`` reduces spaces, emitted obs AND
    terminal_observation — the adapter-level ReduceStateSizeWrapper
    (wrappers.py:10-43 via experiments/helpers.py:63-65)."""
    from mbt_gym_tpu.types import INVENTORY_INDEX, TIME_INDEX

    cfg = as_env_config(num_trajectories=8, n_steps=5)
    full = VecTradingEnv(cfg, seed=3)
    red = VecTradingEnv(
        cfg, seed=3, observation_indices=(INVENTORY_INDEX, TIME_INDEX)
    )
    assert red.observation_space.shape == (2,)
    lo_f, hi_f = full.observation_space.low, full.observation_space.high
    assert np.allclose(red.observation_space.low, lo_f[[1, 2]])
    assert np.allclose(red.observation_space.high, hi_f[[1, 2]])

    obs_f, obs_r = full.reset(), red.reset()
    assert obs_r.shape == (8, 2)
    np.testing.assert_allclose(obs_r, obs_f[:, [1, 2]])  # same seed/state

    action = np.zeros((8, cfg.action_dim), dtype=np.float32)
    for _ in range(5):
        obs_f, _, dones_f, _ = full.step(action)
        obs_r, _, dones_r, infos_r = red.step(action)
        assert obs_r.shape == (8, 2)
    assert dones_f.all() and dones_r.all()
    for info in infos_r:
        assert info["terminal_observation"].shape == (2,)


def test_reduced_observation_gym_adapter():
    from mbt_gym_tpu.gym_compat import GymTradingEnv
    from mbt_gym_tpu.types import INVENTORY_INDEX, TIME_INDEX

    cfg = as_env_config(num_trajectories=4, n_steps=3)
    env = GymTradingEnv(
        cfg, seed=1, observation_indices=(INVENTORY_INDEX, TIME_INDEX)
    )
    assert env.observation_space.shape == (2,)
    obs, _ = env.reset()
    assert obs.shape == (4, 2)
    obs, _, term, _, _ = env.step(np.ones((4, cfg.action_dim), np.float32))
    assert obs.shape == (4, 2) and not term.any()
