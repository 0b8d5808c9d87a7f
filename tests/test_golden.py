"""Golden-trajectory regression: the engine must reproduce a committed
trajectory dump generated from the actual reference implementation
(tests/data/golden_as_seed50.npz: AS env, N=32, 60 steps, seed 50, AS agent
gamma=0.1).  Runs anywhere — no reference checkout needed."""
import os

import jax
import numpy as np
from jax import enable_x64

from mbt_gym_tpu.agents.baseline import AvellanedaStoikovAgent
from mbt_gym_tpu.ops.compat import reference_noise_cube
from mbt_gym_tpu.rollout import rollout, to_reference_layout
from mbt_gym_tpu.utils.config import as_env_config

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "golden_as_seed50.npz")


def test_golden_as_trajectories():
    golden = np.load(GOLDEN)
    n, n_steps, seed = (int(x) for x in golden["meta"])
    with enable_x64():
        cfg = as_env_config(num_trajectories=n, n_steps=n_steps, dtype="float64")
        agent = AvellanedaStoikovAgent.from_config(cfg, risk_aversion=0.1)
        noise = reference_noise_cube(cfg, seed, dtype="float64")
        res = rollout(cfg, agent.policy(), None, jax.random.PRNGKey(0), noise=noise)
        obs, actions, rewards = to_reference_layout(res.trajectory)

    np.testing.assert_array_equal(np.asarray(obs)[:, 1, :], golden["observations"][:, 1, :])
    np.testing.assert_allclose(
        np.asarray(obs)[:, 3, :], golden["observations"][:, 3, :], rtol=0, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(obs)[:, 0, :], golden["observations"][:, 0, :], rtol=0, atol=1e-9
    )
    np.testing.assert_allclose(np.asarray(actions), golden["actions"], rtol=0, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(rewards), golden["rewards"], rtol=0, atol=1e-9
    )
