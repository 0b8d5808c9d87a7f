"""Seed-exactness: the jitted engine in float64 compat mode, fed the
reference's per-process PCG64 noise streams, must reproduce the NumPy oracle
trajectories bitwise-level (atol ~1e-9) — the north-star correctness property
(BASELINE.md "seed-exact vs reference")."""
import jax
import numpy as np
import pytest
from jax import enable_x64

from mbt_gym_tpu.agents.baseline import AvellanedaStoikovAgent
from mbt_gym_tpu.ops.compat import reference_noise_cube
from mbt_gym_tpu.rollout import rollout
from mbt_gym_tpu.utils.config import as_env_config, cj_env_config

from tests.reference_oracle import oracle_limit_order_rollout

SEED = 50
N = 64
N_STEPS = 50


def _as_policy_numpy(agent):
    gamma, sigma, k, T = agent.risk_aversion, agent.volatility, agent.fill_exponent, agent.terminal_time

    def policy(obs):
        inventory, time = obs[:, 1], obs[:, 2]
        skew = inventory * gamma * sigma**2 * (T - time)
        spread = gamma * sigma**2 * (T - time) + 2.0 / gamma * np.log(1 + gamma / k)
        return np.stack([skew + spread / 2, -skew + spread / 2], axis=1)

    return policy


@pytest.mark.parametrize("risk_aversion", [0.1, 0.01])
def test_as_env_trajectories_bitwise_vs_oracle(risk_aversion):
    with enable_x64():
        cfg = as_env_config(num_trajectories=N, n_steps=N_STEPS, dtype="float64")
        agent = AvellanedaStoikovAgent.from_config(cfg, risk_aversion=risk_aversion)
        noise = reference_noise_cube(cfg, SEED, dtype="float64")
        res = rollout(cfg, agent.policy(), None, jax.random.PRNGKey(0), noise=noise)
        ours = np.asarray(res.trajectory.observations)

        oracle = oracle_limit_order_rollout(
            _as_policy_numpy(agent), SEED, num_trajectories=N, n_steps=N_STEPS,
            max_inventory=cfg.max_inventory,
        )
        # obs columns: cash, inventory, time, price
        np.testing.assert_allclose(ours[:, :, 0], oracle["observations"][:, :, 0], atol=1e-9)
        np.testing.assert_array_equal(ours[:, :, 1], oracle["observations"][:, :, 1])
        np.testing.assert_allclose(ours[:, :, 3], oracle["observations"][:, :, 3], atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(res.trajectory.rewards), oracle["rewards"], atol=1e-9
        )


def test_cj_env_rewards_bitwise_vs_oracle():
    with enable_x64():
        cfg = cj_env_config(num_trajectories=N, n_steps=N_STEPS, max_inventory=10.0, dtype="float64")
        noise = reference_noise_cube(cfg, SEED, dtype="float64")
        # Fixed symmetric quotes keep the test independent of agent math.
        def policy(params, obs, state):
            import jax.numpy as jnp
            return jnp.full((obs.shape[0], 2), 0.6, dtype=obs.dtype)

        res = rollout(cfg, policy, None, jax.random.PRNGKey(0), noise=noise)
        oracle = oracle_limit_order_rollout(
            lambda obs: np.full((obs.shape[0], 2), 0.6), SEED,
            num_trajectories=N, n_steps=N_STEPS, terminal_time=1.0,
            max_inventory=10.0, reward="cjmm", phi=0.01, alpha=0.001,
        )
        np.testing.assert_allclose(np.asarray(res.trajectory.rewards), oracle["rewards"], atol=1e-9)
        np.testing.assert_array_equal(
            np.asarray(res.trajectory.observations[:, :, 1]), oracle["observations"][:, :, 1]
        )


def test_inventory_masking_at_bounds():
    """Fills that would breach +/- max_inventory are masked, bitwise vs oracle."""
    with enable_x64():
        cfg = as_env_config(num_trajectories=N, n_steps=N_STEPS, dtype="float64")
        import dataclasses as _dc; cfg = _dc.replace(cfg, max_inventory=2.0)
        noise = reference_noise_cube(cfg, SEED, dtype="float64")

        def tight_policy(params, obs, state):
            import jax.numpy as jnp
            return jnp.full((obs.shape[0], 2), 0.05, dtype=obs.dtype)  # nearly always filled

        res = rollout(cfg, tight_policy, None, jax.random.PRNGKey(0), noise=noise)
        oracle = oracle_limit_order_rollout(
            lambda obs: np.full((obs.shape[0], 2), 0.05), SEED,
            num_trajectories=N, n_steps=N_STEPS, max_inventory=2.0,
        )
        inv = np.asarray(res.trajectory.observations[:, :, 1])
        np.testing.assert_array_equal(inv, oracle["observations"][:, :, 1])
        assert np.abs(inv).max() <= 2.0


def test_oe_env_bitwise_vs_oracle():
    """Speed dynamics + temporary/permanent impact + CjOe reward, bitwise."""
    from mbt_gym_tpu.utils.config import oe_env_config
    from tests.reference_oracle import oracle_speed_rollout
    import numpy as np

    with enable_x64():
        cfg = oe_env_config(
            num_trajectories=N, n_steps=N_STEPS, initial_inventory=10, dtype="float64"
        )
        noise = reference_noise_cube(cfg, SEED, dtype="float64")

        def policy(params, obs, state):
            import jax.numpy as jnp
            return jnp.full((obs.shape[0], 1), -2.5, dtype=obs.dtype)

        res = rollout(cfg, policy, None, jax.random.PRNGKey(0), noise=noise)
        oracle = oracle_speed_rollout(
            lambda obs: np.full((obs.shape[0], 1), -2.5), SEED,
            num_trajectories=N, n_steps=N_STEPS, initial_inventory=10.0,
            phi=2e-4, alpha=0.01,
        )
        ours = np.asarray(res.trajectory.observations)
        np.testing.assert_allclose(ours[:, :, 0], oracle["observations"][:, :, 0], atol=1e-9)
        np.testing.assert_allclose(ours[:, :, 1], oracle["observations"][:, :, 1], atol=1e-12)
        np.testing.assert_allclose(ours[:, :, 3], oracle["observations"][:, :, 3], atol=1e-12)
        np.testing.assert_allclose(ours[:, :, 4], oracle["observations"][:, :, 4], atol=1e-12)
        np.testing.assert_allclose(np.asarray(res.trajectory.rewards), oracle["rewards"], atol=1e-9)
