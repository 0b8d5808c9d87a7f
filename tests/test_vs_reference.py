"""THE seed-exactness test: run the *actual* reference implementation
(JJJerome/mbt_gym, mounted read-only at /root/reference, imported via a
minimal gym stub) and assert the TPU engine reproduces its trajectories
bitwise under float64 compat mode with the reference's own PCG64 noise
streams (BASELINE.md: "trajectories/fills/episodic returns seed-exact vs
reference")."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def ref(reference_modules):
    m = reference_modules
    return {
        "TradingEnvironment": m["te"].TradingEnvironment,
        "LimitOrderModelDynamics": m["md"].LimitOrderModelDynamics,
        "BrownianMotionMidpriceModel": m["mm"].BrownianMotionMidpriceModel,
        "PoissonArrivalModel": m["am"].PoissonArrivalModel,
        "ExponentialFillFunction": m["fm"].ExponentialFillFunction,
        "CjMmCriterion": m["rf"].CjMmCriterion,
        "AvellanedaStoikovAgent": m["ba"].AvellanedaStoikovAgent,
        "generate_trajectory": m["gt"].generate_trajectory,
    }


def _make_reference_env(ref, num_trajectories, n_steps, seed, reward=None, arrival_rate=140.0):
    # Mirrors notebooks/Test_1 cell 4 (the AS ground-truth factory).
    dynamics = ref["LimitOrderModelDynamics"](
        midprice_model=ref["BrownianMotionMidpriceModel"](
            initial_price=100.0, volatility=2.0, step_size=1.0 / n_steps,
            terminal_time=1.0, num_trajectories=num_trajectories,
        ),
        arrival_model=ref["PoissonArrivalModel"](
            intensity=np.array([arrival_rate, arrival_rate]), step_size=1.0 / n_steps,
            num_trajectories=num_trajectories,
        ),
        fill_probability_model=ref["ExponentialFillFunction"](
            fill_exponent=1.5, step_size=1.0 / n_steps, num_trajectories=num_trajectories
        ),
        num_trajectories=num_trajectories,
    )
    kwargs = dict(
        terminal_time=1.0,
        n_steps=n_steps,
        seed=seed,
        initial_inventory=0,
        model_dynamics=dynamics,
        max_inventory=n_steps,
        normalise_action_space=False,
        normalise_observation_space=False,
        num_trajectories=num_trajectories,
    )
    if reward is not None:
        kwargs["reward_function"] = reward
    return ref["TradingEnvironment"](**kwargs)


@pytest.mark.parametrize("risk_aversion", [0.1, 0.01])
def test_as_trajectories_bitwise_vs_actual_reference(ref, risk_aversion):
    import jax
    from jax import enable_x64

    from mbt_gym_tpu.agents.baseline import AvellanedaStoikovAgent
    from mbt_gym_tpu.ops.compat import reference_noise_cube
    from mbt_gym_tpu.rollout import rollout, to_reference_layout
    from mbt_gym_tpu.utils.config import as_env_config

    n, n_steps, seed = 128, 100, 50
    env = _make_reference_env(ref, n, n_steps, seed)
    agent = ref["AvellanedaStoikovAgent"](risk_aversion=risk_aversion, env=env)
    ref_obs, ref_actions, ref_rewards = ref["generate_trajectory"](env, agent)

    with enable_x64():
        cfg = as_env_config(num_trajectories=n, n_steps=n_steps, dtype="float64")
        ours = AvellanedaStoikovAgent.from_config(cfg, risk_aversion=risk_aversion)
        noise = reference_noise_cube(cfg, seed, dtype="float64")
        res = rollout(cfg, ours.policy(), None, jax.random.PRNGKey(0), noise=noise)
        obs, actions, rewards = to_reference_layout(res.trajectory)

    # Inventory paths (integer-valued): exactly equal.
    np.testing.assert_array_equal(np.asarray(obs)[:, 1, :], ref_obs[:, 1, :])
    # Prices and cash: float64, same op order -> bitwise-level agreement.
    np.testing.assert_allclose(np.asarray(obs)[:, 3, :], ref_obs[:, 3, :], rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(obs)[:, 0, :], ref_obs[:, 0, :], rtol=0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(actions), ref_actions, rtol=0, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(rewards)[:, 0, :], ref_rewards[:, 0, :], rtol=0, atol=1e-9
    )


def test_cjmm_rewards_bitwise_vs_actual_reference(ref):
    import jax
    import jax.numpy as jnp
    from jax import enable_x64

    from mbt_gym_tpu.ops.compat import reference_noise_cube
    from mbt_gym_tpu.rollout import rollout
    from mbt_gym_tpu.utils.config import cj_env_config

    n, n_steps, seed = 64, 80, 410
    reward = ref["CjMmCriterion"](
        per_step_inventory_aversion=0.01, terminal_inventory_aversion=0.001, terminal_time=1.0
    )
    env = _make_reference_env(ref, n, n_steps, seed, reward=reward)

    class FixedAgent:
        def get_action(self, obs):
            return np.full((n, 2), 0.55)

    ref_obs, _, ref_rewards = ref["generate_trajectory"](env, FixedAgent())

    with enable_x64():
        cfg = cj_env_config(
            num_trajectories=n, n_steps=n_steps, max_inventory=float(n_steps), dtype="float64"
        )
        noise = reference_noise_cube(cfg, seed, dtype="float64")

        def policy(params, obs, state):
            return jnp.full((n, 2), 0.55, dtype=obs.dtype)

        res = rollout(cfg, policy, None, jax.random.PRNGKey(0), noise=noise)

    np.testing.assert_array_equal(
        np.asarray(res.trajectory.observations)[:, :, 1].T, ref_obs[:, 1, :]
    )
    np.testing.assert_allclose(
        np.asarray(res.trajectory.rewards).T, ref_rewards[:, 0, :], rtol=0, atol=1e-9
    )


def test_reference_episode_stats_match(ref):
    """Full-episode summary stats (the AS table quantities) bitwise-level."""
    import jax
    from jax import enable_x64

    from mbt_gym_tpu.agents.baseline import AvellanedaStoikovAgent
    from mbt_gym_tpu.ops.compat import reference_noise_cube
    from mbt_gym_tpu.rollout import rollout
    from mbt_gym_tpu.utils.config import as_env_config

    n, n_steps, seed = 256, 200, 50
    env = _make_reference_env(ref, n, n_steps, seed)
    agent = ref["AvellanedaStoikovAgent"](risk_aversion=0.1, env=env)
    ref_obs, ref_actions, ref_rewards = ref["generate_trajectory"](env, agent)
    ref_total = ref_rewards.sum(axis=-1).reshape(-1)

    with enable_x64():
        cfg = as_env_config(num_trajectories=n, n_steps=n_steps, dtype="float64")
        ours = AvellanedaStoikovAgent.from_config(cfg, risk_aversion=0.1)
        noise = reference_noise_cube(cfg, seed, dtype="float64")
        res = rollout(cfg, ours.policy(), None, jax.random.PRNGKey(0), noise=noise)
        total = np.asarray(res.trajectory.rewards.sum(axis=0))

    np.testing.assert_allclose(total, ref_total, rtol=0, atol=1e-8)
    np.testing.assert_array_equal(
        np.asarray(res.trajectory.observations)[-1, :, 1], ref_obs[:, 1, -1]
    )
