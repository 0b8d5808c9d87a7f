"""Reset-time draw parity and callable reset specs (VERDICT round-1 items
4, 7, 9): bitwise replay of the reference's env-level rng draws for tuple
initial inventory and callable start times, callable specs through the gym
adapters, the CJ-OE tuple-inventory fix, and checkpoint structure guards.
"""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mbt_gym_tpu.utils.config import as_env_config, oe_env_config

N, T, SEED = 32, 40, 77
DT = 1.0 / T


def _reference_env(ref, **env_kwargs):
    dynamics = ref["md"].LimitOrderModelDynamics(
        midprice_model=ref["mm"].BrownianMotionMidpriceModel(
            drift=0.0, volatility=2.0, initial_price=100.0, step_size=DT,
            terminal_time=1.0, num_trajectories=N,
        ),
        arrival_model=ref["am"].PoissonArrivalModel(
            intensity=np.array([120.0, 90.0]), step_size=DT, num_trajectories=N
        ),
        fill_probability_model=ref["fm"].ExponentialFillFunction(
            fill_exponent=1.5, step_size=DT, num_trajectories=N
        ),
        num_trajectories=N, max_depth=5.0,
    )
    kwargs = dict(
        terminal_time=1.0, n_steps=T, seed=SEED, model_dynamics=dynamics,
        max_inventory=T, normalise_action_space=False,
        normalise_observation_space=False, num_trajectories=N,
    )
    kwargs.update(env_kwargs)
    return ref["te"].TradingEnvironment(**kwargs)


def _our_cfg(**cfg_kwargs):
    from mbt_gym_tpu.dynamics import LimitOrderDynamics
    from mbt_gym_tpu.env import EnvConfig
    from mbt_gym_tpu.processes import (
        BrownianMotionMidprice,
        ExponentialFill,
        PoissonArrivals,
    )

    kwargs = dict(
        dynamics=LimitOrderDynamics(
            midprice_model=BrownianMotionMidprice(volatility=2.0, initial_price=100.0),
            arrival_model=PoissonArrivals(intensity=(120.0, 90.0)),
            fill_probability_model=ExponentialFill(1.5),
            max_depth=5.0,
        ),
        terminal_time=1.0, n_steps=T, max_inventory=float(T),
        num_trajectories=N, dtype="float64",
    )
    kwargs.update(cfg_kwargs)
    return EnvConfig(**kwargs)


class _FixedAgent:
    def get_action(self, obs):
        return np.full((N, 2), 0.45)


def test_tuple_inventory_reset_draw_bitwise(reference_modules):
    """Full-episode bitwise parity vs the actual reference with
    ``initial_inventory=(-3, 4)``: the env-level rng consumes one integers
    draw in the constructor (TradingEnvironment.py:74) and one in
    ``generate_trajectory``'s reset (:96-99, generate_trajectory.py:18) —
    ``reference_initial_inventory(..., resets=1)`` replays the one the
    episode rolls from."""
    ref = reference_modules
    from jax import enable_x64

    from mbt_gym_tpu.ops.compat import (
        reference_initial_inventory,
        reference_noise_cube,
    )
    from mbt_gym_tpu.rollout import rollout

    env = _reference_env(ref, initial_inventory=(-3, 4))
    constructor_inventory = env.model_dynamics.state[:, 1].copy()
    ref_obs, _, ref_rewards = ref["gt"].generate_trajectory(env, _FixedAgent())

    with enable_x64():
        cfg = _our_cfg(initial_inventory=(-3, 4))
        # Draw 0 = constructor state; draw 1 = the episode's reset.
        np.testing.assert_array_equal(
            reference_initial_inventory(cfg, SEED, resets=0), constructor_inventory
        )
        inv = reference_initial_inventory(cfg, SEED, resets=1)
        np.testing.assert_array_equal(inv, ref_obs[:, 1, 0])

        noise = reference_noise_cube(cfg, SEED, dtype="float64")

        def policy(params, obs, state):
            return jnp.full((N, 2), 0.45, dtype=obs.dtype)

        res = rollout(cfg, policy, None, jax.random.PRNGKey(0), noise=noise,
                      initial_inventory=inv)

    ours_obs = np.asarray(res.trajectory.observations)
    np.testing.assert_array_equal(ours_obs[:, :, 1].T, ref_obs[:, 1, :])
    np.testing.assert_allclose(ours_obs[:, :, 0].T, ref_obs[:, 0, :], rtol=0, atol=1e-9)
    np.testing.assert_allclose(ours_obs[:, :, 3].T, ref_obs[:, 3, :], rtol=0, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(res.trajectory.rewards).T, ref_rewards[:, 0, :], rtol=0, atol=1e-8
    )


def test_callable_start_time_replay_bitwise(reference_modules):
    """Reference callable start_time (TradingEnvironment.py:260-261): both
    sides evaluate the same host rng stream; the constructor consumes call
    #1 and the episode's reset call #2.  The shortened episode must match
    bitwise step-for-step."""
    ref = reference_modules
    from jax import enable_x64

    from mbt_gym_tpu.ops.compat import reference_noise_cube
    from mbt_gym_tpu.rollout import rollout

    def make_start():
        rng = np.random.default_rng(123)
        return lambda: rng.uniform(0.2, 0.8)

    env = _reference_env(ref, start_time=make_start())
    ref_obs, _, ref_rewards = ref["gt"].generate_trajectory(env, _FixedAgent())

    # Host replay of the callable's stream: draw #2 is the episode's start.
    replay = make_start()
    replay()
    start = round(replay() / DT) * DT
    assert ref_obs[0, 2, 0] == pytest.approx(start)
    # The reference preallocates full-length zero-padded buffers and breaks
    # at done (generate_trajectory.py:13-33): only the executed prefix is
    # meaningful.  A late start shortens the episode to T - start/dt steps.
    n_exec = T - round(start / DT)
    assert ref_rewards.shape[-1] == T  # zero-padded, NOT truncated
    assert (ref_rewards[:, 0, n_exec:] == 0).all()
    assert (ref_obs[:, 3, n_exec + 1:] == 0).all()  # never written past done

    with enable_x64():
        cfg = _our_cfg()
        noise = reference_noise_cube(cfg, SEED, dtype="float64")

        def policy(params, obs, state):
            return jnp.full((N, 2), 0.45, dtype=obs.dtype)

        res = rollout(cfg, policy, None, jax.random.PRNGKey(0), noise=noise,
                      start_time=start)

    ours_obs = np.asarray(res.trajectory.observations)
    assert ours_obs.shape[0] == n_exec + 1
    ref_prefix = ref_obs[:, :, : n_exec + 1]
    np.testing.assert_allclose(ours_obs[:, :, 2].T, ref_prefix[:, 2, :], rtol=0, atol=1e-12)
    np.testing.assert_array_equal(ours_obs[:, :, 1].T, ref_prefix[:, 1, :])
    np.testing.assert_allclose(ours_obs[:, :, 0].T, ref_prefix[:, 0, :], rtol=0, atol=1e-9)
    np.testing.assert_allclose(ours_obs[:, :, 3].T, ref_prefix[:, 3, :], rtol=0, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(res.trajectory.rewards).T, ref_rewards[:, 0, :n_exec], rtol=0, atol=1e-8
    )


def test_callable_specs_through_adapters():
    """Callable start_time / initial_inventory evaluate fresh on the host at
    EVERY adapter reset (TradingEnvironment.py:257-281 semantics), not once
    at trace time."""
    from mbt_gym_tpu.gym_compat import VecTradingEnv

    start_values = iter([0.25, 0.5, 0.0])
    inv_values = iter([2.7, -1.2, 0.0])
    cfg = as_env_config(num_trajectories=4, n_steps=8)
    import dataclasses

    cfg = dataclasses.replace(
        cfg,
        start_time=lambda: next(start_values),
        initial_inventory=lambda: next(inv_values),
    )
    env = VecTradingEnv(cfg, seed=0)
    obs1 = env.reset()
    # round_initial_inventory=True for limit-order dynamics: 2.7 -> 3.0
    np.testing.assert_allclose(obs1[:, 1], 3.0)
    np.testing.assert_allclose(obs1[:, 2], 0.25)
    obs2 = env.reset()
    np.testing.assert_allclose(obs2[:, 1], -1.0)
    np.testing.assert_allclose(obs2[:, 2], 0.5)


def test_callable_specs_rejected_in_jitted_reset():
    """Directly jitting reset with a callable spec must fail loudly rather
    than silently freezing the trace-time draw."""
    import dataclasses

    from mbt_gym_tpu import env as env_lib

    cfg = dataclasses.replace(
        as_env_config(num_trajectories=4, n_steps=8), start_time=lambda: 0.1
    )
    with pytest.raises(TypeError, match="host-evaluated"):
        env_lib.reset(cfg, jax.random.PRNGKey(0))


def test_speed_dynamics_callable_inventory_not_rounded():
    """round_initial_inventory=False for speed dynamics
    (ModelDynamics.py:260): fractional callable inventories pass through."""
    import dataclasses

    from mbt_gym_tpu.gym_compat import VecTradingEnv

    cfg = dataclasses.replace(
        oe_env_config(num_trajectories=4, n_steps=8), initial_inventory=lambda: 2.7
    )
    env = VecTradingEnv(cfg, seed=0)
    obs = env.reset()
    np.testing.assert_allclose(obs[:, 1], 2.7, rtol=1e-6)


def test_oe_agent_from_config_tuple_and_callable_inventory():
    """VERDICT weak-item 7: ``from_config`` must accept non-scalar inventory
    specs (tuple -> expectation of the uniform-integer draw; callable ->
    evaluated once)."""
    from mbt_gym_tpu.agents.baseline import CarteaJaimungalOeAgent

    cfg = oe_env_config(num_trajectories=8, n_steps=10, initial_inventory=10)
    import dataclasses

    tuple_cfg = dataclasses.replace(cfg, initial_inventory=(4, 9))
    agent = CarteaJaimungalOeAgent.from_config(tuple_cfg, alpha=0.01)
    assert agent.initial_inventory == pytest.approx((4 + 9 - 1) / 2)

    callable_cfg = dataclasses.replace(cfg, initial_inventory=lambda: 6.0)
    agent = CarteaJaimungalOeAgent.from_config(callable_cfg, alpha=0.01)
    assert agent.initial_inventory == pytest.approx(6.0)

    # And the resulting policy still runs.
    policy = agent.policy()
    obs = jnp.zeros((8, 4))
    speeds = policy(None, obs, None)
    assert speeds.shape == (8, 1)
    assert bool(jnp.all(speeds < 0))  # positive q0 -> selling


def test_checkpoint_structure_mismatch_raises():
    """Restoring into a drifted template must fail loudly, not silently
    load positionally-matched wrong tensors (VERDICT weak-item 6)."""
    from mbt_gym_tpu.checkpoint import (
        CheckpointMismatchError,
        restore_checkpoint,
        save_checkpoint,
    )

    bundle = {
        "params": {"w": jnp.ones((3, 2)), "b": jnp.zeros((2,))},
        "step": jnp.asarray(5),
    }
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "ckpt")
        save_checkpoint(path, bundle)

        # Same leaf count + shapes, different names -> must raise.
        renamed = {
            "params": {"w2": jnp.ones((3, 2)), "b": jnp.zeros((2,))},
            "step": jnp.asarray(5),
        }
        with pytest.raises(CheckpointMismatchError, match="w2"):
            restore_checkpoint(path, template=renamed)

        # Same names, drifted shape -> must raise.
        reshaped = {
            "params": {"w": jnp.ones((2, 3)), "b": jnp.zeros((2,))},
            "step": jnp.asarray(5),
        }
        with pytest.raises(CheckpointMismatchError, match="drift"):
            restore_checkpoint(path, template=reshaped)

        # Exact template still round-trips.
        restored = restore_checkpoint(path, template=bundle)
        np.testing.assert_allclose(np.asarray(restored["params"]["w"]), 1.0)
        assert int(restored["step"]) == 5
