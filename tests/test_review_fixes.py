"""Regression tests for the code-review findings (see commit message)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mbt_gym_tpu.env import EnvConfig
from mbt_gym_tpu.utils.config import as_env_config


def test_touch_dynamics_rejects_action_normalisation():
    from mbt_gym_tpu.dynamics import AtTheTouchDynamics
    from mbt_gym_tpu.processes import BrownianMotionMidprice, PoissonArrivals

    with pytest.raises(AssertionError, match="binary post decisions"):
        EnvConfig(
            dynamics=AtTheTouchDynamics(
                midprice_model=BrownianMotionMidprice(), arrival_model=PoissonArrivals()
            ),
            normalise_action_space=True,
            num_trajectories=4,
        )


def test_mc_stats_random_start_matches_rollout_stats():
    """mc_episode_stats must freeze post-done steps exactly like rollout()."""
    from functools import partial

    from mbt_gym_tpu.agents.baseline import fixed_spread_policy
    from mbt_gym_tpu.rollout import episode_stats, mc_episode_stats, rollout

    cfg = dataclasses.replace(
        as_env_config(num_trajectories=512, n_steps=40), start_time=("uniform", 0.4, 0.6)
    )
    pol = fixed_spread_policy(1.0)
    fast = jax.jit(partial(mc_episode_stats, cfg, pol, None), static_argnames=("episodes",))(
        jax.random.PRNGKey(3), episodes=4
    )
    # With post-done masking, mean episode reward must be ~half of a
    # full-horizon episode's (episodes start around t=0.5), not equal to it.
    full_cfg = dataclasses.replace(cfg, start_time=0.0)
    full = jax.jit(partial(mc_episode_stats, full_cfg, pol, None), static_argnames=("episodes",))(
        jax.random.PRNGKey(3), episodes=4
    )
    ratio = float(fast["mean_pnl"]) / float(full["mean_pnl"])
    assert 0.3 < ratio < 0.7, (float(fast["mean_pnl"]), float(full["mean_pnl"]))


def test_ppo_respects_fixed_late_start():
    from mbt_gym_tpu.agents import ppo

    cfg = dataclasses.replace(
        as_env_config(num_trajectories=32, n_steps=40),
        start_time=0.5, normalise_observation_space=True, normalise_action_space=True,
    )
    batch = ppo.collect_rollout(
        cfg, ppo.init_train_state(cfg, ppo.PPOConfig(hidden=(8,)), jax.random.PRNGKey(0)).params,
        jax.random.PRNGKey(1),
    )
    assert batch.rewards.shape[0] == 20  # only the remaining steps

    with pytest.raises(AssertionError, match="random start times"):
        ppo.collect_rollout(
            dataclasses.replace(cfg, start_time=("uniform", 0.0, 0.5)),
            ppo.init_train_state(cfg, ppo.PPOConfig(hidden=(8,)), jax.random.PRNGKey(0)).params,
            jax.random.PRNGKey(1),
        )


def test_ppo_clips_actions_to_box_when_unnormalised():
    """Raw Gaussian samples must be clipped to the action Box before
    execution (SB3 convention).  Behavioral pin: force the policy mean to a
    hugely negative depth; clipped execution trades at depth 0 (every fill
    books exactly at mid, so per-step PnL is only inventory x price drift,
    near zero in expectation), whereas executing the raw -100 depth would
    book each bid fill at mid+100, i.e. about -100 reward per fill."""
    from mbt_gym_tpu.agents import networks, ppo

    cfg = as_env_config(num_trajectories=256, n_steps=20)  # unnormalised spaces
    ts = ppo.init_train_state(cfg, ppo.PPOConfig(hidden=(8,)), jax.random.PRNGKey(0))
    params = dict(ts.params)
    params["pi"] = [dict(l) for l in params["pi"]]
    params["pi"][-1]["b"] = jnp.full_like(params["pi"][-1]["b"], -100.0)
    params["log_std"] = jnp.full_like(params["log_std"], -20.0)  # ~deterministic
    batch = ppo.collect_rollout(cfg, params, jax.random.PRNGKey(1))
    # stored (unclipped) samples keep the raw mean for log-prob purposes
    assert np.asarray(batch.actions).max() < -50.0
    # executed actions were clipped to depth 0: mean per-step reward stays
    # near zero (price-drift noise), nowhere near the ~-100/fill of the
    # unclipped regime (arrival prob 0.5/side at lambda=140, dt=1/200 ->
    # about -70 mean reward per step if clipping were removed).
    mean_step_reward = float(np.asarray(batch.rewards).mean())
    assert abs(mean_step_reward) < 5.0, mean_step_reward


def test_pallas_params_accept_nonzero_initial_state():
    """Round 2 lifted the round-1 cash0=inv0=0/t0=0 restriction: scalar
    nonzero initial conditions are now parameterised into the kernel
    (parity tested in test_pallas_episode.py); only non-scalar specs
    (tuple/callable draws) remain XLA-engine-only."""
    import dataclasses

    from mbt_gym_tpu.ops.pallas_episode import params_from_config

    p = params_from_config(as_env_config(num_trajectories=1024, initial_inventory=10))
    assert p.initial_inventory == 10.0 and p.run_steps == p.n_steps

    with pytest.raises(AssertionError, match="scalar initial inventory"):
        params_from_config(
            dataclasses.replace(
                as_env_config(num_trajectories=1024), initial_inventory=(0, 3)
            )
        )


def test_cj_policy_slices_use_per_row_times():
    """state=None batches with heterogeneous times must use each row's own
    time (the scalar fast path only applies in rollouts)."""
    from mbt_gym_tpu.agents.baseline import CarteaJaimungalMmAgent
    from mbt_gym_tpu.utils.config import cj_env_config

    cfg = cj_env_config(num_trajectories=4, n_steps=100, max_inventory=5.0)
    agent = CarteaJaimungalMmAgent.from_config(cfg, max_inventory=5)
    pol = agent.policy()
    obs = np.zeros((3, 4), dtype=np.float32)
    obs[:, 1] = 2.0  # same inventory
    obs[:, 2] = [0.0, 0.5, 0.99]  # different times
    obs[:, 3] = 100.0
    a = np.asarray(pol(None, jnp.asarray(obs), None))
    # CJ quotes vary with time-to-horizon; identical rows would mean the
    # batch collapsed onto row 0's timestamp.
    assert not np.allclose(a[0], a[2]), a


def test_scaling_report_efficiency_normalisation():
    from mbt_gym_tpu.agents.baseline import fixed_spread_policy
    from mbt_gym_tpu.utils.profiling import scaling_report

    cfg = as_env_config(num_trajectories=64, n_steps=5)
    rows = scaling_report(cfg, fixed_spread_policy(1.0), device_counts=[2, 4], episodes_per_call=1)
    # First measured width defines the baseline: efficiency == 1 by definition.
    assert rows[0]["efficiency"] == pytest.approx(1.0)


def test_episode_stats_spread_uses_quote_columns_only():
    from mbt_gym_tpu.rollout import episode_stats
    from mbt_gym_tpu.types import Trajectory

    cfg = as_env_config(num_trajectories=2, n_steps=3)
    actions = np.zeros((3, 2, 4), dtype=np.float32)
    actions[..., :2] = 0.5  # quotes
    actions[..., 2:] = 1.0  # MO flags must NOT enter the spread
    traj = Trajectory(
        observations=jnp.zeros((4, 2, 4)), actions=jnp.asarray(actions), rewards=jnp.zeros((3, 2))
    )
    stats = episode_stats(cfg, traj)
    assert float(stats["mean_spread"]) == pytest.approx(1.0)


def test_episode_stats_spread_meaningful_or_nan_per_dynamics_family():
    """VERDICT r4 weak #4: the spread stat must be meaningful-or-NaN for
    every dynamics family — quote units for limit/lam, NaN (+ post_rate)
    for at-the-touch's binary flags, NaN for speed's 1-column actions."""
    from functools import partial

    from mbt_gym_tpu.agents.baseline import (
        fixed_action_policy, fixed_spread_policy,
    )
    from mbt_gym_tpu.rollout import episode_stats, mc_episode_stats, rollout
    from mbt_gym_tpu.utils.config import (
        lam_env_config, oe_env_config, touch_env_config,
    )

    cases = [
        # (cfg, policy, expected mean_spread, expects post_rate)
        (as_env_config(num_trajectories=32, n_steps=5),
         fixed_spread_policy(1.0), 2.0, None),
        (lam_env_config(num_trajectories=32, n_steps=5),
         fixed_action_policy([0.6, 0.6, 1.0, 1.0]), 1.2, None),
        (touch_env_config(num_trajectories=32, n_steps=5),
         fixed_action_policy([1.0, 0.0]), np.nan, 0.5),
        (oe_env_config(num_trajectories=32, n_steps=5),
         fixed_action_policy([-3.0]), np.nan, None),
    ]
    for cfg, pol, want_spread, want_post in cases:
        res = jax.jit(partial(rollout, cfg, pol, None))(jax.random.PRNGKey(0))
        stats = episode_stats(cfg, res.trajectory)
        mc = jax.jit(partial(mc_episode_stats, cfg, pol, None))(
            jax.random.PRNGKey(0)
        )
        for s in (stats, mc):
            if np.isnan(want_spread):
                assert np.isnan(float(s["mean_spread"])), (cfg.dynamics, s)
            else:
                assert float(s["mean_spread"]) == pytest.approx(
                    want_spread, abs=1e-5
                ), (cfg.dynamics, s)
            if want_post is not None:
                assert float(s["post_rate"]) == pytest.approx(
                    want_post, abs=1e-5
                )
            else:
                assert "post_rate" not in s
