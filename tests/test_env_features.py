"""Env feature coverage: random/late start times, reward scaling flag,
normalisation roundtrips, clip diagnostics, plotting smoke."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mbt_gym_tpu import env as env_lib
from mbt_gym_tpu import jit_rollout, rollout
from mbt_gym_tpu.agents.baseline import AvellanedaStoikovAgent, fixed_spread_policy
from mbt_gym_tpu.utils.config import as_env_config


def test_fixed_late_start_time_shortens_episode():
    cfg = as_env_config(num_trajectories=8, n_steps=100)
    cfg = dataclasses.replace(cfg, start_time=0.5)
    res = jit_rollout(cfg, fixed_spread_policy(1.0), None, jax.random.PRNGKey(0))
    # scan length = remaining steps only
    assert res.trajectory.rewards.shape[0] == 50
    np.testing.assert_allclose(float(res.trajectory.observations[0, 0, 2]), 0.5, atol=1e-6)
    np.testing.assert_allclose(float(res.final_state.time[0]), 1.0, atol=1e-5)


def test_random_start_time_masks_post_done_steps():
    cfg = as_env_config(num_trajectories=8, n_steps=40)
    cfg = dataclasses.replace(cfg, start_time=("uniform", 0.25, 0.75))
    res = rollout(cfg, fixed_spread_policy(1.0), None, jax.random.PRNGKey(3))
    start = float(res.trajectory.observations[0, 0, 2])
    assert 0.25 - 1e-6 <= start <= 0.75 + 1e-6
    # quantised to the step grid
    assert abs(start / cfg.step_size - round(start / cfg.step_size)) < 1e-5
    # post-done steps frozen: time never exceeds T, rewards past done are 0
    times = np.asarray(res.trajectory.observations[:, 0, 2])
    assert times.max() <= cfg.terminal_time + 1e-5
    n_live = round((cfg.terminal_time - start) / cfg.step_size)
    rewards = np.asarray(res.trajectory.rewards)
    assert np.allclose(rewards[n_live:], 0.0)
    assert not np.allclose(rewards[:n_live], 0.0)


def test_random_initial_inventory_draws_in_range():
    cfg = as_env_config(num_trajectories=256)
    cfg = dataclasses.replace(cfg, initial_inventory=(-3, 4))
    state, obs = env_lib.reset(cfg, jax.random.PRNGKey(0))
    inv = np.asarray(state.inventory)
    assert inv.min() >= -3 and inv.max() <= 3  # exclusive high, like rng.integers
    assert len(np.unique(inv)) > 1
    np.testing.assert_array_equal(np.asarray(state.initial_inventory), inv)


def test_reward_scaling_flag():
    cfg = as_env_config(num_trajectories=8, n_steps=10)
    scaled = dataclasses.replace(cfg, reward_scaling=0.25)
    key = jax.random.PRNGKey(0)
    res = jit_rollout(cfg, fixed_spread_policy(1.0), None, key)
    res_scaled = jit_rollout(scaled, fixed_spread_policy(1.0), None, key)
    np.testing.assert_allclose(
        np.asarray(res_scaled.trajectory.rewards),
        0.25 * np.asarray(res.trajectory.rewards),
        rtol=1e-6,
    )


def test_normalisation_roundtrip():
    cfg = as_env_config(num_trajectories=16)
    ncfg = dataclasses.replace(cfg, normalise_observation_space=True, normalise_action_space=True)
    state, obs = env_lib.reset(ncfg, jax.random.PRNGKey(0))
    raw = env_lib.raw_observation(ncfg, state)
    low, high = ncfg.observation_bounds()
    recovered = (np.asarray(obs) + 1.0) * (high - low) / 2 + low
    np.testing.assert_allclose(recovered, np.asarray(raw), rtol=1e-4, atol=1e-4)
    # action roundtrip
    a = np.asarray([[0.3, -0.7]] * 16, dtype=np.float32)
    back = env_lib.normalise_action(ncfg, env_lib.denormalise_action(ncfg, jnp.asarray(a)))
    np.testing.assert_allclose(np.asarray(back), a, atol=1e-5)


def test_clip_events_counter():
    from mbt_gym_tpu.analytics.diagnostics import clip_event_count, max_abs_inventory
    from mbt_gym_tpu.dynamics import TradingWithSpeedDynamics
    from mbt_gym_tpu.processes import BrownianMotionMidprice, TemporaryAndPermanentImpact

    # Limit-order dynamics never exceed max_inventory (fills are masked), so
    # no clip events fire there...
    cfg = dataclasses.replace(as_env_config(num_trajectories=8, n_steps=20), max_inventory=1.0)

    def greedy(params, obs, state):
        return jnp.full((obs.shape[0], 2), 0.01, dtype=obs.dtype)

    res = jit_rollout(cfg, greedy, None, jax.random.PRNGKey(0))
    assert np.abs(np.asarray(max_abs_inventory(res.trajectory))) <= 1.0
    assert int(clip_event_count(res.final_state)) == 0

    # ...but speed dynamics can push past the bound and must be clipped AND
    # counted (the engine's replacement for the reference's printed warning).
    speed_cfg = env_lib.EnvConfig(
        dynamics=TradingWithSpeedDynamics(
            midprice_model=BrownianMotionMidprice(),
            price_impact_model=TemporaryAndPermanentImpact(),
        ),
        n_steps=20, num_trajectories=8, max_inventory=1.0,
    )
    fast = jit_rollout(
        speed_cfg, lambda p, o, s: jnp.full((o.shape[0], 1), 50.0, o.dtype), None,
        jax.random.PRNGKey(0),
    )
    assert np.abs(np.asarray(fast.trajectory.observations[:, :, 1])).max() <= 1.0
    assert int(clip_event_count(fast.final_state)) > 0


def test_expected_action_stochastic_policy():
    from mbt_gym_tpu.agents.baseline import expected_action, random_policy

    cfg = as_env_config(num_trajectories=4)
    state, obs = env_lib.reset(cfg, jax.random.PRNGKey(0))
    pol = random_policy(cfg)
    mean_action = expected_action(pol, None, obs, state, jax.random.PRNGKey(1), n_samples=512)
    low, high = cfg.action_bounds()
    # MC mean approaches the uniform midpoint
    expected = np.broadcast_to((low + high) / 2, mean_action.shape)
    np.testing.assert_allclose(
        np.asarray(mean_action), expected, atol=float(0.15 * (high - low).max())
    )


def test_plot_trajectory_smoke():
    import matplotlib

    matplotlib.use("Agg")
    from mbt_gym_tpu.analytics.plotting import plot_policy_slices, plot_trajectory

    cfg = as_env_config(num_trajectories=4, n_steps=20)
    agent = AvellanedaStoikovAgent.from_config(cfg)
    res = jit_rollout(cfg, agent.policy(), None, jax.random.PRNGKey(0))
    fig = plot_trajectory(cfg, res.trajectory)
    assert fig is not None
    figs = plot_policy_slices(cfg, agent.policy(), inventories=(-1, 0, 1))
    assert len(figs) == 2


def test_late_start_with_injected_noise_stops_at_terminal():
    from mbt_gym_tpu.ops.compat import reference_noise_cube

    cfg = as_env_config(num_trajectories=8, n_steps=40)
    cfg = dataclasses.replace(cfg, start_time=0.5)
    noise = reference_noise_cube(dataclasses.replace(cfg, start_time=0.0), 7)
    res = rollout(cfg, fixed_spread_policy(1.0), None, jax.random.PRNGKey(0), noise=noise)
    assert res.trajectory.rewards.shape[0] == 20  # only the remaining steps
    np.testing.assert_allclose(float(res.final_state.time[0]), 1.0, atol=1e-5)


def test_cjmm_telescopes_on_real_rollouts():
    """Rollout-level invariant: with identical noise, episode totals of the
    pathwise CjMm criterion equal RunningInventoryPenalty's
    (RewardFunctions.py:77-113 decomposition)."""
    from mbt_gym_tpu.ops.compat import reference_noise_cube
    from mbt_gym_tpu.rewards import CjMmCriterion, RunningInventoryPenalty
    from mbt_gym_tpu.utils.config import cj_env_config

    base = cj_env_config(num_trajectories=32, n_steps=50, max_inventory=10.0, dtype="float64")
    from jax import enable_x64

    with enable_x64():
        noise = reference_noise_cube(base, 5, dtype="float64")
        totals = {}
        for name, reward in {
            "cjmm": CjMmCriterion(0.01, 0.001, terminal_time=1.0),
            "rip": RunningInventoryPenalty(0.01, 0.001),
        }.items():
            cfg = dataclasses.replace(base, reward_function=reward)
            res = rollout(cfg, fixed_spread_policy(0.7), None, jax.random.PRNGKey(0), noise=noise)
            totals[name] = np.asarray(res.trajectory.rewards.sum(axis=0))
        np.testing.assert_allclose(totals["cjmm"], totals["rip"], atol=1e-9)


def test_predraw_noise_mode_statistics_and_determinism():
    """native_noise_cube predraw: deterministic in (key, config), same
    distribution as per-step noise (episode stats agree within MC error)."""
    from mbt_gym_tpu.agents.baseline import AvellanedaStoikovAgent
    from mbt_gym_tpu.rollout import episode_stats, rollout

    cfg = as_env_config(num_trajectories=512, n_steps=50)
    pol = AvellanedaStoikovAgent.from_config(cfg, risk_aversion=0.1).policy()
    r1 = rollout(cfg, pol, None, jax.random.PRNGKey(3), predraw_noise=True)
    r2 = rollout(cfg, pol, None, jax.random.PRNGKey(3), predraw_noise=True)
    np.testing.assert_array_equal(
        np.asarray(r1.trajectory.rewards), np.asarray(r2.trajectory.rewards)
    )
    s_pre = {k: float(v) for k, v in episode_stats(cfg, r1.trajectory).items()}
    r3 = rollout(cfg, pol, None, jax.random.PRNGKey(3), predraw_noise=False)
    s_step = {k: float(v) for k, v in episode_stats(cfg, r3.trajectory).items()}
    # Different stream, same distribution: means agree within a few SE.
    assert abs(s_pre["mean_pnl"] - s_step["mean_pnl"]) < 4 * s_step["std_pnl"] / np.sqrt(512) + 1e-6
    assert abs(s_pre["mean_spread"] - s_step["mean_spread"]) < 0.02


def test_market_order_money_pump_is_reference_faithful():
    """Reference quirk pinned (found by the round-4 RL A/B): market orders
    are NOT masked at max inventory (only limit fills are,
    TradingEnvironment.py:199-201) and the inventory clip keeps the MO's
    cash (TradingEnvironment.py:283-289 clips inventory and cash
    INDEPENDENTLY after ModelDynamics.update_state already credited
    `mo_sell * best_bid`).  An agent pinned at -max_inventory therefore
    earns ~best_bid (~initial_price) of marked-to-market PnL per step by
    selling a market order it cannot deliver.  We reproduce the mechanics
    faithfully; the reference's canonical training env sidesteps the pump
    by setting max_inventory = n_steps (helpers.py:56), making the clip
    unreachable profitably within one episode (1 unit/step ramp).  RL on
    this env with a small max_inventory override WILL discover the pump
    (round-4 capture: deterministic evals ~7100 vs the ~68 closed-form
    baseline) — see scripts/exp_ab_learning.py."""
    from mbt_gym_tpu.utils.config import learning_env_config

    cfg = dataclasses.replace(
        learning_env_config(num_trajectories=4), max_inventory=3.0
    )

    def sell_mo_every_step(params, obs, state):
        n = obs.shape[0]
        # deep quotes (never filled), no buy MO, sell MO every step
        return jnp.stack(
            [jnp.full((n,), 30.0)] * 2 + [jnp.zeros((n,)), jnp.ones((n,))],
            axis=1,
        ).astype(obs.dtype)

    res = jit_rollout(cfg, sell_mo_every_step, None, jax.random.PRNGKey(0))
    state = res.final_state
    # inventory pinned at the clip; cash grew ~best_bid per post-pin step
    np.testing.assert_allclose(np.asarray(state.inventory), -3.0, atol=1e-5)
    total_reward = float(res.trajectory.rewards.sum(axis=0).mean())
    n_pinned_steps = cfg.n_steps - 3  # ramp from initial inventory ~0
    assert total_reward > 0.8 * 99.0 * n_pinned_steps, total_reward


def test_market_order_mask_closes_money_pump():
    """Repo-addition flag (EnvConfig.mask_market_orders_at_max_inventory):
    the same sell-MO-every-step scenario as the reference-faithful pump
    test above must be UNPROFITABLE with the mask on — market orders are
    blocked at the +/- max_inventory boundary with the limit-fill mask's
    strict at-boundary convention, so the agent only ever sells the 3
    units it can deliver (each costing the half-spread mark-to-market)."""
    from mbt_gym_tpu.utils.config import learning_env_config

    cfg = dataclasses.replace(
        learning_env_config(num_trajectories=4, initial_inventory=0),
        max_inventory=3.0,
        mask_market_orders_at_max_inventory=True,
    )

    def sell_mo_every_step(params, obs, state):
        n = obs.shape[0]
        return jnp.stack(
            [jnp.full((n,), 30.0)] * 2 + [jnp.zeros((n,)), jnp.ones((n,))],
            axis=1,
        ).astype(obs.dtype)

    res = jit_rollout(cfg, sell_mo_every_step, None, jax.random.PRNGKey(0))
    state = res.final_state
    # ramp to the boundary, then every further sell MO is rejected
    np.testing.assert_allclose(np.asarray(state.inventory), -3.0, atol=1e-5)
    total_reward = float(res.trajectory.rewards.sum(axis=0).mean())
    # no pump: |reward| bounded by the 3 executed sells' proceeds + the
    # inventory penalties, nowhere near the faithful test's ~0.8*99*T
    assert abs(total_reward) < 400.0, total_reward
    # cash = 3 executed sells at ~(price - half_spread), not T sells
    assert float(np.max(np.asarray(state.cash))) < 3.5 * 100.0, state.cash


def test_market_order_mask_requires_lam_dynamics():
    with pytest.raises(AssertionError, match="mask_market_orders"):
        dataclasses.replace(
            as_env_config(num_trajectories=4),
            mask_market_orders_at_max_inventory=True,
        )
