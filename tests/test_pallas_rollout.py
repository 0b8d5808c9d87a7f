"""Fused MLP-policy rollout kernel: noise-injected parity vs the XLA
engine + networks on the SAME draws (interpret mode, runs in CI on CPU)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mbt_gym_tpu import env as env_lib
from mbt_gym_tpu.agents import networks
from mbt_gym_tpu.ops import pallas_rollout
from mbt_gym_tpu.types import SlotNoise
from mbt_gym_tpu.utils.config import as_env_config

N, T = 128, 6


@pytest.fixture(scope="module")
def setup():
    env_cfg = dataclasses.replace(
        as_env_config(num_trajectories=N, n_steps=T),
        normalise_observation_space=True, normalise_action_space=True,
    )
    params = networks.init_actor_critic(
        jax.random.PRNGKey(3), env_cfg.state_dim, env_cfg.action_dim,
        hidden=(16, 16), shared_trunk=True,
    )
    rng = np.random.default_rng(9)
    channels = rng.uniform(size=(T, pallas_rollout.N_CHANNELS, N)).astype(np.float32)
    channels[:, 4:7] = rng.normal(size=(T, 3, N)).astype(np.float32)
    return env_cfg, params, jnp.asarray(channels)


def _xla_reference(env_cfg, params, channels):
    """Independent replica: the general engine + networks on the same
    injected noise, mirroring agents.ppo.collect_rollout's conventions."""
    state, obs = env_lib.reset(env_cfg, jax.random.PRNGKey(0))
    std = jnp.exp(params["log_std"])
    outs = []
    for t in range(T):
        mean, v = networks.policy_value(params, obs)
        eps = channels[t, 4:6].T  # (N, 2)
        action = mean + std * eps
        logp = networks.gaussian_log_prob(params, mean, action)
        clipped = jnp.clip(action, -1.0, 1.0)
        noise = (
            SlotNoise(normal=channels[t, 6][:, None], uniform=None),
            SlotNoise(normal=None, uniform=channels[t, 0:2].T),
            SlotNoise(normal=None, uniform=channels[t, 2:4].T),
        )
        res = env_lib.step(env_cfg, state, clipped, noise=noise)
        outs.append((obs, action, logp, v, res.reward))
        state, obs = res.state, res.obs
    return [jnp.stack(x) for x in zip(*outs)]


def test_fused_rollout_matches_xla_engine(setup):
    env_cfg, params, channels = setup
    batch = pallas_rollout.collect_rollout_fused(
        env_cfg, params, jax.random.PRNGKey(0), tile=128,
        interpret=True, noise=channels,
    )
    ref_obs, ref_act, ref_logp, ref_v, ref_r = _xla_reference(env_cfg, params, channels)

    # f32 accumulation-order noise only: per-step diffs plateau ~2e-4 with
    # no fill flips (inventory paths identical).
    np.testing.assert_allclose(np.asarray(batch.obs), np.asarray(ref_obs), rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(batch.actions), np.asarray(ref_act), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(batch.log_probs), np.asarray(ref_logp), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(batch.values), np.asarray(ref_v), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(batch.rewards), np.asarray(ref_r), rtol=1e-4, atol=5e-3)

    # GAE consistency with the shared compute_gae on the same rewards/values
    from mbt_gym_tpu.agents.ppo import compute_gae

    adv, ret = compute_gae(batch.rewards, batch.values, jnp.zeros_like(batch.values[0]), 1.0, 0.95)
    np.testing.assert_allclose(np.asarray(batch.advantages), np.asarray(adv), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(batch.returns), np.asarray(ret), rtol=0, atol=0)


def test_fused_rollout_separate_towers_matches_xla_engine(setup):
    """Separate pi/vf towers (the reference's net_arch convention,
    experiments/helpers.py:71) run inside the rollout kernel as a stacked
    trunk with a zero-off-block merged head (round 4) — same injected
    noise, same engine reference, same tolerances as the shared-trunk
    parity test."""
    env_cfg, _, channels = setup
    params = networks.init_actor_critic(
        jax.random.PRNGKey(3), env_cfg.state_dim, env_cfg.action_dim,
        hidden=(16, 16), shared_trunk=False,
    )
    batch = pallas_rollout.collect_rollout_fused(
        env_cfg, params, jax.random.PRNGKey(0), tile=128,
        interpret=True, noise=channels,
    )
    ref_obs, ref_act, ref_logp, ref_v, ref_r = _xla_reference(env_cfg, params, channels)
    np.testing.assert_allclose(np.asarray(batch.obs), np.asarray(ref_obs), rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(batch.actions), np.asarray(ref_act), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(batch.log_probs), np.asarray(ref_logp), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(batch.values), np.asarray(ref_v), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(batch.rewards), np.asarray(ref_r), rtol=1e-4, atol=5e-3)


def _xla_reference_random_start(env_cfg, params, channels, t0):
    """XLA-engine replica with the random-start masking of rollout.py:
    reset at the shared t0, scan the FULL horizon, freeze post-done state/
    obs and zero post-done rewards."""
    state, obs = env_lib.reset(env_cfg, jax.random.PRNGKey(0), start_time=t0)
    std = jnp.exp(params["log_std"])
    outs = []
    for t in range(env_cfg.n_steps):
        mean, v = networks.policy_value(params, obs)
        eps = channels[t, 4:6].T
        action = mean + std * eps
        logp = networks.gaussian_log_prob(params, mean, action)
        clipped = jnp.clip(action, -1.0, 1.0)
        noise = (
            SlotNoise(normal=channels[t, 6][:, None], uniform=None),
            SlotNoise(normal=None, uniform=channels[t, 0:2].T),
            SlotNoise(normal=None, uniform=channels[t, 2:4].T),
        )
        res = env_lib.step(env_cfg, state, clipped, noise=noise)
        # scalar condition, exactly as rollout.py's random-start masking
        # (shared t0 -> every env finishes at the same step)
        was_done = state.time[0] >= env_cfg.terminal_time - env_cfg.step_size / 2
        new_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(was_done, old, new), res.state, state
        )
        reward = jnp.where(was_done, 0.0, res.reward)
        new_obs = jnp.where(was_done, obs, res.obs)
        outs.append((obs, action, logp, v, reward))
        state, obs = new_state, new_obs
    return [jnp.stack(x) for x in zip(*outs)]


def test_fused_rollout_random_start_matches_xla_engine(setup):
    """Random start times on the fused pipeline (VERDICT r3 item 2): a
    ("uniform", lo, hi) start-time spec, the shared per-episode draw
    injected as the kernel's t0 plane, must reproduce the XLA engine's
    masking — frozen post-done obs (time clamped at terminal), zero
    post-done rewards — on the same injected noise."""
    base_cfg, params, channels = setup
    env_cfg = dataclasses.replace(base_cfg, start_time=("uniform", 0.0, 0.5))
    # T=6, dt=1/6: t0 = 2 grid steps -> 4 valid steps, 2 frozen.
    t0_val = 2 * env_cfg.step_size
    t0 = jnp.full((N,), t0_val, jnp.float32)
    batch = pallas_rollout.collect_rollout_fused(
        env_cfg, params, jax.random.PRNGKey(0), tile=128,
        interpret=True, noise=channels, t0=t0,
    )
    ref_obs, ref_act, ref_logp, ref_v, ref_r = _xla_reference_random_start(
        env_cfg, params, channels, t0_val
    )
    np.testing.assert_allclose(np.asarray(batch.obs), np.asarray(ref_obs), rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(batch.actions), np.asarray(ref_act), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(batch.log_probs), np.asarray(ref_logp), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(batch.values), np.asarray(ref_v), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(batch.rewards), np.asarray(ref_r), rtol=1e-4, atol=5e-3)
    # the post-done tail really is frozen: zero rewards, constant obs
    np.testing.assert_allclose(np.asarray(batch.rewards[-2:]), 0.0, atol=0)
    np.testing.assert_allclose(
        np.asarray(batch.obs[-1]), np.asarray(batch.obs[-2]), atol=0
    )


def test_fused_rollout_per_env_start_times_self_consistent(setup):
    """The t0 plane is genuinely PER-ENV: a mixed plane (half the envs at
    t0=0, half at t0=2dt) must reproduce, lane for lane, two separate
    shared-t0 runs on the matching noise slices."""
    base_cfg, params, channels = setup
    # 2N envs (the kernel needs >=128 lanes per tile): the same noise block
    # twice, halves distinguished only by their t0 plane values.
    env_cfg = dataclasses.replace(
        base_cfg, start_time=("uniform", 0.0, 0.5), num_trajectories=2 * N
    )
    channels2 = jnp.concatenate([channels, channels], axis=2)
    t0_val = 2 * env_cfg.step_size
    t0 = jnp.concatenate([
        jnp.zeros((N,), jnp.float32), jnp.full((N,), t0_val, jnp.float32)
    ])
    mixed = pallas_rollout.collect_rollout_fused(
        env_cfg, params, jax.random.PRNGKey(0), tile=128,
        interpret=True, noise=channels2, t0=t0,
    )
    for sl, val in [(slice(0, N), 0.0), (slice(N, 2 * N), t0_val)]:
        cfg_half = dataclasses.replace(env_cfg, num_trajectories=N)
        solo = pallas_rollout.collect_rollout_fused(
            cfg_half, params, jax.random.PRNGKey(0), tile=128,
            interpret=True, noise=channels,
            t0=jnp.full((N,), val, jnp.float32),
        )
        np.testing.assert_allclose(
            np.asarray(mixed.rewards[:, sl]), np.asarray(solo.rewards),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(mixed.obs[:, sl]), np.asarray(solo.obs),
            rtol=1e-5, atol=1e-5,
        )


def test_fully_fused_iteration_separate_towers_runs():
    """The REFERENCE-EXACT architecture (separate 2-layer towers) through
    the FULLY-fused pipeline (fused rollout -> feature-major fused update),
    interpret-mode smoke on CPU: finite metrics + params move."""
    from mbt_gym_tpu.agents import ppo

    env_cfg = dataclasses.replace(
        as_env_config(num_trajectories=128, n_steps=8),
        normalise_observation_space=True, normalise_action_space=True,
    )
    ppo_cfg = ppo.PPOConfig(
        hidden=(16, 16), n_epochs=1, n_minibatches=2, shuffle=False,
        shared_trunk=False, fused_rollout=True, fused_rollout_tile=128,
        fused_update=True, fused_compute_dtype="float32",
        fused_interpret_ok=True,
    )
    ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
    ts2, m = ppo.train_iteration(env_cfg, ppo_cfg, ts, jax.random.PRNGKey(1))
    assert all(np.isfinite(float(v)) for v in m.values()), m
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), ts.params, ts2.params
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0.0


class _UnknownReward:
    """An unsupported reward type for guard tests."""

    def calculate(self, *a):  # pragma: no cover
        raise NotImplementedError


def test_fused_rollout_config_guard():
    from mbt_gym_tpu.rewards import CjMmCriterion, ExponentialUtility, RunningInventoryPenalty

    cfg = as_env_config(num_trajectories=N)
    bad = dataclasses.replace(cfg, reward_function=_UnknownReward())
    with pytest.raises(AssertionError, match="limit dynamics.*supports"):
        pallas_rollout.rollout_params_from_config(bad)
    # non-quadratic inventory exponents are supported too
    p = pallas_rollout.rollout_params_from_config(
        dataclasses.replace(
            cfg, reward_function=RunningInventoryPenalty(inventory_exponent=3.0)
        )
    )
    assert p.reward_kind == "running" and p.inventory_exponent == 3.0
    # ExponentialUtility is a supported terminal-only reward kind
    p = pallas_rollout.rollout_params_from_config(
        dataclasses.replace(cfg, reward_function=ExponentialUtility(risk_aversion=0.3))
    )
    assert p.reward_kind == "exp_utility" and p.risk_aversion == 0.3
    # CjMm / RunningInventoryPenalty (exponent 2) are supported reward kinds.
    p = pallas_rollout.rollout_params_from_config(
        dataclasses.replace(
            cfg,
            reward_function=CjMmCriterion(
                per_step_inventory_aversion=0.5,
                terminal_inventory_aversion=0.001,
                terminal_time=cfg.terminal_time,
            ),
        )
    )
    assert p.reward_kind == "cjmm" and p.phi == 0.5 and p.alpha == 0.001
    p = pallas_rollout.rollout_params_from_config(
        dataclasses.replace(cfg, reward_function=RunningInventoryPenalty())
    )
    assert p.reward_kind == "running"


@pytest.mark.parametrize(
    "reward_name", ["cjmm", "running", "exp_utility", "cjmm_e3", "running_e3"]
)
def test_fused_rollout_cj_rewards_match_xla_engine(reward_name):
    """The CJ market-making reward kinds ("learning to make a market") must
    reproduce the XLA engine's per-step rewards on the same noise."""
    from mbt_gym_tpu.rewards import CjMmCriterion, RunningInventoryPenalty

    from mbt_gym_tpu.rewards import ExponentialUtility

    if reward_name in ("cjmm", "cjmm_e3"):
        reward = CjMmCriterion(
            per_step_inventory_aversion=0.5,
            terminal_inventory_aversion=0.001,
            terminal_time=1.0,
            inventory_exponent=3.0 if reward_name == "cjmm_e3" else 2.0,
        )
    elif reward_name == "running_e3":
        reward = RunningInventoryPenalty(
            per_step_inventory_aversion=0.5, terminal_inventory_aversion=0.001,
            inventory_exponent=3.0,
        )
    elif reward_name == "exp_utility":
        # tiny risk aversion keeps exp(-gamma*wealth) in a testable range
        # at price ~ 100
        reward = ExponentialUtility(risk_aversion=0.01)
    else:
        reward = RunningInventoryPenalty(
            per_step_inventory_aversion=0.5, terminal_inventory_aversion=0.001
        )
    env_cfg = dataclasses.replace(
        as_env_config(num_trajectories=N, n_steps=T),
        reward_function=reward, initial_inventory=3,
        normalise_observation_space=True, normalise_action_space=True,
    )
    params = networks.init_actor_critic(
        jax.random.PRNGKey(3), env_cfg.state_dim, env_cfg.action_dim,
        hidden=(16, 16), shared_trunk=True,
    )
    rng = np.random.default_rng(13)
    channels = rng.uniform(size=(T, pallas_rollout.N_CHANNELS, N)).astype(np.float32)
    channels[:, 4:7] = rng.normal(size=(T, 3, N)).astype(np.float32)
    channels = jnp.asarray(channels)

    batch = pallas_rollout.collect_rollout_fused(
        env_cfg, params, jax.random.PRNGKey(0), tile=128,
        interpret=True, noise=channels,
    )
    _, _, _, _, ref_r = _xla_reference(env_cfg, params, channels)
    np.testing.assert_allclose(
        np.asarray(batch.rewards), np.asarray(ref_r), rtol=1e-4, atol=5e-3
    )


def test_train_iteration_with_fused_rollout_runs():
    """End-to-end: fused rollout + fused update inside train_iteration on
    CPU interpret mode — finite metrics and param movement."""
    from mbt_gym_tpu.agents import ppo

    env_cfg = dataclasses.replace(
        as_env_config(num_trajectories=128, n_steps=8),
        normalise_observation_space=True, normalise_action_space=True,
    )
    ppo_cfg = ppo.PPOConfig(
        hidden=(16, 16), n_epochs=1, n_minibatches=2, shuffle=False,
        shared_trunk=True, fused_rollout=True, fused_rollout_tile=128,
        fused_interpret_ok=True,
        fused_update=True, fused_tile=128, fused_compute_dtype="float32",
    )
    ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
    new_ts, metrics = ppo.train_iteration(env_cfg, ppo_cfg, ts, jax.random.PRNGKey(1))
    for v in metrics.values():
        assert np.isfinite(float(v)), metrics
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(ts.params), jax.tree_util.tree_leaves(new_ts.params))
    )
    assert moved


def test_auto_tile_selection():
    """auto_tile picks the widest lane tile fitting Mosaic's 16M scoped
    vmem (pallas_rollout.auto_tile); 2048 exceeds it at T=200 but fits at
    short horizons, and noise-injected runs budget the extra input block."""
    at = pallas_rollout.auto_tile
    assert at(1 << 18, 200, False) == 1024  # config-5 production choice
    assert at(1 << 18, 40, False) == 2048  # short horizon frees vmem
    assert at(1 << 18, 200, True) < at(1 << 18, 200, False)  # noise block costs
    assert at(512, 200, False) == 512  # never exceeds n
    assert at(640, 200, False) == 128  # must divide n
    tile = at(1 << 18, 200, False)
    assert (1 << 18) % tile == 0 and tile % pallas_rollout.LANES == 0


# ------------------------------------------------------- speed dynamics (OE)
def _xla_reference_speed(env_cfg, params, channels):
    """Independent replica of the fused speed-dynamics rollout: the general
    engine + networks on the same injected noise (optimal-execution family,
    utils.config.oe_env_config — normalise flags off, so actions clip to
    the +/- max_speed box)."""
    state, obs = env_lib.reset(env_cfg, jax.random.PRNGKey(0))
    std = jnp.exp(params["log_std"])
    low, high = env_cfg.action_bounds()
    outs = []
    for t in range(T):
        mean, v = networks.policy_value(params, obs)
        eps = channels[t, 4:5].T  # (N, 1)
        action = mean + std * eps
        logp = networks.gaussian_log_prob(params, mean, action)
        clipped = jnp.clip(action, low, high)
        noise = (
            SlotNoise(normal=channels[t, 6][:, None], uniform=None),
            SlotNoise(normal=None, uniform=None),  # impact model: noise-free
        )
        res = env_lib.step(env_cfg, state, clipped, noise=noise)
        outs.append((obs, action, logp, v, res.reward))
        state, obs = res.state, res.obs
    return [jnp.stack(x) for x in zip(*outs)]


@pytest.mark.parametrize("reward_name", ["cjoe", "pnl"])
def test_fused_rollout_speed_dynamics_matches_xla_engine(reward_name):
    """Optimal-execution family: trading-speed dynamics + temporary-and-
    permanent impact with the CjOe / PnL rewards must reproduce the XLA
    engine on the same noise (interpret mode)."""
    from mbt_gym_tpu.rewards import PnL
    from mbt_gym_tpu.utils.config import oe_env_config

    env_cfg = oe_env_config(num_trajectories=N, n_steps=T)
    if reward_name == "pnl":
        env_cfg = dataclasses.replace(env_cfg, reward_function=PnL())
    params = networks.init_actor_critic(
        jax.random.PRNGKey(5), env_cfg.state_dim, env_cfg.action_dim,
        hidden=(16, 16), shared_trunk=True,
    )
    rng = np.random.default_rng(21)
    channels = rng.uniform(size=(T, pallas_rollout.N_CHANNELS, N)).astype(np.float32)
    channels[:, 4:7] = rng.normal(size=(T, 3, N)).astype(np.float32)
    channels = jnp.asarray(channels)

    p = pallas_rollout.rollout_params_from_config(env_cfg)
    assert p.dynamics_kind == "speed"
    assert p.reward_kind == reward_name

    batch = pallas_rollout.collect_rollout_fused(
        env_cfg, params, jax.random.PRNGKey(0), tile=128,
        interpret=True, noise=channels,
    )
    ref_obs, ref_act, ref_logp, ref_v, ref_r = _xla_reference_speed(
        env_cfg, params, channels
    )
    np.testing.assert_allclose(np.asarray(batch.obs), np.asarray(ref_obs), rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(batch.actions), np.asarray(ref_act), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(batch.log_probs), np.asarray(ref_logp), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(batch.values), np.asarray(ref_v), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(batch.rewards), np.asarray(ref_r), rtol=1e-4, atol=5e-3)


def test_speed_dynamics_config_guard():
    from mbt_gym_tpu.processes.impact import TemporaryPowerImpact
    from mbt_gym_tpu.rewards import ExponentialUtility
    from mbt_gym_tpu.utils.config import oe_env_config

    from mbt_gym_tpu.rewards import CjOeCriterion

    cfg = oe_env_config(num_trajectories=N)
    with pytest.raises(AssertionError, match="speed dynamics.*supports"):
        pallas_rollout.rollout_params_from_config(
            dataclasses.replace(cfg, reward_function=_UnknownReward())
        )
    p = pallas_rollout.rollout_params_from_config(
        dataclasses.replace(
            cfg, reward_function=CjOeCriterion(inventory_exponent=3.0)
        )
    )
    assert p.reward_kind == "cjoe" and p.inventory_exponent == 3.0
    p = pallas_rollout.rollout_params_from_config(
        dataclasses.replace(cfg, reward_function=ExponentialUtility(risk_aversion=0.3))
    )
    assert p.reward_kind == "exp_utility" and p.risk_aversion == 0.3
    # all four reference impact models now parse to fused impact kinds
    from mbt_gym_tpu.processes.impact import (
        TemporaryAndTransientImpact, TransientImpact,
    )

    for model, kind in [
        (TemporaryPowerImpact(temporary_impact_exponent=2.0), "power"),
        (TransientImpact(), "transient"),
        (TemporaryAndTransientImpact(), "temp_transient"),
    ]:
        p = pallas_rollout.rollout_params_from_config(
            dataclasses.replace(
                cfg, dynamics=dataclasses.replace(cfg.dynamics, price_impact_model=model)
            )
        )
        assert p.impact_kind == kind, (model, p.impact_kind)


def test_train_iteration_with_fused_speed_rollout_runs():
    """End-to-end fused PPO (rollout + update) on the optimal-execution
    family in CPU interpret mode — finite metrics and param movement."""
    from mbt_gym_tpu.agents import ppo
    from mbt_gym_tpu.utils.config import oe_env_config

    env_cfg = oe_env_config(num_trajectories=128, n_steps=8)
    ppo_cfg = ppo.PPOConfig(
        hidden=(16, 16), n_epochs=1, n_minibatches=2, shuffle=False,
        shared_trunk=True, fused_rollout=True, fused_rollout_tile=128,
        fused_interpret_ok=True,
        fused_update=True, fused_tile=128, fused_compute_dtype="float32",
    )
    ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
    new_ts, metrics = ppo.jit_train_iteration(
        env_cfg, ppo_cfg, ts, jax.random.PRNGKey(1)
    )
    assert all(np.isfinite(float(v)) for v in metrics.values()), metrics
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), ts.params, new_ts.params
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0.0


# ---------------------------------------------------- at-the-touch dynamics
def _touch_env_config(reward_function=None, **kw):
    from mbt_gym_tpu.dynamics import AtTheTouchDynamics
    from mbt_gym_tpu.processes.arrivals import PoissonArrivals
    from mbt_gym_tpu.processes.midprice import BrownianMotionMidprice
    from mbt_gym_tpu.rewards import PnL

    if reward_function is None:
        reward_function = PnL()
    return env_lib.EnvConfig(
        dynamics=AtTheTouchDynamics(
            midprice_model=BrownianMotionMidprice(volatility=2.0),
            arrival_model=PoissonArrivals(intensity=(140.0, 140.0)),
            fixed_market_half_spread=0.5,
        ),
        reward_function=reward_function,
        n_steps=kw.pop("n_steps", T),
        terminal_time=1.0,
        num_trajectories=kw.pop("num_trajectories", N),
        normalise_observation_space=True,
        **kw,
    )


def _xla_reference_touch(env_cfg, params, channels):
    """Independent replica of the fused at-the-touch rollout: the general
    engine + networks on the same injected noise.  Action normalisation is
    forbidden for this family, so actions clip to the {0,1} box; fills are
    the clipped columns themselves (dynamics.AtTheTouchDynamics)."""
    state, obs = env_lib.reset(env_cfg, jax.random.PRNGKey(0))
    std = jnp.exp(params["log_std"])
    low, high = env_cfg.action_bounds()
    outs = []
    for t in range(T):
        mean, v = networks.policy_value(params, obs)
        eps = channels[t, 4:6].T  # (N, 2)
        action = mean + std * eps
        logp = networks.gaussian_log_prob(params, mean, action)
        clipped = jnp.clip(action, low, high)
        noise = (
            SlotNoise(normal=channels[t, 6][:, None], uniform=None),
            SlotNoise(normal=None, uniform=channels[t, 0:2].T),
        )
        res = env_lib.step(env_cfg, state, clipped, noise=noise)
        outs.append((obs, action, logp, v, res.reward))
        state, obs = res.state, res.obs
    return [jnp.stack(x) for x in zip(*outs)]


@pytest.mark.parametrize("reward_name", ["pnl", "cjmm", "running"])
def test_fused_rollout_touch_dynamics_matches_xla_engine(reward_name):
    """At-the-touch family: post-or-not fills at the fixed half-spread with
    the market-making reward kinds must reproduce the XLA engine on the
    same noise (interpret mode)."""
    from mbt_gym_tpu.rewards import CjMmCriterion, PnL, RunningInventoryPenalty

    reward = {
        "pnl": PnL(),
        "cjmm": CjMmCriterion(
            per_step_inventory_aversion=0.5, terminal_inventory_aversion=0.001,
            terminal_time=1.0,
        ),
        "running": RunningInventoryPenalty(
            per_step_inventory_aversion=0.5, terminal_inventory_aversion=0.001
        ),
    }[reward_name]
    env_cfg = _touch_env_config(reward_function=reward)
    params = networks.init_actor_critic(
        jax.random.PRNGKey(11), env_cfg.state_dim, env_cfg.action_dim,
        hidden=(16, 16), shared_trunk=True,
    )
    rng = np.random.default_rng(33)
    channels = rng.uniform(size=(T, pallas_rollout.N_CHANNELS, N)).astype(np.float32)
    channels[:, 4:7] = rng.normal(size=(T, 3, N)).astype(np.float32)
    channels = jnp.asarray(channels)

    p = pallas_rollout.rollout_params_from_config(env_cfg)
    assert p.dynamics_kind == "touch"
    assert p.reward_kind == reward_name
    assert p.fixed_half_spread == 0.5

    batch = pallas_rollout.collect_rollout_fused(
        env_cfg, params, jax.random.PRNGKey(0), tile=128,
        interpret=True, noise=channels,
    )
    ref_obs, ref_act, ref_logp, ref_v, ref_r = _xla_reference_touch(
        env_cfg, params, channels
    )
    np.testing.assert_allclose(np.asarray(batch.obs), np.asarray(ref_obs), rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(batch.actions), np.asarray(ref_act), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(batch.log_probs), np.asarray(ref_logp), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(batch.values), np.asarray(ref_v), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(batch.rewards), np.asarray(ref_r), rtol=1e-4, atol=5e-3)


def test_touch_dynamics_config_guard():
    with pytest.raises(AssertionError, match="touch dynamics.*supports"):
        pallas_rollout.rollout_params_from_config(
            _touch_env_config(reward_function=_UnknownReward())
        )


def test_train_iteration_with_fused_touch_rollout_runs():
    """End-to-end fused PPO (rollout + update) on the at-the-touch family
    in CPU interpret mode — finite metrics and param movement."""
    from mbt_gym_tpu.agents import ppo

    env_cfg = _touch_env_config(num_trajectories=128, n_steps=8)
    ppo_cfg = ppo.PPOConfig(
        hidden=(16, 16), n_epochs=1, n_minibatches=2, shuffle=False,
        shared_trunk=True, fused_rollout=True, fused_rollout_tile=128,
        fused_interpret_ok=True,
        fused_update=True, fused_tile=128, fused_compute_dtype="float32",
    )
    ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
    new_ts, metrics = ppo.jit_train_iteration(
        env_cfg, ppo_cfg, ts, jax.random.PRNGKey(1)
    )
    assert all(np.isfinite(float(v)) for v in metrics.values()), metrics
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), ts.params, new_ts.params
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0.0


# -------------------------------------------- limit-and-market-order dynamics
def _xla_reference_lam(env_cfg, params, channels):
    """Independent replica of the fused limit-and-market-order rollout: the
    general engine + networks on the same injected noise.  The 9-channel
    layout is 4 env uniforms, 4 policy-sample normals (a_dim=4), then the
    midprice normal (pallas_rollout.n_noise_channels)."""
    state, obs = env_lib.reset(env_cfg, jax.random.PRNGKey(0))
    std = jnp.exp(params["log_std"])
    low, high = env_cfg.action_bounds()
    outs = []
    for t in range(T):
        mean, v = networks.policy_value(params, obs)
        eps = channels[t, 4:8].T  # (N, 4)
        action = mean + std * eps
        logp = networks.gaussian_log_prob(params, mean, action)
        clipped = jnp.clip(action, low, high)
        noise = (
            SlotNoise(normal=channels[t, 8][:, None], uniform=None),
            SlotNoise(normal=None, uniform=channels[t, 0:2].T),
            SlotNoise(normal=None, uniform=channels[t, 2:4].T),
        )
        res = env_lib.step(env_cfg, state, clipped, noise=noise)
        outs.append((obs, action, logp, v, res.reward))
        state, obs = res.state, res.obs
    return [jnp.stack(x) for x in zip(*outs)]


@pytest.mark.parametrize("reward_name", ["pnl", "cjmm", "running"])
def test_fused_rollout_lam_dynamics_matches_xla_engine(reward_name):
    """Limit-and-market-order family (a_dim=4): limit quotes plus unit
    market orders at mid +/- half_spread with the market-making reward
    kinds must reproduce the XLA engine on the same noise (interpret
    mode).  The policy-sample normals are scaled up so market orders
    actually fire (columns 2/3 must cross the 0.5 trigger)."""
    from mbt_gym_tpu.rewards import CjMmCriterion, PnL, RunningInventoryPenalty
    from mbt_gym_tpu.utils.config import lam_env_config

    reward = {
        "pnl": PnL(),
        "cjmm": CjMmCriterion(
            per_step_inventory_aversion=0.5, terminal_inventory_aversion=0.001,
            terminal_time=1.0,
        ),
        "running": RunningInventoryPenalty(
            per_step_inventory_aversion=0.5, terminal_inventory_aversion=0.001
        ),
    }[reward_name]
    env_cfg = dataclasses.replace(
        lam_env_config(num_trajectories=N, n_steps=T),
        reward_function=reward, normalise_observation_space=True,
    )
    assert env_cfg.action_dim == 4
    params = networks.init_actor_critic(
        jax.random.PRNGKey(7), env_cfg.state_dim, env_cfg.action_dim,
        hidden=(16, 16), shared_trunk=True,
    )
    # log_std=0 by init; widen the sample spread so MO columns cross 0.5
    params = dict(params, log_std=params["log_std"] + 0.5)
    n_ch = pallas_rollout.n_noise_channels(env_cfg.action_dim)
    assert n_ch == 9
    rng = np.random.default_rng(41)
    channels = rng.uniform(size=(T, n_ch, N)).astype(np.float32)
    channels[:, 4:9] = rng.normal(size=(T, 5, N)).astype(np.float32)
    channels = jnp.asarray(channels)

    p = pallas_rollout.rollout_params_from_config(env_cfg)
    assert p.dynamics_kind == "lam"
    assert p.reward_kind == reward_name
    assert p.fixed_half_spread == 0.5

    batch = pallas_rollout.collect_rollout_fused(
        env_cfg, params, jax.random.PRNGKey(0), tile=128,
        interpret=True, noise=channels,
    )
    ref_obs, ref_act, ref_logp, ref_v, ref_r = _xla_reference_lam(
        env_cfg, params, channels
    )
    # market orders must actually fire for the test to exercise MO paths
    assert float(jnp.sum((ref_act[..., 2:] > 0.5).astype(jnp.float32))) > 0
    np.testing.assert_allclose(np.asarray(batch.obs), np.asarray(ref_obs), rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(batch.actions), np.asarray(ref_act), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(batch.log_probs), np.asarray(ref_logp), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(batch.values), np.asarray(ref_v), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(batch.rewards), np.asarray(ref_r), rtol=1e-4, atol=5e-3)


def test_fused_rollout_lam_mo_mask_matches_xla_engine():
    """Repo-addition MO mask (EnvConfig.mask_market_orders_at_max_inventory):
    with a tight max_inventory and a policy that fires market orders, the
    fused kernel's in-kernel MO gating must reproduce the XLA engine's
    action-column masking on the same injected noise — including steps
    where an env sits AT the boundary and its MO is rejected."""
    from mbt_gym_tpu.utils.config import lam_env_config

    env_cfg = dataclasses.replace(
        lam_env_config(num_trajectories=N, n_steps=T),
        max_inventory=1.0,
        mask_market_orders_at_max_inventory=True,
        normalise_observation_space=True,
    )
    params = networks.init_actor_critic(
        jax.random.PRNGKey(7), env_cfg.state_dim, env_cfg.action_dim,
        hidden=(16, 16), shared_trunk=True,
    )
    # widen the sample spread so MO columns cross the 0.5 trigger often
    params = dict(params, log_std=params["log_std"] + 0.7)
    n_ch = pallas_rollout.n_noise_channels(env_cfg.action_dim)
    rng = np.random.default_rng(43)
    channels = rng.uniform(size=(T, n_ch, N)).astype(np.float32)
    channels[:, 4:9] = rng.normal(size=(T, 5, N)).astype(np.float32)
    channels = jnp.asarray(channels)

    p = pallas_rollout.rollout_params_from_config(env_cfg)
    assert p.mask_mo_at_max_inventory

    batch = pallas_rollout.collect_rollout_fused(
        env_cfg, params, jax.random.PRNGKey(0), tile=128,
        interpret=True, noise=channels,
    )
    ref_obs, ref_act, ref_logp, ref_v, ref_r = _xla_reference_lam(
        env_cfg, params, channels
    )
    # the scenario must actually exercise both a fired AND a blocked MO:
    # some step has an env at the boundary with its MO column > 0.5
    inv = np.asarray(ref_obs)[..., 1] * env_cfg.max_inventory  # denormalised
    mo_cols = np.asarray(ref_act)[..., 2:] > 0.5
    at_bound = (inv >= env_cfg.max_inventory) | (inv <= -env_cfg.max_inventory)
    assert mo_cols.any() and (at_bound & mo_cols.any(axis=-1)).any()
    np.testing.assert_allclose(np.asarray(batch.obs), np.asarray(ref_obs), rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(batch.rewards), np.asarray(ref_r), rtol=1e-4, atol=5e-3)


def test_lam_dynamics_config_guard():
    from mbt_gym_tpu.utils.config import lam_env_config

    with pytest.raises(AssertionError, match="lam dynamics.*supports"):
        pallas_rollout.rollout_params_from_config(
            dataclasses.replace(
                lam_env_config(num_trajectories=N),
                reward_function=_UnknownReward(),
            )
        )


def test_train_iteration_with_fused_lam_rollout_runs():
    """End-to-end fused PPO (rollout + update) on the limit-and-market-order
    family in CPU interpret mode — finite metrics and param movement."""
    from mbt_gym_tpu.agents import ppo
    from mbt_gym_tpu.utils.config import lam_env_config

    env_cfg = dataclasses.replace(
        lam_env_config(num_trajectories=128, n_steps=8),
        normalise_observation_space=True,
    )
    ppo_cfg = ppo.PPOConfig(
        hidden=(16, 16), n_epochs=1, n_minibatches=2, shuffle=False,
        shared_trunk=True, fused_rollout=True, fused_rollout_tile=128,
        fused_interpret_ok=True,
        fused_update=True, fused_tile=128, fused_compute_dtype="float32",
    )
    ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
    new_ts, metrics = ppo.jit_train_iteration(
        env_cfg, ppo_cfg, ts, jax.random.PRNGKey(1)
    )
    assert all(np.isfinite(float(v)) for v in metrics.values()), metrics
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), ts.params, new_ts.params
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0.0


# ------------------------------------------ random initial inventory (fused)
def _xla_reference_lam_q0(env_cfg, params, channels, q0):
    """Like _xla_reference_lam but injecting the per-env initial-inventory
    draws via the env.reset override (the same q0 the fused kernel gets)."""
    state, obs = env_lib.reset(env_cfg, jax.random.PRNGKey(0), initial_inventory=q0)
    std = jnp.exp(params["log_std"])
    low, high = env_cfg.action_bounds()
    outs = []
    for t in range(T):
        mean, v = networks.policy_value(params, obs)
        eps = channels[t, 4:8].T
        action = mean + std * eps
        logp = networks.gaussian_log_prob(params, mean, action)
        clipped = jnp.clip(action, low, high)
        noise = (
            SlotNoise(normal=channels[t, 8][:, None], uniform=None),
            SlotNoise(normal=None, uniform=channels[t, 0:2].T),
            SlotNoise(normal=None, uniform=channels[t, 2:4].T),
        )
        res = env_lib.step(env_cfg, state, clipped, noise=noise)
        outs.append((obs, action, logp, v, res.reward))
        state, obs = res.state, res.obs
    return [jnp.stack(x) for x in zip(*outs)]


def test_fused_rollout_random_initial_inventory_matches_xla_engine():
    """The reference's canonical training env (experiments/helpers.py:21-60
    get_cj_env: lam dynamics + CjMm + initial_inventory=(-5, 6)) on the
    fused kernel must reproduce the XLA engine on the same noise AND the
    same per-env initial-inventory draws — including the CjMm reward's
    per-env q0^2 constant."""
    from mbt_gym_tpu.utils.config import learning_env_config

    env_cfg = dataclasses.replace(
        learning_env_config(num_trajectories=N),
        n_steps=T, normalise_observation_space=True,
    )
    assert env_cfg.initial_inventory == (-5, 6)
    p = pallas_rollout.rollout_params_from_config(env_cfg)
    assert p.dynamics_kind == "lam" and p.reward_kind == "cjmm"
    assert p.inventory_range == (-5, 6)

    params = networks.init_actor_critic(
        jax.random.PRNGKey(17), env_cfg.state_dim, env_cfg.action_dim,
        hidden=(16, 16), shared_trunk=True,
    )
    params = dict(params, log_std=params["log_std"] + 0.5)
    rng = np.random.default_rng(55)
    channels = rng.uniform(size=(T, 9, N)).astype(np.float32)
    channels[:, 4:9] = rng.normal(size=(T, 5, N)).astype(np.float32)
    channels = jnp.asarray(channels)
    q0 = jnp.asarray(rng.integers(-5, 6, size=N).astype(np.float32))
    assert len(np.unique(np.asarray(q0))) > 3  # genuinely heterogeneous

    batch = pallas_rollout.collect_rollout_fused(
        env_cfg, params, jax.random.PRNGKey(0), tile=128,
        interpret=True, noise=channels, inv0=q0,
    )
    ref_obs, ref_act, ref_logp, ref_v, ref_r = _xla_reference_lam_q0(
        env_cfg, params, channels, q0
    )
    np.testing.assert_allclose(np.asarray(batch.obs), np.asarray(ref_obs), rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(batch.actions), np.asarray(ref_act), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(batch.log_probs), np.asarray(ref_logp), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(batch.rewards), np.asarray(ref_r), rtol=1e-4, atol=5e-3)


def test_fused_rollout_draws_inventory_from_key():
    """Without an injected inv0, the fused collector draws per-env integer
    inventories in [lo, hi) from the rollout key (env.reset distribution);
    draws differ across keys and appear in the first-step observation."""
    from mbt_gym_tpu.utils.config import learning_env_config

    env_cfg = dataclasses.replace(
        learning_env_config(num_trajectories=N), n_steps=T,
    )
    params = networks.init_actor_critic(
        jax.random.PRNGKey(2), env_cfg.state_dim, env_cfg.action_dim,
        hidden=(16, 16), shared_trunk=True,
    )
    n_ch = pallas_rollout.n_noise_channels(env_cfg.action_dim)
    rng = np.random.default_rng(3)
    channels = rng.uniform(size=(T, n_ch, N)).astype(np.float32)
    channels[:, 4:9] = rng.normal(size=(T, 5, N)).astype(np.float32)
    channels = jnp.asarray(channels)

    def q0_of(key):
        tb = pallas_rollout.collect_rollout_fused_T(
            env_cfg, params, key, tile=128, interpret=True, noise=channels,
        )
        return np.asarray(tb.obs_t[0, 1])  # inventory column, first step

    a, b = q0_of(jax.random.PRNGKey(0)), q0_of(jax.random.PRNGKey(1))
    for q in (a, b):
        assert set(np.unique(q)) <= set(range(-5, 6))
        assert len(np.unique(q)) > 3
    assert not np.array_equal(a, b)


def test_train_iteration_fused_on_canonical_learning_env():
    """End-to-end fused PPO on the reference's canonical training config
    (lam + CjMm + random initial inventory) in CPU interpret mode."""
    from mbt_gym_tpu.agents import ppo
    from mbt_gym_tpu.utils.config import learning_env_config

    env_cfg = dataclasses.replace(
        learning_env_config(num_trajectories=128),
        n_steps=8, normalise_observation_space=True,
    )
    ppo_cfg = ppo.PPOConfig(
        hidden=(16, 16), n_epochs=1, n_minibatches=2, shuffle=False,
        shared_trunk=True, fused_rollout=True, fused_rollout_tile=128,
        fused_interpret_ok=True,
        fused_update=True, fused_tile=128, fused_compute_dtype="float32",
    )
    ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
    new_ts, metrics = ppo.jit_train_iteration(
        env_cfg, ppo_cfg, ts, jax.random.PRNGKey(1)
    )
    assert all(np.isfinite(float(v)) for v in metrics.values()), metrics
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), ts.params, new_ts.params
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0.0


def test_auto_tile_speed_family():
    """S=5 obs blocks sublane-pad to 8, so the OE family fits only 512
    lanes at T=200 (observed 18.79M scoped-vmem OOM at 1024 on v5e)."""
    at = pallas_rollout.auto_tile
    assert at(1 << 18, 200, False, s_dim=5, a_dim=1) == 512
    assert pallas_rollout._sublane_pad(4) == 4
    assert pallas_rollout._sublane_pad(5) == 8
    assert pallas_rollout._sublane_pad(3) == 4
    assert pallas_rollout._sublane_pad(12) == 16


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="hardware PRNG required; CPU parity of the lam family is "
    "covered by the injected-noise tests above — this validates the "
    "NEW a_dim=4 hardware draw stream (3 Box-Muller pairs/step) "
    "statistically.",
)
def test_lam_hardware_prng_stats():
    """lam family on the hardware PRNG: with an all-zero policy the action
    output IS the raw eps draws — 4 channels must be independent standard
    normals, independent of the midprice normal, and the price increments
    must follow sigma*sqrt(dt)*N(0,1)."""
    from mbt_gym_tpu.utils.config import lam_env_config

    N_hw, T_hw = 16384, 200
    env_cfg = lam_env_config(num_trajectories=N_hw, n_steps=T_hw)
    p = pallas_rollout.rollout_params_from_config(env_cfg)
    params = networks.init_actor_critic(
        jax.random.PRNGKey(0), env_cfg.state_dim, env_cfg.action_dim,
        hidden=(16, 16), shared_trunk=True,
    )
    params = jax.tree_util.tree_map(jnp.zeros_like, params)  # mean=0, log_std=0
    obs_t, actions_t, log_probs, values, rewards = pallas_rollout.mlp_rollout_pallas(
        p, params, 1234, N_hw,
    )
    eps = np.asarray(actions_t)  # (T, 4, N) == raw policy normals
    flat = eps.reshape(T_hw, 4, -1)
    m = flat.mean(axis=(0, 2))
    s = flat.std(axis=(0, 2))
    assert np.all(np.abs(m) < 0.01), m
    assert np.all(np.abs(s - 1.0) < 0.01), s
    # cross-channel independence (includes cos/sin pairs of shared radii)
    x = eps.transpose(1, 0, 2).reshape(4, -1)
    c = np.corrcoef(x)
    off = c[~np.eye(4, dtype=bool)]
    assert np.all(np.abs(off) < 0.01), c
    # price increments: sigma*sqrt(dt)*n_mid, independent of eps
    price = np.asarray(obs_t[:, 3, :])  # raw obs (no normalisation)
    dp = np.diff(price, axis=0)
    sd_expect = env_cfg.dynamics.midprice_model.volatility * np.sqrt(env_cfg.step_size)
    assert abs(dp.mean()) < 3 * sd_expect / np.sqrt(dp.size) * 5
    assert abs(dp.std() / sd_expect - 1.0) < 0.01, dp.std()
    for ch in range(4):
        r = np.corrcoef(eps[:-1, ch, :].ravel(), dp.ravel())[0, 1]
        assert abs(r) < 0.01, (ch, r)
    # MO trigger rate: P(eps > 0.5) for a standard normal
    assert abs((eps[:, 2:] > 0.5).mean() - 0.30854) < 0.005
    assert np.isfinite(np.asarray(rewards)).all()
    assert np.isfinite(np.asarray(log_probs)).all()


# ------------------------------------- composite family (Hawkes + ExoMM + lam)
def _xla_reference_composite(env_cfg, params, channels):
    """Independent replica of the fused composite rollout: Hawkes arrivals
    (2-dim intensity state) + exogenous-MM fills (2 OU best-depth states)
    + limit-and-market dynamics on the XLA engine with the same injected
    noise.  11-channel layout: 4 env uniforms, 4 policy normals, midprice
    normal, 2 exo best-depth normals."""
    state, obs = env_lib.reset(env_cfg, jax.random.PRNGKey(0))
    std = jnp.exp(params["log_std"])
    low, high = env_cfg.action_bounds()
    outs = []
    for t in range(T):
        mean, v = networks.policy_value(params, obs)
        eps = channels[t, 4:8].T  # (N, 4)
        action = mean + std * eps
        logp = networks.gaussian_log_prob(params, mean, action)
        clipped = jnp.clip(action, jnp.asarray(low), jnp.asarray(high))
        noise = (
            SlotNoise(normal=channels[t, 8][:, None], uniform=None),
            SlotNoise(normal=None, uniform=channels[t, 0:2].T),  # Hawkes thinning
            SlotNoise(normal=channels[t, 9:11].T, uniform=channels[t, 2:4].T),
        )
        res = env_lib.step(env_cfg, state, clipped, noise=noise)
        outs.append((obs, action, logp, v, res.reward))
        state, obs = res.state, res.obs
    return [jnp.stack(x) for x in zip(*outs)]


def test_fused_rollout_composite_matches_xla_engine():
    """The composite stress family (bench config 4's model stack: Hawkes
    self-exciting arrivals + exogenous competing-MM fills +
    limit-and-market-order dynamics, S=8 observation) must reproduce the
    XLA engine on the same injected noise — including the intensity and
    best-depth state columns in the observation."""
    from mbt_gym_tpu.utils.config import composite_env_config

    env_cfg = dataclasses.replace(
        composite_env_config(num_trajectories=N),
        n_steps=T, normalise_observation_space=True,
    )
    assert env_cfg.state_dim == 8 and env_cfg.action_dim == 4
    p = pallas_rollout.rollout_params_from_config(env_cfg)
    assert (p.dynamics_kind, p.arrival_kind, p.fill_kind) == ("lam", "hawkes", "exomm")

    params = networks.init_actor_critic(
        jax.random.PRNGKey(23), env_cfg.state_dim, env_cfg.action_dim,
        hidden=(16, 16), shared_trunk=True,
    )
    params = dict(params, log_std=params["log_std"] + 0.5)
    n_ch = pallas_rollout.n_noise_channels(4, exomm=True)
    assert n_ch == 11
    rng = np.random.default_rng(77)
    channels = rng.uniform(size=(T, n_ch, N)).astype(np.float32)
    channels[:, 4:11] = rng.normal(size=(T, 7, N)).astype(np.float32)
    channels = jnp.asarray(channels)

    batch = pallas_rollout.collect_rollout_fused(
        env_cfg, params, jax.random.PRNGKey(0), tile=128,
        interpret=True, noise=channels,
    )
    ref_obs, ref_act, ref_logp, ref_v, ref_r = _xla_reference_composite(
        env_cfg, params, channels
    )
    # real Hawkes excitation and MO fires must occur for full coverage
    raw_lam = np.asarray(ref_obs)[..., 4:6]
    assert raw_lam.std() > 0  # intensities moved (normalised obs still vary)
    assert float(jnp.sum((ref_act[..., 2:] > 0.5).astype(jnp.float32))) > 0
    np.testing.assert_allclose(np.asarray(batch.obs), np.asarray(ref_obs), rtol=2e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(batch.actions), np.asarray(ref_act), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(batch.log_probs), np.asarray(ref_logp), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(batch.rewards), np.asarray(ref_r), rtol=1e-4, atol=5e-3)


def test_train_iteration_with_fused_composite_rollout_runs():
    """End-to-end fused PPO (rollout + update) on the composite family in
    CPU interpret mode — finite metrics and param movement."""
    from mbt_gym_tpu.agents import ppo
    from mbt_gym_tpu.utils.config import composite_env_config

    env_cfg = dataclasses.replace(
        composite_env_config(num_trajectories=128),
        n_steps=8, normalise_observation_space=True,
    )
    ppo_cfg = ppo.PPOConfig(
        hidden=(16, 16), n_epochs=1, n_minibatches=2, shuffle=False,
        shared_trunk=True, fused_rollout=True, fused_rollout_tile=128,
        fused_interpret_ok=True,
        fused_update=True, fused_tile=128, fused_compute_dtype="float32",
    )
    ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
    new_ts, metrics = ppo.jit_train_iteration(
        env_cfg, ppo_cfg, ts, jax.random.PRNGKey(1)
    )
    assert all(np.isfinite(float(v)) for v in metrics.values()), metrics
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), ts.params, new_ts.params
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0.0


# ---------------------------------------------------------- midprice kinds
@pytest.mark.parametrize("mid_name", ["gbm", "ou", "cev", "bmjump", "oujump"])
def test_fused_rollout_midprice_kinds_match_xla_engine(mid_name):
    """Non-default midprice SDEs on the fused kernel (GBM, OU with the
    missing-dt drift quirk, and the fill-driven jump variants) must
    reproduce the XLA engine on the same noise.  Jump kinds use a large
    jump so actual fills visibly move the price."""
    from mbt_gym_tpu.processes.midprice import (
        BrownianMotionJumpMidprice,
        CevMidprice,
        GeometricBrownianMotionMidprice,
        OuJumpMidprice,
        OuMidprice,
    )

    mid = {
        "gbm": GeometricBrownianMotionMidprice(
            drift=0.5, volatility=0.02, initial_price=100.0
        ),
        "cev": CevMidprice(
            drift=0.2, volatility=0.05, gamma=0.7, initial_price=100.0
        ),
        "ou": OuMidprice(
            mean_reversion_level=100.0, mean_reversion_speed=2.0,
            volatility=2.0, initial_price=100.0,  # quirk: drift not dt-scaled
        ),
        "bmjump": BrownianMotionJumpMidprice(
            volatility=2.0, jump_size=0.5, initial_price=100.0
        ),
        "oujump": OuJumpMidprice(
            mean_reversion_level=100.0, mean_reversion_speed=2.0,
            volatility=2.0, jump_size=0.5, initial_price=100.0,
            dt_scaled_drift=True,
        ),
    }[mid_name]
    base = as_env_config(num_trajectories=N, n_steps=T)
    env_cfg = dataclasses.replace(
        base,
        dynamics=dataclasses.replace(base.dynamics, midprice_model=mid),
        normalise_observation_space=True, normalise_action_space=True,
    )
    p = pallas_rollout.rollout_params_from_config(env_cfg)
    assert p.midprice_kind == mid_name
    params = networks.init_actor_critic(
        jax.random.PRNGKey(3), env_cfg.state_dim, env_cfg.action_dim,
        hidden=(16, 16), shared_trunk=True,
    )
    rng = np.random.default_rng(101)
    channels = rng.uniform(size=(T, pallas_rollout.N_CHANNELS, N)).astype(np.float32)
    channels[:, 4:7] = rng.normal(size=(T, 3, N)).astype(np.float32)
    channels = jnp.asarray(channels)

    batch = pallas_rollout.collect_rollout_fused(
        env_cfg, params, jax.random.PRNGKey(0), tile=128,
        interpret=True, noise=channels,
    )
    ref_obs, ref_act, ref_logp, ref_v, ref_r = _xla_reference(env_cfg, params, channels)
    np.testing.assert_allclose(np.asarray(batch.obs), np.asarray(ref_obs), rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(batch.rewards), np.asarray(ref_r), rtol=1e-4, atol=5e-3)


def test_speed_dynamics_rejects_jump_midprice():
    from mbt_gym_tpu.processes.midprice import BrownianMotionJumpMidprice
    from mbt_gym_tpu.utils.config import oe_env_config

    cfg = oe_env_config(num_trajectories=N)
    bad = dataclasses.replace(
        cfg,
        dynamics=dataclasses.replace(
            cfg.dynamics, midprice_model=BrownianMotionJumpMidprice()
        ),
    )
    with pytest.raises(AssertionError, match="jumps have no fills"):
        pallas_rollout.rollout_params_from_config(bad)


def test_fused_rollout_constant_midprice_matches_xla_engine():
    """'constant' midprice kind (ConstantMidpriceModel,
    midprice_models.py:12-33): the price never moves; raw (unnormalised)
    spaces since the degenerate bounds forbid normalisation."""
    from mbt_gym_tpu.processes.midprice import ConstantMidprice

    base = as_env_config(num_trajectories=N, n_steps=T)
    env_cfg = dataclasses.replace(
        base,
        dynamics=dataclasses.replace(base.dynamics, midprice_model=ConstantMidprice()),
    )
    p = pallas_rollout.rollout_params_from_config(env_cfg)
    assert p.midprice_kind == "constant"
    params = networks.init_actor_critic(
        jax.random.PRNGKey(3), env_cfg.state_dim, env_cfg.action_dim,
        hidden=(16, 16), shared_trunk=True,
    )
    rng = np.random.default_rng(9)
    channels = rng.uniform(size=(T, pallas_rollout.N_CHANNELS, N)).astype(np.float32)
    channels[:, 4:7] = rng.normal(size=(T, 3, N)).astype(np.float32)
    channels = jnp.asarray(channels)
    batch = pallas_rollout.collect_rollout_fused(
        env_cfg, params, jax.random.PRNGKey(0), tile=128,
        interpret=True, noise=channels,
    )
    state, obs = env_lib.reset(env_cfg, jax.random.PRNGKey(0))
    std = jnp.exp(params["log_std"])
    low, high = env_cfg.action_bounds()
    outs = []
    for t in range(T):
        mean, v = networks.policy_value(params, obs)
        action = mean + std * channels[t, 4:6].T
        clipped = jnp.clip(action, jnp.asarray(low), jnp.asarray(high))
        noise = (
            SlotNoise(normal=channels[t, 6][:, None], uniform=None),
            SlotNoise(normal=None, uniform=channels[t, 0:2].T),
            SlotNoise(normal=None, uniform=channels[t, 2:4].T),
        )
        res = env_lib.step(env_cfg, state, clipped, noise=noise)
        outs.append((obs, res.reward))
        state, obs = res.state, res.obs
    ref_obs = jnp.stack([o for o, _ in outs])
    ref_r = jnp.stack([r for _, r in outs])
    np.testing.assert_allclose(np.asarray(batch.obs), np.asarray(ref_obs), rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(batch.rewards), np.asarray(ref_r), rtol=1e-4, atol=5e-3)
    assert float(jnp.ptp(batch.obs[..., 3])) == 0.0  # price never moves


@pytest.mark.parametrize("mid_name", ["heston", "st_ou_alpha", "st_jump_alpha"])
def test_fused_rollout_2dim_midprice_matches_xla_engine(mid_name):
    """2-dim-state midprice kinds (Heston stochastic volatility; short-term
    OU / OU-with-jumps alpha) on the fused kernel: the second state column
    lives in the carry and the observation, with one extra noise channel
    (channel layout per n_noise_channels(..., mid2=True))."""
    from mbt_gym_tpu.processes.midprice import (
        HestonMidprice,
        OuJumpMidprice,
        OuMidprice,
        ShortTermJumpAlphaMidprice,
        ShortTermOuAlphaMidprice,
    )

    mid = {
        "heston": HestonMidprice(
            drift=0.05, volatility_mean_reversion_rate=3.0,
            volatility_mean_reversion_level=0.04, weiner_correlation=-0.8,
            volatility_of_volatility=0.6, initial_price=100.0,
            initial_variance=0.04,
        ),
        "st_ou_alpha": ShortTermOuAlphaMidprice(
            volatility=2.0,
            ou=OuMidprice(initial_price=0.5, mean_reversion_level=0.0,
                          mean_reversion_speed=2.0, volatility=1.0,
                          dt_scaled_drift=True),
            initial_price=100.0,
        ),
        "st_jump_alpha": ShortTermJumpAlphaMidprice(
            volatility=2.0,
            ou_jump=OuJumpMidprice(initial_price=0.5, mean_reversion_level=0.0,
                                   mean_reversion_speed=2.0, volatility=1.0,
                                   jump_size=0.3, dt_scaled_drift=True),
            initial_price=100.0,
        ),
    }[mid_name]
    base = as_env_config(num_trajectories=N, n_steps=T)
    env_cfg = dataclasses.replace(
        base,
        dynamics=dataclasses.replace(base.dynamics, midprice_model=mid),
        normalise_observation_space=True, normalise_action_space=True,
    )
    assert env_cfg.state_dim == 5
    p = pallas_rollout.rollout_params_from_config(env_cfg)
    assert p.midprice_kind == mid_name and p.has_mid2
    params = networks.init_actor_critic(
        jax.random.PRNGKey(3), env_cfg.state_dim, env_cfg.action_dim,
        hidden=(16, 16), shared_trunk=True,
    )
    n_ch = pallas_rollout.n_noise_channels(2, mid2=True)
    assert n_ch == 8
    rng = np.random.default_rng(303)
    channels = rng.uniform(size=(T, n_ch, N)).astype(np.float32)
    channels[:, 4:8] = rng.normal(size=(T, 4, N)).astype(np.float32)
    channels = jnp.asarray(channels)

    batch = pallas_rollout.collect_rollout_fused(
        env_cfg, params, jax.random.PRNGKey(0), tile=128,
        interpret=True, noise=channels,
    )
    # XLA engine reference: the midprice slot consumes a 2-column normal
    # (own/price normal first, second-state normal second)
    state, obs = env_lib.reset(env_cfg, jax.random.PRNGKey(0))
    std = jnp.exp(params["log_std"])
    outs = []
    for t in range(T):
        mean, v = networks.policy_value(params, obs)
        action = mean + std * channels[t, 4:6].T
        clipped = jnp.clip(action, -1.0, 1.0)
        mid_normals = jnp.stack([channels[t, 6], channels[t, 7]], axis=1)
        noise = (
            SlotNoise(normal=mid_normals, uniform=None),
            SlotNoise(normal=None, uniform=channels[t, 0:2].T),
            SlotNoise(normal=None, uniform=channels[t, 2:4].T),
        )
        res = env_lib.step(env_cfg, state, clipped, noise=noise)
        outs.append((obs, res.reward))
        state, obs = res.state, res.obs
    ref_obs = jnp.stack([o for o, _ in outs])
    ref_r = jnp.stack([r for _, r in outs])
    np.testing.assert_allclose(np.asarray(batch.obs), np.asarray(ref_obs), rtol=2e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(batch.rewards), np.asarray(ref_r), rtol=1e-4, atol=5e-3)
    # the second state column must actually vary (variance / alpha moved)
    assert float(jnp.std(batch.obs[..., 4])) > 0


def test_fused_rollout_all_axes_combined_matches_xla_engine():
    """Maximal-axes config: Heston midprice (2-dim state, extra noise
    channel) + Hawkes arrivals + exogenous-MM fills + limit-and-market
    dynamics + CjMm + random initial inventory — exercises the mid2
    channel offset AFTER the exo channels and the carry/observation
    ordering (price, mid2, intensities, exo depths) in one shot.
    S = 4 + 1 (variance) + 2 (intensity) + 2 (exo) = 9; channels =
    4 + 4 (eps) + 1 (mid) + 2 (exo) + 1 (mid2) = 12."""
    from mbt_gym_tpu.processes.midprice import HestonMidprice
    from mbt_gym_tpu.utils.config import composite_env_config

    base = composite_env_config(num_trajectories=N)
    env_cfg = dataclasses.replace(
        base,
        dynamics=dataclasses.replace(
            base.dynamics, midprice_model=HestonMidprice()
        ),
        initial_inventory=(-3, 4),
        n_steps=T, normalise_observation_space=True,
    )
    assert env_cfg.state_dim == 9 and env_cfg.action_dim == 4
    p = pallas_rollout.rollout_params_from_config(env_cfg)
    assert (p.midprice_kind, p.arrival_kind, p.fill_kind) == ("heston", "hawkes", "exomm")
    assert p.inventory_range == (-3, 4)
    n_ch = pallas_rollout.n_noise_channels(4, exomm=True, mid2=True)
    assert n_ch == 12

    params = networks.init_actor_critic(
        jax.random.PRNGKey(29), env_cfg.state_dim, env_cfg.action_dim,
        hidden=(16, 16), shared_trunk=True,
    )
    params = dict(params, log_std=params["log_std"] + 0.5)
    rng = np.random.default_rng(404)
    channels = rng.uniform(size=(T, n_ch, N)).astype(np.float32)
    channels[:, 4:12] = rng.normal(size=(T, 8, N)).astype(np.float32)
    channels = jnp.asarray(channels)
    q0 = jnp.asarray(rng.integers(-3, 4, size=N).astype(np.float32))

    batch = pallas_rollout.collect_rollout_fused(
        env_cfg, params, jax.random.PRNGKey(0), tile=128,
        interpret=True, noise=channels, inv0=q0,
    )
    # XLA engine: channel layout [0:4] env uniforms, [4:8] eps, [8] mid,
    # [9:11] exo normals, [11] variance normal
    state, obs = env_lib.reset(env_cfg, jax.random.PRNGKey(0), initial_inventory=q0)
    std = jnp.exp(params["log_std"])
    low, high = env_cfg.action_bounds()
    outs = []
    for t in range(T):
        mean, v = networks.policy_value(params, obs)
        action = mean + std * channels[t, 4:8].T
        clipped = jnp.clip(action, jnp.asarray(low), jnp.asarray(high))
        mid_normals = jnp.stack([channels[t, 8], channels[t, 11]], axis=1)
        noise = (
            SlotNoise(normal=mid_normals, uniform=None),
            SlotNoise(normal=None, uniform=channels[t, 0:2].T),
            SlotNoise(normal=channels[t, 9:11].T, uniform=channels[t, 2:4].T),
        )
        res = env_lib.step(env_cfg, state, clipped, noise=noise)
        outs.append((obs, res.reward))
        state, obs = res.state, res.obs
    ref_obs = jnp.stack([o for o, _ in outs])
    ref_r = jnp.stack([r for _, r in outs])
    np.testing.assert_allclose(np.asarray(batch.obs), np.asarray(ref_obs), rtol=2e-4, atol=5e-4)
    # raw-scale mark-to-market at price ~100 with |q0| <= 3 accumulates
    # f32 rounding up to ~6e-3 absolute (measured; same band as the fuzz)
    np.testing.assert_allclose(np.asarray(batch.rewards), np.asarray(ref_r), rtol=2e-3, atol=2e-2)
    # every stochastic state column actually moved
    for col in (4, 5, 6, 7, 8):
        assert float(jnp.std(batch.obs[..., col])) > 0, col


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="hardware PRNG required; CPU parity of the composite axes is "
    "covered by the injected-noise tests — this validates the Hawkes/"
    "exo-MM/extra-normal hardware draw routing statistically.",
)
def test_composite_hardware_prng_stats():
    """Composite family on the hardware PRNG: the Hawkes intensity must
    settle at its discrete-time fixed point b*kappa/(kappa - j*per-step
    arrival sensitivity) and the exogenous best depths at their OU levels;
    with a zero policy the 4 action channels are standard normals."""
    from mbt_gym_tpu.utils.config import composite_env_config

    N_hw, T_hw = 16384, 200
    env_cfg = dataclasses.replace(
        composite_env_config(num_trajectories=N_hw), n_steps=T_hw,
    )
    p = pallas_rollout.rollout_params_from_config(env_cfg)
    assert (p.arrival_kind, p.fill_kind) == ("hawkes", "exomm")
    params = networks.init_actor_critic(
        jax.random.PRNGKey(0), env_cfg.state_dim, env_cfg.action_dim,
        hidden=(16, 16), shared_trunk=True,
    )
    params = jax.tree_util.tree_map(jnp.zeros_like, params)
    obs_t, actions_t, _, _, _ = pallas_rollout.mlp_rollout_pallas(
        p, params, 4321, N_hw,
    )
    obs = np.asarray(obs_t)  # raw (composite config never normalises here)
    # Hawkes fixed point: E[l'] = l + kappa*(b - l)*dt + j*P(arrive) with
    # P(arrive) = l*dt  =>  l* = b*kappa/(kappa - j) = 10*60/(60-40) = 30.
    lam_tail = obs[T_hw // 2 :, 4:6, :]
    lstar = (
        p.intensity_bid * p.hawkes_mean_reversion
        / (p.hawkes_mean_reversion - p.hawkes_jump)
    )
    assert abs(lam_tail.mean() / lstar - 1.0) < 0.05, (lam_tail.mean(), lstar)
    assert lam_tail.std() > 0.5  # genuinely self-exciting, not frozen
    # Exogenous best depths: OU around their levels (0.8)
    exo_tail = obs[T_hw // 2 :, 6:8, :]
    assert abs(exo_tail.mean() - p.exo_level[0]) < 0.02, exo_tail.mean()
    assert exo_tail.std() > 0.005
    # zero policy -> actions are the raw eps draws
    eps = np.asarray(actions_t)
    assert np.all(np.abs(eps.mean(axis=(0, 2))) < 0.01)
    assert np.all(np.abs(eps.std(axis=(0, 2)) - 1.0) < 0.01)


def test_fused_rollout_exomm_bm_gbm_inner_matches_xla_engine():
    """Exogenous competing-MM fills with BM (bid) and GBM (ask) best-depth
    processes — VERDICT r2 item 8: the reference allows ANY two processes
    (fill_probability_models.py:126-170); the fused kernel now covers every
    single-state single-noise inner kind, parity-checked against the XLA
    engine on injected noise."""
    from mbt_gym_tpu.processes.fills import ExogenousMmFill
    from mbt_gym_tpu.processes.midprice import (
        BrownianMotionMidprice, GeometricBrownianMotionMidprice,
    )
    from mbt_gym_tpu.utils.config import composite_env_config

    env_cfg = dataclasses.replace(
        composite_env_config(num_trajectories=N),
        n_steps=T, normalise_observation_space=True,
    )
    dyn = dataclasses.replace(
        env_cfg.dynamics,
        fill_probability_model=ExogenousMmFill(
            bid_process=BrownianMotionMidprice(
                initial_price=0.8, drift=0.05, volatility=0.1, terminal_time=1.0
            ),
            ask_process=GeometricBrownianMotionMidprice(
                initial_price=0.8, drift=-0.1, volatility=0.2, terminal_time=1.0
            ),
            fill_exponent=1.5,
        ),
    )
    env_cfg = dataclasses.replace(env_cfg, dynamics=dyn)
    p = pallas_rollout.rollout_params_from_config(env_cfg)
    assert p.exo_kind == ("bm", "gbm")

    params = networks.init_actor_critic(
        jax.random.PRNGKey(23), env_cfg.state_dim, env_cfg.action_dim,
        hidden=(16, 16), shared_trunk=True,
    )
    params = dict(params, log_std=params["log_std"] + 0.5)
    n_ch = pallas_rollout.n_noise_channels(4, exomm=True)
    rng = np.random.default_rng(78)
    channels = rng.uniform(size=(T, n_ch, N)).astype(np.float32)
    channels[:, 4:11] = rng.normal(size=(T, 7, N)).astype(np.float32)
    channels = jnp.asarray(channels)

    batch = pallas_rollout.collect_rollout_fused(
        env_cfg, params, jax.random.PRNGKey(0), tile=128,
        interpret=True, noise=channels,
    )
    ref_obs, ref_act, ref_logp, ref_v, ref_r = _xla_reference_composite(
        env_cfg, params, channels
    )
    # the exogenous best-depth columns (obs cols 6:8) must actually move
    assert np.asarray(ref_obs)[..., 6:8].std() > 0
    np.testing.assert_allclose(np.asarray(batch.obs), np.asarray(ref_obs), rtol=2e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(batch.actions), np.asarray(ref_act), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(batch.rewards), np.asarray(ref_r), rtol=1e-4, atol=5e-3)


# ------------------------------------------------------- table policy (CJ MM)
def _xla_reference_table(env_cfg, policy, channels):
    """XLA engine + the closed-form CJ policy (agents/baseline.py one-hot
    matmul path) on the same injected draws; channel layout is the
    table-policy one (n_noise_channels(2, table=True) = 5: 4 env uniforms
    + the midprice normal)."""
    state, obs = env_lib.reset(env_cfg, jax.random.PRNGKey(0))
    outs = []
    for t in range(channels.shape[0]):
        action = policy(None, obs, state)
        noise = (
            SlotNoise(normal=channels[t, 4][:, None], uniform=None),
            SlotNoise(normal=None, uniform=channels[t, 0:2].T),
            SlotNoise(normal=None, uniform=channels[t, 2:4].T),
        )
        res = env_lib.step(env_cfg, state, action, noise=noise)
        outs.append((obs, action, res.reward))
        state, obs = res.state, res.obs
    return [jnp.stack(x) for x in zip(*outs)]


def test_fused_table_policy_matches_xla_engine():
    """The closed-form CJ depth-table policy fused into the rollout kernel
    (round 4: one-hot MXU lookup of the precomputed depth table,
    BaselineAgents.py:86-170) must reproduce the XLA engine + the
    agents/baseline.py policy on the same draws — including the
    large-depth boundary override rows, which the small inventory grid
    guarantees get hit."""
    from mbt_gym_tpu.agents.baseline import CarteaJaimungalMmAgent
    from mbt_gym_tpu.utils.config import cj_env_config

    Tt = 12
    env_cfg = cj_env_config(num_trajectories=N, n_steps=Tt, max_inventory=3.0)
    agent = CarteaJaimungalMmAgent.from_config(env_cfg)
    policy = agent.policy()
    p = pallas_rollout.cj_rollout_params(env_cfg, agent)
    assert p.policy_kind == "table" and p.table_size == 7
    bid_tbl, ask_tbl = pallas_rollout.cj_depth_tables(agent)
    assert bid_tbl.shape == (Tt + 1, 128)

    rng = np.random.default_rng(7)
    n_ch = pallas_rollout.n_noise_channels(2, table=True)
    assert n_ch == 5
    channels = rng.uniform(size=(Tt, n_ch, N)).astype(np.float32)
    channels[:, 4] = rng.normal(size=(Tt, N)).astype(np.float32)
    channels = jnp.asarray(channels)

    obs_f, act_f, logp_f, val_f, rew_f = pallas_rollout.table_rollout_pallas(
        p, bid_tbl, ask_tbl, 0, N, tile=128, interpret=True, noise=channels,
    )
    ref_obs, ref_act, ref_rew = _xla_reference_table(env_cfg, policy, channels)

    # the inventory boundary must actually bind (exercising the
    # index-based large-depth override rows of the depth table)
    assert np.abs(np.asarray(ref_obs)[..., 1]).max() == 3.0
    np.testing.assert_allclose(
        np.asarray(obs_f), np.asarray(ref_obs).transpose(0, 2, 1),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(act_f), np.asarray(ref_act).transpose(0, 2, 1),
        rtol=1e-6, atol=1e-6,
    )
    # f32 accumulation-order plateau only (cash ~ 1e2 marks)
    np.testing.assert_allclose(np.asarray(rew_f), np.asarray(ref_rew), rtol=1e-4, atol=1e-4)
    # deterministic policy: the log-prob/value streams are zeros
    assert float(jnp.abs(logp_f).max()) == 0.0
    assert float(jnp.abs(val_f).max()) == 0.0

    # stats-only mode: terminal state + episode reward sums must equal the
    # stream reductions on the same draws
    cash, inv, price, rsum, ssum = pallas_rollout.table_rollout_pallas(
        p, bid_tbl, ask_tbl, 0, N, tile=128, interpret=True, noise=channels,
        stats_only=True,
    )
    np.testing.assert_allclose(np.asarray(rsum), np.asarray(rew_f.sum(0)), rtol=1e-5, atol=1e-5)
    # quoted-spread sums == bid+ask depth sums from the action streams
    np.testing.assert_allclose(
        np.asarray(ssum), np.asarray(act_f.sum(0).sum(0)), rtol=1e-5, atol=1e-4
    )
    # terminal state outputs: compare against the engine's post-episode
    # state on the same draws
    state, obs = env_lib.reset(env_cfg, jax.random.PRNGKey(0))
    for t in range(Tt):
        action = policy(None, obs, state)
        noise = (
            SlotNoise(normal=channels[t, 4][:, None], uniform=None),
            SlotNoise(normal=None, uniform=channels[t, 0:2].T),
            SlotNoise(normal=None, uniform=channels[t, 2:4].T),
        )
        res = env_lib.step(env_cfg, state, action, noise=noise)
        state, obs = res.state, res.obs
    np.testing.assert_allclose(np.asarray(cash), np.asarray(state.cash), rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(inv), np.asarray(state.inventory), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(price), np.asarray(state.process_states[0][:, 0]), rtol=1e-6, atol=1e-6)


def test_fused_table_policy_random_initial_inventory():
    """Table policy + per-env initial inventory draws: the CjMm reward's
    per-env q0^2 constant and the policy's per-env lookup must both see
    the injected q0 plane."""
    from mbt_gym_tpu.agents.baseline import CarteaJaimungalMmAgent
    from mbt_gym_tpu.utils.config import cj_env_config

    Tt = 8
    env_cfg = dataclasses.replace(
        cj_env_config(num_trajectories=N, n_steps=Tt, max_inventory=3.0),
        initial_inventory=(-2, 3),
    )
    agent = CarteaJaimungalMmAgent.from_config(env_cfg)
    policy = agent.policy()
    p = pallas_rollout.cj_rollout_params(env_cfg, agent)
    assert p.inventory_range == (-2, 3)
    bid_tbl, ask_tbl = pallas_rollout.cj_depth_tables(agent)

    rng = np.random.default_rng(11)
    channels = rng.uniform(size=(Tt, 5, N)).astype(np.float32)
    channels[:, 4] = rng.normal(size=(Tt, N)).astype(np.float32)
    channels = jnp.asarray(channels)
    q0 = jnp.asarray(rng.integers(-2, 3, size=N).astype(np.float32))
    assert len(np.unique(np.asarray(q0))) > 2

    obs_f, act_f, _, _, rew_f = pallas_rollout.table_rollout_pallas(
        p, bid_tbl, ask_tbl, 0, N, tile=128, interpret=True, noise=channels,
        inv0=q0,
    )
    state, obs = env_lib.reset(env_cfg, jax.random.PRNGKey(0), initial_inventory=q0)
    outs = []
    for t in range(Tt):
        action = policy(None, obs, state)
        noise = (
            SlotNoise(normal=channels[t, 4][:, None], uniform=None),
            SlotNoise(normal=None, uniform=channels[t, 0:2].T),
            SlotNoise(normal=None, uniform=channels[t, 2:4].T),
        )
        res = env_lib.step(env_cfg, state, action, noise=noise)
        outs.append((obs, action, res.reward))
        state, obs = res.state, res.obs
    ref_obs, ref_act, ref_rew = [jnp.stack(x) for x in zip(*outs)]
    np.testing.assert_allclose(
        np.asarray(obs_f), np.asarray(ref_obs).transpose(0, 2, 1), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(act_f), np.asarray(ref_act).transpose(0, 2, 1), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(rew_f), np.asarray(ref_rew), rtol=1e-4, atol=1e-4)


def test_table_rollout_config_guards():
    """The table path refuses configurations it does not model."""
    from mbt_gym_tpu.agents.baseline import CarteaJaimungalMmAgent
    from mbt_gym_tpu.utils.config import cj_env_config

    env_cfg = cj_env_config(num_trajectories=N, n_steps=4, max_inventory=3.0)
    agent = CarteaJaimungalMmAgent.from_config(env_cfg)
    p = pallas_rollout.cj_rollout_params(env_cfg, agent)
    bid_tbl, ask_tbl = pallas_rollout.cj_depth_tables(agent)

    with pytest.raises(AssertionError):  # not a table params struct
        pallas_rollout.table_rollout_pallas(
            p._replace(policy_kind="mlp"), bid_tbl, ask_tbl, 0, N, tile=128,
            interpret=True,
        )
    with pytest.raises(AssertionError):  # non-limit dynamics
        pallas_rollout.table_rollout_pallas(
            p._replace(dynamics_kind="lam"), bid_tbl, ask_tbl, 0, N, tile=128,
            interpret=True,
        )
    with pytest.raises(AssertionError):  # table too short for the horizon
        pallas_rollout.table_rollout_pallas(
            p, bid_tbl[:3], ask_tbl[:3], 0, N, tile=128, interpret=True,
        )


def test_table_rollout_sublane_rows_bitwise():
    """The sublane-packed stats layout (rows=8: (8, L) env planes filling
    the VPU's native shape) must be BITWISE equal to the rows=1 layout on
    the same injected noise — same draws per env, same accumulation
    order, only the tile geometry changes.  Covers the channel-major
    noise packing, per-row one-hot lookups, and the row-major env
    ordering of inv0 and the flattened outputs."""
    from mbt_gym_tpu.agents.baseline import CarteaJaimungalMmAgent
    from mbt_gym_tpu.utils.config import cj_env_config

    Nn, Tt = 1024, 10
    env_cfg = dataclasses.replace(
        cj_env_config(num_trajectories=Nn, n_steps=Tt, max_inventory=3.0),
        initial_inventory=(-2, 3),
    )
    agent = CarteaJaimungalMmAgent.from_config(env_cfg)
    p = pallas_rollout.cj_rollout_params(env_cfg, agent)
    bid_tbl, ask_tbl = pallas_rollout.cj_depth_tables(agent)

    rng = np.random.default_rng(3)
    channels = rng.uniform(size=(Tt, 5, Nn)).astype(np.float32)
    channels[:, 4] = rng.normal(size=(Tt, Nn)).astype(np.float32)
    channels = jnp.asarray(channels)
    q0 = jnp.asarray(rng.integers(-2, 3, size=Nn).astype(np.float32))

    outs1 = pallas_rollout.table_rollout_pallas(
        p, bid_tbl, ask_tbl, 0, Nn, tile=128, interpret=True, noise=channels,
        inv0=q0, stats_only=True,
    )
    outs8 = pallas_rollout.table_rollout_pallas(
        p, bid_tbl, ask_tbl, 0, Nn, tile=128, interpret=True, noise=channels,
        inv0=q0, stats_only=True, rows=8,
    )
    for a, b in zip(outs1, outs8):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(AssertionError):  # rows > 1 requires stats_only
        pallas_rollout.table_rollout_pallas(
            p, bid_tbl, ask_tbl, 0, Nn, tile=128, interpret=True,
            noise=channels, inv0=q0, rows=8,
        )


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="hardware PRNG required; CPU parity of the table policy is "
    "covered by the injected-noise tests above — this validates the "
    "table kernel's hardware draw stream against the CJP analytic "
    "value function (the notebook Test-2 oracle).",
)
def test_table_kernel_hardware_value_function():
    """On real hardware the fused table kernel's mean episode reward over
    fresh PRNG episodes must match the analytic CJP value function
    h(0, 0) (BaselineAgents.py:161-170) — the same oracle the reference's
    Test-2 notebook t-tests, here at ~0.5M episodes so the band is tight.
    Also asserts the sublane-packed layouts agree with each other on
    hardware (independent draw streams, same distribution)."""
    from mbt_gym_tpu.agents.baseline import CarteaJaimungalMmAgent
    from mbt_gym_tpu.utils.config import cj_env_config

    n_envs = 65536
    env_cfg = cj_env_config(num_trajectories=n_envs, max_inventory=100.0)
    agent = CarteaJaimungalMmAgent.from_config(env_cfg, max_inventory=100)
    p = pallas_rollout.cj_rollout_params(env_cfg, agent)
    bid_tbl, ask_tbl = pallas_rollout.cj_depth_tables(agent)
    bid_tbl, ask_tbl = jnp.asarray(bid_tbl), jnp.asarray(ask_tbl)
    h0 = float(agent.h_table()[0, agent.max_inventory])

    from functools import partial

    @partial(jax.jit, static_argnames=("rows",))
    def mean_reward(seed0, rows):
        def one(acc, s):
            _, _, _, rsum, _ = pallas_rollout.table_rollout_pallas(
                p, bid_tbl, ask_tbl, s, n_envs, stats_only=True, rows=rows
            )
            return acc + rsum.mean(), None

        acc, _ = jax.lax.scan(one, 0.0, seed0 + jnp.arange(4, dtype=jnp.int32))
        return acc / 4

    m16 = float(mean_reward(jnp.int32(11_000), 16))
    m1 = float(mean_reward(jnp.int32(53_000), 1))
    # episode-reward std is a few units; at 262k episodes the SE is ~0.01,
    # so 0.3 is a ~10-sigma band that still catches any structural error
    assert abs(m16 - h0) < 0.3, (m16, h0)
    assert abs(m1 - h0) < 0.3, (m1, h0)
    assert abs(m16 - m1) < 0.3, (m16, m1)


def test_table_rollout_rows_exomm_bitwise():
    """Sublane-packed rows with exogenous-MM fills: the exo noise channels
    are channel-major (bid rows [0, R), ask rows [R, 2R)) like every other
    channel — regression test for the rows>1 slice bug where both sides
    read rows of the BID channel and broadcast one draw across all
    sublane rows (caught in the round-4 self-review)."""
    import dataclasses as dc

    from mbt_gym_tpu.agents.baseline import CarteaJaimungalMmAgent
    from mbt_gym_tpu.processes.fills import ExogenousMmFill
    from mbt_gym_tpu.processes.midprice import OuMidprice
    from mbt_gym_tpu.utils.config import cj_env_config

    Nn, Tt = 1024, 8
    base = cj_env_config(num_trajectories=Nn, n_steps=Tt, max_inventory=3.0)
    dyn = dc.replace(
        base.dynamics,
        fill_probability_model=ExogenousMmFill(
            bid_process=OuMidprice(
                initial_price=0.8, mean_reversion_level=0.8,
                mean_reversion_speed=1.0, volatility=0.3, terminal_time=1.0,
            ),
            ask_process=OuMidprice(
                initial_price=0.9, mean_reversion_level=0.9,
                mean_reversion_speed=2.0, volatility=0.5, terminal_time=1.0,
            ),
            fill_exponent=1.5,
        ),
    )
    env_cfg = dc.replace(base, dynamics=dyn)
    agent = CarteaJaimungalMmAgent.from_config(env_cfg)
    p = pallas_rollout.cj_rollout_params(env_cfg, agent)
    assert p.fill_kind == "exomm"
    bid_tbl, ask_tbl = pallas_rollout.cj_depth_tables(agent)

    rng = np.random.default_rng(5)
    n_ch = pallas_rollout.n_noise_channels(2, exomm=True, table=True)
    assert n_ch == 7
    channels = rng.uniform(size=(Tt, n_ch, Nn)).astype(np.float32)
    channels[:, 4:] = rng.normal(size=(Tt, 3, Nn)).astype(np.float32)
    channels = jnp.asarray(channels)

    outs1 = pallas_rollout.table_rollout_pallas(
        p, bid_tbl, ask_tbl, 0, Nn, tile=128, interpret=True, noise=channels,
        stats_only=True,
    )
    outs8 = pallas_rollout.table_rollout_pallas(
        p, bid_tbl, ask_tbl, 0, Nn, tile=128, interpret=True, noise=channels,
        stats_only=True, rows=8,
    )
    for a, b in zip(outs1, outs8):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the exo channels must actually matter: different exo draws => the
    # terminal cash differs (guards against the channels being dead)
    other = channels.at[:, 5:7].set(-channels[:, 5:7])
    alt = pallas_rollout.table_rollout_pallas(
        p, bid_tbl, ask_tbl, 0, Nn, tile=128, interpret=True, noise=other,
        stats_only=True, rows=8,
    )
    assert not np.array_equal(np.asarray(alt[0]), np.asarray(outs8[0]))


def test_cj_depth_tables_inventory_neutral():
    """PnL reward => the CJ agent is risk-neutral and quotes the CONSTANT
    depth 1/kappa (BaselineAgents.py:96-98,110-112); the fused tables must
    be constant too, not the inventory-dependent h-table with its
    large-depth boundary overrides (round-4 self-review finding)."""
    import dataclasses as dc

    from mbt_gym_tpu.agents.baseline import CarteaJaimungalMmAgent
    from mbt_gym_tpu.rewards import PnL
    from mbt_gym_tpu.utils.config import cj_env_config

    Nn, Tt = 256, 6
    env_cfg = dc.replace(
        cj_env_config(num_trajectories=Nn, n_steps=Tt, max_inventory=3.0),
        reward_function=PnL(),
    )
    agent = CarteaJaimungalMmAgent.from_config(env_cfg)
    assert agent.inventory_neutral
    bid_tbl, ask_tbl = pallas_rollout.cj_depth_tables(agent)
    k = env_cfg.dynamics.fill_probability_model.fill_exponent
    assert np.all(bid_tbl[:, :7] == np.float32(1.0 / k))
    assert np.all(ask_tbl[:, :7] == np.float32(1.0 / k))

    # end-to-end: fused streams equal the engine + the agent's actual
    # (constant-quote) policy on the same draws
    p = pallas_rollout.cj_rollout_params(env_cfg, agent)
    rng = np.random.default_rng(8)
    channels = rng.uniform(size=(Tt, 5, Nn)).astype(np.float32)
    channels[:, 4] = rng.normal(size=(Tt, Nn)).astype(np.float32)
    channels = jnp.asarray(channels)
    obs_f, act_f, _, _, rew_f = pallas_rollout.table_rollout_pallas(
        p, bid_tbl, ask_tbl, 0, Nn, tile=128, interpret=True, noise=channels,
    )
    ref_obs, ref_act, ref_rew = _xla_reference_table(
        env_cfg, agent.policy(), channels
    )
    np.testing.assert_allclose(
        np.asarray(act_f), np.asarray(ref_act).transpose(0, 2, 1), rtol=0, atol=0
    )
    np.testing.assert_allclose(
        np.asarray(obs_f), np.asarray(ref_obs).transpose(0, 2, 1), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(rew_f), np.asarray(ref_rew), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("fill_name", ["triangular", "power"])
def test_fused_table_policy_other_fill_kinds(fill_name):
    """Table policy composed with the non-default fill models (triangular
    / power, elementwise-intent variants) — the depth table is a policy,
    the fill model is orthogonal env machinery, and their composition
    must match the XLA engine on the same draws."""
    import dataclasses as dc

    from mbt_gym_tpu.agents.baseline import CarteaJaimungalMmAgent
    from mbt_gym_tpu.processes.fills import PowerFill, TriangularFill
    from mbt_gym_tpu.utils.config import cj_env_config

    Nn, Tt = 256, 8
    fill = (
        TriangularFill(max_fill_depth=1.5)
        if fill_name == "triangular"
        else PowerFill(fill_exponent=1.5, fill_multiplier=1.2)
    )
    base = cj_env_config(num_trajectories=Nn, n_steps=Tt, max_inventory=3.0)
    env_cfg = dc.replace(
        base, dynamics=dc.replace(base.dynamics, fill_probability_model=fill)
    )
    # the CJ h-table needs a fill exponent; build the agent from the
    # exponential-fill base config and run its table on the other fill env
    agent = CarteaJaimungalMmAgent.from_config(base)
    p = pallas_rollout.cj_rollout_params(env_cfg, agent)
    assert p.fill_kind == fill_name
    bid_tbl, ask_tbl = pallas_rollout.cj_depth_tables(agent)

    rng = np.random.default_rng(13)
    channels = rng.uniform(size=(Tt, 5, Nn)).astype(np.float32)
    channels[:, 4] = rng.normal(size=(Tt, Nn)).astype(np.float32)
    channels = jnp.asarray(channels)

    obs_f, act_f, _, _, rew_f = pallas_rollout.table_rollout_pallas(
        p, bid_tbl, ask_tbl, 0, Nn, tile=128, interpret=True, noise=channels,
    )
    ref_obs, ref_act, ref_rew = _xla_reference_table(
        env_cfg, agent.policy(), channels
    )
    np.testing.assert_allclose(
        np.asarray(act_f), np.asarray(ref_act).transpose(0, 2, 1),
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(obs_f), np.asarray(ref_obs).transpose(0, 2, 1),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(rew_f), np.asarray(ref_rew), rtol=1e-4, atol=1e-4)


# --------------------------------------------------- fixed policy (round 5)
def _xla_reference_fixed(env_cfg, policy, channels, exomm=False):
    """XLA engine + a constant-action policy on the same injected draws;
    channel layout is the deterministic-policy one (no eps rows): 4 env
    uniforms, the midprice normal at row 4, then 2 exo best-depth normals
    when the fill kind is exomm."""
    state, obs = env_lib.reset(env_cfg, jax.random.PRNGKey(0))
    outs = []
    for t in range(channels.shape[0]):
        action = policy(None, obs, state)
        if exomm:
            noise = (
                SlotNoise(normal=channels[t, 4][:, None], uniform=None),
                SlotNoise(normal=None, uniform=channels[t, 0:2].T),
                SlotNoise(normal=channels[t, 5:7].T, uniform=channels[t, 2:4].T),
            )
        else:
            noise = (
                SlotNoise(normal=channels[t, 4][:, None], uniform=None),
                SlotNoise(normal=None, uniform=channels[t, 0:2].T),
                SlotNoise(normal=None, uniform=channels[t, 2:4].T),
            )
        res = env_lib.step(env_cfg, state, action, noise=noise)
        outs.append((obs, action, res.reward))
        state, obs = res.state, res.obs
    return [jnp.stack(x) for x in zip(*outs)]


def test_fused_fixed_policy_composite_matches_xla_engine():
    """The constant-action policy kind (round 5) on the composite stress
    family (suite config 4: Hawkes arrivals + exogenous-MM fills +
    limit-and-market dynamics) must reproduce the XLA engine + the
    fixed_action_policy baseline on the same draws — the one suite eval
    workload that previously had no Pallas lane (VERDICT r4 item 5)."""
    from mbt_gym_tpu.agents.baseline import fixed_action_policy
    from mbt_gym_tpu.utils.config import composite_env_config

    env_cfg = dataclasses.replace(
        composite_env_config(num_trajectories=N), n_steps=T
    )
    action = [0.6, 0.6, 0.0, 1.0]  # quotes + a firing MO-sell column
    policy = fixed_action_policy(action)
    p = pallas_rollout.fixed_rollout_params(env_cfg, action)
    assert (p.policy_kind, p.dynamics_kind, p.arrival_kind, p.fill_kind) == (
        "fixed", "lam", "hawkes", "exomm"
    )
    n_ch = pallas_rollout.n_noise_channels(4, exomm=True, table=True)
    assert n_ch == 7
    rng = np.random.default_rng(31)
    channels = rng.uniform(size=(T, n_ch, N)).astype(np.float32)
    channels[:, 4:7] = rng.normal(size=(T, 3, N)).astype(np.float32)
    channels = jnp.asarray(channels)

    obs_f, act_f, logp_f, val_f, rew_f = pallas_rollout.fixed_rollout_pallas(
        p, 0, N, tile=128, interpret=True, noise=channels,
    )
    ref_obs, ref_act, ref_rew = _xla_reference_fixed(
        env_cfg, policy, channels, exomm=True
    )
    # the MO-sell column must actually fire on the engine side
    assert float(jnp.abs(jnp.diff(ref_obs[:, 0, 1])).max()) >= 1.0
    np.testing.assert_allclose(
        np.asarray(obs_f), np.asarray(ref_obs).transpose(0, 2, 1),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(act_f), np.asarray(ref_act).transpose(0, 2, 1),
        rtol=0, atol=0,
    )
    np.testing.assert_allclose(np.asarray(rew_f), np.asarray(ref_rew), rtol=1e-4, atol=1e-4)
    assert float(jnp.abs(logp_f).max()) == 0.0
    assert float(jnp.abs(val_f).max()) == 0.0

    # stats mode (sublane-packed rows) must match the stream reductions
    cash, inv, price, rsum, ssum = pallas_rollout.fixed_rollout_pallas(
        p, 0, N, tile=128, interpret=True, noise=channels, stats_only=True,
        rows=1,
    )
    np.testing.assert_allclose(np.asarray(rsum), np.asarray(rew_f.sum(0)), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ssum), np.asarray(act_f[:, :2].sum(0).sum(0)),
        rtol=1e-5, atol=1e-4,
    )


def test_fused_fixed_policy_speed_dynamics_matches_xla_engine():
    """Fixed policy on speed dynamics (1 action column): the OE family's
    constant-speed baseline, exercising the a_dim=1 spread guard."""
    from mbt_gym_tpu.agents.baseline import fixed_action_policy
    from mbt_gym_tpu.utils.config import oe_env_config

    env_cfg = dataclasses.replace(oe_env_config(num_trajectories=N), n_steps=T)
    action = [-2.5]
    policy = fixed_action_policy(action)
    p = pallas_rollout.fixed_rollout_params(env_cfg, action)
    assert (p.policy_kind, p.dynamics_kind) == ("fixed", "speed")
    n_ch = pallas_rollout.n_noise_channels(1, table=True)
    assert n_ch == 5
    rng = np.random.default_rng(32)
    channels = rng.uniform(size=(T, n_ch, N)).astype(np.float32)
    channels[:, 4] = rng.normal(size=(T, N)).astype(np.float32)
    channels = jnp.asarray(channels)

    obs_f, act_f, _, _, rew_f = pallas_rollout.fixed_rollout_pallas(
        p, 0, N, tile=128, interpret=True, noise=channels,
    )
    ref_obs, ref_act, ref_rew = _xla_reference_fixed(env_cfg, policy, channels)
    np.testing.assert_allclose(
        np.asarray(obs_f), np.asarray(ref_obs).transpose(0, 2, 1),
        rtol=1e-5, atol=1e-4,
    )
    np.testing.assert_allclose(np.asarray(rew_f), np.asarray(ref_rew), rtol=1e-4, atol=1e-4)

    # stats mode: the a_dim=1 spread accumulator is zeros (wrapper NaNs it)
    _, _, _, rsum, ssum = pallas_rollout.fixed_rollout_pallas(
        p, 0, N, tile=128, interpret=True, noise=channels, stats_only=True,
    )
    np.testing.assert_allclose(np.asarray(rsum), np.asarray(rew_f.sum(0)), rtol=1e-5, atol=1e-4)
    assert float(jnp.abs(ssum).max()) == 0.0


def test_fixed_rollout_config_guard():
    """Wrong column counts and random starts must be rejected clearly."""
    from mbt_gym_tpu.utils.config import composite_env_config

    env_cfg = dataclasses.replace(
        composite_env_config(num_trajectories=N), n_steps=T
    )
    p = pallas_rollout.fixed_rollout_params(env_cfg, [0.6, 0.6])  # lam needs 4
    with pytest.raises(AssertionError, match="lam dynamics takes 4"):
        pallas_rollout.fixed_rollout_pallas(p, 0, N, tile=128, interpret=True)
    rs_cfg = dataclasses.replace(env_cfg, start_time=("uniform", 0.0, 0.5))
    p2 = pallas_rollout.fixed_rollout_params(rs_cfg, [0.6, 0.6, 0.0, 0.0])
    with pytest.raises(AssertionError, match="random start"):
        pallas_rollout.fixed_rollout_pallas(p2, 0, N, tile=128, interpret=True)


def test_fixed_rollout_sublane_rows_bitwise():
    """The fixed policy's sublane-packed stats layout must be BITWISE
    equal to rows=1 on the same injected noise — the table-kind rows
    guarantee carries over to the new deterministic kind (composite
    family: Hawkes + exomm carries, 7-channel layout)."""
    from mbt_gym_tpu.utils.config import composite_env_config

    Nn, Tt = 1024, 8
    env_cfg = dataclasses.replace(
        composite_env_config(num_trajectories=Nn), n_steps=Tt
    )
    p = pallas_rollout.fixed_rollout_params(env_cfg, [0.6, 0.6, 0.0, 0.0])
    rng = np.random.default_rng(5)
    channels = rng.uniform(size=(Tt, 7, Nn)).astype(np.float32)
    channels[:, 4:7] = rng.normal(size=(Tt, 3, Nn)).astype(np.float32)
    channels = jnp.asarray(channels)

    outs1 = pallas_rollout.fixed_rollout_pallas(
        p, 0, Nn, tile=128, interpret=True, noise=channels, stats_only=True,
    )
    outs8 = pallas_rollout.fixed_rollout_pallas(
        p, 0, Nn, tile=128, interpret=True, noise=channels, stats_only=True,
        rows=8,
    )
    for a, b in zip(outs1, outs8):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_det_streams_final_obs_matches_engine_terminal():
    """The streams-mode ``final_obs`` output (round 5: the T-th row the
    dispatch front door appends to build a (T+1)-row Trajectory) must
    equal the engine's post-episode observation on the same draws — for
    both deterministic kinds, including composite state planes."""
    from mbt_gym_tpu.agents.baseline import CarteaJaimungalMmAgent
    from mbt_gym_tpu.utils.config import cj_env_config, composite_env_config

    # table kind on the CJ config
    Tt = 12
    env_cfg = cj_env_config(num_trajectories=N, n_steps=Tt, max_inventory=3.0)
    agent = CarteaJaimungalMmAgent.from_config(env_cfg)
    p = pallas_rollout.cj_rollout_params(env_cfg, agent)
    bid_tbl, ask_tbl = pallas_rollout.cj_depth_tables(agent)
    rng = np.random.default_rng(7)
    channels = rng.uniform(size=(Tt, 5, N)).astype(np.float32)
    channels[:, 4] = rng.normal(size=(Tt, N)).astype(np.float32)
    channels = jnp.asarray(channels)
    *_, fin = pallas_rollout.table_rollout_pallas(
        p, bid_tbl, ask_tbl, 0, N, tile=128, interpret=True, noise=channels,
        final_obs=True,
    )
    state, obs = env_lib.reset(env_cfg, jax.random.PRNGKey(0))
    policy = agent.policy()
    for t in range(Tt):
        noise = (
            SlotNoise(normal=channels[t, 4][:, None], uniform=None),
            SlotNoise(normal=None, uniform=channels[t, 0:2].T),
            SlotNoise(normal=None, uniform=channels[t, 2:4].T),
        )
        res = env_lib.step(env_cfg, state, policy(None, obs, state), noise=noise)
        state, obs = res.state, res.obs
    np.testing.assert_allclose(
        np.asarray(fin), np.asarray(obs).T, rtol=1e-5, atol=1e-5
    )

    # fixed kind on the composite config (8-column observation)
    ccfg = dataclasses.replace(composite_env_config(num_trajectories=N), n_steps=T)
    from mbt_gym_tpu.agents.baseline import fixed_action_policy

    action = [0.6, 0.6, 0.0, 0.0]
    pf = pallas_rollout.fixed_rollout_params(ccfg, action)
    n_ch = pallas_rollout.n_noise_channels(4, exomm=True, table=True)
    channels = rng.uniform(size=(T, n_ch, N)).astype(np.float32)
    channels[:, 4:7] = rng.normal(size=(T, 3, N)).astype(np.float32)
    channels = jnp.asarray(channels)
    *_, fin = pallas_rollout.fixed_rollout_pallas(
        pf, 0, N, tile=128, interpret=True, noise=channels, final_obs=True,
    )
    state, obs = env_lib.reset(ccfg, jax.random.PRNGKey(0))
    fpol = fixed_action_policy(action)
    for t in range(T):
        noise = (
            SlotNoise(normal=channels[t, 4][:, None], uniform=None),
            SlotNoise(normal=None, uniform=channels[t, 0:2].T),
            SlotNoise(normal=channels[t, 5:7].T, uniform=channels[t, 2:4].T),
        )
        res = env_lib.step(ccfg, state, fpol(None, obs, state), noise=noise)
        state, obs = res.state, res.obs
    np.testing.assert_allclose(
        np.asarray(fin), np.asarray(obs).T, rtol=1e-5, atol=1e-5
    )


def test_fused_schedule_policy_matches_xla_engine():
    """The per-step action-schedule policy kind (round 5) running the
    closed-form CJ-OE execution schedule must reproduce the XLA engine +
    the agents.baseline policy on the same draws — including the obs
    impact-state column and the CjOe reward, plus the final_obs output
    and stats-mode reductions."""
    from mbt_gym_tpu.agents.baseline import CarteaJaimungalOeAgent
    from mbt_gym_tpu.utils.config import oe_env_config

    env_cfg = dataclasses.replace(
        oe_env_config(num_trajectories=N, initial_inventory=20.0), n_steps=T
    )
    agent = CarteaJaimungalOeAgent.from_config(env_cfg, alpha=0.01)
    policy = agent.policy()
    p = pallas_rollout.schedule_rollout_params(env_cfg)
    assert (p.policy_kind, p.dynamics_kind) == ("schedule", "speed")
    table = pallas_rollout.schedule_table_from_policy(env_cfg, policy)
    assert table.shape == (T, 1)
    assert float(jnp.abs(table).min()) > 0  # a real, nonzero schedule

    rng = np.random.default_rng(41)
    n_ch = pallas_rollout.n_noise_channels(1, table=True)
    channels = rng.uniform(size=(T, n_ch, N)).astype(np.float32)
    channels[:, 4] = rng.normal(size=(T, N)).astype(np.float32)
    channels = jnp.asarray(channels)

    obs_f, act_f, logp_f, val_f, rew_f, fin = pallas_rollout.schedule_rollout_pallas(
        p, table, 0, N, tile=128, interpret=True, noise=channels,
        final_obs=True,
    )
    ref_obs, ref_act, ref_rew = _xla_reference_fixed(env_cfg, policy, channels)
    np.testing.assert_allclose(
        np.asarray(obs_f), np.asarray(ref_obs).transpose(0, 2, 1),
        rtol=1e-5, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(act_f), np.asarray(ref_act).transpose(0, 2, 1),
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(np.asarray(rew_f), np.asarray(ref_rew), rtol=1e-4, atol=1e-3)
    assert float(jnp.abs(logp_f).max()) == 0.0
    assert float(jnp.abs(val_f).max()) == 0.0
    # terminal obs: run the engine one episode and compare the final obs
    state, obs = env_lib.reset(env_cfg, jax.random.PRNGKey(0))
    for t in range(T):
        noise = (
            SlotNoise(normal=channels[t, 4][:, None], uniform=None),
            SlotNoise(normal=None, uniform=channels[t, 0:2].T),
            SlotNoise(normal=None, uniform=channels[t, 2:4].T),
        )
        res = env_lib.step(env_cfg, state, policy(None, obs, state), noise=noise)
        state, obs = res.state, res.obs
    np.testing.assert_allclose(
        np.asarray(fin), np.asarray(obs).T, rtol=1e-5, atol=1e-4
    )

    # stats mode reductions match the stream sums
    _, _, _, rsum, ssum = pallas_rollout.schedule_rollout_pallas(
        p, table, 0, N, tile=128, interpret=True, noise=channels,
        stats_only=True,
    )
    np.testing.assert_allclose(np.asarray(rsum), np.asarray(rew_f.sum(0)), rtol=1e-5, atol=1e-3)
    assert float(jnp.abs(ssum).max()) == 0.0  # a_dim=1: spread sum zeroed
