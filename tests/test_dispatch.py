"""The auto-dispatching front door (round 5, VERDICT r4 item 1):
dispatch_report must route each eligible (config, policy) family to its
kernel and fall back to XLA with the disqualifying feature named."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mbt_gym_tpu import dispatch
from mbt_gym_tpu.agents.baseline import (
    AvellanedaStoikovAgent,
    CarteaJaimungalMmAgent,
    CarteaJaimungalOeAgent,
    fixed_action_policy,
    fixed_spread_policy,
    no_market_order_policy,
)
from mbt_gym_tpu.utils.config import (
    as_env_config,
    cj_env_config,
    composite_env_config,
    oe_env_config,
)

N = 256  # multiple of 128: inside every family's lane-batch floor


def _as():
    cfg = as_env_config(num_trajectories=N)
    return cfg, AvellanedaStoikovAgent.from_config(cfg, risk_aversion=0.1).policy()


def _cj():
    cfg = cj_env_config(num_trajectories=N, max_inventory=10.0)
    return cfg, CarteaJaimungalMmAgent.from_config(cfg).policy()


def _oe():
    cfg = oe_env_config(num_trajectories=N)
    return cfg, CarteaJaimungalOeAgent.from_config(cfg, alpha=0.01).policy()


def _fixed():
    cfg = composite_env_config(num_trajectories=N)
    return cfg, fixed_action_policy([0.6, 0.6, 0.0, 0.0])


# ------------------------------------------------ family routing (as-if-TPU)
@pytest.mark.parametrize(
    "build, family, modes",
    [
        (_as, "as_episode", ("rollout", "stats")),
        (_cj, "cj_table", ("rollout", "stats")),
        (_fixed, "fixed", ("rollout", "stats")),
        (_oe, "oe_episode", ("rollout", "stats")),
    ],
)
def test_eligible_families_route_fused(build, family, modes):
    cfg, policy = build()
    for mode in modes:
        d = dispatch.dispatch_report(cfg, policy, mode=mode, platform="tpu")
        assert d == dispatch.DispatchDecision(
            "fused", family, f"config and policy match the {family} kernel contract"
        ), (mode, d)


def test_oe_rollout_mode_routes_to_schedule_kernel():
    """Round 5: OE full trajectories run on the fused schedule kernel
    (the terminal-state episode kernel keeps the stats mode)."""
    cfg, policy = _oe()
    d = dispatch.dispatch_report(cfg, policy, mode="rollout", platform="tpu")
    assert (d.backend, d.family) == ("fused", "oe_episode")


def test_no_market_order_wrapper_stays_fixed():
    """A fixed quote policy wrapped for limit+market envs keeps a fused
    lane (action extended with zero MO columns)."""
    from mbt_gym_tpu.utils.config import lam_env_config

    cfg = lam_env_config(num_trajectories=N)
    policy = no_market_order_policy(fixed_spread_policy(1.0))
    d = dispatch.dispatch_report(cfg, policy, mode="rollout", platform="tpu")
    assert (d.backend, d.family) == ("fused", "fixed")
    assert dispatch.policy_meta(policy)["action"] == (1.0, 1.0, 0.0, 0.0)


# --------------------------------------------------------- clean fallbacks
def test_cpu_platform_falls_back_with_tpu_reason():
    cfg, policy = _as()
    d = dispatch.dispatch_report(cfg, policy)  # detected platform == cpu
    assert d.backend == "xla"
    assert "requires a TPU backend" in d.reason
    assert "as_episode" in d.reason  # says WHAT would have been eligible


def test_untagged_policy_falls_back():
    cfg, _ = _as()

    def custom(params, obs, state):
        return jnp.ones((obs.shape[0], 2), obs.dtype)

    d = dispatch.dispatch_report(cfg, custom, platform="tpu")
    assert d.backend == "xla" and "no dispatch metadata" in d.reason


def test_float64_config_falls_back():
    cfg, policy = _as()
    cfg64 = as_env_config(num_trajectories=N, dtype="float64")
    d = dispatch.dispatch_report(
        cfg64,
        AvellanedaStoikovAgent.from_config(cfg64, risk_aversion=0.1).policy(),
        platform="tpu",
    )
    assert d.backend == "xla" and "float64" in d.reason


def test_callable_reset_spec_falls_back():
    cfg, _ = _as()
    cfg_cb = dataclasses.replace(cfg, start_time=lambda: 0.0)
    policy = AvellanedaStoikovAgent.from_config(cfg_cb, risk_aversion=0.1).policy()
    d = dispatch.dispatch_report(cfg_cb, policy, platform="tpu")
    assert d.backend == "xla" and "start time" in d.reason


def test_strict_bug_fill_falls_back():
    from mbt_gym_tpu.processes.fills import TriangularFill

    base = cj_env_config(num_trajectories=N, max_inventory=10.0)
    agent = CarteaJaimungalMmAgent.from_config(base)
    cfg = dataclasses.replace(
        base,
        dynamics=dataclasses.replace(
            base.dynamics,
            fill_probability_model=TriangularFill(
                max_fill_depth=1.0, strict_reference_bug=True
            ),
        ),
    )
    d = dispatch.dispatch_report(cfg, agent.policy(), platform="tpu")
    assert d.backend == "xla" and "strict_reference_bug" in d.reason


def test_mismatched_agent_falls_back():
    cfg, _ = _as()
    other = dataclasses.replace(
        as_env_config(num_trajectories=N), dynamics=cfg.dynamics
    )
    wrong = dataclasses.replace(
        AvellanedaStoikovAgent.from_config(cfg, risk_aversion=0.1),
        volatility=99.0,
    )
    d = dispatch.dispatch_report(cfg, wrong.policy(), platform="tpu")
    assert d.backend == "xla" and "differ from the env config" in d.reason


def test_non_lane_batch_falls_back():
    cfg = as_env_config(num_trajectories=1000)  # not a multiple of 128
    policy = AvellanedaStoikovAgent.from_config(cfg, risk_aversion=0.1).policy()
    d = dispatch.dispatch_report(cfg, policy, platform="tpu")
    assert d.backend == "xla" and "multiple of" in d.reason


def test_reward_scaling_falls_back():
    cfg = dataclasses.replace(as_env_config(num_trajectories=N), reward_scaling=2.0)
    policy = AvellanedaStoikovAgent.from_config(cfg, risk_aversion=0.1).policy()
    d = dispatch.dispatch_report(cfg, policy, platform="tpu")
    assert d.backend == "xla" and "reward_scaling" in d.reason


# ------------------------------------------------- entry-point integration
def test_rollout_auto_on_cpu_is_the_engine():
    """On a CPU host auto falls back to XLA: bitwise-identical results to
    backend='xla' (same engine path, same key)."""
    from mbt_gym_tpu.rollout import rollout

    cfg, policy = _as()
    key = jax.random.PRNGKey(7)
    auto = rollout(cfg, policy, None, key)  # backend defaults to auto
    xla = rollout(cfg, policy, None, key, backend="xla")
    for a, b in zip(auto.trajectory, xla.trajectory):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_rollout_backend_fused_raises_on_cpu_with_reason():
    from mbt_gym_tpu.rollout import mc_episode_stats, rollout

    cfg, policy = _as()
    with pytest.raises(ValueError, match="requires a TPU backend"):
        rollout(cfg, policy, None, jax.random.PRNGKey(0), backend="fused")
    with pytest.raises(ValueError, match="requires a TPU backend"):
        mc_episode_stats(cfg, policy, None, jax.random.PRNGKey(0), backend="fused")


def test_injected_noise_always_runs_xla():
    from mbt_gym_tpu.rollout import native_noise_cube, rollout

    cfg, policy = _as()
    cube = native_noise_cube(cfg, jax.random.PRNGKey(1), cfg.n_steps)
    res = rollout(cfg, policy, None, jax.random.PRNGKey(2), noise=cube)
    assert res.trajectory.rewards.shape == (cfg.n_steps, N)


def test_evaluate_policy_backend_fused_raises_on_cpu():
    from mbt_gym_tpu.agents import ppo

    cfg = dataclasses.replace(
        as_env_config(num_trajectories=N, n_steps=8),
        normalise_observation_space=True, normalise_action_space=True,
    )
    ts = ppo.init_train_state(cfg, ppo.PPOConfig(hidden=(8, 8)), jax.random.PRNGKey(0))
    # auto on CPU runs the engine and returns a finite scalar
    r = ppo.evaluate_policy(cfg, ts.params, jax.random.PRNGKey(1), 1)
    assert np.isfinite(float(r))
    with pytest.raises(ValueError, match="requires a TPU backend"):
        ppo.evaluate_policy(cfg, ts.params, jax.random.PRNGKey(1), 1, "fused")


# -------------------------------------------- fused execution (TPU-gated)
@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="fused execution needs the hardware PRNG; the decision logic "
    "and the CPU fallback are covered above, kernel parity by the "
    "injected-noise tests in test_pallas_*.py",
)
def test_auto_rollout_matches_engine_stats_on_hardware():
    from mbt_gym_tpu.rollout import episode_stats, mc_episode_stats, rollout

    cfg = as_env_config(num_trajectories=16384)
    policy = AvellanedaStoikovAgent.from_config(cfg, risk_aversion=0.1).policy()
    assert dispatch.dispatch_report(cfg, policy).backend == "fused"
    res = jax.jit(
        lambda k: rollout(cfg, policy, None, k), static_argnums=()
    )(jax.random.PRNGKey(3))
    stats = {k: float(v) for k, v in episode_stats(cfg, res.trajectory).items()}
    assert abs(stats["mean_spread"] - 1.4918) < 0.02
    assert abs(stats["mean_pnl"] - 64.87) < 2.5
    mc = mc_episode_stats(cfg, policy, None, jax.random.PRNGKey(4), episodes=4)
    assert abs(float(mc["mean_spread"]) - 1.4918) < 0.02
    assert abs(float(mc["mean_pnl"]) - 64.87) < 2.5
    # final_state is engine-shaped
    assert res.final_state.cash.shape == (16384,)
    assert float(res.final_state.time[0]) == pytest.approx(cfg.terminal_time)


def test_long_horizon_table_rollout_falls_back_to_xla():
    """A horizon whose (T, ...) stream blocks exceed VMEM (the 2000-step
    CJP replication configs) must fall back with a reason in rollout mode
    while the stats mode stays fused — found by running
    examples/replicate_cjp.py through the front door on hardware."""
    cfg = cj_env_config(num_trajectories=N, max_inventory=100.0, n_steps=2000)
    policy = CarteaJaimungalMmAgent.from_config(cfg, max_inventory=100).policy()
    d = dispatch.dispatch_report(cfg, policy, mode="rollout", platform="tpu")
    assert d.backend == "xla" and "exceed VMEM" in d.reason
    d2 = dispatch.dispatch_report(cfg, policy, mode="stats", platform="tpu")
    assert (d2.backend, d2.family) == ("fused", "cj_table")


def test_lam_config_with_as_agent_falls_back():
    """LimitAndMarketOrderDynamics SUBCLASSES LimitOrderDynamics; the AS
    episode kernel must reject lam configs (its limit-only step would
    silently ignore market orders — round-5 review finding)."""
    from mbt_gym_tpu import rewards as rw
    from mbt_gym_tpu.utils.config import lam_env_config

    cfg = dataclasses.replace(
        lam_env_config(num_trajectories=N), reward_function=rw.PnL()
    )
    policy = AvellanedaStoikovAgent.from_config(cfg, risk_aversion=0.1).policy()
    d = dispatch.dispatch_report(cfg, policy, platform="tpu")
    assert d.backend == "xla" and "pure limit-order" in d.reason


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="hardware PRNG required; both kernels' CPU parity is covered "
    "by the injected-noise tests",
)
def test_oe_kernels_agree_on_hardware():
    """The two independent fused OE lanes — the terminal-state episode
    kernel (stats mode) and the schedule rollout kernel (trajectory mode)
    — must produce the same episode-reward distribution on hardware
    (different kernels, different PRNG streams, one contract)."""
    from mbt_gym_tpu.rollout import mc_episode_stats, rollout

    cfg = oe_env_config(num_trajectories=65536, initial_inventory=20.0)
    agent = CarteaJaimungalOeAgent.from_config(cfg, alpha=0.01)
    pol = agent.policy()
    mc = mc_episode_stats(cfg, pol, None, jax.random.PRNGKey(5), episodes=4)
    res = jax.jit(lambda k: rollout(cfg, pol, None, k))(jax.random.PRNGKey(6))
    r_mean = float(res.trajectory.rewards.sum(axis=0).mean())
    mc_mean = float(mc["mean_pnl"])
    se = float(mc["std_pnl"]) / (65536 * 4) ** 0.5 + float(mc["std_pnl"]) / 65536**0.5
    assert abs(r_mean - mc_mean) < max(8 * se, 0.5), (r_mean, mc_mean, se)


def test_mlp_deterministic_policy_decides_xla_by_measurement():
    """ppo.deterministic_policy is tagged and REGISTERED, but the family
    decides XLA by measurement (the engine beat the fused kernel for
    deterministic eval at every batch — BENCH_NOTES round 5); the reason
    carries the numbers so users see why."""
    from mbt_gym_tpu.agents import ppo

    cfg = dataclasses.replace(
        as_env_config(num_trajectories=N),
        normalise_observation_space=True, normalise_action_space=True,
    )
    pol = ppo.deterministic_policy(cfg)
    for mode in ("rollout", "stats"):
        d = dispatch.dispatch_report(cfg, pol, mode=mode, platform="tpu")
        assert d.backend == "xla" and "measured FASTER" in d.reason, (mode, d)


def test_mlp_final_obs_matches_engine_terminal():
    """The MLP streams kernel's new final_obs output must equal the
    engine's post-episode observation on the same draws (the terminal row
    the mlp_rollout dispatch family appends)."""
    from mbt_gym_tpu import env as env_lib
    from mbt_gym_tpu.agents import networks
    from mbt_gym_tpu.ops import pallas_rollout
    from mbt_gym_tpu.types import SlotNoise

    T = 6
    env_cfg = dataclasses.replace(
        as_env_config(num_trajectories=N, n_steps=T),
        normalise_observation_space=True, normalise_action_space=True,
    )
    params = networks.init_actor_critic(
        jax.random.PRNGKey(3), env_cfg.state_dim, env_cfg.action_dim,
        hidden=(16, 16), shared_trunk=True,
    )
    p = pallas_rollout.rollout_params_from_config(env_cfg)
    rng = np.random.default_rng(9)
    channels = rng.uniform(size=(T, 7, N)).astype(np.float32)
    channels[:, 4:7] = rng.normal(size=(T, 3, N)).astype(np.float32)
    channels = jnp.asarray(channels)
    *_, fin = pallas_rollout.mlp_rollout_pallas(
        p, params, 0, N, tile=128, interpret=True, noise=channels,
        final_obs=True,
    )
    state, obs = env_lib.reset(env_cfg, jax.random.PRNGKey(0))
    std = jnp.exp(params["log_std"])
    for t in range(T):
        mean, _ = networks.policy_value(params, obs)
        action = mean + std * channels[t, 4:6].T
        clipped = jnp.clip(action, -1.0, 1.0)
        noise = (
            SlotNoise(normal=channels[t, 6][:, None], uniform=None),
            SlotNoise(normal=None, uniform=channels[t, 0:2].T),
            SlotNoise(normal=None, uniform=channels[t, 2:4].T),
        )
        res = env_lib.step(env_cfg, state, clipped, noise=noise)
        state, obs = res.state, res.obs
    np.testing.assert_allclose(
        np.asarray(fin), np.asarray(obs).T, rtol=2e-4, atol=5e-4
    )


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="hardware PRNG required; decision logic and final-obs parity "
    "are covered on CPU above",
)
def test_evaluate_policy_fused_matches_engine_on_hardware():
    """The explicit kernel opt-in (evaluate_policy backend='fused') must
    agree with the engine default statistically; auto must run the engine
    (the measured-faster backend)."""
    from mbt_gym_tpu.agents import ppo
    from mbt_gym_tpu.rollout import mc_episode_stats

    cfg = dataclasses.replace(
        as_env_config(num_trajectories=16384),
        normalise_observation_space=True, normalise_action_space=True,
    )
    ts = ppo.init_train_state(
        cfg, ppo.PPOConfig(hidden=(256, 256)), jax.random.PRNGKey(0)
    )
    pol = ppo.deterministic_policy(cfg)
    d = dispatch.dispatch_report(cfg, pol, mode="stats", policy_params=ts.params)
    assert d.backend == "xla" and "measured FASTER" in d.reason
    r_fused = float(ppo.evaluate_policy(cfg, ts.params, jax.random.PRNGKey(1), 2, "fused"))
    r_auto = float(ppo.evaluate_policy(cfg, ts.params, jax.random.PRNGKey(2), 2))
    mc = mc_episode_stats(cfg, pol, ts.params, jax.random.PRNGKey(3), episodes=2)
    se = float(mc["std_pnl"]) / (2 * 16384) ** 0.5
    assert abs(r_fused - r_auto) < max(8 * se, 0.5), (r_fused, r_auto, se)
    assert abs(float(mc["mean_pnl"]) - r_auto) < max(8 * se, 0.5)
