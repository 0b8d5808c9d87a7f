"""Randomized cross-engine parity fuzz: the fused Pallas rollout must
reproduce the XLA engine on injected noise across RANDOM parameterisations
of every supported (dynamics family x reward kind) combination — not just
the hand-picked configs of tests/test_pallas_rollout.py.  Catches
parameter-wiring bugs (a coefficient routed to the wrong field, a
normalisation branch skipped) that fixed-value tests can miss.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mbt_gym_tpu import env as env_lib
from mbt_gym_tpu.agents import networks
from mbt_gym_tpu.dynamics import (
    AtTheTouchDynamics,
    LimitAndMarketOrderDynamics,
    LimitOrderDynamics,
    TradingWithSpeedDynamics,
)
from mbt_gym_tpu.ops import pallas_rollout
from mbt_gym_tpu.processes.arrivals import (
    HawkesArrivals,
    PoissonArrivals,
    PoissonArrivalsNonLinear,
)
from mbt_gym_tpu.processes.fills import (
    ExogenousMmFill,
    ExponentialFill,
    PowerFill,
    TriangularFill,
)
from mbt_gym_tpu.processes.impact import (
    TemporaryAndPermanentImpact,
    TemporaryAndTransientImpact,
    TemporaryPowerImpact,
    TransientImpact,
)
from mbt_gym_tpu.processes.midprice import (
    BrownianMotionJumpMidprice,
    BrownianMotionMidprice,
    CevMidprice,
    GeometricBrownianMotionMidprice,
    HestonMidprice,
    OuJumpMidprice,
    OuMidprice,
    ShortTermOuAlphaMidprice,
)
from mbt_gym_tpu.rewards import (
    CjMmCriterion,
    CjOeCriterion,
    ExponentialUtility,
    PnL,
    RunningInventoryPenalty,
)
from mbt_gym_tpu.types import SlotNoise

N, T = 128, 5


def _random_env(rng, family):
    """A random valid EnvConfig for the given fused family."""
    sigma = float(rng.uniform(0.05, 3.0))
    s0 = float(rng.uniform(50.0, 200.0))
    mid_kinds = [
        BrownianMotionMidprice(
            initial_price=s0, drift=float(rng.uniform(-1.0, 1.0)),
            volatility=sigma, terminal_time=1.0,
        ),
        GeometricBrownianMotionMidprice(
            initial_price=s0, drift=float(rng.uniform(-0.2, 0.2)),
            volatility=sigma / 100.0, terminal_time=1.0,
        ),
        OuMidprice(
            initial_price=s0, mean_reversion_level=s0,
            mean_reversion_speed=float(rng.uniform(0.5, 5.0)),
            volatility=sigma, terminal_time=1.0,
            dt_scaled_drift=bool(rng.integers(0, 2)),
        ),
        BrownianMotionJumpMidprice(
            initial_price=s0, volatility=sigma,
            jump_size=float(rng.uniform(0.1, 1.0)), terminal_time=1.0,
        ),
        OuJumpMidprice(
            initial_price=s0, mean_reversion_level=s0,
            mean_reversion_speed=float(rng.uniform(0.5, 5.0)),
            volatility=sigma, jump_size=float(rng.uniform(0.1, 1.0)),
            terminal_time=1.0, dt_scaled_drift=bool(rng.integers(0, 2)),
        ),
        CevMidprice(
            initial_price=s0, drift=float(rng.uniform(-0.1, 0.1)),
            volatility=sigma / 100.0, gamma=float(rng.uniform(0.5, 1.0)),
            terminal_time=1.0,
        ),
        HestonMidprice(
            initial_price=s0, drift=float(rng.uniform(-0.1, 0.1)),
            volatility_mean_reversion_rate=float(rng.uniform(1.0, 5.0)),
            volatility_mean_reversion_level=float(rng.uniform(0.01, 0.1)),
            weiner_correlation=float(rng.uniform(-0.9, 0.0)),
            volatility_of_volatility=float(rng.uniform(0.1, 0.8)),
            initial_variance=float(rng.uniform(0.01, 0.1)),
            terminal_time=1.0,
        ),
        ShortTermOuAlphaMidprice(
            volatility=sigma,
            ou=OuMidprice(
                initial_price=float(rng.uniform(-1.0, 1.0)),
                mean_reversion_level=0.0,
                mean_reversion_speed=float(rng.uniform(0.5, 5.0)),
                volatility=float(rng.uniform(0.2, 2.0)),
                dt_scaled_drift=True,
            ),
            initial_price=s0, terminal_time=1.0,
        ),
    ]
    # fill-jump kinds (index 3, 4) need fills: exclude for speed dynamics
    if family in ("limit", "lam", "touch", "limit_exo"):
        mid = mid_kinds[rng.integers(0, len(mid_kinds))]
    else:
        mid = mid_kinds[[0, 1, 2, 5, 6, 7][rng.integers(0, 6)]]
    phi = float(rng.uniform(0.0, 1.0))
    alpha = float(rng.uniform(0.0, 0.01))
    exponent = float(rng.integers(1, 4))  # integer exponents stay finite
    mm_rewards = [
        PnL(),
        CjMmCriterion(per_step_inventory_aversion=phi,
                      terminal_inventory_aversion=alpha, terminal_time=1.0,
                      inventory_exponent=exponent),
        RunningInventoryPenalty(per_step_inventory_aversion=phi,
                                terminal_inventory_aversion=alpha,
                                inventory_exponent=exponent),
        ExponentialUtility(risk_aversion=float(rng.uniform(0.001, 0.02))),
    ]
    rates = (float(rng.uniform(20.0, 200.0)), float(rng.uniform(20.0, 200.0)))
    arrivals = [
        PoissonArrivals(intensity=rates),
        PoissonArrivalsNonLinear(intensity=rates),
        HawkesArrivals(
            baseline_arrival_rate=(rates[0] / 4, rates[1] / 4),
            jump_size=float(rng.uniform(5.0, 60.0)),
            mean_reversion_speed=float(rng.uniform(10.0, 100.0)),
        ),
    ][rng.integers(0, 3)]
    fills = [
        ExponentialFill(fill_exponent=float(rng.uniform(0.1, 3.0))),
        TriangularFill(max_fill_depth=float(rng.uniform(0.5, 3.0))),
        PowerFill(
            fill_exponent=float(rng.uniform(0.5, 3.0)),
            fill_multiplier=float(rng.uniform(0.5, 3.0)),
        ),
    ][rng.integers(0, 3)]
    q0 = int(rng.integers(-3, 4))
    if family == "limit_exo":
        # exogenous competing-MM fills with RANDOM inner best-depth kinds
        # per side (ou / bm / gbm) — the round-3 generalization
        def _exo_proc():
            kind = rng.integers(0, 3)
            d0 = float(rng.uniform(0.4, 1.5))
            if kind == 0:
                return OuMidprice(
                    initial_price=d0, mean_reversion_level=d0,
                    mean_reversion_speed=float(rng.uniform(0.5, 5.0)),
                    volatility=float(rng.uniform(0.02, 0.3)),
                    terminal_time=1.0, dt_scaled_drift=bool(rng.integers(0, 2)),
                )
            if kind == 1:
                return BrownianMotionMidprice(
                    initial_price=d0, drift=float(rng.uniform(-0.3, 0.3)),
                    volatility=float(rng.uniform(0.02, 0.3)), terminal_time=1.0,
                )
            return GeometricBrownianMotionMidprice(
                initial_price=d0, drift=float(rng.uniform(-0.3, 0.3)),
                volatility=float(rng.uniform(0.02, 0.3)), terminal_time=1.0,
            )

        fills = ExogenousMmFill(
            bid_process=_exo_proc(), ask_process=_exo_proc(),
            fill_exponent=float(rng.uniform(0.1, 3.0)),
            base_fill_probability=float(rng.uniform(0.5, 1.0)),
        )
        dyn = LimitOrderDynamics(
            midprice_model=mid, arrival_model=arrivals, fill_probability_model=fills
        )
        reward = mm_rewards[rng.integers(0, len(mm_rewards))]
    elif family == "limit":
        dyn = LimitOrderDynamics(
            midprice_model=mid, arrival_model=arrivals, fill_probability_model=fills
        )
        reward = mm_rewards[rng.integers(0, len(mm_rewards))]
    elif family == "lam":
        dyn = LimitAndMarketOrderDynamics(
            midprice_model=mid, arrival_model=arrivals, fill_probability_model=fills,
            fixed_market_half_spread=float(rng.uniform(0.1, 2.0)),
        )
        reward = mm_rewards[rng.integers(0, len(mm_rewards))]
    elif family == "touch":
        dyn = AtTheTouchDynamics(
            midprice_model=mid, arrival_model=arrivals,
            fixed_market_half_spread=float(rng.uniform(0.1, 2.0)),
        )
        reward = mm_rewards[rng.integers(0, len(mm_rewards))]
    else:  # speed
        impact = [
            TemporaryAndPermanentImpact(
                temporary_impact_coefficient=float(rng.uniform(0.001, 0.05)),
                permanent_impact_coefficient=float(rng.uniform(0.001, 0.05)),
                terminal_time=1.0,
            ),
            TemporaryPowerImpact(
                temporary_impact_coefficient=float(rng.uniform(0.001, 0.05)),
                temporary_impact_exponent=float(rng.integers(1, 4)),
            ),
            TransientImpact(
                transient_impact_coefficient=float(rng.uniform(0.001, 0.05)),
                resilience_coefficient=float(rng.uniform(0.001, 0.1)),
                linear_kernel_coefficient=float(rng.uniform(0.001, 0.05)),
            ),
            TemporaryAndTransientImpact(
                temporary_impact_coefficient=float(rng.uniform(0.001, 0.05)),
                transient_impact_coefficient=float(rng.uniform(0.001, 0.05)),
                resilience_coefficient=float(rng.uniform(0.001, 0.1)),
                linear_kernel_coefficient=float(rng.uniform(0.001, 0.05)),
            ),
        ][rng.integers(0, 4)]
        dyn = TradingWithSpeedDynamics(midprice_model=mid, price_impact_model=impact)
        oe_rewards = [
            PnL(),
            CjOeCriterion(per_step_inventory_aversion=phi,
                          terminal_inventory_aversion=alpha, terminal_time=1.0,
                          inventory_exponent=exponent),
            ExponentialUtility(risk_aversion=float(rng.uniform(0.001, 0.02))),
        ]
        reward = oe_rewards[rng.integers(0, len(oe_rewards))]
        q0 = int(rng.integers(1, 10))
    # normalise_action_space only meaningful for box actions away from {0,1}
    norm_act = bool(rng.integers(0, 2)) and family in ("limit", "lam", "limit_exo")
    return env_lib.EnvConfig(
        dynamics=dyn,
        reward_function=reward,
        terminal_time=1.0,
        n_steps=T,
        num_trajectories=N,
        initial_inventory=q0,
        initial_cash=float(rng.uniform(-50.0, 50.0)),
        max_inventory=float(rng.integers(5, 50)),
        normalise_observation_space=bool(rng.integers(0, 2)),
        normalise_action_space=norm_act,
    )


def _xla_reference(env_cfg, params, channels, a_dim, s_dim, has_exo=False):
    state, obs = env_lib.reset(env_cfg, jax.random.PRNGKey(0))
    std = jnp.exp(params["log_std"])
    low, high = env_cfg.action_bounds()
    if env_cfg.normalise_action_space:
        low, high = -jnp.ones(a_dim), jnp.ones(a_dim)
    n_eps = max(a_dim, 2)
    outs = []
    fam_speed = isinstance(env_cfg.dynamics, TradingWithSpeedDynamics)
    fam_touch = isinstance(env_cfg.dynamics, AtTheTouchDynamics)
    for t in range(T):
        mean, v = networks.policy_value(params, obs)
        eps = channels[t, 4 : 4 + a_dim].T
        action = mean + std * eps
        clipped = jnp.clip(action, jnp.asarray(low), jnp.asarray(high))
        # channel layout after the 4 uniforms + n_eps policy normals:
        # midprice normal, then 2 exo best-depth normals (exomm), then the
        # second-midprice normal (mid2) — pallas_rollout.hw_draws order.
        exo_at = 5 + n_eps
        mid2_at = exo_at + (2 if has_exo else 0)
        if channels.shape[1] > mid2_at:  # 2-dim midprice: 2 normal cols
            mid_noise = SlotNoise(
                normal=jnp.stack(
                    [channels[t, 4 + n_eps], channels[t, mid2_at]], axis=1
                ),
                uniform=None,
            )
        else:
            mid_noise = SlotNoise(normal=channels[t, 4 + n_eps][:, None], uniform=None)
        if fam_speed:
            noise = (mid_noise, SlotNoise(normal=None, uniform=None))
        elif fam_touch:
            noise = (mid_noise, SlotNoise(normal=None, uniform=channels[t, 0:2].T))
        else:
            fill_noise = SlotNoise(
                normal=channels[t, exo_at : exo_at + 2].T if has_exo else None,
                uniform=channels[t, 2:4].T,
            )
            noise = (
                mid_noise,
                SlotNoise(normal=None, uniform=channels[t, 0:2].T),
                fill_noise,
            )
        res = env_lib.step(env_cfg, state, clipped, noise=noise)
        outs.append((obs, action, v, res.reward))
        state, obs = res.state, res.obs
    return [jnp.stack(x) for x in zip(*outs)]


_FAMILY_SEED = {"limit": 11, "lam": 22, "touch": 33, "speed": 44, "limit_exo": 55}


@pytest.mark.parametrize("family", ["limit", "lam", "touch", "speed", "limit_exo"])
@pytest.mark.parametrize("trial", range(4))
def test_fused_rollout_fuzz_parity(family, trial):
    # fixed per-family seeds: hash() is per-process randomized and would
    # make failures unreproducible
    rng = np.random.default_rng(1000 * trial + _FAMILY_SEED[family])
    env_cfg = _random_env(rng, family)
    p = pallas_rollout.rollout_params_from_config(env_cfg)
    a_dim, s_dim = env_cfg.action_dim, env_cfg.state_dim
    has_exo = p.fill_kind == "exomm"
    params = networks.init_actor_critic(
        jax.random.PRNGKey(int(rng.integers(0, 1 << 30))), s_dim, a_dim,
        hidden=(16, 16), shared_trunk=True,
    )
    n_ch = pallas_rollout.n_noise_channels(a_dim, exomm=has_exo, mid2=p.has_mid2)
    channels = rng.uniform(size=(T, n_ch, N)).astype(np.float32)
    n_eps = max(a_dim, 2)
    channels[:, 4:n_ch] = rng.normal(size=(T, n_ch - 4, N)).astype(np.float32)
    channels = jnp.asarray(channels)

    batch = pallas_rollout.collect_rollout_fused(
        env_cfg, params, jax.random.PRNGKey(0), tile=128,
        interpret=True, noise=channels,
    )
    ref_obs, ref_act, ref_v, ref_r = _xla_reference(
        env_cfg, params, channels, a_dim, s_dim, has_exo=has_exo
    )
    # raw-scale configs (price ~ 50-200, cash paths to ~1e2) tolerate a
    # larger absolute band than the normalised fixed-config tests
    np.testing.assert_allclose(np.asarray(batch.obs), np.asarray(ref_obs), rtol=2e-4, atol=5e-3)
    np.testing.assert_allclose(np.asarray(batch.actions), np.asarray(ref_act), rtol=2e-4, atol=5e-3)
    np.testing.assert_allclose(np.asarray(batch.values), np.asarray(ref_v), rtol=2e-4, atol=5e-3)
    np.testing.assert_allclose(np.asarray(batch.rewards), np.asarray(ref_r), rtol=2e-3, atol=2e-2)
