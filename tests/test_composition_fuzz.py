"""Composition fuzz: random combinations of midprice/arrival/fill/impact
models, dynamics, and rewards must build, roll out under jit, and produce
finite, shape-consistent trajectories — the composability contract that is
the reference's headline feature (README.md:2)."""
import random

import jax
import numpy as np
import pytest

from mbt_gym_tpu import jit_rollout
from mbt_gym_tpu.dynamics import (
    AtTheTouchDynamics,
    LimitAndMarketOrderDynamics,
    LimitOrderDynamics,
    TradingWithSpeedDynamics,
)
from mbt_gym_tpu.env import EnvConfig
from mbt_gym_tpu.processes import (
    BrownianMotionJumpMidprice,
    BrownianMotionMidprice,
    CevMidprice,
    ConstantMidprice,
    ExogenousMmFill,
    ExponentialFill,
    GeometricBrownianMotionMidprice,
    HawkesArrivals,
    HestonMidprice,
    OuJumpMidprice,
    OuMidprice,
    PoissonArrivals,
    PoissonArrivalsNonLinear,
    PowerFill,
    ShortTermJumpAlphaMidprice,
    ShortTermOuAlphaMidprice,
    TemporaryAndPermanentImpact,
    TemporaryAndTransientImpact,
    TemporaryPowerImpact,
    TransientImpact,
    TriangularFill,
)
from mbt_gym_tpu.rewards import (
    CjMmCriterion,
    CjOeCriterion,
    ExponentialUtility,
    PnL,
    RunningInventoryPenalty,
)

MIDPRICES = [
    ConstantMidprice(),
    BrownianMotionMidprice(),
    GeometricBrownianMotionMidprice(),
    OuMidprice(),
    ShortTermOuAlphaMidprice(),
    BrownianMotionJumpMidprice(),
    OuJumpMidprice(),
    ShortTermJumpAlphaMidprice(),
    HestonMidprice(),
    CevMidprice(gamma=0.9),
]
ARRIVALS = [PoissonArrivals((50.0, 50.0)), PoissonArrivalsNonLinear((50.0, 50.0)), HawkesArrivals()]
FILLS = [
    ExponentialFill(),
    TriangularFill(),
    PowerFill(),
    ExogenousMmFill(bid_process=OuMidprice(initial_price=0.7, dt_scaled_drift=True),
                    ask_process=OuMidprice(initial_price=0.7, dt_scaled_drift=True)),
]
IMPACTS = [
    TemporaryPowerImpact(),
    TemporaryAndPermanentImpact(),
    TemporaryAndTransientImpact(),
    TransientImpact(),
]
MM_REWARDS = [PnL(), RunningInventoryPenalty(0.01, 0.001), CjMmCriterion(0.01, 0.001), ExponentialUtility()]


def _policy_for(dynamics):
    import jax.numpy as jnp

    a = dynamics.action_dim

    def policy(params, obs, state):
        if a == 1:
            return jnp.full((obs.shape[0], 1), -1.0, dtype=obs.dtype)
        base = jnp.full((obs.shape[0], 2), 0.4, dtype=obs.dtype)
        if a == 2:
            return base
        return jnp.concatenate([base, jnp.zeros((obs.shape[0], 2), obs.dtype)], axis=1)

    return policy


@pytest.mark.parametrize("trial", range(20))
def test_random_composition_rolls_out(trial):
    rng = random.Random(trial)
    kind = rng.choice(["limit", "touch", "limit_and_market", "speed"])
    mid = rng.choice(MIDPRICES)
    if kind == "limit":
        dyn = LimitOrderDynamics(midprice_model=mid, arrival_model=rng.choice(ARRIVALS),
                                 fill_probability_model=rng.choice(FILLS))
        reward = rng.choice(MM_REWARDS)
    elif kind == "touch":
        dyn = AtTheTouchDynamics(midprice_model=mid, arrival_model=rng.choice(ARRIVALS))
        reward = rng.choice(MM_REWARDS)
    elif kind == "limit_and_market":
        dyn = LimitAndMarketOrderDynamics(midprice_model=mid, arrival_model=rng.choice(ARRIVALS),
                                          fill_probability_model=rng.choice(FILLS))
        reward = rng.choice(MM_REWARDS)
    else:
        dyn = TradingWithSpeedDynamics(midprice_model=mid, price_impact_model=rng.choice(IMPACTS))
        reward = rng.choice([PnL(), CjOeCriterion(2e-4, 0.01)])

    cfg = EnvConfig(dynamics=dyn, reward_function=reward, n_steps=16, num_trajectories=16,
                    initial_inventory=rng.choice([0, 2, (-2, 3)]))
    res = jit_rollout(cfg, _policy_for(dyn), None, jax.random.PRNGKey(trial))
    obs = np.asarray(res.trajectory.observations)
    assert obs.shape == (17, 16, cfg.state_dim)
    assert np.isfinite(obs).all(), (kind, type(mid).__name__)
    assert np.isfinite(np.asarray(res.trajectory.rewards)).all()
    # time advances uniformly
    np.testing.assert_allclose(obs[-1, :, 2], 1.0, atol=1e-5)
