"""Dynamics bookkeeping unit tests: cash/inventory updates for each of the
four action-semantics variants, checked against hand-computed values
(ModelDynamics.py formulas, SURVEY.md §2.2)."""
import jax.numpy as jnp
import numpy as np

from mbt_gym_tpu.dynamics import (
    AtTheTouchDynamics,
    LimitAndMarketOrderDynamics,
    LimitOrderDynamics,
    TradingWithSpeedDynamics,
)
from mbt_gym_tpu.processes.arrivals import PoissonArrivals
from mbt_gym_tpu.processes.fills import ExponentialFill
from mbt_gym_tpu.processes.impact import TemporaryAndPermanentImpact
from mbt_gym_tpu.processes.midprice import BrownianMotionMidprice

MID = 100.0
N = 3
CASH = jnp.zeros(N)
INV = jnp.zeros(N)
MIDPRICE = jnp.full((N,), MID)


def _mk_limit():
    return LimitOrderDynamics(
        midprice_model=BrownianMotionMidprice(),
        arrival_model=PoissonArrivals(),
        fill_probability_model=ExponentialFill(),
    )


def test_limit_order_bookkeeping():
    dyn = _mk_limit()
    # row 0: bid filled only; row 1: ask filled only; row 2: both
    arrivals = jnp.asarray([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    fills = jnp.ones((N, 2))
    action = jnp.asarray([[0.5, 0.7]] * N)
    cash, inv = dyn.update_agent(CASH, INV, MIDPRICE, {}, action, arrivals, fills, 0.01)
    # bid fill: buy 1 @ (mid - 0.5); ask fill: sell 1 @ (mid + 0.7)
    np.testing.assert_allclose(np.asarray(inv), [1.0, -1.0, 0.0])
    np.testing.assert_allclose(
        np.asarray(cash), [-(MID - 0.5), MID + 0.7, -(MID - 0.5) + MID + 0.7], atol=1e-4
    )


def test_at_the_touch_bookkeeping():
    dyn = AtTheTouchDynamics(
        midprice_model=BrownianMotionMidprice(),
        arrival_model=PoissonArrivals(),
        fixed_market_half_spread=0.5,
    )
    # Fills ARE the action (post-or-not): row 0 posts both, row 1 posts none.
    action = jnp.asarray([[1.0, 1.0], [0.0, 0.0], [1.0, 0.0]])
    arrivals = jnp.ones((N, 2))
    _, fills = dyn.get_arrivals_and_fills(
        {}, action, {"arrival_model": type("S", (), {"uniform": jnp.zeros((N, 2))})()}, 0.01
    )
    np.testing.assert_allclose(np.asarray(fills), np.asarray(action))
    cash, inv = dyn.update_agent(CASH, INV, MIDPRICE, {}, action, arrivals, action, 0.01)
    # both sides filled: buy @99.5, sell @100.5 -> +1.0 cash, inv 0
    np.testing.assert_allclose(np.asarray(cash), [1.0, 0.0, -99.5], atol=1e-4)
    np.testing.assert_allclose(np.asarray(inv), [0.0, 0.0, 1.0])


def test_limit_and_market_order_bookkeeping():
    dyn = LimitAndMarketOrderDynamics(
        midprice_model=BrownianMotionMidprice(),
        arrival_model=PoissonArrivals(),
        fill_probability_model=ExponentialFill(),
        fixed_market_half_spread=0.5,
    )
    # No limit fills; row 0 market-buys, row 1 market-sells, row 2 neither.
    arrivals = jnp.zeros((N, 2))
    fills = jnp.zeros((N, 2))
    action = jnp.asarray(
        [[0.5, 0.5, 1.0, 0.0], [0.5, 0.5, 0.0, 1.0], [0.5, 0.5, 0.4, 0.4]]
    )
    cash, inv = dyn.update_agent(CASH, INV, MIDPRICE, {}, action, arrivals, fills, 0.01)
    np.testing.assert_allclose(np.asarray(inv), [1.0, -1.0, 0.0])
    np.testing.assert_allclose(np.asarray(cash), [-(MID + 0.5), MID - 0.5, 0.0], atol=1e-4)


def test_trading_with_speed_bookkeeping():
    impact = TemporaryAndPermanentImpact(temporary_impact_coefficient=0.01)
    dyn = TradingWithSpeedDynamics(
        midprice_model=BrownianMotionMidprice(), price_impact_model=impact
    )
    dt = 0.01
    speed = jnp.asarray([[2.0], [-3.0], [0.0]])
    impact_state = impact.initial_state(N)  # zeros
    cash, inv = dyn.update_agent(
        CASH, INV, MIDPRICE, {"price_impact_model": impact_state}, speed, None, None, dt
    )
    exec_price = MID + 0.01 * np.asarray(speed)[:, 0]
    volume = np.asarray(speed)[:, 0] * dt
    np.testing.assert_allclose(np.asarray(inv), volume, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cash), -volume * exec_price, atol=1e-4)


def test_action_bounds_and_required_processes():
    dyn = _mk_limit()
    lo, hi = dyn.action_bounds()
    assert lo == (0.0, 0.0)
    np.testing.assert_allclose(hi, [dyn.fill_probability_model.max_depth] * 2)
    assert dyn.required_processes() == ("arrival_model", "fill_probability_model")
    names = [n for n, _ in dyn.processes()]
    assert names == ["midprice_model", "arrival_model", "fill_probability_model"]
