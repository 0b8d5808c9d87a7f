"""Reward unit tests — port of the reference's only unit-test file
(mbt_gym/rewards/tests/testRewardFunctions.py) plus coverage the reference
lacks (CjOe, ExponentialUtility)."""
import jax.numpy as jnp
import numpy as np
import pytest

from mbt_gym_tpu.rewards import (
    AgentStateView,
    CjMmCriterion,
    CjOeCriterion,
    ExponentialUtility,
    PnL,
    RewardAux,
    RunningInventoryPenalty,
)

STEP_SIZE = 0.2
TERMINAL_TIME = 1.0
PHI = 0.01
ALPHA = 1.0


def view(cash, inv, t, price):
    return AgentStateView(
        cash=jnp.asarray([cash]), inventory=jnp.asarray([inv]),
        time=jnp.asarray([t]), price=jnp.asarray([price]),
    )


# (cash, inventory, time, price) — testRewardFunctions.py:16-30
MOCK_OBSERVATIONS = [
    (100.0, 0.0, 0.0, 100.0),
    (0.5, 1.0, STEP_SIZE, 101.0),
    (102.0, 0.0, 2 * STEP_SIZE, 102.0),
    (103.0, 0.0, 3 * STEP_SIZE, 103.0),
    (206.5, -1.0, 4 * STEP_SIZE, 104.0),
    (103.0, 0.0, 5 * STEP_SIZE, 103.0),
]
MOCK_ACTIONS = [(0.5, 0.5), (0.5, 1.0), (0.5, 0.5), (1.0, 0.5), (0.5, 0.5)]

CURRENT = view(120.0, 2.0, 0.5, 100.0)
NEXT = view(20.0, 3.0, 0.5 + STEP_SIZE, 100.05)
ACTION = jnp.asarray([[1.0, 1.0]])
AUX = RewardAux(initial_inventory=jnp.zeros(1), episode_length=jnp.asarray(TERMINAL_TIME))


def test_pnl_per_step():
    expected = (20.0 + 3.0 * 100.05) - (120.0 + 2.0 * 100.0)
    actual = PnL().calculate(CURRENT, ACTION, NEXT, False, AUX)
    np.testing.assert_allclose(np.asarray(actual), expected, atol=1e-4)


def test_running_inventory_penalty():
    pnl = PnL().calculate(CURRENT, ACTION, NEXT, False, AUX)
    expected = pnl - PHI * STEP_SIZE * 3.0**2
    actual = RunningInventoryPenalty(PHI, ALPHA).calculate(CURRENT, ACTION, NEXT, False, AUX)
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected), atol=1e-4)


def _accumulate(reward_fn, observations, actions, aux):
    total = 0.0
    for i, action in enumerate(actions):
        cur = view(*observations[i])
        nxt = view(*observations[i + 1])
        terminal = observations[i + 1][2] == TERMINAL_TIME
        total += float(reward_fn.calculate(cur, jnp.asarray([action]), nxt, terminal, aux)[0])
    return total


@pytest.mark.parametrize("initial_inventory,initial_cash", [(0.0, 100.0), (2.0, -100.0)])
def test_cjmm_telescopes_to_running_penalty(initial_inventory, initial_cash):
    """The pathwise-decomposed CjMm criterion must telescope to the same
    episode total as RunningInventoryPenalty (testRewardFunctions.py:61-135)."""
    obs = [list(o) for o in MOCK_OBSERVATIONS]
    obs[0][1] = initial_inventory
    obs[0][0] = initial_cash
    obs[-1] = list(obs[-2])
    obs[-1][2] = 1.0
    aux = RewardAux(
        initial_inventory=jnp.asarray([initial_inventory]),
        episode_length=jnp.asarray(TERMINAL_TIME - obs[0][2]),
    )
    cj = CjMmCriterion(PHI, ALPHA, terminal_time=TERMINAL_TIME)
    target = RunningInventoryPenalty(PHI, ALPHA)
    total_cj = _accumulate(cj, obs, MOCK_ACTIONS, aux)
    total_target = _accumulate(target, obs, MOCK_ACTIONS, aux)
    np.testing.assert_allclose(total_cj, total_target, atol=1e-4)


def test_cjmm_partial_trajectory():
    start = 2
    obs = MOCK_OBSERVATIONS[start:]
    actions = MOCK_ACTIONS[start:]
    aux = RewardAux(
        initial_inventory=jnp.asarray([obs[0][1]]),
        episode_length=jnp.asarray(TERMINAL_TIME - obs[0][2]),
    )
    cj = CjMmCriterion(PHI, ALPHA, terminal_time=TERMINAL_TIME)
    target = RunningInventoryPenalty(PHI, ALPHA)
    np.testing.assert_allclose(
        _accumulate(cj, obs, actions, aux), _accumulate(target, obs, actions, aux), atol=1e-4
    )


def test_exponential_utility_zero_until_terminal():
    util = ExponentialUtility(risk_aversion=0.1)
    mid = util.calculate(CURRENT, ACTION, NEXT, False, AUX)
    np.testing.assert_allclose(np.asarray(mid), 0.0)
    term = util.calculate(CURRENT, ACTION, NEXT, True, AUX)
    expected = -np.exp(-0.1 * (20.0 + 3.0 * 100.05))
    np.testing.assert_allclose(np.asarray(term), expected, rtol=1e-5)


def test_cjoe_reduces_to_pnl_minus_running_penalty_when_alpha_zero():
    cjoe = CjOeCriterion(PHI, 0.0, terminal_time=TERMINAL_TIME)
    rip = RunningInventoryPenalty(PHI, 0.0)
    a = cjoe.calculate(CURRENT, ACTION[:, :1], NEXT, False, AUX)
    b = rip.calculate(CURRENT, ACTION, NEXT, False, AUX)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
