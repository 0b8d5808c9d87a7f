"""Per-process unit tests: every stochastic process's one-step math checked
against a hand-written NumPy recursion (the reference formulae, SURVEY.md
§2.1), plus shape/bounds/noise-spec contracts."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

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
from mbt_gym_tpu.types import SlotNoise

N = 7
DT = 0.01
RNG = np.random.default_rng(0)
ARRIVALS = jnp.asarray(RNG.integers(0, 2, (N, 2)).astype(np.float32))
FILLS = jnp.asarray(RNG.integers(0, 2, (N, 2)).astype(np.float32))
ACTION = jnp.asarray(RNG.uniform(0.1, 2.0, (N, 2)).astype(np.float32))


def noise_for(proc):
    n_norm, n_unif = proc.noise_spec()
    return SlotNoise(
        normal=jnp.asarray(RNG.normal(size=(N, n_norm)).astype(np.float32)) if n_norm else None,
        uniform=jnp.asarray(RNG.uniform(size=(N, n_unif)).astype(np.float32)) if n_unif else None,
    )


def run_update(proc, state=None):
    state = proc.initial_state(N) if state is None else state
    noise = noise_for(proc)
    return state, noise, proc.update(state, ARRIVALS, FILLS, ACTION, noise, DT)


ALL_PROCESSES = [
    ConstantMidprice(),
    BrownianMotionMidprice(),
    GeometricBrownianMotionMidprice(),
    OuMidprice(),
    OuMidprice(dt_scaled_drift=True),
    ShortTermOuAlphaMidprice(),
    BrownianMotionJumpMidprice(),
    OuJumpMidprice(),
    ShortTermJumpAlphaMidprice(),
    HestonMidprice(),
    CevMidprice(gamma=0.8),
    PoissonArrivals(),
    PoissonArrivalsNonLinear(),
    HawkesArrivals(),
    ExponentialFill(),
    TriangularFill(),
    PowerFill(),
    ExogenousMmFill(bid_process=OuMidprice(initial_price=1.0), ask_process=OuMidprice(initial_price=1.0)),
    TemporaryPowerImpact(),
    TemporaryAndPermanentImpact(),
    TemporaryAndTransientImpact(),
    TransientImpact(),
]


@pytest.mark.parametrize("proc", ALL_PROCESSES, ids=lambda p: type(p).__name__)
def test_update_shape_and_bounds_contract(proc):
    state, noise, new_state = run_update(proc)
    assert state.shape == (N, proc.state_dim)
    assert new_state.shape == (N, proc.state_dim)
    lo, hi = proc.bounds()
    assert len(lo) == len(hi) == proc.state_dim
    assert np.isfinite(np.asarray(new_state)).all()


def test_brownian_motion_step():
    proc = BrownianMotionMidprice(drift=0.3, volatility=2.0, initial_price=50.0)
    state, noise, new = run_update(proc)
    expected = np.asarray(state) + 0.3 * DT + 2.0 * np.sqrt(DT) * np.asarray(noise.normal)
    np.testing.assert_allclose(np.asarray(new), expected, rtol=1e-6)


def test_gbm_step():
    proc = GeometricBrownianMotionMidprice(drift=0.1, volatility=0.2)
    state, noise, new = run_update(proc)
    s = np.asarray(state)
    expected = s + 0.1 * s * DT + 0.2 * s * np.sqrt(DT) * np.asarray(noise.normal)
    np.testing.assert_allclose(np.asarray(new), expected, rtol=1e-6)


def test_ou_quirk_drift_not_dt_scaled():
    """Reference quirk (midprice_models.py:141-143): drift term NOT * dt."""
    proc = OuMidprice(mean_reversion_level=1.0, mean_reversion_speed=0.5, volatility=2.0)
    state, noise, new = run_update(proc)
    s = np.asarray(state)
    expected = s - 0.5 * (s - 1.0) + 2.0 * np.sqrt(DT) * np.asarray(noise.normal)
    np.testing.assert_allclose(np.asarray(new), expected, rtol=1e-6)
    # and the corrected variant IS dt-scaled
    proc2 = OuMidprice(mean_reversion_level=1.0, mean_reversion_speed=0.5, dt_scaled_drift=True)
    state2, noise2, new2 = run_update(proc2)
    s2 = np.asarray(state2)
    expected2 = s2 - 0.5 * DT * (s2 - 1.0) + 2.0 * np.sqrt(DT) * np.asarray(noise2.normal)
    np.testing.assert_allclose(np.asarray(new2), expected2, rtol=1e-6)


def test_bm_jump_reacts_to_own_fills():
    proc = BrownianMotionJumpMidprice(drift=0.0, volatility=0.0, jump_size=2.0)
    state, noise, new = run_update(proc)
    hits_bid = np.asarray(ARRIVALS[:, 0] * FILLS[:, 0])
    hits_ask = np.asarray(ARRIVALS[:, 1] * FILLS[:, 1])
    expected = np.asarray(state)[:, 0] + 2.0 * (hits_ask - hits_bid)
    np.testing.assert_allclose(np.asarray(new)[:, 0], expected, rtol=1e-6)


def test_heston_variance_nonnegative_and_correlated():
    proc = HestonMidprice(weiner_correlation=-0.8)
    state, noise, new = run_update(proc)
    assert (np.asarray(new)[:, 1] >= 0).all()
    # price uses w0 = n0 exactly
    s = np.asarray(state)
    vol = np.sqrt(s[:, 1] * DT)
    expected_price = s[:, 0] + proc.drift * s[:, 0] * DT + vol * s[:, 0] * np.asarray(noise.normal)[:, 0]
    np.testing.assert_allclose(np.asarray(new)[:, 0], expected_price, rtol=1e-5)


def test_poisson_arrivals_probability():
    proc = PoissonArrivals(intensity=(100.0, 50.0))
    u = jnp.asarray([[0.0005, 0.0005], [0.9, 0.3], [0.0011, 0.00049]], dtype=jnp.float32)
    arr = np.asarray(proc.get_arrivals(None, u, 0.00001))
    # probs = (0.001, 0.0005)
    np.testing.assert_array_equal(arr, [[1.0, 0.0], [0.0, 0.0], [0.0, 1.0]])


def test_poisson_nonlinear_probability():
    proc = PoissonArrivalsNonLinear(intensity=(100.0, 100.0))
    p = 1 - np.exp(-100.0 * DT)
    u = jnp.asarray([[p - 1e-4, p + 1e-4]], dtype=jnp.float32)
    arr = np.asarray(proc.get_arrivals(None, u, DT))
    np.testing.assert_array_equal(arr, [[1.0, 0.0]])


def test_hawkes_self_excitation():
    proc = HawkesArrivals(baseline_arrival_rate=(10.0, 10.0), jump_size=40.0, mean_reversion_speed=60.0)
    state = proc.initial_state(2) + 5.0  # intensity 15
    arrivals = jnp.asarray([[1.0, 0.0], [0.0, 0.0]])
    new = np.asarray(proc.update(state, arrivals, FILLS[:2], ACTION[:2], noise_for(proc), DT))
    expected_no_jump = 15.0 + 60.0 * (10.0 - 15.0) * DT
    np.testing.assert_allclose(new[1], [expected_no_jump] * 2, rtol=1e-5)
    np.testing.assert_allclose(new[0], [expected_no_jump + 40.0, expected_no_jump], rtol=1e-5)


def test_fill_probabilities():
    depths = jnp.asarray([[0.5, 1.0], [-0.2, 2.0]], dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(ExponentialFill(1.5).fill_probability(None, depths)),
        np.exp(-1.5 * np.asarray(depths)), rtol=1e-6,
    )
    tri = np.asarray(TriangularFill(1.0).fill_probability(None, depths))
    np.testing.assert_allclose(tri, [[0.5, 0.0], [1.0, 0.0]], atol=1e-6)
    pw = np.asarray(PowerFill(1.5, 1.5).fill_probability(None, depths))
    expected = 1.0 / (1.0 + (1.5 * np.maximum(np.asarray(depths), 0)) ** 1.5)
    np.testing.assert_allclose(pw, expected, rtol=1e-6)


def test_exogenous_mm_fill_inside_and_outside_best():
    proc = ExogenousMmFill(
        bid_process=ConstantMidprice(initial_price=1.0),
        ask_process=ConstantMidprice(initial_price=1.0),
        fill_exponent=2.0,
        base_fill_probability=0.8,
    )
    state = proc.initial_state(2)
    depths = jnp.asarray([[0.5, 1.0], [1.5, 2.0]], dtype=jnp.float32)
    p = np.asarray(proc.fill_probability(state, depths))
    np.testing.assert_allclose(p[0], [1.0, 1.0], atol=1e-6)  # at/inside best depth
    np.testing.assert_allclose(p[1], 0.8 * np.exp(-2.0 * np.asarray([0.5, 1.0])), rtol=1e-5)


def test_impact_models_math():
    speed = jnp.asarray([[3.0]] * N, dtype=jnp.float32)
    tp = TemporaryPowerImpact(temporary_impact_coefficient=0.02, temporary_impact_exponent=2.0)
    np.testing.assert_allclose(np.asarray(tp.get_impact(None, speed))[:, 0], 0.02 * 9.0, rtol=1e-6)

    tap = TemporaryAndPermanentImpact(temporary_impact_coefficient=0.01, permanent_impact_coefficient=0.05)
    state = tap.initial_state(N) + 0.3
    new = np.asarray(tap.update(state, None, None, speed, None, DT))
    np.testing.assert_allclose(new[:, 0], 0.3 + 0.05 * 3.0 * DT, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(tap.get_impact(state, speed))[:, 0], 0.01 * 3.0 + 0.3, rtol=1e-5
    )

    tt = TemporaryAndTransientImpact(
        temporary_impact_coefficient=0.01, transient_impact_coefficient=0.2,
        resilience_coefficient=0.5, linear_kernel_coefficient=0.3,
    )
    state = tt.initial_state(N)  # 0.01
    new = np.asarray(tt.update(state, None, None, speed, None, DT))
    np.testing.assert_allclose(new[:, 0], 0.01 - 0.5 * 0.01 * DT + 0.3 * 3.0 * DT, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(tt.get_impact(state, speed))[:, 0], 0.01 * 3.0 + 0.2 * 0.01, rtol=1e-5
    )

    tr = TransientImpact(transient_impact_coefficient=0.2)
    np.testing.assert_allclose(
        np.asarray(tr.get_impact(tr.initial_state(N), speed))[:, 0], 0.2 * 0.01, rtol=1e-5
    )


def test_composite_alpha_models_vectorize():
    """The reference crashes for N>1 here (midprice_models.py:181-187) —
    the rebuild must not."""
    for proc in (ShortTermOuAlphaMidprice(), ShortTermJumpAlphaMidprice()):
        state, noise, new = run_update(proc)
        assert new.shape == (N, 2)
        # price drifts at alpha * dt
        s = np.asarray(state)
        expected_price = (
            s[:, 0] + s[:, 1] * DT + proc.volatility * np.sqrt(DT) * np.asarray(noise.normal)[:, 0]
        )
        np.testing.assert_allclose(np.asarray(new)[:, 0], expected_price, rtol=1e-5)
