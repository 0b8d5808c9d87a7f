"""Bitwise seed-exactness vs the ACTUAL reference across the process zoo.

Extends tests/test_vs_reference.py beyond the headline BM+Poisson+Exp config:
every seed-controllable midprice / arrival / fill model is composed into a
limit-order env, run through the real reference implementation, and compared
bitwise against the TPU engine in float64 compat mode — including the
reference's documented bugs (power/triangular axis-0 ``np.max``,
OU missing-dt drift), reproduced via the strict flags.

As of round 3 NOTHING is excluded — every reference model is verified
against the actual implementation, working around its own defects:

- Heston & CEV draw from the legacy GLOBAL np.random: the stream is
  harvested by re-seeding and replaying the exact call sequence (N=1,
  where the reference's (N,1)x(N,) broadcasts are still sound);
- ShortTermOuAlpha / ShortTermJumpAlpha crash for N>1 AND their
  constructors build ragged min/max arrays that numpy >= 1.24 rejects —
  tested at N=1 through a constructor bypass that runs the reference's
  genuine update math (see _bypass_st_alpha);
- ExogenousMm with noisy inner processes is replayable only because the
  reference's exogenous depths are FROZEN (an update bug this file
  found) — ``strict_reference_bug=True`` reproduces it bitwise, see
  test_exomm_noisy_inner_processes_bitwise.
"""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def ref(reference_modules):
    return reference_modules


N, T, SEED = 32, 40, 77
DT = 1.0 / T

# (case name, reference model builder, our process)
def _midprice_cases(mm):
    from mbt_gym_tpu.processes import (
        BrownianMotionJumpMidprice,
        BrownianMotionMidprice,
        ConstantMidprice,
        GeometricBrownianMotionMidprice,
        OuJumpMidprice,
        OuMidprice,
    )

    common = dict(step_size=DT, terminal_time=1.0, num_trajectories=N)
    return [
        ("constant", mm.ConstantMidpriceModel(initial_price=100.0, **common),
         ConstantMidprice(initial_price=100.0)),
        ("bm", mm.BrownianMotionMidpriceModel(drift=0.5, volatility=2.0, initial_price=100.0, **common),
         BrownianMotionMidprice(drift=0.5, volatility=2.0, initial_price=100.0)),
        ("gbm", mm.GeometricBrownianMotionMidpriceModel(drift=0.1, volatility=0.2, initial_price=100.0, **common),
         GeometricBrownianMotionMidprice(drift=0.1, volatility=0.2, initial_price=100.0)),
        ("ou", mm.OuMidpriceModel(mean_reversion_level=100.0, mean_reversion_speed=0.5,
                                  volatility=1.0, initial_price=100.0, **common),
         OuMidprice(mean_reversion_level=100.0, mean_reversion_speed=0.5,
                    volatility=1.0, initial_price=100.0)),
        ("bm_jump", mm.BrownianMotionJumpMidpriceModel(drift=0.0, volatility=2.0, jump_size=0.5,
                                                       initial_price=100.0, **common),
         BrownianMotionJumpMidprice(drift=0.0, volatility=2.0, jump_size=0.5, initial_price=100.0)),
        ("ou_jump", mm.OuJumpMidpriceModel(mean_reversion_level=100.0, mean_reversion_speed=0.3,
                                           volatility=1.5, jump_size=0.4, initial_price=100.0, **common),
         OuJumpMidprice(mean_reversion_level=100.0, mean_reversion_speed=0.3,
                        volatility=1.5, jump_size=0.4, initial_price=100.0)),
    ]


def _arrival_cases(am):
    from mbt_gym_tpu.processes import HawkesArrivals, PoissonArrivals, PoissonArrivalsNonLinear

    return [
        ("poisson", am.PoissonArrivalModel(intensity=np.array([120.0, 90.0]), step_size=DT, num_trajectories=N),
         PoissonArrivals(intensity=(120.0, 90.0))),
        ("poisson_nl", am.PoissonArrivalNonLinearModel(intensity=np.array([80.0, 80.0]), step_size=DT, num_trajectories=N),
         PoissonArrivalsNonLinear(intensity=(80.0, 80.0))),
        ("hawkes", am.HawkesArrivalModel(baseline_arrival_rate=np.array([[20.0, 20.0]]), step_size=DT,
                                         jump_size=40.0, mean_reversion_speed=60.0,
                                         terminal_time=1.0, num_trajectories=N),
         HawkesArrivals(baseline_arrival_rate=(20.0, 20.0), jump_size=40.0, mean_reversion_speed=60.0)),
    ]


def _fill_cases(fm, mm):
    from mbt_gym_tpu.processes import (
        ConstantMidprice,
        ExogenousMmFill,
        ExponentialFill,
        PowerFill,
        TriangularFill,
    )

    exo_ref = fm.ExogenousMmFillProbabilityModel(
        exogenous_best_depth_processes=(
            mm.ConstantMidpriceModel(initial_price=0.8, step_size=DT, num_trajectories=N),
            mm.ConstantMidpriceModel(initial_price=0.8, step_size=DT, num_trajectories=N),
        ),
        fill_exponent=2.0, base_fill_probability=0.9, step_size=DT, num_trajectories=N,
    )
    return [
        ("exp", fm.ExponentialFillFunction(fill_exponent=1.5, step_size=DT, num_trajectories=N),
         ExponentialFill(fill_exponent=1.5)),
        # strict flags reproduce the reference's literal axis-0 np.max bugs
        ("triangular", fm.TriangularFillFunction(max_fill_depth=1.2, step_size=DT, num_trajectories=N),
         TriangularFill(max_fill_depth=1.2, strict_reference_bug=True)),
        ("power", fm.PowerFillFunction(fill_exponent=1.5, fill_multiplier=1.5, step_size=DT, num_trajectories=N),
         PowerFill(fill_exponent=1.5, fill_multiplier=1.5, strict_reference_bug=True)),
        ("exo_mm", exo_ref,
         ExogenousMmFill(bid_process=ConstantMidprice(initial_price=0.8),
                         ask_process=ConstantMidprice(initial_price=0.8),
                         fill_exponent=2.0, base_fill_probability=0.9)),
    ]


def _run_pair(ref, ref_mid, ref_arr, ref_fill, our_mid, our_arr, our_fill):
    import jax
    import jax.numpy as jnp
    from jax import enable_x64

    from mbt_gym_tpu.dynamics import LimitOrderDynamics
    from mbt_gym_tpu.env import EnvConfig
    from mbt_gym_tpu.ops.compat import reference_noise_cube
    from mbt_gym_tpu.rollout import rollout

    dynamics = ref["md"].LimitOrderModelDynamics(
        midprice_model=ref_mid, arrival_model=ref_arr, fill_probability_model=ref_fill,
        num_trajectories=N, max_depth=5.0,
    )
    env = ref["te"].TradingEnvironment(
        terminal_time=1.0, n_steps=T, seed=SEED, initial_inventory=0,
        model_dynamics=dynamics, max_inventory=T,
        normalise_action_space=False, normalise_observation_space=False,
        num_trajectories=N,
    )

    class FixedAgent:
        def get_action(self, obs):
            return np.full((N, 2), 0.45)

    ref_obs, _, ref_rewards = ref["gt"].generate_trajectory(env, FixedAgent())

    with enable_x64():
        cfg = EnvConfig(
            dynamics=LimitOrderDynamics(
                midprice_model=our_mid, arrival_model=our_arr,
                fill_probability_model=our_fill, max_depth=5.0,
            ),
            terminal_time=1.0, n_steps=T, max_inventory=float(T),
            num_trajectories=N, dtype="float64",
        )
        noise = reference_noise_cube(cfg, SEED, dtype="float64")

        def policy(params, obs, state):
            return jnp.full((N, 2), 0.45, dtype=obs.dtype)

        res = rollout(cfg, policy, None, jax.random.PRNGKey(0), noise=noise)

    ours_obs = np.asarray(res.trajectory.observations)  # (T+1, N, S)
    # inventory exact; cash/price tight; rewards tight
    np.testing.assert_array_equal(ours_obs[:, :, 1].T, ref_obs[:, 1, :])
    np.testing.assert_allclose(ours_obs[:, :, 0].T, ref_obs[:, 0, :], rtol=0, atol=1e-9)
    np.testing.assert_allclose(ours_obs[:, :, 3].T, ref_obs[:, 3, :], rtol=0, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(res.trajectory.rewards).T, ref_rewards[:, 0, :], rtol=0, atol=1e-8
    )


def test_midprice_matrix(ref):
    am, fm, mm = ref["am"], ref["fm"], ref["mm"]
    for name, ref_mid, our_mid in _midprice_cases(mm):
        ref_arr = am.PoissonArrivalModel(intensity=np.array([120.0, 90.0]), step_size=DT, num_trajectories=N)
        ref_fill = fm.ExponentialFillFunction(fill_exponent=1.5, step_size=DT, num_trajectories=N)
        from mbt_gym_tpu.processes import ExponentialFill, PoissonArrivals

        _run_pair(ref, ref_mid, ref_arr, ref_fill, our_mid,
                  PoissonArrivals(intensity=(120.0, 90.0)), ExponentialFill(1.5))


def test_arrival_matrix(ref):
    am, fm, mm = ref["am"], ref["fm"], ref["mm"]
    for name, ref_arr, our_arr in _arrival_cases(am):
        ref_mid = mm.BrownianMotionMidpriceModel(
            drift=0.0, volatility=2.0, initial_price=100.0, step_size=DT,
            terminal_time=1.0, num_trajectories=N,
        )
        ref_fill = fm.ExponentialFillFunction(fill_exponent=1.5, step_size=DT, num_trajectories=N)
        from mbt_gym_tpu.processes import BrownianMotionMidprice, ExponentialFill

        _run_pair(ref, ref_mid, ref_arr, ref_fill,
                  BrownianMotionMidprice(volatility=2.0, initial_price=100.0), our_arr,
                  ExponentialFill(1.5))


def test_fill_matrix(ref):
    am, fm, mm = ref["am"], ref["fm"], ref["mm"]
    for name, ref_fill, our_fill in _fill_cases(fm, mm):
        ref_mid = mm.BrownianMotionMidpriceModel(
            drift=0.0, volatility=2.0, initial_price=100.0, step_size=DT,
            terminal_time=1.0, num_trajectories=N,
        )
        ref_arr = am.PoissonArrivalModel(intensity=np.array([120.0, 90.0]), step_size=DT, num_trajectories=N)
        from mbt_gym_tpu.processes import BrownianMotionMidprice, PoissonArrivals

        _run_pair(ref, ref_mid, ref_arr, ref_fill,
                  BrownianMotionMidprice(volatility=2.0, initial_price=100.0),
                  PoissonArrivals(intensity=(120.0, 90.0)), our_fill)


def test_at_the_touch_dynamics_bitwise(ref):
    """AtTheTouchModelDynamics vs AtTheTouchDynamics (ModelDynamics.py:134-176):
    binary post decisions, fixed half-spread bookkeeping."""
    import jax
    import jax.numpy as jnp
    from jax import enable_x64

    from mbt_gym_tpu.dynamics import AtTheTouchDynamics
    from mbt_gym_tpu.env import EnvConfig
    from mbt_gym_tpu.ops.compat import reference_noise_cube
    from mbt_gym_tpu.processes import BrownianMotionMidprice, PoissonArrivals
    from mbt_gym_tpu.rollout import rollout

    am, mm, md, te, gt = ref["am"], ref["mm"], ref["md"], ref["te"], ref["gt"]
    dynamics = md.AtTheTouchModelDynamics(
        midprice_model=mm.BrownianMotionMidpriceModel(
            drift=0.0, volatility=2.0, initial_price=100.0, step_size=DT,
            terminal_time=1.0, num_trajectories=N,
        ),
        arrival_model=am.PoissonArrivalModel(
            intensity=np.array([120.0, 90.0]), step_size=DT, num_trajectories=N
        ),
        num_trajectories=N,
        fixed_market_half_spread=0.5,
    )
    env = te.TradingEnvironment(
        terminal_time=1.0, n_steps=T, seed=SEED, initial_inventory=0,
        model_dynamics=dynamics, max_inventory=T,
        normalise_action_space=False, normalise_observation_space=False,
        num_trajectories=N,
    )

    post_pattern = np.tile(np.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0], [0.0, 0.0]]), (N // 4, 1))

    class PostAgent:
        def get_action(self, obs):
            return post_pattern

    ref_obs, _, ref_rewards = gt.generate_trajectory(env, PostAgent())

    with enable_x64():
        cfg = EnvConfig(
            dynamics=AtTheTouchDynamics(
                midprice_model=BrownianMotionMidprice(volatility=2.0, initial_price=100.0),
                arrival_model=PoissonArrivals(intensity=(120.0, 90.0)),
                fixed_market_half_spread=0.5,
            ),
            terminal_time=1.0, n_steps=T, max_inventory=float(T),
            num_trajectories=N, dtype="float64",
        )
        noise = reference_noise_cube(cfg, SEED, dtype="float64")
        pattern = jnp.asarray(post_pattern)

        def policy(params, obs, state):
            return pattern.astype(obs.dtype)

        res = rollout(cfg, policy, None, jax.random.PRNGKey(0), noise=noise)

    ours = np.asarray(res.trajectory.observations)
    np.testing.assert_array_equal(ours[:, :, 1].T, ref_obs[:, 1, :])
    np.testing.assert_allclose(ours[:, :, 0].T, ref_obs[:, 0, :], rtol=0, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(res.trajectory.rewards).T, ref_rewards[:, 0, :], rtol=0, atol=1e-8
    )


def test_limit_and_market_dynamics_bitwise(ref):
    """LimitAndMarketOrderModelDynamics vs LimitAndMarketOrderDynamics
    (ModelDynamics.py:179-240): limit quotes + unit market orders."""
    import jax
    import jax.numpy as jnp
    from jax import enable_x64

    from mbt_gym_tpu.dynamics import LimitAndMarketOrderDynamics
    from mbt_gym_tpu.env import EnvConfig
    from mbt_gym_tpu.ops.compat import reference_noise_cube
    from mbt_gym_tpu.processes import BrownianMotionMidprice, ExponentialFill, PoissonArrivals
    from mbt_gym_tpu.rollout import rollout

    am, fm, mm, md, te, gt = ref["am"], ref["fm"], ref["mm"], ref["md"], ref["te"], ref["gt"]
    dynamics = md.LimitAndMarketOrderModelDynamics(
        midprice_model=mm.BrownianMotionMidpriceModel(
            drift=0.0, volatility=2.0, initial_price=100.0, step_size=DT,
            terminal_time=1.0, num_trajectories=N,
        ),
        arrival_model=am.PoissonArrivalModel(
            intensity=np.array([120.0, 90.0]), step_size=DT, num_trajectories=N
        ),
        fill_probability_model=fm.ExponentialFillFunction(
            fill_exponent=1.5, step_size=DT, num_trajectories=N
        ),
        num_trajectories=N,
        fixed_market_half_spread=0.5,
    )
    env = te.TradingEnvironment(
        terminal_time=1.0, n_steps=T, seed=SEED, initial_inventory=0,
        model_dynamics=dynamics, max_inventory=T,
        normalise_action_space=False, normalise_observation_space=False,
        num_trajectories=N,
    )

    # quotes 0.45/0.55 + a mix of market-order signals (> / < 0.5 threshold)
    action_pattern = np.tile(
        np.array([
            [0.45, 0.55, 0.9, 0.1],
            [0.45, 0.55, 0.1, 0.9],
            [0.45, 0.55, 0.6, 0.6],
            [0.45, 0.55, 0.2, 0.2],
        ]),
        (N // 4, 1),
    )

    class MixedAgent:
        def get_action(self, obs):
            return action_pattern

    ref_obs, _, ref_rewards = gt.generate_trajectory(env, MixedAgent())

    with enable_x64():
        cfg = EnvConfig(
            dynamics=LimitAndMarketOrderDynamics(
                midprice_model=BrownianMotionMidprice(volatility=2.0, initial_price=100.0),
                arrival_model=PoissonArrivals(intensity=(120.0, 90.0)),
                fill_probability_model=ExponentialFill(1.5),
                fixed_market_half_spread=0.5,
            ),
            terminal_time=1.0, n_steps=T, max_inventory=float(T),
            num_trajectories=N, dtype="float64",
        )
        noise = reference_noise_cube(cfg, SEED, dtype="float64")
        pattern = jnp.asarray(action_pattern)

        def policy(params, obs, state):
            return pattern.astype(obs.dtype)

        res = rollout(cfg, policy, None, jax.random.PRNGKey(0), noise=noise)

    ours = np.asarray(res.trajectory.observations)
    np.testing.assert_array_equal(ours[:, :, 1].T, ref_obs[:, 1, :])
    np.testing.assert_allclose(ours[:, :, 0].T, ref_obs[:, 0, :], rtol=0, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(res.trajectory.rewards).T, ref_rewards[:, 0, :], rtol=0, atol=1e-8
    )


def _run_speed_pair(ref, ref_impact, our_impact, ref_reward, our_reward, q0=10):
    """Speed dynamics (TradinghWithSpeedModelDynamics) with a given impact
    model and reward, bitwise vs the actual reference."""
    import jax
    import jax.numpy as jnp
    from jax import enable_x64

    from mbt_gym_tpu.dynamics import TradingWithSpeedDynamics
    from mbt_gym_tpu.env import EnvConfig
    from mbt_gym_tpu.ops.compat import reference_noise_cube
    from mbt_gym_tpu.processes import BrownianMotionMidprice
    from mbt_gym_tpu.rollout import rollout

    mm, md, te, gt = ref["mm"], ref["md"], ref["te"], ref["gt"]
    dynamics = md.TradinghWithSpeedModelDynamics(
        midprice_model=mm.BrownianMotionMidpriceModel(
            drift=0.0, volatility=2.0, initial_price=100.0, step_size=DT,
            terminal_time=1.0, num_trajectories=N,
        ),
        price_impact_model=ref_impact,
        num_trajectories=N,
    )
    kwargs = dict(
        terminal_time=1.0, n_steps=T, seed=SEED, initial_inventory=q0,
        model_dynamics=dynamics, max_inventory=10 * T,
        normalise_action_space=False, normalise_observation_space=False,
        num_trajectories=N,
    )
    if ref_reward is not None:
        kwargs["reward_function"] = ref_reward
    env = te.TradingEnvironment(**kwargs)

    class SpeedAgent:
        def get_action(self, obs):
            return np.full((N, 1), -3.0)

    ref_obs, _, ref_rewards = gt.generate_trajectory(env, SpeedAgent())

    with enable_x64():
        cfg_kwargs = dict(
            dynamics=TradingWithSpeedDynamics(
                midprice_model=BrownianMotionMidprice(volatility=2.0, initial_price=100.0),
                price_impact_model=our_impact,
            ),
            terminal_time=1.0, n_steps=T, max_inventory=float(10 * T),
            initial_inventory=q0, num_trajectories=N, dtype="float64",
        )
        if our_reward is not None:
            cfg_kwargs["reward_function"] = our_reward
        cfg = EnvConfig(**cfg_kwargs)
        noise = reference_noise_cube(cfg, SEED, dtype="float64")

        def policy(params, obs, state):
            return jnp.full((N, 1), -3.0, dtype=obs.dtype)

        res = rollout(cfg, policy, None, jax.random.PRNGKey(0), noise=noise)

    ours = np.asarray(res.trajectory.observations)
    np.testing.assert_allclose(ours[:, :, 1].T, ref_obs[:, 1, :], rtol=0, atol=1e-12)
    np.testing.assert_allclose(ours[:, :, 0].T, ref_obs[:, 0, :], rtol=0, atol=1e-8)
    np.testing.assert_allclose(ours[:, :, 3].T, ref_obs[:, 3, :], rtol=0, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(res.trajectory.rewards).T, ref_rewards[:, 0, :], rtol=0, atol=1e-8
    )


def test_speed_dynamics_impact_matrix(ref):
    """All four impact models under speed dynamics, bitwise."""
    import mbt_gym.stochastic_processes.price_impact_models as pim

    from mbt_gym_tpu.processes import (
        TemporaryAndPermanentImpact,
        TemporaryAndTransientImpact,
        TemporaryPowerImpact,
        TransientImpact,
    )

    cases = [
        (pim.TemporaryPowerPriceImpact(temporary_impact_coefficient=0.02,
                                       temporary_impact_exponent=1.0, num_trajectories=N),
         TemporaryPowerImpact(temporary_impact_coefficient=0.02, temporary_impact_exponent=1.0)),
        (pim.TemporaryAndPermanentPriceImpact(temporary_impact_coefficient=0.01,
                                              permanent_impact_coefficient=0.02,
                                              n_steps=T, terminal_time=1.0, num_trajectories=N),
         TemporaryAndPermanentImpact(temporary_impact_coefficient=0.01,
                                     permanent_impact_coefficient=0.02, terminal_time=1.0)),
        (pim.TemporaryAndTransientPriceImpact(temporary_impact_coefficient=0.01,
                                              transient_impact_coefficient=0.2,
                                              resilience_coefficient=0.5,
                                              initial_transient_impact=0.01,
                                              linear_kernel_coefficient=0.3,
                                              n_steps=T, terminal_time=1.0, num_trajectories=N),
         TemporaryAndTransientImpact(temporary_impact_coefficient=0.01,
                                     transient_impact_coefficient=0.2,
                                     resilience_coefficient=0.5,
                                     initial_transient_impact=0.01,
                                     linear_kernel_coefficient=0.3, terminal_time=1.0)),
        (pim.TransientPriceImpact(transient_impact_coefficient=0.2, resilience_coefficient=0.5,
                                  initial_transient_impact=0.01, linear_kernel_coefficient=0.3,
                                  n_steps=T, terminal_time=1.0, num_trajectories=N),
         TransientImpact(transient_impact_coefficient=0.2, resilience_coefficient=0.5,
                         initial_transient_impact=0.01, linear_kernel_coefficient=0.3,
                         terminal_time=1.0)),
    ]
    for ref_impact, our_impact in cases:
        _run_speed_pair(ref, ref_impact, our_impact, None, None)


def test_speed_dynamics_cjoe_and_utility_rewards(ref):
    """CjOeCriterion and ExponentialUtility episode rewards, bitwise."""
    import mbt_gym.rewards.RewardFunctions as rrf
    import mbt_gym.stochastic_processes.price_impact_models as pim

    from mbt_gym_tpu.processes import TemporaryAndPermanentImpact
    from mbt_gym_tpu.rewards import CjOeCriterion, ExponentialUtility

    ref_impact = lambda: pim.TemporaryAndPermanentPriceImpact(
        temporary_impact_coefficient=0.01, permanent_impact_coefficient=0.02,
        n_steps=T, terminal_time=1.0, num_trajectories=N,
    )
    our_impact = TemporaryAndPermanentImpact(
        temporary_impact_coefficient=0.01, permanent_impact_coefficient=0.02, terminal_time=1.0
    )
    _run_speed_pair(
        ref, ref_impact(), our_impact,
        rrf.CjOeCriterion(per_step_inventory_aversion=2e-4, terminal_inventory_aversion=0.01,
                          terminal_time=1.0),
        CjOeCriterion(per_step_inventory_aversion=2e-4, terminal_inventory_aversion=0.01,
                      terminal_time=1.0),
    )
    # ExponentialUtility: the reference returns a literal int 0 on
    # non-terminal steps (RewardFunctions.py:153-163), which crashes its own
    # generate_trajectory (`reward.reshape` on int) — step the reference env
    # manually instead.
    import jax
    import jax.numpy as jnp
    from jax import enable_x64

    from mbt_gym_tpu.dynamics import TradingWithSpeedDynamics
    from mbt_gym_tpu.env import EnvConfig
    from mbt_gym_tpu.ops.compat import reference_noise_cube
    from mbt_gym_tpu.processes import BrownianMotionMidprice
    from mbt_gym_tpu.rollout import rollout

    mm, md, te = ref["mm"], ref["md"], ref["te"]
    dynamics = md.TradinghWithSpeedModelDynamics(
        midprice_model=mm.BrownianMotionMidpriceModel(
            drift=0.0, volatility=2.0, initial_price=100.0, step_size=DT,
            terminal_time=1.0, num_trajectories=N,
        ),
        price_impact_model=ref_impact(),
        num_trajectories=N,
    )
    env = te.TradingEnvironment(
        terminal_time=1.0, n_steps=T, seed=SEED, initial_inventory=10,
        model_dynamics=dynamics, max_inventory=10 * T,
        normalise_action_space=False, normalise_observation_space=False,
        num_trajectories=N, reward_function=rrf.ExponentialUtility(risk_aversion=0.01),
    )
    env.reset()
    ref_rewards = np.zeros((T, N))
    for t in range(T):
        _, r, _, _ = env.step(np.full((N, 1), -3.0))
        ref_rewards[t] = np.asarray(r, dtype=np.float64).reshape(-1) if np.ndim(r) else float(r)

    with enable_x64():
        cfg = EnvConfig(
            dynamics=TradingWithSpeedDynamics(
                midprice_model=BrownianMotionMidprice(volatility=2.0, initial_price=100.0),
                price_impact_model=our_impact,
            ),
            reward_function=ExponentialUtility(risk_aversion=0.01),
            terminal_time=1.0, n_steps=T, max_inventory=float(10 * T),
            initial_inventory=10, num_trajectories=N, dtype="float64",
        )
        noise = reference_noise_cube(cfg, SEED, dtype="float64")
        res = rollout(
            cfg, lambda p, o, s: jnp.full((N, 1), -3.0, dtype=o.dtype), None,
            jax.random.PRNGKey(0), noise=noise,
        )
    np.testing.assert_allclose(
        np.asarray(res.trajectory.rewards), ref_rewards, rtol=0, atol=1e-12
    )


def test_joint_stateful_combination_bitwise(ref):
    """Several stateful processes at once (OU-jump midprice + Hawkes
    arrivals + exogenous-MM fills) — exercises the multi-column state-layout
    bookkeeping (TradingEnvironment.py:303-318) jointly, not axis-at-a-time."""
    import jax
    import jax.numpy as jnp
    from jax import enable_x64

    from mbt_gym_tpu.dynamics import LimitOrderDynamics
    from mbt_gym_tpu.env import EnvConfig
    from mbt_gym_tpu.ops.compat import reference_noise_cube
    from mbt_gym_tpu.processes import (
        ConstantMidprice,
        ExogenousMmFill,
        HawkesArrivals,
        OuJumpMidprice,
    )
    from mbt_gym_tpu.rollout import rollout

    am, fm, mm, md, te, gt = ref["am"], ref["fm"], ref["mm"], ref["md"], ref["te"], ref["gt"]
    ref_dyn = md.LimitOrderModelDynamics(
        midprice_model=mm.OuJumpMidpriceModel(
            mean_reversion_level=100.0, mean_reversion_speed=0.3, volatility=1.5,
            jump_size=0.4, initial_price=100.0, step_size=DT, terminal_time=1.0,
            num_trajectories=N,
        ),
        arrival_model=am.HawkesArrivalModel(
            baseline_arrival_rate=np.array([[20.0, 20.0]]), step_size=DT,
            jump_size=40.0, mean_reversion_speed=60.0, terminal_time=1.0,
            num_trajectories=N,
        ),
        fill_probability_model=fm.ExogenousMmFillProbabilityModel(
            exogenous_best_depth_processes=(
                mm.ConstantMidpriceModel(initial_price=0.8, step_size=DT, num_trajectories=N),
                mm.ConstantMidpriceModel(initial_price=0.8, step_size=DT, num_trajectories=N),
            ),
            fill_exponent=2.0, base_fill_probability=0.9, step_size=DT, num_trajectories=N,
        ),
        num_trajectories=N, max_depth=5.0,
    )
    env = te.TradingEnvironment(
        terminal_time=1.0, n_steps=T, seed=SEED, initial_inventory=0,
        model_dynamics=ref_dyn, max_inventory=T,
        normalise_action_space=False, normalise_observation_space=False,
        num_trajectories=N,
    )

    class FixedAgent:
        def get_action(self, obs):
            return np.full((N, 2), 0.45)

    ref_obs, _, ref_rewards = ref["gt"].generate_trajectory(env, FixedAgent())
    # state layout: cash, inv, time, [price], [hawkes x2], [exo x2] => S=8
    assert ref_obs.shape[1] == 8

    with enable_x64():
        cfg = EnvConfig(
            dynamics=LimitOrderDynamics(
                midprice_model=OuJumpMidprice(
                    mean_reversion_level=100.0, mean_reversion_speed=0.3,
                    volatility=1.5, jump_size=0.4, initial_price=100.0,
                ),
                arrival_model=HawkesArrivals(
                    baseline_arrival_rate=(20.0, 20.0), jump_size=40.0, mean_reversion_speed=60.0
                ),
                fill_probability_model=ExogenousMmFill(
                    bid_process=ConstantMidprice(initial_price=0.8),
                    ask_process=ConstantMidprice(initial_price=0.8),
                    fill_exponent=2.0, base_fill_probability=0.9,
                ),
                max_depth=5.0,
            ),
            terminal_time=1.0, n_steps=T, max_inventory=float(T),
            num_trajectories=N, dtype="float64",
        )
        noise = reference_noise_cube(cfg, SEED, dtype="float64")
        res = rollout(
            cfg, lambda p, o, s: jnp.full((N, 2), 0.45, dtype=o.dtype), None,
            jax.random.PRNGKey(0), noise=noise,
        )

    ours = np.asarray(res.trajectory.observations)
    assert ours.shape[2] == 8
    # every state column bitwise-level: cash, inventory, price, hawkes
    # intensities, exogenous depths
    np.testing.assert_array_equal(ours[:, :, 1].T, ref_obs[:, 1, :])
    for col in (0, 3, 4, 5, 6, 7):
        np.testing.assert_allclose(
            ours[:, :, col].T, ref_obs[:, col, :], rtol=0, atol=1e-9, err_msg=f"col {col}"
        )
    np.testing.assert_allclose(
        np.asarray(res.trajectory.rewards).T, ref_rewards[:, 0, :], rtol=0, atol=1e-8
    )


def test_exomm_noisy_inner_processes_bitwise(ref):
    """ExogenousMm fills with NOISY (BM bid / GBM ask) inner best-depth
    processes, bitwise vs the actual reference.

    Found by this test (round 3): the reference's ``update`` advances the
    inner processes but NEVER refreshes the parent's ``current_state`` —
    which is what ``_get_fill_probabilities`` reads and what the env copies
    into the observation (fill_probability_models.py:159-170 vs
    StochasticProcessModel.py:27).  The exogenous best depths are therefore
    FROZEN at their initial values in the reference, regardless of how
    noisy the inner processes are; their Generators draw dead values.
    ``ExogenousMmFill(strict_reference_bug=True)`` reproduces that literal
    behavior; the default implements the evident intent (evolving depths,
    parity-tested against the fused kernel on injected noise)."""
    import jax
    import jax.numpy as jnp
    from jax import enable_x64

    from mbt_gym_tpu.dynamics import LimitOrderDynamics
    from mbt_gym_tpu.env import EnvConfig
    from mbt_gym_tpu.ops.compat import reference_noise_cube
    from mbt_gym_tpu.processes import (
        BrownianMotionMidprice,
        ExogenousMmFill,
        GeometricBrownianMotionMidprice,
        PoissonArrivals,
    )
    from mbt_gym_tpu.rollout import rollout

    am, fm, mm, md, te = ref["am"], ref["fm"], ref["mm"], ref["md"], ref["te"]
    ref_dyn = md.LimitOrderModelDynamics(
        midprice_model=mm.BrownianMotionMidpriceModel(
            drift=0.2, volatility=2.0, initial_price=100.0,
            step_size=DT, terminal_time=1.0, num_trajectories=N,
        ),
        arrival_model=am.PoissonArrivalModel(
            intensity=np.array([120.0, 90.0]), step_size=DT, num_trajectories=N
        ),
        fill_probability_model=fm.ExogenousMmFillProbabilityModel(
            exogenous_best_depth_processes=(
                mm.BrownianMotionMidpriceModel(
                    drift=0.05, volatility=0.1, initial_price=0.8,
                    step_size=DT, terminal_time=1.0, num_trajectories=N, seed=1234,
                ),
                mm.GeometricBrownianMotionMidpriceModel(
                    drift=-0.1, volatility=0.2, initial_price=0.8,
                    step_size=DT, terminal_time=1.0, num_trajectories=N, seed=5678,
                ),
            ),
            fill_exponent=2.0, base_fill_probability=0.9,
            step_size=DT, num_trajectories=N,
        ),
        num_trajectories=N, max_depth=5.0,
    )
    env = te.TradingEnvironment(
        terminal_time=1.0, n_steps=T, seed=SEED, initial_inventory=0,
        model_dynamics=ref_dyn, max_inventory=T,
        normalise_action_space=False, normalise_observation_space=False,
        num_trajectories=N,
    )

    class FixedAgent:
        def get_action(self, obs):
            return np.full((N, 2), 0.45)

    ref_obs, _, ref_rewards = ref["gt"].generate_trajectory(env, FixedAgent())
    assert ref_obs.shape[1] == 6  # cash, inv, time, price, exo bid, exo ask
    # the reference bug in action: noisy inner processes, frozen depths
    assert (ref_obs[:, 4, :] == 0.8).all() and (ref_obs[:, 5, :] == 0.8).all()

    with enable_x64():
        cfg = EnvConfig(
            dynamics=LimitOrderDynamics(
                midprice_model=BrownianMotionMidprice(
                    drift=0.2, volatility=2.0, initial_price=100.0
                ),
                arrival_model=PoissonArrivals(intensity=(120.0, 90.0)),
                fill_probability_model=ExogenousMmFill(
                    bid_process=BrownianMotionMidprice(
                        drift=0.05, volatility=0.1, initial_price=0.8
                    ),
                    ask_process=GeometricBrownianMotionMidprice(
                        drift=-0.1, volatility=0.2, initial_price=0.8
                    ),
                    fill_exponent=2.0, base_fill_probability=0.9,
                    strict_reference_bug=True,
                ),
                max_depth=5.0,
            ),
            terminal_time=1.0, n_steps=T, max_inventory=float(T),
            num_trajectories=N, dtype="float64",
        )
        # strict mode drops the dead inner channels from noise_spec, so the
        # standard per-slot cube replays the reference exactly
        noise = reference_noise_cube(cfg, SEED, dtype="float64")
        res = rollout(
            cfg, lambda p, o, s: jnp.full((N, 2), 0.45, dtype=o.dtype), None,
            jax.random.PRNGKey(0), noise=noise,
        )

    ours = np.asarray(res.trajectory.observations)
    assert ours.shape[2] == 6
    np.testing.assert_array_equal(ours[:, :, 1].T, ref_obs[:, 1, :])
    for col in (0, 3, 4, 5):
        np.testing.assert_allclose(
            ours[:, :, col].T, ref_obs[:, col, :], rtol=0, atol=1e-9, err_msg=f"col {col}"
        )
    np.testing.assert_allclose(
        np.asarray(res.trajectory.rewards).T, ref_rewards[:, 0, :], rtol=0, atol=1e-8
    )


def _n1_env(ref, ref_mid, our_mid, global_seed=None, manual_loop=False):
    """Run the reference at N=1 (the short-term-alpha models crash for
    N>1; CEV/Heston draw from the legacy GLOBAL np.random) and return
    (ref_obs, ref_rewards, our EnvConfig)."""
    import jax.numpy as jnp  # noqa: F401

    from mbt_gym_tpu.dynamics import LimitOrderDynamics
    from mbt_gym_tpu.env import EnvConfig
    from mbt_gym_tpu.processes import ExponentialFill, PoissonArrivals

    am, fm, md, te, gt = ref["am"], ref["fm"], ref["md"], ref["te"], ref["gt"]
    dyn = md.LimitOrderModelDynamics(
        midprice_model=ref_mid,
        arrival_model=am.PoissonArrivalModel(
            intensity=np.array([120.0, 90.0]), step_size=DT, num_trajectories=1
        ),
        fill_probability_model=fm.ExponentialFillFunction(
            fill_exponent=1.5, step_size=DT, num_trajectories=1
        ),
        num_trajectories=1, max_depth=5.0,
    )
    env = te.TradingEnvironment(
        terminal_time=1.0, n_steps=T, seed=SEED, initial_inventory=0,
        model_dynamics=dyn, max_inventory=T,
        normalise_action_space=False, normalise_observation_space=False,
        num_trajectories=1,
    )

    class FixedAgent:
        def get_action(self, obs):
            return np.full((1, 2), 0.45)

    if global_seed is not None:
        np.random.seed(global_seed)  # CEV/Heston consume the global stream
    if manual_loop:
        # the reference Heston's (1,1) min/max arrays mis-size its
        # observation space (midprice_models.py:345-346 — S-1 dims for an
        # S-dim state), which crashes generate_trajectory's preallocation;
        # drive reset/step directly instead.
        obs_list, reward_list = [env.reset()], []
        agent = FixedAgent()
        done = False
        while not done:
            obs, reward, dones, _ = env.step(agent.get_action(obs_list[-1]))
            obs_list.append(obs)
            reward_list.append(reward)
            done = bool(np.asarray(dones).min())
        ref_obs = np.stack(obs_list, axis=2)  # (N, S, T+1)
        ref_rewards = np.stack(reward_list, axis=-1).reshape(1, 1, -1)  # (N=1, 1, T)
    else:
        ref_obs, _, ref_rewards = gt.generate_trajectory(env, FixedAgent())

    cfg = EnvConfig(
        dynamics=LimitOrderDynamics(
            midprice_model=our_mid,
            arrival_model=PoissonArrivals(intensity=(120.0, 90.0)),
            fill_probability_model=ExponentialFill(fill_exponent=1.5),
            max_depth=5.0,
        ),
        terminal_time=1.0, n_steps=T, max_inventory=float(T),
        num_trajectories=1, dtype="float64",
    )
    return ref_obs, ref_rewards, cfg


def _compare_n1(res, ref_obs, ref_rewards, n_cols, atol=1e-9):
    ours = np.asarray(res.trajectory.observations)
    assert ours.shape[2] == n_cols
    np.testing.assert_array_equal(ours[:, :, 1].T, ref_obs[:, 1, :])
    for col in [0] + list(range(3, n_cols)):
        np.testing.assert_allclose(
            ours[:, :, col].T, ref_obs[:, col, :], rtol=0, atol=atol, err_msg=f"col {col}"
        )
    np.testing.assert_allclose(
        np.asarray(res.trajectory.rewards).T, ref_rewards[:, 0, :], rtol=0, atol=1e-7
    )


def _slot_noise_cube(extra_mid_normals=None):
    """Standard per-slot streams (seed+i+1) for N=1, with optional extra
    midprice normal columns appended after the slot-stream column."""
    from mbt_gym_tpu.types import SlotNoise

    mid = np.random.default_rng(SEED + 1).normal(size=(T, 1, 1))
    if extra_mid_normals is not None:
        mid = np.concatenate([mid] + extra_mid_normals, axis=2)
    return (
        SlotNoise(normal=mid, uniform=None),
        SlotNoise(normal=None, uniform=np.random.default_rng(SEED + 2).uniform(size=(T, 1, 2))),
        SlotNoise(normal=None, uniform=np.random.default_rng(SEED + 3).uniform(size=(T, 1, 2))),
    )


def _bypass_st_alpha(ref, cls_name, inner, volatility=2.0, initial_price=100.0):
    """Construct the reference's short-term-alpha models around their
    constructor bug: ``min_value=np.array([[scalar, (1,1)-array]])`` is a
    ragged array and raises under numpy >= 1.24, so the reference classes
    cannot be instantiated at all in this environment
    (midprice_models.py:163-176, 290-303).  The bypass feeds the evidently
    intended (1, 2) bounds and runs the reference's GENUINE update math."""
    from mbt_gym.stochastic_processes.StochasticProcessModel import (
        StochasticProcessModel,
    )

    mm = ref["mm"]
    obj = object.__new__(getattr(mm, cls_name))
    obj.volatility = volatility
    if cls_name == "ShortTermOuAlphaMidpriceModel":
        obj.ou_process = inner
    else:
        obj.ou_jump_process = inner
    obj.terminal_time = 1.0
    StochasticProcessModel.__init__(
        obj,
        min_value=np.array([[initial_price - 8.0, float(inner.min_value[0, 0])]]),
        max_value=np.array([[initial_price + 8.0, float(inner.max_value[0, 0])]]),
        step_size=DT, terminal_time=1.0,
        initial_state=np.array([[initial_price, float(inner.initial_state[0][0])]]),
        num_trajectories=1, seed=None,
    )
    return obj


def test_short_term_ou_alpha_bitwise_n1(ref):
    """ShortTermOuAlpha at N=1 (the reference's (N,1)x(N,) broadcasts crash
    for N>1, and its constructor is unrunnable under numpy >= 1.24 — see
    _bypass_st_alpha): price stream from the env slot rng, inner OU from
    its own explicitly-seeded Generator — bitwise."""
    import jax
    import jax.numpy as jnp
    from jax import enable_x64

    from mbt_gym_tpu.processes import OuMidprice, ShortTermOuAlphaMidprice
    from mbt_gym_tpu.rollout import rollout

    mm = ref["mm"]
    SB = 4242
    inner = mm.OuMidpriceModel(
        initial_price=0.5, mean_reversion_level=0.0, mean_reversion_speed=2.0,
        volatility=1.0, step_size=DT, terminal_time=1.0, num_trajectories=1,
        seed=SB,
    )
    ref_mid = _bypass_st_alpha(ref, "ShortTermOuAlphaMidpriceModel", inner)
    our_mid = ShortTermOuAlphaMidprice(
        volatility=2.0,
        ou=OuMidprice(
            initial_price=0.5, mean_reversion_level=0.0, mean_reversion_speed=2.0,
            volatility=1.0,
        ),
        initial_price=100.0,
    )
    ref_obs, ref_rewards, cfg = _n1_env(ref, ref_mid, our_mid)
    inner_draws = np.random.default_rng(SB).normal(size=(T, 1, 1))
    with enable_x64():
        noise = _slot_noise_cube([inner_draws])
        res = rollout(
            cfg, lambda p, o, s: jnp.full((1, 2), 0.45, dtype=o.dtype), None,
            jax.random.PRNGKey(0), noise=noise,
        )
    _compare_n1(res, ref_obs, ref_rewards, 5)


def test_short_term_jump_alpha_bitwise_n1(ref):
    """ShortTermJumpAlpha at N=1 (same constructor bypass): inner
    OU-with-jumps seeded explicitly; jumps react to the episode's actual
    fills — bitwise."""
    import jax
    import jax.numpy as jnp
    from jax import enable_x64

    from mbt_gym_tpu.processes import OuJumpMidprice, ShortTermJumpAlphaMidprice
    from mbt_gym_tpu.rollout import rollout

    mm = ref["mm"]
    SB = 777
    inner = mm.OuJumpMidpriceModel(
        initial_price=0.5, mean_reversion_level=0.0, mean_reversion_speed=2.0,
        volatility=1.0, jump_size=0.3, step_size=DT, terminal_time=1.0,
        num_trajectories=1, seed=SB,
    )
    ref_mid = _bypass_st_alpha(ref, "ShortTermJumpAlphaMidpriceModel", inner)
    our_mid = ShortTermJumpAlphaMidprice(
        volatility=2.0,
        ou_jump=OuJumpMidprice(
            initial_price=0.5, mean_reversion_level=0.0, mean_reversion_speed=2.0,
            volatility=1.0, jump_size=0.3,
        ),
        initial_price=100.0,
    )
    ref_obs, ref_rewards, cfg = _n1_env(ref, ref_mid, our_mid)
    inner_draws = np.random.default_rng(SB).normal(size=(T, 1, 1))
    with enable_x64():
        noise = _slot_noise_cube([inner_draws])
        res = rollout(
            cfg, lambda p, o, s: jnp.full((1, 2), 0.45, dtype=o.dtype), None,
            jax.random.PRNGKey(0), noise=noise,
        )
    _compare_n1(res, ref_obs, ref_rewards, 5)


def test_cev_global_rng_n1(ref):
    """CEV at N=1 (its (N,1)x(N,) broadcast silently corrupts N>1): the
    reference draws from the legacy GLOBAL np.random — harvested by
    re-seeding and replaying the exact call sequence.  Equal to 1e-9
    (term association differs: ours (S)*(drift*dt) vs the reference's
    ((S*drift)*dt))."""
    import jax
    import jax.numpy as jnp
    from jax import enable_x64

    from mbt_gym_tpu.processes import CevMidprice
    from mbt_gym_tpu.rollout import rollout

    mm = ref["mm"]
    GS = 20240817
    ref_mid = mm.ConstantElasticityOfVarianceMidpriceModel(
        drift=0.1, volatility=0.2, gamma=0.7, initial_price=100.0,
        step_size=DT, terminal_time=1.0, num_trajectories=1,
    )
    our_mid = CevMidprice(drift=0.1, volatility=0.2, gamma=0.7, initial_price=100.0)
    ref_obs, ref_rewards, cfg = _n1_env(ref, ref_mid, our_mid, global_seed=GS)
    # replay the global stream: one normal(size=1) per step, T calls
    np.random.seed(GS)
    cev_draws = np.stack([np.random.normal(size=1) for _ in range(T)])[:, :, None]
    with enable_x64():
        mid = cev_draws  # CEV consumes only its own column
        from mbt_gym_tpu.types import SlotNoise

        noise = (
            SlotNoise(normal=mid, uniform=None),
            SlotNoise(normal=None, uniform=np.random.default_rng(SEED + 2).uniform(size=(T, 1, 2))),
            SlotNoise(normal=None, uniform=np.random.default_rng(SEED + 3).uniform(size=(T, 1, 2))),
        )
        res = rollout(
            cfg, lambda p, o, s: jnp.full((1, 2), 0.45, dtype=o.dtype), None,
            jax.random.PRNGKey(0), noise=noise,
        )
    _compare_n1(res, ref_obs, ref_rewards, 4)


def test_heston_global_rng_n1(ref):
    """Heston at N=1: the reference's correlated Wieners come from the
    GLOBAL np.random.multivariate_normal (SVD factorization); harvested
    and inverted through our Cholesky construction (w1 -> z1 =
    (w1 - rho*w0)/sqrt(1-rho^2)), agreeing to float64 roundoff."""
    import jax
    import jax.numpy as jnp
    from jax import enable_x64

    from mbt_gym_tpu.processes import HestonMidprice
    from mbt_gym_tpu.rollout import rollout
    from mbt_gym_tpu.types import SlotNoise

    mm = ref["mm"]
    GS = 31337
    rho = -0.7
    kwargs = dict(
        drift=0.05, volatility_mean_reversion_rate=3.0,
        volatility_mean_reversion_level=0.04, weiner_correlation=rho,
        volatility_of_volatility=0.6, initial_price=100.0, initial_variance=0.04,
    )
    ref_mid = mm.HestonMidpriceModel(
        **kwargs, step_size=DT, terminal_time=1.0, num_trajectories=1
    )
    our_mid = HestonMidprice(**kwargs)
    ref_obs, ref_rewards, cfg = _n1_env(
        ref, ref_mid, our_mid, global_seed=GS, manual_loop=True
    )
    # replay the global stream: one multivariate_normal per step
    np.random.seed(GS)
    means, corr = np.array([0, 0]), np.array([[1, rho], [rho, 1]])
    ws = np.stack(
        [np.random.multivariate_normal(means, cov=corr, size=1) for _ in range(T)]
    )  # (T, 1, 2)
    z1 = (ws[:, :, 1] - rho * ws[:, :, 0]) / np.sqrt(1.0 - rho**2)
    mid = np.stack([ws[:, :, 0], z1], axis=2)  # our iid columns
    with enable_x64():
        noise = (
            SlotNoise(normal=mid, uniform=None),
            SlotNoise(normal=None, uniform=np.random.default_rng(SEED + 2).uniform(size=(T, 1, 2))),
            SlotNoise(normal=None, uniform=np.random.default_rng(SEED + 3).uniform(size=(T, 1, 2))),
        )
        res = rollout(
            cfg, lambda p, o, s: jnp.full((1, 2), 0.45, dtype=o.dtype), None,
            jax.random.PRNGKey(0), noise=noise,
        )
    _compare_n1(res, ref_obs, ref_rewards, 5, atol=1e-8)
