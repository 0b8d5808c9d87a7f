"""Fused MLP-policy rollout kernel: the whole PPO data-collection episode
(policy forward + Gaussian sampling + env step) in one Pallas program,
with the per-step 256-wide activations resident in VMEM.

Why: in the XLA rollout (agents.ppo.collect_rollout) every step's hidden
activations (batch x 256) stream through HBM — ~131 ms of the 175 ms
config-5 rollout at 262k envs.  Here a tile of envs lives on the LANE
dimension and activations are computed transposed (``h = tanh(W^T @ X)``
with ``X (features, lanes)``), so the matmul chain never leaves VMEM and
only the fundamental per-step outputs (obs, action, log-prob, value,
reward ≈ 36 B/env-step) are written out.

Scope: four model families, with EITHER actor-critic layout — the
shared-trunk production layout of ``networks.init_actor_critic(
shared_trunk=True)`` or the reference's separate pi/vf towers
(experiments/helpers.py:71), which run as a stacked trunk (round 4; see
:func:`transpose_params`):

- "limit": the flagship market-making family (BM midprice + Poisson
  arrivals + exponential fill + limit-order dynamics) with PnL, CjMm, or
  RunningInventoryPenalty rewards — the bench_suite config-5 production
  path and the "learning to make a market" CJ training setting;
- "speed": the optimal-execution family (BM midprice + trading-speed
  dynamics + temporary-and-permanent impact, ModelDynamics.py:243-275)
  with PnL or CjOe rewards — the Test_2 / bench_suite config-3 setting;
- "touch": post-or-not at a fixed half-spread (AtTheTouchModelDynamics,
  ModelDynamics.py:134-176) with Poisson arrivals and the same reward
  kinds as "limit" — fills ARE the clipped action columns;
- "lam": limit orders PLUS unit market orders
  (LimitAndMarketOrderModelDynamics, ModelDynamics.py:179-240) — 4 action
  columns (bid/ask depth, MO-buy, MO-sell; a market order fires when its
  column exceeds 0.5, trading at mid +/- the fixed half-spread), same
  reward kinds as "limit".

Orthogonal to the dynamics kind, the families compose with:

- ALL TEN reference midprice models (constant, BM, GBM, OU incl. the
  reference's missing-dt quirk, CEV, the BM/OU fill-driven jump
  variants, the short-term OU / OU-with-jumps alpha models, and Heston
  stochastic volatility — the 2-dim kinds carry their second state
  column and consume one extra noise channel);
- three arrival kinds (linear Poisson, exact-probability Poisson, and
  self-exciting Hawkes with the 2-dim intensity state observed);
- four fill kinds (exponential, triangular, power, and the exogenous
  competing-market-maker model with two OU best-depth processes in
  state);
- four price-impact models for the speed dynamics (temporary+permanent,
  stateless power, transient, temporary+transient);
- all five reward kinds and random initial inventory.

The composite stress configuration (utils.config.composite_env_config:
Hawkes + exogenous-MM + lam) therefore runs on the fused pipeline too.
Random start times (``start_time=("uniform", lo, hi)``) run fused too
(round 4): a per-env t0 input plane with post-done lane freezing, parity-
tested vs the XLA engine's masking.  The remaining XLA-only
configurations: the strict_reference_bug fill variants, callable reset
specs (host-evaluated per reset by design), and float64 reference-parity
runs.

Besides the MLP actor-critic, the kernel family also runs the closed-form
Cartea-Jaimungal MM agent (round 4, :func:`table_rollout_pallas`): the
precomputed (time, inventory) depth table (BaselineAgents.py:86-170 via
``agents.baseline.CarteaJaimungalMmAgent.depth_table``) is VMEM-resident
and looked up per step with a one-hot MXU contraction — the fused
counterpart of the engine's one-hot-matmul policy path, covering the CJP
replication config (the slowest closed-form lane on the XLA engine) with
streams or stats-only outputs.

Other configs use the XLA rollout.  A noise-injectable mode runs under the Pallas interpreter on
CPU, and tests/test_pallas_rollout.py asserts parity against the XLA
engine + networks on the SAME noise.
"""
from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mbt_gym_tpu.env import EnvConfig
from mbt_gym_tpu.ops.pallas_episode import _uniform_from_bits

LANES = 128
_LOG_2PI = math.log(2.0 * math.pi)
GROUP = 8  # f32 sublane granularity: packed channel groups align to it

# Injected-noise channel order (noise mode): 4 env uniforms (u_arr_bid,
# u_arr_ask, u_fill_bid, u_fill_ask), then max(a_dim, 2) policy-sample
# normals, then the midprice normal.  7 for every a_dim<=2 family; 9 for
# the 4-action "lam" family.
N_CHANNELS = 7


def n_noise_channels(
    a_dim: int, exomm: bool = False, mid2: bool = False, table: bool = False
) -> int:
    """Injected-noise channel count: 4 env uniforms + max(a_dim, 2)
    policy-sample normals + 1 midprice normal (+ 2 exogenous best-depth
    OU normals for the exogenous-MM fill kind, + 1 second-midprice-state
    normal for the 2-dim midprice kinds: Heston variance / short-term
    alpha).  The deterministic policy kinds ("table"/"fixed") draw no
    policy-sample normals, so their channel layout drops the eps rows —
    pass ``table=True`` for either."""
    n_eps = 0 if table else max(a_dim, 2)
    return 4 + n_eps + 1 + (2 if exomm else 0) + (1 if mid2 else 0)


class MlpRolloutParams(NamedTuple):
    """Static scalars for the fused policy rollout (AS env contract,
    TradingEnvironment.py:103-110 order; normalisation per :112-126)."""

    n_steps: int
    dt: float
    drift: float
    volatility: float
    initial_price: float
    intensity_bid: float
    intensity_ask: float
    fill_exponent: float
    max_inventory: float
    max_cash: float
    initial_cash: float
    initial_inventory: float
    start_time: float
    obs_low: tuple  # (S,) cash, inventory, time, price[, impact state]
    obs_grad: tuple  # (high - low) / 2 per channel
    act_low: tuple  # (A,) bid/ask depth (limit) or speed (speed) lower bounds
    act_grad: tuple
    normalise_obs: bool
    normalise_act: bool
    # reward: "pnl" (RewardFunctions.py:20-36), "cjmm" (pathwise CJ MM
    # criterion, :77-113), "running" (RunningInventoryPenalty, :116-141),
    # "cjoe" (CJ optimal-execution criterion, :39-74) — any
    # inventory_exponent — or "exp_utility" (terminal-only exponential
    # utility, :149-166, with `risk_aversion` below).
    reward_kind: str = "pnl"
    phi: float = 0.0  # per-step inventory aversion
    alpha: float = 0.0  # terminal inventory aversion
    # inventory penalty exponent (reference formulas use inventory**exp
    # verbatim, so non-integer exponents NaN on negative inventory exactly
    # as the reference/XLA engine do)
    inventory_exponent: float = 2.0
    terminal_time: float = 1.0
    # dynamics: "limit" (ModelDynamics.py:87-131), "speed" (:243-275,
    # trading-speed execution against temporary + permanent impact; the
    # intensity/fill fields above are unused there), "touch" (:134-176,
    # post-or-not at fixed_half_spread; fill_exponent unused) or "lam"
    # (:179-240, limit orders + unit market orders at mid +/-
    # fixed_half_spread).
    dynamics_kind: str = "limit"
    # Price impact (speed dynamics): "temp_perm"
    # (price_impact_models.py:64-96), "power" (stateless c*speed^exponent,
    # :34-61), "transient" (:142-179, impact = kappa*state with the
    # exponential-resilience recursion) or "temp_transient" (:99-138).
    impact_kind: str = "temp_perm"
    impact_exponent: float = 1.0  # "power"
    impact_kappa: float = 0.0  # transient kinds
    impact_rho: float = 0.0
    impact_gamma: float = 0.0
    impact_initial: float = 0.0
    temporary_impact: float = 0.0
    permanent_impact: float = 0.0
    fixed_half_spread: float = 0.0
    risk_aversion: float = 0.0  # "exp_utility" reward only
    # Midprice SDE: "constant", "bm" (arithmetic BM, the default), "gbm"
    # (midprice_models.py:71-111), "ou" (:114-146, with the reference's
    # missing-dt drift quirk when mid_dt_scaled=False), "cev" (:375-412,
    # elasticity in mid_level), "bmjump" (:193-230, ABM + mid_jump *
    # (ask_fill - bid_fill) permanent jumps on the agent's own limit
    # fills) or "oujump" (:233-273).
    midprice_kind: str = "bm"
    mid_level: float = 0.0  # OU mean-reversion level / CEV elasticity gamma
    mid_speed: float = 0.0  # OU mean-reversion speed
    mid_dt_scaled: bool = False
    mid_jump: float = 0.0
    # Second midprice-state column for the 2-dim kinds: "heston" (variance
    # with mean-reversion rate/level in mid2_speed/mid2_level, vol-of-vol
    # in mid2_vol, Wiener correlation in mid2_corr) and
    # "st_ou_alpha"/"st_jump_alpha" (short-term alpha following an inner
    # OU[-with-jumps] process; alpha jumps reuse mid_jump).
    mid2_initial: float = 0.0
    mid2_level: float = 0.0
    mid2_speed: float = 0.0
    mid2_vol: float = 0.0
    mid2_dt_scaled: bool = False
    mid2_corr: float = 0.0
    # Arrival process: "poisson" (stateless thinning at intensity_bid/ask),
    # "poisson_nl" (exact probability 1 - exp(-intensity*dt),
    # arrival_models.py:59-83) or "hawkes" (arrival_models.py:86-129 — 2-dim intensity state
    # thinned at the CURRENT intensity, then mean-reverted to the
    # intensity_* baseline with self-excitation jump_size per arrival).
    arrival_kind: str = "poisson"
    hawkes_jump: float = 0.0
    hawkes_mean_reversion: float = 0.0
    # Fill model (limit/lam dynamics): "exp" (exponential decay in depth)
    # or "exomm" (fill_probability_models.py:126-170 — two exogenous
    # best-depth OU processes carried in state; quoting at/inside the
    # exogenous best fills with probability 1, outside decays as
    # base_fill * exp(-fill_exponent * (depth - best))).
    # "triangular" (max(1 - max(d,0)/fill_param, 0),
    # fill_probability_models.py:68-91 elementwise intent) and "power"
    # (1/(1 + (fill_param*max(d,0))^fill_exponent), :94-123) are also
    # supported; the strict_reference_bug variants stay on the XLA path.
    fill_kind: str = "exp"
    fill_param: float = 0.0  # triangular max depth / power multiplier
    # Exogenous best-depth processes (fill_kind "exomm"): the reference
    # allows ANY two stochastic processes
    # (fill_probability_models.py:126-170); the fused kernel covers the
    # single-state single-noise kinds per side — "ou", "bm" (arithmetic BM:
    # exo_level reused as the drift), "gbm" (Euler GBM: exo_level as the
    # drift) — each sharing the same one noise channel per side.
    # Multi-state inner processes stay on the XLA path.
    exo_kind: tuple = ()  # (bid, ask) in {"ou", "bm", "gbm"}
    exo_level: tuple = ()  # OU mean-reversion level / BM-GBM drift
    exo_speed: tuple = ()  # OU mean-reversion speed (0.0 for bm/gbm)
    exo_vol: tuple = ()
    exo_initial: tuple = ()
    exo_dt_scaled: tuple = ()  # per-side OU drift-dt quirk flag
    exo_base_fill: float = 1.0
    # Random initial inventory: () = deterministic `initial_inventory`;
    # (lo, hi) = per-env integer draw in [lo, hi) per episode, matching the
    # XLA engine's reset (TradingEnvironment.py:270-273 semantics).  The
    # reference's canonical PPO training env (experiments/helpers.py:21-60
    # get_cj_env) uses (-5, 6) with lam dynamics.
    inventory_range: tuple = ()
    # Random start times (start_time=("uniform", lo, hi),
    # TradingEnvironment.py:257-268): the kernel scans the FULL horizon
    # with a per-env t0 input plane (the inv0 pattern, round 4) and
    # freezes post-done lanes — state, obs (time clamped at terminal) and
    # rewards exactly mirror the XLA engine's random-start masking
    # (rollout.py).  start_time stays 0.0 here so run_steps is n_steps.
    random_start: bool = False
    # Repo addition (EnvConfig.mask_market_orders_at_max_inventory): block
    # the lam family's unit market orders at +/- max_inventory with the
    # same at-boundary convention as the limit-fill mask — closes the
    # reference money-pump exploit (tests/test_env_features.py).  Default
    # False preserves reference mechanics.
    mask_mo_at_max_inventory: bool = False
    # Policy: "mlp" (the actor-critic forward above), "table" (round 4:
    # a closed-form depth table indexed by (time step, inventory) — the
    # CarteaJaimungalMmAgent policy, BaselineAgents.py:86-170 — looked up
    # per step via a one-hot MXU contraction; limit dynamics only, no
    # action-box clipping, exactly like the XLA engine's closed-form
    # policy path in agents/baseline.py) or "fixed" (round 5: a constant
    # per-column action — the FixedActionAgent, BaselineAgents.py:25-31 —
    # on ANY dynamics family; the degenerate deterministic case that gives
    # composite closed-form/fixed evaluations a Pallas lane).
    policy_kind: str = "mlp"
    # "fixed" policy: the constant action, one float per action column (in
    # normalised units when normalise_act, exactly what the policy returns
    # on the engine path).
    fixed_action: tuple = ()
    # "table" policy: true (unpadded) inventory-grid size 2*q_max + 1.
    table_size: int = 0
    # "table" policy lookup operand dtype.  "float32" (default) keeps the
    # fused lookup bit-comparable to the engine's one-hot matmul.
    # "bfloat16" was MEASURED NEUTRAL on hardware (2.13B vs 2.18B steps/s
    # at the CJP config — the lookup is ~14% of step cost and the dot is
    # not the bottleneck; BENCH_NOTES round 4), so f32 exactness is free.
    table_lookup_dtype: str = "float32"

    @property
    def run_steps(self) -> int:
        if self.random_start:
            return self.n_steps
        return self.n_steps - round(self.start_time / self.dt)

    @property
    def has_mid2(self) -> bool:
        return self.midprice_kind in ("heston", "st_ou_alpha", "st_jump_alpha")


def rollout_params_from_config(cfg: EnvConfig) -> MlpRolloutParams:
    from mbt_gym_tpu.dynamics import (
        AtTheTouchDynamics, LimitAndMarketOrderDynamics, LimitOrderDynamics,
        TradingWithSpeedDynamics,
    )
    from mbt_gym_tpu.processes.arrivals import HawkesArrivals, PoissonArrivals
    from mbt_gym_tpu.processes.fills import ExogenousMmFill, ExponentialFill
    from mbt_gym_tpu.processes.impact import TemporaryAndPermanentImpact
    from mbt_gym_tpu.processes.midprice import BrownianMotionMidprice, OuMidprice
    from mbt_gym_tpu.rewards import (
        CjMmCriterion, CjOeCriterion, ExponentialUtility, PnL,
        RunningInventoryPenalty,
    )

    def _mm_reward(r, label):
        """PnL / CjMm / RunningInventoryPenalty / ExponentialUtility — the
        market-making reward kinds shared by the limit, lam and touch
        dynamics.  Returns (kind, phi, alpha, risk_aversion)."""
        if isinstance(r, PnL):
            return "pnl", 0.0, 0.0, 0.0
        if isinstance(r, CjMmCriterion):
            return (
                "cjmm", r.per_step_inventory_aversion,
                r.terminal_inventory_aversion, 0.0,
            )
        if isinstance(r, RunningInventoryPenalty):
            return (
                "running", r.per_step_inventory_aversion,
                r.terminal_inventory_aversion, 0.0,
            )
        if isinstance(r, ExponentialUtility):
            return "exp_utility", 0.0, 0.0, r.risk_aversion
        raise AssertionError(
            f"fused rollout ({label} dynamics) supports PnL / CjMmCriterion / "
            f"RunningInventoryPenalty / ExponentialUtility; got {r}"
        )

    def _arrivals(m):
        """(kind, (rate_bid, rate_ask), jump, mean_reversion)."""
        from mbt_gym_tpu.processes.arrivals import PoissonArrivalsNonLinear

        if isinstance(m, HawkesArrivals):
            return (
                "hawkes", m.baseline_arrival_rate, m.jump_size,
                m.mean_reversion_speed,
            )
        if isinstance(m, PoissonArrivalsNonLinear):
            return "poisson_nl", m.intensity, 0.0, 0.0
        assert isinstance(m, PoissonArrivals), (
            f"fused rollout arrivals: Poisson (linear or exact-probability) "
            f"or Hawkes only; got {m}"
        )
        return "poisson", m.intensity, 0.0, 0.0

    def _fills(m):
        """(kind, fill_exponent, fill_param, exo params...) for limit/lam
        fills."""
        from mbt_gym_tpu.processes.fills import PowerFill, TriangularFill

        if isinstance(m, TriangularFill):
            assert not m.strict_reference_bug, (
                "strict_reference_bug fills are an XLA-path compat feature"
            )
            return ("triangular", 0.0, m.max_fill_depth) + no_exo
        if isinstance(m, PowerFill):
            assert not m.strict_reference_bug, (
                "strict_reference_bug fills are an XLA-path compat feature"
            )
            return ("power", m.fill_exponent, m.fill_multiplier) + no_exo
        if isinstance(m, ExogenousMmFill):
            assert not m.strict_reference_bug, (
                "strict_reference_bug fills are an XLA-path compat feature"
            )
            from mbt_gym_tpu.processes.midprice import (
                BrownianMotionMidprice, GeometricBrownianMotionMidprice,
            )

            def _exo_side(q):
                """(kind, level-or-drift, speed, vol, s0, dt_scaled) for one
                exogenous best-depth process — any single-state,
                single-noise-channel kind (VERDICT r2 item 8: the reference
                allows any two processes, fill_probability_models.py:126-170;
                bm/gbm share the OU side's one noise channel)."""
                if isinstance(q, OuMidprice):
                    return (
                        "ou", q.mean_reversion_level, q.mean_reversion_speed,
                        q.volatility, q.initial_price, bool(q.dt_scaled_drift),
                    )
                if isinstance(q, BrownianMotionMidprice):
                    return "bm", q.drift, 0.0, q.volatility, q.initial_price, True
                if isinstance(q, GeometricBrownianMotionMidprice):
                    return "gbm", q.drift, 0.0, q.volatility, q.initial_price, True
                raise AssertionError(
                    "fused rollout (exomm fills): Ou/BrownianMotion/"
                    f"GeometricBrownianMotion best-depth processes only; got {q} "
                    "(multi-state inner processes run on the XLA path)"
                )

            sides = [_exo_side(q) for q in (m.bid_process, m.ask_process)]
            (bk, bl, bs, bv, b0, bd), (ak, al, as_, av, a0, ad) = sides
            return (
                "exomm", m.fill_exponent, 0.0,
                (bk, ak), (bl, al), (bs, as_), (bv, av), (b0, a0),
                (bd, ad), m.base_fill_probability,
            )
        assert isinstance(m, ExponentialFill), (
            f"fused rollout fills: Exponential / Triangular / Power / "
            f"ExogenousMm only; got {m}"
        )
        return ("exp", m.fill_exponent, 0.0) + no_exo

    no_mid2 = (0.0, 0.0, 0.0, 0.0, False, 0.0)

    def _midprice(m):
        """(kind, drift, vol, s0, level, speed, dt_scaled, jump,
        (mid2_initial, mid2_level, mid2_speed, mid2_vol, mid2_dt_scaled,
        mid2_corr))."""
        from mbt_gym_tpu.processes.midprice import (
            BrownianMotionJumpMidprice, CevMidprice, ConstantMidprice,
            GeometricBrownianMotionMidprice, HestonMidprice, OuJumpMidprice,
            ShortTermJumpAlphaMidprice, ShortTermOuAlphaMidprice,
        )

        if isinstance(m, HestonMidprice):
            return (
                "heston", m.drift, 0.0, m.initial_price, 0.0, 0.0, False, 0.0,
                (
                    m.initial_variance, m.volatility_mean_reversion_level,
                    m.volatility_mean_reversion_rate,
                    m.volatility_of_volatility, False, m.weiner_correlation,
                ),
            )
        if isinstance(m, ShortTermOuAlphaMidprice):
            ou = m.ou
            return (
                "st_ou_alpha", 0.0, m.volatility, m.initial_price,
                0.0, 0.0, False, 0.0,
                (
                    ou.initial_price, ou.mean_reversion_level,
                    ou.mean_reversion_speed, ou.volatility,
                    bool(ou.dt_scaled_drift), 0.0,
                ),
            )
        if isinstance(m, ShortTermJumpAlphaMidprice):
            ou = m.ou_jump
            return (
                "st_jump_alpha", 0.0, m.volatility, m.initial_price,
                0.0, 0.0, False, ou.jump_size,
                (
                    ou.initial_price, ou.mean_reversion_level,
                    ou.mean_reversion_speed, ou.volatility,
                    bool(ou.dt_scaled_drift), 0.0,
                ),
            )
        if isinstance(m, ConstantMidprice):
            return (
                "constant", 0.0, 0.0, m.initial_price, 0.0, 0.0, False, 0.0,
                no_mid2,
            )
        if isinstance(m, BrownianMotionJumpMidprice):
            return (
                "bmjump", m.drift, m.volatility, m.initial_price,
                0.0, 0.0, False, m.jump_size,
                no_mid2,
            )
        if isinstance(m, OuJumpMidprice):
            return (
                "oujump", 0.0, m.volatility, m.initial_price,
                m.mean_reversion_level, m.mean_reversion_speed,
                bool(m.dt_scaled_drift), m.jump_size,
                no_mid2,
            )
        if isinstance(m, OuMidprice):
            return (
                "ou", 0.0, m.volatility, m.initial_price,
                m.mean_reversion_level, m.mean_reversion_speed,
                bool(m.dt_scaled_drift), 0.0,
                no_mid2,
            )
        if isinstance(m, CevMidprice):
            # elasticity gamma travels in mid_level
            return (
                "cev", m.drift, m.volatility, m.initial_price,
                m.gamma, 0.0, False, 0.0,
                no_mid2,
            )
        if isinstance(m, GeometricBrownianMotionMidprice):
            return (
                "gbm", m.drift, m.volatility, m.initial_price,
                0.0, 0.0, False, 0.0,
                no_mid2,
            )
        assert isinstance(m, BrownianMotionMidprice), (
            f"fused rollout midprice: all ten reference models are "
            f"supported (constant/BM/GBM/OU/CEV/jump variants/short-term "
            f"alphas/Heston); got unrecognised {m}"
        )
        return (
            "bm", m.drift, m.volatility, m.initial_price, 0.0, 0.0, False,
            0.0, no_mid2,
        )

    no_exo = ((), (), (), (), (), (), 1.0)
    d = cfg.dynamics
    (
        mid_kind, mid_drift, mid_vol, mid_s0, mid_level, mid_speed,
        mid_scaled, mid_jump, mid2,
    ) = _midprice(d.midprice_model)
    r = cfg.reward_function
    half_spread = 0.0
    impact_kind, i_exp, i_kappa, i_rho, i_gamma, i_init = (
        "temp_perm", 1.0, 0.0, 0.0, 0.0, 0.0
    )
    if isinstance(d, AtTheTouchDynamics):
        arrival_kind, intensity, hjump, hmr = _arrivals(d.arrival_model)
        dynamics_kind = "touch"
        temp_imp = perm_imp = 0.0
        fill_exponent = 0.0
        fill_kind, fill_param, exo = "exp", 0.0, no_exo
        half_spread = float(d.fixed_market_half_spread)
        reward_kind, phi, alpha, gamma_u = _mm_reward(r, "touch")
    elif isinstance(d, LimitAndMarketOrderDynamics):
        arrival_kind, intensity, hjump, hmr = _arrivals(d.arrival_model)
        fill_kind, fill_exponent, fill_param, *exo = _fills(d.fill_probability_model)
        dynamics_kind = "lam"
        temp_imp = perm_imp = 0.0
        half_spread = float(d.fixed_market_half_spread)
        reward_kind, phi, alpha, gamma_u = _mm_reward(r, "lam")
    elif isinstance(d, LimitOrderDynamics) and d.action_dim == 2:
        arrival_kind, intensity, hjump, hmr = _arrivals(d.arrival_model)
        fill_kind, fill_exponent, fill_param, *exo = _fills(d.fill_probability_model)
        dynamics_kind = "limit"
        temp_imp = perm_imp = 0.0
        reward_kind, phi, alpha, gamma_u = _mm_reward(r, "limit")
    elif isinstance(d, TradingWithSpeedDynamics):
        from mbt_gym_tpu.processes.impact import (
            TemporaryAndTransientImpact, TemporaryPowerImpact, TransientImpact,
        )

        dynamics_kind = "speed"
        assert mid_kind in (
            "constant", "bm", "gbm", "ou", "cev", "heston", "st_ou_alpha",
        ), (
            "fused rollout (speed dynamics): fill-driven midprice jumps "
            "have no fills to react to (the reference crashes there too, "
            "midprice_models.py:220)"
        )
        im = d.price_impact_model
        temp_imp = perm_imp = 0.0
        if isinstance(im, TemporaryAndPermanentImpact):
            temp_imp = im.temporary_impact_coefficient
            perm_imp = im.permanent_impact_coefficient
        elif isinstance(im, TemporaryPowerImpact):
            impact_kind = "power"
            temp_imp = im.temporary_impact_coefficient
            i_exp = im.temporary_impact_exponent
        elif isinstance(im, TemporaryAndTransientImpact):
            impact_kind = "temp_transient"
            temp_imp = im.temporary_impact_coefficient
            i_kappa = im.transient_impact_coefficient
            i_rho = im.resilience_coefficient
            i_gamma = im.linear_kernel_coefficient
            i_init = im.initial_transient_impact
        elif isinstance(im, TransientImpact):
            impact_kind = "transient"
            i_kappa = im.transient_impact_coefficient
            i_rho = im.resilience_coefficient
            i_gamma = im.linear_kernel_coefficient
            i_init = im.initial_transient_impact
        else:
            raise AssertionError(
                f"fused rollout (speed dynamics): unsupported impact model {im}"
            )
        intensity = (0.0, 0.0)
        fill_exponent = 0.0
        arrival_kind, hjump, hmr = "poisson", 0.0, 0.0
        fill_kind, fill_param, exo = "exp", 0.0, no_exo
        gamma_u = 0.0
        if isinstance(r, PnL):
            reward_kind, phi, alpha = "pnl", 0.0, 0.0
        elif isinstance(r, CjOeCriterion):
            reward_kind = "cjoe"
            phi, alpha = r.per_step_inventory_aversion, r.terminal_inventory_aversion
        elif isinstance(r, ExponentialUtility):
            reward_kind, phi, alpha = "exp_utility", 0.0, 0.0
            gamma_u = r.risk_aversion
        else:
            raise AssertionError(
                f"fused rollout (speed dynamics) supports PnL / CjOeCriterion "
                f"/ ExponentialUtility; got {r}"
            )
    else:
        raise AssertionError(
            "fused rollout: limit-order, limit-and-market-order, "
            "at-the-touch or trading-speed dynamics only"
        )
    assert cfg.reward_scaling is None
    assert not callable(cfg.initial_inventory), (
        "callable initial_inventory is host-evaluated per reset; use the "
        "XLA rollout"
    )
    if isinstance(cfg.initial_inventory, tuple):
        lo, hi = cfg.initial_inventory
        inventory_range = (int(lo), int(hi))
        inv0 = 0.0  # unused: per-env draws come in via the inv0 input plane
    else:
        inventory_range = ()
        inv0 = float(cfg.initial_inventory)
    assert not callable(cfg.start_time), (
        "callable start_time is host-evaluated per reset; use the XLA "
        "rollout (gym_compat adapters resolve it each reset)"
    )
    if isinstance(cfg.start_time, tuple):
        tag = cfg.start_time[0]
        assert tag == "uniform", f"Unknown start_time spec {cfg.start_time}"
        random_start = True
        start_val = 0.0  # full horizon; per-env t0 comes in via the t0 plane
    else:
        random_start = False
        start_val = round(float(cfg.start_time) / cfg.step_size) * cfg.step_size
    assert cfg.dtype == "float32", (
        "fused rollout computes in float32/bf16; float64 reference-parity "
        "configs must use the XLA rollout"
    )
    obs_low, obs_high = cfg.observation_bounds()
    act_low, act_high = cfg.action_bounds()
    return MlpRolloutParams(
        n_steps=cfg.n_steps,
        dt=cfg.step_size,
        drift=mid_drift,
        volatility=mid_vol,
        initial_price=mid_s0,
        intensity_bid=intensity[0],
        intensity_ask=intensity[1],
        fill_exponent=fill_exponent,
        max_inventory=float(cfg.max_inventory),
        max_cash=float(cfg.resolved_max_cash()),
        initial_cash=float(cfg.initial_cash),
        initial_inventory=inv0,
        start_time=start_val,
        random_start=random_start,
        mask_mo_at_max_inventory=bool(cfg.mask_market_orders_at_max_inventory),
        obs_low=tuple(float(x) for x in obs_low),
        obs_grad=tuple(float(h - l) / 2.0 for l, h in zip(obs_low, obs_high)),
        act_low=tuple(float(x) for x in act_low),
        act_grad=tuple(float(h - l) / 2.0 for l, h in zip(act_low, act_high)),
        normalise_obs=bool(cfg.normalise_observation_space),
        normalise_act=bool(cfg.normalise_action_space),
        reward_kind=reward_kind,
        phi=phi,
        alpha=alpha,
        inventory_exponent=float(getattr(r, "inventory_exponent", 2.0)),
        terminal_time=cfg.terminal_time,
        dynamics_kind=dynamics_kind,
        impact_kind=impact_kind,
        impact_exponent=float(i_exp),
        impact_kappa=float(i_kappa),
        impact_rho=float(i_rho),
        impact_gamma=float(i_gamma),
        impact_initial=float(i_init),
        temporary_impact=temp_imp,
        permanent_impact=perm_imp,
        fixed_half_spread=half_spread,
        risk_aversion=gamma_u,
        midprice_kind=mid_kind,
        mid_level=float(mid_level),
        mid_speed=float(mid_speed),
        mid_dt_scaled=bool(mid_scaled),
        mid_jump=float(mid_jump),
        mid2_initial=float(mid2[0]),
        mid2_level=float(mid2[1]),
        mid2_speed=float(mid2[2]),
        mid2_vol=float(mid2[3]),
        mid2_dt_scaled=bool(mid2[4]),
        mid2_corr=float(mid2[5]),
        arrival_kind=arrival_kind,
        hawkes_jump=float(hjump),
        hawkes_mean_reversion=float(hmr),
        fill_kind=fill_kind,
        fill_param=float(fill_param),
        exo_kind=tuple(str(x) for x in exo[0]),
        exo_level=tuple(float(x) for x in exo[1]),
        exo_speed=tuple(float(x) for x in exo[2]),
        exo_vol=tuple(float(x) for x in exo[3]),
        exo_initial=tuple(float(x) for x in exo[4]),
        exo_dt_scaled=tuple(bool(x) for x in exo[5]),
        exo_base_fill=float(exo[6]),
        inventory_range=inventory_range,
    )


def transpose_params(params):
    """Host-side: actor-critic params -> the kernel's transposed weight
    list [(W^T, b_col), ...] + combined head (A+1 rows: pi rows then the
    vf row) + log_std column + ``split_at`` (None for the shared trunk).

    Separate pi/vf towers (the reference's SB3 convention,
    experiments/helpers.py:71) become a STACKED trunk, exactly as in
    ops/fused_ppo.py round 4: layer 0 stacks both towers on the output
    dim (shared obs input), inner layers are walked as two per-tower
    matmuls on row slices (``split_at`` holds the per-tower widths), and
    the merged (A+1, 2H) head carries true zero off-blocks so the merged
    head matmul computes pi from the pi rows and vf from the vf rows."""
    log_std = params["log_std"].reshape(-1, 1).astype(jnp.float32)
    if "shared" in params:
        trunk = [
            (layer["w"].T.astype(jnp.float32), layer["b"].reshape(-1, 1).astype(jnp.float32))
            for layer in params["shared"]
        ]
        w_head = jnp.concatenate(
            [params["pi_head"]["w"], params["vf_head"]["w"]], axis=1
        ).T.astype(jnp.float32)  # (A+1, H)
        b_head = jnp.concatenate(
            [params["pi_head"]["b"], params["vf_head"]["b"]]
        ).reshape(-1, 1).astype(jnp.float32)
        return trunk, w_head, b_head, log_std, None
    t_pi, t_vf = params["pi"][:-1], params["vf"][:-1]
    assert [l["w"].shape for l in t_pi] == [l["w"].shape for l in t_vf], (
        "separate pi/vf towers must have matching widths"
    )
    trunk = [
        (
            jnp.concatenate([p["w"].T, v["w"].T], axis=0).astype(jnp.float32),
            jnp.concatenate([p["b"], v["b"]]).reshape(-1, 1).astype(jnp.float32),
        )
        for p, v in zip(t_pi, t_vf)
    ]
    split_at = tuple(l["w"].shape[1] for l in t_pi)
    hp, hv = params["pi"][-1], params["vf"][-1]
    a_dim = hp["w"].shape[1]
    w_last = split_at[-1]
    w_head = jnp.zeros((a_dim + 1, 2 * w_last), jnp.float32)
    w_head = w_head.at[:a_dim, :w_last].set(hp["w"].T)
    w_head = w_head.at[a_dim:, w_last:].set(hv["w"].T)
    b_head = jnp.concatenate([hp["b"], hv["b"]]).reshape(-1, 1).astype(jnp.float32)
    return trunk, w_head, b_head, log_std, split_at


def _mmT(w, x, compute_dtype=jnp.bfloat16):
    """(rows, K) @ (K, L) on the MXU, bf16 in / f32 out."""
    return jax.lax.dot_general(
        w.astype(compute_dtype), x.astype(compute_dtype),
        dimension_numbers=((((1,), (0,))), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _obs_planes(p: MlpRolloutParams, carry, t_val):
    """The (S, L) observation the policy sees (normalised per env flags),
    assembled from the state carry's leading planes.

    Column order = raw_observation: cash, inventory, time, then process
    states in slot order: midprice price, arrival state (Hawkes 2-dim
    intensity), fill state (exogenous best depths), impact state.
    t_val is a traced scalar (fixed start) or a (1, L) per-env plane
    (random start, clamped at terminal by the caller).  State planes are
    (1, L) in the MLP family; the deterministic policies' sublane-packed
    stats mode carries (R, L) planes (R=8 fills the VPU's native (8, 128)
    shape) — every env-half op is elementwise, so the row count flows
    through.  Also used to emit the TERMINAL observation from the final
    carry (the streams ``final_obs`` output, round 5)."""
    it = iter(carry)
    cash, inv, price = next(it), next(it), next(it)
    time_plane = jnp.broadcast_to(t_val, inv.shape).astype(jnp.float32)
    planes = [cash, inv, time_plane, price]
    if p.has_mid2:
        planes.append(next(it))  # midprice state col 2 precedes arrival state
    if p.arrival_kind == "hawkes":
        planes += [next(it), next(it)]
    if p.fill_kind == "exomm":
        planes += [next(it), next(it)]
    if p.dynamics_kind == "speed" and p.impact_kind != "power":
        planes.append(next(it))  # stateless "power" impact has no state col
    if p.normalise_obs:
        planes = [
            (x - p.obs_low[c]) / p.obs_grad[c] - 1.0 for c, x in enumerate(planes)
        ]
    return jnp.concatenate(planes, axis=0)  # (S, L)


def _rollout_step(p: MlpRolloutParams, n_layers, a_dim, refs, carry, t_val, draws,
                  is_last=None, inv0=None, split_at=None, ep_len=None,
                  table_row=None):
    """One fused policy+env step for a (.., L) lane tile.  ``draws`` is
    ``(u_arr_bid, u_arr_ask, u_fill_bid, u_fill_ask, eps (>=a_dim, L),
    n_mid, exo_n (2, L) or None, mid2_n (1, L) or None)``; ``is_last``
    (traced bool) marks the terminal step for the "running" reward.  The
    carry is (cash, inv, price) plus, in order: the second midprice-state
    plane (Heston variance / short-term alpha, 2-dim midprice kinds), two
    Hawkes-intensity planes (arrival_kind "hawkes"), two exogenous
    best-depth planes (fill_kind "exomm"), and the impact-state plane
    (speed dynamics with a stateful impact kind).  Returns (new_carry,
    outputs).  With ``p.policy_kind == "table"`` the MLP weight ``refs``
    are unused (pass None) and ``table_row`` must carry this step's
    (2, Q_pad) [bid; ask] closed-form depth row."""
    it = iter(carry)
    cash, inv, price = next(it), next(it), next(it)
    lam_b = lam_a = exo_b = exo_a = imp = mid2 = None
    if p.has_mid2:
        mid2 = next(it)  # Heston variance / short-term alpha
    if p.arrival_kind == "hawkes":
        lam_b, lam_a = next(it), next(it)
    if p.fill_kind == "exomm":
        exo_b, exo_a = next(it), next(it)
    if p.dynamics_kind == "speed" and p.impact_kind != "power":
        imp = next(it)
    L = cash.shape[-1]
    u_ab, u_aa, u_fb, u_fa, eps_all, n_mid, exo_n, mid2_n = draws

    X = _obs_planes(p, carry, t_val)  # (S, L)

    if p.policy_kind == "table":
        # --- closed-form depth-table policy (BaselineAgents.py:86-170 via
        # agents/baseline.py CarteaJaimungalMmAgent.depth_table) ---
        # ``table_row`` is this step's (2, Q_pad) [bid; ask] depth row.
        # The per-env inventory lookup is a one-hot MXU contraction —
        # the same reasoning as the XLA policy path (baseline.py: TPU
        # gathers over (N,) indices are far slower than a one-hot matmul).
        # f32 throughout: the contraction selects single table entries, so
        # f32 keeps the fused lane bit-comparable to the engine's lookup.
        q_max = (p.table_size - 1) // 2
        idx = jnp.clip(q_max + inv, 0.0, 2.0 * q_max).astype(jnp.int32)  # (R, L)
        q_pad = table_row.shape[-1]
        ldt = jnp.dtype(p.table_lookup_dtype)
        iota_q = jax.lax.broadcasted_iota(jnp.int32, (q_pad, L), 0)
        bids, asks = [], []
        for r in range(idx.shape[0]):
            # one (Q_pad, L) one-hot + (2, Q_pad) x (Q_pad, L) MXU dot per
            # sublane row; the env planes' rows are independent env lanes
            onehot = (iota_q == idx[r : r + 1]).astype(ldt)
            quotes_r = jax.lax.dot_general(
                table_row.astype(ldt), onehot,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (2, L)
            bids.append(quotes_r[0:1])
            asks.append(quotes_r[1:2])
        bid_q = bids[0] if len(bids) == 1 else jnp.concatenate(bids, axis=0)
        ask_q = asks[0] if len(asks) == 1 else jnp.concatenate(asks, axis=0)
        # No action-box clip: the engine does not clip closed-form actions
        # (env.step clips nothing when normalise_action_space=False; the
        # large-depth boundary override exceeds max_depth by design).
        exec_action = (bid_q, ask_q)
        action = jnp.concatenate([bid_q, ask_q], axis=0)
        logp = jnp.zeros(inv.shape, jnp.float32)
        value = jnp.zeros(inv.shape, jnp.float32)
    elif p.policy_kind in ("fixed", "schedule"):
        # --- constant/per-step-scheduled action policies (round 5) ---
        # "fixed": each action column is a STATIC scalar
        # (FixedActionAgent, BaselineAgents.py:25-31); "schedule": this
        # step's row of a precomputed (T, A) action table — any
        # deterministic time-only policy, e.g. the closed-form CJ-OE
        # speed schedule (BaselineAgents.py:173-210) — arriving as traced
        # SMEM scalars in ``table_row``.  Deterministic, so no eps
        # channels and zero log-prob/value streams (like "table"); no
        # action-box clip (the engine never clips closed-form/fixed
        # policy outputs), but the normalise_act mapping to model units
        # matches env.step (TradingEnvironment.py:112-126).
        vals = p.fixed_action if p.policy_kind == "fixed" else table_row
        raw = tuple(
            jnp.zeros(inv.shape, jnp.float32) + c for c in vals
        )
        if p.normalise_act:
            exec_action = tuple(
                (raw[c] + 1.0) * p.act_grad[c] + p.act_low[c]
                for c in range(len(raw))
            )
        else:
            exec_action = raw
        action = raw[0] if len(raw) == 1 else jnp.concatenate(raw, axis=0)
        logp = jnp.zeros(inv.shape, jnp.float32)
        value = jnp.zeros(inv.shape, jnp.float32)
    else:
        # --- policy/value forward, transposed ---
        # bf16 matmuls are safe on normalised [-1, 1] observations;
        # raw-scale observations (e.g. price ~ 100 in the unnormalised OE
        # config) lose ~1e-2 absolute on the policy mean in bf16, so
        # compute f32 there.
        cdt = jnp.bfloat16 if p.normalise_obs else jnp.float32
        trunk, w_head_ref, b_head_ref, lstd_ref = refs
        h = X
        for li in range(n_layers):
            w_ref, b_ref = trunk[li]
            if split_at is None or li == 0:
                pre = _mmT(w_ref[:], h, cdt)
            else:
                # stacked separate towers: two per-tower matmuls on row
                # slices
                wo, wi = split_at[li], split_at[li - 1]
                pre = jnp.concatenate(
                    [_mmT(w_ref[:wo], h[:wi], cdt), _mmT(w_ref[wo:], h[wi:], cdt)],
                    axis=0,
                )
            h = jnp.tanh(pre + b_ref[:])
        hd = _mmT(w_head_ref[:], h, cdt) + b_head_ref[:]  # (A+1, L)
        mean = hd[0:a_dim]
        value = hd[a_dim : a_dim + 1]

        # --- Gaussian sample; log-prob of the UNCLIPPED sample (SB3
        # convention) ---
        log_std = lstd_ref[:]  # (A, 1)
        eps = eps_all[:a_dim]  # (A, L)
        action = mean + jnp.exp(log_std) * eps
        logp = jnp.sum(-0.5 * eps * eps - log_std, axis=0, keepdims=True) - (
            0.5 * _LOG_2PI * a_dim
        )

        # --- executed action: clip to the box, then to model units ---
        if p.normalise_act:
            clipped = jnp.clip(action, -1.0, 1.0)
            exec_action = tuple(
                (clipped[c : c + 1] + 1.0) * p.act_grad[c] + p.act_low[c]
                for c in range(a_dim)
            )
        else:
            exec_action = tuple(
                jnp.clip(
                    action[c : c + 1], p.act_low[c], p.act_low[c] + 2 * p.act_grad[c]
                )
                for c in range(a_dim)
            )

    # --- arrival thinning (current intensity) + intensity update
    # (HawkesArrivals: thin at the CURRENT state, then mean-revert to the
    # baseline + jump_size * arrivals self-excitation) ---
    new_lam_b = new_lam_a = None
    if p.arrival_kind == "hawkes":
        prob_b, prob_a = lam_b * p.dt, lam_a * p.dt
    elif p.arrival_kind == "poisson_nl":
        # exact per-step probability (arrival_models.py:81-83)
        prob_b = 1.0 - math.exp(-p.intensity_bid * p.dt)
        prob_a = 1.0 - math.exp(-p.intensity_ask * p.dt)
    else:
        prob_b, prob_a = p.intensity_bid * p.dt, p.intensity_ask * p.dt

    def _sample_arrivals():
        ab = (u_ab < prob_b).astype(jnp.float32)
        aa = (u_aa < prob_a).astype(jnp.float32)
        return ab, aa

    def _update_hawkes(ab, aa):
        if p.arrival_kind != "hawkes":
            return None, None
        mr, j = p.hawkes_mean_reversion, p.hawkes_jump
        return (
            lam_b + mr * (p.intensity_bid - lam_b) * p.dt + j * ab,
            lam_a + mr * (p.intensity_ask - lam_a) * p.dt + j * aa,
        )

    # --- fill probabilities at the CURRENT fill state; exo depths then
    # advance by their OU updates (fill_probability_models.py:159-170) ---
    new_exo_b = new_exo_a = None

    def _fill_probs(bid_depth, ask_depth):
        if p.fill_kind == "exomm":
            k, base = p.fill_exponent, p.exo_base_fill
            pb = jnp.where(
                bid_depth > exo_b, base * jnp.exp(-k * (bid_depth - exo_b)), 1.0
            )
            pa = jnp.where(
                ask_depth > exo_a, base * jnp.exp(-k * (ask_depth - exo_a)), 1.0
            )
            return pb, pa
        if p.fill_kind == "triangular":
            # fill_probability_models.py:68-91 (elementwise intent)
            c = p.fill_param
            return (
                jnp.maximum(1.0 - jnp.maximum(bid_depth, 0.0) / c, 0.0),
                jnp.maximum(1.0 - jnp.maximum(ask_depth, 0.0) / c, 0.0),
            )
        if p.fill_kind == "power":
            # fill_probability_models.py:94-123 (elementwise intent)
            k, mult = p.fill_exponent, p.fill_param
            return (
                1.0 / (1.0 + (mult * jnp.maximum(bid_depth, 0.0)) ** k),
                1.0 / (1.0 + (mult * jnp.maximum(ask_depth, 0.0)) ** k),
            )
        k = p.fill_exponent
        return jnp.exp(-k * bid_depth), jnp.exp(-k * ask_depth)

    def _update_exo():
        if p.fill_kind != "exomm":
            return None, None
        # all exo param tuples are populated together by
        # rollout_params_from_config; a hand-built params struct missing
        # them should fail here, not at a confusing tuple index below
        assert len(p.exo_kind) == 2, (
            "fill_kind='exomm' requires exo_kind/exo_level/exo_speed/"
            "exo_vol/exo_initial/exo_dt_scaled (bid, ask) tuples"
        )
        # exo_n is channel-major (2R, L): bid rows [0, R), ask rows [R, 2R)
        # (R=1 in the MLP family; the table policy's sublane-packed stats
        # mode carries R > 1)
        rr = exo_b.shape[0]
        exo_n_bid, exo_n_ask = exo_n[0:rr], exo_n[rr : 2 * rr]
        sq = math.sqrt(p.dt)

        def side(i, exo, n):
            kind = p.exo_kind[i]
            if kind == "bm":  # midprice.py BrownianMotionMidprice.update
                return exo + p.exo_level[i] * p.dt + (p.exo_vol[i] * sq) * n
            if kind == "gbm":  # GeometricBrownianMotionMidprice.update
                return (
                    exo + p.exo_level[i] * exo * p.dt
                    + (p.exo_vol[i] * sq) * exo * n
                )
            scale = p.dt if p.exo_dt_scaled[i] else 1.0  # per-side OU quirk
            return (
                exo
                + (-p.exo_speed[i] * scale) * (exo - p.exo_level[i])
                + (p.exo_vol[i] * sq) * n
            )

        return side(0, exo_b, exo_n_bid), side(1, exo_a, exo_n_ask)

    if p.dynamics_kind == "limit":
        bid_depth, ask_depth = exec_action
        # --- env step (TradingEnvironment.py:198-216 order) ---
        arr_bid, arr_ask = _sample_arrivals()
        new_lam_b, new_lam_a = _update_hawkes(arr_bid, arr_ask)
        pb, pa = _fill_probs(bid_depth, ask_depth)
        new_exo_b, new_exo_a = _update_exo()
        fill_bid = (u_fb < pb).astype(jnp.float32)
        fill_ask = (u_fa < pa).astype(jnp.float32)
        fill_bid = fill_bid * (inv < p.max_inventory).astype(jnp.float32)
        fill_ask = fill_ask * (inv > -p.max_inventory).astype(jnp.float32)
        hit_bid = arr_bid * fill_bid
        hit_ask = arr_ask * fill_ask
        new_inv = inv + hit_bid - hit_ask
        new_cash = cash - hit_bid * (price - bid_depth) + hit_ask * (price + ask_depth)
    elif p.dynamics_kind == "lam":
        # Limit orders + unit market orders (ModelDynamics.py:179-240):
        # a market order fires when its column exceeds 0.5, buying at
        # mid + half_spread / selling at mid - half_spread (:202-215),
        # BEFORE the standard limit-order bookkeeping.  Limit-fill masking
        # uses the PRE-STEP inventory, exactly like env.step step 2
        # (TradingEnvironment.py:323-327 masks before update_state).
        bid_depth, ask_depth, mo_buy_raw, mo_sell_raw = exec_action
        hs = p.fixed_half_spread
        mo_buy = (mo_buy_raw > 0.5).astype(jnp.float32)
        mo_sell = (mo_sell_raw > 0.5).astype(jnp.float32)
        if p.mask_mo_at_max_inventory:
            # repo-addition MO mask: same PRE-STEP inventory + strict
            # at-boundary convention as the limit-fill mask below
            mo_buy = mo_buy * (inv < p.max_inventory).astype(jnp.float32)
            mo_sell = mo_sell * (inv > -p.max_inventory).astype(jnp.float32)
        arr_bid, arr_ask = _sample_arrivals()
        new_lam_b, new_lam_a = _update_hawkes(arr_bid, arr_ask)
        pb, pa = _fill_probs(bid_depth, ask_depth)
        new_exo_b, new_exo_a = _update_exo()
        fill_bid = (u_fb < pb).astype(jnp.float32)
        fill_ask = (u_fa < pa).astype(jnp.float32)
        fill_bid = fill_bid * (inv < p.max_inventory).astype(jnp.float32)
        fill_ask = fill_ask * (inv > -p.max_inventory).astype(jnp.float32)
        hit_bid = arr_bid * fill_bid
        hit_ask = arr_ask * fill_ask
        new_inv = inv + (mo_buy - mo_sell) + hit_bid - hit_ask
        new_cash = (
            cash
            + mo_sell * (price - hs)
            - mo_buy * (price + hs)
            - hit_bid * (price - bid_depth)
            + hit_ask * (price + ask_depth)
        )
    elif p.dynamics_kind == "touch":
        # Post-or-not at the fixed half-spread (ModelDynamics.py:134-176):
        # fills ARE the clipped action columns (continuous, like the XLA
        # engine's dynamics.get_arrivals_and_fills), masked at the
        # inventory boundary exactly like env.step step 2.
        post_bid, post_ask = exec_action
        hs = p.fixed_half_spread
        arr_bid, arr_ask = _sample_arrivals()
        new_lam_b, new_lam_a = _update_hawkes(arr_bid, arr_ask)
        fill_bid = post_bid * (inv < p.max_inventory).astype(jnp.float32)
        fill_ask = post_ask * (inv > -p.max_inventory).astype(jnp.float32)
        hit_bid = arr_bid * fill_bid
        hit_ask = arr_ask * fill_ask
        new_inv = inv + hit_bid - hit_ask
        new_cash = cash - hit_bid * (price - hs) + hit_ask * (price + hs)
    else:  # "speed" (ModelDynamics.py:243-275; impact at the PRE-update
        # state, then the state recursion — price_impact_models.py)
        (speed,) = exec_action
        if p.impact_kind == "power":  # stateless, :34-61
            impact = p.temporary_impact * speed**p.impact_exponent
            new_imp = None
        elif p.impact_kind == "transient":  # :142-179
            impact = p.impact_kappa * imp
            new_imp = imp - p.impact_rho * imp * p.dt + p.impact_gamma * speed * p.dt
        elif p.impact_kind == "temp_transient":  # :99-138
            impact = p.temporary_impact * speed + p.impact_kappa * imp
            new_imp = imp - p.impact_rho * imp * p.dt + p.impact_gamma * speed * p.dt
        else:  # "temp_perm", :64-96
            impact = p.temporary_impact * speed + imp
            new_imp = imp + p.permanent_impact * speed * p.dt
        execution_price = price + impact
        volume = speed * p.dt
        new_inv = inv + volume
        new_cash = cash - volume * execution_price
    # Inventory/cash clipping BEFORE the reward, like env.step
    # (TradingEnvironment.py:283-297; clip_events diagnostics are an
    # XLA-engine feature — use it when the clip is expected to bind).
    new_inv = jnp.clip(new_inv, -p.max_inventory, p.max_inventory)
    new_cash = jnp.clip(new_cash, -p.max_cash, p.max_cash)
    # Midprice SDE by kind; jump kinds react to the agent's own LIMIT
    # fills (ask fill pushes price up, bid fill down —
    # midprice_models.py:219-227; market orders do not jump, matching the
    # engine's arrivals/fills arguments).
    diffusion = (p.volatility * math.sqrt(p.dt)) * n_mid
    new_mid2 = None
    if p.midprice_kind == "heston":
        # midprice_models.py:322-372: correlated Wieners, sqrt-variance
        # diffusion, reflected variance (abs)
        vol_t = jnp.sqrt(jnp.maximum(mid2, 0.0) * p.dt)
        w1 = p.mid2_corr * n_mid + math.sqrt(1.0 - p.mid2_corr**2) * mid2_n
        new_price = price + p.drift * price * p.dt + vol_t * price * n_mid
        new_mid2 = jnp.abs(
            mid2
            + p.mid2_speed * (p.mid2_level - mid2) * p.dt
            + p.mid2_vol * vol_t * w1
        )
    elif p.midprice_kind in ("st_ou_alpha", "st_jump_alpha"):
        # price drifts at the alpha rate (midprice_models.py:149-190);
        # alpha follows an inner OU[-with-jumps] (:276-319)
        new_price = price + mid2 * p.dt + diffusion
        scale = p.dt if p.mid2_dt_scaled else 1.0
        new_mid2 = (
            mid2
            + (-p.mid2_speed * scale) * (mid2 - p.mid2_level)
            + (p.mid2_vol * math.sqrt(p.dt)) * mid2_n
        )
        if p.midprice_kind == "st_jump_alpha":
            new_mid2 = new_mid2 + p.mid_jump * (hit_ask - hit_bid)
    elif p.midprice_kind == "constant":
        new_price = price
    elif p.midprice_kind == "bm":
        new_price = price + p.drift * p.dt + diffusion
    elif p.midprice_kind == "gbm":
        new_price = price + p.drift * price * p.dt + price * diffusion
    elif p.midprice_kind == "cev":
        # dS = S*mu*dt + vol*S^gamma*sqrt(dt)*dW (midprice_models.py:401-409)
        new_price = (
            price + p.drift * price * p.dt + (price**p.mid_level) * diffusion
        )
    else:  # "ou" / "oujump" / "bmjump"
        if p.midprice_kind == "bmjump":
            new_price = price + p.drift * p.dt + diffusion
        else:
            drift_scale = p.dt if p.mid_dt_scaled else 1.0
            new_price = (
                price
                + (-p.mid_speed * drift_scale) * (price - p.mid_level)
                + diffusion
            )
        if p.midprice_kind in ("bmjump", "oujump"):
            new_price = new_price + p.mid_jump * (hit_ask - hit_bid)

    # Reward at the post-bookkeeping, post-price-move state (both sides
    # mark at their own price).  "cjmm": pathwise CJ criterion
    # (RewardFunctions.py:96-109, any inventory exponent); "running":
    # terminal penalty at the last step only (:128-138); "cjoe": CJ
    # execution criterion with the terminal aversion spread over steps
    # (:39-74).
    pnl = (new_cash + new_inv * new_price) - (cash + inv * price)
    e = p.inventory_exponent

    def q_pow(x, power=None):
        power = e if power is None else power
        if power == 2.0:
            return x * x
        if power == 1.0:
            return x
        return x**power  # reference semantics: NaN on negative base + frac exp

    if ep_len is None:
        ep_len = p.terminal_time - p.start_time
    if p.reward_kind == "pnl":
        reward = pnl
    elif p.reward_kind == "cjmm":
        # inv0 is a (1, L) plane: per-env under random initial inventory;
        # ep_len likewise under random start times (terminal - t0)
        const = (p.alpha * p.dt / ep_len) * q_pow(inv0)
        reward = (
            pnl
            - p.dt * p.phi * q_pow(new_inv)
            - p.alpha * (q_pow(new_inv) - q_pow(inv))
            - const
        )
    elif p.reward_kind == "cjoe":
        (speed,) = exec_action
        reward = (
            pnl
            - p.dt * p.phi * q_pow(new_inv)
            - p.dt * p.alpha * (
                e * speed * q_pow(inv, e - 1.0) + q_pow(inv0) * ep_len
            )
        )
    elif p.reward_kind == "exp_utility":
        # -exp(-gamma * terminal mark-to-market) at the last step, else 0
        # (RewardFunctions.py:149-166).
        terminal = is_last.astype(jnp.float32)
        reward = terminal * -jnp.exp(
            -p.risk_aversion * (new_cash + new_inv * new_price)
        )
    else:  # "running"
        terminal = is_last.astype(jnp.float32)
        reward = (
            pnl
            - p.dt * p.phi * q_pow(new_inv)
            - p.alpha * terminal * q_pow(new_inv)
        )
    new_carry = (new_cash, new_inv, new_price)
    if p.has_mid2:
        new_carry = new_carry + (new_mid2,)
    if p.arrival_kind == "hawkes":
        new_carry = new_carry + (new_lam_b, new_lam_a)
    if p.fill_kind == "exomm":
        new_carry = new_carry + (new_exo_b, new_exo_a)
    if p.dynamics_kind == "speed" and p.impact_kind != "power":
        new_carry = new_carry + (new_imp,)
    return new_carry, (X, action, logp, value, reward)


def _make_kernel(p: MlpRolloutParams, n_layers: int, a_dim: int, use_noise: bool,
                 split_at=None, stats_only: bool = False, rows: int = 1,
                 final_obs: bool = False):
    use_inv0 = bool(p.inventory_range)
    use_t0 = p.random_start
    table = p.policy_kind == "table"
    fixed = p.policy_kind == "fixed"
    schedule = p.policy_kind == "schedule"
    deterministic = table or fixed or schedule
    assert not (stats_only and use_t0), (
        "stats-only outputs with random start times are unsupported "
        "(nothing needs them; the streams mode freezes post-done lanes)"
    )
    # rows > 1 = sublane-packed env planes ((R, L) instead of (1, L), R=8
    # filling the VPU's native (8, 128) shape): full vector-unit
    # utilization on the env update and the PRNG draws.  Deterministic-
    # policy (table/fixed) stats mode only — the stream outputs and the
    # MLP forward are laid out for (1, L) planes.
    assert rows == 1 or (deterministic and stats_only), (
        "sublane-packed rows require a deterministic policy's stats-only mode"
    )

    def kernel(*refs):
        it = iter(refs)
        if use_noise:
            noise_ref = next(it)
        else:
            seed_ref = next(it)
        inv0_ref = next(it) if use_inv0 else None
        t0_ref = next(it) if use_t0 else None
        if table:
            bid_tbl_ref, ask_tbl_ref = next(it), next(it)
            weight_refs = None
        elif schedule:
            sched_ref = next(it)  # SMEM (T_total, A) per-step action table
            weight_refs = None
        elif fixed:
            weight_refs = None  # the constant action lives in static params
        else:
            trunk = [(next(it), next(it)) for _ in range(n_layers)]
            w_head_ref, b_head_ref, lstd_ref = next(it), next(it), next(it)
            weight_refs = (trunk, w_head_ref, b_head_ref, lstd_ref)
        if stats_only:
            # terminal cash/inventory/price + per-env episode reward and
            # quoted-spread sums — the fused counterpart of
            # rollout.mc_episode_stats' inputs
            cash_out, inv_out, price_out, rsum_out, ssum_out = (
                next(it) for _ in range(5)
            )
            first_out = cash_out
        else:
            obs_ref, act_ref, logp_ref, val_ref, rew_ref = (
                next(it) for _ in range(5)
            )
            fin_ref = next(it) if final_obs else None
            first_out = obs_ref

        if not use_noise:
            # Two-component seed: (call seed, program id) gives each tile an
            # independent stream without the contiguous-block overlap of
            # `seed + program_id` across calls with nearby seeds.
            pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        L = first_out.shape[-1]
        # policy-sample normal rows (channel layout); the deterministic
        # policy kinds (table/fixed) draw none
        n_eps = 0 if deterministic else max(a_dim, 2)
        use_exo = p.fill_kind == "exomm"
        use_mid2 = p.has_mid2
        # Box-Muller pairs covering n_eps action normals + 1 midprice
        # normal (+ 2 exogenous best-depth normals + 1 second-midprice
        # normal); for n_eps=2 with neither extra this reproduces the
        # original draw stream exactly (4 uniforms -> [cos0, cos1, sin0,
        # sin1]).
        n_norm = n_eps + 1 + (2 if use_exo else 0) + (1 if use_mid2 else 0)
        exo_at = n_eps + 1
        mid2_at = exo_at + (2 if use_exo else 0)

        R = rows
        bm_pairs = (n_norm * R + 1) // 2

        def hw_draws():
            # channel-major row grouping: channel c occupies rows
            # [c*R, (c+1)*R) of each draw block (R=1 reproduces the
            # original layout/stream exactly)
            u = _uniform_from_bits(pltpu.prng_random_bits((4 * R, L)))
            bm_u = _uniform_from_bits(pltpu.prng_random_bits((2 * bm_pairs, L)))
            r = jnp.sqrt(-2.0 * jnp.log(1.0 - bm_u[0:bm_pairs]))
            theta = (2.0 * math.pi) * bm_u[bm_pairs:]
            normals = jnp.concatenate(
                [r * jnp.cos(theta), r * jnp.sin(theta)], axis=0
            )  # rows: [0, n_eps) action eps, n_eps midprice, then exo
            # best-depth normals, then the second-midprice normal
            return (
                u[0 : R], u[R : 2 * R], u[2 * R : 3 * R], u[3 * R : 4 * R],
                normals[0 : n_eps * R] if n_eps else None,
                normals[n_eps * R : (n_eps + 1) * R],
                normals[exo_at * R : (exo_at + 2) * R] if use_exo else None,
                normals[mid2_at * R : (mid2_at + 1) * R] if use_mid2 else None,
            )

        inv0 = (
            inv0_ref[:] if use_inv0
            else jnp.full((rows, L), p.initial_inventory, jnp.float32)
        )
        t0_row = t0_ref[:] if use_t0 else None  # (1, L)
        ep_len = (p.terminal_time - t0_row) if use_t0 else None
        # table/schedule row index base: a late fixed start begins deeper
        # into the (n_steps + 1)-row table, exactly like the engine
        # policy's round(t / dt) time index (agents/baseline.py)
        t_off = round(p.start_time / p.dt) if (table or schedule) else 0

        def body(i, carry):
            if stats_only:
                carry, racc, sacc = carry[:-2], carry[-2], carry[-1]
            if use_t0:
                # Per-env start times: the step STARTING at or past the
                # terminal is post-done — its lanes are frozen below,
                # exactly as the XLA engine's random-start masking
                # (rollout.py: was_done freeze + zeroed rewards); the obs
                # time is clamped at terminal like the frozen XLA obs.
                t_start = t0_row + i.astype(jnp.float32) * p.dt  # (1, L)
                t_val = jnp.minimum(t_start, p.terminal_time)
                was_done = t_start >= p.terminal_time - p.dt / 2
                last = t_start >= p.terminal_time - 1.5 * p.dt
            else:
                t_val = p.start_time + i.astype(jnp.float32) * p.dt
                last = i == p.run_steps - 1
            if use_noise:
                # channel-major (R, L) slabs per channel (R=1 == original)
                draws = (
                    noise_ref[i, 0 : R], noise_ref[i, R : 2 * R],
                    noise_ref[i, 2 * R : 3 * R], noise_ref[i, 3 * R : 4 * R],
                    noise_ref[i, 4 * R : (4 + n_eps) * R] if n_eps else None,
                    noise_ref[i, (4 + n_eps) * R : (5 + n_eps) * R],
                    noise_ref[i, (5 + n_eps) * R : (7 + n_eps) * R] if use_exo else None,
                    noise_ref[i, (4 + mid2_at) * R : (5 + mid2_at) * R] if use_mid2 else None,
                )
            else:
                draws = hw_draws()
            if table:
                r0 = t_off + i
                table_row = jnp.concatenate(
                    [bid_tbl_ref[pl.ds(r0, 1), :], ask_tbl_ref[pl.ds(r0, 1), :]],
                    axis=0,
                )  # (2, Q_pad)
            elif schedule:
                # this step's action row as SMEM scalar reads
                table_row = tuple(
                    sched_ref[t_off + i, c] for c in range(a_dim)
                )
            else:
                table_row = None
            new_carry, (X, action, logp, value, reward) = _rollout_step(
                p, n_layers, a_dim, weight_refs, carry, t_val, draws,
                is_last=last, inv0=inv0, split_at=split_at, ep_len=ep_len,
                table_row=table_row,
            )
            if use_t0:
                reward = jnp.where(was_done, 0.0, reward)
                new_carry = jax.tree_util.tree_map(
                    lambda nw, old: jnp.where(was_done, old, nw),
                    new_carry, carry,
                )
            if stats_only:
                # quoted spread = bid + ask depth (2x the mean half-spread
                # of the results table, analytics.episode_stats); zeros for
                # 1-column actions (speed dynamics — the stat is NaN'd by
                # the wrapper, matching mc_episode_stats' action_dim < 2
                # convention)
                rr = reward.shape[0]
                if a_dim >= 2:
                    spread = action[:rr] + action[rr : 2 * rr]
                else:
                    spread = jnp.zeros_like(reward)
                return new_carry + (racc + reward, sacc + spread)
            # Separate output buffers measured fastest (123 ms vs 174-198 ms
            # for packed-single-buffer variants at 262k envs); the 1-channel
            # streams write plain 2D (T, L) rows, so nothing pads anywhere.
            obs_ref[i] = X
            act_ref[i] = action
            logp_ref[i] = logp[0]
            val_ref[i] = value[0]
            rew_ref[i] = reward[0]
            return new_carry

        init = (
            jnp.full((rows, L), p.initial_cash, jnp.float32),
            inv0,
            jnp.full((rows, L), p.initial_price, jnp.float32),
        )
        if p.has_mid2:
            # Heston initial variance / short-term alpha0
            init = init + (jnp.full((rows, L), p.mid2_initial, jnp.float32),)
        if p.arrival_kind == "hawkes":
            # Hawkes intensities start at the baseline (HawkesArrivals.
            # initial_state)
            init = init + (
                jnp.full((rows, L), p.intensity_bid, jnp.float32),
                jnp.full((rows, L), p.intensity_ask, jnp.float32),
            )
        if p.fill_kind == "exomm":
            init = init + (
                jnp.full((rows, L), p.exo_initial[0], jnp.float32),
                jnp.full((rows, L), p.exo_initial[1], jnp.float32),
            )
        if p.dynamics_kind == "speed" and p.impact_kind != "power":
            # impact state starts at 0 (temp_perm) / initial_transient_impact
            init = init + (jnp.full((rows, L), p.impact_initial, jnp.float32),)
        if stats_only:
            # reward + quoted-spread sums
            init = init + (
                jnp.zeros((rows, L), jnp.float32),
                jnp.zeros((rows, L), jnp.float32),
            )
        if not use_noise and deterministic and p.dynamics_kind == "speed":
            # Mosaic layout fix (cf. ops/pallas_episode._oe_episode_kernel,
            # found by the round-3 hardware run): with a deterministic
            # policy on SPEED dynamics, cash/inventory stay REPLICATED
            # vregs (no lane-varying uniforms enter them) while price
            # becomes lane-varying after the first noise draw, and Mosaic
            # cannot relayout non-replicated -> replicated at the
            # fori_loop boundary.  A runtime-random jitter ~1e-42
            # (absorbed to exact equality by the first f32 add with any
            # normal-scale operand) makes every carry lane-varying.  The
            # other dynamics kinds mix arrival/fill uniforms into every
            # carry, and the MLP policy's eps draws vary the action — only
            # this combination needs it.
            jitter = _uniform_from_bits(pltpu.prng_random_bits((rows, L))) * 1e-42
            init = tuple(x + jitter for x in init)
        final = jax.lax.fori_loop(0, p.run_steps, body, init)
        if stats_only:
            cash_out[:] = final[0]
            inv_out[:] = final[1]
            price_out[:] = final[2]
            rsum_out[:] = final[-2]
            ssum_out[:] = final[-1]
        elif final_obs:
            # Terminal observation (the T-th row of the engine's (T+1)
            # trajectory): the obs of the final carry at the terminal time
            # — what rollout()'s Trajectory assembly needs (round 5).
            assert not use_t0
            t_term = p.start_time + p.run_steps * p.dt
            fin_ref[:] = _obs_planes(p, final, t_term)

    return kernel


def _sublane_pad(d: int) -> int:
    """Padded second-minor extent of a (T, d, lanes) f32 block: XLA tiles
    the sublane dim with the largest power-of-two tile <= 8 that divides
    it, else pads up (observed: d=4 -> T(4,128) unpadded, d=5 -> T(8,128)
    padded to 8 — an 18.79M scoped-vmem OOM at tile 1024 for the S=5 OE
    obs block)."""
    if d >= 8:
        return -(-d // 8) * 8
    return d if d & (d - 1) == 0 else (4 if d == 3 else 8)


def _mlp_per_lane_bytes(
    run_steps: int, has_noise: bool, s_dim: int, a_dim: int,
    exomm: bool, mid2: bool, h_width: int,
) -> int:
    """Per-lane scoped-VMEM cost of the MLP streams mode (auto_tile's and
    mlp_streams_feasible's shared model)."""
    channels = _sublane_pad(s_dim) + _sublane_pad(a_dim) + 3
    if has_noise:
        channels += _sublane_pad(n_noise_channels(a_dim, exomm=exomm, mid2=mid2))
    per_lane = 2 * run_steps * 4 * channels
    # Live forward activations beyond the calibrated production width
    # (shared-trunk h=256): separate towers carry a STACKED (2H, L)
    # activation, so charge ~2 live f32 copies of the extra rows per lane
    # (round 4; keeps the hardware-proven points unchanged at h<=256).
    per_lane += 2 * 4 * max(0, h_width - 256)
    return per_lane


def mlp_streams_feasible(
    p: MlpRolloutParams, h_width: int = 256, has_noise: bool = False,
) -> bool:
    """Whether the MLP rollout streams mode fits even its narrowest
    (128-lane) tile under the scoped-VMEM budget — long horizons do not
    (auto_tile's fallback returns 128 regardless, which then dies as an
    opaque Mosaic compile error; callers choosing fused-vs-XLA, e.g.
    evaluate_policy's auto backend, pre-check here and fall back)."""
    per_lane = _mlp_per_lane_bytes(
        p.run_steps, has_noise, len(p.obs_low), len(p.act_low),
        p.fill_kind == "exomm", p.has_mid2, h_width,
    )
    return 128 * per_lane <= 15 * 1024 * 1024


def auto_tile(
    n: int, run_steps: int, has_noise: bool, s_dim: int = 4, a_dim: int = 2,
    exomm: bool = False, mid2: bool = False, h_width: int = 256,
) -> int:
    """Widest lane tile whose double-buffered per-program output blocks
    (T x (S+A+3) x tile f32, sublane-padded, plus the noise input block
    when injected) fit Mosaic's 16M scoped vmem with margin.  Lane width
    is the dominant rollout throughput lever — 1024 lanes measured 86.9 ms
    vs 165.4 ms at 512 for the 52.4M-step config-5 rollout
    (scripts/exp_rollout_kernel.py); 2048 exceeds scoped vmem at T=200."""
    budget = 15 * 1024 * 1024
    per_lane = _mlp_per_lane_bytes(
        run_steps, has_noise, s_dim, a_dim, exomm, mid2, h_width
    )
    for cand in (2048, 1024, 512, 256, 128):
        if cand <= n and n % cand == 0 and cand * per_lane <= budget:
            return cand
    return 128


@partial(
    jax.jit,
    static_argnames=("p", "num_trajectories", "tile", "interpret", "final_obs"),
)
def mlp_rollout_pallas(
    p: MlpRolloutParams,
    params,
    seed,
    num_trajectories: int,
    tile: int | None = None,
    interpret: bool = False,
    noise=None,
    inv0=None,
    t0=None,
    final_obs: bool = False,
):
    """Run one full episode for all envs with the MLP policy fused in.

    Returns feature-major buffers (obs (T, S, N), actions (T, A, N),
    log_probs (T, N), values (T, N), rewards (T, N)) — envs on the minor
    dimension throughout, so nothing is lane-padded; the 2D single-channel
    streams avoid sublane padding too.

    ``noise`` (optional): (T, n_noise_channels(a_dim, exomm, mid2), N)
    injected channels — 4 env uniforms, max(a_dim, 2) policy-sample
    normals, the midprice normal, then 2 exogenous best-depth normals
    when the fill kind is "exomm", then 1 second-midprice-state normal
    for the 2-dim midprice kinds — replacing the hardware PRNG (the
    CPU-testable parity mode).

    ``inv0``: (N,) per-env initial inventories — REQUIRED when
    ``p.inventory_range`` is set (random initial inventory; the caller
    draws, see :func:`collect_rollout_fused_T`), forbidden otherwise.
    """
    assert p.fill_kind != "exomm" or p.dynamics_kind in ("limit", "lam"), (
        "exomm fills require limit/lam dynamics (the only branches that "
        "advance the exogenous best-depth processes)"
    )
    n = num_trajectories
    T = p.run_steps
    if tile is None:
        if "shared" in params:
            h_width = max(l["w"].shape[1] for l in params["shared"])
        else:
            h_width = 2 * max(l["w"].shape[1] for l in params["pi"][:-1])
        tile = auto_tile(
            n, T, noise is not None,
            s_dim=len(p.obs_low), a_dim=len(p.act_low),
            exomm=p.fill_kind == "exomm", mid2=p.has_mid2, h_width=h_width,
        )
    assert n % tile == 0 and tile % LANES == 0, (n, tile)
    grid = n // tile
    trunk, w_head, b_head, log_std, split_at = transpose_params(params)
    n_layers = len(trunk)
    a_dim = w_head.shape[0] - 1

    def full(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))

    inputs = []
    in_specs = []
    if noise is None:
        inputs.append(jnp.asarray([seed], dtype=jnp.int32))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    else:
        noise = jnp.asarray(noise, jnp.float32)
        n_ch = n_noise_channels(
            len(p.act_low), exomm=p.fill_kind == "exomm", mid2=p.has_mid2
        )
        assert noise.shape == (T, n_ch, n), (noise.shape, n_ch)
        inputs.append(noise)
        in_specs.append(pl.BlockSpec((T, n_ch, tile), lambda i: (0, 0, i)))
    if p.inventory_range:
        assert inv0 is not None, "inventory_range set: pass inv0 (N,) draws"
        inv0 = jnp.asarray(inv0, jnp.float32).reshape(1, n)
        inputs.append(inv0)
        in_specs.append(pl.BlockSpec((1, tile), lambda i: (0, i)))
    else:
        assert inv0 is None, "inv0 only valid with inventory_range"
    if p.random_start:
        # (N,) per-env start times, quantised to the step grid by the
        # caller (collect_rollout_fused_T draws ONE shared value per
        # episode, matching env.reset / TradingEnvironment.py:257-268;
        # per-env planes are accepted for tests and generality)
        assert t0 is not None, "random_start set: pass t0 (N,) start times"
        t0 = jnp.asarray(t0, jnp.float32).reshape(1, n)
        inputs.append(t0)
        in_specs.append(pl.BlockSpec((1, tile), lambda i: (0, i)))
    else:
        assert t0 is None, "t0 only valid with a random start_time spec"
    for w, b in trunk:
        inputs += [w, b]
        in_specs += [full(w.shape), full(b.shape)]
    inputs += [w_head, b_head, log_std]
    in_specs += [full(w_head.shape), full(b_head.shape), full(log_std.shape)]

    s_dim = len(p.obs_low)  # 4 (limit) or 5 (speed: + impact state column)
    out_shape = [
        jax.ShapeDtypeStruct((T, s_dim, n), jnp.float32),  # obs
        jax.ShapeDtypeStruct((T, a_dim, n), jnp.float32),  # actions
        jax.ShapeDtypeStruct((T, n), jnp.float32),  # log-probs
        jax.ShapeDtypeStruct((T, n), jnp.float32),  # values
        jax.ShapeDtypeStruct((T, n), jnp.float32),  # rewards
    ]
    flat = pl.BlockSpec((T, tile), lambda i: (0, i))
    out_specs = [
        pl.BlockSpec((T, s_dim, tile), lambda i: (0, 0, i)),
        pl.BlockSpec((T, a_dim, tile), lambda i: (0, 0, i)),
        flat, flat, flat,
    ]
    if final_obs:
        # terminal observation (the T-th trajectory row; round 5) — the
        # same 6th output the deterministic kinds emit
        assert not p.random_start, "final_obs with random starts: use XLA"
        out_shape.append(jax.ShapeDtypeStruct((s_dim, n), jnp.float32))
        out_specs.append(pl.BlockSpec((s_dim, tile), lambda i: (0, i)))
    kernel = _make_kernel(p, n_layers, a_dim, use_noise=noise is not None,
                          split_at=split_at, final_obs=final_obs)
    # The plain HLO interpreter has no lowering for prng_seed; the hardware-
    # PRNG path on CPU needs the Mosaic TPU interpreter (which stubs random
    # bits to zeros — smoke-run only; use noise= for exact CPU validation).
    interp = interpret
    if interpret is True and noise is None:
        interp = pltpu.InterpretParams()
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interp,
    )(*inputs)
    return outs  # 5 streams (+ the (S, N) terminal obs when final_obs)


@partial(
    jax.jit,
    static_argnames=(
        "p", "num_trajectories", "tile", "interpret", "stats_only", "rows",
        "final_obs",
    ),
)
def table_rollout_pallas(
    p: MlpRolloutParams,
    bid_table,
    ask_table,
    seed,
    num_trajectories: int,
    tile: int | None = None,
    interpret: bool = False,
    noise=None,
    inv0=None,
    stats_only: bool = False,
    rows="auto",
    final_obs: bool = False,
):
    """Fused whole-episode rollout with a CLOSED-FORM depth-table policy
    (round 4) — the Pallas fast path for the Cartea-Jaimungal MM agent
    (BaselineAgents.py:86-170), covering the CJP replication config
    (utils.config.cj_env_config), the slowest closed-form lane on the XLA
    engine.

    ``bid_table`` / ``ask_table`` are (n_steps + 1, Q_pad) f32 depth
    tables by (time index, inventory index q_max + q), Q_pad a multiple of
    128 (build them with :func:`cj_depth_tables`); ``p.table_size`` holds
    the true grid size 2 * q_max + 1.  Inside the kernel the per-env
    lookup is a one-hot MXU contraction against this step's table row —
    the same device-level choice as the XLA policy's one-hot matmul
    (agents/baseline.py), minus the per-step HBM round trips.

    Two output modes:

    - streams (default): the five :func:`mlp_rollout_pallas` buffers;
      log-probs/values are zeros (the policy is deterministic).
    - ``stats_only=True``: terminal cash/inventory/price + the per-env
      episode reward and quoted-spread (bid + ask depth) sums, each
      ``(N,)`` — nothing (T, ...)-shaped ever leaves the chip, so lane
      tiles stay wide at any horizon (the CJP config runs T=1000).

    ``noise`` uses the table-policy channel layout
    (``n_noise_channels(a_dim, table=True)``: 4 env uniforms + the
    midprice normal + any exo/mid2 extras — no policy eps rows).

    ``rows`` (stats mode only): sublane-pack the env planes as (rows, L)
    tiles — rows >= 8 fills the VPU's native (8, 128) shape and measured
    2.5-3.2x the (1, L) layout at the CJP config (5.8-7.0B steps/s,
    BENCH_NOTES round 4); "auto" picks the largest of (16, 8, 4, 2, 1)
    that divides N into lane-aligned columns (1 in streams mode).  Env
    ordering is row-major over (rows, N/rows): env ``e`` lives at row
    ``e // (N/rows)``, and ``inv0``/the flattened outputs follow that
    same order, so per-env correspondence is preserved end to end (and
    rows variants are BITWISE equal on injected noise —
    tests/test_pallas_rollout.py).
    """
    assert p.policy_kind == "table" and p.table_size >= 1
    assert p.dynamics_kind == "limit", (
        "the closed-form depth-table policy quotes (bid, ask) limit "
        "depths — limit-order dynamics only (ModelDynamics.py:87-131)"
    )
    assert not p.normalise_act, (
        "closed-form depths are model units; the engine path never "
        "normalises closed-form actions either"
    )
    assert not p.random_start, (
        "random start times with the table policy are unsupported (the "
        "reference's CJ replication runs fixed-horizon episodes)"
    )
    T = p.run_steps
    bid_table = jnp.asarray(bid_table, jnp.float32)
    ask_table = jnp.asarray(ask_table, jnp.float32)
    assert bid_table.shape == ask_table.shape and bid_table.ndim == 2
    assert bid_table.shape[0] >= round(p.start_time / p.dt) + T, (
        "depth table must cover every executed step's time index",
        bid_table.shape, T,
    )
    assert bid_table.shape[1] % LANES == 0 and bid_table.shape[1] >= p.table_size
    return _det_rollout_pallas(
        p, (bid_table, ask_table), seed, num_trajectories, tile, interpret,
        noise, inv0, stats_only, rows, a_dim=2, final_obs=final_obs,
    )


@partial(
    jax.jit,
    static_argnames=(
        "p", "num_trajectories", "tile", "interpret", "stats_only", "rows",
        "final_obs",
    ),
)
def fixed_rollout_pallas(
    p: MlpRolloutParams,
    seed,
    num_trajectories: int,
    tile: int | None = None,
    interpret: bool = False,
    noise=None,
    inv0=None,
    stats_only: bool = False,
    rows="auto",
    final_obs: bool = False,
):
    """Fused whole-episode rollout with a CONSTANT action (round 5) — the
    degenerate deterministic policy (FixedActionAgent,
    BaselineAgents.py:25-31 / ``agents.baseline.fixed_action_policy``) on
    ANY dynamics family the kernel covers.  This gives composite
    fixed-policy evaluations (e.g. the Hawkes + exogenous-MM + limit&market
    suite config) a Pallas lane: the only model axis the MLP family needed
    was the policy, and a constant needs neither weights nor eps draws.

    ``p`` comes from :func:`fixed_rollout_params`; ``p.fixed_action`` holds
    one float per action column (normalised units when ``p.normalise_act``
    — exactly what the policy callable returns on the engine path).

    Output modes, layouts, ``noise`` channel layout (the deterministic
    ``n_noise_channels(a_dim, table=True)`` — no eps rows) and the
    sublane-packed ``rows`` stats mode are exactly as
    :func:`table_rollout_pallas`."""
    assert p.policy_kind == "fixed" and len(p.fixed_action) >= 1
    expected = {"limit": 2, "lam": 4, "touch": 2, "speed": 1}[p.dynamics_kind]
    assert len(p.fixed_action) == expected, (
        f"fixed_action has {len(p.fixed_action)} columns; {p.dynamics_kind} "
        f"dynamics takes {expected}"
    )
    assert not p.random_start, (
        "random start times with the fixed policy stay on the XLA engine "
        "(rollout()'s random-start masking; the dispatcher reports this)"
    )
    return _det_rollout_pallas(
        p, (), seed, num_trajectories, tile, interpret, noise, inv0,
        stats_only, rows, a_dim=len(p.fixed_action), final_obs=final_obs,
    )


@partial(
    jax.jit,
    static_argnames=(
        "p", "num_trajectories", "tile", "interpret", "stats_only", "rows",
        "final_obs",
    ),
)
def schedule_rollout_pallas(
    p: MlpRolloutParams,
    action_table,
    seed,
    num_trajectories: int,
    tile: int | None = None,
    interpret: bool = False,
    noise=None,
    inv0=None,
    stats_only: bool = False,
    rows="auto",
    final_obs: bool = False,
):
    """Fused whole-episode rollout with a PER-STEP ACTION SCHEDULE
    (round 5): any deterministic time-only policy — e.g. the closed-form
    CJ-OE execution schedule (BaselineAgents.py:173-210) — precomputed as
    an ``(n_steps_total, A)`` f32 table and read per step as SMEM scalars
    (the shared clock means one action row per step,
    TradingEnvironment.py:218-220).  This is what gives the OE family a
    fused FULL-TRAJECTORY lane (the OE episode kernel streams terminal
    state only); the dispatch front door routes ``rollout()`` here.

    ``p`` comes from :func:`schedule_rollout_params`; ``action_table``
    rows are indexed by absolute step (a late fixed start begins deeper
    into the table, like the engine's round(t/dt) lookup).  Output modes
    and layouts exactly as :func:`table_rollout_pallas`; the noise layout
    is the deterministic one (``n_noise_channels(a_dim, table=True)``)."""
    assert p.policy_kind == "schedule"
    expected = {"limit": 2, "lam": 4, "touch": 2, "speed": 1}[p.dynamics_kind]
    action_table = jnp.asarray(action_table, jnp.float32)
    assert action_table.ndim == 2 and action_table.shape[1] == expected, (
        f"action_table must be (steps, {expected}) for {p.dynamics_kind} "
        f"dynamics; got {action_table.shape}"
    )
    assert not p.random_start, (
        "random start times with a schedule policy run on the XLA engine"
    )
    T = p.run_steps
    assert action_table.shape[0] >= round(p.start_time / p.dt) + T, (
        "action table must cover every executed step's time index",
        action_table.shape, T,
    )
    return _det_rollout_pallas(
        p, (), seed, num_trajectories, tile, interpret, noise, inv0,
        stats_only, rows, a_dim=expected, final_obs=final_obs,
        smem_tables=(action_table,),
    )


def schedule_rollout_params(cfg: EnvConfig) -> MlpRolloutParams:
    """:func:`rollout_params_from_config` specialised to a per-step action
    schedule (policy_kind="schedule")."""
    return rollout_params_from_config(cfg)._replace(policy_kind="schedule")


def schedule_table_from_policy(cfg: EnvConfig, policy) -> jax.Array:
    """Evaluate a TIME-ONLY policy on the episode step grid, producing the
    kernel's (n_steps, A) action table.  The policy is called with
    observations whose non-time columns are zero (state=None), so it must
    depend on the time column alone — the closed-form schedules do
    (CarteaJaimungalOeAgent.policy reads only TIME_INDEX)."""
    assert not cfg.normalise_observation_space, (
        "schedule tables are built from raw-time observations; the "
        "closed-form schedules run on unnormalised configs"
    )
    from mbt_gym_tpu.types import TIME_INDEX

    n_steps = cfg.n_steps
    times = jnp.arange(n_steps, dtype=jnp.float32) * cfg.step_size
    obs = jnp.zeros((n_steps, cfg.state_dim), jnp.float32)
    obs = obs.at[:, TIME_INDEX].set(times)
    return jnp.asarray(policy(None, obs, None), jnp.float32)


def det_streams_feasible(p, a_dim: int, tables_bytes: int = 0) -> bool:
    """Whether the deterministic-policy STREAMS mode can fit even its
    narrowest (128-lane) tile under the scoped-VMEM budget — the horizon's
    double-buffered (T, ...) output blocks are the binding term (e.g. the
    2000-step CJP replication config does NOT fit; its stats mode and the
    XLA engine do).  The dispatch front door pre-checks this so rollout()
    falls back with a reason instead of raising mid-call."""
    channels = _sublane_pad(len(p.obs_low)) + _sublane_pad(a_dim) + 3
    per_lane = 2 * p.run_steps * 4 * channels + 12 * 4
    return 128 * per_lane <= 15 * 1024 * 1024 - tables_bytes


def _det_rollout_pallas(
    p, tables, seed, num_trajectories, tile, interpret, noise, inv0,
    stats_only, rows, a_dim, final_obs=False, smem_tables=(),
):
    """Shared pallas_call assembly for the deterministic policy kinds
    (``tables`` = the two resident depth tables for "table", () for
    "fixed").  ``final_obs`` (streams mode): append a 6th ``(S, N)``
    output carrying the TERMINAL observation — the T-th row of the
    engine's (T+1)-row trajectory, which the auto-dispatching ``rollout``
    front door needs to assemble a full :class:`Trajectory`."""
    assert p.fill_kind != "exomm" or p.dynamics_kind in ("limit", "lam"), (
        "exomm fills require limit/lam dynamics (the only branches that "
        "advance the exogenous best-depth processes)"
    )
    if rows == "auto":
        rows = 1
        if stats_only:
            for cand in (16, 8, 4, 2):
                if num_trajectories % cand == 0 and (num_trajectories // cand) % LANES == 0:
                    rows = cand
                    break
    assert rows == 1 or stats_only, "rows > 1 requires stats_only"
    assert num_trajectories % rows == 0, (num_trajectories, rows)
    n = num_trajectories
    cols = n // rows
    T = p.run_steps
    if tile is None:
        # Same scoped-vmem envelope as auto_tile, with any resident depth
        # tables charged against the budget; stats mode has no
        # (T, ...) output blocks at all, so any horizon keeps wide tiles.
        budget = 15 * 1024 * 1024 - sum(int(t.size) * 4 for t in tables)
        channels = 0 if stats_only else (_sublane_pad(len(p.obs_low)) + _sublane_pad(a_dim) + 3)
        if noise is not None:
            # The injected block is (T, n_ch * rows, tile) — packed once,
            # so the pad applies to the PRODUCT (ADVICE r4: charging
            # rows * pad(n_ch) over-booked e.g. 128 rows instead of 80 at
            # rows=16/n_ch=5, shrinking auto-tiles needlessly).
            channels += _sublane_pad(
                rows * n_noise_channels(
                    a_dim, exomm=p.fill_kind == "exomm", mid2=p.has_mid2,
                    table=True,
                )
            )
        per_lane = 2 * T * 4 * channels + rows * 12 * 4  # + state planes
        # Prefer the widest tile that still yields >= 8 grid programs (one
        # per TensorCore): at 131k envs / rows=16, tile 1024 (grid 8)
        # measured 6.99B steps/s vs wider-but-underparallel variants.
        fitting = [
            cand for cand in (2048, 1024, 512, 256, 128)
            if cand <= cols and cols % cand == 0 and cand * per_lane <= budget
        ]
        if not fitting and 128 * per_lane > budget:
            # No candidate tile fits scoped VMEM — surface the precondition
            # instead of an opaque Mosaic compile error (ADVICE r4).
            resident = (
                f"depth tables {tables[0].shape} x{len(tables)} = "
                f"{sum(int(t.size) * 4 for t in tables) // 1024} KiB resident, "
                if tables else ""
            )
            raise ValueError(
                f"{p.policy_kind}_rollout_pallas: no lane tile fits the "
                f"VMEM budget ({resident}horizon "
                f"T={T}, rows={rows}, per-lane cost {per_lane} B, budget "
                f"{budget} B); shrink the table/horizon, use "
                f"stats_only=True, or pass tile= explicitly"
            )
        tile = 128
        for cand in fitting:
            if cols // cand >= 8:
                tile = cand
                break
        else:
            if fitting:
                tile = fitting[0]
    assert cols % tile == 0 and tile % LANES == 0, (n, rows, tile)
    grid = cols // tile

    def full(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))

    inputs = []
    in_specs = []
    if noise is None:
        inputs.append(jnp.asarray([seed], dtype=jnp.int32))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    else:
        noise = jnp.asarray(noise, jnp.float32)
        n_ch = n_noise_channels(
            a_dim, exomm=p.fill_kind == "exomm", mid2=p.has_mid2, table=True
        )
        assert noise.shape == (T, n_ch, n), (noise.shape, n_ch)
        # channel-major row packing: channel c's (rows, cols) slab sits at
        # rows [c*rows, (c+1)*rows) — env e = r * cols + col, the same
        # row-major order as inv0 and the flattened outputs
        noise = noise.reshape(T, n_ch * rows, cols)
        inputs.append(noise)
        in_specs.append(pl.BlockSpec((T, n_ch * rows, tile), lambda i: (0, 0, i)))
    if p.inventory_range:
        assert inv0 is not None, "inventory_range set: pass inv0 (N,) draws"
        inv0 = jnp.asarray(inv0, jnp.float32).reshape(rows, cols)
        inputs.append(inv0)
        in_specs.append(pl.BlockSpec((rows, tile), lambda i: (0, i)))
    else:
        assert inv0 is None, "inv0 only valid with inventory_range"
    for t in tables:
        inputs.append(t)
        in_specs.append(full(t.shape))
    for t in smem_tables:
        inputs.append(t)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))

    s_dim = len(p.obs_low)
    if stats_only:
        assert not final_obs, "final_obs is a streams-mode output"
        flat1 = pl.BlockSpec((rows, tile), lambda i: (0, i))
        out_shape = [jax.ShapeDtypeStruct((rows, cols), jnp.float32)] * 5
        out_specs = [flat1] * 5
    else:
        flat = pl.BlockSpec((T, tile), lambda i: (0, i))
        out_shape = [
            jax.ShapeDtypeStruct((T, s_dim, n), jnp.float32),  # obs
            jax.ShapeDtypeStruct((T, a_dim, n), jnp.float32),  # actions
            jax.ShapeDtypeStruct((T, n), jnp.float32),  # log-probs (zeros)
            jax.ShapeDtypeStruct((T, n), jnp.float32),  # values (zeros)
            jax.ShapeDtypeStruct((T, n), jnp.float32),  # rewards
        ]
        out_specs = [
            pl.BlockSpec((T, s_dim, tile), lambda i: (0, 0, i)),
            pl.BlockSpec((T, a_dim, tile), lambda i: (0, 0, i)),
            flat, flat, flat,
        ]
        if final_obs:
            out_shape.append(jax.ShapeDtypeStruct((s_dim, n), jnp.float32))
            out_specs.append(pl.BlockSpec((s_dim, tile), lambda i: (0, i)))
    kernel = _make_kernel(
        p, 0, a_dim, use_noise=noise is not None, stats_only=stats_only,
        rows=rows, final_obs=final_obs,
    )
    interp = interpret
    if interpret is True and noise is None:
        interp = pltpu.InterpretParams()
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interp,
    )(*inputs)
    if stats_only:
        return tuple(o.reshape(-1) for o in outs)  # cash, inv, price, rsum, ssum
    return outs


def cj_mc_episode_stats_pallas(
    cfg: EnvConfig, agent, key, episodes: int = 1, rows="auto", tile=None,
):
    """Drop-in throughput-mode counterpart of
    :func:`mbt_gym_tpu.rollout.mc_episode_stats` for the closed-form CJ
    agent, on the fused table kernel: returns the same summary dict
    (mean/std episode reward as mean/std_pnl, terminal-inventory moments,
    mean quoted spread, episode count) without materializing trajectories.
    ~9x the XLA engine's mc path at the CJP config (BENCH_NOTES round 4).
    Hardware-PRNG only (TPU); use the streams mode + episode_stats for
    CPU runs."""
    p = cj_rollout_params(cfg, agent)
    bid_tbl, ask_tbl = (jnp.asarray(t) for t in cj_depth_tables(agent))
    n = cfg.num_trajectories
    seed0 = jax.random.randint(key, (), 0, 2**30, dtype=jnp.int32)

    def one(carry, s):
        _, inv, _, rsum, ssum = table_rollout_pallas(
            p, bid_tbl, ask_tbl, s, n, stats_only=True, rows=rows, tile=tile
        )
        stats = jnp.stack([
            rsum.mean(), (rsum**2).mean(), inv.mean(), (inv**2).mean(),
            ssum.mean() / p.run_steps,
        ])
        return carry + stats, None

    total, _ = jax.lax.scan(
        one, jnp.zeros((5,), jnp.float32),
        seed0 + jnp.arange(episodes, dtype=jnp.int32),
    )
    mean_r, mean_r2, mean_q, mean_q2, mean_s = total / episodes
    return {
        "mean_pnl": mean_r,
        "std_pnl": jnp.sqrt(jnp.maximum(mean_r2 - mean_r**2, 0.0)),
        "mean_terminal_inventory": mean_q,
        "std_terminal_inventory": jnp.sqrt(jnp.maximum(mean_q2 - mean_q**2, 0.0)),
        "mean_spread": mean_s,
        "episodes": episodes * n,
    }


def cj_depth_tables(agent):
    """(bid, ask) kernel-ready depth tables from a
    :class:`~mbt_gym_tpu.agents.baseline.CarteaJaimungalMmAgent`:
    each (n_steps + 1, Q_pad) f32 with the inventory grid lane-padded to a
    multiple of 128 (padded columns are never selected — the kernel clips
    the inventory index to the true grid).

    The risk-neutral special case (PnL reward => ``inventory_neutral``,
    BaselineAgents.py:96-98,110-112) quotes the CONSTANT depth 1/kappa at
    every (time, inventory) — the engine policy never consults h there
    (agents/baseline.py), so the fused tables must not either (the
    inventory-dependent table plus its large-depth boundary overrides
    would silently diverge from the engine's constant quotes)."""
    import numpy as np

    q = 2 * agent.max_inventory + 1
    q_pad = -(-q // LANES) * LANES
    if agent.inventory_neutral:
        padded = np.zeros((agent.n_steps + 1, q_pad, 2), np.float32)
        padded[:, :q] = np.float32(1.0 / agent.kappa)
        return padded[..., 0], padded[..., 1]
    tbl = np.asarray(agent.depth_table(), np.float32)  # (T+1, Q, 2)
    assert tbl.shape[1] == q
    padded = np.zeros((tbl.shape[0], q_pad, 2), np.float32)
    padded[:, :q] = tbl
    return padded[..., 0], padded[..., 1]


def cj_rollout_params(cfg: EnvConfig, agent) -> MlpRolloutParams:
    """:func:`rollout_params_from_config` specialised to the closed-form
    CJ table policy (policy_kind="table" + the agent's inventory grid)."""
    p = rollout_params_from_config(cfg)
    return p._replace(policy_kind="table", table_size=2 * agent.max_inventory + 1)


def fixed_rollout_params(cfg: EnvConfig, fixed_action) -> MlpRolloutParams:
    """:func:`rollout_params_from_config` specialised to the constant-action
    policy (FixedActionAgent, BaselineAgents.py:25-31): ``fixed_action`` is
    one float per action column, in whatever units the policy would return
    (normalised when ``cfg.normalise_action_space``)."""
    import numpy as np

    p = rollout_params_from_config(cfg)
    action = tuple(float(x) for x in np.asarray(fixed_action).reshape(-1))
    return p._replace(policy_kind="fixed", fixed_action=action)


def fixed_mc_episode_stats_pallas(
    cfg: EnvConfig, fixed_action, key, episodes: int = 1, rows="auto",
    tile=None,
):
    """Drop-in throughput-mode counterpart of
    :func:`mbt_gym_tpu.rollout.mc_episode_stats` for a constant-action
    policy, on the fused fixed-policy kernel: the same summary dict without
    materializing trajectories.  The action stats are exact (the action is
    a constant): quote-valued families report ``mean_spread`` from the
    denormalised first two columns; at-the-touch reports
    ``mean_spread=NaN`` + ``post_rate``; 1-column (speed) actions report
    NaN — matching the engine path's conventions.  Hardware-PRNG only
    (TPU); use the streams mode + episode_stats for CPU runs."""
    import numpy as np

    from mbt_gym_tpu.dynamics import AtTheTouchDynamics

    p = fixed_rollout_params(cfg, fixed_action)
    n = cfg.num_trajectories
    seed0 = jax.random.randint(key, (), 0, 2**30, dtype=jnp.int32)

    def one(carry, s):
        _, inv, _, rsum, _ = fixed_rollout_pallas(
            p, s, n, stats_only=True, rows=rows, tile=tile
        )
        stats = jnp.stack([
            rsum.mean(), (rsum**2).mean(), inv.mean(), (inv**2).mean(),
        ])
        return carry + stats, None

    total, _ = jax.lax.scan(
        one, jnp.zeros((4,), jnp.float32),
        seed0 + jnp.arange(episodes, dtype=jnp.int32),
    )
    mean_r, mean_r2, mean_q, mean_q2 = total / episodes
    action = np.asarray(p.fixed_action, np.float32)
    if isinstance(cfg.dynamics, AtTheTouchDynamics):
        spread_stats = {
            "mean_spread": jnp.asarray(jnp.nan, jnp.float32),
            "post_rate": jnp.asarray(action[:2].mean(), jnp.float32),
        }
    elif action.size >= 2:
        quotes = action[:2]
        if p.normalise_act:
            grad = np.asarray(p.act_grad[:2], np.float32)
            low = np.asarray(p.act_low[:2], np.float32)
            quotes = (quotes + 1.0) * grad + low
        spread_stats = {
            "mean_spread": jnp.asarray(2.0 * quotes.mean(), jnp.float32)
        }
    else:
        spread_stats = {"mean_spread": jnp.asarray(jnp.nan, jnp.float32)}
    return {
        "mean_pnl": mean_r,
        "std_pnl": jnp.sqrt(jnp.maximum(mean_r2 - mean_r**2, 0.0)),
        "mean_terminal_inventory": mean_q,
        "std_terminal_inventory": jnp.sqrt(jnp.maximum(mean_q2 - mean_q**2, 0.0)),
        **spread_stats,
        "episodes": episodes * n,
    }


S_DIM = 4  # AS env state columns (cash, inventory, time, price)
A_DIM = 2  # bid/ask depths


class TRolloutBatch(NamedTuple):
    """Feature-major rollout batch: envs stay on the MINOR dimension of
    every leaf, so nothing is lane-padded and no transpose is materialized
    (a (T, N, 4) f32 array pads 32x on TPU — 26.8 GB at pod batch)."""

    obs_t: jax.Array  # (T, S, N)
    actions_t: jax.Array  # (T, A, N)
    log_probs: jax.Array  # (T, N)
    values: jax.Array  # (T, N)
    rewards: jax.Array  # (T, N)
    advantages: jax.Array  # (T, N)
    returns: jax.Array  # (T, N)


def collect_rollout_fused_T(
    env_cfg: EnvConfig,
    params,
    key: jax.Array,
    gamma: float = 1.0,
    lam: float = 0.95,
    tile: int | None = None,
    interpret: bool = False,
    noise=None,
    inv0=None,
    t0=None,
) -> TRolloutBatch:
    """Fused rollout in its native feature-major layout + shared GAE —
    the input to :func:`mbt_gym_tpu.ops.fused_ppo.ppo_fused_grads_T`.

    Random initial inventory (``initial_inventory=(lo, hi)``): per-env
    integer draws in [lo, hi) are taken from ``key`` each episode (same
    distribution as ``env.reset``); pass ``inv0`` to inject specific draws
    (parity tests).

    Random start times (``start_time=("uniform", lo, hi)``): ONE shared
    draw per episode, quantised to the step grid — the ``env.reset`` /
    reference distribution (TradingEnvironment.py:257-268) — broadcast
    into the kernel's per-env t0 plane; pass ``t0`` (N,) to inject draws
    (parity tests; per-env values are accepted).  Post-done lanes are
    frozen with zero rewards, so GAE over the full horizon matches the
    XLA engine's masking — but note values past done are the frozen-obs
    values, which is why PPO training gates random starts out on BOTH
    paths."""
    from mbt_gym_tpu.agents.ppo import compute_gae

    p = rollout_params_from_config(env_cfg)
    if p.inventory_range:
        key, inv_key = jax.random.split(key)
        if inv0 is None:
            lo, hi = p.inventory_range
            inv0 = jax.random.randint(
                inv_key, (env_cfg.num_trajectories,), lo, hi
            ).astype(jnp.float32)
    if p.random_start:
        key, t_key = jax.random.split(key)
        if t0 is None:
            _, lo, hi = env_cfg.start_time
            raw = jax.random.uniform(
                t_key, (), dtype=jnp.float32, minval=lo, maxval=hi
            )
            shared = jnp.round(raw / env_cfg.step_size) * env_cfg.step_size
            t0 = jnp.broadcast_to(shared, (env_cfg.num_trajectories,))
    seed = jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)
    obs_t, actions_t, log_probs, values, rewards = mlp_rollout_pallas(
        p, params, seed, env_cfg.num_trajectories, tile=tile,
        interpret=interpret, noise=noise, inv0=inv0, t0=t0,
    )
    last_value = jnp.zeros_like(values[0])
    advantages, returns = compute_gae(rewards, values, last_value, gamma, lam)
    return TRolloutBatch(
        obs_t=obs_t, actions_t=actions_t, log_probs=log_probs, values=values,
        rewards=rewards, advantages=advantages, returns=returns,
    )


def collect_rollout_fused(
    env_cfg: EnvConfig,
    params,
    key: jax.Array,
    gamma: float = 1.0,
    lam: float = 0.95,
    tile: int | None = None,
    interpret: bool = False,
    noise=None,
    inv0=None,
    t0=None,
):
    """Drop-in replacement for ``agents.ppo.collect_rollout``: returns the
    row-major :class:`RolloutBatch`.  NOTE: the (T, N, S) transpose this
    materializes is lane-padded 32x at the consumer — fine for tests and
    small runs; at pod batch use :func:`collect_rollout_fused_T` + the
    transposed update kernel (what ``train_iteration`` does when both
    fused flags are set)."""
    from mbt_gym_tpu.agents.ppo import RolloutBatch

    tb = collect_rollout_fused_T(
        env_cfg, params, key, gamma=gamma, lam=lam, tile=tile,
        interpret=interpret, noise=noise, inv0=inv0, t0=t0,
    )
    return RolloutBatch(
        obs=jnp.swapaxes(tb.obs_t, 1, 2), actions=jnp.swapaxes(tb.actions_t, 1, 2),
        log_probs=tb.log_probs, values=tb.values, rewards=tb.rewards,
        advantages=tb.advantages, returns=tb.returns,
    )
