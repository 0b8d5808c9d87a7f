"""Fused whole-episode Pallas TPU kernel for the flagship AS market-making
config (BM midprice + Poisson arrivals + exponential fill + limit-order
dynamics + PnL, the BASELINE.json headline).

Instead of `lax.scan`ning an XLA step (one HBM round-trip of the state per
step and ~40 small VPU ops of launch overhead each), this kernel keeps the
entire env state for a tile of environments in VMEM for the whole episode:

- grid over env tiles; each program owns a ``(ROWS, 128)`` tile of envs;
- per-program hardware PRNG (``pltpu.prng_seed(seed + program_id)``, draws
  via ``pltpu.prng_random_bits``) — no threefry key math in the hot loop;
- uniforms from raw bits (24-bit mantissa trick), normals via Box-Muller on
  the VPU;
- the closed-form AS policy (or fixed quotes) evaluated inline;
- only the terminal state (cash, inventory, price) leaves the chip: for the
  PnL reward the episode return telescopes to terminal mark-to-market, so
  summary statistics are exact without materializing trajectories.

The general composition engine (``mbt_gym_tpu.env``) remains the semantic
reference; this kernel is the speed-of-light path for the hot config and is
validated against the XLA path statistically (same distribution, different —
but deterministic — RNG stream).
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

LANES = 128
DEFAULT_ROWS = 64  # (64, 128) tile = 8192 envs per program


class AsEpisodeParams(NamedTuple):
    """Scalars baked into the kernel at trace time.  ``initial_cash`` /
    ``initial_inventory`` / ``start_time`` parameterise the initial state
    (the round-1 cash0=inv0=0/t0=0 restriction is lifted); a late
    ``start_time`` runs the correspondingly shorter episode."""

    n_steps: int
    dt: float
    drift: float
    volatility: float
    initial_price: float
    intensity_bid: float
    intensity_ask: float
    fill_exponent: float
    max_inventory: float
    terminal_time: float
    risk_aversion: float  # 0 => fixed risk-neutral quotes 1/k
    initial_cash: float = 0.0
    initial_inventory: float = 0.0
    start_time: float = 0.0
    max_cash: float = math.inf  # env.step's cash clip bound (rarely binds)

    @property
    def run_steps(self) -> int:
        """Steps actually executed (a late fixed start shortens the episode,
        TradingEnvironment.py:218-220 / rollout._episode_steps)."""
        return self.n_steps - round(self.start_time / self.dt)


def params_from_config(cfg: EnvConfig, risk_aversion: float = 0.1) -> AsEpisodeParams:
    from mbt_gym_tpu.dynamics import LimitOrderDynamics
    from mbt_gym_tpu.processes.arrivals import PoissonArrivals
    from mbt_gym_tpu.processes.fills import ExponentialFill
    from mbt_gym_tpu.processes.midprice import BrownianMotionMidprice
    from mbt_gym_tpu.rewards import PnL

    d = cfg.dynamics
    # exact 2-action limit-order contract: LimitAndMarketOrderDynamics
    # SUBCLASSES LimitOrderDynamics (round-5 review finding — a lam+PnL
    # config would otherwise run here with its market orders silently
    # ignored), so gate on action_dim like rollout_params_from_config
    assert isinstance(d, LimitOrderDynamics) and d.action_dim == 2, (
        "pallas fast path: pure limit-order dynamics only (lam's market "
        "orders are not simulated by this kernel)"
    )
    assert isinstance(d.midprice_model, BrownianMotionMidprice)
    assert isinstance(d.arrival_model, PoissonArrivals)
    assert isinstance(d.fill_probability_model, ExponentialFill)
    assert isinstance(cfg.reward_function, PnL), "episode return telescopes only for PnL"
    assert not cfg.normalise_action_space and not cfg.normalise_observation_space
    assert not isinstance(cfg.initial_inventory, tuple) and not callable(cfg.initial_inventory), (
        "pallas fast path: deterministic scalar initial inventory only"
    )
    assert not isinstance(cfg.start_time, tuple) and not callable(cfg.start_time), (
        "pallas fast path: fixed start time only"
    )
    assert cfg.dtype == "float32", (
        "the episode kernel computes in float32; float64 reference-parity "
        "configs must use the XLA rollout"
    )
    assert cfg.reward_scaling is None, (
        "reward_scaling is an XLA-engine feature; the kernel's telescoped "
        "PnL assumes unscaled rewards"
    )
    return AsEpisodeParams(
        n_steps=cfg.n_steps,
        dt=cfg.step_size,
        drift=d.midprice_model.drift,
        volatility=d.midprice_model.volatility,
        initial_price=d.midprice_model.initial_price,
        intensity_bid=d.arrival_model.intensity[0],
        intensity_ask=d.arrival_model.intensity[1],
        fill_exponent=d.fill_probability_model.fill_exponent,
        max_inventory=float(cfg.max_inventory),
        terminal_time=cfg.terminal_time,
        risk_aversion=risk_aversion,
        initial_cash=float(cfg.initial_cash),
        initial_inventory=float(cfg.initial_inventory),
        start_time=round(float(cfg.start_time) / cfg.step_size) * cfg.step_size,
        max_cash=float(cfg.resolved_max_cash()),
    )


def _uniform_from_bits(bits):
    """random bits -> float32 uniform in [0, 1) with a 24-bit mantissa.
    Mosaic has no uint32->f32 cast, so shift logically as int32 (top 8 bits
    cleared => non-negative) and cast from int32."""
    as_int = pltpu.bitcast(bits, jnp.int32)
    top24 = jax.lax.shift_right_logical(as_int, 8)
    return top24.astype(jnp.float32) * (1.0 / (1 << 24))


def _as_quotes(p: AsEpisodeParams, inv, t, shape):
    """Closed-form AS quotes (BaselineAgents.py:52-83) or risk-neutral 1/k."""
    gamma, sigma, k, T = p.risk_aversion, p.volatility, p.fill_exponent, p.terminal_time
    if gamma > 0:
        const_half = (1.0 / gamma) * math.log(1.0 + gamma / k)
        tau = T - t
        skew = inv * (gamma * sigma * sigma) * tau
        half_spread = 0.5 * (gamma * sigma * sigma) * tau + const_half
        return skew + half_spread, -skew + half_spread
    const_half = 1.0 / k
    return jnp.full(shape, const_half), jnp.full(shape, const_half)


def _as_step(p: AsEpisodeParams, carry, t, draws):
    """One AS env step on VMEM-resident state; ``draws`` is a 5-tuple
    (arrival-bid u, arrival-ask u, fill-bid u, fill-ask u, midprice normal)
    — from the hardware PRNG in perf mode or injected arrays in test mode."""
    cash, inv, price = carry
    shape = cash.shape
    u_ab, u_aa, u_fb, u_fa, normal = draws
    k = p.fill_exponent
    bid_depth, ask_depth = _as_quotes(p, inv, t, shape)

    arr_bid = (u_ab < p.intensity_bid * p.dt).astype(jnp.float32)
    arr_ask = (u_aa < p.intensity_ask * p.dt).astype(jnp.float32)
    fill_bid = (u_fb < jnp.exp(-k * bid_depth)).astype(jnp.float32)
    fill_ask = (u_fa < jnp.exp(-k * ask_depth)).astype(jnp.float32)

    # Max-inventory fill masking (TradingEnvironment.py:323-327).
    fill_bid = fill_bid * (inv < p.max_inventory).astype(jnp.float32)
    fill_ask = fill_ask * (inv > -p.max_inventory).astype(jnp.float32)

    hit_bid = arr_bid * fill_bid
    hit_ask = arr_ask * fill_ask
    inv = inv + hit_bid - hit_ask
    cash = cash - hit_bid * (price - bid_depth) + hit_ask * (price + ask_depth)
    # env.step's post-bookkeeping clip (TradingEnvironment.py:283-297); the
    # fill masking above already bounds inventory, so only cash can bind.
    cash = jnp.clip(cash, -p.max_cash, p.max_cash)
    price = price + p.drift * p.dt + (p.volatility * math.sqrt(p.dt)) * normal
    return cash, inv, price, (bid_depth, ask_depth)


def _hw_draws(shape):
    """5 per-step draws from the hardware PRNG; the normal via Box-Muller."""
    def u():
        return _uniform_from_bits(pltpu.prng_random_bits(shape))

    u_ab, u_aa, u_fb, u_fa = u(), u(), u(), u()
    u1 = 1.0 - u()  # (0, 1] so log is finite
    u2 = u()
    normal = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos((2.0 * math.pi) * u2)
    return u_ab, u_aa, u_fb, u_fa, normal


def _as_init(p: AsEpisodeParams, shape):
    return (
        jnp.full(shape, p.initial_cash, jnp.float32),
        jnp.full(shape, p.initial_inventory, jnp.float32),
        jnp.full(shape, p.initial_price, jnp.float32),
    )


def _episode_kernel(p: AsEpisodeParams, seed_ref, cash_ref, inv_ref, price_ref):
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    shape = cash_ref.shape

    def body(i, carry):
        t = p.start_time + i.astype(jnp.float32) * p.dt
        cash, inv, price, _ = _as_step(p, carry, t, _hw_draws(shape))
        return cash, inv, price

    cash, inv, price = jax.lax.fori_loop(0, p.run_steps, body, _as_init(p, shape))
    cash_ref[:] = cash
    inv_ref[:] = inv
    price_ref[:] = price


def _episode_kernel_noise(
    p: AsEpisodeParams, noise_ref, cash_ref, inv_ref, price_ref
):
    """Noise-injected variant: ``noise_ref`` is (T, 5, rows, LANES) with the
    5 channels of ``_as_step``.  Runs under the Pallas interpreter on CPU,
    so CI asserts step-for-step parity with the XLA engine on the SAME
    noise (tests/test_pallas_episode.py) instead of skipping."""
    shape = cash_ref.shape

    def body(i, carry):
        t = p.start_time + i.astype(jnp.float32) * p.dt
        draws = tuple(noise_ref[i, c] for c in range(5))
        cash, inv, price, _ = _as_step(p, carry, t, draws)
        return cash, inv, price

    cash, inv, price = jax.lax.fori_loop(0, p.run_steps, body, _as_init(p, shape))
    cash_ref[:] = cash
    inv_ref[:] = inv
    price_ref[:] = price


@partial(jax.jit, static_argnames=("params", "num_trajectories", "rows", "interpret"))
def as_episode_pallas(
    params: AsEpisodeParams,
    seed,
    num_trajectories: int = 16384,
    rows: int = DEFAULT_ROWS,
    interpret: bool = False,
    noise=None,
):
    """Run one full episode for ``num_trajectories`` envs; returns terminal
    (cash, inventory, price), each ``(N,)``.

    ``num_trajectories`` must be a multiple of ``rows * 128``.
    ``interpret=True`` runs the Pallas interpreter (CPU-testable).
    ``noise`` (optional) injects the per-step draws instead of the hardware
    PRNG: shape (run_steps, 5, N) float32 with channels (arrival-bid u,
    arrival-ask u, fill-bid u, fill-ask u, midprice normal).
    """
    tile = rows * LANES
    assert num_trajectories % tile == 0, (num_trajectories, tile)
    grid = num_trajectories // tile
    out_shape = [jax.ShapeDtypeStruct((grid * rows, LANES), jnp.float32)] * 3
    out_specs = [
        pl.BlockSpec((rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ] * 3
    if noise is None:
        kernel = partial(_episode_kernel, params)
        seed_arr = jnp.asarray([seed], dtype=jnp.int32)
        cash, inv, price = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(seed_arr)
    else:
        T = params.run_steps
        noise = jnp.asarray(noise, jnp.float32).reshape(T, 5, grid * rows, LANES)
        kernel = partial(_episode_kernel_noise, params)
        cash, inv, price = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec((T, 5, rows, LANES), lambda i: (0, 0, i, 0))],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(noise)
    return cash.reshape(-1), inv.reshape(-1), price.reshape(-1)


class CjEpisodeParams(NamedTuple):
    """Scalars for the CJP market-making episode kernel.

    NOTE (measured on v5e): this kernel is statistically correct (t-test vs
    the analytic value function passes) but at 16k envs it runs ~115M
    env-steps/s versus ~437M for the general XLA engine with the same
    one-hot-matmul policy — XLA schedules the full-batch (N, 2Q+1) x
    (2Q+1, 2) contraction on the MXU better than the per-tile kernel.  Kept
    as a worked example of when NOT to hand-write a kernel; use the XLA path
    (`rollout` / `mc_episode_stats`) for CJP production runs."""

    n_steps: int
    dt: float
    drift: float
    volatility: float
    initial_price: float
    intensity_bid: float
    intensity_ask: float
    fill_exponent: float
    max_inventory: float  # fill-masking bound (env max_inventory)
    terminal_time: float
    phi: float  # per-step inventory aversion
    alpha: float  # terminal inventory aversion


def cj_params_from_config(cfg: EnvConfig) -> CjEpisodeParams:
    from mbt_gym_tpu.dynamics import LimitOrderDynamics
    from mbt_gym_tpu.processes.arrivals import PoissonArrivals
    from mbt_gym_tpu.processes.fills import ExponentialFill
    from mbt_gym_tpu.processes.midprice import BrownianMotionMidprice
    from mbt_gym_tpu.rewards import CjMmCriterion

    d = cfg.dynamics
    assert isinstance(d, LimitOrderDynamics) and d.action_dim == 2, (
        "pallas fast path: pure limit-order dynamics only (lam subclasses "
        "LimitOrderDynamics but adds market orders this kernel ignores)"
    )
    assert isinstance(d.midprice_model, BrownianMotionMidprice)
    assert isinstance(d.arrival_model, PoissonArrivals)
    assert isinstance(d.fill_probability_model, ExponentialFill)
    r = cfg.reward_function
    assert isinstance(r, CjMmCriterion) and r.inventory_exponent == 2.0
    assert not cfg.normalise_action_space and not cfg.normalise_observation_space
    assert cfg.initial_cash == 0.0 and cfg.initial_inventory == 0 and cfg.start_time == 0.0, (
        "pallas fast path assumes cash0=inv0=0 at t=0"
    )
    return CjEpisodeParams(
        n_steps=cfg.n_steps,
        dt=cfg.step_size,
        drift=d.midprice_model.drift,
        volatility=d.midprice_model.volatility,
        initial_price=d.midprice_model.initial_price,
        intensity_bid=d.arrival_model.intensity[0],
        intensity_ask=d.arrival_model.intensity[1],
        fill_exponent=d.fill_probability_model.fill_exponent,
        max_inventory=float(cfg.max_inventory),
        terminal_time=cfg.terminal_time,
        phi=r.per_step_inventory_aversion,
        alpha=r.terminal_inventory_aversion,
    )


def _cj_episode_kernel(p: CjEpisodeParams, q_cap: int, seed_ref, depth_ref, cash_ref, inv_ref, price_ref, sumq2_ref):
    """Whole CJP episode per env tile.  ``depth_ref`` is the precomputed
    (n_steps, 2*q_cap+1, 2) closed-form depth table (agents.baseline
    .CarteaJaimungalMmAgent.depth_table), resident in VMEM; per-step quotes
    are a one-hot MXU contraction against its time row."""
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    shape = cash_ref.shape
    rows = shape[0]
    size = 2 * q_cap + 1

    sqrt_dt_vol = p.volatility * math.sqrt(p.dt)
    p_bid = p.intensity_bid * p.dt
    p_ask = p.intensity_ask * p.dt
    k = p.fill_exponent

    def draw_uniform():
        return _uniform_from_bits(pltpu.prng_random_bits(shape))

    grid_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, size), 2)

    def body(i, carry):
        cash, inv, price, sumq2 = carry
        # quotes: one-hot over the inventory grid contracted with the step's
        # (size, 2) depth row (clipped index, BaselineAgents.py:128-130)
        row = depth_ref[i]  # (size, 2)
        idx = jnp.clip(inv + q_cap, 0, 2 * q_cap).astype(jnp.int32)
        onehot = (idx[..., None] == grid_iota).astype(jnp.float32)  # (rows, LANES, size)
        quotes = jax.lax.dot_general(
            onehot, row,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (rows, LANES, 2)
        bid_depth = quotes[:, :, 0]
        ask_depth = quotes[:, :, 1]

        arr_bid = (draw_uniform() < p_bid).astype(jnp.float32)
        arr_ask = (draw_uniform() < p_ask).astype(jnp.float32)
        fill_bid = (draw_uniform() < jnp.exp(-k * bid_depth)).astype(jnp.float32)
        fill_ask = (draw_uniform() < jnp.exp(-k * ask_depth)).astype(jnp.float32)
        fill_bid = fill_bid * (inv < p.max_inventory).astype(jnp.float32)
        fill_ask = fill_ask * (inv > -p.max_inventory).astype(jnp.float32)

        hit_bid = arr_bid * fill_bid
        hit_ask = arr_ask * fill_ask
        inv = inv + hit_bid - hit_ask
        cash = cash - hit_bid * (price - bid_depth) + hit_ask * (price + ask_depth)
        sumq2 = sumq2 + inv * inv  # post-update inventory (RewardFunctions.py:103)

        u1 = 1.0 - draw_uniform()
        u2 = draw_uniform()
        normal = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos((2.0 * math.pi) * u2)
        price = price + p.drift * p.dt + sqrt_dt_vol * normal
        return cash, inv, price, sumq2

    zeros = jnp.zeros(shape, jnp.float32)
    price0 = jnp.full(shape, p.initial_price, jnp.float32)
    cash, inv, price, sumq2 = jax.lax.fori_loop(0, p.n_steps, body, (zeros, zeros, price0, zeros))
    cash_ref[:] = cash
    inv_ref[:] = inv
    price_ref[:] = price
    sumq2_ref[:] = sumq2


@partial(jax.jit, static_argnames=("params", "q_cap", "num_trajectories", "rows", "interpret"))
def cj_episode_pallas(
    params: CjEpisodeParams,
    depth_table,
    seed,
    q_cap: int,
    num_trajectories: int = 16384,
    rows: int = DEFAULT_ROWS,
    interpret: bool = False,
):
    """Run one full CJP episode; returns terminal (cash, inventory, price,
    sum of q_t^2), each ``(N,)``.  ``depth_table`` is (n_steps, 2*q_cap+1, 2)
    float32 (pass ``agent.depth_table()[:-1]`` — rows indexed by step)."""
    tile = rows * LANES
    assert num_trajectories % tile == 0, (num_trajectories, tile)
    grid = num_trajectories // tile
    seed_arr = jnp.asarray([seed], dtype=jnp.int32)
    depth_table = jnp.asarray(depth_table, dtype=jnp.float32)
    out_shape = [jax.ShapeDtypeStruct((grid * rows, LANES), jnp.float32)] * 4
    kernel = partial(_cj_episode_kernel, params, q_cap)
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full depth table per program
        ],
        out_specs=[
            pl.BlockSpec((rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ]
        * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(seed_arr, depth_table)
    return tuple(o.reshape(-1) for o in outs)


def cj_episode_rewards_pallas(
    cfg: EnvConfig, agent, seed, num_trajectories: int = 16384, **kw
):
    """Total CjMm episode rewards from the kernel's terminal state: the PnL
    telescopes to terminal mark-to-market, the running penalty is
    ``phi*dt*sum q_t^2``, and the pathwise terminal term telescopes to
    ``alpha*(q_T^2 - q_0^2 + q_0^2)`` for start time 0 (RewardFunctions.py:96-109)."""
    p = cj_params_from_config(cfg)
    table = agent.depth_table()[:-1]
    q_cap = agent.max_inventory
    cash, inv, price, sumq2 = cj_episode_pallas(
        p, table, seed, q_cap, num_trajectories, **kw
    )
    pnl = cash + inv * price - 0.0
    return pnl - p.phi * p.dt * sumq2 - p.alpha * inv**2


def _episode_rows(n: int) -> int:
    """Largest row tile in (64..1) whose (rows, 128) env tiles divide N —
    lets the terminal-state kernels run at any batch that is a multiple of
    128 (the dispatch front door's eligibility floor)."""
    for r in (64, 32, 16, 8, 4, 2, 1):
        if n % (r * LANES) == 0:
            return r
    raise ValueError(
        f"num_trajectories={n} must be a multiple of {LANES} for the "
        f"episode kernels"
    )


def as_mc_episode_stats_pallas(
    cfg: EnvConfig, risk_aversion: float, key, episodes: int = 1, rows=None,
):
    """Drop-in throughput-mode counterpart of
    :func:`mbt_gym_tpu.rollout.mc_episode_stats` for the closed-form AS
    policy on the terminal-state episode kernel: the same summary dict
    without materializing trajectories.  mean_pnl/std_pnl come from the
    telescoped terminal mark-to-market; ``mean_spread`` is EXACT — the AS
    closed form's quoted spread is a deterministic function of time alone
    (the inventory skew cancels in bid + ask), so the step-average is
    computed in closed form on the host.  Hardware-PRNG only (TPU)."""
    import numpy as np

    p = params_from_config(cfg, risk_aversion=risk_aversion)
    n = cfg.num_trajectories
    rows = rows if rows is not None else _episode_rows(n)
    seed0 = jax.random.randint(key, (), 0, 2**30, dtype=jnp.int32)
    initial_value = p.initial_cash + p.initial_inventory * p.initial_price

    def one(carry, s):
        cash, inv, price = as_episode_pallas(p, s, n, rows=rows)
        pnl = cash + inv * price - initial_value
        return carry + jnp.stack(
            [pnl.mean(), (pnl**2).mean(), inv.mean(), (inv**2).mean()]
        ), None

    total, _ = jax.lax.scan(
        one, jnp.zeros((4,), jnp.float32),
        seed0 + jnp.arange(episodes, dtype=jnp.int32),
    )
    mean_r, mean_r2, mean_q, mean_q2 = total / episodes
    times = p.start_time + np.arange(p.run_steps) * p.dt
    if risk_aversion > 0:
        g, s2, k = risk_aversion, p.volatility**2, p.fill_exponent
        spread = g * s2 * (p.terminal_time - times) + (2.0 / g) * np.log1p(g / k)
    else:
        spread = np.full(p.run_steps, 2.0 / p.fill_exponent)
    return {
        "mean_pnl": mean_r,
        "std_pnl": jnp.sqrt(jnp.maximum(mean_r2 - mean_r**2, 0.0)),
        "mean_terminal_inventory": mean_q,
        "std_terminal_inventory": jnp.sqrt(jnp.maximum(mean_q2 - mean_q**2, 0.0)),
        "mean_spread": jnp.asarray(float(np.mean(spread)), jnp.float32),
        "episodes": episodes * n,
    }


def oe_mc_episode_stats_pallas(
    cfg: EnvConfig, agent, key, episodes: int = 1, rows=None,
):
    """Throughput-mode :func:`mbt_gym_tpu.rollout.mc_episode_stats`
    counterpart for the closed-form CJ-OE schedule on the OE episode
    kernel.  ``mean_spread`` is NaN — speed dynamics have a 1-column
    action, matching the engine path's ``action_dim < 2`` convention.
    Hardware-PRNG only (TPU)."""
    p = oe_params_from_config(cfg)
    table = oe_speed_table(cfg, agent)
    n = cfg.num_trajectories
    rows = rows if rows is not None else _episode_rows(n)
    seed0 = jax.random.randint(key, (), 0, 2**30, dtype=jnp.int32)

    def one(carry, s):
        cash, inv, price, _, sumq2, sum_sq = oe_episode_pallas(
            p, table, s, n, rows=rows
        )
        r = oe_rewards_from_terminal(p, cash, inv, price, sumq2, sum_sq)
        return carry + jnp.stack(
            [r.mean(), (r**2).mean(), inv.mean(), (inv**2).mean()]
        ), None

    total, _ = jax.lax.scan(
        one, jnp.zeros((4,), jnp.float32),
        seed0 + jnp.arange(episodes, dtype=jnp.int32),
    )
    mean_r, mean_r2, mean_q, mean_q2 = total / episodes
    return {
        "mean_pnl": mean_r,
        "std_pnl": jnp.sqrt(jnp.maximum(mean_r2 - mean_r**2, 0.0)),
        "mean_terminal_inventory": mean_q,
        "std_terminal_inventory": jnp.sqrt(jnp.maximum(mean_q2 - mean_q**2, 0.0)),
        "mean_spread": jnp.asarray(jnp.nan, jnp.float32),
        "episodes": episodes * n,
    }


def episode_stats_pallas(params: AsEpisodeParams, seed, num_trajectories: int = 16384, **kw):
    """Terminal-state summary stats (PnL telescopes: total reward = terminal
    mark-to-market minus initial)."""
    cash, inv, price = as_episode_pallas(params, seed, num_trajectories, **kw)
    initial_value = params.initial_cash + params.initial_inventory * params.initial_price
    pnl = cash + inv * price - initial_value
    return {
        "mean_pnl": pnl.mean(),
        "std_pnl": pnl.std(),
        "mean_terminal_inventory": inv.mean(),
        "std_terminal_inventory": inv.std(),
    }


# ------------------------------------------------------------------
# Optimal-execution (speed-dynamics) episode kernel — the second
# Pallas-eligible suite config (BASELINE.json config #3).  Pure
# elementwise state updates + one normal draw per step, so it wins like
# the AS kernel.  The policy is any deterministic time-only speed
# schedule, passed as a per-step table (covers the CJ-OE closed form).
# ------------------------------------------------------------------
class OeEpisodeParams(NamedTuple):
    """Scalars for the optimal-execution episode kernel (TradingWithSpeed
    dynamics, ModelDynamics.py:243-275 + TemporaryAndPermanentPriceImpact,
    price_impact_models.py:64-96 + CjOeCriterion, RewardFunctions.py:39-74)."""

    n_steps: int
    dt: float
    drift: float
    volatility: float
    initial_price: float
    temporary_impact: float
    permanent_impact: float
    terminal_time: float
    phi: float  # per-step inventory aversion
    alpha: float  # terminal aversion (spread pathwise over steps)
    initial_cash: float = 0.0
    initial_inventory: float = 0.0
    start_time: float = 0.0
    max_inventory: float = math.inf  # env.step's clip bounds (rarely bind)
    max_cash: float = math.inf

    @property
    def run_steps(self) -> int:
        return self.n_steps - round(self.start_time / self.dt)


def oe_params_from_config(cfg: EnvConfig) -> OeEpisodeParams:
    from mbt_gym_tpu.dynamics import TradingWithSpeedDynamics
    from mbt_gym_tpu.processes.impact import TemporaryAndPermanentImpact
    from mbt_gym_tpu.processes.midprice import BrownianMotionMidprice
    from mbt_gym_tpu.rewards import CjOeCriterion

    d = cfg.dynamics
    assert isinstance(d, TradingWithSpeedDynamics), "OE kernel: speed dynamics only"
    assert isinstance(d.midprice_model, BrownianMotionMidprice)
    assert isinstance(d.price_impact_model, TemporaryAndPermanentImpact)
    r = cfg.reward_function
    assert isinstance(r, CjOeCriterion) and r.inventory_exponent == 2.0
    assert not cfg.normalise_action_space and not cfg.normalise_observation_space
    assert not isinstance(cfg.initial_inventory, tuple) and not callable(cfg.initial_inventory)
    assert not isinstance(cfg.start_time, tuple) and not callable(cfg.start_time)
    assert cfg.dtype == "float32", (
        "the OE episode kernel computes in float32; float64 reference-"
        "parity configs must use the XLA rollout"
    )
    assert cfg.reward_scaling is None, (
        "reward_scaling is an XLA-engine feature; the kernel's telescoped "
        "reward assumes unscaled rewards"
    )
    return OeEpisodeParams(
        n_steps=cfg.n_steps,
        dt=cfg.step_size,
        drift=d.midprice_model.drift,
        volatility=d.midprice_model.volatility,
        initial_price=d.midprice_model.initial_price,
        temporary_impact=d.price_impact_model.temporary_impact_coefficient,
        permanent_impact=d.price_impact_model.permanent_impact_coefficient,
        terminal_time=cfg.terminal_time,
        phi=r.per_step_inventory_aversion,
        alpha=r.terminal_inventory_aversion,
        initial_cash=float(cfg.initial_cash),
        initial_inventory=float(cfg.initial_inventory),
        start_time=round(float(cfg.start_time) / cfg.step_size) * cfg.step_size,
        max_inventory=float(cfg.max_inventory),
        max_cash=float(cfg.resolved_max_cash()),
    )


def _oe_step(p: OeEpisodeParams, carry, speed, normal):
    """One speed-dynamics step: execute at ``mid + temp*speed + perm_state``
    against the PRE-update midprice/impact (env.step order,
    ModelDynamics.py:262-267), then advance price and permanent impact."""
    cash, inv, price, perm, sumq2, sum_sq = carry
    exec_price = price + p.temporary_impact * speed + perm
    cash = cash - speed * p.dt * exec_price
    sum_sq = sum_sq + speed * inv  # speed * PRE-step inventory (CjOe term)
    inv = inv + speed * p.dt
    # env.step's post-bookkeeping clip (TradingEnvironment.py:283-297).
    inv = jnp.clip(inv, -p.max_inventory, p.max_inventory)
    cash = jnp.clip(cash, -p.max_cash, p.max_cash)
    sumq2 = sumq2 + inv * inv  # post-update inventory (RewardFunctions.py:55-70)
    perm = perm + p.permanent_impact * speed * p.dt
    price = price + p.drift * p.dt + (p.volatility * math.sqrt(p.dt)) * normal
    return cash, inv, price, perm, sumq2, sum_sq


def _oe_init(p: OeEpisodeParams, shape):
    zeros = jnp.zeros(shape, jnp.float32)
    return (
        jnp.full(shape, p.initial_cash, jnp.float32),
        jnp.full(shape, p.initial_inventory, jnp.float32),
        jnp.full(shape, p.initial_price, jnp.float32),
        zeros, zeros, zeros,
    )


def _oe_episode_kernel(p: OeEpisodeParams, seed_ref, speed_ref, *out_refs):
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    shape = out_refs[0].shape

    def body(i, carry):
        speed = speed_ref[i]
        u1 = 1.0 - _uniform_from_bits(pltpu.prng_random_bits(shape))
        u2 = _uniform_from_bits(pltpu.prng_random_bits(shape))
        normal = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos((2.0 * math.pi) * u2)
        return _oe_step(p, carry, speed, normal)

    # Mosaic layout fix (found by the round-3 hardware run of
    # test_oe_pallas_episode_hardware_stats): splat-initialized carries are
    # inferred as REPLICATED vregs, but `price` (and through it `cash`)
    # becomes lane-varying after the first noise draw, and Mosaic cannot
    # relayout non-replicated -> replicated at the fori_loop boundary
    # ("Invalid relayout ... replicated in destination but not in source").
    # A runtime-random jitter ~1e-42 (absorbed to exact equality by the
    # first f32 add with any normal-scale operand, so results are
    # unchanged) makes every carry lane-varying — concrete, consistent
    # layouts from iteration 0.  Interpret mode has no layouts; the
    # injected-noise kernel variant keeps the unjittered init.
    jitter = _uniform_from_bits(pltpu.prng_random_bits(shape)) * 1e-42
    init = tuple(x + jitter for x in _oe_init(p, shape))
    final = jax.lax.fori_loop(0, p.run_steps, body, init)
    for ref, val in zip(out_refs, final):
        ref[:] = val


def _oe_episode_kernel_noise(p: OeEpisodeParams, speed_ref, noise_ref, *out_refs):
    """Noise-injected variant (CI parity vs the XLA engine): ``noise_ref``
    is (T, rows, LANES) midprice normals."""
    shape = out_refs[0].shape

    def body(i, carry):
        return _oe_step(p, carry, speed_ref[i], noise_ref[i])

    final = jax.lax.fori_loop(0, p.run_steps, body, _oe_init(p, shape))
    for ref, val in zip(out_refs, final):
        ref[:] = val


@partial(jax.jit, static_argnames=("params", "num_trajectories", "rows", "interpret"))
def oe_episode_pallas(
    params: OeEpisodeParams,
    speed_table,
    seed,
    num_trajectories: int = 8192,
    rows: int = DEFAULT_ROWS,
    interpret: bool = False,
    noise=None,
):
    """Whole OE episode; returns terminal (cash, inventory, price,
    permanent_impact, sum q_t^2, sum speed_t*q_{t-1}), each (N,).

    ``speed_table`` is (run_steps,) float32 — the signed trading speed per
    step (e.g. the CJ-OE closed form evaluated on the time grid).  ``noise``
    (optional) injects the per-step midprice normals, shape (run_steps, N)."""
    tile = rows * LANES
    assert num_trajectories % tile == 0, (num_trajectories, tile)
    grid = num_trajectories // tile
    T = params.run_steps
    speed_table = jnp.asarray(speed_table, jnp.float32)
    assert speed_table.shape == (T,), (speed_table.shape, T)
    out_shape = [jax.ShapeDtypeStruct((grid * rows, LANES), jnp.float32)] * 6
    out_specs = [
        pl.BlockSpec((rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ] * 6
    if noise is None:
        seed_arr = jnp.asarray([seed], dtype=jnp.int32)
        outs = pl.pallas_call(
            partial(_oe_episode_kernel, params),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(seed_arr, speed_table)
    else:
        noise = jnp.asarray(noise, jnp.float32).reshape(T, grid * rows, LANES)
        outs = pl.pallas_call(
            partial(_oe_episode_kernel_noise, params),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((T, rows, LANES), lambda i: (0, i, 0)),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(speed_table, noise)
    return tuple(o.reshape(-1) for o in outs)


def oe_speed_table(cfg: EnvConfig, agent) -> "jnp.ndarray":
    """The CJ-OE closed-form speed schedule evaluated on the step grid —
    (run_steps,) rows indexed FROM the (quantised) start time, the OE
    episode kernel's convention.  Delegates to the shared time-only-policy
    evaluator (``pallas_rollout.schedule_table_from_policy``, full-horizon
    rows indexed from 0 — the schedule kernel's ``t_off`` convention) so
    the two lanes cannot drift (review finding, round 5)."""
    from mbt_gym_tpu.ops.pallas_rollout import schedule_table_from_policy

    p = oe_params_from_config(cfg)
    full = schedule_table_from_policy(cfg, agent.policy())  # (n_steps, 1)
    start_steps = p.n_steps - p.run_steps
    return full[start_steps:, 0]


def oe_rewards_from_terminal(p: OeEpisodeParams, cash, inv, price, sumq2, sum_sq):
    """Total CjOe episode reward from the OE kernel's terminal state: the
    PnL telescopes to terminal-minus-initial mark-to-market; the running
    penalty is ``phi*dt*sum q_t^2``; the pathwise terminal-aversion term is
    ``alpha*dt*(2*sum speed_t*q_{t-1} + run_steps*q0^2*T_ep)``
    (RewardFunctions.py:55-70 with inventory exponent 2).  THE identity —
    shared by the rewards and mc-stats lanes so they cannot drift."""
    initial_value = p.initial_cash + p.initial_inventory * p.initial_price
    pnl = cash + inv * price - initial_value
    episode_length = p.terminal_time - p.start_time
    const = p.run_steps * (p.initial_inventory**2) * episode_length
    return pnl - p.phi * p.dt * sumq2 - p.alpha * p.dt * (2.0 * sum_sq + const)


def oe_episode_rewards_pallas(cfg: EnvConfig, agent, seed, num_trajectories: int = 8192, **kw):
    """Total CjOe episode rewards for the closed-form schedule (see
    :func:`oe_rewards_from_terminal` for the identity)."""
    p = oe_params_from_config(cfg)
    table = oe_speed_table(cfg, agent)
    cash, inv, price, perm, sumq2, sum_sq = oe_episode_pallas(
        p, table, seed, num_trajectories, **kw
    )
    return oe_rewards_from_terminal(p, cash, inv, price, sumq2, sum_sq)


# ------------------------------------------------------------------
# Trajectory-producing variant: semantics-equivalent to rollout() for the
# AS config — every per-step quantity (cash, inventory, price, quotes) is
# streamed to output blocks, so downstream consumers (analytics, learners)
# get full trajectories, not just terminal state.
# ------------------------------------------------------------------
TRAJ_ROWS = 16  # 3 x (T, 16, 128) f32 blocks x2 (double buffering) stay under VMEM


def _traj_episode_kernel(
    p: AsEpisodeParams, seed_ref,
    cash_ref, inv_ref, price_ref,
):
    """Whole episode per env tile, writing the post-step state of every step
    to (T, rows, LANES) VMEM output blocks.  Quotes are NOT streamed — the
    closed-form AS action is a deterministic function of (pre-step
    inventory, time), so the wrapper recomputes them exactly from the
    shifted inventory stream, freeing VMEM for wider tiles."""
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    shape = cash_ref.shape[1:]  # (rows, LANES)

    def body(i, carry):
        t = p.start_time + i.astype(jnp.float32) * p.dt
        cash, inv, price, _ = _as_step(p, carry, t, _hw_draws(shape))
        cash_ref[i] = cash
        inv_ref[i] = inv
        price_ref[i] = price
        return cash, inv, price

    jax.lax.fori_loop(0, p.run_steps, body, _as_init(p, shape))


def _traj_episode_kernel_full(
    p: AsEpisodeParams, seed_ref,
    cash_ref, inv_ref, price_ref, rew_ref, bid_ref, ask_ref,
):
    """``emit="full"`` variant (round 5, VERDICT r4 item 3): also streams
    the per-step PnL REWARD (mark-to-market delta, computed on the
    VMEM-resident state — one multiply-add per step) and the closed-form
    ACTIONS (_as_step already evaluates the quotes; previously dropped).
    The XLA trajectory consumer then does pure layout work — no reward
    diff pass, no action recompute over (T, N) HBM arrays."""
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    shape = cash_ref.shape[1:]  # (rows, LANES)
    init = _as_init(p, shape)
    value0 = init[0] + init[1] * init[2]

    def body(i, carry):
        (cash, inv, price), prev_value = carry[:3], carry[3]
        t = p.start_time + i.astype(jnp.float32) * p.dt
        cash, inv, price, (bid, ask) = _as_step(
            p, (cash, inv, price), t, _hw_draws(shape)
        )
        value = cash + inv * price
        cash_ref[i] = cash
        inv_ref[i] = inv
        price_ref[i] = price
        rew_ref[i] = value - prev_value
        bid_ref[i] = bid
        ask_ref[i] = ask
        return cash, inv, price, value

    jax.lax.fori_loop(0, p.run_steps, body, init + (value0,))


def _traj_episode_kernel_chunked(
    p: AsEpisodeParams, t_chunk: int, seed_ref,
    cash_ref, inv_ref, price_ref, c_scr, i_scr, p_scr,
):
    """Time-chunked trajectory streaming (round 4): 2D grid = (env tiles,
    T chunks) with the env-state carry in VMEM scratch across the chunk
    dimension (the standard Pallas accumulate-over-grid pattern;
    dimension_semantics ("parallel", "arbitrary") keeps a tile's chunks
    consecutive on one core).  Output blocks are (t_chunk, rows, LANES)
    regardless of the horizon, so ROW tiles STAY WIDE at any batch/T —
    the TRAJ_ROWS=16 fallback's 2x-buffered full-T blocks were the
    large-batch throughput cliff (4.6B at 1M lanes, BENCH_NOTES round 4).

    PRNG: seeded per (env tile, chunk) — a different (still independent
    per lane) stream than the 1D kernels'; streams are an implementation
    detail, the AS ground-truth stats are the contract.  Mosaic caps
    prng_seed at TWO components, so (tile, chunk) packs into one."""
    j = pl.program_id(1)
    pltpu.prng_seed(seed_ref[0], pl.program_id(0) * pl.num_programs(1) + j)
    shape = cash_ref.shape[1:]  # (rows, LANES)

    @pl.when(j == 0)
    def _():
        c0, i0, p0 = _as_init(p, shape)
        c_scr[...] = c0
        i_scr[...] = i0
        p_scr[...] = p0

    def body(i, carry):
        g = j * t_chunk + i
        t = p.start_time + g.astype(jnp.float32) * p.dt
        cash, inv, price, _ = _as_step(p, carry, t, _hw_draws(shape))
        cash_ref[i] = cash
        inv_ref[i] = inv
        price_ref[i] = price
        return cash, inv, price

    cash, inv, price = jax.lax.fori_loop(
        0, t_chunk, body, (c_scr[...], i_scr[...], p_scr[...])
    )
    c_scr[...] = cash
    i_scr[...] = inv
    p_scr[...] = price


def _traj_episode_kernel_chunked_full(
    p: AsEpisodeParams, t_chunk: int, seed_ref,
    cash_ref, inv_ref, price_ref, rew_ref, bid_ref, ask_ref,
    c_scr, i_scr, p_scr, v_scr,
):
    """Time-chunked ``emit="full"`` variant: the 6-stream kernel with the
    state carry (+ previous mark-to-market value for the reward delta) in
    VMEM scratch across the chunk grid dimension — same structure as
    :func:`_traj_episode_kernel_chunked`."""
    j = pl.program_id(1)
    pltpu.prng_seed(seed_ref[0], pl.program_id(0) * pl.num_programs(1) + j)
    shape = cash_ref.shape[1:]  # (rows, LANES)

    @pl.when(j == 0)
    def _():
        c0, i0, p0 = _as_init(p, shape)
        c_scr[...] = c0
        i_scr[...] = i0
        p_scr[...] = p0
        v_scr[...] = c0 + i0 * p0

    def body(i, carry):
        (cash, inv, price), prev_value = carry[:3], carry[3]
        g = j * t_chunk + i
        t = p.start_time + g.astype(jnp.float32) * p.dt
        cash, inv, price, (bid, ask) = _as_step(
            p, (cash, inv, price), t, _hw_draws(shape)
        )
        value = cash + inv * price
        cash_ref[i] = cash
        inv_ref[i] = inv
        price_ref[i] = price
        rew_ref[i] = value - prev_value
        bid_ref[i] = bid
        ask_ref[i] = ask
        return cash, inv, price, value

    cash, inv, price, value = jax.lax.fori_loop(
        0, t_chunk, body, (c_scr[...], i_scr[...], p_scr[...], v_scr[...])
    )
    c_scr[...] = cash
    i_scr[...] = inv
    p_scr[...] = price
    v_scr[...] = value


CONTAINER_PLANES = 7  # cash, inventory, time, price, bid, ask, reward


def _traj_episode_kernel_container(p: AsEpisodeParams, seed_ref, out_ref):
    """``emit="container"`` (round 5): ONE (7, T, rows, LANES) output block
    holding every per-step trajectory plane (CONTAINER_PLANES order) —
    written kernel-direct, so a materialized full trajectory costs exactly
    its own HBM bytes: zero XLA assembly ops, zero extra copies (XLA
    stacks of the stream outputs measured ~380 GB/s and OOM at 1M lanes;
    BENCH_NOTES round 5)."""
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    shape = out_ref.shape[2:]  # (rows, LANES)
    init = _as_init(p, shape)
    value0 = init[0] + init[1] * init[2]

    def body(i, carry):
        (cash, inv, price), prev_value = carry[:3], carry[3]
        t = p.start_time + i.astype(jnp.float32) * p.dt
        cash, inv, price, (bid, ask) = _as_step(
            p, (cash, inv, price), t, _hw_draws(shape)
        )
        value = cash + inv * price
        out_ref[0, i] = cash
        out_ref[1, i] = inv
        out_ref[2, i] = jnp.full(shape, 0.0, jnp.float32) + (t + p.dt)
        out_ref[3, i] = price
        out_ref[4, i] = bid
        out_ref[5, i] = ask
        out_ref[6, i] = value - prev_value
        return cash, inv, price, value

    jax.lax.fori_loop(0, p.run_steps, body, init + (value0,))


def _traj_episode_kernel_chunked_container(
    p: AsEpisodeParams, t_chunk: int, seed_ref, out_ref,
    c_scr, i_scr, p_scr, v_scr,
):
    """Time-chunked container variant (2D grid, state carry in scratch)."""
    j = pl.program_id(1)
    pltpu.prng_seed(seed_ref[0], pl.program_id(0) * pl.num_programs(1) + j)
    shape = out_ref.shape[2:]

    @pl.when(j == 0)
    def _():
        c0, i0, p0 = _as_init(p, shape)
        c_scr[...] = c0
        i_scr[...] = i0
        p_scr[...] = p0
        v_scr[...] = c0 + i0 * p0

    def body(i, carry):
        (cash, inv, price), prev_value = carry[:3], carry[3]
        g = j * t_chunk + i
        t = p.start_time + g.astype(jnp.float32) * p.dt
        cash, inv, price, (bid, ask) = _as_step(
            p, (cash, inv, price), t, _hw_draws(shape)
        )
        value = cash + inv * price
        out_ref[0, i] = cash
        out_ref[1, i] = inv
        out_ref[2, i] = jnp.full(shape, 0.0, jnp.float32) + (t + p.dt)
        out_ref[3, i] = price
        out_ref[4, i] = bid
        out_ref[5, i] = ask
        out_ref[6, i] = value - prev_value
        return cash, inv, price, value

    cash, inv, price, value = jax.lax.fori_loop(
        0, t_chunk, body, (c_scr[...], i_scr[...], p_scr[...], v_scr[...])
    )
    c_scr[...] = cash
    i_scr[...] = inv
    p_scr[...] = price
    v_scr[...] = value


def _traj_chunk_plan(run_steps: int, num_trajectories: int, n_streams: int = 3):
    """(rows, t_chunk) for the chunked kernel: the widest row tile (<=128)
    dividing the batch, then the largest T divisor whose double-buffered
    (t_chunk, rows, LANES) f32 output blocks x ``n_streams`` stay under
    ~10 MB."""
    if num_trajectories % LANES:
        # ADVICE r4: surface the batch-shape precondition here instead of
        # the bare grid-divisibility assert downstream.
        raise ValueError(
            f"as_episode_trajectories_pallas: num_trajectories="
            f"{num_trajectories} must be a multiple of {LANES} (lane "
            f"width); pad the batch or pass rows= explicitly"
        )
    rows = 128
    while rows > 1 and num_trajectories % (rows * LANES):
        rows //= 2
    budget = 10 * 1024 * 1024
    per_step = rows * LANES * 4 * n_streams * 2
    t_cap = max(1, budget // per_step)
    t_chunk = 1
    for d in range(1, run_steps + 1):
        if run_steps % d == 0 and d <= t_cap:
            t_chunk = d
    return rows, t_chunk


@partial(jax.jit, static_argnames=("params", "num_trajectories", "rows", "interpret", "emit"))
def as_episode_trajectories_pallas(
    params: AsEpisodeParams,
    seed,
    num_trajectories: int = 16384,
    rows: int | None = None,
    interpret: bool = False,
    emit: str = "state",
):
    """Full AS episode with trajectory streams: returns post-step
    (cash, inventory, price) each (T, N) — or, with ``emit="full"``
    (round 5), six streams (cash, inventory, price, reward, bid, ask):
    the per-step PnL reward and the closed-form quotes computed inside the
    kernel on VMEM-resident state, so trajectory materialization
    (:func:`as_trajectory_from_pallas_full`) is pure layout work.
    ``emit="container"`` goes one further: ONE kernel-direct
    ``(7, T, N)`` buffer holding every per-step plane (cash, inventory,
    time, price, bid, ask, reward) — the zero-XLA-ops materialized full
    trajectory (:func:`trajectory_planes_view`); works at 1M lanes where
    XLA-assembled containers OOM (BENCH_NOTES round 5).

    Per-step actions, PnL rewards, and the (T+1, N, 4) observation matrix
    are exact functions of these streams plus the known initial state — see
    :func:`as_trajectory_from_pallas`.

    ``rows=None`` auto-selects: a SINGLE grid program owning all envs
    (rows = N/128) when the output streams fit the measured grid=1
    envelope — with one program Mosaic streams the stores without
    double-buffered output blocks, measured 4.96B vs 4.51B env-steps/s at
    the headline 16k-env/T=200 shape (round 3; multi-program rows 32/64
    FAIL to compile at T=200, their 2x-buffered (T, rows, 128) blocks
    exceeding VMEM).  Batches past the envelope use the TIME-CHUNKED 2D
    grid (round 4, :func:`_traj_episode_kernel_chunked`): output blocks
    are (t_chunk, rows, LANES) with the state carry in VMEM scratch, so
    row tiles stay at 128 at any batch.  Raw-stream throughput is now
    FLAT in batch: 11.9B env-steps/s at 1M lanes vs 11.7B at the 16k
    grid=1 point (the 16-row fallback measured 10.5B raw; the remaining
    large-batch gap in end-to-end Trajectory numbers is the XLA assembly
    consumer — obs stacking / reward diffs over (T, N) arrays — not the
    kernel; BENCH_NOTES round 4).

    NOTE (ADVICE r3): the ``run_steps * rows`` envelope extrapolates the
    (T=200, rows=128) hardware-proven point to other (T, rows) products —
    e.g. T=50/rows=512 compiles under the same VMEM budget model but was
    not individually measured; if a shape in the envelope fails to
    compile, pass ``rows=TRAJ_ROWS`` explicitly (the 1D proven tiling)."""
    assert emit in ("state", "full", "container"), emit
    n_streams = {"state": 3, "full": 6, "container": CONTAINER_PLANES}[emit]
    container = emit == "container"
    T = params.run_steps
    seed_arr = jnp.asarray([seed], dtype=jnp.int32)
    chunked = False
    if rows is None:
        one_shot = num_trajectories // LANES
        # proven one-shot envelope (T=200, rows=128, 3 streams); the
        # 6/7-plane modes scale it down by their output-block footprint
        # under the same VMEM budget model
        envelope = (200 * 128 * 3) // n_streams
        if (
            num_trajectories % LANES == 0
            and params.run_steps * one_shot <= envelope
        ):
            rows = one_shot
        else:
            rows, t_chunk = _traj_chunk_plan(T, num_trajectories, n_streams)
            chunked = True
    if chunked:
        tile = rows * LANES
        assert num_trajectories % tile == 0, (num_trajectories, tile)
        grid = (num_trajectories // tile, T // t_chunk)
        if container:
            out_shape = jax.ShapeDtypeStruct(
                (CONTAINER_PLANES, T, grid[0] * rows, LANES), jnp.float32
            )
            out_specs = pl.BlockSpec(
                (CONTAINER_PLANES, t_chunk, rows, LANES),
                lambda i, j: (0, j, i, 0), memory_space=pltpu.VMEM,
            )
            kernel = partial(
                _traj_episode_kernel_chunked_container, params, t_chunk
            )
            n_scratch = 4
        else:
            out_shape = [
                jax.ShapeDtypeStruct((T, grid[0] * rows, LANES), jnp.float32)
            ] * n_streams
            out_specs = [
                pl.BlockSpec(
                    (t_chunk, rows, LANES), lambda i, j: (j, i, 0),
                    memory_space=pltpu.VMEM,
                )
            ] * n_streams
            if emit == "state":
                kernel = partial(_traj_episode_kernel_chunked, params, t_chunk)
                n_scratch = 3
            else:
                kernel = partial(
                    _traj_episode_kernel_chunked_full, params, t_chunk
                )
                n_scratch = 4  # + previous mark-to-market value
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((rows, LANES), jnp.float32)] * n_scratch,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")
            ),
            interpret=interpret,
        )(seed_arr)
        if container:
            return outs.reshape(CONTAINER_PLANES, T, -1)
        return tuple(o.reshape(T, -1) for o in outs)
    tile = rows * LANES
    assert num_trajectories % tile == 0, (num_trajectories, tile)
    grid = num_trajectories // tile
    if container:
        out_shape = jax.ShapeDtypeStruct(
            (CONTAINER_PLANES, T, grid * rows, LANES), jnp.float32
        )
        out_specs = pl.BlockSpec(
            (CONTAINER_PLANES, T, rows, LANES), lambda i: (0, 0, i, 0),
            memory_space=pltpu.VMEM,
        )
        kernel = partial(_traj_episode_kernel_container, params)
    else:
        out_shape = [
            jax.ShapeDtypeStruct((T, grid * rows, LANES), jnp.float32)
        ] * n_streams
        out_specs = [
            pl.BlockSpec((T, rows, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
        ] * n_streams
        kernel = partial(
            _traj_episode_kernel if emit == "state" else _traj_episode_kernel_full,
            params,
        )
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(seed_arr)
    if container:
        return outs.reshape(CONTAINER_PLANES, T, -1)
    return tuple(o.reshape(T, -1) for o in outs)


def as_trajectory_from_pallas_full(params: AsEpisodeParams, streams):
    """Assemble a :class:`mbt_gym_tpu.types.Trajectory` from the
    ``emit="full"`` six-stream kernel output — PURE LAYOUT work: the
    rewards and actions arrive kernel-computed, so the only XLA ops are
    the initial-row concat, the deterministic time plane, and the
    obs/action stacks (round 5, VERDICT r4 item 3)."""
    from mbt_gym_tpu.types import Trajectory

    cash, inv, price, reward, bid, ask = streams
    T, n = cash.shape
    cash_full = jnp.concatenate(
        [jnp.full((1, n), params.initial_cash, cash.dtype), cash], axis=0
    )
    inv_full = jnp.concatenate(
        [jnp.full((1, n), params.initial_inventory, cash.dtype), inv], axis=0
    )
    price_full = jnp.concatenate(
        [jnp.full((1, n), params.initial_price), price], axis=0
    )
    times = jnp.broadcast_to(
        (params.start_time + jnp.arange(T + 1, dtype=cash.dtype) * params.dt)[:, None],
        (T + 1, n),
    )
    obs = jnp.stack([cash_full, inv_full, times, price_full], axis=2)
    actions = jnp.stack([bid, ask], axis=2)
    return Trajectory(observations=obs, actions=actions, rewards=reward)


def trajectory_planes_view(data):
    """Named views into the ``emit="container"`` buffer ``data (7, T, N)``.

    Returns a dict of DEVICE VIEWS — consumed inside a jit they fuse for
    free; sliced standalone each costs one copy of just that plane.  The
    post-step convention matches the state streams: row t is the state
    AFTER step t (obs row t+1 of the (T+1)-row time-major Trajectory; the
    t=0 observation is the config's known initial state, available from
    the :class:`AsEpisodeParams` the kernel ran with)."""
    return {
        "cash": data[0], "inventory": data[1], "time": data[2],
        "price": data[3], "bid": data[4], "ask": data[5], "reward": data[6],
    }


def as_trajectory_t_from_pallas(params: AsEpisodeParams, streams):
    """Assemble the feature-major :class:`mbt_gym_tpu.types.TrajectoryT`
    from the ``emit="full"`` streams — the large-batch materialization
    path (round 5): minor dims stay (time, envs), so the assembly is one
    pad-free copy pass and the result crosses jit boundaries at stream
    rate (BENCH_NOTES round 5; the time-major :class:`Trajectory` pads
    32x as a jit output and cannot exist at 1M lanes)."""
    from mbt_gym_tpu.types import TrajectoryT

    cash, inv, price, reward, bid, ask = streams
    T, n = cash.shape

    def with_init(x, v0):
        return jnp.concatenate([jnp.full((1, n), v0, x.dtype), x], axis=0)

    times = jnp.broadcast_to(
        (params.start_time + jnp.arange(T + 1, dtype=cash.dtype) * params.dt)[:, None],
        (T + 1, n),
    )
    obs_t = jnp.stack(
        [
            with_init(cash, params.initial_cash),
            with_init(inv, params.initial_inventory),
            times,
            with_init(price, params.initial_price),
        ],
        axis=0,
    )  # (S, T+1, N)
    actions_t = jnp.stack([bid, ask], axis=0)  # (A, T, N)
    return TrajectoryT(observations_t=obs_t, actions_t=actions_t, rewards=reward)


def as_trajectory_from_pallas(params: AsEpisodeParams, cash, inv, price):
    """Assemble a :class:`mbt_gym_tpu.types.Trajectory` (obs (T+1, N, 4),
    actions (T, N, 2), rewards (T, N)) from the kernel's state streams.
    Actions are recomputed exactly from the closed form on the *pre-step*
    inventory (the shifted stream) and the time grid."""
    from mbt_gym_tpu.types import Trajectory

    T, n = cash.shape
    cash_full = jnp.concatenate([jnp.full((1, n), params.initial_cash, cash.dtype), cash], axis=0)
    inv_full = jnp.concatenate([jnp.full((1, n), params.initial_inventory, cash.dtype), inv], axis=0)
    price_full = jnp.concatenate([jnp.full((1, n), params.initial_price), price], axis=0)
    times = (params.start_time + jnp.arange(T + 1, dtype=cash.dtype) * params.dt)[:, None].repeat(n, axis=1)
    obs = jnp.stack([cash_full, inv_full, times, price_full], axis=2)
    value = cash_full + inv_full * price_full
    rewards = value[1:] - value[:-1]

    gamma, sigma, k = params.risk_aversion, params.volatility, params.fill_exponent
    tau = params.terminal_time - times[:-1]  # (T, n)
    pre_inv = inv_full[:-1]
    if gamma > 0:
        skew = pre_inv * (gamma * sigma * sigma) * tau
        half = 0.5 * (gamma * sigma * sigma) * tau + (1.0 / gamma) * jnp.log(1.0 + gamma / k)
        actions = jnp.stack([skew + half, -skew + half], axis=2)
    else:
        actions = jnp.full((T, n, 2), 1.0 / k, dtype=cash.dtype)
    return Trajectory(observations=obs, actions=actions, rewards=rewards)
