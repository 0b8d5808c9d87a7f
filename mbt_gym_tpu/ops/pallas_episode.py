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
    """Scalars baked into the kernel at trace time."""

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


def params_from_config(cfg: EnvConfig, risk_aversion: float = 0.1) -> AsEpisodeParams:
    from mbt_gym_tpu.dynamics import LimitOrderDynamics
    from mbt_gym_tpu.processes.arrivals import PoissonArrivals
    from mbt_gym_tpu.processes.fills import ExponentialFill
    from mbt_gym_tpu.processes.midprice import BrownianMotionMidprice
    from mbt_gym_tpu.rewards import PnL

    d = cfg.dynamics
    assert isinstance(d, LimitOrderDynamics), "pallas fast path: limit-order dynamics only"
    assert isinstance(d.midprice_model, BrownianMotionMidprice)
    assert isinstance(d.arrival_model, PoissonArrivals)
    assert isinstance(d.fill_probability_model, ExponentialFill)
    assert isinstance(cfg.reward_function, PnL), "episode return telescopes only for PnL"
    assert not cfg.normalise_action_space and not cfg.normalise_observation_space
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
    )


def _uniform_from_bits(bits):
    """random bits -> float32 uniform in [0, 1) with a 24-bit mantissa.
    Mosaic has no uint32->f32 cast, so shift logically as int32 (top 8 bits
    cleared => non-negative) and cast from int32."""
    as_int = pltpu.bitcast(bits, jnp.int32)
    top24 = jax.lax.shift_right_logical(as_int, 8)
    return top24.astype(jnp.float32) * (1.0 / (1 << 24))


def _episode_kernel(p: AsEpisodeParams, seed_ref, cash_ref, inv_ref, price_ref):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    shape = cash_ref.shape

    sqrt_dt_vol = p.volatility * math.sqrt(p.dt)
    p_bid = p.intensity_bid * p.dt
    p_ask = p.intensity_ask * p.dt
    gamma, sigma, k, T = p.risk_aversion, p.volatility, p.fill_exponent, p.terminal_time
    if gamma > 0:
        const_spread_half = (1.0 / gamma) * math.log(1.0 + gamma / k)
    else:
        const_spread_half = 1.0 / k

    def draw_uniform():
        return _uniform_from_bits(pltpu.prng_random_bits(shape))

    def body(i, carry):
        cash, inv, price = carry
        t = i.astype(jnp.float32) * p.dt
        tau = T - t

        # Closed-form AS quotes (BaselineAgents.py:52-83) or risk-neutral 1/k.
        if gamma > 0:
            skew = inv * (gamma * sigma * sigma) * tau
            half_spread = 0.5 * (gamma * sigma * sigma) * tau + const_spread_half
            bid_depth = skew + half_spread
            ask_depth = -skew + half_spread
        else:
            bid_depth = jnp.full(shape, const_spread_half)
            ask_depth = jnp.full(shape, const_spread_half)

        arr_bid = (draw_uniform() < p_bid).astype(jnp.float32)
        arr_ask = (draw_uniform() < p_ask).astype(jnp.float32)
        fill_bid = (draw_uniform() < jnp.exp(-k * bid_depth)).astype(jnp.float32)
        fill_ask = (draw_uniform() < jnp.exp(-k * ask_depth)).astype(jnp.float32)

        # Max-inventory fill masking (TradingEnvironment.py:323-327).
        fill_bid = fill_bid * (inv < p.max_inventory).astype(jnp.float32)
        fill_ask = fill_ask * (inv > -p.max_inventory).astype(jnp.float32)

        hit_bid = arr_bid * fill_bid
        hit_ask = arr_ask * fill_ask
        inv = inv + hit_bid - hit_ask
        cash = cash - hit_bid * (price - bid_depth) + hit_ask * (price + ask_depth)

        # Box-Muller normal for the BM midprice increment.
        u1 = 1.0 - draw_uniform()  # (0, 1] so log is finite
        u2 = draw_uniform()
        normal = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos((2.0 * math.pi) * u2)
        price = price + p.drift * p.dt + sqrt_dt_vol * normal
        return cash, inv, price

    cash0 = jnp.zeros(shape, jnp.float32)
    inv0 = jnp.zeros(shape, jnp.float32)
    price0 = jnp.full(shape, p.initial_price, jnp.float32)
    cash, inv, price = jax.lax.fori_loop(0, p.n_steps, body, (cash0, inv0, price0))
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
):
    """Run one full episode for ``num_trajectories`` envs; returns terminal
    (cash, inventory, price), each ``(N,)``.

    ``num_trajectories`` must be a multiple of ``rows * 128``.
    ``interpret=True`` runs the Pallas interpreter (CPU-testable).
    """
    tile = rows * LANES
    assert num_trajectories % tile == 0, (num_trajectories, tile)
    grid = num_trajectories // tile
    seed_arr = jnp.asarray([seed], dtype=jnp.int32)
    out_shape = [jax.ShapeDtypeStruct((grid * rows, LANES), jnp.float32)] * 3
    kernel = partial(_episode_kernel, params)
    cash, inv, price = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[
            pl.BlockSpec((rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ]
        * 3,
        out_shape=out_shape,
        interpret=interpret,
    )(seed_arr)
    return cash.reshape(-1), inv.reshape(-1), price.reshape(-1)


def episode_stats_pallas(params: AsEpisodeParams, seed, num_trajectories: int = 16384, **kw):
    """Terminal-state summary stats (PnL telescopes: total reward = terminal
    mark-to-market minus initial)."""
    cash, inv, price = as_episode_pallas(params, seed, num_trajectories, **kw)
    pnl = cash + inv * price - 0.0
    return {
        "mean_pnl": pnl.mean(),
        "std_pnl": pnl.std(),
        "mean_terminal_inventory": inv.mean(),
        "std_terminal_inventory": inv.std(),
    }
