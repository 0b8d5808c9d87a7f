"""Backtest statistics (counterpart of ``mbt_gym/gym/backtesting.py``).

Unlike the reference (which asserts num_trajectories == 1 and recomputes a
rollout per statistic, backtesting.py:11-60), these operate on an existing
:class:`Trajectory` and are vectorized over all N trajectories at once,
returning (N,) arrays.  ``risk_free_rate`` and annualization conventions
match the reference.
"""
from __future__ import annotations

import jax.numpy as jnp

from mbt_gym_tpu.types import ASSET_PRICE_INDEX, CASH_INDEX, INVENTORY_INDEX, Trajectory


def portfolio_values(traj: Trajectory) -> jnp.ndarray:
    """(T+1, N) mark-to-market value path."""
    obs = traj.observations
    return obs[:, :, CASH_INDEX] + obs[:, :, INVENTORY_INDEX] * obs[:, :, ASSET_PRICE_INDEX]


def _return_pcts(traj: Trajectory) -> jnp.ndarray:
    values = portfolio_values(traj)
    return jnp.diff(values, axis=0) / values[1:]


def sharpe_ratio(traj: Trajectory, risk_free_rate: float = 0.099) -> jnp.ndarray:
    """Annualized Sharpe = (mean_ret * n_steps - rf) / (std_ret * sqrt(n_steps))
    (backtesting.py:11-27)."""
    rets = _return_pcts(traj)
    n_steps = rets.shape[0]
    annualized_std = rets.std(axis=0) * jnp.sqrt(n_steps)
    return (rets.mean(axis=0) * n_steps - risk_free_rate) / annualized_std


def sortino_ratio(traj: Trajectory, risk_free_rate: float = 0.099) -> jnp.ndarray:
    """Sharpe restricted to downside deviation (backtesting.py:30-46)."""
    rets = _return_pcts(traj)
    n_steps = rets.shape[0]
    losses = jnp.where(rets < 0, rets, jnp.nan)
    loss_std = jnp.sqrt(jnp.nanmean((losses - jnp.nanmean(losses, axis=0)) ** 2, axis=0))
    annualized_std = loss_std * jnp.sqrt(n_steps)
    return (rets.mean(axis=0) * n_steps - risk_free_rate) / annualized_std


def maximum_drawdown(traj: Trajectory) -> jnp.ndarray:
    """Largest peak-to-trough drop of the compounded return path
    (backtesting.py:49-60)."""
    rets = _return_pcts(traj)
    cum_prods = jnp.cumprod(rets + 1.0, axis=0)
    peak = jax_running_max(cum_prods)
    drawdown = cum_prods / peak - 1.0
    return drawdown.min(axis=0)


def jax_running_max(x: jnp.ndarray) -> jnp.ndarray:
    import jax

    return jax.lax.associative_scan(jnp.maximum, x, axis=0)
