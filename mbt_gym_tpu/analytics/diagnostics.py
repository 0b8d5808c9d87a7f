"""Post-hoc diagnostics — the jit-compatible counterparts of the reference's
host-side warnings (negative-spread warn at BaselineAgents.py:66-67, clip
prints at TradingEnvironment.py:283-297; neither can print inside a compiled
step, so here they are trajectory checks)."""
from __future__ import annotations

import jax.numpy as jnp

from mbt_gym_tpu.types import EnvState, Trajectory


def negative_spread_fraction(traj: Trajectory) -> jnp.ndarray:
    """Fraction of (step, env) quotes with a negative depth on either side —
    the reference's AS agent warns when ``action.min() < 0``
    (BaselineAgents.py:66-67).  Note the inventory skew cancels in the total
    bid+ask spread, so the per-side check is the meaningful one."""
    if traj.actions.shape[-1] < 2:
        return jnp.zeros(())
    return (traj.actions[..., 0:2].min(axis=-1) < 0).mean()


def clip_event_count(state: EnvState) -> jnp.ndarray:
    """Number of steps on which any cash/inventory clip occurred (the
    engine's replacement for the reference's printed warnings)."""
    return state.clip_events


def max_abs_inventory(traj: Trajectory) -> jnp.ndarray:
    return jnp.abs(traj.observations[:, :, 1]).max()
