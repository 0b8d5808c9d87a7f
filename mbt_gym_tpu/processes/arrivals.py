"""Order-arrival models (counterparts of
``mbt_gym/stochastic_processes/arrival_models.py``).

An arrival model exposes ``get_arrivals(state, uniform, dt) -> (N, 2)`` where
column 0 is an exogenous SELL order arriving on the buy side of the book and
column 1 an exogenous BUY order on the sell side (arrival_models.py:9-13).
Arrivals are returned in the state dtype (0.0/1.0) rather than bool so that
downstream bookkeeping is a pure multiply-accumulate on the VPU.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from mbt_gym_tpu.processes.base import ProcessBase, process_dataclass


@process_dataclass
class PoissonArrivals(ProcessBase):
    """Stateless Bernoulli thinning: ``uniform < intensity*dt``
    (arrival_models.py:32-56).  Default arrival model."""

    intensity: Tuple[float, float] = (140.0, 140.0)

    def noise_spec(self):
        return (0, 2)

    def get_arrivals(self, state, uniform, dt):
        probs = jnp.asarray(self.intensity, dtype=uniform.dtype) * dt
        return (uniform < probs).astype(uniform.dtype)


@process_dataclass
class PoissonArrivalsNonLinear(ProcessBase):
    """Exact per-step arrival probability ``1 - exp(-intensity*dt)``
    (arrival_models.py:59-83)."""

    intensity: Tuple[float, float] = (140.0, 140.0)

    def noise_spec(self):
        return (0, 2)

    def get_arrivals(self, state, uniform, dt):
        probs = 1.0 - jnp.exp(-jnp.asarray(self.intensity, dtype=uniform.dtype) * dt)
        return (uniform < probs).astype(uniform.dtype)


@process_dataclass
class HawkesArrivals(ProcessBase):
    """Self-exciting arrivals; state = 2-dim intensity (arrival_models.py:86-129).

    ``get_arrivals`` thins against the *current* intensity; ``update`` then
    mean-reverts towards the baseline and adds ``jump_size * arrivals``
    self-excitation — the reference's exact operation order.
    """

    baseline_arrival_rate: Tuple[float, float] = (10.0, 10.0)
    jump_size: float = 40.0
    mean_reversion_speed: float = 60.0
    state_dim = 2

    def noise_spec(self):
        return (0, 2)

    def initial_state(self, n, dtype=jnp.float32):
        return jnp.broadcast_to(jnp.asarray(self.baseline_arrival_rate, dtype=dtype), (n, 2)).copy()

    def bounds(self):
        # Obs bound = 10x baseline (arrival_models.py:125-126).
        return ((0.0, 0.0), tuple(10.0 * b for b in self.baseline_arrival_rate))

    def get_arrivals(self, state, uniform, dt):
        return (uniform < state * dt).astype(uniform.dtype)

    def update(self, state, arrivals, fills, action, noise, dt):
        baseline = jnp.asarray(self.baseline_arrival_rate, dtype=state.dtype)
        return state + self.mean_reversion_speed * (baseline - state) * dt + self.jump_size * arrivals
