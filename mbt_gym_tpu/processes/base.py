"""Stochastic-process protocol for the TPU-native engine.

The reference models are stateful objects each owning a NumPy ``Generator``
(``mbt_gym/stochastic_processes/StochasticProcessModel.py:8-53``).  Here a
process is a *hashable frozen dataclass of parameters* — static under ``jit``,
so XLA constant-folds every coefficient — exposing pure functions over
``(N, d)`` state arrays.  Randomness arrives as explicit noise columns
(:class:`mbt_gym_tpu.types.SlotNoise`), generated either counter-based on
device or injected from a host harness for reference-exact replay.

Protocol (structural, enforced by tests rather than ABCs):

- ``state_dim: int`` — number of state columns this process contributes to the
  observation (0 for stateless processes, mirroring ``initial_state=[[]]``).
- ``noise_spec() -> (n_normal, n_uniform)`` — per-step noise columns consumed.
- ``initial_state(n) -> (n, state_dim)`` array.
- ``bounds() -> (low, high)`` tuples of length ``state_dim`` for the
  observation space (parity with per-process ``min_value``/``max_value``).
- ``update(state, arrivals, fills, action, noise, dt) -> (n, state_dim)``.

Subfamilies add:
- arrivals: ``arrival_intensity_state``-free ``get_arrivals(state, uniform, dt)``
- fills:    ``fill_probability(state, depths)`` and ``max_depth``
- impact:   ``get_impact(state, action)`` and ``max_speed``
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


def process_dataclass(cls):
    """Decorator: frozen dataclass usable as a static jit argument."""
    return dataclasses.dataclass(frozen=True)(cls)


class ProcessBase:
    """Mixin with shared defaults for zero-state, zero-noise processes."""

    state_dim: int = 0

    def noise_spec(self) -> Tuple[int, int]:
        """(num_normal_columns, num_uniform_columns) consumed per step."""
        return (0, 0)

    def initial_state(self, n: int, dtype=jnp.float32) -> jax.Array:
        return jnp.zeros((n, self.state_dim), dtype=dtype)

    def bounds(self) -> Tuple[Tuple[float, ...], Tuple[float, ...]]:
        return ((), ())

    def update(
        self,
        state: jax.Array,
        arrivals: jax.Array,
        fills: jax.Array,
        action: jax.Array,
        noise,
        dt: float,
    ) -> jax.Array:
        return state
