"""Fill-probability models (counterparts of
``mbt_gym/stochastic_processes/fill_probability_models.py``).

A fill model exposes ``fill_probability(state, depths) -> (N, 2)`` plus
``get_fills(state, depths, uniform) -> (N, 2)`` (Bernoulli thinning,
fill_probability_models.py:28-34) and a ``max_depth`` used to bound the
action space.

Reference quirks (documented, intent implemented):
``TriangularFillFunction``/``PowerFillFunction`` call ``np.max(depths, 0)``
— an axis-0 reduction across trajectories — where the elementwise
``np.maximum(depths, 0)`` clamp was clearly intended
(fill_probability_models.py:83-84,115-116).  For num_trajectories == 1 the
two coincide up to the cross-side max; here the elementwise intent is
implemented and vectorizes correctly.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from mbt_gym_tpu.processes.base import ProcessBase, process_dataclass


class FillModelBase(ProcessBase):
    def get_fills(self, state, depths, uniform):
        return (uniform < self.fill_probability(state, depths)).astype(uniform.dtype)


@process_dataclass
class ExponentialFill(FillModelBase):
    """``p = exp(-fill_exponent * depth)`` (fill_probability_models.py:42-65).
    Default fill model; ``1/fill_exponent`` is the risk-neutral optimal quote."""

    fill_exponent: float = 1.5

    def noise_spec(self):
        return (0, 2)

    def fill_probability(self, state, depths):
        return jnp.exp(-self.fill_exponent * depths)

    @property
    def max_depth(self) -> float:
        return -math.log(0.01) / self.fill_exponent


@process_dataclass
class TriangularFill(FillModelBase):
    """``p = max(1 - max(depth, 0)/max_fill_depth, 0)``
    (fill_probability_models.py:68-91, elementwise intent).

    ``strict_reference_bug=True`` reproduces the literal reference expression
    ``np.max(1 - np.max(depths, 0)/c, 0)`` — axis-0 reductions instead of
    elementwise clamps, collapsing the fill probability to a single scalar
    shared by all trajectories and sides (fill_probability_models.py:84)."""

    max_fill_depth: float = 1.0
    strict_reference_bug: bool = False

    def noise_spec(self):
        return (0, 2)

    def fill_probability(self, state, depths):
        if self.strict_reference_bug:
            p = jnp.max(1.0 - jnp.max(depths, axis=0) / self.max_fill_depth, axis=0)
            return jnp.broadcast_to(p, depths.shape)
        return jnp.maximum(1.0 - jnp.maximum(depths, 0.0) / self.max_fill_depth, 0.0)

    @property
    def max_depth(self) -> float:
        return 1.5 * self.max_fill_depth


@process_dataclass
class PowerFill(FillModelBase):
    """``p = 1 / (1 + (mult * depth)^k)`` (fill_probability_models.py:94-123,
    elementwise intent).  ``strict_reference_bug=True`` reproduces the literal
    axis-0 ``np.max(depths, 0)`` cross-trajectory reduction (:115-116)."""

    fill_exponent: float = 1.5
    fill_multiplier: float = 1.5
    strict_reference_bug: bool = False

    def noise_spec(self):
        return (0, 2)

    def fill_probability(self, state, depths):
        if self.strict_reference_bug:
            d = jnp.broadcast_to(jnp.max(depths, axis=0), depths.shape)
        else:
            d = jnp.maximum(depths, 0.0)
        return 1.0 / (1.0 + (self.fill_multiplier * d) ** self.fill_exponent)

    @property
    def max_depth(self) -> float:
        return 0.01 ** (-1.0 / self.fill_exponent) - 1.0


@process_dataclass
class ExogenousMmFill(FillModelBase):
    """Competing market maker (fill_probability_models.py:126-170): two
    exogenous best-depth processes (bid, ask) carried in state; quoting at or
    inside the exogenous best depth fills with probability 1, quoting outside
    decays as ``base_p * exp(-k * (depth - best))``.

    ``bid_process``/``ask_process`` must each contribute >= 1 state column and
    their first column is used as the best depth for that side.

    ⚠ Reference bug (undocumented until round 3's bitwise matrix found it):
    the reference's ``update`` advances the inner processes' own
    ``current_state``s but NEVER refreshes the parent's ``current_state``
    — which is what ``_get_fill_probabilities`` reads and what the env
    copies into the observation (fill_probability_models.py:159-162,168-170
    vs StochasticProcessModel.py:27).  The exogenous best depths are
    therefore FROZEN at their initial values in the reference; the inner
    stochasticity is dead code.  Default here implements the evident
    intent (evolving depths); ``strict_reference_bug=True`` reproduces the
    frozen-depth literal behavior for bitwise replay (the inner noise
    channels are then dropped from ``noise_spec`` — the reference still
    consumes its inner Generators, but the draws are unobservable).
    """

    bid_process: ProcessBase
    ask_process: ProcessBase
    fill_exponent: float = 1.5
    base_fill_probability: float = 1.0
    strict_reference_bug: bool = False

    def __post_init__(self):
        assert self.bid_process.state_dim >= 1 and self.ask_process.state_dim >= 1, (
            "Exogenous best depth processes must have a state of at least size 1."
        )

    @property
    def state_dim(self) -> int:  # type: ignore[override]
        return self.bid_process.state_dim + self.ask_process.state_dim

    def noise_spec(self):
        if self.strict_reference_bug:
            return (0, 2)  # frozen depths: only the fill thinning uniforms
        bn, bu = self.bid_process.noise_spec()
        an, au = self.ask_process.noise_spec()
        return (bn + an, bu + au + 2)  # +2 for the fill thinning uniforms

    def initial_state(self, n, dtype=jnp.float32):
        return jnp.concatenate(
            [self.bid_process.initial_state(n, dtype), self.ask_process.initial_state(n, dtype)], axis=1
        )

    def bounds(self):
        b_lo, b_hi = self.bid_process.bounds()
        a_lo, a_hi = self.ask_process.bounds()
        return (b_lo + a_lo, b_hi + a_hi)

    def _best_depths(self, state):
        return jnp.concatenate(
            [state[:, 0:1], state[:, self.bid_process.state_dim : self.bid_process.state_dim + 1]], axis=1
        )

    def fill_probability(self, state, depths):
        best = self._best_depths(state)
        outside = depths > best
        return jnp.where(
            outside,
            self.base_fill_probability * jnp.exp(-self.fill_exponent * (depths - best)),
            jnp.ones_like(depths),
        )

    def get_fills(self, state, depths, uniform):
        # The last 2 uniform columns are the thinning draws; earlier columns
        # belong to the inner processes (consumed in update()).
        return (uniform[:, -2:] < self.fill_probability(state, depths)).astype(uniform.dtype)

    def update(self, state, arrivals, fills, action, noise, dt):
        if self.strict_reference_bug:
            return state  # reference: parent current_state never refreshed
        d_b = self.bid_process.state_dim
        bn, bu = self.bid_process.noise_spec()
        bid_noise = type(noise)(
            normal=None if noise.normal is None else noise.normal[:, :bn],
            uniform=None if noise.uniform is None else noise.uniform[:, :bu],
        )
        an, au = self.ask_process.noise_spec()
        ask_noise = type(noise)(
            normal=None if noise.normal is None else noise.normal[:, bn : bn + an],
            uniform=None if noise.uniform is None else noise.uniform[:, bu : bu + au],
        )
        new_bid = self.bid_process.update(state[:, :d_b], arrivals, fills, action, bid_noise, dt)
        new_ask = self.ask_process.update(state[:, d_b:], arrivals, fills, action, ask_noise, dt)
        return jnp.concatenate([new_bid, new_ask], axis=1)

    @property
    def max_depth(self) -> float:
        _, b_hi = self.bid_process.bounds()
        return -math.log(0.01) / self.fill_exponent + max(b_hi)
