"""Midprice models (pure-function counterparts of
``mbt_gym/stochastic_processes/midprice_models.py``).

Every model is a frozen dataclass of Python-float parameters (static under
``jit``; coefficients are precomputed on host in float64 and constant-folded
by XLA).  ``update`` consumes explicit noise columns, so the same function
runs in native counter-based PRNG mode and in reference-exact replay mode.

Reference quirks preserved deliberately (do NOT "fix" silently):

- ``OuMidpriceModel``/``OuJumpMidpriceModel`` do not scale the mean-reversion
  drift by ``dt`` (midprice_models.py:141-143,264-269).  Reproduced when
  ``dt_scaled_drift=False`` (the default, matching the reference); set
  ``dt_scaled_drift=True`` for the textbook Euler scheme.
- ``ShortTermOuAlphaMidpriceModel``/``ShortTermJumpAlphaMidpriceModel`` and
  ``ConstantElasticityOfVarianceMidpriceModel`` contain (N,)-vs-(N,1)
  broadcasting bugs that crash/blow up for num_trajectories > 1 in the
  reference (midprice_models.py:181-187,309-316,401-409).  Here the *intent*
  is implemented, vectorized correctly.
- ``HestonMidpriceModel``/``CEV`` use the unseeded global NumPy RNG in the
  reference (midprice_models.py:357,408) and are therefore not
  seed-reproducible there; here they consume properly keyed noise columns.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from mbt_gym_tpu.processes.base import ProcessBase, process_dataclass
from mbt_gym_tpu.types import ASK_INDEX, BID_INDEX


def _filled(arrivals, fills, side: int):
    """(N,) indicator that an order arrived and was filled on `side`."""
    return arrivals[:, side] * fills[:, side]


def _jump_term(arrivals, fills, jump_size: float, dtype):
    """(N, 1) fill-driven jump, or scalar 0 under fill-less dynamics
    (trading speed), where arrivals/fills are None.  (The reference crashes
    in that combination — midprice_models.py:220 on a None fills — so this
    is a strict widening: no fills means no jumps.)"""
    if arrivals is None or fills is None:
        return 0.0
    jump = jump_size * (_filled(arrivals, fills, ASK_INDEX) - _filled(arrivals, fills, BID_INDEX))
    return jump[:, None].astype(dtype)


@process_dataclass
class ConstantMidprice(ProcessBase):
    """Price never moves (midprice_models.py:12-33)."""

    initial_price: float = 100.0
    state_dim = 1

    def initial_state(self, n, dtype=jnp.float32):
        return jnp.full((n, 1), self.initial_price, dtype=dtype)

    def bounds(self):
        return ((self.initial_price,), (self.initial_price,))


@process_dataclass
class BrownianMotionMidprice(ProcessBase):
    """Arithmetic BM: ``S += drift*dt + vol*sqrt(dt)*N(0,1)``
    (midprice_models.py:36-68).  Default midprice of the AS/CJ configs."""

    drift: float = 0.0
    volatility: float = 2.0
    initial_price: float = 100.0
    terminal_time: float = 1.0
    state_dim = 1

    def noise_spec(self):
        return (1, 0)

    def initial_state(self, n, dtype=jnp.float32):
        return jnp.full((n, 1), self.initial_price, dtype=dtype)

    def bounds(self):
        # Obs bound S0 ± 4*vol*sqrt(T) (midprice_models.py:67-68).
        half_width = 4.0 * self.volatility * math.sqrt(self.terminal_time)
        return ((self.initial_price - half_width,), (self.initial_price + half_width,))

    def update(self, state, arrivals, fills, action, noise, dt):
        return state + (self.drift * dt) + (self.volatility * math.sqrt(dt)) * noise.normal


@process_dataclass
class GeometricBrownianMotionMidprice(ProcessBase):
    """GBM Euler step (midprice_models.py:71-111)."""

    drift: float = 0.0
    volatility: float = 0.1
    initial_price: float = 100.0
    terminal_time: float = 1.0
    state_dim = 1

    def noise_spec(self):
        return (1, 0)

    def initial_state(self, n, dtype=jnp.float32):
        return jnp.full((n, 1), self.initial_price, dtype=dtype)

    def bounds(self):
        # Lognormal-stdev bound (midprice_models.py:105-111).  Quirk fixed:
        # for sufficiently negative drift the reference's
        # ``hi = s0*exp(mu*T) + 4*stdev`` falls BELOW s0, silently
        # inverting its observation Box (min > max).  Use the symmetric
        # half-width |s0*exp(mu*T) - s0| + 4*stdev: identical to the
        # reference for mu >= 0, and for mu < 0 the box still covers the
        # drifted mean with the same 4-sigma margin.
        stdev = math.sqrt(
            self.initial_price**2
            * math.exp(2 * self.drift * self.terminal_time)
            * (math.exp(self.volatility**2 * self.terminal_time) - 1)
        )
        drifted = self.initial_price * math.exp(self.drift * self.terminal_time)
        half_width = abs(drifted - self.initial_price) + 4 * stdev
        return (
            (self.initial_price - half_width,),
            (self.initial_price + half_width,),
        )

    def update(self, state, arrivals, fills, action, noise, dt):
        return state + self.drift * state * dt + (self.volatility * math.sqrt(dt)) * state * noise.normal


@process_dataclass
class OuMidprice(ProcessBase):
    """Ornstein-Uhlenbeck mean reversion (midprice_models.py:114-146).

    With ``dt_scaled_drift=False`` (default) the drift term is NOT multiplied
    by dt — the reference's quirk, preserved for seed-exactness."""

    mean_reversion_level: float = 0.0
    mean_reversion_speed: float = 1.0
    volatility: float = 2.0
    initial_price: float = 100.0
    terminal_time: float = 1.0
    dt_scaled_drift: bool = False
    state_dim = 1

    def noise_spec(self):
        return (1, 0)

    def initial_state(self, n, dtype=jnp.float32):
        return jnp.full((n, 1), self.initial_price, dtype=dtype)

    def bounds(self):
        half_width = 4.0 * self.volatility * self.terminal_time
        return ((self.initial_price - half_width,), (self.initial_price + half_width,))

    def update(self, state, arrivals, fills, action, noise, dt):
        drift_scale = dt if self.dt_scaled_drift else 1.0
        return (
            state
            + (-self.mean_reversion_speed * drift_scale) * (state - self.mean_reversion_level)
            + (self.volatility * math.sqrt(dt)) * noise.normal
        )


@process_dataclass
class ShortTermOuAlphaMidprice(ProcessBase):
    """2-dim state ``[price, alpha]``: price drifts at the OU alpha rate
    (midprice_models.py:149-190; reference crashes for N>1 — intent kept)."""

    volatility: float = 2.0
    ou: OuMidprice = OuMidprice(initial_price=0.0)
    initial_price: float = 100.0
    terminal_time: float = 1.0
    state_dim = 2

    def noise_spec(self):
        return (2, 0)  # own price noise + inner OU noise

    def initial_state(self, n, dtype=jnp.float32):
        price = jnp.full((n, 1), self.initial_price, dtype=dtype)
        alpha = self.ou.initial_state(n, dtype)
        return jnp.concatenate([price, alpha], axis=1)

    def bounds(self):
        half_width = 4.0 * self.volatility * self.terminal_time
        (ou_lo,), (ou_hi,) = self.ou.bounds()
        return ((self.initial_price - half_width, ou_lo), (self.initial_price + half_width, ou_hi))

    def update(self, state, arrivals, fills, action, noise, dt):
        price, alpha = state[:, 0:1], state[:, 1:2]
        own = type(noise)(normal=noise.normal[:, 0:1], uniform=None)
        inner = type(noise)(normal=noise.normal[:, 1:2], uniform=None)
        new_price = price + alpha * dt + (self.volatility * math.sqrt(dt)) * own.normal
        new_alpha = self.ou.update(alpha, arrivals, fills, action, inner, dt)
        return jnp.concatenate([new_price, new_alpha], axis=1)


@process_dataclass
class BrownianMotionJumpMidprice(ProcessBase):
    """ABM plus a permanent ±jump on each of the agent's own fills
    (midprice_models.py:193-230): ask fill pushes price up, bid fill down."""

    drift: float = 0.0
    volatility: float = 2.0
    jump_size: float = 1.0
    initial_price: float = 100.0
    terminal_time: float = 1.0
    state_dim = 1

    def noise_spec(self):
        return (1, 0)

    def initial_state(self, n, dtype=jnp.float32):
        return jnp.full((n, 1), self.initial_price, dtype=dtype)

    def bounds(self):
        half_width = 4.0 * self.volatility * self.terminal_time
        return ((self.initial_price - half_width,), (self.initial_price + half_width,))

    def update(self, state, arrivals, fills, action, noise, dt):
        return (
            state
            + (self.drift * dt)
            + (self.volatility * math.sqrt(dt)) * noise.normal
            + _jump_term(arrivals, fills, self.jump_size, state.dtype)
        )


@process_dataclass
class OuJumpMidprice(ProcessBase):
    """OU plus fill-driven jumps (midprice_models.py:233-273); same
    missing-dt drift quirk as :class:`OuMidprice` when ``dt_scaled_drift=False``."""

    mean_reversion_level: float = 0.0
    mean_reversion_speed: float = 1.0
    volatility: float = 2.0
    jump_size: float = 1.0
    initial_price: float = 100.0
    terminal_time: float = 1.0
    dt_scaled_drift: bool = False
    state_dim = 1

    def noise_spec(self):
        return (1, 0)

    def initial_state(self, n, dtype=jnp.float32):
        return jnp.full((n, 1), self.initial_price, dtype=dtype)

    def bounds(self):
        half_width = 4.0 * self.volatility * self.terminal_time
        return ((self.initial_price - half_width,), (self.initial_price + half_width,))

    def update(self, state, arrivals, fills, action, noise, dt):
        drift_scale = dt if self.dt_scaled_drift else 1.0
        return (
            state
            + (-self.mean_reversion_speed * drift_scale) * (state - self.mean_reversion_level)
            + (self.volatility * math.sqrt(dt)) * noise.normal
            + _jump_term(arrivals, fills, self.jump_size, state.dtype)
        )


@process_dataclass
class ShortTermJumpAlphaMidprice(ProcessBase):
    """``[price, alpha]`` with alpha following an OU-with-jumps process
    (midprice_models.py:276-319; reference crashes for N>1 — intent kept)."""

    volatility: float = 2.0
    ou_jump: OuJumpMidprice = OuJumpMidprice(initial_price=0.0)
    initial_price: float = 100.0
    terminal_time: float = 1.0
    state_dim = 2

    def noise_spec(self):
        return (2, 0)

    def initial_state(self, n, dtype=jnp.float32):
        price = jnp.full((n, 1), self.initial_price, dtype=dtype)
        alpha = self.ou_jump.initial_state(n, dtype)
        return jnp.concatenate([price, alpha], axis=1)

    def bounds(self):
        half_width = 4.0 * self.volatility * self.terminal_time
        (ou_lo,), (ou_hi,) = self.ou_jump.bounds()
        return ((self.initial_price - half_width, ou_lo), (self.initial_price + half_width, ou_hi))

    def update(self, state, arrivals, fills, action, noise, dt):
        price, alpha = state[:, 0:1], state[:, 1:2]
        own = type(noise)(normal=noise.normal[:, 0:1], uniform=None)
        inner = type(noise)(normal=noise.normal[:, 1:2], uniform=None)
        new_price = price + alpha * dt + (self.volatility * math.sqrt(dt)) * own.normal
        new_alpha = self.ou_jump.update(alpha, arrivals, fills, action, inner, dt)
        return jnp.concatenate([new_price, new_alpha], axis=1)


@process_dataclass
class HestonMidprice(ProcessBase):
    """Heston stochastic volatility, 2-dim state ``[price, variance]``
    (midprice_models.py:322-372).  Correlated Wieners built from two iid
    normal columns via the Cholesky factor of [[1, rho], [rho, 1]]."""

    drift: float = 0.05
    volatility_mean_reversion_rate: float = 3.0
    volatility_mean_reversion_level: float = 0.04
    weiner_correlation: float = -0.8
    volatility_of_volatility: float = 0.6
    initial_price: float = 100.0
    initial_variance: float = 0.04
    terminal_time: float = 1.0
    state_dim = 2

    def noise_spec(self):
        return (2, 0)

    def initial_state(self, n, dtype=jnp.float32):
        price = jnp.full((n, 1), self.initial_price, dtype=dtype)
        var = jnp.full((n, 1), self.initial_variance, dtype=dtype)
        return jnp.concatenate([price, var], axis=1)

    def bounds(self):
        # Reference bound is 1-dim despite the 2-dim state (a latent shape bug
        # at midprice_models.py:345-346); we bound variance by 10x the
        # mean-reversion level so the observation space is well-formed.
        hi = self.initial_price + 4 * self.volatility_mean_reversion_level * self.terminal_time
        return (
            (self.initial_price - (hi - self.initial_price), 0.0),
            (hi, 10.0 * max(self.volatility_mean_reversion_level, self.initial_variance)),
        )

    def update(self, state, arrivals, fills, action, noise, dt):
        price, var = state[:, 0:1], state[:, 1:2]
        rho = self.weiner_correlation
        w0 = noise.normal[:, 0:1]
        w1 = rho * w0 + math.sqrt(1.0 - rho**2) * noise.normal[:, 1:2]
        vol = jnp.sqrt(jnp.maximum(var, 0.0) * dt)
        new_price = price + self.drift * price * dt + vol * price * w0
        new_var = jnp.abs(
            var
            + self.volatility_mean_reversion_rate * (self.volatility_mean_reversion_level - var) * dt
            + self.volatility_of_volatility * vol * w1
        )
        return jnp.concatenate([new_price, new_var], axis=1)


@process_dataclass
class CevMidprice(ProcessBase):
    """Constant elasticity of variance: ``dS = S*mu*dt + vol*S^gamma*sqrt(dt)*dW``
    (midprice_models.py:375-412; gamma=1 reduces to GBM)."""

    drift: float = 0.0
    volatility: float = 0.1
    gamma: float = 1.0
    initial_price: float = 100.0
    terminal_time: float = 1.0
    state_dim = 1

    def noise_spec(self):
        return (1, 0)

    def initial_state(self, n, dtype=jnp.float32):
        return jnp.full((n, 1), self.initial_price, dtype=dtype)

    def bounds(self):
        half_width = 4.0 * self.volatility * self.terminal_time
        return ((self.initial_price - half_width,), (self.initial_price + half_width,))

    def update(self, state, arrivals, fills, action, noise, dt):
        return (
            state
            + state * (self.drift * dt)
            + (self.volatility * math.sqrt(dt)) * (state**self.gamma) * noise.normal
        )
