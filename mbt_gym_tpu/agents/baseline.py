"""Closed-form and baseline agents (counterparts of
``mbt_gym/agents/BaselineAgents.py``) as pure policies
``policy(params, obs, state) -> (N, A)`` compatible with
:func:`mbt_gym_tpu.rollout.rollout`.

Agents read the *raw* (unnormalised) observation columns; when the env
normalises observations, wrap with :func:`raw_obs_policy`.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mbt_gym_tpu.env import EnvConfig
from mbt_gym_tpu.types import ASK_INDEX, BID_INDEX, CASH_INDEX, INVENTORY_INDEX, TIME_INDEX, ASSET_PRICE_INDEX


def raw_obs_policy(cfg: EnvConfig, policy):
    """Adapt a raw-observation policy to an env with normalised observations."""
    if not cfg.normalise_observation_space:
        return policy
    low, high = cfg.observation_bounds()
    gradient = (high - low) / 2

    def wrapped(params, obs, state):
        return policy(params, (obs + 1.0) * gradient + low, state)

    return wrapped


def fixed_action_policy(fixed_action) -> Tuple:
    """Constant action for every trajectory (BaselineAgents.py:25-31).
    Tagged for the dispatch front door: on eligible configs,
    ``rollout(backend="auto")`` runs it on the fused fixed-policy kernel
    (``ops.pallas_rollout.fixed_rollout_pallas``)."""
    from mbt_gym_tpu.dispatch import tag_policy

    fixed = jnp.asarray(fixed_action)

    def policy(params, obs, state):
        n = obs.shape[0]
        return jnp.broadcast_to(fixed, (n, fixed.shape[-1]))

    return tag_policy(
        policy, kind="fixed",
        action=tuple(float(x) for x in np.asarray(fixed_action).reshape(-1)),
    )


def fixed_spread_policy(half_spread: float = 1.0, offset: float = 0.0):
    """Symmetric quotes ``half_spread -/+ offset`` (BaselineAgents.py:34-42)."""
    return fixed_action_policy([half_spread - offset, half_spread + offset])


def random_policy(cfg: EnvConfig):
    """Uniform samples from the action space, shared across trajectories per
    step (BaselineAgents.py:15-22 repeats one sample over N)."""
    low, high = cfg.action_bounds()

    def policy(params, obs, state):
        key = jax.random.fold_in(state.key, state.step + (1 << 20))
        sample = jax.random.uniform(
            key, (1, len(low)), dtype=obs.dtype,
            minval=jnp.asarray(low), maxval=jnp.asarray(high),
        )
        return jnp.broadcast_to(sample, (obs.shape[0], len(low)))

    return policy


def human_policy(cfg: EnvConfig):
    """stdin-driven quotes, one pair broadcast to all trajectories
    (HumanAgent, BaselineAgents.py:45-49).  Host-side by nature — for
    interactive inspection only, not for jitted rollouts."""

    def policy(params, obs, state):
        bid = float(input(f"Current state is {np.asarray(obs[0])}. Midprice-bid half spread? "))
        ask = float(input(f"Current state is {np.asarray(obs[0])}. Ask-midprice half spread? "))
        return jnp.broadcast_to(jnp.asarray([bid, ask], dtype=obs.dtype), (obs.shape[0], 2))

    return policy


def no_market_order_policy(quote_policy):
    """Adapt a 2-column quoting policy to a limit-and-market-order env
    (action_dim=4) by forcing the market-order columns to zero — the
    natural closed-form baseline on ``get_cj_env``-style envs
    (experiments/helpers.py:21-60), since no closed form exists for the
    full limit+market problem.  Used by examples/train_canonical.py and
    examples/arrival_rate_sweep.py."""

    def policy(params, obs, state):
        q = quote_policy(params, obs, state)
        return jnp.concatenate([q, jnp.zeros_like(q)], axis=1)

    # A fixed inner policy stays fixed with zeroed MO columns — keep it
    # dispatchable to the fused fixed-policy kernel.
    from mbt_gym_tpu.dispatch import policy_meta, tag_policy

    inner = policy_meta(quote_policy)
    if inner is not None and inner.get("kind") == "fixed":
        tag_policy(
            policy, kind="fixed",
            action=tuple(inner["action"]) + (0.0,) * len(inner["action"]),
        )
    return policy


def expected_action(policy, params, obs, state, key, n_samples: int = 1000):
    """Monte-Carlo mean action of a stochastic policy (Agent.py:11-12).

    Stochastic policies in this framework derive randomness from
    ``state.key``/``state.step``; each sample re-keys the state so draws are
    independent.  Deterministic policies return their action unchanged."""
    import jax as _jax

    def one(k):
        sample_state = state._replace(key=k) if state is not None else None
        return policy(params, obs, sample_state)

    actions = _jax.vmap(one)(_jax.random.split(key, n_samples))
    return actions.mean(axis=0)


# ------------------------------------------------------------ Avellaneda-Stoikov
@dataclasses.dataclass(frozen=True)
class AvellanedaStoikovAgent:
    """AS-2008 closed-form market maker (BaselineAgents.py:52-83).

    Quotes a reservation-price skew ``q * gamma * sigma^2 * (T - t)`` plus
    half the optimal spread ``gamma sigma^2 (T-t) + (2/gamma) ln(1+gamma/k)``.
    Parameters are read off the env config (volatility from the midprice
    model, fill exponent from the fill model), as the reference does.
    """

    risk_aversion: float = 0.1
    volatility: float = 2.0
    fill_exponent: float = 1.5
    terminal_time: float = 1.0

    @classmethod
    def from_config(cls, cfg: EnvConfig, risk_aversion: float = 0.1) -> "AvellanedaStoikovAgent":
        return cls(
            risk_aversion=risk_aversion,
            volatility=cfg.dynamics.midprice_model.volatility,
            fill_exponent=cfg.dynamics.fill_probability_model.fill_exponent,
            terminal_time=cfg.terminal_time,
        )

    def policy(self):
        from mbt_gym_tpu.dispatch import tag_policy

        gamma, sigma, k, T = self.risk_aversion, self.volatility, self.fill_exponent, self.terminal_time

        def policy_fn(params, obs, state):
            inventory = obs[:, INVENTORY_INDEX]
            time = obs[:, TIME_INDEX]
            skew = inventory * gamma * sigma**2 * (T - time)
            if gamma == 0:
                spread = jnp.full_like(time, 2.0 / k)  # risk-neutral limit
            else:
                spread = gamma * sigma**2 * (T - time) + (2.0 / gamma) * np.log(1 + gamma / k)
            return jnp.stack([skew + spread / 2, -skew + spread / 2], axis=1)

        return tag_policy(policy_fn, kind="as_closed_form", agent=self)


# --------------------------------------------------------- Cartea-Jaimungal MM
@dataclasses.dataclass(frozen=True)
class CarteaJaimungalMmAgent:
    """CJP-2015 ch.10 closed-form market maker (BaselineAgents.py:86-170).

    The reference computes ``omega(t) = expm(A (T - t)) z`` per query with
    ``scipy.linalg.expm`` over a ``(2Q+1)^2`` tridiagonal matrix.  Here the
    whole ``h(t, q) = (1/kappa) ln omega`` surface is precomputed *once* on
    the episode's time grid via an eigendecomposition of A (one host-side
    ``eig`` + a matmul per time point), and the policy is a pure gather —
    the natural shape for a `scan`-resident TPU policy.
    """

    kappa: float
    phi: float
    alpha: float
    lambdas: Tuple[float, float]
    terminal_time: float
    n_steps: int
    max_inventory: int
    inventory_neutral: bool = False
    large_depth: float = 10_000.0

    @classmethod
    def from_config(cls, cfg: EnvConfig, max_inventory: Optional[int] = None) -> "CarteaJaimungalMmAgent":
        from mbt_gym_tpu import rewards as rw

        reward = cfg.reward_function
        inventory_neutral = isinstance(reward, rw.PnL)
        if not inventory_neutral:
            assert reward.inventory_exponent == 2.0, "Inventory exponent must be 2."
        return cls(
            kappa=cfg.dynamics.fill_probability_model.fill_exponent,
            phi=0.0 if inventory_neutral else reward.per_step_inventory_aversion,
            alpha=0.0 if inventory_neutral else reward.terminal_inventory_aversion,
            lambdas=tuple(cfg.dynamics.arrival_model.intensity),
            terminal_time=cfg.terminal_time,
            n_steps=cfg.n_steps,
            max_inventory=int(max_inventory if max_inventory is not None else cfg.max_inventory),
            inventory_neutral=inventory_neutral,
        )

    def _a_and_z(self):
        """Tridiagonal generator A and terminal vector z over the inventory
        grid [max_inventory, ..., -max_inventory] (BaselineAgents.py:147-159)."""
        q = self.max_inventory
        size = 2 * q + 1
        inventories = q - np.arange(size)
        a = np.zeros((size, size))
        a[np.arange(size), np.arange(size)] = -self.phi * self.kappa * inventories**2
        a[np.arange(size - 1), np.arange(1, size)] = self.lambdas[BID_INDEX] * np.exp(-1)
        a[np.arange(1, size), np.arange(size - 1)] = self.lambdas[ASK_INDEX] * np.exp(-1)
        z = np.exp(-self.alpha * self.kappa * inventories**2)
        return a, z

    def h_table(self, dtype=np.float64) -> np.ndarray:
        """(n_steps + 1, 2Q+1) table of h(t_i, q) on the episode time grid.

        Uses ``expm(A s) = V diag(e^{w s}) V^{-1}`` with one eigendecomposition,
        so the cost is O(T * Q^2) instead of T matrix exponentials.
        """
        a, z = self._a_and_z()
        w, v = np.linalg.eig(a)
        v_inv_z = np.linalg.solve(v, z)
        times_left = self.terminal_time - np.linspace(0.0, self.terminal_time, self.n_steps + 1)
        omega = np.real(np.exp(np.outer(times_left, w)) * v_inv_z[None, :] @ v.T)
        omega = np.maximum(omega, 1e-300)
        return (np.log(omega) / self.kappa).astype(dtype)

    def depth_table(self) -> np.ndarray:
        """(n_steps+1, 2Q+1, 2) table of [bid, ask] depths by (time, inventory
        index).  The reference's large-depth boundary override
        (BaselineAgents.py:131-137: ``h[idx+-1] == h[idx]`` after clipping)
        fires exactly at the clipped inventory bounds, so it is index-based
        and precomputable."""
        h = self.h_table()  # (T+1, 2Q+1)
        inv_k = 1.0 / self.kappa
        bid = inv_k - np.roll(h, -1, axis=1) + h
        bid[:, -1] = inv_k + self.large_depth  # q >= +Q: quote huge bid depth
        ask = inv_k - np.roll(h, 1, axis=1) + h
        ask[:, 0] = inv_k + self.large_depth  # q <= -Q: quote huge ask depth
        return np.stack([bid, ask], axis=2)

    def policy(self):
        from mbt_gym_tpu.dispatch import tag_policy

        if self.inventory_neutral:
            risk_neutral = 1.0 / self.kappa

            def policy_fn(params, obs, state):
                n = obs.shape[0]
                return jnp.full((n, 2), risk_neutral, dtype=obs.dtype)

            return tag_policy(policy_fn, kind="cj_closed_form", agent=self)

        q_max = self.max_inventory
        dt = self.terminal_time / self.n_steps
        size = 2 * q_max + 1
        depth_tab = jnp.asarray(self.depth_table(), dtype=jnp.float32)

        def policy_fn(params, obs, state):
            idx = jnp.clip(q_max + obs[:, INVENTORY_INDEX], 0, 2 * q_max).astype(jnp.int32)
            onehot = (idx[:, None] == jnp.arange(size, dtype=jnp.int32)[None, :]).astype(
                jnp.float32
            )
            if state is not None:
                # Rollout hot path: all trajectories share the clock
                # (TradingEnvironment.py:218-220) => scalar time index, one
                # dynamic row slice.  The per-env inventory lookup is a
                # one-hot matmul on the MXU — TPU gathers over (N,) indices
                # are far slower than a (N, 2Q+1)x(2Q+1, 2) contraction.
                t_idx = jnp.clip(
                    jnp.round(state.time[0] / dt).astype(jnp.int32), 0, depth_tab.shape[0] - 1
                )
                row = jax.lax.dynamic_index_in_dim(depth_tab, t_idx, axis=0, keepdims=False)
                return jnp.dot(onehot, row, preferred_element_type=jnp.float32).astype(obs.dtype)
            # Standalone use (state=None, e.g. policy-slice plots): rows may
            # carry different timestamps — the reference asserts uniform time
            # (BaselineAgents.py:118-120); here each row uses its own time
            # via a per-row table gather (slower, correct for any batch).
            t_idx = jnp.clip(
                jnp.round(obs[:, TIME_INDEX] / dt).astype(jnp.int32), 0, depth_tab.shape[0] - 1
            )
            rows = depth_tab[t_idx]  # (N, 2Q+1, 2)
            return jnp.einsum("ns,nsa->na", onehot, rows).astype(obs.dtype)

        return tag_policy(policy_fn, kind="cj_closed_form", agent=self)

    def true_value_function(self, obs) -> jax.Array:
        """Analytic value ``h(t, q) + cash + q * S`` — the CJP replication
        oracle (BaselineAgents.py:161-170)."""
        h_tab = jnp.asarray(self.h_table())
        dt = self.terminal_time / self.n_steps
        time = obs[:, TIME_INDEX]
        t_idx = jnp.clip(jnp.round(time / dt).astype(jnp.int32), 0, h_tab.shape[0] - 1)
        idx = jnp.clip(self.max_inventory + obs[:, INVENTORY_INDEX], 0, 2 * self.max_inventory).astype(jnp.int32)
        h_0 = jnp.take_along_axis(h_tab[t_idx], idx[:, None], axis=1)[:, 0]
        return h_0 + obs[:, CASH_INDEX] + obs[:, INVENTORY_INDEX] * obs[:, ASSET_PRICE_INDEX]


# --------------------------------------------------------- Cartea-Jaimungal OE
@dataclasses.dataclass(frozen=True)
class CarteaJaimungalOeAgent:
    """CJP-2015 p.147 closed-form optimal-execution schedule
    (BaselineAgents.py:173-210)."""

    phi: float = 2e-4
    alpha: float = 1e-4
    temporary_impact: float = 0.01
    permanent_impact: float = 0.01
    terminal_time: float = 1.0
    initial_inventory: float = 0.0

    @classmethod
    def from_config(cls, cfg: EnvConfig, phi: float = 2e-4, alpha: float = 1e-4) -> "CarteaJaimungalOeAgent":
        impact = cfg.dynamics.price_impact_model
        # The closed-form schedule needs one scalar q0 (BaselineAgents.py:200
        # reads env.initial_inventory directly and would fail on non-scalar
        # specs too): a (low, high) tuple uses the expectation of the
        # uniform-integer draw, (low + high - 1) / 2 (high exclusive,
        # TradingEnvironment.py:271-272); a callable is evaluated once.
        spec = cfg.initial_inventory
        if callable(spec):
            q0 = float(spec())
        elif isinstance(spec, tuple):
            q0 = (float(spec[0]) + float(spec[1]) - 1.0) / 2.0
        else:
            q0 = float(spec)
        return cls(
            phi=phi,
            alpha=alpha,
            temporary_impact=impact.temporary_impact_coefficient,
            permanent_impact=impact.permanent_impact_coefficient,
            terminal_time=cfg.terminal_time,
            initial_inventory=q0,
        )

    def policy(self):
        from mbt_gym_tpu.dispatch import tag_policy

        gamma = np.sqrt(self.phi / self.temporary_impact)
        root = np.sqrt(self.temporary_impact * self.phi)
        zeta = (self.alpha - 0.5 * self.permanent_impact + root) / (
            self.alpha - 0.5 * self.permanent_impact - root
        )
        q0, T = self.initial_inventory, self.terminal_time
        denom = zeta * np.exp(gamma * T) - np.exp(-gamma * T)

        def policy_fn(params, obs, state):
            time_left = T - obs[:, TIME_INDEX]
            speed = gamma * q0 * (zeta * jnp.exp(gamma * time_left) + jnp.exp(-gamma * time_left)) / denom
            return (-np.sign(q0) * speed)[:, None]

        return tag_policy(policy_fn, kind="oe_schedule", agent=self)
