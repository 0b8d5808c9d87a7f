"""TPU-native trading environment core (counterpart of
``mbt_gym/gym/TradingEnvironment.py``).

Design: the reference's stateful ``gym.Env`` stepping a shared NumPy matrix
becomes a pair of pure functions over a static :class:`EnvConfig`:

    reset(cfg, key)            -> (EnvState, obs)
    step(cfg, state, action)   -> StepResult(state', obs, reward, done)

Everything inside ``step`` is one fused XLA computation: arrivals -> fills ->
max-inventory masking -> wealth bookkeeping -> clip -> time bump -> process
updates -> reward -> observation, exactly the reference's operation order
(TradingEnvironment.py:103-110,198-216).  Randomness is counter-based
(``fold_in(key, step)``) by default; passing an explicit ``noise`` instead
reproduces the reference's NumPy draw order bit-for-bit (see
``mbt_gym_tpu/ops/compat.py``).
"""
from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from mbt_gym_tpu.dynamics import DynamicsBase, LimitOrderDynamics
from mbt_gym_tpu.processes.arrivals import PoissonArrivals
from mbt_gym_tpu.processes.fills import ExponentialFill
from mbt_gym_tpu.processes.midprice import BrownianMotionMidprice
from mbt_gym_tpu.rewards import AgentStateView, PnL, RewardAux
from mbt_gym_tpu.types import EnvState, SlotNoise, StepNoise, StepResult


def default_dynamics() -> LimitOrderDynamics:
    """The reference's default model composition (TradingEnvironment.py:51-63):
    BM midprice + Poisson(100, 100) arrivals + exponential fill."""
    return LimitOrderDynamics(
        midprice_model=BrownianMotionMidprice(),
        arrival_model=PoissonArrivals(intensity=(100.0, 100.0)),
        fill_probability_model=ExponentialFill(),
    )


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    """Static environment configuration (hashable -> usable as a jit static
    argument; XLA constant-folds every parameter).

    ``initial_inventory`` is an int (deterministic), an ``(low, high)``
    tuple sampled uniformly at reset exclusive of ``high``, or a zero-arg
    callable evaluated on the host at each reset
    (TradingEnvironment.py:270-281).  ``start_time`` is a float, a
    ``("uniform", low, high)`` spec drawn once per reset and quantised to the
    step grid, or a zero-arg callable (TradingEnvironment.py:257-268).

    Callable specs are host-side by nature: the stateful adapters
    (``gym_compat``) evaluate them per reset via
    :func:`resolve_reset_overrides` and feed the values to :func:`reset` as
    *traced* override arguments, so the jitted reset is compiled once and the
    per-episode values stream in as inputs.  Calling a jitted ``reset``
    directly with a callable spec and no override would freeze the
    trace-time draw, so :func:`reset` rejects that combination.
    """

    dynamics: DynamicsBase = None
    reward_function: object = PnL()
    terminal_time: float = 1.0
    n_steps: int = 200
    initial_cash: float = 0.0
    initial_inventory: Union[int, Tuple[float, float], Callable[[], float]] = 0
    max_inventory: float = 10_000.0
    max_cash: Optional[float] = None
    max_stock_price: Optional[float] = None
    start_time: Union[float, Tuple[str, float, float], Callable[[], float]] = 0.0
    num_trajectories: int = 1000
    normalise_action_space: bool = False
    normalise_observation_space: bool = False
    reward_scaling: Optional[float] = None  # None = no reward normalisation
    dtype: str = "float32"
    # Repo addition (NOT reference behavior): block unit market orders at
    # the +/- max_inventory boundary, with the same at-boundary convention
    # as the limit-fill mask (TradingEnvironment.py:323-327 masks only
    # limit fills; market orders pass and the independent inventory/cash
    # clips at :283-289 keep the cash — a money-pump exploit RL discovers,
    # see tests/test_env_features.py::
    # test_market_order_money_pump_is_reference_faithful).  Default False
    # preserves the reference mechanics bitwise.
    mask_market_orders_at_max_inventory: bool = False

    def __post_init__(self):
        if self.dynamics is None:
            object.__setattr__(self, "dynamics", default_dynamics())
        self.dynamics.validate()
        if self.mask_market_orders_at_max_inventory:
            from mbt_gym_tpu.dynamics import LimitAndMarketOrderDynamics

            assert isinstance(self.dynamics, LimitAndMarketOrderDynamics), (
                "mask_market_orders_at_max_inventory only applies to "
                "LimitAndMarketOrderDynamics (the only dynamics with market "
                "orders)."
            )
        if self.normalise_action_space:
            from mbt_gym_tpu.dynamics import AtTheTouchDynamics

            assert not isinstance(self.dynamics, AtTheTouchDynamics), (
                "AtTheTouchDynamics takes binary post decisions (MultiBinary in the "
                "reference, ModelDynamics.py:166-167); normalising them would corrupt "
                "fills — use normalise_action_space=False."
            )
            lo, hi = self.dynamics.action_bounds()
            assert all(h > l for l, h in zip(lo, hi)), "Cannot normalise a degenerate action space."
        if self.normalise_observation_space:
            lo, hi = self.observation_bounds()
            assert (hi > lo).all(), (
                "Cannot normalise a degenerate observation space (a process "
                "with equal min/max bounds, e.g. ConstantMidprice, would "
                "divide by zero; the reference silently produces inf there)."
            )

    # ------------------------------------------------------------------ misc
    @property
    def step_size(self) -> float:
        return self.terminal_time / self.n_steps

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    @property
    def state_dim(self) -> int:
        return 3 + sum(p.state_dim for _, p in self.dynamics.processes())

    @property
    def action_dim(self) -> int:
        return self.dynamics.action_dim

    def resolved_max_stock_price(self) -> float:
        if self.max_stock_price is not None:
            return self.max_stock_price
        # Default: midprice model's upper bound (TradingEnvironment.py:75).
        return self.dynamics.midprice_model.bounds()[1][0]

    def resolved_max_cash(self) -> float:
        if self.max_cash is not None:
            return self.max_cash
        return self.n_steps * self.resolved_max_stock_price()  # TradingEnvironment.py:229-230

    def observation_bounds(self) -> Tuple[np.ndarray, np.ndarray]:
        """(low, high) (S,) arrays; parity with TradingEnvironment.py:232-241."""
        low = [-self.resolved_max_cash(), -self.max_inventory, 0.0]
        high = [self.resolved_max_cash(), self.max_inventory, self.terminal_time]
        for _, proc in self.dynamics.processes():
            b_lo, b_hi = proc.bounds()
            low.extend(b_lo)
            high.extend(b_hi)
        return np.asarray(low, dtype=self.dtype), np.asarray(high, dtype=self.dtype)

    def action_bounds(self) -> Tuple[np.ndarray, np.ndarray]:
        lo, hi = self.dynamics.action_bounds()
        return np.asarray(lo, dtype=self.dtype), np.asarray(hi, dtype=self.dtype)


# --------------------------------------------------------------------- noise
@lru_cache(maxsize=None)
def noise_specs(cfg: EnvConfig) -> Tuple[Tuple[str, Tuple[int, int]], ...]:
    """Per-slot (name, (n_normal, n_uniform)) noise requirements per step."""
    return tuple((name, proc.noise_spec()) for name, proc in cfg.dynamics.processes())


def draw_step_noise(cfg: EnvConfig, key: jax.Array, n: int) -> StepNoise:
    """Counter-based native noise for one step.

    All slots' normal columns come from ONE batched draw and all uniform
    columns from a second (two threefry invocations per step instead of one
    or two per slot) — the per-column assignment is fixed by slot order, so
    results are deterministic in (key, config) even though the stream layout
    differs from per-slot draws."""
    dtype = cfg.jdtype
    specs = noise_specs(cfg)
    total_norm = sum(s[1][0] for s in specs)
    total_unif = sum(s[1][1] for s in specs)
    normals = (
        jax.random.normal(jax.random.fold_in(key, 0), (n, total_norm), dtype=dtype)
        if total_norm
        else None
    )
    uniforms = (
        jax.random.uniform(jax.random.fold_in(key, 1), (n, total_unif), dtype=dtype)
        if total_unif
        else None
    )
    slots = []
    i_n = i_u = 0
    for _, (n_norm, n_unif) in specs:
        slots.append(
            SlotNoise(
                normal=normals[:, i_n : i_n + n_norm] if n_norm else None,
                uniform=uniforms[:, i_u : i_u + n_unif] if n_unif else None,
            )
        )
        i_n += n_norm
        i_u += n_unif
    return tuple(slots)


def _noise_dict(cfg: EnvConfig, noise: StepNoise):
    return {name: slot for (name, _), slot in zip(noise_specs(cfg), noise)}


# --------------------------------------------------------------------- reset
def resolve_reset_overrides(cfg: EnvConfig):
    """Host-evaluate callable ``start_time`` / ``initial_inventory`` specs
    for ONE reset (TradingEnvironment.py:257-281: ``self.start_time()``
    quantised to the grid; ``self.initial_inventory()`` rounded when the
    dynamics says so).  Returns ``(start_time, initial_inventory)``, each
    ``None`` when the spec is not callable; pass the result to
    :func:`reset`'s override arguments (they are traced, so the jit cache is
    keyed only on shapes, not the per-episode values)."""
    start = None
    inventory = None
    if callable(cfg.start_time):
        raw = float(cfg.start_time())
        assert 0.0 <= raw < cfg.terminal_time, (
            "Start time is not within (0, env.terminal_time)."  # TradingEnvironment.py:267
        )
        start = round(raw / cfg.step_size) * cfg.step_size
    if callable(cfg.initial_inventory):
        v = np.asarray(cfg.initial_inventory(), dtype=np.float64)
        if cfg.dynamics.round_initial_inventory:
            v = np.round(v)  # TradingEnvironment.py:277-279
        inventory = np.broadcast_to(v, (cfg.num_trajectories,)).astype(cfg.dtype)
    return start, inventory


def reset(
    cfg: EnvConfig,
    key: jax.Array,
    start_time: Optional[jax.Array] = None,
    initial_inventory: Optional[jax.Array] = None,
) -> Tuple[EnvState, jax.Array]:
    """Build the initial :class:`EnvState` and observation
    (parity with TradingEnvironment.initial_state, :131-140, and reset, :96-101).

    ``start_time`` / ``initial_inventory`` override the config's specs with
    concrete per-reset values (scalar; (N,) array) — used for callable specs
    (see :func:`resolve_reset_overrides`) and for reference reset-draw
    replay (``ops.compat.reference_initial_inventory``).
    """
    dtype = cfg.jdtype
    n = cfg.num_trajectories
    reset_key, inv_key, time_key, rollout_key = jax.random.split(key, 4)
    del reset_key

    # Start time: scalar, shared by all trajectories, quantised to the grid.
    if start_time is not None:
        start_time = jnp.asarray(start_time, dtype=dtype)
    elif callable(cfg.start_time):
        raise TypeError(
            "Callable start_time must be host-evaluated per reset: pass "
            "resolve_reset_overrides(cfg) results as reset(...) overrides "
            "(the gym_compat adapters do this automatically)."
        )
    elif isinstance(cfg.start_time, tuple):
        tag, lo, hi = cfg.start_time
        assert tag == "uniform", f"Unknown start_time spec {cfg.start_time}"
        raw = jax.random.uniform(time_key, (), dtype=dtype, minval=lo, maxval=hi)
        start_time = jnp.round(raw / cfg.step_size) * cfg.step_size
    else:
        start_time = jnp.asarray(
            round(float(cfg.start_time) / cfg.step_size) * cfg.step_size, dtype=dtype
        )

    if initial_inventory is not None:
        inventory = jnp.broadcast_to(
            jnp.asarray(initial_inventory, dtype=dtype), (n,)
        )
    elif callable(cfg.initial_inventory):
        raise TypeError(
            "Callable initial_inventory must be host-evaluated per reset: "
            "pass resolve_reset_overrides(cfg) results as reset(...) "
            "overrides (the gym_compat adapters do this automatically)."
        )
    elif isinstance(cfg.initial_inventory, tuple):
        lo, hi = cfg.initial_inventory
        inventory = jax.random.randint(inv_key, (n,), int(lo), int(hi)).astype(dtype)
    else:
        inventory = jnp.full((n,), float(cfg.initial_inventory), dtype=dtype)

    state = EnvState(
        cash=jnp.full((n,), cfg.initial_cash, dtype=dtype),
        inventory=inventory,
        time=jnp.broadcast_to(start_time, (n,)).astype(dtype),
        process_states=tuple(p.initial_state(n, dtype) for _, p in cfg.dynamics.processes()),
        step=jnp.zeros((), jnp.int32),
        key=rollout_key,
        initial_inventory=inventory,
        start_time=start_time,
        clip_events=jnp.zeros((), jnp.int32),
    )
    return state, observe(cfg, state)


# ----------------------------------------------------------------------- obs
def raw_observation(cfg: EnvConfig, state: EnvState) -> jax.Array:
    """(N, S) state matrix in the reference's column convention."""
    cols = [state.cash[:, None], state.inventory[:, None], state.time[:, None]]
    for arr in state.process_states:
        if arr.shape[1]:
            cols.append(arr)
    return jnp.concatenate(cols, axis=1)


def observe(cfg: EnvConfig, state: EnvState) -> jax.Array:
    obs = raw_observation(cfg, state)
    if cfg.normalise_observation_space:
        low, high = cfg.observation_bounds()
        gradient = (high - low) / 2
        obs = (obs - low) / gradient - 1.0  # TradingEnvironment.py:112-118
    return obs


def denormalise_action(cfg: EnvConfig, action: jax.Array) -> jax.Array:
    if not cfg.normalise_action_space:
        return action
    low, high = cfg.action_bounds()
    gradient = (high - low) / 2
    return (action + 1.0) * gradient + low  # TradingEnvironment.py:120-126


def normalise_action(cfg: EnvConfig, action: jax.Array) -> jax.Array:
    if not cfg.normalise_action_space:
        return action
    low, high = cfg.action_bounds()
    gradient = (high - low) / 2
    return (action - low) / gradient - 1.0


# ---------------------------------------------------------------------- step
def step(
    cfg: EnvConfig,
    state: EnvState,
    action: jax.Array,
    noise: Optional[StepNoise] = None,
) -> StepResult:
    """One fused environment step for all N trajectories.

    ``action`` is (N, A) in the (possibly normalised) action space.  When
    ``noise`` is None, counter-based noise is derived from
    ``fold_in(state.key, state.step)``; an explicit ``noise`` enables
    reference-exact replay and reuse under custom schedules.
    """
    dtype = cfg.jdtype
    dt = cfg.step_size
    dynamics = cfg.dynamics
    action = jnp.asarray(action, dtype=dtype)
    n = state.cash.shape[0]
    assert action.shape == (n, dynamics.action_dim), (
        f"Action must have shape ({n}, {dynamics.action_dim}); got {action.shape}."
    )
    action = denormalise_action(cfg, action)

    if cfg.mask_market_orders_at_max_inventory:
        # Repo addition (see EnvConfig): zero the MO trigger columns where
        # the unit order would cross +/- max_inventory, with the same
        # strict at-boundary convention as the limit-fill mask below (a
        # buy is blocked AT +max, a sell AT -max).  Masking the action
        # itself keeps the dynamics' bookkeeping untouched and models the
        # exchange rejecting the order.
        can_buy = (state.inventory < cfg.max_inventory).astype(dtype)
        can_sell = (state.inventory > -cfg.max_inventory).astype(dtype)
        action = jnp.concatenate(
            [
                action[:, :2],
                action[:, 2:3] * can_buy[:, None],
                action[:, 3:4] * can_sell[:, None],
            ],
            axis=1,
        )

    if noise is None:
        noise = draw_step_noise(cfg, jax.random.fold_in(state.key, state.step), state.cash.shape[0])
    noises = _noise_dict(cfg, noise)

    slot_names = tuple(name for name, _ in dynamics.processes())
    proc_state_map = dict(zip(slot_names, state.process_states))
    midprice = proc_state_map["midprice_model"][:, 0]

    current = AgentStateView(cash=state.cash, inventory=state.inventory, time=state.time, price=midprice)

    # 1. arrivals & fills (RNG draw order parity: arrival uniforms then fill
    #    uniforms, TradingEnvironment.py:198-204 / ModelDynamics.py:127-131).
    arrivals, fills = dynamics.get_arrivals_and_fills(proc_state_map, action, noises, dt)

    # 2. mask fills that would push inventory beyond +/- max_inventory
    #    (TradingEnvironment.py:323-327): at max blocks bid fills, at min asks.
    if fills is not None:
        at_max = (state.inventory >= cfg.max_inventory).astype(dtype)
        at_min = (state.inventory <= -cfg.max_inventory).astype(dtype)
        fills = fills * jnp.stack([1.0 - at_max, 1.0 - at_min], axis=1)

    # 3. wealth bookkeeping at the *pre-update* midprice, then clip, then time
    #    bump (TradingEnvironment.py:213-216).
    new_cash, new_inventory = dynamics.update_agent(
        state.cash, state.inventory, midprice, proc_state_map, action, arrivals, fills, dt
    )
    max_cash = cfg.resolved_max_cash()
    clipped_inventory = jnp.clip(new_inventory, -cfg.max_inventory, cfg.max_inventory)
    clipped_cash = jnp.clip(new_cash, -max_cash, max_cash)
    clip_events = state.clip_events + jnp.any(
        (clipped_inventory != new_inventory) | (clipped_cash != new_cash)
    ).astype(jnp.int32)
    new_time = state.time + dt

    # 4. advance the stochastic processes (midprice moves *after* bookkeeping,
    #    TradingEnvironment.py:206-211).
    new_proc_states = tuple(
        proc.update(proc_state_map[name], arrivals, fills, action, noises[name], dt)
        for name, proc in dynamics.processes()
    )

    new_state = EnvState(
        cash=clipped_cash,
        inventory=clipped_inventory,
        time=new_time,
        process_states=new_proc_states,
        step=state.step + 1,
        key=state.key,
        initial_inventory=state.initial_inventory,
        start_time=state.start_time,
        clip_events=clip_events,
    )

    # 5. all-or-nothing done on the shared clock (TradingEnvironment.py:218-220).
    done_scalar = new_time[0] >= cfg.terminal_time - dt / 2
    done = jnp.broadcast_to(done_scalar, new_time.shape)

    # 6. reward on (pre, post) state views (TradingEnvironment.py:105-108).
    new_midprice = new_proc_states[0][:, 0]
    nxt = AgentStateView(cash=clipped_cash, inventory=clipped_inventory, time=new_time, price=new_midprice)
    aux = RewardAux(
        initial_inventory=state.initial_inventory,
        episode_length=jnp.asarray(cfg.terminal_time, dtype) - state.start_time,
    )
    reward = cfg.reward_function.calculate(current, action, nxt, done_scalar, aux)
    if cfg.reward_scaling is not None:
        reward = cfg.reward_scaling * reward

    return StepResult(state=new_state, obs=observe(cfg, new_state), reward=reward, done=done)
