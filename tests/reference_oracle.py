"""A compact, self-contained NumPy oracle reproducing the reference
(JJJerome/mbt_gym) limit-order environment's exact behavior — RNG stream
layout, draw order, and operation order — for seed-exactness tests.

Behavior contract being mirrored (citations into /root/reference):
- per-process PCG64 streams seeded ``seed + slot + 1`` with slots ordered
  midprice, arrival, fill (TradingEnvironment.py:345-348, :303-309);
- per step: arrival uniforms (N,2) then fill uniforms (N,2) then the
  midprice normal (N,1) (TradingEnvironment.py:198-211);
- fills masked at +/- max inventory (:323-327), wealth bookkeeping with the
  [-1, +1] fill multiplier (ModelDynamics.py:108-116), clipping (:283-297),
  time bump, then the midprice Euler step (midprice_models.py:60-65).

The reference package itself is not importable here (gym/SB3 are absent), so
this oracle *is* the executable specification the engine is tested against.
"""
from __future__ import annotations

import numpy as np


def oracle_limit_order_rollout(
    policy,
    seed: int,
    num_trajectories: int = 1000,
    n_steps: int = 200,
    terminal_time: float = 1.0,
    initial_price: float = 100.0,
    drift: float = 0.0,
    volatility: float = 2.0,
    intensity=(140.0, 140.0),
    fill_exponent: float = 1.5,
    max_inventory: float = 200.0,
    initial_inventory: float = 0.0,
    initial_cash: float = 0.0,
    reward: str = "pnl",
    phi: float = 0.01,
    alpha: float = 0.001,
):
    """Roll one episode; returns dict of stacked float64 buffers.

    ``policy(obs (N,4)) -> (N,2)`` with obs columns (cash, inventory, time,
    price).  ``reward`` is "pnl" or "cjmm".
    """
    n = num_trajectories
    dt = terminal_time / n_steps
    rng_mid = np.random.default_rng(seed + 1)
    rng_arr = np.random.default_rng(seed + 2)
    rng_fill = np.random.default_rng(seed + 3)

    cash = np.full(n, initial_cash, dtype=np.float64)
    inventory = np.full(n, float(initial_inventory), dtype=np.float64)
    time = np.zeros(n, dtype=np.float64)
    price = np.full(n, initial_price, dtype=np.float64)
    fill_mult = np.concatenate([-np.ones((n, 1)), np.ones((n, 1))], axis=1)
    intensity = np.asarray(intensity, dtype=np.float64)
    max_cash = n_steps * (initial_price + 4 * volatility * np.sqrt(terminal_time))
    initial_inv_vec = inventory.copy()
    episode_length = terminal_time

    obs_buf = np.zeros((n_steps + 1, n, 4))
    act_buf = np.zeros((n_steps, n, 2))
    rew_buf = np.zeros((n_steps, n))
    obs_buf[0] = np.stack([cash, inventory, time, price], axis=1)

    for t in range(n_steps):
        obs = np.stack([cash, inventory, time, price], axis=1)
        action = policy(obs)
        depths = action[:, 0:2]

        arrivals = rng_arr.uniform(size=(n, 2)) < intensity * dt
        fills = rng_fill.uniform(size=(n, 2)) < np.exp(-fill_exponent * depths)
        at_max = inventory >= max_inventory
        at_min = inventory <= -max_inventory
        fills = fills * np.stack([1 - at_max, 1 - at_min], axis=1).astype(np.float64)

        prev_cash, prev_inv, prev_time, prev_price = cash.copy(), inventory.copy(), time.copy(), price.copy()
        inventory = inventory + np.sum(arrivals * fills * -fill_mult, axis=1)
        cash = cash + np.sum(fill_mult * arrivals * fills * (price[:, None] + depths * fill_mult), axis=1)
        inventory = np.clip(inventory, -max_inventory, max_inventory)
        cash = np.clip(cash, -max_cash, max_cash)
        time = time + dt
        price = (
            price + drift * dt + volatility * np.sqrt(dt) * rng_mid.normal(size=(n, 1))[:, 0]
        )

        pnl = (cash + inventory * price) - (prev_cash + prev_inv * prev_price)
        if reward == "pnl":
            rew = pnl
        elif reward == "cjmm":
            step_dt = time - prev_time
            rew = (
                pnl
                - step_dt * phi * inventory**2
                - alpha * (inventory**2 - prev_inv**2 + step_dt / episode_length * initial_inv_vec**2)
            )
        else:
            raise ValueError(reward)

        obs_buf[t + 1] = np.stack([cash, inventory, time, price], axis=1)
        act_buf[t] = action
        rew_buf[t] = rew

    return {"observations": obs_buf, "actions": act_buf, "rewards": rew_buf}


def oracle_speed_rollout(
    policy,
    seed: int,
    num_trajectories: int = 64,
    n_steps: int = 50,
    terminal_time: float = 1.0,
    initial_price: float = 100.0,
    drift: float = 0.0,
    volatility: float = 2.0,
    temporary_impact: float = 0.01,
    permanent_impact: float = 0.01,
    initial_inventory: float = 10.0,
    phi: float = 2e-4,
    alpha: float = 0.01,
    max_inventory: float = 10_000.0,
):
    """Speed-dynamics (optimal execution) mirror: TradinghWithSpeedModelDynamics
    bookkeeping (ModelDynamics.py:262-267), TemporaryAndPermanentPriceImpact
    recursion (price_impact_models.py:88-92), CjOeCriterion reward
    (RewardFunctions.py:55-70).  RNG stream: only the midprice draws
    (slot 0 -> seed+1); the impact model has no noise (slot 1)."""
    n = num_trajectories
    dt = terminal_time / n_steps
    rng_mid = np.random.default_rng(seed + 1)

    cash = np.zeros(n)
    inventory = np.full(n, float(initial_inventory))
    time = np.zeros(n)
    price = np.full(n, initial_price)
    impact_state = np.zeros(n)
    q0 = inventory.copy()
    episode_length = terminal_time

    obs_buf = np.zeros((n_steps + 1, n, 5))
    rew_buf = np.zeros((n_steps, n))
    obs_buf[0] = np.stack([cash, inventory, time, price, impact_state], axis=1)

    for t in range(n_steps):
        obs = np.stack([cash, inventory, time, price, impact_state], axis=1)
        action = policy(obs)  # (n, 1) signed speed
        speed = action[:, 0]

        prev = (cash.copy(), inventory.copy(), time.copy(), price.copy())
        exec_price = price + (temporary_impact * speed + impact_state)
        volume = speed * dt
        cash = cash - volume * exec_price
        inventory = inventory + volume
        # per-step clipping, as the reference env applies to ALL dynamics
        # (TradingEnvironment.py:216, 283-297)
        inventory = np.clip(inventory, -max_inventory, max_inventory)
        cash = np.clip(cash, -n_steps * (initial_price + 4 * volatility * np.sqrt(terminal_time)),
                       n_steps * (initial_price + 4 * volatility * np.sqrt(terminal_time)))
        time = time + dt
        # market update order: midprice first, then impact (slot order)
        price = price + drift * dt + volatility * np.sqrt(dt) * rng_mid.normal(size=(n, 1))[:, 0]
        impact_state = impact_state + permanent_impact * speed * dt

        pnl = (cash + inventory * price) - (prev[0] + prev[1] * prev[3])
        step_dt = time - prev[2]
        rew = (
            pnl
            - step_dt * phi * inventory**2
            - step_dt * alpha * (2.0 * speed * prev[1] + q0**2 * episode_length)
        )
        obs_buf[t + 1] = np.stack([cash, inventory, time, price, impact_state], axis=1)
        rew_buf[t] = rew

    return {"observations": obs_buf, "rewards": rew_buf}
