"""Fused MLP-policy rollout kernel: the whole PPO data-collection episode
(policy forward + Gaussian sampling + env step) in one Pallas program,
with the per-step 256-wide activations resident in VMEM.

Why: in the XLA rollout (agents.ppo.collect_rollout) every step's hidden
activations (batch x 256) stream through HBM — ~131 ms of the 175 ms
config-5 rollout at 262k envs.  Here a tile of envs lives on the LANE
dimension and activations are computed transposed (``h = tanh(W^T @ X)``
with ``X (features, lanes)``), so the matmul chain never leaves VMEM and
only the fundamental per-step outputs (obs, action, log-prob, value,
reward ≈ 36 B/env-step) are written out.

Scope: the flagship market-making model family (BM midprice + Poisson
arrivals + exponential fill + limit-order dynamics) with PnL, CjMm, or
RunningInventoryPenalty rewards — i.e. both the bench_suite config-5
production path and the "learning to make a market" CJ training setting —
with the shared-trunk actor-critic of ``networks.init_actor_critic(
shared_trunk=True)``.  Other configs use the XLA rollout.  A noise-injectable mode runs under the Pallas interpreter on
CPU, and tests/test_pallas_rollout.py asserts parity against the XLA
engine + networks on the SAME noise.
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
from mbt_gym_tpu.ops.pallas_episode import _uniform_from_bits

LANES = 128
_LOG_2PI = math.log(2.0 * math.pi)
GROUP = 8  # f32 sublane granularity: packed channel groups align to it

# Injected-noise channel order (noise mode):
N_CHANNELS = 7  # u_arr_bid, u_arr_ask, u_fill_bid, u_fill_ask, eps0, eps1, n_mid


class MlpRolloutParams(NamedTuple):
    """Static scalars for the fused policy rollout (AS env contract,
    TradingEnvironment.py:103-110 order; normalisation per :112-126)."""

    n_steps: int
    dt: float
    drift: float
    volatility: float
    initial_price: float
    intensity_bid: float
    intensity_ask: float
    fill_exponent: float
    max_inventory: float
    max_cash: float
    initial_cash: float
    initial_inventory: float
    start_time: float
    obs_low: tuple  # (4,) cash, inventory, time, price
    obs_grad: tuple  # (high - low) / 2 per channel
    act_low: tuple  # (2,) bid/ask depth lower bounds
    act_grad: tuple
    normalise_obs: bool
    normalise_act: bool
    # reward: "pnl" (RewardFunctions.py:20-36), "cjmm" (pathwise CJ MM
    # criterion, :77-113) or "running" (RunningInventoryPenalty, :116-141),
    # all with inventory exponent 2.
    reward_kind: str = "pnl"
    phi: float = 0.0  # per-step inventory aversion
    alpha: float = 0.0  # terminal inventory aversion
    terminal_time: float = 1.0

    @property
    def run_steps(self) -> int:
        return self.n_steps - round(self.start_time / self.dt)


def rollout_params_from_config(cfg: EnvConfig) -> MlpRolloutParams:
    from mbt_gym_tpu.dynamics import LimitOrderDynamics
    from mbt_gym_tpu.processes.arrivals import PoissonArrivals
    from mbt_gym_tpu.processes.fills import ExponentialFill
    from mbt_gym_tpu.processes.midprice import BrownianMotionMidprice
    from mbt_gym_tpu.rewards import CjMmCriterion, PnL, RunningInventoryPenalty

    d = cfg.dynamics
    assert isinstance(d, LimitOrderDynamics), "fused rollout: limit-order dynamics only"
    assert isinstance(d.midprice_model, BrownianMotionMidprice)
    assert isinstance(d.arrival_model, PoissonArrivals)
    assert isinstance(d.fill_probability_model, ExponentialFill)
    r = cfg.reward_function
    if isinstance(r, PnL):
        reward_kind, phi, alpha = "pnl", 0.0, 0.0
    elif isinstance(r, CjMmCriterion) and r.inventory_exponent == 2.0:
        reward_kind = "cjmm"
        phi, alpha = r.per_step_inventory_aversion, r.terminal_inventory_aversion
    elif isinstance(r, RunningInventoryPenalty) and r.inventory_exponent == 2.0:
        reward_kind = "running"
        phi, alpha = r.per_step_inventory_aversion, r.terminal_inventory_aversion
    else:
        raise AssertionError(
            f"fused rollout supports PnL / CjMmCriterion / "
            f"RunningInventoryPenalty (exponent 2); got {r}"
        )
    assert cfg.reward_scaling is None
    assert not isinstance(cfg.initial_inventory, tuple) and not callable(cfg.initial_inventory)
    assert not isinstance(cfg.start_time, tuple) and not callable(cfg.start_time)
    assert cfg.dtype == "float32", (
        "fused rollout computes in float32/bf16; float64 reference-parity "
        "configs must use the XLA rollout"
    )
    obs_low, obs_high = cfg.observation_bounds()
    act_low, act_high = cfg.action_bounds()
    return MlpRolloutParams(
        n_steps=cfg.n_steps,
        dt=cfg.step_size,
        drift=d.midprice_model.drift,
        volatility=d.midprice_model.volatility,
        initial_price=d.midprice_model.initial_price,
        intensity_bid=d.arrival_model.intensity[0],
        intensity_ask=d.arrival_model.intensity[1],
        fill_exponent=d.fill_probability_model.fill_exponent,
        max_inventory=float(cfg.max_inventory),
        max_cash=float(cfg.resolved_max_cash()),
        initial_cash=float(cfg.initial_cash),
        initial_inventory=float(cfg.initial_inventory),
        start_time=round(float(cfg.start_time) / cfg.step_size) * cfg.step_size,
        obs_low=tuple(float(x) for x in obs_low),
        obs_grad=tuple(float(h - l) / 2.0 for l, h in zip(obs_low, obs_high)),
        act_low=tuple(float(x) for x in act_low),
        act_grad=tuple(float(h - l) / 2.0 for l, h in zip(act_low, act_high)),
        normalise_obs=bool(cfg.normalise_observation_space),
        normalise_act=bool(cfg.normalise_action_space),
        reward_kind=reward_kind,
        phi=phi,
        alpha=alpha,
        terminal_time=cfg.terminal_time,
    )


def transpose_params(params):
    """Host-side: shared-trunk actor-critic params -> the kernel's
    transposed weight list [(W^T, b_col), ...] + combined head (A+1 rows:
    pi rows then the vf row) + log_std column."""
    assert "shared" in params, "fused rollout requires the shared-trunk layout"
    trunk = [
        (layer["w"].T.astype(jnp.float32), layer["b"].reshape(-1, 1).astype(jnp.float32))
        for layer in params["shared"]
    ]
    w_head = jnp.concatenate(
        [params["pi_head"]["w"], params["vf_head"]["w"]], axis=1
    ).T.astype(jnp.float32)  # (A+1, H)
    b_head = jnp.concatenate(
        [params["pi_head"]["b"], params["vf_head"]["b"]]
    ).reshape(-1, 1).astype(jnp.float32)
    log_std = params["log_std"].reshape(-1, 1).astype(jnp.float32)
    return trunk, w_head, b_head, log_std


def _mmT(w, x, compute_dtype=jnp.bfloat16):
    """(rows, K) @ (K, L) on the MXU, bf16 in / f32 out."""
    return jax.lax.dot_general(
        w.astype(compute_dtype), x.astype(compute_dtype),
        dimension_numbers=((((1,), (0,))), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _rollout_step(p: MlpRolloutParams, n_layers, a_dim, refs, carry, t_val, draws,
                  is_last=None):
    """One fused policy+env step for a (.., L) lane tile.  ``draws`` is the
    7-channel tuple of N_CHANNELS; ``is_last`` (traced bool) marks the
    terminal step for the "running" reward.  Returns (new_carry, outputs)."""
    (trunk, w_head_ref, b_head_ref, lstd_ref) = refs
    cash, inv, price = carry
    L = cash.shape[-1]
    u_ab, u_aa, u_fb, u_fa, eps0, eps1, n_mid = draws

    # --- observation the policy sees (normalised per env flags) ---
    time_plane = jnp.full((1, L), t_val, jnp.float32)
    planes = [cash, inv, time_plane, price]
    if p.normalise_obs:
        planes = [
            (x - p.obs_low[c]) / p.obs_grad[c] - 1.0 for c, x in enumerate(planes)
        ]
    X = jnp.concatenate(planes, axis=0)  # (4, L)

    # --- policy/value forward, transposed ---
    h = X
    for li in range(n_layers):
        w_ref, b_ref = trunk[li]
        h = jnp.tanh(_mmT(w_ref[:], h) + b_ref[:])
    hd = _mmT(w_head_ref[:], h) + b_head_ref[:]  # (A+1, L)
    mean = hd[0:a_dim]
    value = hd[a_dim : a_dim + 1]

    # --- Gaussian sample; log-prob of the UNCLIPPED sample (SB3 convention) ---
    log_std = lstd_ref[:]  # (A, 1)
    eps = jnp.concatenate([eps0, eps1], axis=0)  # (A, L)
    action = mean + jnp.exp(log_std) * eps
    logp = jnp.sum(-0.5 * eps * eps - log_std, axis=0, keepdims=True) - (
        0.5 * _LOG_2PI * a_dim
    )

    # --- executed action: clip to the box, then to model units ---
    if p.normalise_act:
        clipped = jnp.clip(action, -1.0, 1.0)
        bid_depth = (clipped[0:1] + 1.0) * p.act_grad[0] + p.act_low[0]
        ask_depth = (clipped[1:2] + 1.0) * p.act_grad[1] + p.act_low[1]
    else:
        bid_depth = jnp.clip(action[0:1], p.act_low[0], p.act_low[0] + 2 * p.act_grad[0])
        ask_depth = jnp.clip(action[1:2], p.act_low[1], p.act_low[1] + 2 * p.act_grad[1])

    # --- env step (TradingEnvironment.py:198-216 order) ---
    k = p.fill_exponent
    arr_bid = (u_ab < p.intensity_bid * p.dt).astype(jnp.float32)
    arr_ask = (u_aa < p.intensity_ask * p.dt).astype(jnp.float32)
    fill_bid = (u_fb < jnp.exp(-k * bid_depth)).astype(jnp.float32)
    fill_ask = (u_fa < jnp.exp(-k * ask_depth)).astype(jnp.float32)
    fill_bid = fill_bid * (inv < p.max_inventory).astype(jnp.float32)
    fill_ask = fill_ask * (inv > -p.max_inventory).astype(jnp.float32)
    hit_bid = arr_bid * fill_bid
    hit_ask = arr_ask * fill_ask
    new_inv = inv + hit_bid - hit_ask
    new_cash = cash - hit_bid * (price - bid_depth) + hit_ask * (price + ask_depth)
    # Inventory/cash clipping BEFORE the reward, like env.step
    # (TradingEnvironment.py:283-297; clip_events diagnostics are an
    # XLA-engine feature — use it when the clip is expected to bind).
    new_inv = jnp.clip(new_inv, -p.max_inventory, p.max_inventory)
    new_cash = jnp.clip(new_cash, -p.max_cash, p.max_cash)
    new_price = price + p.drift * p.dt + (p.volatility * math.sqrt(p.dt)) * n_mid

    # Reward at the post-bookkeeping, post-price-move state (both sides
    # mark at their own price).  "cjmm": pathwise CJ criterion
    # (RewardFunctions.py:96-109 with exponent 2); "running": terminal
    # penalty at the last step only (:128-138).
    pnl = (new_cash + new_inv * new_price) - (cash + inv * price)
    if p.reward_kind == "pnl":
        reward = pnl
    elif p.reward_kind == "cjmm":
        episode_length = p.terminal_time - p.start_time
        const = p.alpha * p.dt * (p.initial_inventory**2) / episode_length
        reward = (
            pnl
            - p.dt * p.phi * new_inv * new_inv
            - p.alpha * (new_inv * new_inv - inv * inv)
            - const
        )
    else:  # "running"
        terminal = is_last.astype(jnp.float32)
        reward = (
            pnl
            - p.dt * p.phi * new_inv * new_inv
            - p.alpha * terminal * new_inv * new_inv
        )
    return (new_cash, new_inv, new_price), (X, action, logp, value, reward)


def _make_kernel(p: MlpRolloutParams, n_layers: int, a_dim: int, use_noise: bool):
    def kernel(*refs):
        it = iter(refs)
        if use_noise:
            noise_ref = next(it)
        else:
            seed_ref = next(it)
        trunk = [(next(it), next(it)) for _ in range(n_layers)]
        w_head_ref, b_head_ref, lstd_ref = next(it), next(it), next(it)
        obs_ref, act_ref, logp_ref, val_ref, rew_ref = (next(it) for _ in range(5))

        if not use_noise:
            # Two-component seed: (call seed, program id) gives each tile an
            # independent stream without the contiguous-block overlap of
            # `seed + program_id` across calls with nearby seeds.
            pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        L = obs_ref.shape[-1]

        def hw_draws():
            u = _uniform_from_bits(pltpu.prng_random_bits((4, L)))
            bm_u = _uniform_from_bits(pltpu.prng_random_bits((4, L)))
            r = jnp.sqrt(-2.0 * jnp.log(1.0 - bm_u[0:2]))
            theta = (2.0 * math.pi) * bm_u[2:4]
            cosz = r * jnp.cos(theta)  # (2, L): action eps
            sinz = r * jnp.sin(theta)  # (2, L): row 0 = midprice normal
            return (u[0:1], u[1:2], u[2:3], u[3:4], cosz[0:1], cosz[1:2], sinz[0:1])

        weight_refs = (trunk, w_head_ref, b_head_ref, lstd_ref)

        def body(i, carry):
            t_val = p.start_time + i.astype(jnp.float32) * p.dt
            if use_noise:
                draws = tuple(noise_ref[i, c : c + 1] for c in range(N_CHANNELS))
            else:
                draws = hw_draws()
            new_carry, (X, action, logp, value, reward) = _rollout_step(
                p, n_layers, a_dim, weight_refs, carry, t_val, draws,
                is_last=(i == p.run_steps - 1),
            )
            # Separate output buffers measured fastest (123 ms vs 174-198 ms
            # for packed-single-buffer variants at 262k envs); the 1-channel
            # streams write plain 2D (T, L) rows, so nothing pads anywhere.
            obs_ref[i] = X
            act_ref[i] = action
            logp_ref[i] = logp[0]
            val_ref[i] = value[0]
            rew_ref[i] = reward[0]
            return new_carry

        init = (
            jnp.full((1, L), p.initial_cash, jnp.float32),
            jnp.full((1, L), p.initial_inventory, jnp.float32),
            jnp.full((1, L), p.initial_price, jnp.float32),
        )
        jax.lax.fori_loop(0, p.run_steps, body, init)

    return kernel


def auto_tile(n: int, run_steps: int, has_noise: bool) -> int:
    """Widest lane tile whose double-buffered per-program output blocks
    (T x (S+A+3) x tile f32, plus the noise input block when injected)
    fit Mosaic's 16M scoped vmem with margin.  Lane width is the dominant
    rollout throughput lever — 1024 lanes measured 86.9 ms vs 165.4 ms at
    512 for the 52.4M-step config-5 rollout (scripts/exp_rollout_kernel.py);
    2048 exceeds scoped vmem at T=200."""
    budget = 15 * 1024 * 1024
    per_lane = 2 * run_steps * 4 * (S_DIM + A_DIM + 3 + (N_CHANNELS if has_noise else 0))
    for cand in (2048, 1024, 512, 256, 128):
        if cand <= n and n % cand == 0 and cand * per_lane <= budget:
            return cand
    return 128


@partial(
    jax.jit,
    static_argnames=("p", "num_trajectories", "tile", "interpret"),
)
def mlp_rollout_pallas(
    p: MlpRolloutParams,
    params,
    seed,
    num_trajectories: int,
    tile: int | None = None,
    interpret: bool = False,
    noise=None,
):
    """Run one full episode for all envs with the MLP policy fused in.

    Returns feature-major buffers (obs (T, S, N), actions (T, A, N),
    log_probs (T, N), values (T, N), rewards (T, N)) — envs on the minor
    dimension throughout, so nothing is lane-padded; the 2D single-channel
    streams avoid sublane padding too.

    ``noise`` (optional): (T, 7, N) injected channels (4 env uniforms, 2
    policy-sample normals, 1 midprice normal) replacing the hardware PRNG —
    the CPU-testable parity mode.
    """
    n = num_trajectories
    T = p.run_steps
    if tile is None:
        tile = auto_tile(n, T, noise is not None)
    assert n % tile == 0 and tile % LANES == 0, (n, tile)
    grid = n // tile
    trunk, w_head, b_head, log_std = transpose_params(params)
    n_layers = len(trunk)
    a_dim = w_head.shape[0] - 1

    def full(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))

    inputs = []
    in_specs = []
    if noise is None:
        inputs.append(jnp.asarray([seed], dtype=jnp.int32))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    else:
        noise = jnp.asarray(noise, jnp.float32)
        assert noise.shape == (T, N_CHANNELS, n), noise.shape
        inputs.append(noise)
        in_specs.append(pl.BlockSpec((T, N_CHANNELS, tile), lambda i: (0, 0, i)))
    for w, b in trunk:
        inputs += [w, b]
        in_specs += [full(w.shape), full(b.shape)]
    inputs += [w_head, b_head, log_std]
    in_specs += [full(w_head.shape), full(b_head.shape), full(log_std.shape)]

    s_dim = 4
    out_shape = [
        jax.ShapeDtypeStruct((T, s_dim, n), jnp.float32),  # obs
        jax.ShapeDtypeStruct((T, a_dim, n), jnp.float32),  # actions
        jax.ShapeDtypeStruct((T, n), jnp.float32),  # log-probs
        jax.ShapeDtypeStruct((T, n), jnp.float32),  # values
        jax.ShapeDtypeStruct((T, n), jnp.float32),  # rewards
    ]
    flat = pl.BlockSpec((T, tile), lambda i: (0, i))
    out_specs = [
        pl.BlockSpec((T, s_dim, tile), lambda i: (0, 0, i)),
        pl.BlockSpec((T, a_dim, tile), lambda i: (0, 0, i)),
        flat, flat, flat,
    ]
    kernel = _make_kernel(p, n_layers, a_dim, use_noise=noise is not None)
    # The plain HLO interpreter has no lowering for prng_seed; the hardware-
    # PRNG path on CPU needs the Mosaic TPU interpreter (which stubs random
    # bits to zeros — smoke-run only; use noise= for exact CPU validation).
    interp = interpret
    if interpret is True and noise is None:
        interp = pltpu.InterpretParams()
    obs_t, actions_t, log_probs, values, rewards = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interp,
    )(*inputs)
    return obs_t, actions_t, log_probs, values, rewards


S_DIM = 4  # AS env state columns (cash, inventory, time, price)
A_DIM = 2  # bid/ask depths


class TRolloutBatch(NamedTuple):
    """Feature-major rollout batch: envs stay on the MINOR dimension of
    every leaf, so nothing is lane-padded and no transpose is materialized
    (a (T, N, 4) f32 array pads 32x on TPU — 26.8 GB at pod batch)."""

    obs_t: jax.Array  # (T, S, N)
    actions_t: jax.Array  # (T, A, N)
    log_probs: jax.Array  # (T, N)
    values: jax.Array  # (T, N)
    rewards: jax.Array  # (T, N)
    advantages: jax.Array  # (T, N)
    returns: jax.Array  # (T, N)


def collect_rollout_fused_T(
    env_cfg: EnvConfig,
    params,
    key: jax.Array,
    gamma: float = 1.0,
    lam: float = 0.95,
    tile: int | None = None,
    interpret: bool = False,
    noise=None,
) -> TRolloutBatch:
    """Fused rollout in its native feature-major layout + shared GAE —
    the input to :func:`mbt_gym_tpu.ops.fused_ppo.ppo_fused_grads_T`."""
    from mbt_gym_tpu.agents.ppo import compute_gae

    p = rollout_params_from_config(env_cfg)
    seed = jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)
    obs_t, actions_t, log_probs, values, rewards = mlp_rollout_pallas(
        p, params, seed, env_cfg.num_trajectories, tile=tile,
        interpret=interpret, noise=noise,
    )
    last_value = jnp.zeros_like(values[0])
    advantages, returns = compute_gae(rewards, values, last_value, gamma, lam)
    return TRolloutBatch(
        obs_t=obs_t, actions_t=actions_t, log_probs=log_probs, values=values,
        rewards=rewards, advantages=advantages, returns=returns,
    )


def collect_rollout_fused(
    env_cfg: EnvConfig,
    params,
    key: jax.Array,
    gamma: float = 1.0,
    lam: float = 0.95,
    tile: int | None = None,
    interpret: bool = False,
    noise=None,
):
    """Drop-in replacement for ``agents.ppo.collect_rollout``: returns the
    row-major :class:`RolloutBatch`.  NOTE: the (T, N, S) transpose this
    materializes is lane-padded 32x at the consumer — fine for tests and
    small runs; at pod batch use :func:`collect_rollout_fused_T` + the
    transposed update kernel (what ``train_iteration`` does when both
    fused flags are set)."""
    from mbt_gym_tpu.agents.ppo import RolloutBatch

    tb = collect_rollout_fused_T(
        env_cfg, params, key, gamma=gamma, lam=lam, tile=tile,
        interpret=interpret, noise=noise,
    )
    return RolloutBatch(
        obs=jnp.swapaxes(tb.obs_t, 1, 2), actions=jnp.swapaxes(tb.actions_t, 1, 2),
        log_probs=tb.log_probs, values=tb.values, rewards=tb.rewards,
        advantages=tb.advantages, returns=tb.returns,
    )
