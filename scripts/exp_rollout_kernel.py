"""Microbenchmark variants of the fused MLP rollout kernel at production
config-5 shapes (T=200, N=262144, H=256).  Goal: attribute the gap between
the measured rollout (~170 ms) and the pure policy-forward floor (~77 ms
at L=2048 in exp_update_kernel.py) to PRNG/transcendentals vs env VPU ops
vs output writes vs lane width.

Variants (each chained x3, one scalar fetch):
  base512 / base1024 / base256   production kernel at that lane tile
  noprng512    full step but draws come from one pre-step PRNG call whose
               bits are reused every step (isolates Box-Muller + bits cost)
  prngonly512  PRNG draws summed into one output row, no policy/env
  nowrite512   full compute, only the reward stream written
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from mbt_gym_tpu.agents import networks
from mbt_gym_tpu.ops import pallas_rollout as pr
from mbt_gym_tpu.utils.config import as_env_config

import dataclasses
import math
from functools import partial

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, N, H = 200, 1 << 18, 256


def log(*a):
    print(*a, flush=True)


def build(env_cfg, params, tile, mode):
    """mode: 'base' | 'noprng' | 'prngonly' | 'nowrite'"""
    p = pr.rollout_params_from_config(env_cfg)
    trunk, w_head, b_head, log_std, _split = pr.transpose_params(params)
    n_layers = len(trunk)
    a_dim = w_head.shape[0] - 1

    def kernel(*refs):
        it = iter(refs)
        seed_ref = next(it)
        trunk_refs = [(next(it), next(it)) for _ in range(n_layers)]
        w_head_ref, b_head_ref, lstd_ref = next(it), next(it), next(it)
        outs = [next(it) for _ in range(5)]
        obs_ref, act_ref, logp_ref, val_ref, rew_ref = outs

        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        L = rew_ref.shape[-1]

        def hw_draws():
            from mbt_gym_tpu.ops.pallas_episode import _uniform_from_bits

            u = _uniform_from_bits(pltpu.prng_random_bits((4, L)))
            bm_u = _uniform_from_bits(pltpu.prng_random_bits((4, L)))
            r = jnp.sqrt(-2.0 * jnp.log(1.0 - bm_u[0:2]))
            theta = (2.0 * math.pi) * bm_u[2:4]
            cosz = r * jnp.cos(theta)
            sinz = r * jnp.sin(theta)
            return (u[0:1], u[1:2], u[2:3], u[3:4], cosz[0:1], cosz[1:2], sinz[0:1])

        weight_refs = (trunk_refs, w_head_ref, b_head_ref, lstd_ref)

        if mode == "prngonly":
            def body(i, carry):
                d = hw_draws()
                rew_ref[i] = sum(x[0] for x in d)
                return carry

            jax.lax.fori_loop(0, p.run_steps, body, jnp.zeros((1, L)))
            obs_ref[...] = jnp.zeros_like(obs_ref)
            act_ref[...] = jnp.zeros_like(act_ref)
            logp_ref[...] = jnp.zeros_like(logp_ref)
            val_ref[...] = jnp.zeros_like(val_ref)
            return

        fixed = hw_draws() if mode == "noprng" else None

        def body(i, carry):
            t_val = p.start_time + i.astype(jnp.float32) * p.dt
            draws = fixed if mode == "noprng" else hw_draws()
            new_carry, (X, action, logp, value, reward) = pr._rollout_step(
                p, n_layers, a_dim, weight_refs, carry, t_val, draws,
                is_last=(i == p.run_steps - 1),
            )
            if mode == "nowrite":
                rew_ref[i] = reward[0] + value[0] + logp[0] + X[0] + action[0]
            else:
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
        if mode == "nowrite":
            obs_ref[...] = jnp.zeros_like(obs_ref)
            act_ref[...] = jnp.zeros_like(act_ref)
            logp_ref[...] = jnp.zeros_like(logp_ref)
            val_ref[...] = jnp.zeros_like(val_ref)

    def full(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))

    inputs = [jnp.asarray([0], jnp.int32)]
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    for w, b in trunk:
        inputs += [w, b]
        in_specs += [full(w.shape), full(b.shape)]
    inputs += [w_head, b_head, log_std]
    in_specs += [full(w_head.shape), full(b_head.shape), full(log_std.shape)]
    out_shape = [
        jax.ShapeDtypeStruct((T, 4, N), jnp.float32),
        jax.ShapeDtypeStruct((T, a_dim, N), jnp.float32),
        jax.ShapeDtypeStruct((T, N), jnp.float32),
        jax.ShapeDtypeStruct((T, N), jnp.float32),
        jax.ShapeDtypeStruct((T, N), jnp.float32),
    ]
    flat = pl.BlockSpec((T, tile), lambda i: (0, i))
    out_specs = [
        pl.BlockSpec((T, 4, tile), lambda i: (0, 0, i)),
        pl.BlockSpec((T, a_dim, tile), lambda i: (0, 0, i)),
        flat, flat, flat,
    ]

    @jax.jit
    def run():
        outs = pl.pallas_call(
            kernel, grid=(N // tile,), in_specs=in_specs,
            out_specs=out_specs, out_shape=out_shape,
        )(*inputs)
        return sum(jnp.sum(o) for o in outs)

    return run


def main():
    log("devices:", jax.devices())
    env_cfg = dataclasses.replace(
        as_env_config(num_trajectories=N),
        normalise_observation_space=True, normalise_action_space=True,
    )
    params = networks.init_actor_critic(
        jax.random.PRNGKey(0), 4, 2, hidden=(H, H), shared_trunk=True
    )
    cases = sys.argv[1:] or [
        "base512", "base1024", "base256", "noprng512", "prngonly512", "nowrite512"
    ]
    for case in cases:
        for pref in ("base", "noprng", "prngonly", "nowrite"):
            if case.startswith(pref):
                mode, tile = pref, int(case[len(pref):])
                break
        try:
            run = build(env_cfg, params, tile, mode)
            t0 = time.time()
            s = float(run())
            log(f"{case:12s} compile+first {time.time()-t0:6.1f}s sum={s:.4e}")
            t0 = time.time()
            acc = None
            for _ in range(3):
                r = run()
                acc = r if acc is None else acc + r
            float(acc)
            dt = (time.time() - t0) / 3
            log(f"{case:12s} {dt*1e3:8.1f} ms  -> {T*N/dt/1e6:8.1f}M steps/s")
        except Exception as e:
            log(f"{case:12s} FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
