"""General-engine step-overhead experiments at 16k envs (VERDICT round-1
item 10: measured ~25 us/step vs 7.2 us XLA-optimal => 3.5x headroom).

Variants measured (amortized, K episodes per dispatch, chained scalar
fetch to defeat the relay's async ack):
  - lax.scan with unroll 1 / 2 / 4 / 8
  - fori_loop instead of scan
  - pre-drawn noise cube: ONE threefry batch for the whole episode,
    scanned as xs (trades 2 threefry launches/step for HBM streaming)
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from mbt_gym_tpu import env as env_lib
from mbt_gym_tpu.agents.baseline import AvellanedaStoikovAgent
from mbt_gym_tpu.utils.config import as_env_config


def chain_time(fn, iters=3):
    float(fn(jax.random.PRNGKey(0)))  # compile
    t0 = time.time()
    acc = None
    for i in range(iters):
        s = fn(jax.random.PRNGKey(1 + i))
        acc = s if acc is None else acc + s
    float(acc)
    return (time.time() - t0) / iters


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--envs", type=int, default=16384)
    parser.add_argument("--episodes", type=int, default=8)
    parser.add_argument("--iters", type=int, default=3)
    args = parser.parse_args()

    cfg = as_env_config(num_trajectories=args.envs)
    policy = AvellanedaStoikovAgent.from_config(cfg, risk_aversion=0.1).policy()
    total = args.envs * cfg.n_steps * args.episodes

    def make_scan(unroll):
        @jax.jit
        def many(key0):
            def ep(acc, key):
                state0, obs0 = env_lib.reset(cfg, key)

                def body(carry, _):
                    state, obs, racc = carry
                    res = env_lib.step(cfg, state, policy(None, obs, state))
                    return (res.state, res.obs, racc + res.reward.sum()), None

                (fs, _, racc), _ = jax.lax.scan(
                    body, (state0, obs0, jnp.zeros((), cfg.jdtype)), None,
                    length=cfg.n_steps, unroll=unroll,
                )
                return acc + fs.cash.sum() + racc, None

            acc, _ = jax.lax.scan(ep, jnp.zeros((), cfg.jdtype),
                                  jax.random.split(key0, args.episodes))
            return acc

        return many

    for unroll in (1, 2, 4, 8):
        dt = chain_time(make_scan(unroll), args.iters)
        print(f"scan unroll={unroll}: {total/dt/1e6:8.1f}M steps/s ({dt*1e3:.1f} ms)", flush=True)

    @jax.jit
    def fori(key0):
        def ep(acc, key):
            state0, obs0 = env_lib.reset(cfg, key)

            def body(i, carry):
                state, obs, racc = carry
                res = env_lib.step(cfg, state, policy(None, obs, state))
                return (res.state, res.obs, racc + res.reward.sum())

            fs, _, racc = jax.lax.fori_loop(
                0, cfg.n_steps, body, (state0, obs0, jnp.zeros((), cfg.jdtype))
            )
            return acc + fs.cash.sum() + racc, None

        acc, _ = jax.lax.scan(ep, jnp.zeros((), cfg.jdtype),
                              jax.random.split(key0, args.episodes))
        return acc

    dt = chain_time(fori, args.iters)
    print(f"fori_loop:      {total/dt/1e6:8.1f}M steps/s ({dt*1e3:.1f} ms)", flush=True)

    @jax.jit
    def predrawn(key0):
        def ep(acc, key):
            state0, obs0 = env_lib.reset(cfg, key)
            nkey = jax.random.fold_in(key, 1)
            n = cfg.num_trajectories
            normals = jax.random.normal(nkey, (cfg.n_steps, n, 1), dtype=cfg.jdtype)
            uniforms = jax.random.uniform(
                jax.random.fold_in(key, 2), (cfg.n_steps, n, 4), dtype=cfg.jdtype
            )
            from mbt_gym_tpu.types import SlotNoise

            noise = (
                SlotNoise(normal=normals, uniform=None),
                SlotNoise(normal=None, uniform=uniforms[..., 0:2]),
                SlotNoise(normal=None, uniform=uniforms[..., 2:4]),
            )

            def body(carry, step_noise):
                state, obs, racc = carry
                res = env_lib.step(cfg, state, policy(None, obs, state), noise=step_noise)
                return (res.state, res.obs, racc + res.reward.sum()), None

            (fs, _, racc), _ = jax.lax.scan(
                body, (state0, obs0, jnp.zeros((), cfg.jdtype)), noise
            )
            return acc + fs.cash.sum() + racc, None

        acc, _ = jax.lax.scan(ep, jnp.zeros((), cfg.jdtype),
                              jax.random.split(key0, args.episodes))
        return acc

    dt = chain_time(predrawn, args.iters)
    print(f"predrawn noise: {total/dt/1e6:8.1f}M steps/s ({dt*1e3:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
