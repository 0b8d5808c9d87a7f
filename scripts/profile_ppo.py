"""Phase-level profiling of the PPO train iteration at pod-share batch
(bench_suite config 5: 262144 envs x 200 steps, AS env normalised).

Times, per variant:
  - rollout-only (collect_rollout + GAE, reduced to a scalar)
  - full train_iteration
  - implied update cost (full - rollout)

Variants: separate pi/vf towers vs shared trunk, each at bf16 compute.
Run on the real chip (default env; first op blocks minutes on the TPU
claim).  Through the axon relay, completion must be forced by a scalar
fetch — iterations are chained by data dependency and one float() at the
end waits for all of them (see CLAUDE.md / BENCH_NOTES.md).
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--envs", type=int, default=1 << 18)
    parser.add_argument("--minibatches", type=int, default=64)
    parser.add_argument("--iters", type=int, default=3)
    args = parser.parse_args()

    import dataclasses

    from mbt_gym_tpu.agents import ppo
    from mbt_gym_tpu.utils.config import as_env_config

    env_cfg = dataclasses.replace(
        as_env_config(num_trajectories=args.envs),
        normalise_observation_space=True,
        normalise_action_space=True,
    )
    total = args.envs * env_cfg.n_steps

    variants = [
        ("separate", dict(shared_trunk=False)),
        ("shared-trunk", dict(shared_trunk=True)),
        ("shared+fused", dict(shared_trunk=True, fused_update=True)),
    ]
    for name, kw in variants:
        ppo_cfg = ppo.PPOConfig(
            hidden=(256, 256), n_epochs=1, n_minibatches=args.minibatches,
            shuffle=False, compute_dtype="bfloat16", **kw,
        )
        ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))

        @jax.jit
        def rollout_only(params, key):
            batch = ppo.collect_rollout(
                env_cfg, params, key, gamma=ppo_cfg.gamma, lam=ppo_cfg.gae_lambda,
                compute_dtype=jnp.bfloat16,
            )
            return (batch.advantages.sum() + batch.log_probs.sum()
                    + batch.obs.sum().astype(jnp.float32) + batch.actions.sum()
                    + batch.returns.sum())

        float(rollout_only(ts.params, jax.random.PRNGKey(1)))  # compile
        t0 = time.time()
        acc = None
        for i in range(args.iters):
            s = rollout_only(ts.params, jax.random.PRNGKey(2 + i))
            acc = s if acc is None else acc + s
        float(acc)
        dt_r = (time.time() - t0) / args.iters

        new_ts, m = ppo.jit_train_iteration(env_cfg, ppo_cfg, ts, jax.random.PRNGKey(9))
        float(m["pg_loss"])  # compile + fetch
        t0 = time.time()
        cur = ts
        for i in range(args.iters):
            cur, m = ppo.jit_train_iteration(env_cfg, ppo_cfg, cur, jax.random.PRNGKey(10 + i))
        float(m["pg_loss"])
        dt_f = (time.time() - t0) / args.iters

        print(
            f"[{name}] rollout {dt_r*1e3:8.1f} ms ({total/dt_r/1e6:7.1f}M steps/s) | "
            f"full {dt_f*1e3:8.1f} ms ({total/dt_f/1e6:7.1f}M steps/s) | "
            f"update(implied) {(dt_f-dt_r)*1e3:8.1f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
