"""Isolated timing of the fused PPO update kernel on the real chip.

Stage 1: one kernel call on a small minibatch (sanity + compile time).
Stage 2: kernel-only sweep over minibatch sizes.
Stage 3: full config-5 train iteration with fused_update=True.
Unbuffered prints so progress is visible through the relay.
"""
from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def main():
    from mbt_gym_tpu.agents import networks, ppo
    from mbt_gym_tpu.ops import fused_ppo
    from mbt_gym_tpu.utils.config import as_env_config

    log("devices:", jax.devices())

    s_dim, a_dim = 4, 2
    params = networks.init_actor_critic(
        jax.random.PRNGKey(0), s_dim, a_dim, hidden=(256, 256), shared_trunk=True
    )

    def run_kernel(m, tile, iters=3):
        k = jax.random.PRNGKey(1)
        obs = jax.random.normal(k, (m, s_dim), dtype=jnp.float32)
        actions = jax.random.normal(jax.random.fold_in(k, 1), (m, a_dim))
        olp = jax.random.normal(jax.random.fold_in(k, 2), (m,))
        adv = jax.random.normal(jax.random.fold_in(k, 3), (m,))
        ret = jax.random.normal(jax.random.fold_in(k, 4), (m,))
        # NOTE: plain jit dispatch only — executing a manually .compile()d
        # AOT executable hangs through the axon relay (observed twice; the
        # same kernel runs fine via the normal jit path).
        log(f"  inputs materialized m={m}; dispatching (jit compile+run)...")
        t0 = time.time()
        g, met = fused_ppo.ppo_fused_grads(
            params, obs, actions, olp, adv, ret, tile=tile
        )
        log(f"  m={m} tile={tile} compile+run {time.time()-t0:.1f}s pg={float(met['pg_loss']):.4f}")
        t0 = time.time()
        acc = None
        for i in range(iters):
            g, met = fused_ppo.ppo_fused_grads(
                params, obs, actions, olp, adv, ret, tile=tile
            )
            s = met["pg_loss"] + g["log_std"].sum()
            acc = s if acc is None else acc + s
        float(acc)
        dt = (time.time() - t0) / iters
        log(f"  m={m} tile={tile}: {dt*1e3:8.2f} ms/call -> {m/dt/1e6:8.1f}M samples/s")

    # NOTE: standalone kernel calls are dispatch-dominated through the axon
    # relay (~17-30 ms/call regardless of m) — only the in-jit measurement
    # of stage 3 is meaningful.  tile=2048 exceeds Mosaic's 16M scoped-vmem
    # stack; tile=1024 fits.
    log("stage 1: sanity call")
    run_kernel(819200, 1024, iters=1)

    log("stage 2: fused rollout kernel (262k envs, 200 steps)")
    import functools

    from mbt_gym_tpu.ops import pallas_rollout

    env_cfg_r = dataclasses.replace(
        as_env_config(num_trajectories=1 << 18),
        normalise_observation_space=True, normalise_action_space=True,
    )

    @functools.partial(jax.jit, static_argnames=())
    def rollout_scalar(params, key):
        batch = pallas_rollout.collect_rollout_fused(env_cfg_r, params, key)
        return (batch.advantages.sum() + batch.obs.sum() + batch.actions.sum()
                + batch.log_probs.sum() + batch.returns.sum())

    t0 = time.time()
    float(rollout_scalar(params, jax.random.PRNGKey(1)))
    log(f"  rollout compile+first {time.time()-t0:.1f}s")
    t0 = time.time()
    acc = None
    for i in range(3):
        s = rollout_scalar(params, jax.random.PRNGKey(2 + i))
        acc = s if acc is None else acc + s
    float(acc)
    dt = (time.time() - t0) / 3
    total_r = (1 << 18) * env_cfg_r.n_steps
    log(f"  fused rollout: {dt*1e3:8.1f} ms -> {total_r/dt/1e6:8.1f}M env-steps/s")

    log("stage 3: full config-5 train iteration (fused, shared trunk)")
    env_cfg = dataclasses.replace(
        as_env_config(num_trajectories=1 << 18),
        normalise_observation_space=True, normalise_action_space=True,
    )
    total = (1 << 18) * env_cfg.n_steps
    ppo_cfg = ppo.PPOConfig(
        hidden=(256, 256), n_epochs=1, n_minibatches=64, shuffle=False,
        compute_dtype="bfloat16", shared_trunk=True, fused_update=True,
        fused_rollout=True,
    )
    ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
    t0 = time.time()
    new_ts, m = ppo.jit_train_iteration(env_cfg, ppo_cfg, ts, jax.random.PRNGKey(9))
    float(m["pg_loss"])
    log(f"  compile+first {time.time()-t0:.1f}s")
    t0 = time.time()
    cur = ts
    iters = 3
    for i in range(iters):
        cur, m = ppo.jit_train_iteration(env_cfg, ppo_cfg, cur, jax.random.PRNGKey(10 + i))
    float(m["pg_loss"])
    dt = (time.time() - t0) / iters
    log(f"  full fused iteration: {dt*1e3:8.1f} ms -> {total/dt/1e6:8.1f}M env-steps/s")


if __name__ == "__main__":
    main()
