"""Timing of the fused PPO kernels on the real chip, most valuable
measurement first (the relay intermittently hangs a process's first
dispatches; front-loading the headline number maximizes what a partial
run yields).

Stage A: full config-5 train iteration, fully-fused pipeline
         (Pallas rollout -> transposed Pallas update), 262k envs x 200.
Stage B: fused rollout kernel alone.
Stage C: row-major fused update kernel sanity call.

Plain jit dispatch only (a manually .lower().compile()d AOT executable
hangs through the axon relay); unbuffered prints; chained iterations
forced by one scalar fetch.
"""
from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def main():
    import functools

    from mbt_gym_tpu.agents import networks, ppo
    from mbt_gym_tpu.ops import fused_ppo, pallas_rollout
    from mbt_gym_tpu.utils.config import as_env_config

    log("devices:", jax.devices())

    env_cfg = dataclasses.replace(
        as_env_config(num_trajectories=1 << 18),
        normalise_observation_space=True, normalise_action_space=True,
    )
    total = (1 << 18) * env_cfg.n_steps

    log("stage A: full config-5 train iteration (fully fused)")
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
    log(f"  FULLY-FUSED iteration: {dt*1e3:8.1f} ms -> {total/dt/1e6:8.1f}M env-steps/s")

    log("stage B: fused rollout kernel alone (262k envs)")

    @functools.partial(jax.jit, static_argnums=())
    def rollout_scalar(params, key):
        tb = pallas_rollout.collect_rollout_fused_T(env_cfg, params, key)
        return tb.obs_t.sum() + tb.advantages.sum() + tb.returns.sum()

    t0 = time.time()
    float(rollout_scalar(ts.params, jax.random.PRNGKey(1)))
    log(f"  rollout compile+first {time.time()-t0:.1f}s")
    t0 = time.time()
    acc = None
    for i in range(3):
        s = rollout_scalar(ts.params, jax.random.PRNGKey(2 + i))
        acc = s if acc is None else acc + s
    float(acc)
    dt = (time.time() - t0) / 3
    log(f"  fused rollout: {dt*1e3:8.1f} ms -> {total/dt/1e6:8.1f}M env-steps/s")

    log("stage C: row-major fused update sanity (m=819200)")
    params = networks.init_actor_critic(
        jax.random.PRNGKey(0), 4, 2, hidden=(256, 256), shared_trunk=True
    )
    k = jax.random.PRNGKey(1)
    m_rows = 819200
    obs = jax.random.normal(k, (m_rows, 4), dtype=jnp.float32)
    actions = jax.random.normal(jax.random.fold_in(k, 1), (m_rows, 2))
    col = jax.random.normal(jax.random.fold_in(k, 2), (m_rows,))
    t0 = time.time()
    g, met = fused_ppo.ppo_fused_grads(params, obs, actions, col, col, col, tile=1024)
    log(f"  sanity pg={float(met['pg_loss']):.4f} ({time.time()-t0:.1f}s)")


if __name__ == "__main__":
    main()
