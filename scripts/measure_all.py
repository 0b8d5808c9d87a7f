"""All round-2 TPU measurements in ONE process (one chip claim): the relay
intermittently hangs a fresh process's first dispatches, so once a claim
works we run everything on it, most valuable first.

Order: warmup exec -> fully-fused config-5 iteration -> fused rollout ->
bench_suite table (configs 1-5) -> bench.py headline JSON.
Unbuffered prints; chained iterations forced by scalar fetches.
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

    from mbt_gym_tpu.agents import ppo
    from mbt_gym_tpu.ops import pallas_rollout
    from mbt_gym_tpu.utils.config import as_env_config

    t0 = time.time()
    x = jnp.ones((256, 256))
    log("warmup exec:", float((x @ x).sum()), f"{time.time()-t0:.1f}s")

    env_cfg = dataclasses.replace(
        as_env_config(num_trajectories=1 << 18),
        normalise_observation_space=True, normalise_action_space=True,
    )
    total = (1 << 18) * env_cfg.n_steps

    log("A: fully-fused config-5 train iteration (262k envs x 200)")
    ppo_cfg = ppo.PPOConfig(
        hidden=(256, 256), n_epochs=1, n_minibatches=64, shuffle=False,
        compute_dtype="bfloat16", shared_trunk=True, fused_update=True,
        fused_rollout=True,
    )
    ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
    t0 = time.time()
    cur, m = ppo.jit_train_iteration(env_cfg, ppo_cfg, ts, jax.random.PRNGKey(9))
    log(f"  compile+first {time.time()-t0:.1f}s pg={float(m['pg_loss']):.5f}")
    t0 = time.time()
    for i in range(3):
        cur, m = ppo.jit_train_iteration(env_cfg, ppo_cfg, cur, jax.random.PRNGKey(10 + i))
    float(m["pg_loss"])
    dt = (time.time() - t0) / 3
    log(f"  FULLY-FUSED iteration: {dt*1e3:8.1f} ms -> {total/dt/1e6:8.1f}M env-steps/s")

    log("B: fused rollout kernel alone (262k envs)")

    @functools.partial(jax.jit, static_argnums=())
    def rollout_scalar(params, key):
        tb = pallas_rollout.collect_rollout_fused_T(env_cfg, params, key)
        return (tb.obs_t.sum() + tb.actions_t.sum() + tb.log_probs.sum()
                + tb.advantages.sum() + tb.returns.sum())

    float(rollout_scalar(ts.params, jax.random.PRNGKey(1)))
    t0 = time.time()
    acc = None
    for i in range(3):
        s = rollout_scalar(ts.params, jax.random.PRNGKey(2 + i))
        acc = s if acc is None else acc + s
    float(acc)
    dt = (time.time() - t0) / 3
    log(f"  fused rollout: {dt*1e3:8.1f} ms -> {total/dt/1e6:8.1f}M env-steps/s")

    log("B2: transposed update kernel alone (full 262k x 200 batch, one call)")
    from mbt_gym_tpu.ops import fused_ppo

    T = env_cfg.n_steps
    n = 1 << 18
    k = jax.random.PRNGKey(3)
    obs_t = jax.random.normal(k, (T, 4, n), dtype=jnp.float32)
    act_t = jax.random.normal(jax.random.fold_in(k, 1), (T, 2, n), dtype=jnp.float32)
    flat = lambda i: jax.random.normal(jax.random.fold_in(k, i), (T, n), dtype=jnp.float32)
    olp, adv, ret = flat(2), flat(3), flat(4)
    g, met = fused_ppo.ppo_fused_grads_T(ts.params, obs_t, act_t, olp, adv, ret, tile=2048)
    float(met["pg_loss"])
    t0 = time.time()
    acc = None
    for i in range(3):
        g, met = fused_ppo.ppo_fused_grads_T(ts.params, obs_t, act_t, olp, adv, ret, tile=2048)
        s = met["pg_loss"] + g["log_std"].sum()
        acc = s if acc is None else acc + s
    float(acc)
    dt = (time.time() - t0) / 3
    log(f"  update kernel: {dt*1e3:8.1f} ms -> {total/dt/1e6:8.1f}M samples/s")

    log("C: bench_suite table")
    import os
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)  # scripts/
    sys.path.insert(0, os.path.dirname(here))  # repo root
    sys.argv = ["bench_suite.py"]
    import bench_suite

    bench_suite.main()

    log("D: bench.py headline")
    import bench

    bench.main()


if __name__ == "__main__":
    main()
