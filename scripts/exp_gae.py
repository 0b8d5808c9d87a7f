"""Attribute the collect_rollout_fused_T overhead at config-5 shapes:
kernel-only vs kernel+GAE vs full collect (chained x3, one fetch)."""
import dataclasses
import functools
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def main():
    from mbt_gym_tpu.agents import ppo
    from mbt_gym_tpu.ops import pallas_rollout as pr
    from mbt_gym_tpu.utils.config import as_env_config

    t0 = time.time()
    x = jnp.ones((256, 256))
    log("warmup:", float((x @ x).sum()), f"{time.time()-t0:.1f}s")

    env_cfg = dataclasses.replace(
        as_env_config(num_trajectories=1 << 18),
        normalise_observation_space=True, normalise_action_space=True,
    )
    ppo_cfg = ppo.PPOConfig(hidden=(256, 256), shared_trunk=True)
    ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
    p = pr.rollout_params_from_config(env_cfg)
    T, n = env_cfg.n_steps, env_cfg.num_trajectories
    total = T * n

    def timed(name, fn, *args):
        fn(*args).block_until_ready()
        t0 = time.time()
        acc = None
        for i in range(3):
            s = fn(*args)
            acc = s if acc is None else acc + s
        acc.block_until_ready()
        dt = (time.time() - t0) / 3
        log(f"  {name:22s} {dt*1e3:8.1f} ms  {total/dt/1e6:8.1f}M steps/s")
        return dt

    @jax.jit
    def kernel_only(params, seed):
        outs = pr.mlp_rollout_pallas(p, params, seed, n)
        return sum(o.sum() for o in outs)

    @jax.jit
    def kernel_gae(params, seed):
        obs_t, actions_t, log_probs, values, rewards = pr.mlp_rollout_pallas(
            p, params, seed, n)
        adv, ret = ppo.compute_gae(
            rewards, values, jnp.zeros_like(values[0]), 1.0, 0.95)
        return (obs_t.sum() + actions_t.sum() + log_probs.sum()
                + adv.sum() + ret.sum())

    @jax.jit
    def full_collect(params, key):
        tb = pr.collect_rollout_fused_T(env_cfg, params, key)
        return (tb.obs_t.sum() + tb.actions_t.sum() + tb.log_probs.sum()
                + tb.advantages.sum() + tb.returns.sum())

    @jax.jit
    def gae_only(rewards, values):
        adv, ret = ppo.compute_gae(
            rewards, values, jnp.zeros_like(values[0]), 1.0, 0.95)
        return adv.sum() + ret.sum()

    seed = jnp.int32(7)
    timed("kernel_only", kernel_only, ts.params, seed)
    timed("kernel+gae", kernel_gae, ts.params, seed)
    timed("full_collect", full_collect, ts.params, jax.random.PRNGKey(1))
    k = jax.random.PRNGKey(3)
    rewards = jax.random.normal(k, (T, n), dtype=jnp.float32)
    values = jax.random.normal(jax.random.fold_in(k, 1), (T, n), dtype=jnp.float32)
    timed("gae_only", gae_only, rewards, values)


if __name__ == "__main__":
    main()
