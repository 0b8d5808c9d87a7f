"""TPU validation + timing of the fused speed-dynamics (OE) rollout and
the fully-fused PPO iteration on the optimal-execution family."""
import dataclasses
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def main():
    from mbt_gym_tpu.agents import ppo
    from mbt_gym_tpu.ops import pallas_rollout as pr
    from mbt_gym_tpu.utils.config import oe_env_config

    t0 = time.time()
    x = jnp.ones((256, 256))
    log("warmup:", float((x @ x).sum()), f"{time.time()-t0:.1f}s")

    for norm in (True, False):
        env_cfg = dataclasses.replace(
            oe_env_config(num_trajectories=1 << 18, n_steps=200),
            normalise_observation_space=norm, normalise_action_space=norm,
        )
        total = env_cfg.num_trajectories * env_cfg.n_steps
        ppo_cfg = ppo.PPOConfig(
            hidden=(256, 256), n_epochs=1, n_minibatches=64, shuffle=False,
            compute_dtype="bfloat16", shared_trunk=True, fused_update=True,
            fused_rollout=True,
        )
        ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))

        @jax.jit
        def rollout_scalar(params, key):
            tb = pr.collect_rollout_fused_T(env_cfg, params, key)
            return (tb.obs_t.sum() + tb.actions_t.sum() + tb.log_probs.sum()
                    + tb.advantages.sum() + tb.returns.sum())

        t0 = time.time()
        v = float(rollout_scalar(ts.params, jax.random.PRNGKey(1)))
        log(f"norm={norm} rollout compile+first {time.time()-t0:.1f}s val={v:.3e}")
        t0 = time.time()
        acc = None
        for i in range(3):
            s = rollout_scalar(ts.params, jax.random.PRNGKey(2 + i))
            acc = s if acc is None else acc + s
        acc.block_until_ready()
        dt = (time.time() - t0) / 3
        log(f"  OE fused rollout: {dt*1e3:8.1f} ms -> {total/dt/1e6:8.1f}M steps/s")

        t0 = time.time()
        cur, m = ppo.jit_train_iteration(env_cfg, ppo_cfg, ts, jax.random.PRNGKey(9))
        log(f"  iter compile+first {time.time()-t0:.1f}s pg={float(m['pg_loss']):.5f}")
        t0 = time.time()
        for i in range(3):
            cur, m = ppo.jit_train_iteration(env_cfg, ppo_cfg, cur, jax.random.PRNGKey(10 + i))
        float(m["pg_loss"])
        dt = (time.time() - t0) / 3
        log(f"  OE fused PPO iteration: {dt*1e3:8.1f} ms -> {total/dt/1e6:8.1f}M steps/s")
        log(f"  metrics: { {k: float(v) for k, v in m.items()} }")


if __name__ == "__main__":
    main()
