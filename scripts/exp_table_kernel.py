"""Hardware measurement of the fused closed-form CJ table-policy kernel
(round 4): throughput vs the XLA-engine cjp lane, plus the CJP
true-value-function check on the kernel's hardware-PRNG draws.

Run on the real chip:
    PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_table_kernel.py
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from mbt_gym_tpu.agents.baseline import CarteaJaimungalMmAgent
    from mbt_gym_tpu.ops import pallas_rollout as pr
    from mbt_gym_tpu.utils.config import cj_env_config

    results = []
    for n_envs, eps_per_call in ((16384, 4), (65536, 2), (131072, 1)):
        cfg = cj_env_config(num_trajectories=n_envs, max_inventory=100.0)
        agent = CarteaJaimungalMmAgent.from_config(cfg, max_inventory=100)
        p = pr.cj_rollout_params(cfg, agent)
        bid_tbl, ask_tbl = pr.cj_depth_tables(agent)
        bid_tbl, ask_tbl = jnp.asarray(bid_tbl), jnp.asarray(ask_tbl)

        @jax.jit
        def episodes(seed0):
            def one(acc, s):
                _, _, _, rsum, _ = pr.table_rollout_pallas(
                    p, bid_tbl, ask_tbl, s, n_envs, stats_only=True
                )
                return acc + rsum.mean(), None
            acc, _ = jax.lax.scan(
                one, 0.0, seed0 + jnp.arange(eps_per_call, dtype=jnp.int32)
            )
            return acc

        float(episodes(jnp.int32(999_000_000)))  # compile
        # warm burst
        acc = None
        for i in range(3):
            s = episodes(jnp.int32(900_000 + i * 1000))
            acc = s if acc is None else acc + s
        float(acc)
        times = []
        rew_means = []
        for w in range(3):
            t0 = time.time()
            acc = None
            for i in range(5):
                s = episodes(jnp.int32((w + 1) * 1_000_000 + i * 1000))
                acc = s if acc is None else acc + s
            total = float(acc)
            times.append((time.time() - t0) / 5)
            rew_means.append(total / (5 * eps_per_call))
        med = sorted(times)[1]
        rate = n_envs * cfg.n_steps * eps_per_call / med
        mean_ep_reward = float(np.mean(rew_means))
        # CJP oracle: E[episode reward] = h(0, q0) + cash0 + q0 * S0
        h0 = float(agent.h_table()[0, agent.max_inventory])
        row = {
            "envs": n_envs,
            "episodes_per_call": eps_per_call,
            "ms_per_call": med * 1e3,
            "steps_per_s": rate,
            "mean_episode_reward": mean_ep_reward,
            "true_value_h0": h0,
        }
        print(json.dumps(row), flush=True)
        results.append(row)

    with open("scripts/out/table_kernel_r04.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
