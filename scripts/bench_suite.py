"""Full benchmark suite over the five BASELINE.json configurations.

Prints a markdown table (stdout) of amortized env-steps/s per config on the
current default JAX backend (real TPU chip under the platform default, or
CPU for smoke runs with --small).

Configs (BASELINE.json "configs"; 6 is a repo addition):
 1. AS market making, 16k envs, 200-step episodes (headline; also bench.py)
 2. CJP market making with CjMm reward, 1000 steps
 3. Optimal execution, speed dynamics + impact, 8192 envs
 4. Composite: Hawkes + exogenous-MM fills + limit-and-market, 64k envs
 5. Pod scale: 1M envs feeding the on-device PPO-style rollout consumer
 6. The fused PPO pipeline on the optimal-execution family (speed + CjOe)
 7. The fused PPO pipeline on the at-the-touch family (running penalty)
 8. The fused PPO pipeline on the limit-and-market-order family (a_dim=4)
 9. The reference's canonical training env (get_cj_env: lam dynamics +
    CjMm + random initial inventory) on the fused pipeline
 10. The composite stress family (Hawkes + exogenous-MM fills + lam) on
     the fused pipeline — config 4's model stack with the learner in loop
 11. Config 9 with the reference's exact net_arch (separate 256x256
     pi/vf towers, experiments/helpers.py:71) on the fused kernels
 12. Config 2's CJP workload on the fused table-policy rollout kernel
     (closed-form depth table, one-hot MXU lookup; TPU only)
 13. Config 3's optimal-execution workload on the whole-episode OE Pallas
     kernel (deterministic CJ-OE speed schedule as a per-step table;
     TPU only)
 14. Config 4's composite eval workload on the fused fixed-policy rollout
     kernel (constant action, stats mode; TPU only — round 5)
 15. Trained-policy deterministic evaluation through the public
     mc_episode_stats front door (auto -> the XLA engine, which MEASURED
     faster than the fused MLP kernel for deterministic eval; TPU only)
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp


def measure_thunk(name, thunk, envs, n_steps, episodes_per_call, iters=3):
    """Shared timing protocol for scalar-returning episode thunks
    (thunk(key) -> device scalar): one compile fetch, a 4-call chained
    warm burst, then ``iters`` chained calls fetched once.

    Untimed warmup dispatches matter: post-compile calls pay relay/
    executable-cache warmup that decays over SEVERAL calls (config 1
    measured 160 ms/call on the first burst vs ~32 ms settled in the same
    session), which at ~30 ms/call configs dominates the 3-call timed
    window.  Chaining by data dependency with ONE scalar fetch at the end
    keeps the relay RTT (~30-50 ms/fetch, varies by session) out of the
    device-rate measurement."""
    t0 = time.time()
    float(thunk(jax.random.PRNGKey(0)))
    compile_s = time.time() - t0
    acc = None
    for w in range(4):
        s = thunk(jax.random.PRNGKey(90 + w))
        acc = s if acc is None else acc + s
    float(acc)
    t0 = time.time()
    acc = None
    for i in range(iters):
        s = thunk(jax.random.PRNGKey(1 + i))
        acc = s if acc is None else acc + s
    float(acc)
    dt = (time.time() - t0) / iters
    rate = envs * n_steps * episodes_per_call / dt
    return {"config": name, "envs": envs, "n_steps": n_steps,
            "env_steps_per_s": rate, "ms_per_call": dt * 1e3, "compile_s": compile_s}


def measure(name, cfg, policy, episodes_per_call, iters=3):
    from mbt_gym_tpu.utils.profiling import _episode_thunk

    thunk = _episode_thunk(cfg, policy, episodes_per_call)
    return measure_thunk(
        name, thunk, cfg.num_trajectories, cfg.n_steps, episodes_per_call,
        iters=iters,
    )


def measure_ppo(name, env_cfg, iters=3, n_minibatches=4, fused=True,
                shared_trunk=True):
    from mbt_gym_tpu.agents import ppo

    # Pod-scale production settings: shared-trunk actor-critic, contiguous
    # minibatches (the global permutation gather costs 3x the whole update
    # at 50M+ transitions), bf16 MXU matmuls with f32 master params, and
    # the fused Pallas rollout + update kernels (VMEM-resident activations)
    # on TPU.  The convergence gates (tests/test_convergence.py + the
    # on-chip run in BENCH_NOTES.md) use this same architecture.
    # shared_trunk=False runs the reference's exact net_arch (separate
    # 256x256 pi/vf towers, experiments/helpers.py:71) as a stacked trunk
    # on the same fused kernels (round 4).
    on_tpu = jax.default_backend() == "tpu"
    ppo_cfg = ppo.PPOConfig(
        hidden=(256, 256), n_epochs=1, n_minibatches=n_minibatches,
        shuffle=False, compute_dtype="bfloat16", shared_trunk=shared_trunk,
        fused_update=fused and on_tpu, fused_rollout=fused and on_tpu,
    )
    ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
    t0 = time.time()
    new_ts, m = ppo.jit_train_iteration(env_cfg, ppo_cfg, ts, jax.random.PRNGKey(1))
    float(m["pg_loss"])  # force through the relay (scalar fetch)
    compile_s = time.time() - t0
    # Untimed warmup dispatch (see measure(): the first post-compile call
    # pays ~130 ms of relay/executable-cache warmup).
    ts, m = ppo.jit_train_iteration(env_cfg, ppo_cfg, ts, jax.random.PRNGKey(99))
    float(m["pg_loss"])
    t0 = time.time()
    for i in range(iters):
        ts, m = ppo.jit_train_iteration(env_cfg, ppo_cfg, ts, jax.random.PRNGKey(2 + i))
    float(m["pg_loss"])
    dt = (time.time() - t0) / iters
    rate = env_cfg.num_trajectories * env_cfg.n_steps / dt
    return {"config": name, "envs": env_cfg.num_trajectories, "n_steps": env_cfg.n_steps,
            "env_steps_per_s": rate, "ms_per_call": dt * 1e3, "compile_s": compile_s}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--small", action="store_true", help="tiny shapes for CPU smoke")
    parser.add_argument("--json", action="store_true", help="emit JSON lines instead of markdown")
    args = parser.parse_args()
    scale = 64 if args.small else 1

    from mbt_gym_tpu.agents.baseline import (
        AvellanedaStoikovAgent,
        CarteaJaimungalMmAgent,
        CarteaJaimungalOeAgent,
    )
    from mbt_gym_tpu.utils.config import (
        as_env_config,
        cj_env_config,
        composite_env_config,
        lam_env_config,
        learning_env_config,
        oe_env_config,
        touch_env_config,
    )

    rows = []

    cfg1 = as_env_config(num_trajectories=16384 // scale)
    rows.append(measure("1. AS market making (16k envs)", cfg1,
                        AvellanedaStoikovAgent.from_config(cfg1).policy(), 8))

    cfg2 = cj_env_config(num_trajectories=16384 // scale, max_inventory=100.0)
    rows.append(measure("2. CJP MM, CjMm reward (1000 steps)", cfg2,
                        CarteaJaimungalMmAgent.from_config(cfg2, max_inventory=100).policy(), 2))

    cfg3 = oe_env_config(num_trajectories=8192 // scale)
    rows.append(measure("3. Optimal execution (8192 envs)", cfg3,
                        CarteaJaimungalOeAgent.from_config(cfg3, alpha=0.01).policy(), 8))

    cfg4 = composite_env_config(num_trajectories=65536 // scale)

    def composite_policy(params, obs, state):
        n = obs.shape[0]
        quotes = jnp.full((n, 2), 0.6, dtype=obs.dtype)
        mos = jnp.zeros((n, 2), dtype=obs.dtype)
        return jnp.concatenate([quotes, mos], axis=1)

    rows.append(measure("4. Composite Hawkes+ExoMM+L&M (64k envs)", cfg4, composite_policy, 4))

    # Config 5 is the pod-scale setting (1M+ envs over N>=2 hosts); a single
    # chip runs its share of a 4-chip 1M-env pod.  The fused pipeline never
    # materializes update activations, so the minibatch count is a free
    # hyperparameter (16 here; 64 was needed by the round-1 row-major path
    # to fit activation memory, and its per-minibatch overheads cost ~15%).
    cfg5 = as_env_config(num_trajectories=(1 << 18) // scale)
    ppo_cfg5 = dataclasses.replace(
        cfg5, normalise_observation_space=True, normalise_action_space=True
    )
    rows.append(
        measure_ppo(
            "5. PPO consumer, 262k envs/chip (1M-env pod share)",
            ppo_cfg5,
            n_minibatches=4 if args.small else 16,
        )
    )

    # Config 6: the same fully-fused PPO pipeline on the optimal-execution
    # family (speed dynamics + CjOe reward, normalised spaces) — the
    # second model family the fused rollout kernel covers.
    cfg6 = dataclasses.replace(
        oe_env_config(num_trajectories=(1 << 18) // scale),
        normalise_observation_space=True, normalise_action_space=True,
    )
    rows.append(
        measure_ppo(
            "6. PPO on optimal execution, 262k envs/chip",
            cfg6,
            n_minibatches=4 if args.small else 16,
        )
    )

    # Config 7: fused PPO on the at-the-touch family (post-or-not fills at
    # a fixed half-spread, running inventory penalty) — the third model
    # family the fused rollout kernel covers.  Action normalisation is
    # forbidden for this dynamics (MultiBinary semantics); observations
    # are normalised so the rollout kernel's matmuls run in bf16.
    cfg7 = dataclasses.replace(
        touch_env_config(num_trajectories=(1 << 18) // scale),
        normalise_observation_space=True,
    )
    rows.append(
        measure_ppo(
            "7. PPO on at-the-touch MM, 262k envs/chip",
            cfg7,
            n_minibatches=4 if args.small else 16,
        )
    )

    # Config 8: fused PPO on the limit-and-market-order family — 4 action
    # columns (bid/ask depths + MO-buy/MO-sell triggers), the fourth and
    # final dynamics family the fused rollout kernel covers.
    cfg8 = dataclasses.replace(
        lam_env_config(num_trajectories=(1 << 18) // scale),
        normalise_observation_space=True,
    )
    rows.append(
        measure_ppo(
            "8. PPO on limit-and-market MM, 262k envs/chip",
            cfg8,
            n_minibatches=4 if args.small else 16,
        )
    )

    # Config 9: the reference's ACTUAL training workload
    # (experiments/helpers.py get_cj_env — lam dynamics, CjMm, random
    # initial inventory in [-5, 6)) on the fused pipeline.  The update
    # kernel zero-pads T=100 to 104 so its usual (wide-tile, Tc=8)
    # blocking applies.
    cfg9 = dataclasses.replace(
        learning_env_config(num_trajectories=(1 << 18) // scale),
        normalise_observation_space=True,
    )
    rows.append(
        measure_ppo(
            "9. PPO on canonical learning env (get_cj_env)",
            cfg9,
            n_minibatches=4 if args.small else 16,
        )
    )

    # Config 10: fused PPO on the composite stress family — the fused
    # rollout kernel's Hawkes-arrival and exogenous-MM-fill axes composed
    # with lam dynamics (config 4's model stack, S=8 observation).
    cfg10 = dataclasses.replace(
        composite_env_config(num_trajectories=(1 << 18) // scale),
        normalise_observation_space=True,
    )
    rows.append(
        measure_ppo(
            "10. PPO on composite Hawkes+ExoMM+L&M, 262k envs/chip",
            cfg10,
            n_minibatches=4 if args.small else 16,
        )
    )

    # Config 11: config 9's workload with the reference's EXACT network
    # architecture — separate 256x256 pi/vf towers
    # (experiments/helpers.py:71) — on the same fused kernels (stacked-
    # trunk formulation, round 4).  Measures the throughput cost of the
    # reference net_arch vs the shared-trunk production default.
    rows.append(
        measure_ppo(
            "11. PPO, separate pi/vf towers (reference net_arch)",
            cfg9,
            n_minibatches=4 if args.small else 16,
            shared_trunk=False,
        )
    )

    # Config 12: config 2's CJP workload on the fused table-policy rollout
    # kernel (round 4, ops/pallas_rollout.table_rollout_pallas stats mode):
    # the closed-form depth table is VMEM-resident, looked up per step via
    # a one-hot MXU contraction.  TPU-only (the stats path uses the
    # hardware PRNG; config 2 remains the XLA-engine regression guard).
    if jax.default_backend() == "tpu":
        from mbt_gym_tpu.ops import pallas_rollout as pr

        cfg12 = cj_env_config(num_trajectories=131072 // scale, max_inventory=100.0)
        agent12 = CarteaJaimungalMmAgent.from_config(cfg12, max_inventory=100)
        p12 = pr.cj_rollout_params(cfg12, agent12)
        bid12, ask12 = (jnp.asarray(t) for t in pr.cj_depth_tables(agent12))
        eps12 = 2

        @jax.jit
        def table_thunk(key):
            seed0 = jax.random.randint(key, (), 0, 1 << 30, dtype=jnp.int32)

            def one(acc, s):
                _, _, _, rsum, _ = pr.table_rollout_pallas(
                    p12, bid12, ask12, s, cfg12.num_trajectories, stats_only=True
                )
                return acc + rsum.mean(), None

            acc, _ = jax.lax.scan(
                one, 0.0, seed0 + jnp.arange(eps12, dtype=jnp.int32)
            )
            return acc

        rows.append(measure_thunk(
            "12. CJP closed-form on the fused table kernel",
            table_thunk, cfg12.num_trajectories, cfg12.n_steps, eps12,
        ))

    # Config 13: config 3's OE workload on the whole-episode Pallas kernel
    # (ops/pallas_episode.oe_episode_pallas: state in VMEM, hardware PRNG,
    # the CJ-OE closed-form speed schedule as a per-step table).  TPU-only.
    if jax.default_backend() == "tpu":
        from mbt_gym_tpu.ops.pallas_episode import (
            oe_episode_pallas, oe_params_from_config, oe_speed_table,
        )

        cfg13 = oe_env_config(num_trajectories=65536 // scale)
        agent13 = CarteaJaimungalOeAgent.from_config(cfg13, alpha=0.01)
        p13 = oe_params_from_config(cfg13)
        table13 = oe_speed_table(cfg13, agent13)
        eps13 = 16

        @jax.jit
        def oe_thunk(key):
            seed0 = jax.random.randint(key, (), 0, 1 << 30, dtype=jnp.int32)

            def one(acc, s):
                cash, inv, price, perm, sq, sv = oe_episode_pallas(
                    p13, table13, s, cfg13.num_trajectories
                )
                return acc + cash.mean() + inv.mean() + sq.mean(), None

            acc, _ = jax.lax.scan(
                one, 0.0, seed0 + jnp.arange(eps13, dtype=jnp.int32)
            )
            return acc

        rows.append(measure_thunk(
            "13. OE closed-form on the episode Pallas kernel",
            oe_thunk, cfg13.num_trajectories, cfg13.n_steps, eps13,
        ))

    # Config 14: config 4's composite eval workload (Hawkes + exogenous-MM
    # fills + limit&market, fixed quotes / no market orders) on the fused
    # FIXED-policy rollout kernel (round 5, stats mode) — the last suite
    # eval config without a Pallas lane (VERDICT r4 item 5).  Injected-
    # noise parity vs the engine: tests/test_pallas_rollout.py
    # test_fused_fixed_policy_composite_matches_xla_engine.  TPU-only.
    if jax.default_backend() == "tpu":
        from mbt_gym_tpu.ops import pallas_rollout as pr14

        cfg14 = composite_env_config(num_trajectories=65536 // scale)
        p14 = pr14.fixed_rollout_params(cfg14, [0.6, 0.6, 0.0, 0.0])
        eps14 = 8

        @jax.jit
        def fixed_thunk(key):
            seed0 = jax.random.randint(key, (), 0, 1 << 30, dtype=jnp.int32)

            def one(acc, s):
                _, inv, _, rsum, _ = pr14.fixed_rollout_pallas(
                    p14, s, cfg14.num_trajectories, stats_only=True
                )
                return acc + rsum.mean() + inv.mean(), None

            acc, _ = jax.lax.scan(
                one, 0.0, seed0 + jnp.arange(eps14, dtype=jnp.int32)
            )
            return acc

        rows.append(measure_thunk(
            "14. Composite fixed-policy on the fused kernel",
            fixed_thunk, cfg14.num_trajectories, cfg14.n_steps, eps14,
        ))

    # Config 15: trained-policy deterministic evaluation through the
    # PUBLIC front door (round 5): ppo.deterministic_policy +
    # mc_episode_stats(backend="auto") — the reference's EvalCallback/
    # results-table workflow.  Auto runs the XLA engine here BY
    # MEASUREMENT (450M vs the fused MLP kernel's 288M at this batch:
    # the kernel computes full training streams, the engine a lean
    # mean-only forward — BENCH_NOTES round 5).  TPU-only.
    if jax.default_backend() == "tpu":
        from mbt_gym_tpu.agents import ppo as ppo15
        from mbt_gym_tpu.rollout import mc_episode_stats

        cfg15 = dataclasses.replace(
            as_env_config(num_trajectories=262144 // scale),
            normalise_observation_space=True, normalise_action_space=True,
        )
        ts15 = ppo15.init_train_state(
            cfg15, ppo15.PPOConfig(hidden=(256, 256)), jax.random.PRNGKey(0)
        )
        pol15 = ppo15.deterministic_policy(cfg15)
        eps15 = 2

        @jax.jit
        def eval_thunk(key):
            stats = mc_episode_stats(
                cfg15, pol15, ts15.params, key, episodes=eps15
            )
            return stats["mean_pnl"] + stats["mean_terminal_inventory"]

        rows.append(measure_thunk(
            "15. Deterministic MLP eval via the public front door",
            eval_thunk, cfg15.num_trajectories, cfg15.n_steps, eps15,
        ))

    if args.json:
        for r in rows:
            print(json.dumps(r))
    else:
        print("| config | envs | steps | env-steps/s | ms/call | compile s |")
        print("|---|---|---|---|---|---|")
        for r in rows:
            print(
                f"| {r['config']} | {r['envs']} | {r['n_steps']} "
                f"| {r['env_steps_per_s']/1e6:,.1f}M | {r['ms_per_call']:.1f} "
                f"| {r['compile_s']:.1f} |"
            )


if __name__ == "__main__":
    main()
