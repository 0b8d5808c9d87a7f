"""Round-5 experiment (VERDICT r4 item 3): raw kernel rate vs end-to-end
materialized-Trajectory rate for the AS episode kernel, across batch sizes.

Variants per batch:
  raw3  - state-mode streams (cash/inv/price), the round-4 raw headline
  mat3  - state-mode + as_trajectory_from_pallas (round-4 end-to-end: XLA
          recomputes rewards/actions and stacks obs)
  raw6  - emit="full" streams (+ kernel-computed reward/bid/ask)
  mat6  - emit="full" + as_trajectory_from_pallas_full (pure layout)
  ref6  - mat6 + to_reference_layout (the reference's (N, S, T+1) buffers,
          generate_trajectory.py:11-15)

Materialization is forced with jax.lax.optimization_barrier around every
trajectory leaf (prevents the reducing consumer from fusing into the
producers and skipping the HBM writes); consumption afterwards is a few
scalar slices.  A `sumall` cross-check variant consumes full .sum()s to
validate the barrier methodology.

Usage (TPU): PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_traj_assembly.py
"""
from __future__ import annotations

import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

from mbt_gym_tpu.ops import pallas_episode as pe
from mbt_gym_tpu.rollout import to_reference_layout
from mbt_gym_tpu.utils.config import as_env_config

WINDOWS = 3


def _consume(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    leaves = jax.lax.optimization_barrier(tuple(leaves))
    acc = 0.0
    for x in leaves:
        flat = x.reshape(-1)
        acc = acc + flat[0] + flat[-1]
    return acc


def timed(fn, eps, label):
    @jax.jit
    def call(seed0):
        def one(acc, s):
            return acc + fn(s), None

        acc, _ = jax.lax.scan(
            one, 0.0, seed0 + jnp.arange(eps, dtype=jnp.int32)
        )
        return acc

    float(call(jnp.int32(99)))  # compile
    acc = 0.0
    for i in range(3):  # warm burst
        acc += call(jnp.int32(1000 + i * 1000))
    float(acc)
    per = []
    for w in range(WINDOWS):
        t0 = time.time()
        float(call(jnp.int32(100_000 + w * 10_000)))
        per.append(time.time() - t0)
    med = statistics.median(per)
    print(
        f"  {label}: {med * 1e3:.1f} ms/call "
        f"(all {[f'{x * 1e3:.1f}' for x in per]})",
        file=sys.stderr,
    )
    return med


def main():
    results = []
    for n, eps in ((16384, 60), (131072, 8), (1048576, 1)):
        cfg = as_env_config(num_trajectories=n)
        p = pe.params_from_config(cfg, risk_aversion=0.1)
        T = p.run_steps

        def raw3(s):
            return _consume(pe.as_episode_trajectories_pallas(p, s, n))

        def mat3(s):
            streams = pe.as_episode_trajectories_pallas(p, s, n)
            return _consume(pe.as_trajectory_from_pallas(p, *streams))

        def raw6(s):
            return _consume(
                pe.as_episode_trajectories_pallas(p, s, n, emit="full")
            )

        def mat6(s):
            streams = pe.as_episode_trajectories_pallas(p, s, n, emit="full")
            return _consume(pe.as_trajectory_from_pallas_full(p, streams))

        def ref6(s):
            streams = pe.as_episode_trajectories_pallas(p, s, n, emit="full")
            traj = pe.as_trajectory_from_pallas_full(p, streams)
            return _consume(to_reference_layout(traj))

        def mat6_sumall(s):
            streams = pe.as_episode_trajectories_pallas(p, s, n, emit="full")
            traj = pe.as_trajectory_from_pallas_full(p, streams)
            return (
                traj.rewards.sum()
                + traj.observations.sum()
                + traj.actions.sum()
            )

        row = {"n": n, "eps_per_call": eps}
        print(f"batch {n}:", file=sys.stderr)
        for name, fn in (
            ("raw3", raw3), ("mat3", mat3), ("raw6", raw6), ("mat6", mat6),
            ("ref6", ref6), ("mat6_sumall", mat6_sumall),
        ):
            try:
                med = timed(fn, eps, name)
                row[name] = round(n * T * eps / med / 1e9, 3)  # B steps/s
            except Exception as exc:
                row[name] = f"{type(exc).__name__}: {str(exc)[:120]}"
        row["ratio_mat6_raw3"] = (
            round(row["mat6"] / row["raw3"], 3)
            if isinstance(row.get("mat6"), float) and isinstance(row.get("raw3"), float)
            else None
        )
        print(json.dumps(row))
        results.append(row)
    return results


if __name__ == "__main__":
    main()
