"""Episode-kernel throughput vs batch sweep (VERDICT r3 item 4): diagnose
the round-3 non-monotonicity (16k: 4.6B, 160k: 3.4B, 655k: 5.3B steps/s).

Hypothesis under test: the dip was per-DISPATCH overhead, not tiling.  The
round-3 capture compared 10 chained 16k calls per dispatch against ONE
160k/655k call per dispatch; a fixed ~4.6 ms/dispatch cost reproduces the
recorded rates exactly (implied pure device rate ~6.5B at both batch
sizes).  This sweep measures every batch size BOTH ways:

  - amortized: K calls chained per dispatch, K sized so each dispatch is
    >= ~80 ms of device work (overhead < 5%)
  - single: one call per dispatch (the round-3 large-batch methodology)

over lanes 16k -> 1M at T=200, for each compiling rows configuration
(grid=1 single-program inside the proven envelope, multi-program 16-row
tiling everywhere).  Run on the TPU host:

  PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_batch_sweep.py \
      > /tmp/batch_sweep.log 2>&1 &

Output: a markdown table (stdout) + scripts/out/batch_sweep_r04.json.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

import numpy as np


def measure(p, n, rows, episodes_per_call, jax, jnp, iters=3):
    from mbt_gym_tpu.ops.pallas_episode import as_episode_trajectories_pallas

    @jax.jit
    def episodes(seed0):
        def one(acc, s):
            cash, inv, price = as_episode_trajectories_pallas(p, s, n, rows=rows)
            return acc + cash[-1].sum() + inv[-1].sum() + price[-1].sum(), None

        acc, _ = jax.lax.scan(
            one, 0.0, seed0 + jnp.arange(episodes_per_call, dtype=jnp.int32)
        )
        return acc

    float(episodes(jnp.int32(999)))  # compile
    acc = None
    for w in range(4):  # settle the relay
        s = episodes(jnp.int32(10_000 + w * 131))
        acc = s if acc is None else acc + s
    float(acc)
    per = []
    for w in range(iters):
        t0 = time.time()
        checksum = float(episodes(jnp.int32((w + 1) * 1_000_003)))
        per.append(time.time() - t0)
    med = statistics.median(per)
    rate = n * p.run_steps * episodes_per_call / med
    return rate, med, checksum


def main():
    import jax
    import jax.numpy as jnp

    from mbt_gym_tpu.ops.pallas_episode import params_from_config
    from mbt_gym_tpu.utils.config import as_env_config

    results = []
    lanes = [16384, 32768, 65536, 131072, 163840, 262144, 524288, 1048576]
    print("| envs | rows | grid | mode | eps/call | ms/call | B steps/s |")
    print("|---|---|---|---|---|---|---|")
    for n in lanes:
        cfg = as_env_config(num_trajectories=n)
        p = params_from_config(cfg, risk_aversion=0.1)
        T = p.run_steps
        rows_cands = []
        one_shot = n // 128
        if T * one_shot <= 200 * 128:
            rows_cands.append(one_shot)  # grid=1 single-program
        rows_cands.append(16)  # proven multi-program tiling
        for rows in rows_cands:
            grid = n // (rows * 128)
            # size the amortized chain for >= ~80 ms of device work at an
            # assumed 5B steps/s
            k_amort = max(1, int(0.08 * 5e9 / (n * T)))
            for mode, k in (("amortized", k_amort), ("single", 1)):
                if mode == "single" and k_amort == 1:
                    continue  # identical measurement
                try:
                    rate, med, _ = measure(p, n, rows, k, jax, jnp)
                except Exception as exc:
                    print(
                        f"| {n} | {rows} | {grid} | {mode} | {k} | "
                        f"FAIL {type(exc).__name__} | - |"
                    )
                    sys.stdout.flush()
                    continue
                results.append(dict(
                    envs=n, rows=rows, grid=grid, mode=mode,
                    episodes_per_call=k, ms_per_call=med * 1e3,
                    steps_per_s=rate,
                ))
                print(
                    f"| {n} | {rows} | {grid} | {mode} | {k} | "
                    f"{med*1e3:.1f} | {rate/1e9:.2f} |"
                )
                sys.stdout.flush()

    # fixed-overhead fit from the single-dispatch points at rows=16
    singles = [r for r in results if r["mode"] == "single" and r["rows"] == 16]
    if len(singles) >= 2:
        a = singles[0]; b = singles[-1]
        sa, sb = a["envs"] * 200, b["envs"] * 200
        ta, tb = a["ms_per_call"] / 1e3, b["ms_per_call"] / 1e3
        if tb > ta:
            rate_pure = (sb - sa) / (tb - ta)
            overhead = ta - sa / rate_pure
            print(
                f"\nfixed-overhead fit over single-dispatch rows=16 points: "
                f"pure device rate {rate_pure/1e9:.2f}B steps/s, "
                f"per-dispatch overhead {overhead*1e3:.2f} ms"
            )

    os.makedirs("scripts/out", exist_ok=True)
    with open("scripts/out/batch_sweep_r04.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote scripts/out/batch_sweep_r04.json")


if __name__ == "__main__":
    main()
