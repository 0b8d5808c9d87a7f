"""Round-5 experiment, part 2: materialized-Trajectory throughput measured
at the USER CONTRACT — the trajectory is the jit OUTPUT (real HBM arrays in
XLA's chosen output layouts), not a barrier-forced internal materialization
(exp_traj_assembly.py showed optimization_barrier pins the default
minor-dim-last layout, which pads (T+1, N, 4) obs 32x and doesn't even
compile at 1M lanes — not what a user's jit would produce).

Variants (each a jit returning device arrays; K calls pipelined
asynchronously, one block_until_ready at the end):
  outraw6 - the six emit="full" streams, (T, N) each (raw contract)
  outraw3 - the three state streams (the round-4 raw headline contract)
  out6    - Trajectory via as_trajectory_from_pallas_full (pure layout)
  out3    - Trajectory via the round-4 consumer (reward diff + action
            recompute in XLA)
  outref6 - the reference's trajectory-major buffers (N, S, T+1) etc.
            (generate_trajectory.py:11-15) from the full streams

Usage (TPU): PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_traj_out.py
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


def timed_out(fn, k, label, out_formats=None):
    """Time k asynchronously-submitted calls per window.  NOTE:
    block_until_ready does NOT synchronize through the axon relay (it
    resolves before remote compute finishes — measured 0.2 ms/episode
    'rates' at 1M lanes), so each call RETURNS the full trajectory (real
    HBM outputs in XLA's chosen layouts) plus an in-jit scalar checksum;
    the host keeps only the checksums (big buffers free as the loop
    rebinds) and each window ends with ONE summed fetch.  Per-window
    overhead is one ~30 ms fetch RTT amortized over k episodes; the
    raw-vs-materialized RATIO is overhead-matched by construction."""

    def body(s):
        outs = fn(s)
        leaves = jax.tree_util.tree_leaves(outs)
        chk = sum(leaf.ravel()[-1] for leaf in leaves)
        return outs, chk

    if out_formats is None:
        f = jax.jit(body)
    else:
        from jax.experimental.layout import Format

        f = jax.jit(body, out_shardings=(out_formats, Format()))

    float(f(jnp.int32(99))[1])  # compile + sync
    chks = [f(jnp.int32(1000 + i))[1] for i in range(2)]  # warm burst
    float(jnp.stack(chks).sum())
    per = []
    for w in range(WINDOWS):
        t0 = time.time()
        chks = []
        for i in range(k):
            _, chk = f(jnp.int32(10_000 + w * 100 + i))
            chks.append(chk)  # trajectories drop here; device frees them
        float(jnp.stack(chks).sum())  # one fetch per window
        per.append((time.time() - t0) / k)
    med = statistics.median(per)
    print(
        f"  {label}: {med * 1e3:.1f} ms/episode "
        f"(all {[f'{x * 1e3:.1f}' for x in per]})",
        file=sys.stderr,
    )
    return med


def main():
    for n, k in ((16384, 60), (131072, 24), (1048576, 8)):
        cfg = as_env_config(num_trajectories=n)
        p = pe.params_from_config(cfg, risk_aversion=0.1)
        T = p.run_steps

        def outraw6(s):
            return pe.as_episode_trajectories_pallas(p, s, n, emit="full")

        def outraw3(s):
            return pe.as_episode_trajectories_pallas(p, s, n)

        def out6(s):
            return pe.as_trajectory_from_pallas_full(p, outraw6(s))

        def out3(s):
            return pe.as_trajectory_from_pallas(p, *outraw3(s))

        def outref6(s):
            return to_reference_layout(out6(s))

        def outT6(s):
            # Feature-major trajectory container (S, T+1, N)/(A, T, N):
            # the minor dims stay (time, envs) so XLA's (8, 128) tiling
            # pads NOTHING — the assembly is one clean copy pass.
            cash, inv, price, reward, bid, ask = outraw6(s)
            T_, n_ = cash.shape

            def with_init(x, v0):
                return jnp.concatenate(
                    [jnp.full((1, n_), v0, x.dtype), x], axis=0
                )

            times = jnp.broadcast_to(
                (p.start_time + jnp.arange(T_ + 1, dtype=cash.dtype) * p.dt)[:, None],
                (T_ + 1, n_),
            )
            obs_t = jnp.stack(
                [with_init(cash, p.initial_cash),
                 with_init(inv, p.initial_inventory), times,
                 with_init(price, p.initial_price)], axis=0,
            )  # (S, T+1, N)
            actions_t = jnp.stack([bid, ask], axis=0)  # (A, T, N)
            return obs_t, actions_t, reward

        # Layout-controlled variants: the SAME (T+1, N, S) indexing
        # contract, but the jit output's memory layout keeps envs minor
        # (feature planes contiguous) — dodging the default layout's
        # minor-dim-last tiling that pads S=4 to 128 lanes (32x HBM).
        from jax.experimental.layout import Format, Layout
        from jax.sharding import SingleDeviceSharding
        from mbt_gym_tpu.types import Trajectory

        dev = SingleDeviceSharding(jax.devices()[0])

        def _fmt(m2m):
            return Format(Layout(major_to_minor=m2m), dev)

        traj_fmt = Trajectory(
            observations=_fmt((2, 0, 1)),  # memory (S, T+1, N): envs minor
            actions=_fmt((2, 0, 1)),
            rewards=_fmt((0, 1)),
        )
        ref_fmt = (
            _fmt((1, 0, 2)),  # (N, S, T+1): memory (S, N, T+1)
            _fmt((1, 0, 2)),
            _fmt((1, 0, 2)),
        )

        row = {"n": n, "k": k}
        print(f"batch {n}:", file=sys.stderr)
        del traj_fmt, ref_fmt  # measured identical to default: layout
        # constraints do not rescue the minor-dim-last trailing-S arrays
        for name, fn, fmt in (
            ("outraw3", outraw3, None), ("outraw6", outraw6, None),
            ("out3", out3, None), ("out6", out6, None),
            ("outref6", outref6, None), ("outT6", outT6, None),
        ):
            try:
                med = timed_out(fn, k, name, out_formats=fmt)
                row[name] = round(n * T / med / 1e9, 3)  # B env-steps/s
            except Exception as exc:
                row[name] = f"{type(exc).__name__}: {str(exc)[:120]}"
        if isinstance(row.get("outT6"), float) and isinstance(row.get("outraw3"), float):
            row["ratio_outT6_raw3"] = round(row["outT6"] / row["outraw3"], 3)
        print(json.dumps(row))


if __name__ == "__main__":
    main()
