"""Profiling + throughput harness (SURVEY.md §5.1 — the reference has no
tracing/profiling of its own; here they are first-class).

- :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace.
- :func:`throughput` — amortized env-steps/s of a rollout thunk, K episodes
  per device dispatch so host-link latency does not pollute the number.
- :func:`scaling_report` — env-steps/s across mesh widths 1..n_devices with
  parallel efficiency vs the single-device rate (the north-star scaling
  metric, BASELINE.md).
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp

from mbt_gym_tpu import env as env_lib
from mbt_gym_tpu.env import EnvConfig


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def _episode_thunk(cfg: EnvConfig, policy, episodes_per_call: int, mesh=None):
    from jax.sharding import NamedSharding, PartitionSpec as P

    def constrain(tree):
        if mesh is None:
            return tree

        def c(x):
            if getattr(x, "ndim", 0) >= 1 and x.shape and x.shape[0] == cfg.num_trajectories:
                spec = P("data", *([None] * (x.ndim - 1)))
                return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
            return x

        return jax.tree_util.tree_map(c, tree)

    from mbt_gym_tpu.rollout import _episode_steps, _should_predraw, native_noise_cube

    n_scan = _episode_steps(cfg)
    predraw = _should_predraw(cfg, n_scan, "auto")

    @jax.jit
    def many(key0):
        def ep(acc, key):
            state0, obs0 = env_lib.reset(cfg, key)
            state0, obs0 = constrain(state0), constrain(obs0)
            # Episode noise in two threefry batches when it fits (measured
            # +30% at 16k envs; see rollout.native_noise_cube).
            cube = native_noise_cube(cfg, state0.key, n_scan) if predraw else None

            def body(carry, step_noise):
                state, obs, racc = carry
                action = policy(None, obs, state)
                res = env_lib.step(cfg, state, action, noise=step_noise)
                # consume rewards so the reward computation (part of the
                # workload being measured) cannot be dead-code-eliminated
                return (res.state, res.obs, racc + res.reward.sum()), None

            (final_state, _, reward_acc), _ = jax.lax.scan(
                body, (state0, obs0, jnp.zeros((), cfg.jdtype)), cube,
                length=None if predraw else n_scan,
            )
            return acc + final_state.cash.sum() + reward_acc, None

        acc, _ = jax.lax.scan(ep, jnp.zeros((), cfg.jdtype), jax.random.split(key0, episodes_per_call))
        return acc

    return many


def throughput(
    cfg: EnvConfig,
    policy,
    episodes_per_call: int = 16,
    iters: int = 3,
    key: Optional[jax.Array] = None,
) -> Dict[str, float]:
    """Amortized env-steps/s for full-episode rollouts of ``cfg``."""
    key = jax.random.PRNGKey(0) if key is None else key
    thunk = _episode_thunk(cfg, policy, episodes_per_call)
    t0 = time.time()
    float(thunk(key))  # compile
    compile_s = time.time() - t0
    t0 = time.time()
    for i in range(iters):
        checksum = float(thunk(jax.random.fold_in(key, i)))
    elapsed = (time.time() - t0) / iters
    from mbt_gym_tpu.rollout import _episode_steps

    steps = cfg.num_trajectories * _episode_steps(cfg) * episodes_per_call
    return {
        "env_steps_per_s": steps / elapsed,
        "seconds_per_call": elapsed,
        "compile_seconds": compile_s,
        "checksum": checksum,
    }


def scaling_report(
    cfg: EnvConfig,
    policy,
    device_counts: Optional[List[int]] = None,
    episodes_per_call: int = 8,
) -> List[Dict[str, float]]:
    """env-steps/s and efficiency vs 1 device, for growing data-parallel
    meshes.  Envs-per-device is held constant (weak scaling) — the
    production-relevant regime."""
    import dataclasses

    from mbt_gym_tpu.parallel import mesh as mesh_lib

    n_avail = len(jax.devices())
    device_counts = device_counts or [d for d in (1, 2, 4, 8, 16, 32) if d <= n_avail]
    base_n = cfg.num_trajectories
    rows = []
    base_rate = None
    for d in device_counts:
        mesh = mesh_lib.make_mesh(data=d, model=1, devices=jax.devices()[:d])
        scaled = dataclasses.replace(cfg, num_trajectories=base_n * d)
        thunk = _episode_thunk(scaled, policy, episodes_per_call, mesh=mesh)
        float(thunk(jax.random.PRNGKey(0)))
        t0 = time.time()
        for i in range(3):
            float(thunk(jax.random.PRNGKey(i)))
        elapsed = (time.time() - t0) / 3
        from mbt_gym_tpu.rollout import _episode_steps

        rate = scaled.num_trajectories * _episode_steps(cfg) * episodes_per_call / elapsed
        if base_rate is None:
            base_rate = rate
            base_devices = d
        rows.append(
            {
                "devices": d,
                "env_steps_per_s": rate,
                # normalised to the first measured width (which may be > 1)
                "efficiency": rate / (base_rate * d / base_devices),
            }
        )
    return rows
