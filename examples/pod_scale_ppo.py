"""Pod-scale PPO: shard 1M+ envs over every available device/host and train
with the on-device learner (BASELINE.json config #5).

- Single host, many chips: run as-is; the env axis shards over the mesh
  'data' axis, params replicate (or shard over 'model' with --model-parallel).
- Multi host: launch one process per host with the usual JAX coordinator env
  (``jax.distributed.initialize`` is called first); the same code then spans
  hosts — the data axis rides ICI within a slice and DCN across hosts.
- No real pod handy: smoke it anywhere with
  ``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu
  python examples/pod_scale_ppo.py --envs-per-device 64 --iterations 2``.
"""
import argparse
import dataclasses

import jax

from mbt_gym_tpu.agents import ppo
from mbt_gym_tpu.parallel import mesh as mesh_lib
from mbt_gym_tpu.utils.config import as_env_config


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--envs-per-device", type=int, default=131072)
    parser.add_argument("--iterations", type=int, default=10)
    parser.add_argument("--n-steps", type=int, default=200)
    parser.add_argument("--model-parallel", type=int, default=1)
    parser.add_argument(
        "--fused", action="store_true",
        help="use the fully-fused Pallas pipeline (shared-trunk, rollout + "
        "update kernels, shard_map DP with pmean'd grads) — the production "
        "single- and multi-chip data-parallel configuration; requires "
        "--model-parallel 1 and TPU devices",
    )
    parser.add_argument("--coordinator", type=str, default=None,
                        help="multi-host coordinator address (host:port)")
    args = parser.parse_args()

    if args.coordinator:
        mesh_lib.init_distributed(coordinator_address=args.coordinator)

    n_devices = len(jax.devices())
    mesh = mesh_lib.make_mesh(
        data=n_devices // args.model_parallel, model=args.model_parallel
    )
    total_envs = args.envs_per_device * n_devices
    print(f"mesh {dict(mesh.shape)} | {total_envs:,} envs total")

    env_cfg = as_env_config(num_trajectories=total_envs, n_steps=args.n_steps)
    env_cfg = dataclasses.replace(
        env_cfg, normalise_observation_space=True, normalise_action_space=True
    )
    if args.fused:
        assert args.model_parallel == 1, "fused pipeline is replicated-params DP"
        ppo_cfg = ppo.PPOConfig(
            hidden=(256, 256), n_epochs=1, n_minibatches=16, shuffle=False,
            compute_dtype="bfloat16", shared_trunk=True,
            fused_update=True, fused_rollout=True,
        )
        ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
    else:
        ppo_cfg = ppo.PPOConfig(hidden=(256, 256), n_epochs=1, n_minibatches=64)
        ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
        params = mesh_lib.shard_params(mesh, ts.params)
        opt_state = ppo.make_optimizer(ppo_cfg).init(params)
        ts = ppo.PPOTrainState(params=params, opt_state=opt_state, update_count=ts.update_count)

    import time

    # untimed warmup: compilation can take minutes at pod scale
    ts, _ = ppo.jit_train_iteration(env_cfg, ppo_cfg, ts, jax.random.PRNGKey(99), mesh=mesh)
    jax.block_until_ready(ts)

    for i in range(args.iterations):
        t0 = time.time()
        ts, metrics = ppo.jit_train_iteration(
            env_cfg, ppo_cfg, ts, jax.random.PRNGKey(100 + i), mesh=mesh
        )
        jax.block_until_ready(ts)
        steps = total_envs * args.n_steps
        print(
            f"iter {i}: reward {float(metrics['mean_episode_reward']):8.3f}  "
            f"{steps / (time.time() - t0) / 1e6:8.1f}M env-steps/s (incl. learner)"
        )


if __name__ == "__main__":
    main()
