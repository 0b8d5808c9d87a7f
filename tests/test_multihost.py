"""True multi-host validation: two OS processes joined via
``jax.distributed.initialize`` (Gloo on CPU), env batch sharded over the
2-device global mesh, and a cross-process collective (global mean) — the
mechanism that spans real TPU hosts over ICI/DCN (SURVEY.md §5.8)."""
import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import sys, os
    proc_id = int(sys.argv[1]); port = sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=proc_id
    )
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from mbt_gym_tpu import env as env_lib
    from mbt_gym_tpu.utils.config import as_env_config
    from mbt_gym_tpu.agents.baseline import AvellanedaStoikovAgent

    assert len(jax.devices()) == 2 and len(jax.local_devices()) == 1
    mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("data",))
    cfg = as_env_config(num_trajectories=64, n_steps=20)
    pol = AvellanedaStoikovAgent.from_config(cfg).policy()

    @jax.jit
    def episode_mean(key):
        state0, obs0 = env_lib.reset(cfg, key)
        state0 = jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
            )
            if getattr(x, "ndim", 0) >= 1 and x.shape and x.shape[0] == 64
            else x,
            state0,
        )

        def body(carry, _):
            state, obs = carry
            res = env_lib.step(cfg, state, pol(None, obs, state))
            return (res.state, res.obs), None

        (fs, _), _ = jax.lax.scan(body, (state0, obs0), None, length=20)
        return fs.cash.mean()  # global mean => cross-process all-reduce

    print(f"RESULT {float(episode_mean(jax.random.PRNGKey(0))):.9f}", flush=True)
    """
)


WORKER_PPO = textwrap.dedent(
    """
    import sys, os, hashlib
    proc_id = int(sys.argv[1]); port = sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=proc_id
    )
    import dataclasses
    import numpy as np
    from jax.sharding import Mesh
    from mbt_gym_tpu.agents import ppo
    from mbt_gym_tpu.utils.config import as_env_config

    assert len(jax.devices()) == 2 and len(jax.local_devices()) == 1
    mesh = Mesh(np.asarray(jax.devices()).reshape(-1, 1), ("data", "model"))
    env_cfg = dataclasses.replace(
        as_env_config(num_trajectories=64, n_steps=8),
        normalise_observation_space=True, normalise_action_space=True,
    )
    ppo_cfg = ppo.PPOConfig(hidden=(16, 16), n_epochs=1, n_minibatches=2, shuffle=False)
    ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
    # The FULL train iteration: sharded rollout + GAE + minibatch updates.
    # The gradient all-reduce crosses the PROCESS boundary (Gloo), so both
    # ranks must land on bitwise-identical updated params.
    new_ts, metrics = ppo.jit_train_iteration(
        env_cfg, ppo_cfg, ts, jax.random.PRNGKey(1), mesh=mesh
    )
    leaves = jax.tree_util.tree_leaves(jax.device_get(new_ts.params))
    digest = hashlib.sha256(
        b"".join(np.ascontiguousarray(l).tobytes() for l in leaves)
    ).hexdigest()
    print(f"RESULT {digest} kl={float(metrics['approx_kl']):.9e}", flush=True)
    """
)


WORKER_FUSED = textwrap.dedent(
    """
    import sys, os, hashlib
    proc_id = int(sys.argv[1]); port = sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=proc_id
    )
    import dataclasses
    import numpy as np
    from jax.sharding import Mesh
    from mbt_gym_tpu.agents import ppo
    from mbt_gym_tpu.utils.config import as_env_config

    assert len(jax.devices()) == 2 and len(jax.local_devices()) == 1
    mesh = Mesh(np.asarray(jax.devices()).reshape(-1, 1), ("data", "model"))
    T, N = 8, 256
    env_cfg = dataclasses.replace(
        as_env_config(num_trajectories=N, n_steps=T),
        normalise_observation_space=True, normalise_action_space=True,
    )
    # Fully-fused Pallas pipeline with INJECTED noise (the plain-HLO
    # interpret mode; the Mosaic TPU interpreter's host callbacks do not
    # compose with a cross-process mesh).  The per-minibatch grad/adv-stat
    # pmeans cross the Gloo boundary; both ranks must land on
    # bitwise-identical, moved params.
    ppo_cfg = ppo.PPOConfig(
        hidden=(16, 16), n_epochs=1, n_minibatches=2, shuffle=False,
        shared_trunk=True, fused_rollout=True, fused_rollout_tile=128,
        fused_update=True, fused_tile=128, fused_interpret_ok=True,
        fused_compute_dtype="float32",
    )
    ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
    from mbt_gym_tpu.ops import pallas_rollout
    rng = np.random.default_rng(3)  # same on both ranks
    channels = rng.uniform(size=(T, pallas_rollout.N_CHANNELS, N)).astype(np.float32)
    channels[:, 4:7] = rng.normal(size=(T, 3, N)).astype(np.float32)
    new_ts, metrics = ppo._fused_train_iteration_mesh(
        env_cfg, ppo_cfg, ts, jax.random.PRNGKey(1), mesh, noise=channels
    )
    leaves = jax.tree_util.tree_leaves(jax.device_get(new_ts.params))
    digest = hashlib.sha256(
        b"".join(np.ascontiguousarray(l).tobytes() for l in leaves)
    ).hexdigest()
    assert np.isfinite(float(metrics["pg_loss"])), metrics
    moved = max(
        float(abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(
            jax.tree_util.tree_leaves(jax.device_get(ts.params)), leaves
        )
    )
    assert moved > 0.0
    print(f"RESULT {digest} pg={float(metrics['pg_loss']):.9e}", flush=True)
    """
)


def _run_two_process(tmp_path, worker_src):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO  # fresh interpreters; no TPU-plugin sitecustomize
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # one CPU device per process
    script = tmp_path / "_mh_worker.py"
    script.write_text(worker_src)
    procs = []
    try:
        procs = [
            subprocess.Popen(
                [sys.executable, str(script), str(i), port],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
            for i in range(2)
        ]
        outs = [p.communicate(timeout=240)[0] for p in procs]
    finally:
        for p in procs:  # no orphaned workers holding the coordinator port
            if p.poll() is None:
                p.kill()
                p.wait()
    results = []
    for i, out in enumerate(outs):
        assert procs[i].returncode == 0, f"worker {i} failed:\n{out}"
        results.append([l for l in out.splitlines() if l.startswith("RESULT")][0])
    return results


@pytest.mark.skipif(os.environ.get("MBT_SKIP_MULTIHOST") == "1", reason="disabled")
def test_two_process_ppo_gradient_allreduce(tmp_path):
    """Full PPO train_iteration over a 2-process mesh: the cross-process
    gradient all-reduce must leave both ranks with bitwise-identical params
    (VERDICT round-1 weak-item 5)."""
    results = _run_two_process(tmp_path, WORKER_PPO)
    assert results[0] == results[1], results


@pytest.mark.skipif(os.environ.get("MBT_SKIP_MULTIHOST") == "1", reason="disabled")
def test_two_process_fused_pipeline_allreduce(tmp_path):
    """Fully-fused Pallas PPO pipeline (shard_map DP) over a 2-process mesh:
    the fused path's grad/adv-stat pmeans must cross the real process
    boundary and leave both ranks with bitwise-identical params."""
    results = _run_two_process(tmp_path, WORKER_FUSED)
    assert results[0] == results[1], results


@pytest.mark.skipif(os.environ.get("MBT_SKIP_MULTIHOST") == "1", reason="disabled")
def test_two_process_sharded_rollout(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO  # fresh interpreters; no TPU-plugin sitecustomize
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # one CPU device per process
    script = tmp_path / "_mh_worker.py"
    script.write_text(WORKER)
    procs = []
    try:
        procs = [
            subprocess.Popen(
                [sys.executable, str(script), str(i), port],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
            for i in range(2)
        ]
        outs = [p.communicate(timeout=180)[0] for p in procs]
    finally:
        for p in procs:  # no orphaned workers holding the coordinator port
            if p.poll() is None:
                p.kill()
                p.wait()
    results = []
    for i, out in enumerate(outs):
        assert procs[i].returncode == 0, f"worker {i} failed:\n{out}"
        results.append([l for l in out.splitlines() if l.startswith("RESULT")][0])
    # Both ranks must agree on the global (cross-process) reduction.
    assert results[0] == results[1], results
