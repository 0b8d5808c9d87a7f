"""Multi-device tests on the 8-way virtual CPU mesh (conftest forces
``--xla_force_host_platform_device_count=8``): sharded rollouts must be
numerically identical to single-device, and the multichip PPO train step
must compile and run with dp x tp shardings."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mbt_gym_tpu import env as env_lib
from mbt_gym_tpu.agents import ppo
from mbt_gym_tpu.agents.baseline import AvellanedaStoikovAgent
from mbt_gym_tpu.parallel import mesh as mesh_lib
from mbt_gym_tpu.rollout import rollout
from mbt_gym_tpu.utils.config import as_env_config


def test_eight_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_sharded_rollout_matches_single_device():
    cfg = as_env_config(num_trajectories=256, n_steps=20)
    policy = AvellanedaStoikovAgent.from_config(cfg).policy()
    key = jax.random.PRNGKey(0)

    single = jax.jit(lambda k: rollout(cfg, policy, None, k))(key)

    mesh = mesh_lib.make_mesh(data=8, model=1)
    sharding = mesh_lib.env_sharding(mesh)

    @jax.jit
    def sharded(k):
        res = rollout(cfg, policy, None, k)
        return jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(
                x, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(None, "data"))
            )
            if getattr(x, "ndim", 0) >= 2
            else x,
            res.trajectory,
        )

    sharded_traj = sharded(key)
    np.testing.assert_allclose(
        np.asarray(single.trajectory.rewards), np.asarray(sharded_traj.rewards), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(single.trajectory.observations),
        np.asarray(sharded_traj.observations),
        rtol=1e-6,
    )


@pytest.mark.parametrize("model_axis", [1, 2])
def test_multichip_ppo_train_step(model_axis):
    import dataclasses

    mesh = mesh_lib.make_mesh(data=8 // model_axis, model=model_axis)
    env_cfg = as_env_config(num_trajectories=128, n_steps=8)
    env_cfg = dataclasses.replace(
        env_cfg, normalise_observation_space=True, normalise_action_space=True
    )
    ppo_cfg = ppo.PPOConfig(hidden=(32, 32), n_epochs=1, n_minibatches=2)
    ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
    params = mesh_lib.shard_params(mesh, ts.params)
    opt_state = ppo.make_optimizer(ppo_cfg).init(params)
    ts = ppo.PPOTrainState(params=params, opt_state=opt_state, update_count=ts.update_count)
    key = jax.device_put(jax.random.PRNGKey(1), mesh_lib.replicated(mesh))

    new_ts, metrics = ppo.jit_train_iteration(env_cfg, ppo_cfg, ts, key, mesh=mesh)
    jax.block_until_ready(new_ts)
    assert np.isfinite(float(metrics["pg_loss"]))
    assert np.isfinite(float(metrics["mean_episode_reward"]))
    assert int(new_ts.update_count) == 1


def test_graft_entry_contract():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", pathlib.Path(__file__).resolve().parents[1] / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    mod.dryrun_multichip(8)


def test_shard_env_state_placement():
    from mbt_gym_tpu import env as env_lib

    mesh = mesh_lib.make_mesh(data=8, model=1)
    cfg = as_env_config(num_trajectories=64, n_steps=5)
    state, obs = env_lib.reset(cfg, jax.random.PRNGKey(0))
    sharded = mesh_lib.shard_env_state(mesh, state)
    # (N,) leaves split over data; scalars replicated
    assert len(sharded.cash.sharding.device_set) == 8
    assert sharded.step.sharding.is_fully_replicated
    np.testing.assert_allclose(np.asarray(sharded.cash), np.asarray(state.cash))


def test_scaling_report_two_devices():
    from mbt_gym_tpu.agents.baseline import fixed_spread_policy
    from mbt_gym_tpu.utils.profiling import scaling_report

    cfg = as_env_config(num_trajectories=128, n_steps=10)
    rows = scaling_report(cfg, fixed_spread_policy(1.0), device_counts=[1, 2], episodes_per_call=1)
    assert rows[0]["devices"] == 1 and rows[1]["devices"] == 2
    assert all(r["env_steps_per_s"] > 0 for r in rows)


@pytest.mark.parametrize("n_devices", [16, 32])
def test_dryrun_multichip_wide(n_devices, tmp_path):
    """The driver-contract dryrun at 16/32 virtual devices (VERDICT round-1
    item 5): the full PPO train step must compile and execute on wider
    meshes than the in-process 8-device default."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo  # fresh interpreter; no TPU-plugin sitecustomize
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         # reduced shapes: these runs validate mesh-WIDTH mechanics; the
         # production-ratio defaults are exercised by the in-process
         # 8-device test above and the driver's own dryrun
         f"import __graft_entry__ as g; g.dryrun_multichip({n_devices}, "
         f"n_envs={n_devices * 128}, t_horizon=16)"],
        env=env, cwd=repo, capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "dryrun_multichip OK" in out.stdout


def test_fused_mesh_iteration_matches_single_chip():
    """The data-parallel fused pipeline (jax.shard_map of the Pallas
    rollout+update kernels with pmean'd grads/adv-stats) must produce the
    SAME params and metrics as one chip holding the whole batch, given the
    same injected noise and one global minibatch."""
    import dataclasses

    from mbt_gym_tpu.ops import pallas_rollout

    N, T = 1024, 8  # 128 envs/device: the kernels' lane granularity
    env_cfg = dataclasses.replace(
        as_env_config(num_trajectories=N, n_steps=T),
        normalise_observation_space=True, normalise_action_space=True,
    )
    ppo_cfg = ppo.PPOConfig(
        hidden=(16, 16), n_epochs=2, n_minibatches=1, shuffle=False,
        shared_trunk=True, fused_rollout=True, fused_rollout_tile=128,
        fused_interpret_ok=True,
        fused_update=True, fused_tile=128, fused_compute_dtype="float32",
    )
    ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    channels = rng.uniform(size=(T, pallas_rollout.N_CHANNELS, N)).astype(np.float32)
    channels[:, 4:7] = rng.normal(size=(T, 3, N)).astype(np.float32)
    noise = jnp.asarray(channels)
    key = jax.random.PRNGKey(7)

    p1, o1, m1 = ppo._fused_iteration_body(
        env_cfg, ppo_cfg, ts.params, ts.opt_state, key, noise=noise
    )

    mesh = mesh_lib.make_mesh(data=8, model=1)
    ts_mesh, m8 = ppo._fused_train_iteration_mesh(
        env_cfg, ppo_cfg, ts, key, mesh, noise=noise
    )

    for a, b in zip(
        jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(ts_mesh.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)
    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m8[k]), rtol=1e-5, atol=1e-6, err_msg=k
        )
    # Params must actually have moved (the rollout is non-degenerate).
    moved = max(
        float(jnp.abs(a - b).max())
        for a, b in zip(
            jax.tree_util.tree_leaves(ts.params),
            jax.tree_util.tree_leaves(ts_mesh.params),
        )
    )
    assert moved > 0.0


def test_fused_mesh_iteration_canonical_env_matches_single_chip():
    """The fused-DP mesh path on the reference's CANONICAL training env
    (lam dynamics, a_dim=4, CjMm, random initial inventory): injected
    noise + injected per-env inventory draws must give the SAME params as
    one chip holding the whole batch."""
    import dataclasses

    from mbt_gym_tpu.ops import pallas_rollout
    from mbt_gym_tpu.utils.config import learning_env_config

    N, T = 1024, 8
    env_cfg = dataclasses.replace(
        learning_env_config(num_trajectories=N),
        n_steps=T, normalise_observation_space=True,
    )
    ppo_cfg = ppo.PPOConfig(
        hidden=(16, 16), n_epochs=1, n_minibatches=1, shuffle=False,
        shared_trunk=True, fused_rollout=True, fused_rollout_tile=128,
        fused_interpret_ok=True,
        fused_update=True, fused_tile=128, fused_compute_dtype="float32",
    )
    ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    n_ch = pallas_rollout.n_noise_channels(env_cfg.action_dim)
    channels = rng.uniform(size=(T, n_ch, N)).astype(np.float32)
    channels[:, 4:9] = rng.normal(size=(T, 5, N)).astype(np.float32)
    noise = jnp.asarray(channels)
    inv0 = jnp.asarray(rng.integers(-5, 6, size=N).astype(np.float32))
    key = jax.random.PRNGKey(7)

    p1, o1, m1 = ppo._fused_iteration_body(
        env_cfg, ppo_cfg, ts.params, ts.opt_state, key, noise=noise, inv0=inv0
    )
    mesh = mesh_lib.make_mesh(data=8, model=1)
    ts_mesh, m8 = ppo._fused_train_iteration_mesh(
        env_cfg, ppo_cfg, ts, key, mesh, noise=noise, inv0=inv0
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(ts_mesh.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)
    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m8[k]), rtol=1e-5, atol=1e-6, err_msg=k
        )


def test_fused_mesh_via_train_iteration_dispatch():
    """train_iteration(mesh=...) routes the fully-fused config through the
    shard_map path and returns finite metrics (zero-stub PRNG smoke)."""
    import dataclasses

    env_cfg = dataclasses.replace(
        as_env_config(num_trajectories=2048, n_steps=8),
        normalise_observation_space=True, normalise_action_space=True,
    )
    ppo_cfg = ppo.PPOConfig(
        hidden=(16, 16), n_epochs=1, n_minibatches=2, shuffle=False,
        shared_trunk=True, fused_rollout=True, fused_rollout_tile=None,
        fused_interpret_ok=True,
        fused_update=True, fused_tile=128, fused_compute_dtype="float32",
    )
    ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
    mesh = mesh_lib.make_mesh(data=8, model=1)
    new_ts, metrics = ppo.train_iteration(
        env_cfg, ppo_cfg, ts, jax.random.PRNGKey(1), mesh=mesh
    )
    assert all(np.isfinite(float(v)) for v in metrics.values()), metrics
    assert int(new_ts.update_count) == 1


def test_train_chunk_under_mesh_matches_sequential():
    """Chunked (scanned) GSPMD training over a data x model mesh equals
    sequential mesh iterations on the same keys — pod-scale runs can
    amortize dispatch without changing the math."""
    import dataclasses
    import hashlib

    from mbt_gym_tpu.agents import ppo

    def digest(tree):
        h = hashlib.sha256()
        for path, leaf in sorted(
            jax.tree_util.tree_flatten_with_path(tree)[0], key=lambda kv: str(kv[0])
        ):
            h.update(str(path).encode())
            h.update(np.asarray(leaf).tobytes())
        return h.hexdigest()

    mesh = mesh_lib.make_mesh(data=4, model=2)
    env_cfg = dataclasses.replace(
        as_env_config(num_trajectories=64, n_steps=6),
        normalise_observation_space=True, normalise_action_space=True,
    )
    ppo_cfg = ppo.PPOConfig(hidden=(16, 16), n_epochs=1, n_minibatches=2)
    ts0 = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
    params = mesh_lib.shard_params(mesh, ts0.params)
    opt_state = ppo.make_optimizer(ppo_cfg).init(params)
    ts0 = ppo.PPOTrainState(params=params, opt_state=opt_state, update_count=ts0.update_count)
    key = jax.device_put(jax.random.PRNGKey(3), mesh_lib.replicated(mesh))

    chunk_ts, chunk_m = ppo.jit_train_chunk(env_cfg, ppo_cfg, ts0, key, 3, mesh=mesh)
    assert chunk_m["pg_loss"].shape == (3,)

    seq_ts = ts0
    for k in jax.random.split(key, 3):
        seq_ts, _ = ppo.jit_train_iteration(env_cfg, ppo_cfg, seq_ts, k, mesh=mesh)
    assert digest(chunk_ts.params) == digest(seq_ts.params)
