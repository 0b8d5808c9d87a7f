"""PPO learner tests: shapes, GAE correctness, and learning signal on a toy
market-making problem (replaces the reference's SB3 integration,
SURVEY.md §3.4)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mbt_gym_tpu.agents import networks, ppo
from mbt_gym_tpu.utils.config import as_env_config


def test_gae_matches_reference_recursion():
    t, n = 7, 3
    rng = np.random.default_rng(0)
    rewards = rng.normal(size=(t, n))
    values = rng.normal(size=(t, n))
    last_value = rng.normal(size=(n,))
    gamma, lam = 0.97, 0.9

    adv, ret = ppo.compute_gae(
        jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(last_value), gamma, lam
    )

    expected = np.zeros((t, n))
    gae = np.zeros(n)
    v_next = last_value
    for i in reversed(range(t)):
        delta = rewards[i] + gamma * v_next - values[i]
        gae = delta + gamma * lam * gae
        expected[i] = gae
        v_next = values[i]
    np.testing.assert_allclose(np.asarray(adv), expected, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ret), expected + values, rtol=1e-5, atol=1e-6)


def test_train_iteration_runs_and_improves():
    env_cfg = as_env_config(num_trajectories=256, n_steps=20)
    env_cfg = dataclasses.replace(
        env_cfg, normalise_observation_space=True, normalise_action_space=True
    )
    ppo_cfg = ppo.PPOConfig(hidden=(32, 32), n_epochs=2, n_minibatches=2, learning_rate=1e-3)
    ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))

    rewards = []
    for i in range(12):
        ts, metrics = ppo.jit_train_iteration(env_cfg, ppo_cfg, ts, jax.random.PRNGKey(i))
        rewards.append(float(metrics["mean_episode_reward"]))
    assert np.isfinite(rewards).all()
    # Early PPO on the AS env should increase episodic reward from the random
    # policy's baseline (market making at random quotes loses edge).
    assert np.mean(rewards[-4:]) > np.mean(rewards[:4]) - 0.5, rewards


def test_gaussian_log_prob_matches_scipy():
    import scipy.stats

    key = jax.random.PRNGKey(0)
    params = networks.init_actor_critic(key, 4, 2, hidden=(8,))
    obs = jax.random.normal(jax.random.PRNGKey(1), (5, 4))
    mean = networks.policy_mean(params, obs)
    action = mean + 0.3
    lp = networks.gaussian_log_prob(params, mean, action)
    std = np.exp(np.asarray(params["log_std"]))
    expected = scipy.stats.norm.logpdf(0.3, loc=0.0, scale=std).sum()
    np.testing.assert_allclose(np.asarray(lp), expected, rtol=1e-4)


def test_train_iteration_fast_path_bf16_noshuffle():
    """Pod-scale settings (shuffle=False, bf16 matmuls) must still learn and
    produce finite metrics close to the f32 path."""
    env_cfg = as_env_config(num_trajectories=256, n_steps=20)
    env_cfg = dataclasses.replace(
        env_cfg, normalise_observation_space=True, normalise_action_space=True
    )
    fast_cfg = ppo.PPOConfig(
        hidden=(32, 32), n_epochs=2, n_minibatches=2, learning_rate=1e-3,
        shuffle=False, compute_dtype="bfloat16",
    )
    ts = ppo.init_train_state(env_cfg, fast_cfg, jax.random.PRNGKey(0))
    rewards = []
    for i in range(8):
        ts, metrics = ppo.jit_train_iteration(env_cfg, fast_cfg, ts, jax.random.PRNGKey(i))
        rewards.append(float(metrics["mean_episode_reward"]))
    assert np.isfinite(rewards).all()
    assert np.isfinite(float(metrics["pg_loss"]))
    assert np.mean(rewards[-3:]) > np.mean(rewards[:3]) - 1.0, rewards


def _params_digest(tree):
    import hashlib

    h = hashlib.sha256()
    for path, leaf in sorted(
        jax.tree_util.tree_flatten_with_path(tree)[0], key=lambda kv: str(kv[0])
    ):
        h.update(str(path).encode())
        h.update(np.asarray(leaf).tobytes())
    return h.hexdigest()


def _resume_equivalence(env_cfg, ppo_cfg, tmp_path, n_iters=4):
    """train k == train k/2 -> save -> restore -> k/2, bitwise
    (VERDICT r2 item 7 — counterpart of the reference's SB3 EvalCallback
    save/load workflow, experiments/helpers.py:87-95)."""
    from mbt_gym_tpu.checkpoint import restore_checkpoint, save_checkpoint

    keys = [jax.random.PRNGKey(100 + i) for i in range(n_iters)]
    ts0 = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))

    ts_straight = ts0
    for k in keys:
        ts_straight, _ = ppo.jit_train_iteration(env_cfg, ppo_cfg, ts_straight, k)

    half = n_iters // 2
    ts_half = ts0
    for k in keys[:half]:
        ts_half, _ = ppo.jit_train_iteration(env_cfg, ppo_cfg, ts_half, k)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, {"train_state": ts_half})
    # restore into a FRESH template (different init key): every leaf must
    # come from the checkpoint, not the template
    template = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(7))
    ts_resumed = restore_checkpoint(path, {"train_state": template})["train_state"]
    assert _params_digest(ts_resumed.params) == _params_digest(ts_half.params)
    for k in keys[half:]:
        ts_resumed, _ = ppo.jit_train_iteration(env_cfg, ppo_cfg, ts_resumed, k)

    assert int(ts_resumed.update_count) == int(ts_straight.update_count)
    assert _params_digest(ts_resumed.params) == _params_digest(ts_straight.params)
    assert _params_digest(ts_resumed.opt_state) == _params_digest(ts_straight.opt_state)


def test_resume_equivalence_xla(tmp_path):
    env_cfg = dataclasses.replace(
        as_env_config(num_trajectories=64, n_steps=10),
        normalise_observation_space=True, normalise_action_space=True,
    )
    ppo_cfg = ppo.PPOConfig(hidden=(16, 16), n_epochs=1, n_minibatches=2)
    _resume_equivalence(env_cfg, ppo_cfg, tmp_path)


def test_resume_equivalence_fused_pipeline(tmp_path):
    """Same bitwise-resume property through the fully-fused Pallas
    rollout+update pipeline (interpret mode on CPU: the PRNG stub is
    degenerate but deterministic, which is all resume-equivalence needs)."""
    env_cfg = dataclasses.replace(
        as_env_config(num_trajectories=256, n_steps=8),
        normalise_observation_space=True, normalise_action_space=True,
    )
    ppo_cfg = ppo.PPOConfig(
        hidden=(16, 16), n_epochs=1, n_minibatches=2, shuffle=False,
        shared_trunk=True, fused_update=True, fused_rollout=True,
        fused_rollout_tile=128, fused_interpret_ok=True,
    )
    _resume_equivalence(env_cfg, ppo_cfg, tmp_path, n_iters=2)


def test_train_chunk_matches_sequential_iterations():
    """K scanned iterations (ONE dispatch) must equal K sequential
    jit_train_iteration calls on the same keys, bitwise — both on the XLA
    path and the fully-fused pipeline (interpret mode)."""
    env_cfg = dataclasses.replace(
        as_env_config(num_trajectories=128, n_steps=8),
        normalise_observation_space=True, normalise_action_space=True,
    )
    for ppo_cfg in [
        ppo.PPOConfig(hidden=(16, 16), n_epochs=1, n_minibatches=2, shuffle=False),
        ppo.PPOConfig(
            hidden=(16, 16), n_epochs=1, n_minibatches=2, shuffle=False,
            shared_trunk=True, fused_update=True, fused_rollout=True,
            fused_rollout_tile=128, fused_interpret_ok=True,
        ),
    ]:
        ts0 = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(42)
        chunk_ts, chunk_metrics = ppo.jit_train_chunk(env_cfg, ppo_cfg, ts0, key, 3)
        assert chunk_metrics["pg_loss"].shape == (3,)

        seq_ts = ts0
        seq_rewards = []
        for k in jax.random.split(key, 3):
            seq_ts, m = ppo.jit_train_iteration(env_cfg, ppo_cfg, seq_ts, k)
            seq_rewards.append(float(m["mean_episode_reward"]))
        assert _params_digest(chunk_ts.params) == _params_digest(seq_ts.params)
        np.testing.assert_allclose(
            np.asarray(chunk_metrics["mean_episode_reward"]), seq_rewards, rtol=0, atol=0
        )


def test_evaluate_policy_deterministic():
    """ppo.evaluate_policy: deterministic mean-action eval in one dispatch,
    reproducible given the key; training improves it on the AS env."""
    env_cfg = dataclasses.replace(
        as_env_config(num_trajectories=256, n_steps=20),
        normalise_observation_space=True, normalise_action_space=True,
    )
    ppo_cfg = ppo.PPOConfig(hidden=(32, 32), n_epochs=2, n_minibatches=2, learning_rate=1e-3)
    ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
    k = jax.random.PRNGKey(5)
    r0 = float(ppo.evaluate_policy(env_cfg, ts.params, k, 2))
    assert np.isfinite(r0)
    # same key -> identical scalar (no stochastic action sampling in eval)
    assert float(ppo.evaluate_policy(env_cfg, ts.params, k, 2)) == r0
    ts2, _ = ppo.jit_train_chunk(env_cfg, ppo_cfg, ts, jax.random.PRNGKey(1), 10)
    r1 = float(ppo.evaluate_policy(env_cfg, ts2.params, k, 2))
    assert r1 > r0 - 0.5, (r0, r1)
