"""Vanilla REINFORCE (counterpart of
``mbt_gym/agents/PolicyGradientAgent.py``): Gaussian policy around an MLP
mean with a fixed or scheduled exploration std, trained on
``-mean(log_probs * reward-to-go)`` with SGD + exponential LR decay
(PolicyGradientAgent.py:49-73).  The whole epoch (rollout + gradient step)
is one jitted function.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from mbt_gym_tpu import env as env_lib
from mbt_gym_tpu.agents import networks
from mbt_gym_tpu.env import EnvConfig


@dataclasses.dataclass(frozen=True)
class ReinforceConfig:
    learning_rate: float = 1e-1
    lr_decay: float = 0.995  # StepLR(step_size=1, gamma=0.995) equivalent
    action_std: float = 0.01
    # Linear std schedule: std(t) = action_std * (1 - t) + final_std * t over
    # training progress, mirroring the reference's callable-std option.
    final_action_std: float = None
    hidden: Tuple[int, ...] = (64, 64)


class ReinforceTrainState(NamedTuple):
    params: Any
    opt_state: Any
    epoch: jax.Array


def make_optimizer(cfg: ReinforceConfig) -> optax.GradientTransformation:
    schedule = optax.exponential_decay(
        init_value=cfg.learning_rate, transition_steps=1, decay_rate=cfg.lr_decay
    )
    return optax.sgd(schedule)


def init_train_state(env_cfg: EnvConfig, rf_cfg: ReinforceConfig, key: jax.Array) -> ReinforceTrainState:
    params = networks.init_mlp(
        key, [env_cfg.state_dim, *rf_cfg.hidden, env_cfg.action_dim], dtype=env_cfg.jdtype
    )
    return ReinforceTrainState(
        params=params, opt_state=make_optimizer(rf_cfg).init(params), epoch=jnp.zeros((), jnp.int32)
    )


def _current_std(rf_cfg: ReinforceConfig, progress: jax.Array) -> jax.Array:
    if rf_cfg.final_action_std is None:
        return jnp.asarray(rf_cfg.action_std)
    return rf_cfg.action_std * (1.0 - progress) + rf_cfg.final_action_std * progress


def reward_to_go(rewards: jax.Array) -> jax.Array:
    """Flipped-cumsum reward-to-go over the time axis
    (PolicyGradientAgent.py:69-73)."""
    return jnp.flip(jnp.cumsum(jnp.flip(rewards, axis=0), axis=0), axis=0)


def _epoch_loss(params, env_cfg: EnvConfig, std, key):
    def policy(p, obs, state):
        mean = networks.mlp_apply(p, obs)
        step_key = jax.random.fold_in(key, state.step + (1 << 16))
        eps = jax.random.normal(step_key, mean.shape, dtype=mean.dtype)
        return mean + std * eps

    from mbt_gym_tpu.rollout import rollout

    res = rollout(env_cfg, policy, params, key)
    # The trajectory is DATA, exactly as in the reference where sampled
    # torch actions are detached constants (PolicyGradientAgent.py:55-67).
    # Without this stop_gradient the score term cancels symbolically —
    # z = (actions - means)/std == eps with zero dependence on params,
    # because jax traces the rollout differentiably — leaving only an
    # incidental pathwise reward gradient that learns weakly and diverges
    # on long runs (found + fixed round 4; see tests/test_convergence.py
    # REINFORCE gates).
    traj = jax.lax.stop_gradient(res.trajectory)
    # Recompute log-probs differentiably from the stored obs/actions.
    means = networks.mlp_apply(params, traj.observations[:-1])  # (T, N, A)
    z = (traj.actions - means) / std
    log_probs = jnp.sum(-0.5 * z**2 - jnp.log(std) - 0.5 * jnp.log(2 * jnp.pi), axis=-1)
    future = reward_to_go(traj.rewards)
    loss = -jnp.mean(log_probs * future)
    return loss, traj.rewards.sum(axis=0).mean()


def train_epoch(
    env_cfg: EnvConfig,
    rf_cfg: ReinforceConfig,
    state: ReinforceTrainState,
    key: jax.Array,
    num_epochs: int = 1,
) -> Tuple[ReinforceTrainState, Dict[str, jax.Array]]:
    progress = state.epoch.astype(env_cfg.jdtype) / max(num_epochs - 1, 1)
    std = _current_std(rf_cfg, progress)
    (loss, mean_reward), grads = jax.value_and_grad(_epoch_loss, has_aux=True)(
        state.params, env_cfg, std, key
    )
    updates, opt_state = make_optimizer(rf_cfg).update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return (
        ReinforceTrainState(params=params, opt_state=opt_state, epoch=state.epoch + 1),
        {"loss": loss, "mean_episode_reward": mean_reward},
    )


@partial(jax.jit, static_argnums=(0, 1, 4))
def jit_train_epoch(env_cfg, rf_cfg, state, key, num_epochs=1):
    return train_epoch(env_cfg, rf_cfg, state, key, num_epochs)
