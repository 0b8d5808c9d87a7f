"""Host-model policy adapter — the counterpart of the reference's ``SbAgent``
(mbt_gym/agents/SbAgent.py): drive rollouts with any host-side model (a
Stable-Baselines3 ``predict``, a torch module, any NumPy function).

The adapter wraps the host function in ``jax.pure_callback`` so it can sit
inside the jitted `lax.scan` rollout.  Every step crosses the host boundary —
this is for evaluating externally-trained models, not for training throughput
(on-device learners live in ``agents/ppo.py`` / ``agents/reinforce.py``).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def host_model_policy(
    predict: Callable[[np.ndarray], np.ndarray],
    action_dim: int,
    reduced_obs_indices: Optional[Sequence[int]] = None,
):
    """Build a rollout policy from a host-side ``predict(obs (N,S)) -> (N,A)``.

    ``reduced_obs_indices`` mirrors SbAgent's ``reduced_training_indices``
    (SbAgent.py:9-17): the host model sees only those observation columns.
    """

    def policy(params, obs, state):
        sliced = obs if reduced_obs_indices is None else obs[:, jnp.asarray(tuple(reduced_obs_indices))]
        out_shape = jax.ShapeDtypeStruct((obs.shape[0], action_dim), obs.dtype)

        def host_fn(o):
            return np.asarray(predict(np.asarray(o)), dtype=o.dtype).reshape(o.shape[0], action_dim)

        return jax.pure_callback(host_fn, out_shape, sliced, vmap_method="sequential")

    return policy


def sb3_policy(model, action_dim: Optional[int] = None, reduced_obs_indices=None):
    """Wrap a Stable-Baselines3 ``BaseAlgorithm`` (deterministic predict),
    matching SbAgent.get_action (SbAgent.py:19-23)."""
    if action_dim is None:
        action_dim = int(model.action_space.shape[0])

    def predict(obs):
        return model.predict(obs, deterministic=True)[0]

    return host_model_policy(predict, action_dim, reduced_obs_indices)
