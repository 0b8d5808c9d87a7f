"""Minimal pure-JAX MLP policy/value networks.

Replaces the reference's SB3/torch policies (experiments/helpers.py:68-96
uses 256x256 pi/vf nets).  Pure pytree params + apply functions keep the
whole learner jittable and shardable: with a ``("data", "model")`` mesh the
hidden dimension can be sharded over the ``model`` axis (tensor parallelism)
via :func:`mbt_gym_tpu.parallel.mesh.shard_mlp_params`.
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple  # noqa: F401

import jax
import jax.numpy as jnp

MlpParams = List[Dict[str, jax.Array]]


def init_mlp(key: jax.Array, sizes: Sequence[int], dtype=jnp.float32) -> MlpParams:
    """Orthogonal-ish (scaled normal) init for [in, h1, ..., out] sizes."""
    params = []
    for i, (fan_in, fan_out) in enumerate(zip(sizes[:-1], sizes[1:])):
        key, sub = jax.random.split(key)
        scale = jnp.sqrt(2.0 / fan_in) if i < len(sizes) - 2 else 0.01
        params.append(
            {
                "w": scale * jax.random.normal(sub, (fan_in, fan_out), dtype=dtype),
                "b": jnp.zeros((fan_out,), dtype=dtype),
            }
        )
    return params


def mlp_apply(
    params: MlpParams, x: jax.Array, activation=jnp.tanh, compute_dtype=None
) -> jax.Array:
    """Apply the MLP; with ``compute_dtype`` (e.g. jnp.bfloat16) the matmuls
    run at that precision on the MXU while master params stay float32 —
    outputs are cast back to the input dtype."""
    out_dtype = x.dtype
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    for i, layer in enumerate(params):
        w, b = layer["w"], layer["b"]
        if compute_dtype is not None:
            w, b = w.astype(compute_dtype), b.astype(compute_dtype)
        x = x @ w + b
        if i < len(params) - 1:
            x = activation(x)
    return x.astype(out_dtype)


def init_actor_critic(
    key: jax.Array,
    obs_dim: int,
    action_dim: int,
    hidden: Sequence[int] = (256, 256),
    init_log_std: float = -0.5,
    dtype=jnp.float32,
    shared_trunk: bool = False,
) -> Dict[str, Any]:
    """Separate pi/vf MLPs by default (the reference's SB3 convention,
    experiments/helpers.py:69-72).  ``shared_trunk=True`` is the
    TPU-production variant: one ``hidden`` trunk with linear pi/vf heads —
    half the matmul FLOPs *and* half the HBM activation traffic of separate
    towers, which is what bounds PPO throughput at pod batch sizes."""
    if shared_trunk:
        k_t, k_pi, k_vf = jax.random.split(key, 3)
        head_scale = 0.01
        # init_mlp's last entry is the 0.01-scaled output layer; drop it to
        # keep only the hidden-scaled trunk layers [obs->h1, h1->h2, ...].
        trunk = init_mlp(k_t, [obs_dim, *hidden, 1], dtype)[:-1]
        return {
            "shared": trunk,
            "pi_head": {
                "w": head_scale * jax.random.normal(k_pi, (hidden[-1], action_dim), dtype=dtype),
                "b": jnp.zeros((action_dim,), dtype=dtype),
            },
            "vf_head": {
                "w": head_scale * jax.random.normal(k_vf, (hidden[-1], 1), dtype=dtype),
                "b": jnp.zeros((1,), dtype=dtype),
            },
            "log_std": jnp.full((action_dim,), init_log_std, dtype=dtype),
        }
    k_pi, k_vf = jax.random.split(key)
    return {
        "pi": init_mlp(k_pi, [obs_dim, *hidden, action_dim], dtype),
        "vf": init_mlp(k_vf, [obs_dim, *hidden, 1], dtype),
        "log_std": jnp.full((action_dim,), init_log_std, dtype=dtype),
    }


def _trunk_apply(layers: MlpParams, x: jax.Array, compute_dtype=None) -> jax.Array:
    """Apply MLP layers with the activation after EVERY layer (a trunk, not a
    head-terminated tower); keeps ``compute_dtype`` output for head reuse."""
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    for layer in layers:
        w, b = layer["w"], layer["b"]
        if compute_dtype is not None:
            w, b = w.astype(compute_dtype), b.astype(compute_dtype)
        x = jnp.tanh(x @ w + b)
    return x


def _head_apply(layer, h: jax.Array, out_dtype, compute_dtype=None) -> jax.Array:
    w, b = layer["w"], layer["b"]
    if compute_dtype is not None:
        w, b = w.astype(compute_dtype), b.astype(compute_dtype)
    return (h @ w + b).astype(out_dtype)


def policy_value(params, obs: jax.Array, compute_dtype=None):
    """(policy mean, value) in one pass — with a shared trunk the hidden
    activations are computed once and reused by both heads."""
    if "shared" in params:
        h = _trunk_apply(params["shared"], obs, compute_dtype=compute_dtype)
        mean = _head_apply(params["pi_head"], h, obs.dtype, compute_dtype)
        v = _head_apply(params["vf_head"], h, obs.dtype, compute_dtype)[..., 0]
        return mean, v
    return (
        mlp_apply(params["pi"], obs, compute_dtype=compute_dtype),
        mlp_apply(params["vf"], obs, compute_dtype=compute_dtype)[..., 0],
    )


def policy_mean(params, obs: jax.Array, compute_dtype=None) -> jax.Array:
    if "shared" in params:
        h = _trunk_apply(params["shared"], obs, compute_dtype=compute_dtype)
        return _head_apply(params["pi_head"], h, obs.dtype, compute_dtype)
    return mlp_apply(params["pi"], obs, compute_dtype=compute_dtype)


def value(params, obs: jax.Array, compute_dtype=None) -> jax.Array:
    if "shared" in params:
        h = _trunk_apply(params["shared"], obs, compute_dtype=compute_dtype)
        return _head_apply(params["vf_head"], h, obs.dtype, compute_dtype)[..., 0]
    return mlp_apply(params["vf"], obs, compute_dtype=compute_dtype)[..., 0]


def sample_action(params, obs: jax.Array, key: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Gaussian policy sample + log-prob (diagonal, state-independent std)."""
    mean = policy_mean(params, obs)
    std = jnp.exp(params["log_std"])
    eps = jax.random.normal(key, mean.shape, dtype=mean.dtype)
    action = mean + std * eps
    log_prob = gaussian_log_prob(params, mean, action)
    return action, log_prob


def gaussian_log_prob(params, mean: jax.Array, action: jax.Array) -> jax.Array:
    log_std = params["log_std"]
    z = (action - mean) * jnp.exp(-log_std)
    return jnp.sum(-0.5 * z**2 - log_std - 0.5 * jnp.log(2 * jnp.pi), axis=-1)


def entropy(params) -> jax.Array:
    return jnp.sum(params["log_std"] + 0.5 * jnp.log(2 * jnp.pi * jnp.e))
