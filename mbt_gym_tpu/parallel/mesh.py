"""Device mesh + sharding utilities — the TPU-native replacement for the
reference's process-level parallelism (``MultiprocessTradingEnv``,
SURVEY.md §2.9/§5.8).

The env batch axis ("envs") shards over the mesh's ``data`` axis; the
learner's MLP hidden dimension can shard over ``model`` (tensor parallel).
Because the env step is embarrassingly parallel over envs, rollouts need no
collectives at all; XLA/GSPMD inserts the learner's gradient ``psum`` over
``data`` and the activation collectives over ``model`` from the sharding
annotations alone — no NCCL/MPI-style hand-written communication survives
from the reference design (it had none to begin with; its only transport was
multiprocessing pipes).

Multi-host: call :func:`init_distributed` first (wraps
``jax.distributed.initialize``), then build the mesh over
``jax.devices()`` — the data axis then spans hosts over ICI/DCN.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None, **kwargs) -> None:
    """Multi-host initialisation (no-op if already initialised)."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address, **kwargs)
    except RuntimeError:
        pass  # already initialised


def make_mesh(
    data: Optional[int] = None, model: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    """Build a ("data", "model") mesh.  ``data`` defaults to
    n_devices // model."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    assert data * model == len(devices), (
        f"mesh {data}x{model} does not cover {len(devices)} devices"
    )
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading env axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_state(mesh: Mesh, state):
    """Place an EnvState pytree: leaves whose leading axis is the env batch
    shard over 'data'; everything else (scalars, the PRNG key — whose (2,)
    shape must NOT be mistaken for a batch axis) replicates."""
    rep = replicated(mesh)
    n = state.cash.shape[0]

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape and x.shape[0] == n:
            return jax.device_put(x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1)))))
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(place, state)


def mlp_sharding_specs(params) -> dict:
    """PartitionSpecs for actor-critic params: first-layer out-dim and
    hidden-layer dims shard over 'model'; final layer replicates."""

    def spec_for_mlp(mlp):
        specs = []
        last = len(mlp) - 1
        for i, _ in enumerate(mlp):
            if i == 0 and last > 0:
                specs.append({"w": P(None, "model"), "b": P("model")})
            elif i < last:
                specs.append({"w": P("model", None), "b": P()})
            else:
                specs.append({"w": P("model", None) if last > 0 else P(), "b": P()})
        return specs

    return {
        "pi": spec_for_mlp(params["pi"]),
        "vf": spec_for_mlp(params["vf"]),
        "log_std": P(),
    }


def shard_params(mesh: Mesh, params):
    """Tensor-parallel placement of actor-critic params over 'model'."""
    specs = mlp_sharding_specs(params)

    def place(p, s):
        if isinstance(p, dict):
            return {k: place(p[k], s[k]) for k in p}
        if isinstance(p, (list, tuple)):
            return type(p)(place(pi, si) for pi, si in zip(p, s))
        return jax.device_put(p, NamedSharding(mesh, s))

    return place(params, specs)
