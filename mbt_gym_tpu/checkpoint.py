"""Checkpoint / resume (SURVEY.md §5.4 — the reference has none of its own;
model checkpoints went through SB3 callbacks).

Saves/restores any pytree bundle — typically
``{"env_state": EnvState, "train_state": PPOTrainState, "key": key}`` —
via orbax, so long training runs survive preemption with exact RNG state.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def _flatten(bundle):
    """Serialize as a name-keyed dict of leaves: custom pytree nodes
    (NamedTuples) and zero-size arrays (stateless processes carry (N, 0)
    states, which orbax refuses) both round-trip this way."""
    import numpy as np

    leaves = jax.tree_util.tree_leaves(jax.device_get(bundle))
    out = {}
    for i, leaf in enumerate(leaves):
        arr = np.asarray(leaf)
        out[f"leaf_{i}"] = np.zeros((), np.float32) if arr.size == 0 else arr
    return out


def save_checkpoint(path: str, bundle: Any) -> None:
    """Write a pytree bundle to ``path`` (overwrites)."""
    path = os.path.abspath(path)
    _checkpointer().save(path, _flatten(bundle), force=True)


def restore_checkpoint(path: str, template: Any) -> Any:
    """Restore a bundle into ``template``'s pytree structure (the template
    supplies structure and the content of any zero-size leaves)."""
    path = os.path.abspath(path)
    restored = _checkpointer().restore(path)
    flat_template, treedef = jax.tree_util.tree_flatten(template)
    merged = []
    for i, t in enumerate(flat_template):
        r = restored[f"leaf_{i}"]
        merged.append(t if getattr(t, "size", 1) == 0 else jax.numpy.asarray(r))
    return jax.tree_util.tree_unflatten(treedef, merged)
