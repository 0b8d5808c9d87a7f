"""Checkpoint / resume (SURVEY.md §5.4 — the reference has none of its own;
model checkpoints went through SB3 callbacks).

Saves/restores any pytree bundle — typically
``{"env_state": EnvState, "train_state": PPOTrainState, "key": key}`` —
via orbax, so long training runs survive preemption with exact RNG state.

Leaves are named by their tree path (not position) and a structure
fingerprint — treedef string plus every leaf's path/shape/dtype — is stored
alongside; restoring into a template whose structure, shapes, or dtypes
drifted from the saved bundle raises :class:`CheckpointMismatchError`
instead of silently loading wrong tensors.
"""
from __future__ import annotations

import hashlib
import json
import os
from typing import Any

import jax
import numpy as np

_FINGERPRINT_KEY = "__structure_fingerprint__"


class CheckpointMismatchError(RuntimeError):
    """Saved bundle and restore template have different pytree structure."""


def _path_str(path) -> str:
    """Stable string form of a jax key path ('train_state/params/pi/0/w')."""
    parts = []
    for entry in path:
        if hasattr(entry, "key"):
            parts.append(str(entry.key))
        elif hasattr(entry, "idx"):
            parts.append(str(entry.idx))
        elif hasattr(entry, "name"):
            parts.append(str(entry.name))
        else:
            parts.append(str(entry))
    return "/".join(parts) or "<root>"


def _leaves_with_names(bundle):
    flat, treedef = jax.tree_util.tree_flatten_with_path(jax.device_get(bundle))
    named = []
    for path, leaf in flat:
        named.append((_path_str(path), np.asarray(leaf)))
    return named, treedef


def _fingerprint(named, treedef) -> dict:
    leaves = [
        {"name": name, "shape": list(arr.shape), "dtype": str(arr.dtype)}
        for name, arr in named
    ]
    treedef_str = str(treedef)
    return {
        "treedef_sha256": hashlib.sha256(treedef_str.encode()).hexdigest(),
        "treedef": treedef_str,
        "leaves": leaves,
    }


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, bundle: Any) -> None:
    """Write a pytree bundle to ``path`` (overwrites)."""
    path = os.path.abspath(path)
    named, treedef = _leaves_with_names(bundle)
    out = {}
    for name, arr in named:
        # orbax refuses zero-size arrays (stateless processes carry (N, 0)
        # states); store a placeholder, the template supplies the content.
        out[name] = np.zeros((), np.float32) if arr.size == 0 else arr
    fp = _fingerprint(named, treedef)
    out[_FINGERPRINT_KEY] = np.frombuffer(
        json.dumps(fp).encode("utf-8"), dtype=np.uint8
    ).copy()
    _checkpointer().save(path, out, force=True)


def restore_checkpoint(path: str, template: Any) -> Any:
    """Restore a bundle into ``template``'s pytree structure.

    The template supplies structure plus the content of any zero-size
    leaves.  Raises :class:`CheckpointMismatchError` when the template's
    structure fingerprint (leaf paths, shapes, dtypes) differs from what was
    saved — positional silent-misload is impossible."""
    path = os.path.abspath(path)
    restored = _checkpointer().restore(path)
    named, treedef = _leaves_with_names(template)
    want = _fingerprint(named, treedef)

    raw_fp = restored.get(_FINGERPRINT_KEY)
    if raw_fp is None:
        raise CheckpointMismatchError(
            f"{path} has no structure fingerprint — not a checkpoint written "
            "by this version of mbt_gym_tpu.checkpoint."
        )
    saved_fp = json.loads(np.asarray(raw_fp, dtype=np.uint8).tobytes().decode("utf-8"))

    if saved_fp["treedef_sha256"] != want["treedef_sha256"] or saved_fp["leaves"] != want["leaves"]:
        saved_names = {leaf["name"]: leaf for leaf in saved_fp["leaves"]}
        want_names = {leaf["name"]: leaf for leaf in want["leaves"]}
        missing = sorted(set(saved_names) - set(want_names))
        extra = sorted(set(want_names) - set(saved_names))
        changed = sorted(
            name
            for name in set(saved_names) & set(want_names)
            if saved_names[name] != want_names[name]
        )
        raise CheckpointMismatchError(
            "Checkpoint/template structure mismatch: "
            f"leaves only in checkpoint={missing}, only in template={extra}, "
            f"shape/dtype drift={changed}"
            + (
                "; treedef differs"
                if saved_fp["treedef_sha256"] != want["treedef_sha256"]
                else ""
            )
        )

    flat_template, treedef = jax.tree_util.tree_flatten_with_path(template)
    merged = []
    for path_entries, t in flat_template:
        name = _path_str(path_entries)
        r = restored[name]
        merged.append(t if getattr(t, "size", 1) == 0 else jax.numpy.asarray(r))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), merged
    )
