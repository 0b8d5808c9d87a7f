"""TensorBoard metric logging — counterpart of the reference's SB3
``tensorboard_log`` wiring (experiments/helpers.py:73-80, the repo's only
observability hook; SURVEY.md §5.1/§5.5).

The reference delegates logging to SB3's learner; here the on-device
learners return metric dicts per iteration, and this module streams them to
TensorBoard event files.  Uses ``torch.utils.tensorboard`` (torch is part
of the reference's own dependency stack); import is guarded so the package
works without it — ``TensorboardLogger(...)`` raises a clear error only
when actually constructed.

Usage::

    logger = TensorboardLogger("runs/canonical")
    for i in range(iters):
        ts, metrics = ppo.jit_train_iteration(env_cfg, ppo_cfg, ts, key(i))
        logger.log(i, metrics)
    logger.close()
"""
from __future__ import annotations

from typing import Dict, Mapping, Optional

import numpy as np


class TensorboardLogger:
    """Stream per-iteration scalar metrics to a TensorBoard event file.

    Values may be Python numbers, NumPy scalars or JAX scalars (fetched via
    ``float``), so the call site can pass a learner metric dict directly.
    ``prefix`` namespaces the tags (e.g. ``train/pg_loss``), matching the
    SB3 layout the reference's TensorBoard dashboards expect."""

    def __init__(self, log_dir: str, prefix: str = "train"):
        try:
            from torch.utils.tensorboard import SummaryWriter
        except Exception as exc:  # pragma: no cover - env without torch/tb
            raise ImportError(
                "TensorboardLogger needs torch.utils.tensorboard "
                "(pip install torch tensorboard)"
            ) from exc
        self._writer = SummaryWriter(log_dir=log_dir)
        self.prefix = prefix

    def log(self, step: int, metrics: Mapping[str, object]) -> None:
        """Log one iteration's scalar metrics at ``step``.  Values with a
        leading axis (the stacked ``(n_iterations,)`` metrics that
        :func:`mbt_gym_tpu.agents.ppo.train_chunk` returns) are logged
        element-wise at steps ``step .. step+n-1``."""
        for key, value in metrics.items():
            arr = np.asarray(value)
            if arr.ndim == 0:
                self._scalar(key, float(arr), step)
            elif arr.ndim == 1:
                for j, v in enumerate(arr):
                    self._scalar(key, float(v), step + j)
            else:
                raise ValueError(
                    f"metric {key!r} has shape {arr.shape}; TensorboardLogger "
                    "takes scalars or 1-D per-iteration stacks"
                )

    def _scalar(self, key: str, v: float, step: int) -> None:
        if np.isfinite(v):
            self._writer.add_scalar(f"{self.prefix}/{key}", v, int(step))

    def flush(self) -> None:
        self._writer.flush()

    def close(self) -> None:
        self._writer.close()


def maybe_logger(log_dir: Optional[str], prefix: str = "train"):
    """``None``-tolerant factory: returns a no-op logger when ``log_dir``
    is None (so call sites need no branching) or the real logger."""
    if log_dir is None:
        return _NoopLogger()
    return TensorboardLogger(log_dir, prefix=prefix)


class _NoopLogger:
    def log(self, step: int, metrics: Mapping[str, object]) -> None:
        pass

    def flush(self) -> None:
        pass

    def close(self) -> None:
        pass
