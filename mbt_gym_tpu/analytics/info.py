"""Info calculators (counterpart of ``mbt_gym/gym/info_calculators.py``).

The reference's ``ActionInfoCalculator`` accumulates actions in a host-side
buffer and emits per-trajectory mean actions at episode end (SB3 VecMonitor
convention; note its ``ndarray.nanmean`` call at info_calculators.py:52 is a
latent AttributeError — intent implemented here).  In the TPU engine, infos
are computed *after* a rollout from the stacked trajectory, which is both
simpler and free of per-step host traffic.
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np

from mbt_gym_tpu.types import Trajectory


def mean_action_infos(traj: Trajectory) -> List[Dict[str, float]]:
    """Per-trajectory mean actions over the episode, as the list-of-dicts the
    reference emits at the terminal step (info_calculators.py:36-44)."""
    mean_actions = np.asarray(traj.actions).mean(axis=0)  # (N, A)
    return [
        {f"action_{j}": float(mean_actions[i, j]) for j in range(mean_actions.shape[1])}
        for i in range(mean_actions.shape[0])
    ]


def episode_return_infos(traj: Trajectory) -> List[Dict[str, float]]:
    """Per-trajectory episodic return (VecMonitor-style 'episode' infos)."""
    totals = np.asarray(traj.rewards).sum(axis=0)
    length = traj.rewards.shape[0]
    return [{"episode": {"r": float(r), "l": length}} for r in totals]
