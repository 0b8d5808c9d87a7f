"""Core state types and index conventions.

The reference (mbt_gym) owns a single mutable ``(num_trajectories, state_dim)``
NumPy matrix with the column convention of ``mbt_gym/gym/index_names.py:1-7``
(cash, inventory, time, then concatenated per-process states).  The TPU-native
rebuild keeps the *observation* contract identical (see :func:`observe` in
``env.py``) but stores runtime state as an immutable structure-of-arrays pytree:
separate ``(N,)`` vectors fuse cleanly under XLA, avoid strided column updates,
and make `lax.scan` carries / shardings explicit.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax

# Observation column convention (parity with mbt_gym/gym/index_names.py:1-7).
CASH_INDEX = 0
INVENTORY_INDEX = 1
TIME_INDEX = 2
ASSET_PRICE_INDEX = 3

# Bid/ask column convention for arrivals/fills/depths arrays of shape (N, 2).
BID_INDEX = 0
ASK_INDEX = 1


class EnvState(NamedTuple):
    """Immutable per-step environment state (a pytree; leading axis = envs).

    Mirrors the information content of the reference's state matrix
    (``mbt_gym/gym/TradingEnvironment.py:196-216``) plus the bits the
    reference keeps in Python-object attributes (reward-function aux state,
    RNG, step counter).
    """

    cash: jax.Array  # (N,)
    inventory: jax.Array  # (N,)
    time: jax.Array  # (N,)
    process_states: Tuple[jax.Array, ...]  # each (N, d_i); d_i may be 0
    step: jax.Array  # () int32 — steps taken since reset
    key: jax.Array  # PRNG key consumed counter-style via fold_in(step)
    # Reward aux captured at reset (CjMm/CjOe criteria; RewardFunctions.py:72-74,111-113)
    initial_inventory: jax.Array  # (N,)
    start_time: jax.Array  # ()
    # Diagnostics: number of cash/inventory clip events so far (the reference
    # prints a warning instead: TradingEnvironment.py:283-297).
    clip_events: jax.Array  # () int32


class SlotNoise(NamedTuple):
    """Noise consumed by one stochastic-process slot in one env step.

    ``normal``/``uniform`` are ``(N, k)`` arrays or None; the per-process
    ``noise_spec`` declares how many columns of each kind the process consumes.
    Passing noise explicitly (instead of each process owning an RNG as in
    ``StochasticProcessModel.py:27``) is what makes both the counter-based
    native mode and the reference-exact compat mode possible with one step fn.
    """

    normal: Optional[jax.Array]
    uniform: Optional[jax.Array]


# Noise for all active process slots of one env step, in slot order
# (midprice, arrival, fill, impact) — matching the reference's state layout
# and seeding enumeration (TradingEnvironment.py:303-318,345-348).
StepNoise = Tuple[SlotNoise, ...]


class StepResult(NamedTuple):
    state: EnvState
    obs: jax.Array  # (N, S)
    reward: jax.Array  # (N,)
    done: jax.Array  # (N,) bool — all-or-nothing (TradingEnvironment.py:218-220)


class Trajectory(NamedTuple):
    """Stacked rollout buffers, time-major: (T+1/N/S etc.).

    The reference preallocates trajectory-major ``(N, S, T+1)`` buffers
    (helpers/generate_trajectory.py:11-15); time-major is the natural `scan`
    layout.  Use :func:`mbt_gym_tpu.rollout.to_reference_layout` for parity.

    MATERIALIZATION caveat (measured, round 5): consumed inside one jit
    these arrays fuse and cost nothing extra, but as a *jit output* the
    trailing S/A dims land on the lane axis of XLA's (8, 128) TPU tiling —
    obs (T+1, N, 4) pads 32x in HBM (0.3B env-steps/s materialization rate;
    does not even compile at 1M envs: the padded buffer is 103 GB).  For
    large-batch materialized trajectories use :class:`TrajectoryT`
    (feature-major, pad-free) and convert views as needed.
    """

    observations: jax.Array  # (T+1, N, S)
    actions: jax.Array  # (T, N, A)
    rewards: jax.Array  # (T, N)


class TrajectoryT(NamedTuple):
    """Feature-major trajectory: the TPU-native MATERIALIZATION layout
    (round 5).  Minor dims are (time, envs), so XLA's (8, 128) tiling pads
    nothing at any batch — the layout the fused kernels already write and
    the one to cross jit boundaries with at scale (see
    :class:`Trajectory`'s caveat; same convention as the fused-PPO
    ``TRolloutBatch``).

    ``observations_t[c, t, i]`` == ``Trajectory.observations[t, i, c]``.
    """

    observations_t: jax.Array  # (S, T+1, N)
    actions_t: jax.Array  # (A, T, N)
    rewards: jax.Array  # (T, N)

    def to_time_major(self) -> "Trajectory":
        """Transpose to the time-major :class:`Trajectory` view.  Cheap
        inside a jit (layout change fuses into consumers); as a jit output
        it pays the 32x-padded HBM cost documented on Trajectory."""
        return Trajectory(
            observations=jax.numpy.transpose(self.observations_t, (1, 2, 0)),
            actions=jax.numpy.transpose(self.actions_t, (1, 2, 0)),
            rewards=self.rewards,
        )

    def to_reference_layout(self):
        """The reference's trajectory-major buffers (obs (N, S, T+1),
        actions (N, A, T), rewards (N, 1, T) — generate_trajectory.py:11-15)."""
        return (
            jax.numpy.transpose(self.observations_t, (2, 0, 1)),
            jax.numpy.transpose(self.actions_t, (2, 0, 1)),
            jax.numpy.transpose(self.rewards, (1, 0))[:, None, :],
        )
