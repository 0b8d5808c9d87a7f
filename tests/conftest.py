"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding tests run anywhere (SURVEY.md §4).

Note: this container's sitecustomize registers the axon TPU plugin and
monkeypatches jax's backend resolution before pytest starts, so setting
``JAX_PLATFORMS`` via the environment here is too late — use
``jax.config.update``, which also skips the plugin's multi-minute TPU-claim
handshake for CPU-only test runs.
"""
import os

if os.environ.get("MBT_TPU_TESTS"):
    # Opt-in real-hardware mode: leave the backend alone so the TPU-gated
    # tests (test_convergence.py::test_fused_pipeline_learns_*) actually
    # run instead of skipping.  Expect the axon claim handshake (minutes)
    # at the first op.  NOTE: run SELECTED tests under this flag (e.g.
    # `pytest tests/test_convergence.py -k tpu`) — the full suite needs
    # the 8-virtual-device CPU mesh below, which a single-chip TPU
    # backend cannot provide.
    import jax
else:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")


import os as _os
import sys as _sys

import pytest as _pytest

REFERENCE_PATH = "/root/reference"
_GYM_STUB = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "_gym_stub")


@_pytest.fixture(scope="session")
def reference_modules():
    """Import the actual reference implementation (via the gym stub) and
    yield its modules.  Shared by all bitwise-vs-reference test files."""
    if not _os.path.isdir(_os.path.join(REFERENCE_PATH, "mbt_gym")):
        _pytest.skip("reference checkout not available")
    _sys.path.insert(0, _GYM_STUB)
    _sys.path.insert(0, REFERENCE_PATH)
    try:
        import mbt_gym.gym.TradingEnvironment as te
        import mbt_gym.gym.ModelDynamics as md
        import mbt_gym.stochastic_processes.midprice_models as mm
        import mbt_gym.stochastic_processes.arrival_models as am
        import mbt_gym.stochastic_processes.fill_probability_models as fm
        import mbt_gym.rewards.RewardFunctions as rf
        import mbt_gym.agents.BaselineAgents as ba
        import mbt_gym.gym.helpers.generate_trajectory as gt

        yield {"te": te, "md": md, "mm": mm, "am": am, "fm": fm, "rf": rf, "ba": ba, "gt": gt}
    finally:
        _sys.path.remove(_GYM_STUB)
        _sys.path.remove(REFERENCE_PATH)
