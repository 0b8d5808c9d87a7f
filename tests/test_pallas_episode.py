"""Pallas whole-episode kernel: interpreter-mode correctness on CPU.

The kernel uses its own (hardware) RNG stream, so validation is statistical:
terminal-state moments must match the XLA reference engine's across a large
batch, and the uniform-from-bits conversion must be exactly distributed.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mbt_gym_tpu import jit_rollout
from mbt_gym_tpu.agents.baseline import AvellanedaStoikovAgent
from mbt_gym_tpu.ops.pallas_episode import (
    as_episode_pallas,
    params_from_config,
)
from mbt_gym_tpu.utils.config import as_env_config


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


@pytest.mark.skipif(
    not _on_tpu(),
    reason="Pallas interpret mode stubs prng_random_bits to zeros on CPU; the"
    " statistical validation needs the hardware PRNG (run on a TPU host;"
    " validated on v5e: PnL 64.82+/-6.62 vs ground truth 64.87+/-6.69).",
)
@pytest.mark.parametrize("risk_aversion", [0.1])
def test_pallas_episode_moments_match_xla(risk_aversion):
    cfg = as_env_config(num_trajectories=1024, n_steps=50)
    params = params_from_config(cfg, risk_aversion=risk_aversion)
    cash, inv, price = as_episode_pallas(params, 7, 1024, rows=8)
    pnl = np.asarray(cash + inv * price)

    agent = AvellanedaStoikovAgent.from_config(cfg, risk_aversion=risk_aversion)
    res = jit_rollout(cfg, agent.policy(), None, jax.random.PRNGKey(7))
    ref_pnl = np.asarray(res.trajectory.rewards.sum(axis=0))
    ref_inv = np.asarray(res.trajectory.observations[-1, :, 1])

    # Means within a few standard errors of each other.
    se = ref_pnl.std() / np.sqrt(len(ref_pnl)) + pnl.std() / np.sqrt(len(pnl))
    assert abs(pnl.mean() - ref_pnl.mean()) < 4 * se, (pnl.mean(), ref_pnl.mean())
    assert abs(np.asarray(inv).mean() - ref_inv.mean()) < 0.5
    assert abs(np.asarray(inv).std() - ref_inv.std()) < 0.5
    assert abs(pnl.std() - ref_pnl.std()) / ref_pnl.std() < 0.3


def test_uniform_from_bits_distribution():
    """Runs the ACTUAL kernel helper (through an interpret-mode pallas call
    on supplied input bits — interpret mode stubs prng_random_bits but
    bitcast/shift of inputs work), so a change to its shift/scale fails here
    on CPU."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from mbt_gym_tpu.ops.pallas_episode import _uniform_from_bits

    def kern(bits_ref, out_ref):
        out_ref[:] = _uniform_from_bits(bits_ref[:])

    bits = jax.random.bits(jax.random.PRNGKey(0), (512, 128), dtype=jnp.uint32)
    u = np.asarray(
        pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((512, 128), jnp.float32),
            interpret=pltpu.InterpretParams(),
        )(bits)
    )
    assert u.min() >= 0.0 and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 0.01
    assert abs(u.var() - 1.0 / 12) < 0.005
    # exact value check against the documented conversion
    expected = (np.asarray(bits, dtype=np.uint64) >> 8).astype(np.float32) / (1 << 24)
    np.testing.assert_allclose(u, expected, rtol=0, atol=0)


def test_pallas_requires_matching_config():
    import dataclasses

    from mbt_gym_tpu.rewards import RunningInventoryPenalty

    cfg = as_env_config(num_trajectories=1024)
    bad = dataclasses.replace(cfg, reward_function=RunningInventoryPenalty())
    with pytest.raises(AssertionError):
        params_from_config(bad)


def test_cj_params_config_guard():
    from mbt_gym_tpu.ops.pallas_episode import cj_params_from_config
    from mbt_gym_tpu.utils.config import as_env_config, cj_env_config

    cfg = cj_env_config(num_trajectories=1024, max_inventory=10.0)
    p = cj_params_from_config(cfg)
    assert p.phi == 0.01 and p.alpha == 0.001 and p.n_steps == 1000
    with pytest.raises(AssertionError):
        cj_params_from_config(as_env_config(num_trajectories=1024))  # PnL reward


@pytest.mark.skipif(
    not _on_tpu(),
    reason="hardware PRNG required (validated on v5e: mean 68.15+/-11.96 vs"
    " analytic 68.26, t=-1.18; ~115M steps/s — slower than the XLA path,"
    " kept as a documented negative result)",
)
def test_cj_pallas_episode_matches_value_function():
    import numpy as np

    from mbt_gym_tpu.agents.baseline import CarteaJaimungalMmAgent
    from mbt_gym_tpu.ops.pallas_episode import cj_episode_rewards_pallas
    from mbt_gym_tpu.utils.config import cj_env_config

    cfg = cj_env_config(num_trajectories=16384, max_inventory=100.0)
    agent = CarteaJaimungalMmAgent.from_config(cfg, max_inventory=100)
    rewards = np.asarray(cj_episode_rewards_pallas(cfg, agent, 410, 16384))
    obs0 = np.zeros((1, 4))
    obs0[0, 3] = 100.0
    true = float(np.asarray(agent.true_value_function(jnp.asarray(obs0)))[0])
    t = (rewards.mean() - true) / (rewards.std() / np.sqrt(len(rewards)))
    assert abs(t) < 4.0, (rewards.mean(), true, t)


@pytest.mark.skipif(
    not _on_tpu(),
    reason="hardware PRNG required (validated on v5e: full-trajectory stats"
    " spread 1.4918, PnL 64.81+/-6.64, inv 0.01+/-2.92 vs ground truth;"
    " 914M env-steps/s with trajectories)",
)
def test_pallas_trajectory_kernel_stats():
    import numpy as np

    from mbt_gym_tpu.ops.pallas_episode import (
        as_episode_trajectories_pallas,
        as_trajectory_from_pallas,
        params_from_config,
    )
    from mbt_gym_tpu.rollout import episode_stats
    from mbt_gym_tpu.utils.config import as_env_config

    cfg = as_env_config(num_trajectories=16384)
    p = params_from_config(cfg, 0.1)
    streams = as_episode_trajectories_pallas(p, 50, 16384)
    traj = as_trajectory_from_pallas(p, *streams)
    stats = {k: float(v) for k, v in episode_stats(cfg, traj).items()}
    assert abs(stats["mean_spread"] - 1.4918) < 0.01
    assert abs(stats["mean_pnl"] - 64.87) < 1.0
    assert abs(stats["std_terminal_inventory"] - 2.89) < 0.3


# ---------------------------------------------------------------------------
# Noise-injected kernel parity (VERDICT round-1 item 3): the kernels accept
# injected per-step draws, so interpret mode on CPU asserts step-for-step
# parity with the XLA engine on the SAME noise — regressions are caught in
# CI, not just on hardware.
# ---------------------------------------------------------------------------
def _step_noise_from_channels(channels):
    """(T, 5, N) kernel channels -> the engine's StepNoise pytree for the
    (midprice, arrivals, fills) slot order of LimitOrderDynamics."""
    from mbt_gym_tpu.types import SlotNoise

    return (
        SlotNoise(normal=channels[:, 4][..., None], uniform=None),
        SlotNoise(normal=None, uniform=channels[:, 0:2].transpose(0, 2, 1)),
        SlotNoise(normal=None, uniform=channels[:, 2:4].transpose(0, 2, 1)),
    )


def test_as_kernel_noise_parity_with_xla_engine():
    """Same injected noise -> the AS kernel and the XLA engine must agree on
    the terminal state, including NONZERO initial cash/inventory and a late
    start (the round-1 cash0=inv0=0/t0=0 restriction, now lifted)."""
    import dataclasses

    from mbt_gym_tpu.rollout import rollout

    cfg = dataclasses.replace(
        as_env_config(num_trajectories=256, n_steps=30),
        initial_cash=5.0, initial_inventory=3, start_time=0.2,
    )
    p = params_from_config(cfg, risk_aversion=0.1)
    assert p.run_steps == 24  # 0.2 / (1/30) = 6 steps skipped
    rng = np.random.default_rng(11)
    channels = rng.uniform(size=(p.run_steps, 5, 256)).astype(np.float32)
    channels[:, 4] = rng.normal(size=(p.run_steps, 256)).astype(np.float32)

    cash, inv, price = as_episode_pallas(
        p, 0, 256, rows=2, interpret=True, noise=jnp.asarray(channels)
    )

    agent = AvellanedaStoikovAgent.from_config(cfg, risk_aversion=0.1)
    res = rollout(
        cfg, agent.policy(), None, jax.random.PRNGKey(0),
        noise=_step_noise_from_channels(jnp.asarray(channels)),
    )
    final = np.asarray(res.trajectory.observations[-1])  # (N, S)
    np.testing.assert_array_equal(np.asarray(inv), final[:, 1])
    # f32 accumulation-order noise only (different but equivalent op order).
    np.testing.assert_allclose(np.asarray(cash), final[:, 0], rtol=1e-6, atol=1e-3)
    np.testing.assert_allclose(np.asarray(price), final[:, 3], rtol=0, atol=1e-3)


def test_oe_kernel_noise_parity_with_xla_engine():
    """Speed-dynamics episode kernel vs the XLA engine on the same midprice
    noise: terminal state AND total CjOe episode rewards must agree."""
    from mbt_gym_tpu.agents.baseline import CarteaJaimungalOeAgent
    from mbt_gym_tpu.ops.pallas_episode import (
        oe_episode_pallas,
        oe_episode_rewards_pallas,
        oe_params_from_config,
        oe_speed_table,
    )
    from mbt_gym_tpu.rollout import rollout
    from mbt_gym_tpu.types import SlotNoise
    from mbt_gym_tpu.utils.config import oe_env_config

    cfg = oe_env_config(num_trajectories=256, n_steps=40, initial_inventory=10)
    agent = CarteaJaimungalOeAgent.from_config(
        cfg, phi=cfg.reward_function.per_step_inventory_aversion,
        alpha=cfg.reward_function.terminal_inventory_aversion,
    )
    p = oe_params_from_config(cfg)
    rng = np.random.default_rng(5)
    normals = rng.normal(size=(p.run_steps, 256)).astype(np.float32)

    table = oe_speed_table(cfg, agent)
    cash, inv, price, perm, _, _ = oe_episode_pallas(
        p, table, 0, 256, rows=2, interpret=True, noise=jnp.asarray(normals)
    )
    rewards = oe_episode_rewards_pallas(
        cfg, agent, 0, 256, rows=2, interpret=True, noise=jnp.asarray(normals)
    )

    noise = (
        SlotNoise(normal=jnp.asarray(normals)[..., None], uniform=None),
        SlotNoise(normal=None, uniform=None),  # impact model: no noise
    )
    res = rollout(cfg, agent.policy(), None, jax.random.PRNGKey(0), noise=noise)
    final = np.asarray(res.trajectory.observations[-1])
    np.testing.assert_allclose(np.asarray(inv), final[:, 1], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cash), final[:, 0], rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(price), final[:, 3], rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(perm), final[:, 4], rtol=1e-5, atol=1e-6)
    ref_rewards = np.asarray(res.trajectory.rewards.sum(axis=0))
    np.testing.assert_allclose(np.asarray(rewards), ref_rewards, rtol=1e-4, atol=2e-3)


@pytest.mark.skipif(
    not _on_tpu(),
    reason="hardware PRNG required; the noise-injected variant above covers "
    "CPU parity — this validates the hardware-PRNG path statistically.",
)
def test_oe_pallas_episode_hardware_stats():
    """OE kernel with hardware PRNG: terminal inventory must match the
    closed-form liquidation schedule (same invariant as
    test_components.test_oe_schedule_matches_analytic_inventory)."""
    from mbt_gym_tpu.agents.baseline import CarteaJaimungalOeAgent
    from mbt_gym_tpu.ops.pallas_episode import (
        oe_episode_pallas,
        oe_params_from_config,
        oe_speed_table,
    )
    from mbt_gym_tpu.utils.config import oe_env_config

    cfg = oe_env_config(num_trajectories=8192, n_steps=200, initial_inventory=10)
    agent = CarteaJaimungalOeAgent.from_config(cfg, phi=2e-4, alpha=0.01)
    p = oe_params_from_config(cfg)
    table = oe_speed_table(cfg, agent)
    cash, inv, price, perm, _, _ = oe_episode_pallas(p, table, 3, 8192)
    gamma = np.sqrt(agent.phi / agent.temporary_impact)
    root = np.sqrt(agent.temporary_impact * agent.phi)
    zeta = (agent.alpha - 0.5 * agent.permanent_impact + root) / (
        agent.alpha - 0.5 * agent.permanent_impact - root
    )
    q_T = 10.0 * (zeta - 1.0) / (zeta * np.exp(gamma) - np.exp(-gamma))
    # deterministic schedule -> all envs share the terminal inventory
    np.testing.assert_allclose(np.asarray(inv), q_T, rtol=1e-3)
    assert np.asarray(perm).std() < 1e-6  # impact path is deterministic too


def test_traj_chunked_matches_1d_tiling():
    """The time-chunked 2D-grid trajectory kernel (round 4: (t_chunk,
    rows, LANES) output blocks + VMEM-scratch state carry) must be
    BITWISE equal to the proven 1D 16-row tiling under the Mosaic
    interpreter (zero PRNG bits => both paths are deterministic and the
    step math is shared, so any disagreement is a chunking/carry bug)."""
    import jax
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    from mbt_gym_tpu.ops import pallas_episode as pe
    from mbt_gym_tpu.utils.config import as_env_config

    interp = pltpu.InterpretParams()
    cfg = as_env_config(num_trajectories=4096, n_steps=900)
    p = pe.params_from_config(cfg, risk_aversion=0.1)
    # past the grid=1 envelope: rows=None takes the chunked path
    assert p.run_steps * (4096 // 128) > 200 * 128
    rows, t_chunk = pe._traj_chunk_plan(p.run_steps, 4096)
    assert rows == 32 and p.run_steps % t_chunk == 0
    outs_1d = pe.as_episode_trajectories_pallas(
        p, 3, 4096, rows=pe.TRAJ_ROWS, interpret=interp
    )
    outs_chunked = pe.as_episode_trajectories_pallas(
        p, 3, 4096, rows=None, interpret=interp
    )
    for a, b in zip(outs_1d, outs_chunked):
        assert a.shape == (900, 4096)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_traj_full_emit_matches_state_emit_assembly():
    """emit="full" (round 5: kernel-computed rewards + closed-form actions)
    must reproduce the state-mode + XLA-assembly Trajectory exactly, in
    BOTH tilings (one-shot grid=1 and the time-chunked 2D grid) under the
    Mosaic interpreter (zero PRNG bits => deterministic)."""
    import jax
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    from mbt_gym_tpu.ops import pallas_episode as pe
    from mbt_gym_tpu.utils.config import as_env_config

    interp = pltpu.InterpretParams()
    for n, steps in ((256, 20), (512, 900)):  # one-shot; chunked
        cfg = as_env_config(num_trajectories=n, n_steps=steps)
        p = pe.params_from_config(cfg, risk_aversion=0.1)
        state_streams = pe.as_episode_trajectories_pallas(
            p, 3, n, interpret=interp
        )
        ref = pe.as_trajectory_from_pallas(p, *state_streams)
        full_streams = pe.as_episode_trajectories_pallas(
            p, 3, n, interpret=interp, emit="full"
        )
        got = pe.as_trajectory_from_pallas_full(p, full_streams)
        # state streams are shared math: bitwise
        for a, b in zip(state_streams, full_streams[:3]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(
            np.asarray(got.observations), np.asarray(ref.observations)
        )
        np.testing.assert_allclose(
            np.asarray(got.actions), np.asarray(ref.actions), rtol=1e-6, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(got.rewards), np.asarray(ref.rewards), rtol=1e-6, atol=1e-5
        )


def test_traj_container_matches_full_streams():
    """emit="container" (round 5: one kernel-direct (7, T, N) buffer) must
    hold exactly the emit="full" streams plus the post-step time plane, in
    both tilings, under the Mosaic interpreter."""
    import jax
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    from mbt_gym_tpu.ops import pallas_episode as pe
    from mbt_gym_tpu.utils.config import as_env_config

    interp = pltpu.InterpretParams()
    for n, steps in ((256, 20), (512, 900)):  # one-shot; chunked
        cfg = as_env_config(num_trajectories=n, n_steps=steps)
        p = pe.params_from_config(cfg, risk_aversion=0.1)
        full = pe.as_episode_trajectories_pallas(p, 3, n, interpret=interp, emit="full")
        data = pe.as_episode_trajectories_pallas(
            p, 3, n, interpret=interp, emit="container"
        )
        assert data.shape == (pe.CONTAINER_PLANES, steps, n)
        v = pe.trajectory_planes_view(data)
        for name, idx in (("cash", 0), ("inventory", 1), ("price", 2),
                          ("reward", 3), ("bid", 4), ("ask", 5)):
            np.testing.assert_array_equal(
                np.asarray(v[{"cash": "cash", "inventory": "inventory",
                              "price": "price", "reward": "reward",
                              "bid": "bid", "ask": "ask"}[name]]),
                np.asarray(full[idx]), err_msg=name,
            )
        times = np.asarray(v["time"])
        want = (p.start_time + (np.arange(steps) + 1) * p.dt).astype(np.float32)
        np.testing.assert_allclose(times, np.broadcast_to(want[:, None], (steps, n)), rtol=1e-6)


def test_episode_stats_accepts_trajectory_t():
    """episode_stats must read the feature-major TrajectoryT identically
    to the time-major Trajectory built from the same streams."""
    import jax
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    from mbt_gym_tpu.ops import pallas_episode as pe
    from mbt_gym_tpu.rollout import episode_stats
    from mbt_gym_tpu.utils.config import as_env_config

    cfg = as_env_config(num_trajectories=256, n_steps=20)
    p = pe.params_from_config(cfg, risk_aversion=0.1)
    streams = pe.as_episode_trajectories_pallas(
        p, 3, 256, interpret=pltpu.InterpretParams(), emit="full"
    )
    a = episode_stats(cfg, pe.as_trajectory_from_pallas_full(p, streams))
    b = episode_stats(cfg, pe.as_trajectory_t_from_pallas(p, streams))
    for k in a:
        np.testing.assert_allclose(float(a[k]), float(b[k]), rtol=1e-6)
