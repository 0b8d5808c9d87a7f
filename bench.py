"""Headline benchmark (driver contract): prints ONE JSON line.

Metric: env-steps/s on the flagship Avellaneda-Stoikov market-making config
(BM midprice + Poisson(140,140) arrivals + exponential fill, 200-step
episodes) at 16k envs/chip — the BASELINE.json metric.  The whole episode
(closed-form AS policy + fused env step, trajectory buffers included) runs
as one compiled XLA program; timing forces a scalar checksum to the host
each iteration so nothing is measured asynchronously.

Robust timing (VERDICT r2 item 2): every lane takes a 4-call chained burst
warmup (short-call configs need several dispatches before the relay settles;
a single warmup call under-reported the engine rate ~3x in the r02 driver
capture), then the MEDIAN of 3 independently-timed windows.  The JSON line
carries the per-lane rates (engine / pallas / fused PPO) alongside the
headline value.

Hardware verification (VERDICT r2 item 4): on TPU the run also (a) checks
the Pallas episode kernel's HARDWARE PRNG draws statistically against the
AS-replication ground truth (spread / PnL / terminal-inventory bands —
the condensed test_pallas_* TPU-gated assertions) and (b) runs one fused
PPO train iteration asserting finite metrics and a sane reward; the result
ships as ``"verify"`` in the JSON so kernel regressions are driver-visible.

``vs_baseline`` is the speedup over the reference implementation's
single-process NumPy hot loop (mbt_gym's README headline is its vectorized
NumPy step; the package itself is not importable here — gym/SB3 absent — so
the loop is reproduced faithfully in tests/reference_oracle.py and measured
in-process on this machine's CPU at the same batch size).
"""
from __future__ import annotations

import json
import statistics
import sys
import time

import numpy as np

WARMUP_CALLS = 4
WINDOWS = 3
# Per-lane max/min window-time ratio recorded by _timed_median; lanes above
# DISPERSION_FLAG land in the JSON's "timing_dispersion" field (VERDICT r4
# weak #5: a wedged relay window can move a median-of-3 lane ~40% with no
# verify signal — flag, don't fail).
DISPERSION = {}
DISPERSION_FLAG = 1.3


def _enable_compile_cache():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


def _timed_median(call, iters: int, label: str) -> float:
    """Compile, burst-warm, then median of WINDOWS timed windows of
    ``iters`` chained calls each (ONE scalar fetch per window — per-call
    fetches add the ~30-50 ms relay RTT to every dispatch)."""
    # Key spacing: compile, warmup, and window calls each live in disjoint
    # key ranges for ANY iters (ADVICE r3: w*100+i collided across windows
    # at iters >= 100, partially replaying identical streams).
    float(call(999))  # compile
    acc = None
    for i in range(WARMUP_CALLS):
        s = call(10_000 + i)
        acc = s if acc is None else acc + s
    float(acc)
    per_call = []
    checksum = 0.0
    for w in range(WINDOWS):
        t0 = time.time()
        acc = None
        for i in range(iters):
            s = call((w + 1) * 1_000_000 + i)
            acc = s if acc is None else acc + s
        checksum = float(acc)
        per_call.append((time.time() - t0) / iters)
    med = statistics.median(per_call)
    DISPERSION[label] = max(per_call) / max(min(per_call), 1e-12)
    print(
        f"{label}: median {med*1e3:.1f} ms/call over {WINDOWS} windows "
        f"(all: {[f'{x*1e3:.1f}' for x in per_call]}), checksum {checksum:.2f}",
        file=sys.stderr,
    )
    return med


def measure_engine(
    num_trajectories: int = 16384, episodes_per_call: int = 40, iters: int = 5
) -> float:
    import jax

    _enable_compile_cache()

    from mbt_gym_tpu.agents.baseline import AvellanedaStoikovAgent
    from mbt_gym_tpu.rollout import rollout
    from mbt_gym_tpu.utils.config import as_env_config

    cfg = as_env_config(num_trajectories=num_trajectories)
    policy = AvellanedaStoikovAgent.from_config(cfg, risk_aversion=0.1).policy()

    @jax.jit
    def episodes(key0):
        # K full episodes per dispatch: in production the trajectory consumer
        # (learner/analytics) lives on device, so per-dispatch host-link
        # latency is not part of the steady-state step cost.  Every
        # trajectory buffer is still materialized and consumed on device so
        # nothing is dead-code-eliminated.
        def one(acc, key):
            # backend="xla": this lane is the general ENGINE regression
            # guard — the auto front door would route the AS closed form to
            # the episode kernel (the pallas lane measures that).
            res = rollout(cfg, policy, None, key, unroll=4, backend="xla")
            traj = res.trajectory
            return (
                acc
                + traj.rewards.sum()
                + traj.observations[-1].sum()
                + traj.actions.mean()
                + res.final_state.cash.mean()
            ), None

        acc, _ = jax.lax.scan(one, 0.0, jax.random.split(key0, episodes_per_call))
        return acc

    med = _timed_median(
        lambda i: episodes(jax.random.PRNGKey(i)), iters, "engine"
    )
    return num_trajectories * cfg.n_steps * episodes_per_call / med


def measure_pallas_trajectories(
    num_trajectories: int = 16384, episodes_per_call: int = 120, iters: int = 5
):
    """The fused whole-episode Pallas kernel with FULL trajectory
    materialization (ops/pallas_episode.as_episode_trajectories_pallas) —
    semantics-equivalent to rollout() for this config (stats validated
    against the ground-truth table), so eligible as the headline path.

    episodes_per_call sizing (round-4 batch sweep,
    scripts/exp_batch_sweep.py): one 16k x T=200 episode is ~0.4 ms of
    device work while a chained dispatch costs ~3 ms (and a fetched one
    ~26 ms), so the round-3 default of 10 episodes/call under-reported the
    device rate ~40% (4.8B measured vs 8.1B at 120/call).  120 episodes
    ~= 50 ms of device work per dispatch keeps chaining overhead <6% —
    the same amortized-consumer semantics declared above, just measured
    at honest granularity; the sweep also showed the round-3 "batch
    non-monotonicity" was exactly this overhead (amortized rates are
    monotone in batch)."""
    import jax
    import jax.numpy as jnp

    from mbt_gym_tpu.ops.pallas_episode import (
        as_episode_trajectories_pallas,
        as_trajectory_from_pallas,
        params_from_config,
    )
    from mbt_gym_tpu.utils.config import as_env_config

    cfg = as_env_config(num_trajectories=num_trajectories)
    p = params_from_config(cfg, risk_aversion=0.1)

    @jax.jit
    def episodes(seed0):
        def one(acc, s):
            cash, inv, price = as_episode_trajectories_pallas(p, s, num_trajectories)
            traj = as_trajectory_from_pallas(p, cash, inv, price)
            return (
                acc + traj.rewards.sum() + traj.observations[-1].sum() + traj.actions.mean()
            ), None

        acc, _ = jax.lax.scan(one, 0.0, seed0 + jnp.arange(episodes_per_call, dtype=jnp.int32))
        return acc

    # Seed derivation must stay inside int32: _timed_median's window keys
    # reach (WINDOWS)*1_000_000 + iters, and *1000 scaling overflows int32
    # from window 3 on (the r03 key-spacing fix + this lane's scaling —
    # 3_000_000*1000 > 2^31 raised OverflowError and silently dropped the
    # headline lane).  Reduce mod a Mersenne prime in Python ints first;
    # per-episode seeds are seed0 + [0, episodes_per_call) so windows stay
    # disjoint (spacing 1000 >> 120 episodes/call).
    med = _timed_median(
        lambda i: episodes(jnp.int32((1000 + i * 1000) % 0x7FFFFFFF)),
        iters,
        "pallas-traj",
    )
    return num_trajectories * cfg.n_steps * episodes_per_call / med


def measure_cjp(
    num_trajectories: int = 16384, episodes_per_call: int = 2, iters: int = 3
) -> float:
    """bench_suite config-2 lane (VERDICT r3 item 7): 1000-step CJP
    market-making episodes with the closed-form Cartea-Jaimungal MM agent
    (h-table lookup via one-hot MXU matmul, agents/baseline.py) and the
    CjMm reward — the slowest closed-form path (~800M steps/s round 3).
    Driver-visible so a regression in the one-hot policy path shows up in
    BENCH_r*.json."""
    import jax

    from mbt_gym_tpu.agents.baseline import CarteaJaimungalMmAgent
    from mbt_gym_tpu.utils.config import cj_env_config
    from mbt_gym_tpu.utils.profiling import _episode_thunk

    cfg = cj_env_config(num_trajectories=num_trajectories, max_inventory=100.0)
    policy = CarteaJaimungalMmAgent.from_config(cfg, max_inventory=100).policy()
    thunk = _episode_thunk(cfg, policy, episodes_per_call)
    med = _timed_median(lambda i: thunk(jax.random.PRNGKey(i)), iters, "cjp")
    return num_trajectories * cfg.n_steps * episodes_per_call / med


def measure_cjp_pallas(
    num_trajectories: int = 131072, episodes_per_call: int = 2, iters: int = 3
):
    """The same CJP configuration on the fused table-policy rollout kernel
    (round 4, ops/pallas_rollout.table_rollout_pallas stats mode): the
    closed-form depth table is VMEM-resident, looked up per step via a
    one-hot MXU contraction, with sublane-packed (16, L) env planes.
    Measured 6.99B steps/s round 4 (9x the engine lane; 5.9B at 65k envs,
    3.9B at 16k).  Returns (rate, mean_episode_reward, true_value_h0) —
    the reward mean over the timed windows' hardware-PRNG episodes must
    match the analytic CJP value function h(0, 0) (the notebook Test-2
    oracle, BaselineAgents.py:161-170), giving the lane a built-in
    correctness check."""
    import jax
    import jax.numpy as jnp

    from mbt_gym_tpu.agents.baseline import CarteaJaimungalMmAgent
    from mbt_gym_tpu.ops import pallas_rollout as pr
    from mbt_gym_tpu.utils.config import cj_env_config

    cfg = cj_env_config(num_trajectories=num_trajectories, max_inventory=100.0)
    agent = CarteaJaimungalMmAgent.from_config(cfg, max_inventory=100)
    p = pr.cj_rollout_params(cfg, agent)
    bid_tbl, ask_tbl = (jnp.asarray(t) for t in pr.cj_depth_tables(agent))

    @jax.jit
    def episodes(seed0):
        def one(acc, s):
            _, _, _, rsum, _ = pr.table_rollout_pallas(
                p, bid_tbl, ask_tbl, s, num_trajectories, stats_only=True
            )
            return acc + rsum.mean(), None

        acc, _ = jax.lax.scan(
            one, 0.0, seed0 + jnp.arange(episodes_per_call, dtype=jnp.int32)
        )
        return acc

    rewards = []

    def call(i):
        s = episodes(jnp.int32((1000 + i * 1000) % 0x7FFFFFFF))
        rewards.append(s)
        return s

    med = _timed_median(call, iters, "cjp-pallas")
    # mean over every accumulated call (each entry sums episodes_per_call
    # per-episode means)
    mean_ep = float(sum(float(r) for r in rewards)) / (
        len(rewards) * episodes_per_call
    )
    h0 = float(agent.h_table()[0, agent.max_inventory])
    rate = num_trajectories * cfg.n_steps * episodes_per_call / med
    return rate, mean_ep, h0


def verify_pallas_hardware_stats(num_trajectories: int = 16384) -> str:
    """Statistical validation of the episode kernel's HARDWARE PRNG draws
    against the AS-replication ground truth (BASELINE.md / notebook Test 1):
    the condensed form of the TPU-gated assertions in
    tests/test_pallas_episode.py.  Returns '' on success, else a message."""
    import jax

    from mbt_gym_tpu.ops.pallas_episode import (
        as_episode_trajectories_pallas,
        as_trajectory_from_pallas,
        params_from_config,
    )
    from mbt_gym_tpu.rollout import episode_stats
    from mbt_gym_tpu.utils.config import as_env_config

    cfg = as_env_config(num_trajectories=num_trajectories)
    p = params_from_config(cfg, risk_aversion=0.1)

    @jax.jit
    def stats(seed):
        cash, inv, price = as_episode_trajectories_pallas(p, seed, num_trajectories)
        traj = as_trajectory_from_pallas(p, cash, inv, price)
        return episode_stats(cfg, traj)

    s = {k: float(v) for k, v in stats(50).items()}
    print(f"verify stats: {s}", file=sys.stderr)
    checks = [
        ("mean_spread", 1.4918, 0.02),
        ("mean_pnl", 64.87, 2.5),
        ("std_pnl", 6.7, 1.5),
        ("std_terminal_inventory", 2.89, 0.35),
    ]
    for key, want, tol in checks:
        if not np.isfinite(s[key]) or abs(s[key] - want) > tol:
            return f"{key}={s[key]:.4f} outside {want}+/-{tol}"
    if abs(s["mean_terminal_inventory"]) > 0.6:
        return f"mean_terminal_inventory={s['mean_terminal_inventory']:.3f}"
    return ""


def measure_fused_ppo(
    num_trajectories: int = 1 << 18, iters: int = 3,
    shared_trunk: bool = True, label: str = "fused-ppo",
) -> tuple:
    """Full fused PPO train iteration (bench_suite config 5: Pallas
    rollout -> GAE -> fused update, 52.4M transitions/iteration).  Returns
    (env_steps_per_s, verify_msg).

    ``shared_trunk=False`` runs the REFERENCE's exact net_arch — separate
    256x256 pi/vf towers (/root/reference experiments/helpers.py:71) — as
    a stacked trunk on the same fused kernels (round 4): the lane that
    checks the >=100M north star holds on the reference's own
    architecture in every driver capture (VERDICT r4 item 4)."""
    import dataclasses

    import jax

    from mbt_gym_tpu.agents import ppo
    from mbt_gym_tpu.utils.config import as_env_config

    env_cfg = dataclasses.replace(
        as_env_config(num_trajectories=num_trajectories),
        normalise_observation_space=True, normalise_action_space=True,
    )
    # n_minibatches=16 = the production setting bench_suite config 5 uses.
    # (64, the round-1 row-major activation-memory constraint, measured
    # NEUTRAL on the fused pipeline — 303.6 ms at 16 vs 299-302 at 64 in
    # fresh sessions — the count is a free hyperparameter here; 16 is
    # kept so this lane and the suite measure the identical config.  The
    # lane's stable 303-vs-269 ms gap vs the suite was a per-call host
    # fetch inside the timed loop, fixed in `call` below.)
    ppo_cfg = ppo.PPOConfig(
        hidden=(256, 256), n_epochs=1, n_minibatches=16, shuffle=False,
        compute_dtype="bfloat16", shared_trunk=shared_trunk, fused_update=True,
        fused_rollout=True,
    )
    ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
    state = {"ts": ts, "metrics": None, "rewards": []}

    def call(i):
        state["ts"], m = ppo.jit_train_iteration(
            env_cfg, ppo_cfg, state["ts"], jax.random.PRNGKey(i)
        )
        state["metrics"] = m
        # Store the DEVICE scalar; float() here would block on the relay
        # RTT (~30-35 ms) INSIDE every timed call — exactly the stable
        # 303-vs-269 ms gap vs bench_suite config 5 on the same workload
        # (introduced by the round-4 ADVICE fix that grew first_reward
        # into this list).  Conversion happens after timing.
        state["rewards"].append(m["mean_episode_reward"])
        return m["pg_loss"]

    med = _timed_median(call, iters, label)
    m = {k: float(v) for k, v in state["metrics"].items()}
    rewards = [float(r) for r in state["rewards"]]
    # rewards[0] is the compile call; [1:1+WARMUP] the warmup burst; the
    # tail is the last timed window.
    early = float(np.mean(rewards[1 : 1 + WARMUP_CALLS]))
    late = float(np.mean(rewards[-iters:]))
    print(
        f"{label} metrics: {m} (reward means: early {early:.3f} -> "
        f"late {late:.3f})",
        file=sys.stderr,
    )
    msg = ""
    if not all(np.isfinite(v) for v in m.values()):
        msg = f"non-finite fused PPO metrics: {m}"
    elif abs(m["mean_episode_reward"]) > 500.0:
        msg = f"fused PPO reward out of band: {m['mean_episode_reward']}"
    # Learning-signal gate: the timing loop runs 1 + WARMUP + WINDOWS*iters
    # fused iterations from FRESH params with distinct keys — on this env
    # PPO must not have degraded the policy over those ~13 updates (a
    # condensed driver-visible form of the opt-in convergence tests).
    # Means over the warmup burst vs the final window, not two single
    # iterations (ADVICE r3: a normal stochastic dip across ~13 updates
    # should not flag a driver-visible verify failure).
    elif late < early - 1.0:
        msg = (
            f"fused PPO degraded over the timed iterations: "
            f"mean {early:.3f} -> {late:.3f}"
        )
    return num_trajectories * env_cfg.n_steps / med, msg


def measure_reference_numpy(num_trajectories: int = 16384, n_steps: int = 25) -> float:
    """The reference's per-step NumPy cost at the same batch size (shortened
    horizon, per-step cost is horizon-independent)."""
    import os

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from reference_oracle import oracle_limit_order_rollout

    from mbt_gym_tpu.agents.baseline import AvellanedaStoikovAgent
    from mbt_gym_tpu.utils.config import as_env_config

    # Same closed-form policy as the engine-side workload, derived from the
    # same config (not hardcoded constants).
    a = AvellanedaStoikovAgent.from_config(as_env_config(num_trajectories=1), risk_aversion=0.1)
    g, sg, k, T = a.risk_aversion, a.volatility, a.fill_exponent, a.terminal_time

    def policy(obs):
        inv, t = obs[:, 1], obs[:, 2]
        skew = inv * g * sg**2 * (T - t)
        spread = g * sg**2 * (T - t) + (2.0 / g) * np.log(1 + g / k)
        return np.stack([skew + spread / 2, -skew + spread / 2], axis=1)

    oracle_limit_order_rollout(policy, 1, num_trajectories=256, n_steps=2)  # warm
    t0 = time.time()
    oracle_limit_order_rollout(policy, 1, num_trajectories=num_trajectories, n_steps=n_steps)
    per_step = (time.time() - t0) / n_steps
    return num_trajectories / per_step


def _with_retry(fn, label, attempts=3, cooldowns=(45, 90)):
    """The axon relay intermittently wedges a session's first dispatches
    (BENCH_NOTES 'Environment reliability'); cooled-down retries with an
    escalating backoff rescue a transiently wedged driver capture instead
    of losing the round (a wedged claim clears in ~60 s, so the second
    cooldown crosses that window even when the first does not)."""
    for attempt in range(attempts):
        try:
            return fn()
        except Exception as exc:
            print(
                f"{label} attempt {attempt + 1}/{attempts} failed: "
                f"{type(exc).__name__}: {exc}",
                file=sys.stderr,
            )
            if attempt + 1 == attempts:
                raise
            time.sleep(cooldowns[min(attempt, len(cooldowns) - 1)])


def main():
    import jax

    on_tpu = any(d.platform == "tpu" for d in jax.devices()) or (
        jax.default_backend() not in ("cpu", "gpu")
    )
    value = 0.0
    rates = {}
    verify_msgs = []
    xla_rate = None
    try:
        # The engine lane issues this process's first TPU dispatches; a
        # wedged claim that survives all retries must not kill the whole
        # capture — the headline `value` is max-of-lanes, so the Pallas
        # lanes below still produce a valid JSON line with the failure
        # recorded in `verify`.
        xla_rate = _with_retry(measure_engine, "engine")
        value = xla_rate
        rates["engine"] = round(xla_rate, 1)
    except Exception as exc:
        print(
            f"engine lane failed after retries: {type(exc).__name__}: "
            f"{str(exc)[:200]}",
            file=sys.stderr,
        )
        verify_msgs.append(
            f"engine crashed: {type(exc).__name__}: {str(exc)[:160]}"
        )
    pallas_rate = fused_rate = None
    towers_band = None
    try:
        pallas_rate = measure_pallas_trajectories()
        rates["pallas_episode"] = round(pallas_rate, 1)
        value = max(value, pallas_rate)
    except Exception as exc:  # CPU-only hosts: the kernel needs real TPU PRNG
        print(
            f"pallas path unavailable: {type(exc).__name__}: {str(exc)[:200]}",
            file=sys.stderr,
        )
        if on_tpu:
            # On real hardware the headline lane failing is a regression,
            # not an expected fallback — surface it in the verify field.
            verify_msgs.append(
                f"pallas-lane crashed: {type(exc).__name__}: {str(exc)[:160]}"
            )
    if on_tpu:
        try:
            msg = verify_pallas_hardware_stats()
            if msg:
                verify_msgs.append(f"pallas-stats: {msg}")
        except Exception as exc:
            verify_msgs.append(
                f"pallas-stats crashed: {type(exc).__name__}: {str(exc)[:200]}"
            )
        try:
            fused_rate, msg = measure_fused_ppo()
            rates["fused_ppo"] = round(fused_rate, 1)
            if msg:
                verify_msgs.append(f"fused-ppo: {msg}")
        except Exception as exc:
            verify_msgs.append(
                f"fused-ppo crashed: {type(exc).__name__}: {str(exc)[:200]}"
            )
        try:
            towers_rate, msg = measure_fused_ppo(
                shared_trunk=False, label="fused-ppo-towers"
            )
            rates["fused_ppo_towers"] = round(towers_rate, 1)
            # Band verdict (flag, not fail): the >=100M north star should
            # hold on the reference's own net_arch with margin (VERDICT r4
            # item 4); the verdict ships in the JSON either way.
            towers_band = (
                "ok"
                if towers_rate >= 110e6
                else f"flag: {towers_rate / 1e6:.1f}M below the 110M margin "
                "target (north star 100M)"
            )
            if msg:
                verify_msgs.append(f"fused-ppo-towers: {msg}")
        except Exception as exc:
            towers_band = None
            verify_msgs.append(
                f"fused-ppo-towers crashed: {type(exc).__name__}: "
                f"{str(exc)[:200]}"
            )
        try:
            cjp_rate = measure_cjp()
            rates["cjp"] = round(cjp_rate, 1)
            # Band: ~800M steps/s measured round 3; a structural regression
            # in the one-hot MXU h-table policy (e.g. a gather fallback)
            # costs 5-10x, far below this floor; session-to-session relay
            # variance does not reach it.
            if cjp_rate < 250e6:
                verify_msgs.append(
                    f"cjp: rate {cjp_rate/1e6:.0f}M below the 250M floor "
                    "(~800M expected)"
                )
        except Exception as exc:
            verify_msgs.append(
                f"cjp crashed: {type(exc).__name__}: {str(exc)[:200]}"
            )
        try:
            cjp_p_rate, cjp_p_reward, cjp_h0 = measure_cjp_pallas()
            rates["cjp_pallas"] = round(cjp_p_rate, 1)
            # 6.99B measured round 4 (sublane-packed rows=16); a 3B floor
            # catches a structural regression (a lookup falling off the
            # MXU, or the rows auto-selection collapsing to the 2.2B (1, L)
            # layout) without tripping on relay variance.
            if cjp_p_rate < 3.0e9:
                verify_msgs.append(
                    f"cjp-pallas: rate {cjp_p_rate/1e6:.0f}M below the 3B "
                    "floor (~7B expected)"
                )
            # Built-in correctness: hardware-PRNG mean episode reward must
            # match the analytic CJP value function h(0, 0) (observed
            # |delta| ~ 0.02 at this episode count; band 0.5).
            if abs(cjp_p_reward - cjp_h0) > 0.5:
                verify_msgs.append(
                    f"cjp-pallas reward {cjp_p_reward:.3f} off the analytic "
                    f"value function {cjp_h0:.3f}"
                )
        except Exception as exc:
            verify_msgs.append(
                f"cjp-pallas crashed: {type(exc).__name__}: {str(exc)[:200]}"
            )
    print(
        (f"general engine {xla_rate/1e6:.1f}M" if xla_rate else "engine FAILED")
        + (f" | pallas fused-episode {pallas_rate/1e6:.1f}M" if pallas_rate else "")
        + (f" | fused PPO iteration {fused_rate/1e6:.1f}M" if fused_rate else "")
        + " steps/s",
        file=sys.stderr,
    )
    try:
        ref = measure_reference_numpy()
        print(f"reference numpy: {ref/1e6:.2f}M steps/s", file=sys.stderr)
    except Exception as exc:  # host-side NumPy loop; never lose the capture
        ref = None
        verify_msgs.append(
            f"reference-numpy crashed: {type(exc).__name__}: {str(exc)[:160]}"
        )
    out = {
        "metric": "env_steps_per_s_per_chip_as16k",
        "value": round(value, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(value / ref, 2) if ref else None,
        **rates,
    }
    if towers_band is not None:
        out["towers_band"] = towers_band
    flagged = {
        label: round(x, 2)
        for label, x in DISPERSION.items()
        if x > DISPERSION_FLAG
    }
    if flagged:
        # Informational (not a verify failure): these lanes' 3 timed
        # windows spread more than DISPERSION_FLAG x, so the median may sit
        # on relay jitter — re-run before trusting a regression.
        out["timing_dispersion"] = flagged
    if on_tpu:
        out["verify"] = "ok" if not verify_msgs else "; ".join(verify_msgs)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
