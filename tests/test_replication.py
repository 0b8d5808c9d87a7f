"""Statistical replication of the reference's ground-truth notebooks
(SURVEY.md §6 / BASELINE.md):

- Test_1: closed-form AS agent on the AS env, 1000 trajectories — summary
  stats must land in tolerance bands around the published table.
- Test_2: closed-form CJ agent on the CJ env — Student-t test that the mean
  episodic reward equals the analytic value function h(0, q0) + cash + q*S.
"""
import jax
import numpy as np
import pytest
import scipy.stats

from mbt_gym_tpu import episode_stats, jit_rollout
from mbt_gym_tpu.agents.baseline import AvellanedaStoikovAgent, CarteaJaimungalMmAgent
from mbt_gym_tpu.utils.config import as_env_config, cj_env_config


@pytest.mark.parametrize(
    "risk_aversion,expected",
    [
        # notebook cell 11: spread 1.49177, PnL 64.872 +/- 6.693, inv 0.201 +/- 2.894
        (0.1, dict(mean_spread=1.4918, mean_pnl=64.87, std_pnl=6.69, mean_ti=0.20, std_ti=2.89)),
        # notebook cell 17: spread 1.349, PnL 68.754 +/- 8.720, inv 0.23 +/- 5.096
        (0.01, dict(mean_spread=1.3490, mean_pnl=68.75, std_pnl=8.72, mean_ti=0.23, std_ti=5.10)),
    ],
)
def test_as_replication_table(risk_aversion, expected):
    cfg = as_env_config(num_trajectories=4000)
    agent = AvellanedaStoikovAgent.from_config(cfg, risk_aversion=risk_aversion)
    res = jit_rollout(cfg, agent.policy(), None, jax.random.PRNGKey(50))
    stats = {k: float(v) for k, v in episode_stats(cfg, res.trajectory).items()}
    # Spread is nearly deterministic (slight inventory dependence): tight band.
    assert abs(stats["mean_spread"] - expected["mean_spread"]) < 0.02, stats
    # Monte-Carlo quantities: bands a few standard errors wide (std/sqrt(4000)).
    assert abs(stats["mean_pnl"] - expected["mean_pnl"]) < 0.8, stats
    assert abs(stats["std_pnl"] - expected["std_pnl"]) < 0.8, stats
    assert abs(stats["mean_terminal_inventory"] - expected["mean_ti"]) < 0.4, stats
    assert abs(stats["std_terminal_inventory"] - expected["std_ti"]) < 0.4, stats


CJP_PARAM_SETS = [
    # (initial_price, terminal_time, sigma, n_steps, arrival_rate, fill_exponent)
    (100.0, 1.0, 2.0, 1000, 140.0, 1.5),  # notebook cells 3-13
    (150.0, 1.0, 1.0, 1000, 100.0, 1.0),  # cells 15-18
    (50.0, 1.0, 1.5, 2000, 50.0, 2.0),  # cells 20-23
    (50.0, 2.0, 1.5, 2000, 50.0, 2.0),  # cells 25-28
]


@pytest.mark.parametrize("params", CJP_PARAM_SETS)
def test_cjp_value_function_ttest(params):
    initial_price, terminal_time, sigma, n_steps, arrival_rate, fill_exponent = params
    n = 2000
    cfg = cj_env_config(
        num_trajectories=n,
        initial_price=initial_price,
        terminal_time=terminal_time,
        sigma=sigma,
        n_steps=n_steps,
        arrival_rate=arrival_rate,
        fill_exponent=fill_exponent,
        max_inventory=100.0,
    )
    agent = CarteaJaimungalMmAgent.from_config(cfg, max_inventory=100)
    res = jit_rollout(cfg, agent.policy(), None, jax.random.PRNGKey(410))
    total_rewards = np.asarray(res.trajectory.rewards.sum(axis=0), dtype=np.float64)

    obs0 = np.asarray(res.trajectory.observations[0])
    true_mean = float(np.asarray(agent.true_value_function(obs0[:1]))[0])

    sample_mean = total_rewards.mean()
    sample_var = total_rewards.var() * n / (n - 1)
    t_stat = (sample_mean - true_mean) / np.sqrt(sample_var / n)
    # Under H0 the t statistic is standard normal *regardless of N*, so any
    # fixed-alpha gate fails a fixed fraction of seeds by construction (the
    # notebook's 80% CI falsely rejects 20% of seeds; verified across seeds
    # that t flips sign -> no systematic bias).  For an automated regression
    # gate use 99.9%: a genuine reward/dynamics bug shows up as |t| >> 3.
    q_l, q_u = scipy.stats.t(df=n - 1).ppf((0.0005, 0.9995))
    assert q_l < t_stat < q_u, (
        f"t={t_stat:.3f} outside 99.9% CI ({q_l:.3f}, {q_u:.3f}); "
        f"sample={sample_mean:.4f} true={true_mean:.4f}"
    )
