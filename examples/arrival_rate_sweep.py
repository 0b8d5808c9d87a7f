"""Grid sweep over arrival rate x fill exponent — the reference's
``experiments/learning-pnl-with-different-arrival-rates.py`` (lambda in
{1,10,100} x k in {0.1,1,10}, 1000 trajectories) rebuilt on the on-device
PPO learner.  Each cell trains and reports final reward vs the closed-form
optimum.
"""
import argparse
import dataclasses

import jax
import numpy as np

from mbt_gym_tpu.agents import ppo
from mbt_gym_tpu.utils.config import cj_env_config


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--trajectories", type=int, default=1000)
    parser.add_argument("--iterations", type=int, default=50)
    args = parser.parse_args()

    for arrival_rate in (1.0, 10.0, 100.0):
        for fill_exponent in (0.1, 1.0, 10.0):
            env_cfg = cj_env_config(
                num_trajectories=args.trajectories,
                n_steps=200,
                arrival_rate=arrival_rate,
                fill_exponent=fill_exponent,
                per_step_inventory_aversion=2e-4,
                terminal_inventory_aversion=1e-4,
                max_inventory=100.0,
            )
            env_cfg = dataclasses.replace(
                env_cfg, normalise_observation_space=True, normalise_action_space=True
            )
            from mbt_gym_tpu.agents.baseline import CarteaJaimungalMmAgent
            from mbt_gym_tpu.rollout import jit_rollout

            raw_cfg = dataclasses.replace(
                env_cfg, normalise_observation_space=False, normalise_action_space=False
            )
            cj = CarteaJaimungalMmAgent.from_config(raw_cfg, max_inventory=100)
            cf = float(
                np.asarray(
                    jit_rollout(raw_cfg, cj.policy(), None, jax.random.PRNGKey(7))
                    .trajectory.rewards.sum(axis=0)
                ).mean()
            )
            ppo_cfg = ppo.PPOConfig(hidden=(256, 256))
            ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
            reward = float("nan")
            for i in range(args.iterations):
                ts, metrics = ppo.jit_train_iteration(
                    env_cfg, ppo_cfg, ts, jax.random.PRNGKey(i)
                )
                reward = float(metrics["mean_episode_reward"])
            print(
                f"lambda={arrival_rate:6.1f} k={fill_exponent:5.1f}  "
                f"final reward {reward:9.4f}  closed-form {cf:9.4f}"
            )


if __name__ == "__main__":
    main()
