"""Measure reproduction-run throughput: SAC Hopper-v5 repro config.

Times the real host-env training loop (SerialVectorEnv of gymnasium MuJoCo
envs + SAC at reference hyperparameters, 1 update per env step) for a few
thousand steps on the ambient JAX backend, to pick the backend and
num_envs for the 1M-step reproduction runs.

Usage: [env ...] python tools/measure_repro_throughput.py [--num-envs N]
       [--steps N] [--no-burst]
"""

import argparse
import functools
import time

import flax.linen as nn
import numpy as np
import optax

import jax

from pfrl_tpu import spaces
from pfrl_tpu.agents.soft_actor_critic import SoftActorCritic
from pfrl_tpu.envs import SerialVectorEnv, make_gymnasium_env
from pfrl_tpu.models import MLP
from pfrl_tpu.policies import SquashedGaussianHead
from pfrl_tpu.q_functions import FCSAQFunction
from pfrl_tpu.replay import ReplayBuffer
from pfrl_tpu.wrappers import CastObservationToFloat32, NormalizeActionSpace


class Policy(nn.Module):
    action_size: int

    @nn.compact
    def __call__(self, x):
        h = MLP(out_size=2 * self.action_size, hidden_sizes=(256, 256))(x)
        return SquashedGaussianHead(action_size=self.action_size)(h)


def burnin(action_size, rng, batch):
    return jax.random.uniform(rng, (batch, action_size), minval=-1.0, maxval=1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=16)
    ap.add_argument("--steps", type=int, default=6000, help="env steps to time")
    ap.add_argument("--env", default="Hopper-v5")
    ap.add_argument("--no-burst", action="store_true")
    args = ap.parse_args()

    print("backend:", jax.default_backend(), flush=True)
    env = SerialVectorEnv(
        [
            NormalizeActionSpace(
                CastObservationToFloat32(make_gymnasium_env(args.env, seed=i))
            )
            for i in range(args.num_envs)
        ]
    )
    action_size = env.action_space.shape[0]
    replay_start = 2 * args.num_envs  # tiny: we want steady-state update cost
    agent = SoftActorCritic(
        Policy(action_size=action_size),
        FCSAQFunction(n_hidden_channels=256, n_hidden_layers=2),
        FCSAQFunction(n_hidden_channels=256, n_hidden_layers=2),
        optax.adam(3e-4),
        optax.adam(3e-4),
        optax.adam(3e-4),
        ReplayBuffer(10**6, gamma=0.99),
        0.99,
        action_space=spaces.box(-1.0, 1.0, (action_size,)),
        replay_start_size=replay_start,
        minibatch_size=256,
        soft_update_tau=5e-3,
        entropy_target=-float(action_size),
        temperature_optimizer_lr=3e-4,
        burnin_action_func=functools.partial(burnin, action_size),
        burnin_steps=replay_start,
        update_burst=not args.no_burst,
        seed=0,
    )

    obss = env.reset()
    t0 = None
    steps_done = 0
    warmup = 4 * args.num_envs
    start = time.time()
    while steps_done < args.steps:
        actions = agent.batch_act(obss)
        obss, rs, dones, infos = env.step(actions)
        resets = np.array([i.get("needs_reset", False) for i in infos])
        agent.batch_observe(obss, rs, dones, resets)
        end = np.asarray(dones) | resets
        if np.any(end):
            obss = env.reset(~end)
        steps_done += args.num_envs
        if t0 is None and steps_done >= warmup:
            t0 = time.time()
            timed_from = steps_done
        if time.time() - start > 240:
            print("(cut short at 240s)")
            break
    dt = time.time() - t0
    n = steps_done - timed_from
    print(
        f"num_envs={args.num_envs} burst={not args.no_burst}: "
        f"{n} steps in {dt:.1f}s = {n / dt:.1f} env-steps/s "
        f"(updates: {int(agent.train_state.n_updates)})"
    )


if __name__ == "__main__":
    main()
