"""A3C Atari reproduction (reference parity:
examples/atari/reproduction/a3c/train_a3c.py).

The reference trains 16 async CPU workers; the TPU mapping is 16 (or more)
synchronous env lanes through the batched A2C/A3C agent — same n-step
actor-critic math, no gradient staleness (see pfrl_tpu/agents/a3c.py).
``--sim`` runs against the device-side AtariSim on-device.
"""

import argparse

from pfrl_tpu.experiments.demo_cli import (
    add_demo_args,
    maybe_load_train_state,
    run_demo_if_requested,
    save_train_state_if_requested,
)

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from pfrl_tpu.agents.a3c import A3CCore
from pfrl_tpu.envs import AtariSim
from pfrl_tpu.experiments import JaxEvalLoop, OnPolicyRunner
from pfrl_tpu.models import SmallAtariCNN
from pfrl_tpu.policies import SoftmaxCategoricalHead


class A3CNet(nn.Module):
    """NIPS-CNN torso + pi/v heads (train_a3c.py:60-80)."""

    n_actions: int

    @nn.compact
    def __call__(self, x):
        h = SmallAtariCNN()(x.astype(jnp.float32) / 255.0)
        logits = nn.Dense(self.n_actions)(h)
        value = nn.Dense(1)(h)
        return SoftmaxCategoricalHead()(logits), value


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sim", action="store_true")
    parser.add_argument("--processes", type=int, default=16)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 network compute over fp32 master params")
    parser.add_argument("--steps", type=int, default=5 * 10**7)
    parser.add_argument("--t-max", type=int, default=5)
    parser.add_argument("--outdir", default="results/a3c")
    add_demo_args(parser)
    args = parser.parse_args()

    n_actions = 6
    core = A3CCore(
        model=A3CNet(n_actions=n_actions),
        optimizer=optax.chain(
            optax.clip_by_global_norm(40.0),
            optax.rmsprop(7e-4, decay=0.99, eps=1e-1),
        ),
        gamma=0.99,
        entropy_coeff=1e-2,
        v_loss_coef=0.5,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
    )
    runner = OnPolicyRunner(
        AtariSim(n_actions=n_actions),
        core,
        num_envs=args.processes,
        rollout_len=args.t_max,
    )
    state = runner.init(jax.random.PRNGKey(args.seed))
    evaluator = JaxEvalLoop(AtariSim(n_actions=n_actions), core, num_episodes=5, max_steps=500)
    state = maybe_load_train_state(state, args.load)
    if run_demo_if_requested(args, evaluator, state.train_state, seed=args.seed):
        return
    import time

    t0 = time.time()
    while int(state.t) < args.steps:
        state, aux = runner.run_iterations(state, 200)
        t = int(state.t)
        print(
            f"step {t:>10d} | {t/(time.time()-t0):>8.0f} steps/s | "
            f"recent R {runner.recent_return_mean(state):.1f}",
            flush=True,
        )
    save_train_state_if_requested(state.train_state, args.save_to)


if __name__ == "__main__":
    main()
