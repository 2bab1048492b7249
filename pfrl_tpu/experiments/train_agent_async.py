"""Async-training compatibility surface.

Reference parity: pfrl/experiments/train_agent_async.py:146-328. The
reference forks worker processes that share model memory because its CPU
actors must overlap env stepping with learning. On a TPU there is nothing
to overlap — acting, stepping, and learning are one fused device program —
so asynchronous workers would only add gradient staleness (SURVEY.md §2.6).

``train_agent_async`` therefore maps the async worker pool onto the
synchronous batched driver: ``processes`` becomes the env-lane count of a
vector env, the shared model is simply the (single) agent, and the global
step counter is the batch driver's ``t``. Hyperparameters tuned for the
reference's async mode (per-worker t_max etc.) transfer unchanged via the
agent's own config (see pfrl_tpu/agents/a3c.py).
"""

import logging
from typing import Callable, Optional

from pfrl_tpu.experiments.evaluator import Evaluator
from pfrl_tpu.experiments.train_agent_batch import train_agent_batch


def train_agent_async(
    outdir: str,
    processes: int,
    make_env: Callable[[int, bool], object],
    *,
    profile: bool = False,
    steps: int = 8 * 10**7,
    eval_interval: int = 10**6,
    eval_n_steps: Optional[int] = None,
    eval_n_episodes: int = 10,
    max_episode_len: Optional[int] = None,
    step_offset: int = 0,
    successful_score: Optional[float] = None,
    agent=None,
    make_agent: Optional[Callable] = None,
    global_step_hooks=(),
    save_best_so_far_agent: bool = True,
    logger=None,
):
    """Drive ``processes`` env instances synchronously (see module doc).

    ``make_env(process_idx, test)`` matches the reference's factory
    signature. Returns the trained agent.
    """
    logger = logger or logging.getLogger(__name__)
    from pfrl_tpu.envs import SerialVectorEnv

    train_env = SerialVectorEnv(
        [make_env(i, False) for i in range(processes)]
    )
    eval_env = SerialVectorEnv(
        [make_env(i, True) for i in range(processes)]
    )
    if agent is None:
        assert make_agent is not None
        agent = make_agent(0)

    if profile:
        import cProfile

        profiler = cProfile.Profile()
        profiler.enable()

    evaluator = Evaluator(
        agent=agent,
        env=eval_env,
        n_steps=eval_n_steps,
        n_episodes=eval_n_episodes,
        eval_interval=eval_interval,
        outdir=outdir,
        max_episode_len=max_episode_len,
        step_offset=step_offset,
        save_best_so_far_agent=save_best_so_far_agent,
        logger=logger,
    )
    train_agent_batch(
        agent,
        train_env,
        steps,
        outdir,
        max_episode_len=max_episode_len,
        step_offset=step_offset,
        evaluator=evaluator,
        successful_score=successful_score,
        step_hooks=global_step_hooks,
        logger=logger,
    )
    if profile:
        profiler.disable()
        profiler.dump_stats(f"{outdir}/profile.stats")
    return agent
