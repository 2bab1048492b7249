"""Serial training driver (reference parity: pfrl/experiments/train_agent.py).

Same contract as the reference's ``train_agent_with_evaluation``
(train_agent.py:114): per-step act/step/observe over a single host env,
periodic evaluation, checkpointing, crash-save. This is the compatibility
path for external envs; pure-JAX envs should use the on-device runner
instead (experiments/runner.py).
"""

import logging
import os
from typing import List, Optional

from pfrl_tpu.experiments.evaluator import Evaluator


def save_agent(agent, t, outdir, logger, suffix=""):
    dirname = os.path.join(outdir, f"{t}{suffix}")
    agent.save(dirname)
    logger.info("Saved the agent to %s", dirname)


def train_agent(
    agent,
    env,
    steps: int,
    outdir: str,
    checkpoint_freq=None,
    max_episode_len=None,
    step_offset: int = 0,
    evaluator: Optional[Evaluator] = None,
    successful_score=None,
    step_hooks=(),
    eval_during_episode: bool = False,
    logger=None,
):
    """Hot loop (train_agent.py:24-111)."""
    logger = logger or logging.getLogger(__name__)
    episode_r = 0
    episode_idx = 0

    obs = env.reset()

    t = step_offset
    eval_stats_history: List[dict] = []
    episode_len = 0
    try:
        while t < steps:
            a = agent.act(obs)
            obs, r, done, info = env.step(a)
            t += 1
            episode_r += r
            episode_len += 1
            reset = episode_len == max_episode_len or info.get("needs_reset", False)
            agent.observe(obs, r, done, reset)

            for hook in step_hooks:
                hook(env, agent, t)

            episode_end = done or reset or t == steps
            if episode_end:
                logger.info(
                    "outdir:%s step:%s episode:%s R:%s",
                    outdir,
                    t,
                    episode_idx,
                    episode_r,
                )
                logger.info("statistics:%s", agent.get_statistics())
            if evaluator is not None and (episode_end or eval_during_episode):
                # eval_during_episode=True checks the schedule every step,
                # not just at episode boundaries (train_agent.py:81-90).
                eval_score = evaluator.evaluate_if_necessary(
                    t=t, episodes=episode_idx + 1
                )
                if eval_score is not None:
                    # History rows carry the agent's statistics alongside
                    # the score (reference train_agent.py:83-86), plus the
                    # step for convenience.
                    eval_stats = dict(agent.get_statistics())
                    eval_stats["step"] = t
                    eval_stats["eval_score"] = eval_score
                    eval_stats_history.append(eval_stats)
                    if successful_score is not None and eval_score >= successful_score:
                        break
            if episode_end:
                if t == steps:
                    break
                episode_r = 0
                episode_idx += 1
                episode_len = 0
                obs = env.reset()
            if checkpoint_freq and t % checkpoint_freq == 0:
                save_agent(agent, t, outdir, logger, suffix="_checkpoint")

    except (Exception, KeyboardInterrupt):
        # Crash-save (train_agent.py:103-106).
        save_agent(agent, t, outdir, logger, suffix="_except")
        raise

    save_agent(agent, t, outdir, logger, suffix="_finish")
    return eval_stats_history


def train_agent_with_evaluation(
    agent,
    env,
    steps: int,
    eval_n_steps: Optional[int],
    eval_n_episodes: Optional[int],
    eval_interval: int,
    outdir: str,
    checkpoint_freq=None,
    train_max_episode_len=None,
    step_offset: int = 0,
    eval_max_episode_len=None,
    eval_env=None,
    successful_score=None,
    step_hooks=(),
    evaluation_hooks=(),
    save_best_so_far_agent: bool = True,
    use_tensorboard: bool = False,
    eval_during_episode: bool = False,
    logger=None,
):
    """Reference signature (train_agent.py:114-199)."""
    logger = logger or logging.getLogger(__name__)
    os.makedirs(outdir, exist_ok=True)

    if eval_env is None:
        eval_env = env
    if eval_max_episode_len is None:
        eval_max_episode_len = train_max_episode_len

    evaluator = Evaluator(
        agent=agent,
        env=eval_env,
        n_steps=eval_n_steps,
        n_episodes=eval_n_episodes,
        eval_interval=eval_interval,
        outdir=outdir,
        max_episode_len=eval_max_episode_len,
        step_offset=step_offset,
        evaluation_hooks=evaluation_hooks,
        save_best_so_far_agent=save_best_so_far_agent,
        use_tensorboard=use_tensorboard,
        logger=logger,
    )

    eval_stats_history = train_agent(
        agent,
        env,
        steps,
        outdir,
        checkpoint_freq=checkpoint_freq,
        max_episode_len=train_max_episode_len,
        step_offset=step_offset,
        evaluator=evaluator,
        successful_score=successful_score,
        step_hooks=step_hooks,
        eval_during_episode=eval_during_episode,
        logger=logger,
    )
    return agent, eval_stats_history
