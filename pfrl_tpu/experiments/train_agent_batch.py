"""Vector-env training driver (reference parity: pfrl/experiments/train_agent_batch.py).

Mirrors the reference loop including the done-vs-reset distinction and
masked resets (train_agent_batch.py:10-154).
"""

import logging
import os
from typing import List, Optional

import numpy as np

from pfrl_tpu.experiments.evaluator import Evaluator
from pfrl_tpu.experiments.train_agent import save_agent


def train_agent_batch(
    agent,
    env,
    steps: int,
    outdir: str,
    checkpoint_freq=None,
    log_interval=None,
    max_episode_len=None,
    step_offset: int = 0,
    evaluator=None,
    successful_score=None,
    step_hooks=(),
    return_window_size: int = 100,
    logger=None,
):
    logger = logger or logging.getLogger(__name__)
    recent_returns: List[float] = []

    num_envs = env.num_envs
    episode_r = np.zeros(num_envs, dtype=np.float64)
    episode_idx = np.zeros(num_envs, dtype="i")
    episode_len = np.zeros(num_envs, dtype="i")

    obss = env.reset()

    t = step_offset
    if hasattr(agent, "t"):
        agent.t = step_offset

    eval_stats_history: List[dict] = []
    try:
        while t < steps:
            actions = agent.batch_act(obss)
            obss, rs, dones, infos = env.step(actions)
            episode_r += rs
            episode_len += 1

            # Compute mask for done and reset (train_agent_batch.py:74-80).
            resets = np.logical_or(
                episode_len == max_episode_len,
                [info.get("needs_reset", False) for info in infos],
            )
            # Agent observes the consequences.
            agent.batch_observe(obss, rs, dones, resets)

            # Make mask: 0 if done or reset, 1 if pass.
            end = np.logical_or(resets, dones)
            not_end = np.logical_not(end)

            for index in range(len(end)):
                if end[index]:
                    recent_returns.append(float(episode_r[index]))
                    if len(recent_returns) > return_window_size:
                        recent_returns.pop(0)

            episode_idx += end
            t += num_envs

            for hook in step_hooks:
                hook(env, agent, t)

            if (
                log_interval is not None
                and t >= step_offset
                and t % log_interval < num_envs
            ):
                logger.info(
                    "outdir:%s step:%s episode:%s last_R: %s average_R:%s",
                    outdir,
                    t,
                    np.sum(episode_idx),
                    recent_returns[-1] if recent_returns else np.nan,
                    np.mean(recent_returns) if recent_returns else np.nan,
                )
                logger.info("statistics: %s", agent.get_statistics())
            if evaluator is not None:
                eval_score = evaluator.evaluate_if_necessary(
                    t=t, episodes=int(np.sum(episode_idx))
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

            if checkpoint_freq and t % checkpoint_freq < num_envs:
                save_agent(agent, t, outdir, logger, suffix="_checkpoint")

            # Reset only finished envs; keep the rest running
            # (train_agent_batch.py:141).
            episode_r[end] = 0
            episode_len[end] = 0
            obss = env.reset(not_end)

    except (Exception, KeyboardInterrupt):
        save_agent(agent, t, outdir, logger, suffix="_except")
        env.close()
        raise
    else:
        save_agent(agent, t, outdir, logger, suffix="_finish")
    return eval_stats_history


def train_agent_batch_with_evaluation(
    agent,
    env,
    steps: int,
    eval_n_steps: Optional[int],
    eval_n_episodes: Optional[int],
    eval_interval: int,
    outdir: str,
    checkpoint_freq=None,
    max_episode_len=None,
    step_offset: int = 0,
    eval_max_episode_len=None,
    return_window_size: int = 100,
    eval_env=None,
    log_interval=None,
    successful_score=None,
    step_hooks=(),
    evaluation_hooks=(),
    save_best_so_far_agent: bool = True,
    use_tensorboard: bool = False,
    logger=None,
):
    """Reference signature (train_agent_batch.py:157-245)."""
    logger = logger or logging.getLogger(__name__)
    os.makedirs(outdir, exist_ok=True)

    if eval_env is None:
        eval_env = env
    if eval_max_episode_len is None:
        eval_max_episode_len = max_episode_len

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

    eval_stats_history = train_agent_batch(
        agent,
        env,
        steps,
        outdir,
        checkpoint_freq=checkpoint_freq,
        max_episode_len=max_episode_len,
        step_offset=step_offset,
        evaluator=evaluator,
        successful_score=successful_score,
        return_window_size=return_window_size,
        log_interval=log_interval,
        step_hooks=step_hooks,
        logger=logger,
    )
    return agent, eval_stats_history
