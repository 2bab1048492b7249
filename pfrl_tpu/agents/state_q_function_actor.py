"""Actor for actor-learner training.

Reference parity: pfrl/agents/state_q_function_actor.py:15-133. The
reference actor owns a shared-memory CPU copy of the model and ships
transitions to the learner over an ``mp.Pipe``. Here the actor owns
nothing: ``act`` is a blocking call into the BatchedInferenceServer (one
batched device forward for all actors), and ``observe`` enqueues the
transition for the poller thread — the pipe protocol collapses to a
``queue.Queue`` because actors are threads of the learner's process.
"""

import queue
from typing import Any, Optional

import numpy as np

from pfrl_tpu.agent import Agent


class StateQFunctionActor(Agent):
    """Agent-protocol actor: act via the inference server, ship transitions.

    Args:
        inference: BatchedInferenceServer (or anything with
            ``submit(obs, training) -> action``).
        transition_queue: sink drained by the learner-side poller
            (replaces ``pipe.send(("transition", ...))``,
            state_q_function_actor.py:72-76).
        actor_id: lane index in the learner's replay ring.
        learner_agent: the learner-side agent; save/load/get_statistics
            delegate to it directly (the reference round-trips these over
            the pipe, state_q_function_actor.py:95-121 — same process here,
            so a direct call under the learner's locks suffices).
    """

    def __init__(
        self,
        inference,
        transition_queue: "queue.Queue",
        actor_id: int,
        learner_agent=None,
        logger=None,
    ):
        self.inference = inference
        self.transition_queue = transition_queue
        self.actor_id = actor_id
        self.learner_agent = learner_agent
        self.logger = logger
        self._last_obs: Optional[np.ndarray] = None
        self._last_action: Optional[np.ndarray] = None
        self.t = 0

    # --------------------------------------------------------------- acting
    def act(self, obs) -> Any:
        action = self.inference.submit(np.asarray(obs), self.training)
        self._last_obs = np.asarray(obs)
        self._last_action = np.asarray(action)
        return action

    def observe(self, obs, reward, done, reset) -> None:
        if not self.training:
            return
        self.t += 1
        self.transition_queue.put(
            (
                self.actor_id,
                dict(
                    obs=self._last_obs,
                    action=self._last_action,
                    reward=np.float32(reward),
                    next_obs=np.asarray(obs),
                    terminated=bool(done),
                    done=bool(done or reset),
                ),
            )
        )

    # ------------------------------------------------------------- delegate
    def save(self, dirname: str) -> None:
        if self.learner_agent is not None:
            self.learner_agent.save(dirname)

    def load(self, dirname: str) -> None:
        if self.learner_agent is not None:
            self.learner_agent.load(dirname)

    def get_statistics(self):
        if self.learner_agent is not None:
            return self.learner_agent.get_statistics()
        return []


class VectorStateQFunctionActor(StateQFunctionActor):
    """Actor that drives K env lanes from one thread.

    The reference runs one actor process per env (pfrl/agents/
    state_q_function_actor.py); with host threads the per-transition
    Python overhead (queue hop + event wait + GIL switch per act) caps the
    whole pipeline at a few hundred steps/s regardless of actor count.
    Row-batching K lanes per actor amortizes that overhead K-fold: one
    inference-server request and ONE queue message per vector step carry
    all K transitions as stacked arrays.

    Drive it like a BatchAgent: ``batch_act(obs_list) -> actions[K]`` then
    ``batch_observe(obs_list, rewards, dones, resets)``.
    """

    def __init__(self, inference, transition_queue, actor_id, num_lanes,
                 learner_agent=None, logger=None):
        super().__init__(inference, transition_queue, actor_id,
                         learner_agent=learner_agent, logger=logger)
        self.num_lanes = num_lanes

    def act(self, obs):
        raise TypeError(
            "VectorStateQFunctionActor drives num_lanes env lanes: use "
            "batch_act(obs_list), not the single-row act()."
        )

    def observe(self, obs, reward, done, reset):
        # A K-lane actor shipping single rows would make the poller's
        # k-row concatenation mis-shape the replay ring and inflate step
        # counts by K — fail fast instead (ADVICE r2).
        raise TypeError(
            "VectorStateQFunctionActor ships [num_lanes, ...] rows: use "
            "batch_observe(...), not the single-row observe()."
        )

    def _collate(self, obs_list):
        if isinstance(obs_list, np.ndarray):
            return obs_list
        return np.stack([np.asarray(o) for o in obs_list])

    def batch_act(self, obs_list) -> np.ndarray:
        obs = self._collate(obs_list)
        actions = self.inference.submit_batch(obs, self.training)
        self._last_obs = obs
        self._last_action = np.asarray(actions)
        return self._last_action

    def batch_observe(self, obs_list, rewards, dones, resets) -> None:
        if not self.training:
            return
        self.t += self.num_lanes
        next_obs = self._collate(obs_list)
        dones = np.asarray(dones, bool)
        self.transition_queue.put(
            (
                self.actor_id,
                dict(
                    obs=self._last_obs,
                    action=self._last_action,
                    reward=np.asarray(rewards, np.float32),
                    next_obs=next_obs,
                    terminated=dones,
                    done=dones | np.asarray(resets, bool),
                ),
            )
        )
