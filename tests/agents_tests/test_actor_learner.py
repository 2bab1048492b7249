"""Actor-learner training tests.

Modeled on the reference's _TestActorLearnerTrainingMixin
(tests/agents_tests/basetest_training.py:178-289): fast runs assert the
plumbing — cumulative step accounting, hook cadence, checkpoint artifacts —
rather than learning success.
"""

import os
import threading
import time
from unittest import mock

import numpy as np
import optax
import pytest

from pfrl_tpu.agents import DQN, DoubleDQN, CategoricalDQN, IQN
from pfrl_tpu.envs import ABC
from pfrl_tpu.envs.host_adapter import HostJaxEnv
from pfrl_tpu.experiments import train_agent_async
from pfrl_tpu.explorers import ConstantEpsilonGreedy
from pfrl_tpu.models import MLP
from pfrl_tpu.parallel import BatchedInferenceServer
from pfrl_tpu.q_functions import (
    DistributionalFCStateQFunctionWithDiscreteAction,
    FCStateQFunctionWithDiscreteAction,
    ImplicitQuantileQFunction,
)
from pfrl_tpu.replay import ReplayBuffer


def _scalar_qf():
    return FCStateQFunctionWithDiscreteAction(
        n_actions=2, n_hidden_channels=16, n_hidden_layers=1
    )


def _c51_qf():
    return DistributionalFCStateQFunctionWithDiscreteAction(
        n_actions=2,
        n_atoms=17,
        v_min=-1.0,
        v_max=2.0,
        n_hidden_channels=16,
        n_hidden_layers=1,
    )


def _iqn_qf():
    return ImplicitQuantileQFunction(
        psi=MLP(out_size=16, hidden_sizes=(16,)), n_actions=2
    )


# The reference runs its actor-learner bucket across the DQN family
# (tests/agents_tests/basetest_training.py:178-289 used by test_dqn.py,
# test_double_dqn.py, test_categorical_dqn.py, test_iqn.py).
AGENT_FAMILY = [
    ("dqn", DQN, _scalar_qf),
    ("double_dqn", DoubleDQN, _scalar_qf),
    ("categorical_dqn", CategoricalDQN, _c51_qf),
    ("iqn", IQN, _iqn_qf),
]


def make_agent(agent_cls=DQN, qf_factory=_scalar_qf):
    return agent_cls(
        q_function=qf_factory(),
        optimizer=optax.adam(1e-2),
        replay_buffer=ReplayBuffer(capacity=256, num_lanes=2),
        gamma=0.9,
        explorer=ConstantEpsilonGreedy(0.3, 2),
        replay_start_size=8,
        minibatch_size=4,
        update_interval=1,
        target_update_interval=16,
    )


@pytest.mark.parametrize(
    "name,agent_cls,qf_factory", AGENT_FAMILY, ids=[a[0] for a in AGENT_FAMILY]
)
def test_actor_learner_training_fast(tmp_path, name, agent_cls, qf_factory):
    steps = 60
    agent = make_agent(agent_cls, qf_factory)
    assert agent.cumulative_steps == 0

    def make_env(process_idx, test):
        return HostJaxEnv(ABC(discrete=True, episodic=True), seed=process_idx)

    step_hook = mock.Mock()
    optimizer_step_hook = mock.Mock()

    make_actor, learner, poller, exception_event = (
        agent.setup_actor_learner_training(
            n_actors=2,
            step_hooks=[step_hook],
            optimizer_step_hooks=[optimizer_step_hook],
        )
    )
    poller.start()
    learner.start()
    train_agent_async(
        outdir=str(tmp_path),
        processes=2,
        make_env=make_env,
        steps=steps,
        eval_interval=30,
        eval_n_steps=None,
        eval_n_episodes=2,
        make_agent=make_actor,
        stop_event=learner.stop_event,
        exception_event=exception_event,
    )
    learner.stop()
    learner.join()
    poller.stop()
    poller.join()

    assert not exception_event.is_set()
    assert agent.cumulative_steps > 0
    # Each actor thread may complete one in-flight step past `steps`.
    assert agent.cumulative_steps <= steps + 2

    # Hooks: called per optimizer step with the reference's signature
    # (basetest_training.py:252-262).
    assert optimizer_step_hook.call_count == step_hook.call_count
    for i, call in enumerate(step_hook.call_args_list):
        args, _ = call
        assert args[0] is None
        assert args[1] is agent
        assert args[2] == (i + 1) * agent.update_interval
    for i, call in enumerate(optimizer_step_hook.call_args_list):
        args, _ = call
        assert args[2] == i + 1

    # Artifact: final or successful checkpoint dir (train_agent_async
    # saves `{steps}_finish` / `successful`).
    assert os.path.exists(os.path.join(tmp_path, f"{steps}_finish")) or (
        os.path.exists(os.path.join(tmp_path, "successful"))
    )
    assert os.path.exists(os.path.join(tmp_path, "scores.txt"))


def test_actor_learner_updates_happen(tmp_path):
    """With ``n_updates`` set, the learner drives termination and must have
    run exactly that many optimizer steps (reference semantics: the learner
    sets the stop event once n_updates is reached, dqn.py:666-668)."""
    agent = make_agent()

    def make_env(process_idx, test):
        return HostJaxEnv(ABC(discrete=True, episodic=True), seed=process_idx)

    make_actor, learner, poller, exception_event = (
        agent.setup_actor_learner_training(
            n_actors=2, actor_update_interval=2, n_updates=3
        )
    )
    poller.start()
    learner.start()
    train_agent_async(
        outdir=str(tmp_path),
        processes=2,
        make_env=make_env,
        steps=100000,  # large: the learner's n_updates ends training
        eval_interval=None,
        eval_n_steps=None,
        eval_n_episodes=2,
        make_agent=make_actor,
        stop_event=learner.stop_event,
        exception_event=exception_event,
    )
    learner.stop()
    learner.join()
    poller.stop()
    poller.join()
    assert not exception_event.is_set()
    assert agent.optim_t >= 3
    # Snapshot published to actors (update_counter increments every
    # actor_update_interval updates, dqn.py:687-691).
    assert agent.update_counter.value > 0
    assert agent._actor_train_state is not None


def test_batched_inference_server_routes_actions():
    """Requests from many threads come back to the right caller."""

    def act_fn(seed, obs, t, training):
        return obs[:, 0]  # action := first obs feature

    server = BatchedInferenceServer(act_fn, n_slots=4)
    server.start()
    results = {}

    def worker(i):
        results[i] = server.submit(np.asarray([float(i), 0.0]), True)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    server.stop()
    for i in range(8):
        assert results[i] == pytest.approx(float(i))


def test_batched_inference_server_propagates_errors():
    def act_fn(seed, obs, t, training):
        raise RuntimeError("boom")

    server = BatchedInferenceServer(act_fn, n_slots=2)
    server.start()
    with pytest.raises(RuntimeError, match="boom"):
        server.submit(np.zeros(2), True)
    server.stop()


def test_batched_inference_server_row_batched_requests():
    """Vector actors submit K rows per request; the server concatenates
    across requests up to n_slots and routes each slice back."""

    def act_fn(seed, obs, t, training):
        return obs[:, 0]

    server = BatchedInferenceServer(act_fn, n_slots=8)
    server.start()
    results = {}

    def worker(i):
        obs = np.stack([[float(i * 4 + j), 0.0] for j in range(4)])
        results[i] = server.submit_batch(obs, True)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    server.stop()
    for i in range(4):
        np.testing.assert_allclose(
            results[i], [float(i * 4 + j) for j in range(4)]
        )


def test_vector_actor_learner_training():
    """lanes_per_actor>1: vector actors drive K env lanes per thread, the
    poller concatenates row-batched transitions, and the learner updates
    from the (n_actors*K)-lane replay ring."""
    K = 3
    agent = DQN(
        q_function=FCStateQFunctionWithDiscreteAction(
            n_actions=2, n_hidden_channels=16, n_hidden_layers=1
        ),
        optimizer=optax.adam(1e-2),
        # store_next_obs=False also covers the poller's skip-next-obs-upload
        # fast path (bootstrap obs derived from the successor ring row).
        replay_buffer=ReplayBuffer(
            capacity=256, num_lanes=2 * K, store_next_obs=False
        ),
        gamma=0.9,
        explorer=ConstantEpsilonGreedy(0.3, 2),
        replay_start_size=8,
        minibatch_size=4,
        update_interval=1,
        target_update_interval=16,
    )
    make_actor, learner, poller, exception_event = (
        agent.setup_actor_learner_training(
            n_actors=2, lanes_per_actor=K, inference_slots=K, n_updates=2
        )
    )
    poller.start()
    learner.start()
    stop = threading.Event()

    def actor_loop(i):
        envs = [
            HostJaxEnv(ABC(discrete=True, episodic=True), seed=i * K + j)
            for j in range(K)
        ]
        actor = make_actor(i)
        obs = [e.reset() for e in envs]
        while not (stop.is_set() or learner.stop_event.is_set()):
            actions = actor.batch_act(obs)
            nxt, rs, ds, rsts = [], [], [], []
            for e, a in zip(envs, actions):
                o2, r, d, info = e.step(int(a))
                nxt.append(o2)
                rs.append(r)
                ds.append(d)
                rsts.append(info.get("needs_reset", False))
            actor.batch_observe(nxt, rs, ds, rsts)
            obs = [envs[j].reset() if ds[j] else nxt[j] for j in range(K)]

    threads = [
        threading.Thread(target=actor_loop, args=(i,), daemon=True)
        for i in range(2)
    ]
    for t in threads:
        t.start()
    deadline = time.time() + 60
    while not learner.stop_event.is_set() and time.time() < deadline:
        time.sleep(0.05)
    stop.set()
    for t in threads:
        t.join(10)
    learner.stop()
    learner.join(10)
    poller.stop()
    poller.join(10)
    assert not exception_event.is_set()
    assert agent.optim_t >= 2
    assert agent.cumulative_steps >= 8
    # Replay ring was reconfigured to the full lane count.
    assert agent.buffer.num_lanes == 2 * K


def test_inference_server_concurrent_submission_under_snapshot_swaps():
    """N actor threads submit row-batches while a 'learner' thread swaps
    the published snapshot continuously — the race the reference guards
    with replay_buffer_lock + shared_model copies (pfrl/agents/dqn.py:757,
    687-691). Every reply must be routed to its caller, computed against
    exactly ONE snapshot (no torn batch), and snapshots seen by any one
    actor must be non-decreasing (pointer swaps are atomic)."""
    published = {"v": 0}
    stop = threading.Event()

    def act_fn(seed, obs, t, training):
        v = published["v"]  # one snapshot read per batch
        time.sleep(0.0005)  # widen the race window
        # action := snapshot id + row tag, so routing AND tearing both show
        return np.asarray([v * 1000 + int(o[0]) for o in obs])

    def learner_loop():
        while not stop.is_set():
            published["v"] += 1
            time.sleep(0.0002)

    server = BatchedInferenceServer(act_fn, n_slots=8)
    server.start()
    swapper = threading.Thread(target=learner_loop, daemon=True)
    swapper.start()
    errors = []

    def actor_loop(i):
        last_v = -1
        try:
            for _ in range(50):
                obs = np.stack([[float(i * 2 + j), 0.0] for j in range(2)])
                out = server.submit_batch(obs, True)
                vs = {int(a) // 1000 for a in out}
                tags = [int(a) % 1000 for a in out]
                assert len(vs) == 1, f"torn batch: {out}"
                v = vs.pop()
                assert v >= last_v, "snapshot went backwards"
                last_v = v
                assert tags == [i * 2, i * 2 + 1], f"misrouted: {out}"
        except Exception as e:  # pragma: no cover - assertion reporting
            errors.append(e)

    threads = [
        threading.Thread(target=actor_loop, args=(i,)) for i in range(4)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    stop.set()
    swapper.join()
    server.stop()
    assert not errors, errors
