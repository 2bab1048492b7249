"""A3C — reference parity: pfrl/agents/a3c.py:17-312.

The reference's A3C is asynchronous ONLY because its CPU workers hide env
latency behind lock-free Hogwild-style gradient pushes into shared memory
(a3c.py:209-221). On TPU there is no latency to hide — envs, model, and
optimizer live in one jitted program — so asynchrony buys nothing and
costs gradient staleness. A3C therefore maps to the synchronous batched
A2C with one lane per "worker process": same n-step actor-critic loss,
same t_max semantics, deterministic instead of racy.

``A3C`` here is that mapping, kept as a distinct name so reference users
find it; see pfrl_tpu/experiments/train_agent_async.py for the driver-side
equivalence.
"""

from pfrl_tpu.agents.a2c import A2C, A2CCore


class A3CCore(A2CCore):
    pass


class A3C(A2C):
    """Synchronous pod-scale stand-in for the reference's async A3C.

    Constructor mirrors A2C; ``num_processes`` plays the role of the
    reference's worker count.
    """
