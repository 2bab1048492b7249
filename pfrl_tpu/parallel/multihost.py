"""Multi-host SPMD entry points.

The reference's only multi-node hook is the closed-source ``pfrlmn``
package behind ``PersistentReplayBuffer(distributed=True)``
(pfrl/replay_buffers/persistent.py:54-73). The TPU-native stance
(SURVEY.md §5.8): one SPMD program per host — ``jax.distributed``
initialization, a global mesh spanning every process's devices, env lanes
and the replay ring sharded over the data axis (each host steps its local
lanes), params replicated, gradient all-reduce inserted by XLA riding
ICI within hosts and DCN across them. No pipes, queues, or parameter
servers: the runner's jitted chunk IS the distributed program.

Verified by tests/test_multihost.py, which forks two CPU processes, forms
a 4-device global mesh over Gloo collectives, and runs real sharded
training steps in each.
"""

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Join the multi-host SPMD job (wraps ``jax.distributed.initialize``).

    On TPU pods all arguments are auto-detected from the TPU metadata
    server — call with no arguments. Elsewhere (CPU/GPU clusters, tests),
    pass them explicitly or via environment variables
    ``PFRL_TPU_COORDINATOR`` / ``PFRL_TPU_NUM_PROCESSES`` /
    ``PFRL_TPU_PROCESS_ID``. Safe to call once per process, before any
    jax computation.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "PFRL_TPU_COORDINATOR"
    )
    if num_processes is None and "PFRL_TPU_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["PFRL_TPU_NUM_PROCESSES"])
    if process_id is None and "PFRL_TPU_PROCESS_ID" in os.environ:
        process_id = int(os.environ["PFRL_TPU_PROCESS_ID"])
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)


def global_mesh(axis_names: Sequence[str] = ("dp",)) -> Mesh:
    """Mesh over every device of every process (call after
    :func:`initialize_multihost`). 1-D data mesh by default — RL models
    are small; parallelism is over env lanes (SURVEY.md §2.6)."""
    devices = np.asarray(jax.devices())
    shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(devices.reshape(shape), axis_names)


def is_primary() -> bool:
    """True on exactly one process — gate checkpoint writes, scores.txt,
    and logging to this (each host otherwise runs an identical program)."""
    return jax.process_index() == 0


def local_lane_slice(num_global_lanes: int) -> slice:
    """The env-lane rows this process owns under an evenly dp-sharded
    ``[num_global_lanes, ...]`` array (for host-side env feeding)."""
    n = jax.process_count()
    assert num_global_lanes % n == 0, (num_global_lanes, n)
    per = num_global_lanes // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
