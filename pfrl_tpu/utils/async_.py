"""Process-pool helper (reference parity: pfrl/utils/async_.py:12-44).

Kept for host-side tooling that genuinely needs processes (e.g. external
simulator farms). The training path never uses it — see
pfrl_tpu/experiments/train_agent_async.py for why async training maps to
synchronous batches on TPU.
"""

import multiprocessing as mp
import warnings
from typing import Callable, Sequence


class AbnormalExitWarning(Warning):
    """A worker exited abnormally (reference :8-11)."""


def run_async(n_process: int, run_func: Callable[[int], None]) -> None:
    """Fork ``n_process`` workers running ``run_func(process_idx)``."""
    processes: Sequence[mp.Process] = [
        mp.Process(target=run_func, args=(i,)) for i in range(n_process)
    ]
    for p in processes:
        p.start()
    for p in processes:
        p.join()
        if p.exitcode and p.exitcode != 0:
            warnings.warn(
                f"Process #{p.pid} exited with code {p.exitcode}",
                AbnormalExitWarning,
            )
