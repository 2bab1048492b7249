"""Host-side collections (reference parity: pfrl/collections/).

The hot-path equivalents of these live on device (pfrl_tpu/replay: ring
buffers, dense sum trees). These host classes exist for API parity and for
the disk-backed persistent experience pipeline.
"""

from pfrl_tpu.collections_.persistent_collections import (
    PersistentRandomAccessQueue,
)
from pfrl_tpu.collections_.random_access_queue import RandomAccessQueue

__all__ = ["PersistentRandomAccessQueue", "RandomAccessQueue"]
