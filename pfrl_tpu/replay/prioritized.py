"""Proportional prioritized replay on the dense device sum tree.

Reference parity: pfrl/replay_buffers/prioritized.py:9-126 (alpha/beta
schedule, eps revisit floor, error clipping, batch/memory weight
normalization) over pfrl/collections/prioritized.py trees.

Deviations, by design (documented for the parity tests):
- Stratified prefix-sum sampling replaces the sequential wait-priority
  protocol (see sum_tree.stratified_sample docstring).
- Beta anneals per sample() call, like the reference.
- With n-step > 1, the newest ``(n-1)*num_lanes`` slots are held out of the
  tree (priority 0 / +inf) until their reward window completes, then enter
  at max priority — the device-side equivalent of the reference's staging
  deques which simply haven't emitted those transitions yet.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from pfrl_tpu.ops import pallas_kernels
from pfrl_tpu.replay import sum_tree
from pfrl_tpu.replay.transition import Transition, TransitionBatch
from pfrl_tpu.replay.uniform import ReplayBuffer, ReplayState


@struct.dataclass
class PrioritizedReplayState:
    base: ReplayState
    tree: jax.Array        # sum tree over slot priorities
    min_tree: jax.Array    # min tree (for normalize_by_max="memory")
    max_priority: jax.Array
    beta: jax.Array

    @property
    def size(self):
        return self.base.size

    @property
    def cursor(self):
        return self.base.cursor


class PrioritizedReplayBuffer(ReplayBuffer):

    # Sampling depends on priorities updated between draws: sequential.
    iid_samples = False
    def __init__(
        self,
        capacity: int,
        alpha: float = 0.6,
        beta0: float = 0.4,
        betasteps: Optional[float] = 2e5,
        eps: float = 0.01,
        normalize_by_max: str = "batch",
        error_min: Optional[float] = 0.0,
        error_max: Optional[float] = 1.0,
        num_steps: int = 1,
        gamma: float = 0.99,
        num_lanes: int = 1,
        store_next_obs: bool = True,
        use_pallas: object = "auto",
        fused_dequant_scale: Optional[float] = None,
    ):
        super().__init__(
            capacity,
            num_steps=num_steps,
            gamma=gamma,
            num_lanes=num_lanes,
            store_next_obs=store_next_obs,
            use_pallas=use_pallas,
            fused_dequant_scale=fused_dequant_scale,
        )
        if normalize_by_max is True:
            normalize_by_max = "batch"
        assert normalize_by_max in (False, "batch", "memory")
        self.alpha = alpha
        self.beta0 = beta0
        self.beta_add = 0.0 if betasteps is None else (1.0 - beta0) / betasteps
        self.eps = eps
        self.normalize_by_max = normalize_by_max
        self.error_min = error_min
        self.error_max = error_max
        self.tree_capacity = sum_tree.tree_capacity(self.capacity)

    def configure_lanes(self, num_lanes: int) -> "PrioritizedReplayBuffer":
        return PrioritizedReplayBuffer(
            capacity=self.capacity,
            alpha=self.alpha,
            beta0=self.beta0,
            betasteps=None if self.beta_add == 0 else (1.0 - self.beta0) / self.beta_add,
            eps=self.eps,
            normalize_by_max=self.normalize_by_max,
            error_min=self.error_min,
            error_max=self.error_max,
            num_steps=self.num_steps,
            gamma=self.gamma,
            num_lanes=num_lanes,
            store_next_obs=self.store_next_obs,
            use_pallas=self.use_pallas,
            fused_dequant_scale=self.fused_dequant_scale,
        )

    # ------------------------------------------------------------------ init
    def init(self, example: Transition) -> PrioritizedReplayState:
        return PrioritizedReplayState(
            base=super().init(example),
            tree=sum_tree.init_tree(self.tree_capacity),
            min_tree=sum_tree.init_min_tree(self.tree_capacity),
            max_priority=jnp.ones((), jnp.float32),
            beta=jnp.asarray(self.beta0, jnp.float32),
        )

    # ------------------------------------------------------------------- add
    def add(self, state: PrioritizedReplayState, batch: Transition) -> PrioritizedReplayState:
        lanes = jax.tree.leaves(batch)[0].shape[0]
        new_base = super().add(state.base, batch)
        written = (state.base.cursor + jnp.arange(lanes, dtype=jnp.int32)) % self.capacity

        hold = (
            self.num_steps - 1 + (0 if self.store_next_obs else 1)
        ) * self.num_lanes
        tree, min_tree = state.tree, state.min_tree
        if hold == 0:
            tree = sum_tree.update(
                tree, written, jnp.full((lanes,), 1.0, jnp.float32) * state.max_priority
            )
            min_tree = sum_tree.update_min(
                min_tree, written, jnp.full((lanes,), 1.0, jnp.float32) * state.max_priority
            )
        else:
            # Newly written slots enter held-out (incomplete n-step window).
            tree = sum_tree.update(tree, written, jnp.zeros((lanes,), jnp.float32))
            min_tree = sum_tree.update_min(
                min_tree, written, jnp.full((lanes,), jnp.inf, jnp.float32)
            )
            # Slots aging out of the hold window become sampleable.
            aging_ids = state.base.cursor - hold + jnp.arange(lanes, dtype=jnp.int32)
            aging = aging_ids % self.capacity
            mature = aging_ids >= 0
            prio = jnp.where(mature, state.max_priority, 0.0)
            tree = sum_tree.update(
                tree, aging, jnp.where(mature, prio, sum_tree.get(tree, aging))
            )
            min_tree = sum_tree.update_min(
                min_tree,
                aging,
                jnp.where(mature, prio, sum_tree.get(min_tree, aging)),
            )
        return PrioritizedReplayState(
            base=new_base,
            tree=tree,
            min_tree=min_tree,
            max_priority=state.max_priority,
            beta=state.beta,
        )

    # ----------------------------------------------------------------- sample
    def _find_slots(self, tree: jax.Array, targets: jax.Array) -> jax.Array:
        """Prefix-sum target -> leaf slot.

        Pallas streaming prefix kernel when enabled and shape-eligible
        (leaf count a multiple of its 8192-element chunk, batch within its
        VMEM budget); otherwise the log2(C)-gather tree descent. Both
        return the leaf whose cumulative-priority interval contains each
        target; zero-priority (held-out) leaves are never selected.
        """
        mode = self._pallas_mode()
        batch = targets.shape[0]
        cap = self.tree_capacity
        if (
            mode
            and cap % pallas_kernels._CHUNK == 0
            and batch <= pallas_kernels._MAX_PALLAS_BATCH
        ):
            leaves = tree[cap:]
            idx = pallas_kernels.prefix_sample_pallas(
                leaves, targets, interpret=mode == "interpret"
            )
            return jnp.minimum(idx, cap - 1)
        return sum_tree.sample_from_prefix(tree, targets)

    def sample(
        self, state: PrioritizedReplayState, rng: jax.Array, batch_size: int
    ):
        """Returns (batch, new_state) — beta anneals per call."""
        targets = sum_tree.stratified_targets(
            sum_tree.total(state.tree), rng, batch_size
        )
        slots = self._find_slots(state.tree, targets)
        priorities = sum_tree.get(state.tree, slots)
        probs = priorities / sum_tree.total(state.tree)

        if self.normalize_by_max == "batch":
            min_prob = jnp.min(probs)
            weights = (probs / min_prob) ** -state.beta
        elif self.normalize_by_max == "memory":
            min_prob = sum_tree.min_value(state.min_tree) / sum_tree.total(state.tree)
            weights = (probs / min_prob) ** -state.beta
        else:
            weights = (state.size.astype(jnp.float32) * probs) ** -state.beta

        # Slot -> monotonic id (needed by gather's window arithmetic):
        # id = slot if slot in the live [lo, cursor) window else slot + wrap.
        lo = jnp.maximum(0, state.cursor - self.capacity)
        gen = (state.cursor - 1 - slots) // self.capacity  # how many wraps back
        ids = slots + (gen * self.capacity)
        ids = jnp.maximum(ids, lo)

        batch = self.gather(state.base, ids)
        batch = batch.replace(weight=weights, indices=slots)
        new_state = state.replace(
            beta=jnp.minimum(1.0, state.beta + self.beta_add * 1.0)
        )
        return batch, new_state

    # ------------------------------------------------------------- priorities
    def priority_from_errors(self, errors: jax.Array) -> jax.Array:
        e = errors
        if self.error_min is not None:
            e = jnp.maximum(e, self.error_min)
        if self.error_max is not None:
            e = jnp.minimum(e, self.error_max)
        return (e + self.eps) ** self.alpha

    def update_priorities(
        self,
        state: PrioritizedReplayState,
        slots: jax.Array,
        errors: jax.Array,
    ) -> PrioritizedReplayState:
        """The reference's update_errors feedback (prioritized.py:125-126)."""
        prio = self.priority_from_errors(errors)
        return state.replace(
            tree=sum_tree.update(state.tree, slots, prio),
            min_tree=sum_tree.update_min(state.min_tree, slots, prio),
            max_priority=jnp.maximum(state.max_priority, jnp.max(prio)),
        )

    # ------------------------------------------------------- storage split
    def split_storage(self, state):
        """Trees/beta stay in the light part (they mutate inside update
        loops); only the transition storage is split out (see
        ReplayBuffer.split_storage for why)."""
        return (
            state.replace(base=state.base.replace(storage=None)),
            state.base.storage,
        )

    def merge_storage(self, light, storage):
        return light.replace(base=light.base.replace(storage=storage))
