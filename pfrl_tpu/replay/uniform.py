"""Uniform device-resident replay buffer.

Reference parity: pfrl/replay_buffers/replay_buffer.py:9-95 +
the ``batch_experiences`` collation (pfrl/replay_buffer.py:157-212).

TPU-native design: a preallocated ring of device arrays with a monotonic
write cursor. Batched insert (one slot per env lane per step) is a single
scatter; sampling gathers random rows. N-step returns are folded at *sample*
time from the raw 1-step ring — the ring layout interleaves env lanes, so
the temporal successor of slot ``i`` is ``i + num_lanes``; windows are
masked at episode boundaries, reproducing the reference's per-env staging
deques + ``stop_current_episode`` flush semantics without any host state.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

from pfrl_tpu.replay.transition import Transition, TransitionBatch


def _padded_width(d: int) -> int:
    """Flat item width as stored: 128-lane aligned for wide leaves.

    Leaves of at least one full TPU lane row (128 elements) are padded to a
    multiple of 128 so the Pallas gather kernel's [1, R, 128] row blocks
    tile them exactly; the pad is write-only zeros, sliced off at gather.
    Narrow leaves (scalars, actions) stay unpadded and take the XLA path.
    """
    if d < 128:
        return d
    return ((d + 127) // 128) * 128


class ItemShape:
    """Static per-leaf item-shape marker (an opaque pytree leaf).

    Storage keeps every multi-axis leaf flattened to ``[capacity, prod]``:
    XLA's layout assignment otherwise propagates the *consumer's* preferred
    layout (e.g. the conv's image tiling) backwards through the sample
    gather onto the entire ring, materializing a full-ring relayout copy
    inside the training loop — measured 5x end-to-end slowdown at a
    100k-frame ring. A 2D ring has a trivial layout; only the gathered
    minibatch is reshaped (and possibly relaid out) per update.
    """

    __slots__ = ("shape",)

    def __init__(self, shape):
        self.shape = tuple(shape)

    def __eq__(self, other):
        return isinstance(other, ItemShape) and other.shape == self.shape

    def __hash__(self):
        return hash(self.shape)

    def __repr__(self):
        return f"ItemShape{self.shape}"


def flatten_items(batch):
    """[N, *s] -> [N, prod(s)] per leaf (identity for 1-D leaves)."""
    return jax.tree.map(
        lambda x: x.reshape(x.shape[0], -1) if x.ndim > 1 else x, batch
    )


def unflatten_items(batch, shapes, leading: int = 1):
    """Invert :func:`flatten_items` given an ItemShape tree, keeping
    ``leading`` batch axes."""
    return jax.tree.map(
        lambda x, s: x.reshape(x.shape[:leading] + s.shape),
        batch,
        shapes,
    )


@struct.dataclass
class ReplayState:
    storage: Transition      # [capacity, prod(shape)] per leaf (flattened)
    cursor: jax.Array        # int64-ish monotonic count of items written
    item_shapes: Any = struct.field(pytree_node=False, default=None)

    @property
    def size(self) -> jax.Array:
        capacity = jax.tree.leaves(self.storage)[0].shape[0]
        return jnp.minimum(self.cursor, capacity)


class ReplayBuffer:
    """Static config + pure init/add/sample functions over ReplayState.

    Args:
        capacity: max stored transitions (rounded to a multiple of lanes).
        num_steps: n of n-step returns (reference: ReplayBuffer(num_steps)).
        gamma: discount used for the n-step fold (the reference folds with
            the agent's gamma inside batch_experiences).
        num_lanes: env-batch width of each ``add`` call; fixes the ring
            stride so n-step windows follow a single env lane.
    """

    def __init__(
        self,
        capacity: int,
        num_steps: int = 1,
        gamma: float = 0.99,
        num_lanes: int = 1,
        store_next_obs: bool = True,
        use_pallas: object = "auto",
        fused_dequant_scale: Optional[float] = None,
    ):
        """``store_next_obs=False`` halves observation memory: the bootstrap
        observation is read from the temporally-next ring slot instead of a
        stored copy (the classic single-frame Atari layout). Exact for
        terminated episodes (the bootstrap term is masked anyway); at
        truncation boundaries the reset observation stands in for the true
        next observation — enable full storage where truncation bootstrap
        fidelity matters (MuJoCo-style continuing tasks).

        ``use_pallas``: accepted for API stability and forwarded to the
        PER subclass, where ``True`` opts its SAMPLING into the streaming
        Pallas prefix-sum kernel (the one Pallas kernel that measured a
        win — pfrl_tpu/ops/pallas_kernels.py's verdict). The uniform
        buffer itself is pure XLA: its Pallas row-gather kernel lost to
        the XLA gather ~3x in every round-1..3 capture and was cut in
        round 4.

        ``fused_dequant_scale``: when set (e.g. ``1/255``), uint8
        observation leaves are dequantized to ``float32 * scale`` inside
        the sample gather itself — the Pallas fused gather+dequantize
        kernel on TPU, an equivalent XLA gather+convert elsewhere — so the
        agent's ``phi`` must be dtype-aware (skip scaling for float input;
        see :func:`pfrl_tpu.utils.atari_phi`). Replaces the reference's
        separate sample + ``phi`` passes (pfrl/replay_buffer.py:157-212,
        pfrl/agents/dqn.py:475-488).
        """
        assert capacity >= num_lanes * (num_steps + (0 if store_next_obs else 1))
        assert use_pallas in (True, False, "auto")
        self.num_lanes = num_lanes
        self.capacity = (capacity // num_lanes) * num_lanes
        self.num_steps = num_steps
        self.gamma = gamma
        self.store_next_obs = store_next_obs
        self.use_pallas = use_pallas
        self.fused_dequant_scale = fused_dequant_scale

    #: Samples are iid draws with no cross-sample state (no priority
    #: feedback): callers may batch many minibatches into one gather.
    #: PrioritizedReplayBuffer overrides this to False.
    iid_samples = True

    @property
    def wants_next_obs(self) -> bool:
        """Stable protocol for host pollers: whether ``add`` consumes the
        ``next_obs`` leaf (False = derived from the successor ring slot, so
        callers may skip collating/uploading it entirely). Part of the
        buffer API so pollers and buffers cannot drift apart (ADVICE r2)."""
        return self.store_next_obs

    def _pallas_mode(self) -> Optional[str]:
        """None (XLA), "compiled", or "interpret" — resolved at trace time."""
        if self.use_pallas is not True:
            return None  # "auto" = XLA; see __init__ docstring for why
        return "compiled" if jax.default_backend() == "tpu" else "interpret"

    def configure_lanes(self, num_lanes: int) -> "ReplayBuffer":
        """Return a copy reconfigured for a different env-batch width.

        The host shell calls this lazily once it learns the vector-env size
        (the reference discovers the same thing via env_id keys on its
        staging deques, replay_buffers/replay_buffer.py:29-45).
        """
        return ReplayBuffer(
            capacity=self.capacity,
            num_steps=self.num_steps,
            gamma=self.gamma,
            num_lanes=num_lanes,
            store_next_obs=self.store_next_obs,
            use_pallas=self.use_pallas,
            fused_dequant_scale=self.fused_dequant_scale,
        )

    # ------------------------------------------------------------------ init
    def init(self, example: Transition) -> ReplayState:
        """Allocate storage from a single example transition (no batch dim)."""
        if not self.store_next_obs:
            example = example.replace(
                next_obs=jax.tree.map(lambda x: jnp.zeros((0,)), example.next_obs)
            )
        item_shapes = jax.tree.map(
            lambda x: ItemShape(jnp.shape(x)), example
        )
        storage = jax.tree.map(
            lambda x: jnp.zeros(
                (self.capacity, _padded_width(int(jnp.size(x)))),
                jnp.result_type(x),
            )
            if jnp.ndim(x) >= 1
            else jnp.zeros((self.capacity,), jnp.result_type(x)),
            example,
        )
        return ReplayState(
            storage=storage,
            cursor=jnp.zeros((), jnp.int32),
            item_shapes=item_shapes,
        )

    # ------------------------------------------------------------------- add
    def add(self, state: ReplayState, batch: Transition) -> ReplayState:
        """Insert ``num_lanes`` transitions (one per env lane)."""
        if not self.store_next_obs:
            batch = batch.replace(
                next_obs=jax.tree.map(
                    lambda x: jnp.zeros((x.shape[0], 0)), batch.next_obs
                )
            )
        lanes = jax.tree.leaves(batch)[0].shape[0]
        idx = (state.cursor + jnp.arange(lanes, dtype=jnp.int32)) % self.capacity

        def write(s, x):
            if x.ndim == 2 and s.shape[1] != x.shape[1]:  # 128-lane pad
                x = jnp.pad(x, ((0, 0), (0, s.shape[1] - x.shape[1])))
            return s.at[idx].set(x)

        storage = jax.tree.map(write, state.storage, flatten_items(batch))
        return state.replace(storage=storage, cursor=state.cursor + lanes)

    # ----------------------------------------------------------------- sample
    def _sampleable_range(self, state: ReplayState):
        """Monotonic id range [lo, hi) of n-step-window-complete items.

        Without stored next_obs, one extra stride is held out so the
        bootstrap slot (window end + 1) is always written.
        """
        extra = 0 if self.store_next_obs else 1
        lo = jnp.maximum(0, state.cursor - self.capacity)
        hi = state.cursor - (self.num_steps - 1 + extra) * self.num_lanes
        return lo, hi

    def sample_indices(
        self, state: ReplayState, rng: jax.Array, batch_size: int
    ) -> jax.Array:
        lo, hi = self._sampleable_range(state)
        return lo + jax.random.randint(rng, (batch_size,), 0, jnp.maximum(hi - lo, 1))

    def _take(self, x, ids, shape: ItemShape, dequant: bool = False):
        """Gather rows ``x[ids]``, trimming 128-lane pad to the true item
        width; optionally fused-dequantize uint8 -> float32 * scale (XLA
        fuses the convert into the gather consumer).
        """
        true_d = 1
        for s in shape.shape:
            true_d *= s
        dq = dequant and self.fused_dequant_scale and x.dtype == jnp.uint8
        out = x[ids]
        if out.ndim == 2 and out.shape[1] != true_d:
            out = out[:, :true_d]
        if dq:
            out = out.astype(jnp.float32) * self.fused_dequant_scale
        return out

    def gather(self, state: ReplayState, ids: jax.Array) -> TransitionBatch:
        """Materialize an n-step-folded batch from monotonic ids."""
        n, stride = self.num_steps, self.num_lanes
        # Window of n successive same-lane slots: [B, n]
        win = (ids[:, None] + jnp.arange(n, dtype=ids.dtype)[None, :] * stride) % self.capacity
        first = win[:, 0]

        st = state.storage
        rewards = st.reward[win]              # [B, n]
        terminated = st.terminated[win]       # [B, n]
        dones = st.done[win]                  # [B, n]

        # Steps strictly after an episode boundary are invalid.
        boundary_before = jnp.cumsum(
            jnp.pad(dones[:, : n - 1], ((0, 0), (1, 0))), axis=1
        )
        valid = boundary_before == 0          # [B, n]; [:,0] always True
        discounts = self.gamma ** jnp.arange(n, dtype=jnp.float32)
        folded_reward = jnp.sum(
            rewards * valid.astype(rewards.dtype) * discounts, axis=1
        )
        k = jnp.sum(valid, axis=1)            # steps actually folded
        discount = self.gamma ** k.astype(jnp.float32)
        is_terminal = jnp.any(terminated & valid, axis=1)
        # Bootstrap obs is next_obs of the last folded step.
        last = win[jnp.arange(win.shape[0]), k - 1]

        shapes = state.item_shapes
        obs = unflatten_items(
            jax.tree.map(
                lambda x, s: self._take(x, first, s, dequant=True),
                st.obs,
                shapes.obs,
            ),
            shapes.obs,
        )
        if self.store_next_obs:
            next_obs = unflatten_items(
                jax.tree.map(
                    lambda x, s: self._take(x, last, s, dequant=True),
                    st.next_obs,
                    shapes.next_obs,
                ),
                shapes.next_obs,
            )
        else:
            nxt = (last + stride) % self.capacity
            next_obs = unflatten_items(
                jax.tree.map(
                    lambda x, s: self._take(x, nxt, s, dequant=True),
                    st.obs,
                    shapes.obs,
                ),
                shapes.obs,
            )
        extras = unflatten_items(
            jax.tree.map(
                lambda x, s: self._take(x, first, s), st.extras, shapes.extras
            ),
            shapes.extras,
        )
        return TransitionBatch(
            obs=obs,
            action=unflatten_items(
                self._take(st.action, first, shapes.action), shapes.action
            ),
            reward=folded_reward,
            next_obs=next_obs,
            discount=discount,
            is_terminal=is_terminal,
            weight=jnp.ones_like(folded_reward),
            indices=ids,
            extras=extras,
        )

    def sample(
        self, state: ReplayState, rng: jax.Array, batch_size: int
    ) -> TransitionBatch:
        ids = self.sample_indices(state, rng, batch_size)
        return self.gather(state, ids)

    # Priority feedback is a no-op for the uniform buffer.
    def update_priorities(
        self, state: ReplayState, ids: jax.Array, priorities: jax.Array
    ) -> ReplayState:
        del ids, priorities
        return state

    # ------------------------------------------------------- storage split
    # The transition storage is orders of magnitude larger than the rest of
    # the state (GBs of uint8 frames vs scalars/trees). XLA cannot alias
    # large buffers through ``lax.cond``/``fori_loop`` carries whose branches
    # differ, so a carried ReplayState forces a full ring copy per step —
    # HBM-bandwidth death. The runner therefore carries only the *light*
    # state through gated/looped update control flow and closes over the
    # storage read-only (writes happen in ``add``, outside those regions).
    def split_storage(self, state):
        """-> (light_state, storage). Zero-cost pytree reshuffle."""
        return state.replace(storage=None), state.storage

    def merge_storage(self, light, storage):
        return light.replace(storage=storage)

    def __len__(self):
        raise TypeError("ReplayBuffer is stateless; use state.size")
