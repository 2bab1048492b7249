"""Agent interfaces.

Reference parity: pfrl/agent.py:9-200 (Agent, AttributeSavingMixin,
BatchAgent, AsyncAgent). The architecture inverts the reference's design:

- Every algorithm's math lives in a **functional core** — pure jitted
  functions ``init / act / update`` over explicit pytree state (see
  pfrl_tpu/agents/*). Cores plug directly into the fully-on-device training
  runner (pfrl_tpu/experiments/runner.py), which is the fast path.
- The classes here are the thin **host shell** wrapping a core + replay +
  explorer behind the reference's ``act/observe/save/load`` object protocol,
  so reference-style drivers, evaluators, and tests work unchanged. The
  shell's only job is boundary management: numpy in/out, host step counters,
  and python-side update gating (the reference's ReplayUpdater logic).

``AsyncAgent`` has no equivalent: the reference's CPU-async path
(A3C/ACER process pools) is replaced by synchronous batch training over
sharded env lanes (SURVEY.md §2.6) — see pfrl_tpu/parallel.
"""

import contextlib
import os
from typing import Any, Sequence

import jax
import numpy as np
from flax import serialization


class Agent:
    """Abstract agent (pfrl/agent.py:9-70)."""

    training = True

    def act(self, obs) -> Any:
        raise NotImplementedError

    def observe(self, obs, reward, done, reset) -> None:
        raise NotImplementedError

    def save(self, dirname: str) -> None:
        raise NotImplementedError

    def load(self, dirname: str) -> None:
        raise NotImplementedError

    def get_statistics(self) -> Sequence:
        return []

    @contextlib.contextmanager
    def eval_mode(self):
        orig = self.training
        self.training = False
        try:
            yield self
        finally:
            self.training = orig


class BatchAgent(Agent):
    """Agent that acts/observes over a batch of envs (pfrl/agent.py:157-200).

    Default single-env act/observe delegate to the batch interface with a
    batch of one, mirroring the reference.
    """

    def act(self, obs) -> Any:
        return self.batch_act(np.expand_dims(np.asarray(obs), 0))[0]

    def observe(self, obs, reward, done, reset) -> None:
        self.batch_observe(
            np.expand_dims(np.asarray(obs), 0),
            np.asarray([reward], dtype=np.float32),
            np.asarray([done]),
            np.asarray([reset]),
        )

    def batch_act(self, batch_obs) -> Any:
        raise NotImplementedError

    def batch_observe(self, batch_obs, batch_reward, batch_done, batch_reset) -> None:
        raise NotImplementedError


class AttributeSavingMixin:
    """Save/load ``saved_attributes`` pytrees (pfrl/agent.py:73-137).

    The reference writes torch state_dicts per attribute and recurses into
    nested agents; here each attribute is a device pytree serialized with
    flax msgpack. Nested objects exposing their own save/load get recursed
    into, matching agent.py:85-107.
    """

    saved_attributes: Sequence[str] = ()

    def save(self, dirname: str) -> None:
        os.makedirs(dirname, exist_ok=True)
        for attr in self.saved_attributes:
            value = getattr(self, attr)
            if hasattr(value, "save") and not isinstance(value, jax.Array):
                value.save(os.path.join(dirname, attr))
            else:
                path = os.path.join(dirname, f"{attr}.msgpack")
                with open(path, "wb") as f:
                    f.write(serialization.to_bytes(jax.device_get(value)))

    def load(self, dirname: str) -> None:
        for attr in self.saved_attributes:
            value = getattr(self, attr)
            if hasattr(value, "load") and not isinstance(value, jax.Array):
                value.load(os.path.join(dirname, attr))
            else:
                path = os.path.join(dirname, f"{attr}.msgpack")
                with open(path, "rb") as f:
                    data = f.read()
                if value is None:
                    # Lazily-initialized attribute (shells build train_state
                    # on first act/observe). Stash the bytes and apply after
                    # lazy init so the reference's construct -> load -> act
                    # flow works (pfrl agents can load right after
                    # construction because torch modules exist eagerly).
                    if not hasattr(self, "_pending_restores"):
                        self._pending_restores = {}
                    self._pending_restores[attr] = data
                else:
                    restored = serialization.from_bytes(
                        jax.device_get(value), data
                    )
                    setattr(self, attr, jax.device_put(restored))

    def _restore_pending(self) -> None:
        """Apply stashed loads once lazily-built attributes exist. Shells
        call this right after materializing ``train_state``."""
        pending = getattr(self, "_pending_restores", None)
        if not pending:
            return
        for attr in list(pending):
            value = getattr(self, attr)
            if value is not None:
                restored = serialization.from_bytes(
                    jax.device_get(value), pending.pop(attr)
                )
                setattr(self, attr, jax.device_put(restored))
