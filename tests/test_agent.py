"""Agent base-class tests (reference: tests/test_agent.py).

AttributeSavingMixin recursion semantics, eval_mode context, and
BatchAgent's single-env delegation.
"""

import numpy as np

import jax.numpy as jnp

from pfrl_tpu.agent import Agent, AttributeSavingMixin, BatchAgent


class Leaf(AttributeSavingMixin):
    saved_attributes = ("state",)

    def __init__(self, value):
        self.state = {"w": jnp.asarray(value)}


class Parent(AttributeSavingMixin):
    """Nested object with its own save/load gets recursed into
    (reference agent.py:85-107)."""

    saved_attributes = ("state", "child")

    def __init__(self, value, child_value):
        self.state = {"w": jnp.asarray(value)}
        self.child = Leaf(child_value)


def test_mixin_saves_and_loads_pytrees(tmp_path):
    a = Leaf([1.0, 2.0])
    a.save(str(tmp_path / "ckpt"))
    b = Leaf([0.0, 0.0])
    b.load(str(tmp_path / "ckpt"))
    np.testing.assert_allclose(b.state["w"], [1.0, 2.0])


def test_mixin_recurses_into_nested_savers(tmp_path):
    a = Parent([1.0], [2.0])
    a.save(str(tmp_path / "ckpt"))
    # Child got its own subdirectory, like the reference's nested agents.
    assert (tmp_path / "ckpt" / "child" / "state.msgpack").exists()
    b = Parent([0.0], [0.0])
    b.load(str(tmp_path / "ckpt"))
    np.testing.assert_allclose(b.state["w"], [1.0])
    np.testing.assert_allclose(b.child.state["w"], [2.0])


def test_eval_mode_restores_training_flag():
    class A(Agent):
        def act(self, obs):
            return 0

        def observe(self, *args):
            pass

    a = A()
    assert a.training
    with a.eval_mode():
        assert not a.training
    assert a.training
    # Restores even on exception.
    try:
        with a.eval_mode():
            raise ValueError
    except ValueError:
        pass
    assert a.training


def test_batch_agent_single_env_delegation():
    calls = {}

    class B(BatchAgent):
        def batch_act(self, batch_obs):
            calls["act_shape"] = np.asarray(batch_obs).shape
            return np.asarray([7])

        def batch_observe(self, batch_obs, batch_reward, batch_done, batch_reset):
            calls["observe"] = (
                np.asarray(batch_obs).shape,
                batch_reward.tolist(),
                batch_done.tolist(),
                batch_reset.tolist(),
            )

    b = B()
    a = b.act(np.zeros(3))
    assert a == 7
    assert calls["act_shape"] == (1, 3)
    b.observe(np.zeros(3), 1.5, True, False)
    assert calls["observe"] == ((1, 3), [1.5], [True], [False])
