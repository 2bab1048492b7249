"""Mixed-precision (bf16 compute / fp32 masters) tests.

TPU-native addition (no reference counterpart — pfrl trains fp32): the
DQN-family cores accept ``compute_dtype=jnp.bfloat16``, casting params and
activations at the model-apply boundary while params, optimizer state, and
TD/loss math stay float32 (pfrl_tpu/utils/precision.py).
"""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from pfrl_tpu.utils.precision import cast_floating, cast_to_float32


def test_cast_helpers_touch_only_floats():
    tree = {
        "w": jnp.ones((4, 4), jnp.float32),
        "frames": jnp.ones((2,), jnp.uint8),
        "n": jnp.ones((), jnp.int32),
    }
    lo = cast_floating(tree, jnp.bfloat16)
    assert lo["w"].dtype == jnp.bfloat16
    assert lo["frames"].dtype == jnp.uint8
    assert lo["n"].dtype == jnp.int32
    hi = cast_to_float32(lo)
    assert hi["w"].dtype == jnp.float32
    assert cast_floating(tree, None) is tree


def _dqn_core(compute_dtype=None):
    from pfrl_tpu.agents import DQNCore
    from pfrl_tpu.explorers import ConstantEpsilonGreedy
    from pfrl_tpu.q_functions import FCStateQFunctionWithDiscreteAction

    return DQNCore(
        model=FCStateQFunctionWithDiscreteAction(
            n_actions=2, n_hidden_channels=64, n_hidden_layers=2
        ),
        optimizer=optax.adam(5e-3),
        explorer=ConstantEpsilonGreedy(0.1, 2),
        gamma=0.9,
        compute_dtype=compute_dtype,
    )


def test_bf16_forward_parity_and_fp32_output():
    """bf16 forward agrees with fp32 to bf16 tolerance; Q-values come back
    fp32 so TD/loss math stays full precision."""
    fp32 = _dqn_core(None)
    bf16 = _dqn_core(jnp.bfloat16)
    obs = jax.random.normal(jax.random.PRNGKey(1), (8, 5))
    state = fp32.init(jax.random.PRNGKey(0), obs)
    q_fp32 = fp32.action_value(state.params, jax.random.PRNGKey(2), obs).q_values
    q_bf16 = bf16.action_value(state.params, jax.random.PRNGKey(2), obs).q_values
    assert q_bf16.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(q_fp32), np.asarray(q_bf16), rtol=3e-2, atol=3e-2
    )


def test_bf16_masters_stay_fp32_after_update():
    from pfrl_tpu.replay.transition import TransitionBatch

    core = _dqn_core(jnp.bfloat16)
    obs = jax.random.normal(jax.random.PRNGKey(1), (8, 5))
    state = core.init(jax.random.PRNGKey(0), obs)
    batch = TransitionBatch(
        obs=obs,
        action=jnp.zeros((8,), jnp.int32),
        reward=jnp.ones((8,), jnp.float32),
        next_obs=obs + 0.1,
        discount=jnp.full((8,), 0.9),
        is_terminal=jnp.zeros((8,), bool),
        weight=jnp.ones((8,), jnp.float32),
        indices=jnp.arange(8),
    )
    new_state, aux = core.update(state, jax.random.PRNGKey(3), batch)
    for leaf in jax.tree.leaves(new_state.params):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree.leaves(new_state.opt_state):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32
    assert np.isfinite(float(aux["loss"]))
    # The update moved the params (the bf16 cast did not detach grads).
    moved = any(
        float(jnp.max(jnp.abs(a - b))) > 0
        for a, b in zip(
            jax.tree.leaves(state.params), jax.tree.leaves(new_state.params)
        )
    )
    assert moved


def test_bf16_dqn_learns_abc():
    """Curve-parity gate: DQN with bf16 compute solves the deterministic
    ABC chain exactly like the fp32 matrix entry."""
    from pfrl_tpu.envs import ABC
    from pfrl_tpu.experiments.runner import (
        JaxEvalLoop,
        OffPolicyRunner,
        RunnerConfig,
    )
    from pfrl_tpu.replay import ReplayBuffer

    env = ABC(size=2, deterministic=True)
    core = _dqn_core(jnp.bfloat16)
    runner = OffPolicyRunner(
        env,
        core,
        ReplayBuffer(2000, gamma=0.9, num_lanes=16),
        RunnerConfig(
            num_envs=16,
            replay_start_size=128,
            update_interval=16,
            target_update_interval=128,
            minibatch_size=16,
        ),
    )
    state = runner.init(jax.random.PRNGKey(0))
    state, _ = runner.run_chunk(state, 400)
    evaluator = JaxEvalLoop(env, core, num_episodes=8, max_steps=3)
    returns = evaluator.evaluate(state.train_state, jax.random.PRNGKey(1))
    assert np.all(returns >= 1.0), returns


def test_bf16_recurrent_dqn_learns_delayed_cue():
    """The recurrent unrolls honor compute_dtype too: bf16 DRQN still
    solves DelayedCue through random-offset subsequence replay (stored
    carries stay fp32)."""
    import flax.linen as nn

    from pfrl_tpu.action_value import DiscreteActionValue
    from pfrl_tpu.agents.recurrent_dqn import RecurrentDQNCore
    from pfrl_tpu.envs import DelayedCue
    from pfrl_tpu.experiments.runner import (
        JaxEvalLoop,
        OffPolicyRunner,
        RunnerConfig,
    )
    from pfrl_tpu.explorers import ConstantEpsilonGreedy
    from pfrl_tpu.models.recurrent import LSTMCellModule
    from pfrl_tpu.replay.episodic import EpisodicReplayBuffer

    class RQ(nn.Module):
        @nn.compact
        def __call__(self, x, carry):
            h = nn.relu(nn.Dense(32)(x))
            h, new_carry = LSTMCellModule(32)(h, carry[0])
            q = nn.Dense(2)(h)
            return DiscreteActionValue(q_values=q), (new_carry,)

        def initial_carry(self, batch_size):
            return (
                (
                    jnp.zeros((batch_size, 32), jnp.float32),
                    jnp.zeros((batch_size, 32), jnp.float32),
                ),
            )

    env = DelayedCue(episode_len=12, reveal_step=8)
    core = RecurrentDQNCore(
        model=RQ(),
        optimizer=optax.adam(5e-3),
        explorer=ConstantEpsilonGreedy(0.2, 2),
        gamma=0.95,
        compute_dtype=jnp.bfloat16,
    )
    runner = OffPolicyRunner(
        env,
        core,
        EpisodicReplayBuffer(
            max_episodes=256, max_episode_len=12, num_lanes=16, subseq_len=4
        ),
        RunnerConfig(
            num_envs=16,
            replay_start_size=256,
            update_interval=8,
            target_update_interval=256,
            minibatch_size=32,
        ),
    )
    state = runner.init(jax.random.PRNGKey(3))
    # Stored carry snapshots must stay fp32 regardless of compute dtype.
    for leaf in jax.tree.leaves(
        state.replay_state.storage.extras["carry"]
    ):
        assert leaf.dtype == jnp.float32
    state, _ = runner.run_chunk(state, 500)
    evaluator = JaxEvalLoop(env, core, num_episodes=32, max_steps=12)
    returns = evaluator.evaluate(state.train_state, jax.random.PRNGKey(5))
    assert np.mean(returns) >= 0.9, returns


def _sac_core(compute_dtype=None):
    from pfrl_tpu.agents.soft_actor_critic import SACCore
    from pfrl_tpu.models import MLP
    from pfrl_tpu.policies import SquashedGaussianHead
    from pfrl_tpu.q_functions import FCSAQFunction

    class SacPolicy(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = MLP(out_size=4, hidden_sizes=(32,))(x)
            return SquashedGaussianHead(action_size=2)(h)

    return SACCore(
        policy=SacPolicy(),
        q_func1=FCSAQFunction(n_hidden_channels=32, n_hidden_layers=1),
        q_func2=FCSAQFunction(n_hidden_channels=32, n_hidden_layers=1),
        policy_optimizer=optax.adam(1e-2),
        q_func1_optimizer=optax.adam(1e-2),
        q_func2_optimizer=optax.adam(1e-2),
        gamma=0.9,
        entropy_target=-2.0,
        compute_dtype=compute_dtype,
    )


def _td3_core(compute_dtype=None):
    from pfrl_tpu.agents.td3 import TD3Core
    from pfrl_tpu.explorers import AdditiveGaussian
    from pfrl_tpu.models import MLP
    from pfrl_tpu.policies import DeterministicHead
    from pfrl_tpu.q_functions import FCSAQFunction

    class DetPolicy(nn.Module):
        @nn.compact
        def __call__(self, x):
            return DeterministicHead()(
                jnp.tanh(MLP(out_size=2, hidden_sizes=(32,))(x))
            )

    return TD3Core(
        policy=DetPolicy(),
        q_func1=FCSAQFunction(n_hidden_channels=32, n_hidden_layers=1),
        q_func2=FCSAQFunction(n_hidden_channels=32, n_hidden_layers=1),
        policy_optimizer=optax.adam(1e-3),
        q_func1_optimizer=optax.adam(1e-2),
        q_func2_optimizer=optax.adam(1e-2),
        explorer=AdditiveGaussian(0.3, low=-1.0, high=1.0),
        gamma=0.9,
        compute_dtype=compute_dtype,
    )


def _ddpg_core(compute_dtype=None):
    from pfrl_tpu.agents.ddpg import DDPGCore
    from pfrl_tpu.explorers import AdditiveGaussian
    from pfrl_tpu.models import MLP
    from pfrl_tpu.policies import DeterministicHead
    from pfrl_tpu.q_functions import FCSAQFunction

    class DetPolicy(nn.Module):
        @nn.compact
        def __call__(self, x):
            return DeterministicHead()(
                jnp.tanh(MLP(out_size=2, hidden_sizes=(32,))(x))
            )

    return DDPGCore(
        policy=DetPolicy(),
        q_func=FCSAQFunction(n_hidden_channels=32, n_hidden_layers=1),
        policy_optimizer=optax.adam(1e-2),
        q_optimizer=optax.adam(1e-2),
        explorer=AdditiveGaussian(0.3, low=-1.0, high=1.0),
        gamma=0.9,
        compute_dtype=compute_dtype,
    )


@pytest.mark.parametrize(
    "factory", [_sac_core, _td3_core, _ddpg_core], ids=["sac", "td3", "ddpg"]
)
def test_bf16_actor_critic_forward_parity(factory):
    """Actor-critic cores honor compute_dtype: bf16 eval-mode actions match
    fp32's to bf16 tolerance on the SAME fp32 master params, and come back
    float32."""
    fp32, bf16 = factory(None), factory(jnp.bfloat16)
    obs = jax.random.normal(jax.random.PRNGKey(1), (8, 5))
    act = jnp.zeros((8, 2), jnp.float32)
    state = fp32.init(jax.random.PRNGKey(0), obs, act)
    bf16.init(jax.random.PRNGKey(0), obs, act)  # sets _twin_fused
    t = jnp.zeros((), jnp.int32)
    a32 = fp32.select_action(state, jax.random.PRNGKey(2), obs, t, False)
    a16 = bf16.select_action(state, jax.random.PRNGKey(2), obs, t, False)
    assert a16.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(a32), np.asarray(a16), rtol=3e-2, atol=3e-2
    )


@pytest.mark.parametrize(
    "factory", [_sac_core, _td3_core, _ddpg_core], ids=["sac", "td3", "ddpg"]
)
def test_bf16_actor_critic_masters_stay_fp32(factory):
    """One bf16 update step: every param/optimizer leaf stays float32 and
    the critics actually move (the twin-fused stacked apply keeps grads
    flowing through the down-cast)."""
    from pfrl_tpu.replay.transition import TransitionBatch

    core = factory(jnp.bfloat16)
    obs = jax.random.normal(jax.random.PRNGKey(1), (8, 5))
    act = jax.random.uniform(
        jax.random.PRNGKey(4), (8, 2), minval=-1.0, maxval=1.0
    )
    state = core.init(jax.random.PRNGKey(0), obs, act)
    batch = TransitionBatch(
        obs=obs,
        action=act,
        reward=jnp.ones((8,), jnp.float32),
        next_obs=obs + 0.1,
        discount=jnp.full((8,), 0.9),
        is_terminal=jnp.zeros((8,), bool),
        weight=jnp.ones((8,), jnp.float32),
        indices=jnp.arange(8),
    )
    new_state, aux = core.update(state, jax.random.PRNGKey(3), batch)
    for leaf in jax.tree.leaves(new_state):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32
    assert np.isfinite(float(aux["loss"]))
    moved = any(
        float(jnp.max(jnp.abs(a - b))) > 0
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(new_state))
        if jnp.issubdtype(a.dtype, jnp.floating)
    )
    assert moved


def test_bf16_sac_learns_continuous_abc():
    """Curve-parity gate for the actor-critic family: SAC with bf16 compute
    still solves the continuous ABC chain (same config as the fp32 matrix
    entry in tests/agents_tests/test_continuous.py)."""
    from pfrl_tpu.replay import ReplayBuffer
    from tests.agents_tests.basetest_training import (
        assert_optimal,
        train_core_on_abc,
    )
    from tests.agents_tests.test_continuous import (
        _BURNIN_STEPS,
        _sac_factory,
    )

    def factory(env):
        core = _sac_factory(env)
        core.compute_dtype = jnp.bfloat16
        return core

    _, _, returns = train_core_on_abc(
        factory,
        lambda lanes: ReplayBuffer(4096, gamma=0.9, num_lanes=lanes),
        discrete=False,
        size=2,
        steps=800,
        replay_start_size=_BURNIN_STEPS,
    )
    assert_optimal(returns)


def test_bf16_ppo_learns_abc():
    """On-policy family honors compute_dtype: bf16 PPO solves ABC on the
    on-device runner (log-prob ratios and GAE stay fp32)."""
    from pfrl_tpu.agents.ppo import PPOCore
    from pfrl_tpu.envs import ABC
    from pfrl_tpu.experiments.onpolicy_runner import OnPolicyRunner
    from pfrl_tpu.experiments.runner import JaxEvalLoop
    from pfrl_tpu.policies import SoftmaxCategoricalHead

    class PiV(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.tanh(nn.Dense(32)(x))
            return (
                SoftmaxCategoricalHead()(nn.Dense(2)(h)),
                nn.Dense(1)(h),
            )

    env = ABC(size=2, deterministic=True)
    core = PPOCore(
        PiV(),
        optax.adam(5e-3),
        gamma=0.9,
        epochs=4,
        minibatch_size=16,
        compute_dtype=jnp.bfloat16,
    )
    runner = OnPolicyRunner(env, core, num_envs=16, rollout_len=16)
    state = runner.init(jax.random.PRNGKey(0))
    state, _ = runner.run_iterations(state, 40)
    evaluator = JaxEvalLoop(env, core, num_episodes=8, max_steps=3)
    returns = evaluator.evaluate(state.train_state, jax.random.PRNGKey(1))
    assert np.all(returns >= 1.0), returns


def test_bf16_recurrent_ppo_learns_delayed_cue():
    """RecurrentPPOCore honors compute_dtype through the collection
    forward AND the chunked TBPTT update scan: bf16 still solves
    DelayedCue; carries stay fp32 end-to-end."""
    from pfrl_tpu.agents import RecurrentPPOCore
    from pfrl_tpu.envs import DelayedCue
    from pfrl_tpu.experiments.onpolicy_runner import OnPolicyRunner
    from pfrl_tpu.experiments.runner import JaxEvalLoop
    from pfrl_tpu.models.recurrent import LSTMCellModule
    from pfrl_tpu.policies import SoftmaxCategoricalHead

    class RPiV(nn.Module):
        @nn.compact
        def __call__(self, x, carry):
            h = nn.relu(nn.Dense(32)(x))
            h, new_carry = LSTMCellModule(32)(h, carry[0])
            dist = SoftmaxCategoricalHead()(nn.Dense(2)(h))
            v = nn.Dense(1)(h)
            return (dist, v), (new_carry,)

        def initial_carry(self, batch_size):
            return (
                (
                    jnp.zeros((batch_size, 32), jnp.float32),
                    jnp.zeros((batch_size, 32), jnp.float32),
                ),
            )

    env = DelayedCue(episode_len=12, reveal_step=8)
    core = RecurrentPPOCore(
        RPiV(),
        optax.adam(5e-3),
        gamma=0.95,
        epochs=4,
        minibatch_size=16,
        entropy_coef=1e-2,
        chunk_len=4,
        compute_dtype=jnp.bfloat16,
    )
    runner = OnPolicyRunner(env, core, num_envs=16, rollout_len=24)
    state = runner.init(jax.random.PRNGKey(0))
    # The act-path carry must stay fp32 under bf16 compute.
    _, aux, carry = core.act_with_aux_recurrent(
        state.train_state,
        jax.random.PRNGKey(7),
        jnp.zeros((16, 13)),
        True,
        core.initial_carry(16),
    )
    assert aux["value"].dtype == jnp.float32
    for leaf in jax.tree.leaves(carry):
        assert leaf.dtype == jnp.float32
    state, _ = runner.run_iterations(state, 30)
    evaluator = JaxEvalLoop(env, core, num_episodes=32, max_steps=12)
    returns = evaluator.evaluate(state.train_state, jax.random.PRNGKey(1))
    assert np.mean(returns) >= 0.9, returns


def test_bf16_a2c_and_reinforce_forward_parity():
    """The remaining on-policy cores honor compute_dtype (A2C inherits
    PPOCore.forward; REINFORCE casts at its own apply sites). TRPO stays
    deliberately fp32 — its FVP/CG second-order math is precision
    sensitive."""
    from pfrl_tpu.agents.a2c import A2CCore
    from pfrl_tpu.agents.reinforce import ReinforceCore
    from pfrl_tpu.policies import SoftmaxCategoricalHead

    class PiV(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.tanh(nn.Dense(32)(x))
            return SoftmaxCategoricalHead()(nn.Dense(2)(h)), nn.Dense(1)(h)

    class Pi(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.tanh(nn.Dense(32)(x))
            return SoftmaxCategoricalHead()(nn.Dense(2)(h))

    obs = jax.random.normal(jax.random.PRNGKey(1), (8, 5))

    a32 = A2CCore(PiV(), optax.adam(1e-3))
    a16 = A2CCore(PiV(), optax.adam(1e-3), compute_dtype=jnp.bfloat16)
    st = a32.init(jax.random.PRNGKey(0), obs)
    d32, v32 = a32.forward(st.params, obs)
    d16, v16 = a16.forward(st.params, obs)
    assert v16.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(d32.probs), np.asarray(d16.probs), rtol=3e-2, atol=3e-2
    )

    r32 = ReinforceCore(Pi(), optax.adam(1e-3))
    r16 = ReinforceCore(Pi(), optax.adam(1e-3), compute_dtype=jnp.bfloat16)
    st = r32.init(jax.random.PRNGKey(0), obs)
    k = jax.random.PRNGKey(2)
    act32 = r32.select_action(st, k, obs, jnp.zeros((), jnp.int32), False)
    act16 = r16.select_action(st, k, obs, jnp.zeros((), jnp.int32), False)
    np.testing.assert_array_equal(np.asarray(act32), np.asarray(act16))


def test_bf16_c51_learns_abc():
    """Distributional cores inherit the cast boundary from
    DQNCore.action_value: C51 with bf16 compute still solves ABC (the
    categorical projection runs on fp32-cast atoms)."""
    from pfrl_tpu.agents.categorical_dqn import CategoricalDQNCore
    from pfrl_tpu.envs import ABC
    from pfrl_tpu.experiments.runner import (
        JaxEvalLoop,
        OffPolicyRunner,
        RunnerConfig,
    )
    from pfrl_tpu.explorers import ConstantEpsilonGreedy
    from pfrl_tpu.q_functions import (
        DistributionalFCStateQFunctionWithDiscreteAction,
    )
    from pfrl_tpu.replay import ReplayBuffer

    env = ABC(size=2, deterministic=True)
    core = CategoricalDQNCore(
        model=DistributionalFCStateQFunctionWithDiscreteAction(
            n_actions=2, n_atoms=51, v_min=0.0, v_max=1.0,
            n_hidden_channels=64, n_hidden_layers=2,
        ),
        optimizer=optax.adam(5e-3),
        explorer=ConstantEpsilonGreedy(0.1, 2),
        gamma=0.9,
        compute_dtype=jnp.bfloat16,
    )
    runner = OffPolicyRunner(
        env,
        core,
        ReplayBuffer(2000, gamma=0.9, num_lanes=16),
        RunnerConfig(
            num_envs=16,
            replay_start_size=128,
            update_interval=16,
            target_update_interval=128,
            minibatch_size=16,
        ),
    )
    state = runner.init(jax.random.PRNGKey(0))
    state, _ = runner.run_chunk(state, 400)
    evaluator = JaxEvalLoop(env, core, num_episodes=8, max_steps=3)
    returns = evaluator.evaluate(state.train_state, jax.random.PRNGKey(1))
    assert np.all(returns >= 1.0), returns


def test_bf16_acer_learns_abc():
    """ACER with bf16 network compute (round 5: compute_dtype added to
    ACERCore) still solves episodic ABC — the Retrace recursion and
    trust-region KL stay fp32 behind the cast boundary."""
    from pfrl_tpu.action_value import DiscreteActionValue
    from pfrl_tpu.agents.acer import ACERCore
    from pfrl_tpu.distributions import Categorical
    from pfrl_tpu.envs import ABC
    from pfrl_tpu.experiments.runner import (
        JaxEvalLoop,
        OffPolicyRunner,
        RunnerConfig,
    )
    from pfrl_tpu.replay.episodic import EpisodicReplayBuffer

    class PiQ(nn.Module):
        n_actions: int = 2

        @nn.compact
        def __call__(self, x):
            h = nn.relu(nn.Dense(32)(x))
            return (
                Categorical(logits=nn.Dense(self.n_actions)(h)),
                DiscreteActionValue(q_values=nn.Dense(self.n_actions)(h)),
            )

    env = ABC(size=2, episodic=True, deterministic=True)
    core = ACERCore(
        model=PiQ(),
        optimizer=optax.adam(5e-3),
        gamma=0.9,
        beta=1e-2,
        compute_dtype=jnp.bfloat16,
    )
    runner = OffPolicyRunner(
        env,
        core,
        EpisodicReplayBuffer(max_episodes=512, max_episode_len=4, num_lanes=16),
        RunnerConfig(
            num_envs=16,
            replay_start_size=128,
            update_interval=16,
            target_update_interval=10**9,
            minibatch_size=16,
        ),
    )
    state = runner.init(jax.random.PRNGKey(0))
    state, _ = runner.run_chunk(state, 500)
    returns = JaxEvalLoop(env, core, num_episodes=5, max_steps=4).evaluate(
        state.train_state, jax.random.PRNGKey(1)
    )
    assert np.all(returns >= 1.0), returns
    # masters stayed fp32
    for leaf in jax.tree.leaves(state.train_state.params):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32
