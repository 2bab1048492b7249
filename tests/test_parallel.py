"""Multi-chip (virtual 8-device mesh) tests for the SPMD training path."""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp


def _make(mesh=None, num_envs=16):
    from pfrl_tpu.agents import DQNCore
    from pfrl_tpu.envs import CartPole, TimeLimit
    from pfrl_tpu.experiments.runner import OffPolicyRunner, RunnerConfig
    from pfrl_tpu.explorers import LinearDecayEpsilonGreedy
    from pfrl_tpu.q_functions import FCStateQFunctionWithDiscreteAction
    from pfrl_tpu.replay import ReplayBuffer

    core = DQNCore(
        model=FCStateQFunctionWithDiscreteAction(
            n_actions=2, n_hidden_channels=32, n_hidden_layers=1
        ),
        optimizer=optax.adam(1e-3),
        explorer=LinearDecayEpsilonGreedy(1.0, 0.1, 1000, 2),
    )
    cfg = RunnerConfig(
        num_envs=num_envs,
        replay_start_size=num_envs,
        update_interval=num_envs,
        target_update_interval=4 * num_envs,
        minibatch_size=16,
    )
    runner = OffPolicyRunner(
        TimeLimit(CartPole()),
        core,
        ReplayBuffer(64 * 16, gamma=0.99, num_lanes=num_envs),
        cfg,
        mesh=mesh,
    )
    return runner


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)
class TestMeshRunner:
    def test_sharded_chunk_runs_and_params_replicated(self):
        from pfrl_tpu.parallel import make_mesh

        mesh = make_mesh(("dp",), (8,))
        runner = _make(mesh=mesh)
        state = runner.init(jax.random.PRNGKey(0))
        # Env-lane leaves are sharded over dp; params replicated.
        obs_shard = state.obs.sharding
        assert "dp" in str(obs_shard.spec) or obs_shard.spec != ()
        state, metrics = runner.run_chunk(state, 8)
        assert np.isfinite(np.asarray(metrics["reward_mean"])).all()
        assert int(state.t) == 8 * 16
        # Params stayed replicated after sharded updates.
        p = jax.tree.leaves(state.train_state.params)[0]
        assert p.sharding.is_fully_replicated

    def test_graft_dryrun(self):
        import __graft_entry__ as g

        g.dryrun_multichip(8)

    def test_graft_entry_compiles(self):
        import __graft_entry__ as g

        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (32, 6)
