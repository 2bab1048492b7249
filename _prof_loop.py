import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import jax, jax.numpy as jnp, numpy as np, optax
import flax.linen as nn
from pfrl_tpu.agents import DQNCore
from pfrl_tpu.envs import AtariSim
from pfrl_tpu.experiments import OffPolicyRunner, RunnerConfig
from pfrl_tpu.explorers import LinearDecayEpsilonGreedy
from pfrl_tpu.models import LargeAtariCNN
from pfrl_tpu.q_functions import DiscreteActionValueHead
from pfrl_tpu.replay import ReplayBuffer

n_actions, num_envs = 6, 64
class NatureQ(nn.Module):
    @nn.compact
    def __call__(self, x):
        return DiscreteActionValueHead()(nn.Dense(n_actions)(LargeAtariCNN()(x)))

def run(replay_start):
    core = DQNCore(model=NatureQ(), optimizer=optax.rmsprop(2.5e-4, decay=0.95, eps=1e-2),
        explorer=LinearDecayEpsilonGreedy(1.0, 0.1, 1_000_000, n_actions),
        gamma=0.99, batch_accumulator="sum", phi=lambda x: x.astype(jnp.float32)/255.0)
    cfg = RunnerConfig(num_envs=num_envs, replay_start_size=replay_start,
        update_interval=4, target_update_interval=10_000, minibatch_size=32)
    runner = OffPolicyRunner(AtariSim(n_actions=n_actions), core,
        ReplayBuffer(100_000, gamma=0.99, num_lanes=num_envs, store_next_obs=False), cfg)
    state = runner.init(jax.random.PRNGKey(0))
    state, m = runner.run_chunk(state, 200)
    float(np.asarray(m["loss"][-1]))
    t0 = time.time()
    for _ in range(5):
        state, m = runner.run_chunk(state, 200)
    float(np.asarray(m["loss"][-1]))
    el = time.time() - t0
    return 5*200*num_envs/el

print("with updates:    %.0f steps/s" % run(2_000))
print("updates disabled:%.0f steps/s" % run(10**9))
