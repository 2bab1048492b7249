"""Host-side scalar reward filters (reference parity: pfrl/utils/reward_filter.py).

These are tiny exponential-moving-average transforms applied to scalar
rewards in host training loops (average-reward RL formulations). They hold
Python-float state, so they live host-side; on-device reward shaping should
instead be fused into the env wrapper stack (pfrl_tpu/envs/wrappers.py).
"""


class AverageRewardFilter:
    """Subtracts an exponential moving average of the reward.

    Reference: pfrl/utils/reward_filter.py:19-27.
    """

    def __init__(self, tau: float = 1e-3):
        self.tau = tau
        self.average_reward = 0.0

    def __call__(self, reward: float) -> float:
        self.average_reward += self.tau * (reward - self.average_reward)
        return reward - self.average_reward


class NormalizedRewardFilter:
    """Centers and scales the reward by EMA mean / clipped EMA stdev.

    Reference: pfrl/utils/reward_filter.py:1-16. Keeps the reference's
    quirk of clipping the *variance* at ``eps`` from above before the
    square root (it bounds the scale-up of small-variance streams).
    """

    def __init__(self, tau: float = 1e-3, scale: float = 1.0, eps: float = 1e-1):
        self.tau = tau
        self.scale = scale
        self.eps = eps
        self.average_reward = 0.0
        self.average_reward_squared = 0.0

    def __call__(self, reward: float) -> float:
        self.average_reward += self.tau * (reward - self.average_reward)
        self.average_reward_squared += self.tau * (
            reward**2 - self.average_reward_squared
        )
        var = self.average_reward_squared - self.average_reward**2
        stdev = min(var, self.eps) ** 0.5
        return self.scale * (reward - self.average_reward) / stdev
