"""Policy protocol (reference parity: pfrl/policy.py:7-17).

A policy is any flax module / callable mapping observations to a
:class:`pfrl_tpu.distributions.Distribution`.
"""


class Policy:
    def __call__(self, state):
        raise NotImplementedError
