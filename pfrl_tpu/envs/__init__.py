"""Environments: pure-JAX device envs + host vector-env utilities.

Reference parity: pfrl/envs/. The in-repo simulators (ABC, CartPole,
Pendulum, MountainCar) are re-implemented as pure-functional device envs so
the whole actor-learner loop can run under one jit.
"""

from pfrl_tpu.envs.abc import ABC
from pfrl_tpu.envs.atari_sim import AtariSim
from pfrl_tpu.envs.mujoco_sim import MujocoSim
from pfrl_tpu.envs.cartpole import CartPole
from pfrl_tpu.envs.delayed_cue import DelayedCue
from pfrl_tpu.envs.mountain_car import MountainCarContinuous
from pfrl_tpu.envs.pendulum import Pendulum
from pfrl_tpu.envs.gymnasium_env import GymnasiumEnv, make_gymnasium_env
from pfrl_tpu.envs.host_adapter import HostJaxEnv
from pfrl_tpu.envs.serial_vector_env import SerialVectorEnv
from pfrl_tpu.envs.multiprocess_vector_env import MultiprocessVectorEnv
from pfrl_tpu.envs.vector_jax_env import VectorJaxEnv
from pfrl_tpu.envs.wrappers import NormalizeActionSpace, TimeLimit

__all__ = [
    "ABC",
    "AtariSim",
    "MujocoSim",
    "GymnasiumEnv",
    "make_gymnasium_env",
    "HostJaxEnv",
    "CartPole",
    "DelayedCue",
    "MountainCarContinuous",
    "Pendulum",
    "SerialVectorEnv",
    "MultiprocessVectorEnv",
    "VectorJaxEnv",
    "NormalizeActionSpace",
    "TimeLimit",
]
