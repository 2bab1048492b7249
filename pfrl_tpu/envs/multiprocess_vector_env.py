"""Subprocess-per-env host vector env.

Reference parity: pfrl/envs/multiprocess_vector_env.py:11-141 (same pipe
protocol: step/reset/close/get_spaces/seed, masked reset keeps the last
observation for still-running envs). On the TPU stack this only exists to
feed *external* simulators (Atari/MuJoCo) into the batched driver; pure-JAX
envs use :class:`pfrl_tpu.envs.vector_jax_env.VectorJaxEnv` and never leave
the device.
"""

import multiprocessing as mp
from multiprocessing.connection import Connection

import numpy as np

from pfrl_tpu.env import VectorEnv


def _worker(remote: Connection, env_fn_bytes: bytes) -> None:
    # Lazy import: cloudpickle is only needed when this subprocess path is
    # actually used — pure-JAX env users shouldn't fail at envs.__init__.
    import cloudpickle

    env = cloudpickle.loads(env_fn_bytes)()
    try:
        while True:
            cmd, data = remote.recv()
            if cmd == "step":
                ob, reward, done, info = env.step(data)
                remote.send((ob, reward, done, info))
            elif cmd == "reset":
                ob = env.reset()
                remote.send(ob)
            elif cmd == "close":
                remote.close()
                break
            elif cmd == "get_spaces":
                remote.send((env.action_space, env.observation_space))
            elif cmd == "seed":
                if hasattr(env, "seed"):
                    remote.send(env.seed(data))
                else:
                    remote.send(None)
            else:
                raise NotImplementedError(cmd)
    finally:
        env.close()


class MultiprocessVectorEnv(VectorEnv):
    def __init__(self, env_fns):
        import cloudpickle
        nenvs = len(env_fns)
        # forkserver, NOT fork: this env is built AFTER jax import in every
        # real program, and forking a multithreaded process (jax runtime
        # threads) is a deadlock class on TPU hosts. The forkserver daemon
        # never touches jax, so workers start from a clean single-threaded
        # image. Factories ship as cloudpickle bytes so lambdas/closures
        # keep working as they did under fork.
        ctx = mp.get_context("forkserver")
        try:
            # Pre-import the package once in the forkserver daemon: workers
            # then fork from a warm image that has imported (but never
            # initialized) jax — no threads exist in the daemon, so the
            # fork stays safe and worker startup drops from seconds to ms.
            ctx.set_forkserver_preload(["pfrl_tpu.envs.multiprocess_vector_env"])
        except Exception:
            pass
        self.remotes, self.work_remotes = zip(*[ctx.Pipe() for _ in range(nenvs)])
        self.ps = [
            ctx.Process(
                target=_worker,
                args=(work_remote, cloudpickle.dumps(env_fn)),
                daemon=True,
            )
            for (work_remote, env_fn) in zip(self.work_remotes, env_fns)
        ]
        for p in self.ps:
            p.start()
        self.last_obs = [None] * nenvs
        self.remotes[0].send(("get_spaces", None))
        self.action_space, self.observation_space = self.remotes[0].recv()
        self.closed = False

    def __del__(self):
        if not self.closed:
            self.close()

    @property
    def num_envs(self) -> int:
        return len(self.remotes)

    # -------------------------------------------------------- pipe round trip
    def _roundtrip(self, cmd, payloads=None, lanes=None):
        """Broadcast ``(cmd, payload)`` to the selected lanes, then collect
        one reply per lane (same wire protocol as the reference's worker,
        multiprocess_vector_env.py:11-36)."""
        assert not self.closed, "This env is already closed"
        picked = range(self.num_envs) if lanes is None else lanes
        for i in picked:
            self.remotes[i].send(
                (cmd, None if payloads is None else payloads[i])
            )
        return {i: self.remotes[i].recv() for i in picked}

    def step(self, actions):
        replies = self._roundtrip("step", list(actions))
        obss, rews, dones, infos = zip(
            *[replies[i] for i in range(self.num_envs)]
        )
        self.last_obs = list(obss)
        return (
            obss,
            np.asarray(rews, dtype=np.float32),
            np.asarray(dones, dtype=bool),
            infos,
        )

    def reset(self, mask=None):
        # mask semantics: True = lane still running, keep its last obs
        # (reference masked reset, multiprocess_vector_env.py:89-102).
        if mask is None:
            mask = np.zeros(self.num_envs, dtype=bool)
        fresh = self._roundtrip(
            "reset", lanes=[i for i in range(self.num_envs) if not mask[i]]
        )
        self.last_obs = [
            fresh.get(i, self.last_obs[i]) for i in range(self.num_envs)
        ]
        return list(self.last_obs)

    def seed(self, seeds=None):
        if seeds is None:
            seeds = [None] * self.num_envs
        elif np.isscalar(seeds):
            seeds = [seeds] * self.num_envs
        else:
            seeds = list(seeds)  # accepts any per-env sequence incl. ndarray
        replies = self._roundtrip("seed", seeds)
        return [replies[i] for i in range(self.num_envs)]

    def close(self):
        assert not self.closed, "This env is already closed"
        self.closed = True
        for remote in self.remotes:
            remote.send(("close", None))
        for p in self.ps:
            p.join()
