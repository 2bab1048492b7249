"""Device-resident Atari actor-learner pipeline (process actors over shm).

TPU-native replacement for the reference's actor-learner mode
(pfrl/agents/dqn.py:604-788 + pfrl/agents/state_q_function_actor.py:15-133).
The reference ships full observations over pipes and keeps a CPU model copy
per actor; a faithful port is host-bound. This pipeline inverts every
leg of that design around the two measured walls of a real host->TPU link
(H2D bandwidth and the Python GIL):

- **Actors are spawned processes**, not threads: env stepping and the C++
  frame preprocessing never contend with the learner/server for the GIL.
  Data rides ``multiprocessing.shared_memory``; pipes carry only tiny
  slot-index tokens (credit-based flow control over an R-slot ring).
- **Only the newest 84x84 uint8 plane crosses the wire per transition**
  (~7 KB). Frame *stacking* happens on device: a per-lane rolling stack
  array is updated inside the act dispatch. This is ~16x less H2D than
  shipping [84,84,4] stacks for act and again for replay.
- **The act dispatch IS the replay writer**: the same jitted call that
  advances the stack and picks actions also stages the plane + action
  into the device replay ring. The poller commits only rewards/flags
  (a few bytes per lane) once the env step completes. The replay ring
  stores single planes; sample-time gathers reconstruct 4-stacks from
  lane-strided predecessor rows (masked at episode boundaries with
  repeat-oldest semantics, matching host FrameStack-after-reset).
- **The learner runs burst updates**: N sample+update steps fused into
  one donated dispatch (cf. experiments/runner.py:_maybe_update), so
  per-update host/tunnel latency is amortized N-fold and reading the
  loss syncs once per burst, not per update.

Wire protocol (per worker, per vector step): worker writes plane+prev_done
into shm slot s, sends ("req", s); server act-stages, writes actions into
shm, replies ("act", s); worker steps its K envs, writes rewards/flags,
sends ("trans", s); the committer drains full rows across workers, commits
them, and returns ("free", s) credits.
"""

import logging
import queue
import threading
import time
from multiprocessing import get_context
from multiprocessing import connection as mp_connection
from multiprocessing import shared_memory
from typing import Callable, Optional

import numpy as np

try:  # worker processes import this module too; keep jax lazy-friendly
    import jax
    import jax.numpy as jnp
    from flax import struct
    from flax.core import FrozenDict
except Exception:  # pragma: no cover - workers that never touch jax
    jax = None

if jax is not None:
    from pfrl_tpu.replay.transition import TransitionBatch

    @struct.dataclass
    class PlaneRing:
        """Lane-interleaved device replay ring of single frame planes.

        Row ``r`` is lane ``r % L`` at vector-step ``r // L``; the temporal
        successor of row ``r`` is ``r + L`` (same layout contract as
        replay/uniform.py). ``commit_cursor`` counts fully committed rows;
        planes/actions ahead of it are staged by in-flight act calls.
        """

        planes: jax.Array      # [cap, H*W] uint8
        action: jax.Array      # [cap] int32
        reward: jax.Array      # [cap] float32
        terminated: jax.Array  # [cap] bool
        done: jax.Array        # [cap] bool
        commit_cursor: jax.Array  # [] int32, monotonic


class _WorkerChannel:
    """Main-process handle to one actor process: shm views + pipe."""

    def __init__(self, ctx, worker_id, lanes, slots, hw):
        self.worker_id = worker_id
        self.lanes = lanes
        self.slots = slots
        K, R, HW = lanes, slots, hw[0] * hw[1]
        sizes = {
            "planes": R * K * HW,          # u8
            "prev_done": R * K,            # u8
            "act": R * K * 4,              # i32
            "rew": R * K * 4,              # f32
            "term": R * K,                 # u8
            "done": R * K,                 # u8
        }
        self.shm = shared_memory.SharedMemory(
            create=True, size=sum(sizes.values())
        )
        self.views = _shm_views(self.shm.buf, K, R, hw)
        self.conn, self.child_conn = ctx.Pipe(duplex=True)
        self.send_lock = threading.Lock()
        self.step = 0            # vector steps acted so far (server side)

    def send(self, msg):
        with self.send_lock:
            self.conn.send(msg)

    def close(self):
        try:
            self.conn.close()
        except OSError:
            pass
        # Drop the numpy views before closing: frombuffer arrays hold
        # exported pointers into the mapping.
        self.views = None
        try:
            self.shm.close()
        except BufferError:
            # A worker/thread torn down uncleanly may still pin a view;
            # unlink below still reclaims the segment at process exit.
            pass
        try:
            self.shm.unlink()
        except FileNotFoundError:
            pass


def _shm_views(buf, K, R, hw):
    """Map the packed shm block to named np arrays (same math both sides)."""
    HW = hw[0] * hw[1]
    out = {}
    off = 0

    def take(name, shape, dtype):
        nonlocal off
        n = int(np.prod(shape)) * np.dtype(dtype).itemsize
        out[name] = np.frombuffer(buf, dtype, count=int(np.prod(shape)), offset=off).reshape(shape)
        off += n

    take("planes", (R, K, HW), np.uint8)
    take("prev_done", (R, K), np.uint8)
    take("act", (R, K), np.int32)
    take("rew", (R, K), np.float32)
    take("term", (R, K), np.uint8)
    take("done", (R, K), np.uint8)
    return out


def _env_worker(child_conn, shm_name, K, R, hw, env_factory, seed0):
    """Actor process: step K envs, move data via shm, tokens via pipe."""
    envs, shm = [], None  # bound before the try: an early SharedMemory or
    #                       env_factory failure must surface, not be masked
    #                       by a NameError in the finally cleanup
    try:
        from multiprocessing import resource_tracker

        shm = shared_memory.SharedMemory(name=shm_name)
        try:  # attached, not owned: the main process unlinks
            resource_tracker.unregister(shm._name, "shared_memory")
        except Exception:
            pass
        v = _shm_views(shm.buf, K, R, hw)
        envs = []
        for j in range(K):
            envs.append(env_factory(seed0 + j))
        obs = [e.reset() for e in envs]
        free = R
        slot = 0
        prev_done = np.ones(K, np.uint8)  # first plane is a reset frame

        def pump_one():
            """Process exactly one message; return it unless consumed."""
            nonlocal free
            msg = child_conn.recv()
            if msg[0] == "stop":
                raise SystemExit
            if msg[0] == "free":
                free += 1
                return None
            return msg

        def recv_until(kind, slot_wanted):
            while True:
                msg = pump_one()
                if msg and msg[0] == kind and msg[1] == slot_wanted:
                    return msg

        while True:
            # Occupy `slot` (guaranteed free), publish plane + reset flags.
            free -= 1
            planes = v["planes"][slot]
            for j, o in enumerate(obs):
                planes[j] = np.asarray(o, np.uint8).reshape(-1)
            v["prev_done"][slot] = prev_done
            child_conn.send(("req", slot))
            recv_until("act", slot)
            actions = v["act"][slot]
            rew, term, done = v["rew"][slot], v["term"][slot], v["done"][slot]
            nxt = []
            for j, e in enumerate(envs):
                o2, r, d, info = e.step(int(actions[j]))
                reset = bool(info.get("needs_reset", False))
                rew[j] = r
                term[j] = d
                done[j] = d or reset
                if d or reset:
                    o2 = e.reset()
                nxt.append(o2)
            prev_done = v["done"][slot].copy()
            obs = nxt
            child_conn.send(("trans", slot))
            slot = (slot + 1) % R
            while free == 0:
                pump_one()  # only free/stop can arrive here
    except (SystemExit, EOFError, KeyboardInterrupt, BrokenPipeError):
        pass
    finally:
        for e in envs:
            try:
                e.close()
            except Exception:
                pass
        if shm is not None:
            try:
                shm.close()
            except Exception:
                pass


class AtariActorLearnerPipeline:
    """SEED-style actor-learner driver for host Atari-class envs.

    Args:
        core: a DQN-family core (select_action/update/sync_target protocol,
            pfrl_tpu/agents/dqn.py) whose ``phi`` accepts [B,84,84,4] uint8.
        env_factory: spawn-picklable ``f(seed) -> env`` producing
            [84,84,1]-uint8-plane observations (e.g.
            envs/synthetic_ale.make_warped; for real ALE, MaxAndSkip +
            WarpFrame WITHOUT FrameStack — stacking runs on device).
        n_workers/lanes_per_worker: actor processes x env lanes each.
        capacity: replay ring rows (single planes, so 4x cheaper per row
            than stacked storage).
        burst: learner updates fused per dispatch.
    """

    def __init__(
        self,
        core,
        env_factory: Callable,
        n_workers: int = 2,
        lanes_per_worker: int = 64,
        capacity: int = 200_000,
        minibatch_size: int = 32,
        update_interval: int = 4,
        target_update_interval: int = 10_000,
        replay_start_size: int = 2_000,
        burst: int = 64,
        slot_ring: int = 4,
        frame_hw=(84, 84),
        frame_stack: int = 4,
        gamma: float = 0.99,
        seed: int = 0,
        logger=None,
    ):
        assert jax is not None, "pipeline driver requires jax"
        self.core = core
        self.env_factory = env_factory
        self.n_workers = n_workers
        self.K = lanes_per_worker
        self.L = n_workers * lanes_per_worker
        self.capacity = (capacity // self.L) * self.L
        self.minibatch_size = minibatch_size
        self.update_interval = update_interval
        self.target_update_interval = target_update_interval
        self.replay_start_size = max(
            replay_start_size, (slot_ring + frame_stack + 2) * self.L
        )
        self.burst = burst
        self.R = slot_ring
        self.hw = frame_hw
        self.stack_k = frame_stack
        self.gamma = gamma
        self.seed = seed
        self.logger = logger or logging.getLogger(__name__)

        self.acted_steps = 0          # committed env transitions
        self.optim_t = 0              # optimizer steps done
        self._loss = float("nan")
        self._avg_q = float("nan")
        self.exception_event = threading.Event()
        self._stop = threading.Event()
        self._state_lock = threading.Lock()   # guards ring/stack swaps
        self._trans_q: "queue.Queue" = queue.Queue()
        self._req_qs = {}                     # worker_id -> Queue
        self._threads = []
        self._workers = []
        self._channels = []
        self.train_state = None
        self._jit_eval_act = None

    # ------------------------------------------------------------ device fns
    def _build_jits(self):
        core, L, K = self.core, self.L, self.K
        HW = self.hw[0] * self.hw[1]
        H, W = self.hw
        k = self.stack_k
        cap = self.capacity
        gamma = self.gamma
        mb = self.minibatch_size
        UI, TUI = self.update_interval, self.target_update_interval

        def act_stage(train_state, stack, ring, planes, prev_done, lane_off,
                      row_base, t, seed):
            """planes:[K,HW]u8 prev_done:[K]bool -> (actions[K], stack', ring')."""
            img = planes.reshape(K, H, W, 1)
            sub = jax.lax.dynamic_slice_in_dim(stack, lane_off, K, axis=0)
            shifted = jnp.concatenate([sub[..., 1:], img], axis=-1)
            reset_stack = jnp.broadcast_to(img, (K, H, W, k))
            new_sub = jnp.where(
                prev_done[:, None, None, None], reset_stack, shifted
            )
            stack = jax.lax.dynamic_update_slice_in_dim(
                stack, new_sub, lane_off, axis=0
            )
            rng = jax.random.fold_in(jax.random.PRNGKey(self.seed), seed)
            actions = core.select_action(train_state, rng, new_sub, t, True)
            rows = (row_base + jnp.arange(K, dtype=jnp.int32)) % cap
            ring = ring.replace(
                planes=ring.planes.at[rows].set(planes),
                action=ring.action.at[rows].set(actions.astype(jnp.int32)),
            )
            return actions, stack, ring

        def commit(ring, rew, term, done):
            """Commit one full row of L transitions: flags + cursor."""
            rows = (ring.commit_cursor + jnp.arange(L, dtype=jnp.int32)) % cap
            return ring.replace(
                reward=ring.reward.at[rows].set(rew),
                terminated=ring.terminated.at[rows].set(term),
                done=ring.done.at[rows].set(done),
                commit_cursor=ring.commit_cursor + L,
            )

        def sample(ring, rng):
            cur = ring.commit_cursor
            lo = jnp.maximum(
                (k - 1) * L, cur - cap + (self.R + k + 1) * L
            )
            hi = cur - L  # successor plane must be written (staged <= ok)
            ids = lo + jax.random.randint(
                rng, (mb,), 0, jnp.maximum(hi - lo, 1)
            )
            # Stack reconstruction: how far back can each sample reach
            # without crossing an episode boundary? m in [0, k-1].
            back = ids[:, None] - jnp.arange(1, k, dtype=jnp.int32)[None, :] * L
            d = ring.done[back % cap]                      # [B, k-1]
            blocked = jnp.cumsum(d.astype(jnp.int32), axis=1) > 0
            m = jnp.sum(~blocked, axis=1)                  # [B]

            def stack_at(rows_newest, mm):
                # channel c holds offset j = k-1-c steps back, clamped to mm
                j = jnp.arange(k - 1, -1, -1, dtype=jnp.int32)   # [k]
                eff = jnp.minimum(j[None, :], mm[:, None])       # [B,k]
                rows = (rows_newest[:, None] - eff * L) % cap
                pl = ring.planes[rows]                           # [B,k,HW]
                return jnp.moveaxis(
                    pl.reshape(mb, k, H, W), 1, -1
                )                                                # [B,H,W,k]

            obs = stack_at(ids, m)
            # next_obs: one step forward; boundary at ids itself resets.
            m_next = jnp.where(ring.done[ids % cap], 0, jnp.minimum(m + 1, k - 1))
            next_obs = stack_at(ids + L, m_next)
            # NOTE deviation: truncation (done & ~terminated) is treated
            # as terminal here. The worker resets immediately after a
            # truncated episode, so the successor plane in the ring is the
            # NEXT episode's reset frame — bootstrapping through it would
            # target an unrelated state's value. Killing the bootstrap is
            # the classic Atari-DQN behavior (the reference's ALE path has
            # no ContinuingTimeLimit either); envs where truncation
            # bootstrap fidelity matters belong on the host drivers or
            # pure-JAX runner, which store true next observations.
            return TransitionBatch(
                obs=obs,
                action=ring.action[ids % cap],
                reward=ring.reward[ids % cap],
                next_obs=next_obs,
                discount=jnp.full((mb,), gamma, jnp.float32),
                is_terminal=ring.done[ids % cap],
                weight=jnp.ones((mb,), jnp.float32),
                indices=ids,
                extras=FrozenDict(),
            )

        def learner_burst(train_state, ring, rng, n):
            def body(i, carry):
                ts, r, loss, q = carry
                r, r_s, r_u = jax.random.split(r, 3)
                batch = sample(ring, r_s)
                ts2, aux = core.update(ts, r_u, batch)
                # Target sync on effective-timestep interval crossings
                # (dqn.py:307-314 cadence, computed from n_updates).
                u = ts.n_updates
                crossed = ((u + 1) * UI) // TUI != (u * UI) // TUI
                ts2 = jax.lax.cond(
                    crossed, core.sync_target, lambda s: s, ts2
                )
                return (ts2, r, loss + aux["loss"], q + aux["average_q"])

            init = (train_state, rng, jnp.zeros(()), jnp.zeros(()))
            train_state, _, loss, q = jax.lax.fori_loop(0, n, body, init)
            return train_state, loss / n, q / n

        self._jit_act_stage = jax.jit(act_stage, donate_argnums=(1, 2))
        self._jit_commit = jax.jit(commit, donate_argnums=(0,))
        # NOT donated: the act path concurrently holds references to the
        # same train_state/ring buffers; donating here would delete them
        # under the server thread's feet. Burst dispatches happen under
        # _state_lock so the refs it consumes are never stale.
        self._jit_burst = jax.jit(learner_burst, static_argnames=("n",))
        self._jit_sample = jax.jit(sample)  # exposed for tests

    def _init_device_state(self, rng):
        H, W = self.hw
        HW = H * W
        example = jnp.zeros((self.L, H, W, self.stack_k), jnp.uint8)
        self.train_state = self.core.init(rng, example)
        # De-alias target/params for donation (cf. runner.py init).
        self.train_state = jax.tree.map(
            lambda x: jnp.array(x, copy=True), self.train_state
        )
        self.stack = jnp.zeros((self.L, H, W, self.stack_k), jnp.uint8)
        self.ring = PlaneRing(
            planes=jnp.zeros((self.capacity, HW), jnp.uint8),
            action=jnp.zeros((self.capacity,), jnp.int32),
            reward=jnp.zeros((self.capacity,), jnp.float32),
            terminated=jnp.zeros((self.capacity,), bool),
            done=jnp.zeros((self.capacity,), bool),
            commit_cursor=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------- lifecycle
    def start(self):
        ctx = get_context("spawn")
        self._build_jits()
        self._init_device_state(jax.random.PRNGKey(self.seed))
        for w in range(self.n_workers):
            ch = _WorkerChannel(ctx, w, self.K, self.R, self.hw)
            proc = ctx.Process(
                target=_env_worker,
                args=(
                    ch.child_conn,
                    ch.shm.name,
                    self.K,
                    self.R,
                    self.hw,
                    self.env_factory,
                    self.seed * 10_000 + w * self.K,
                ),
                daemon=True,
            )
            proc.start()
            ch.child_conn.close()
            self._channels.append(ch)
            self._workers.append(proc)
        for ch in self._channels:
            self._req_qs[ch.worker_id] = queue.Queue()
        threads = [
            ("io", self._io_loop, ()),
            ("committer", self._committer_loop, ()),
            ("learner", self._learner_loop, ()),
        ] + [
            # One act-server thread PER WORKER: the device dispatch happens
            # under _state_lock (sub-ms), but the action-readback sync — a
            # full host<->device roundtrip, tens of ms on a tunneled TPU —
            # runs outside it, so all workers' roundtrips overlap instead
            # of serializing behind one server thread.
            (f"server{ch.worker_id}", self._server_loop, (ch,))
            for ch in self._channels
        ]
        for name, fn, args in threads:
            t = threading.Thread(
                target=fn, args=args, name=f"pipeline-{name}", daemon=True
            )
            t.start()
            self._threads.append(t)

    def stop(self):
        self._stop.set()
        for ch in self._channels:
            try:
                ch.send(("stop",))
            except (BrokenPipeError, OSError):
                pass
        for t in self._threads:
            t.join(timeout=10)
        for p in self._workers:
            p.join(timeout=5)
            if p.is_alive():
                p.terminate()
        for ch in self._channels:
            ch.close()

    # ----------------------------------------------------------------- loops
    def _guard(fn):
        def wrapped(self, *a, **kw):
            try:
                fn(self, *a, **kw)
            except Exception:
                self.logger.exception("%s failed", fn.__name__)
                self.exception_event.set()
                self._stop.set()
        return wrapped

    @_guard
    def _io_loop(self):
        """Single reader for all worker pipes; fan out tokens to queues."""
        conns = {ch.conn: ch for ch in self._channels}
        while not self._stop.is_set():
            for conn in mp_connection.wait(list(conns), timeout=0.1):
                ch = conns[conn]
                try:
                    msg = conn.recv()
                except (EOFError, OSError):
                    if not self._stop.is_set():
                        raise
                    return
                if msg[0] == "req":
                    self._req_qs[ch.worker_id].put(msg[1])
                elif msg[0] == "trans":
                    self._trans_q.put((ch, msg[1]))

    @_guard
    def _server_loop(self, ch):
        """Act-stage service for one worker: dispatch under the lock,
        sync outside it (roundtrips of all workers overlap)."""
        req_q = self._req_qs[ch.worker_id]
        while not self._stop.is_set():
            try:
                slot = req_q.get(timeout=0.1)
            except queue.Empty:
                continue
            v = ch.views
            planes = np.ascontiguousarray(v["planes"][slot])
            prev_done = v["prev_done"][slot].astype(bool)
            lane_off = ch.worker_id * self.K
            row_base = ch.step * self.L + lane_off
            # Scalars as np arrays: a Python int argument would retrace
            # the jit on every distinct value.
            with self._state_lock:
                actions, self.stack, self.ring = self._jit_act_stage(
                    self.train_state,
                    self.stack,
                    self.ring,
                    jnp.asarray(planes),
                    jnp.asarray(prev_done),
                    np.int32(lane_off),
                    np.int32(row_base),
                    np.int32(self.acted_steps),
                    np.int32(row_base),  # unique deterministic per-call seed
                )
            v["act"][slot] = np.asarray(actions, np.int32)
            ch.step += 1
            ch.send(("act", slot))

    @_guard
    def _committer_loop(self):
        """Drain full rows (one slot from every worker) into the ring."""
        staging = {ch.worker_id: [] for ch in self._channels}
        while not self._stop.is_set():
            try:
                ch, slot = self._trans_q.get(timeout=0.1)
            except queue.Empty:
                continue
            staging[ch.worker_id].append((ch, slot))
            while all(staging.values()):
                row = [staging[w].pop(0) for w in sorted(staging)]
                rew = np.concatenate(
                    [c.views["rew"][s] for c, s in row]
                )
                term = np.concatenate(
                    [c.views["term"][s].astype(bool) for c, s in row]
                )
                done = np.concatenate(
                    [c.views["done"][s].astype(bool) for c, s in row]
                )
                with self._state_lock:
                    self.ring = self._jit_commit(
                        self.ring,
                        jnp.asarray(rew),
                        jnp.asarray(term),
                        jnp.asarray(done),
                    )
                self.acted_steps += self.L
                for c, s in row:
                    c.send(("free", s))

    @_guard
    def _learner_loop(self):
        """Paced burst updates: keep optim_t ~= acted/update_interval."""
        while not self._stop.is_set():
            if self.acted_steps < self.replay_start_size:
                time.sleep(0.01)
                continue
            deficit = self.acted_steps // self.update_interval - self.optim_t
            if deficit < self.burst:
                # Fixed burst width = one compiled program; partial bursts
                # would each compile their own (static n).
                time.sleep(0.002)
                continue
            n = self.burst
            rng = jax.random.fold_in(
                jax.random.PRNGKey(self.seed + 1), self.optim_t
            )
            # Dispatch under the lock (async, returns at enqueue): the refs
            # consumed here must not be donated away by an act/commit call
            # between read and dispatch.
            with self._state_lock:
                new_ts, loss, q = self._jit_burst(
                    self.train_state, self.ring, rng, n=n
                )
                self.train_state = new_ts
            # One sync per burst, not per update (the reference's per-update
            # host sync was the round-2 learner's 1.4 updates/s).
            self._loss = float(loss)
            self._avg_q = float(q)
            self.optim_t += n

    # ------------------------------------------------------------------ misc
    def get_statistics(self):
        return [
            ("average_q", self._avg_q),
            ("average_loss", self._loss),
            ("n_updates", self.optim_t),
        ]

    # ------------------------------------------------------------ evaluation
    def greedy_actions(self, obs_stacks) -> np.ndarray:
        """Greedy actions for ``[B, H, W, k]`` uint8 frame stacks from the
        CURRENT train state — the eval-mode act path (host eval envs run
        their own FrameStack; the reference evaluates actors the same way,
        evaluator.py:66-97)."""
        if self._jit_eval_act is None:
            self._jit_eval_act = jax.jit(
                lambda ts, obs: self.core.select_action(
                    ts, jax.random.PRNGKey(0), obs,
                    jnp.zeros((), jnp.int32), False,
                )
            )
        with self._state_lock:
            ts = self.train_state
        return np.asarray(self._jit_eval_act(ts, jnp.asarray(obs_stacks)))

    # ------------------------------------------------------------ checkpoint
    def save(self, dirname: str) -> None:
        """Persist the train state (msgpack, zoo-compatible layout)."""
        import os

        from pfrl_tpu.replay.persistent import save_state

        os.makedirs(dirname, exist_ok=True)
        with self._state_lock:
            ts = jax.device_get(self.train_state)
        save_state(ts, os.path.join(dirname, "train_state.msgpack"))

    def load(self, dirname: str) -> None:
        import os

        from pfrl_tpu.replay.persistent import load_state

        with self._state_lock:
            self.train_state = jax.device_put(
                load_state(
                    self.train_state,
                    os.path.join(dirname, "train_state.msgpack"),
                )
            )
