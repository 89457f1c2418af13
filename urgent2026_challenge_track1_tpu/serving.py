"""Production serving: dynamic (fs, length-bucket) batching for enhancement.

No reference counterpart — the reference's ``inference.py:48-64`` loops over
an scp one utterance at a time on GPU.  A TPU is a batch device: each
(fs, 1 s bucket) pair owns ONE compiled program, and the MXU only reaches
full utilization when concurrent requests share a dispatch.  This engine
accepts individual requests from many threads (e.g. HTTP handlers), groups
them by (fs, bucket), and flushes a group when either ``max_batch`` requests
are waiting or the oldest request has waited ``max_wait_ms`` — the classic
dynamic-batching policy of production model servers.

Shapes stay static: batches are padded up to the next power of two (so at
most ``log2(max_batch)+1`` programs exist per (fs, bucket)), filler rows
carry full-bucket lengths (a zero length would zero normalization
denominators), and each utterance is sliced back to its true length before
the 0.9 peak normalization (same output contract as ``inference.py``).

Inputs longer than ``chunk_seconds`` are routed to the fixed-shape
overlap-add streamer (`models/streaming.py`) as single-request dispatches so
a ten-minute file never forces a giant padded batch.
"""

from __future__ import annotations

import os
import threading
import time
from collections import OrderedDict, deque
from concurrent.futures import Future
from functools import partial
from typing import Callable, Optional

import numpy as np

__all__ = ["BatchingEngine", "make_enhance_fn", "make_sharded_serving_fn"]


def _enable_persistent_compile_cache():
    """Same policy as Trainer.__init__: repeat CLI runs / daemon restarts
    skip the multi-minute per-(fs, bucket) compiles on remote TPU backends."""
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass


def make_enhance_fn(kind, params, model_cfg, stft_cfg, nfe: int = 15,
                    solver: str = "euler") -> Callable:
    """A jitted ``enhance(wav_batch, fs, key, lengths) -> batch`` closure for
    either model family (shared by ``inference.py`` and the serving engine).

    ``fs`` is a static argument (one compiled program per sampling rate —
    the STFT geometry is fs-scaled, ``dsp/stft.py``); ``lengths`` makes the
    bucket padding numerically exact (``tests/test_length_masking.py``).
    ``key`` is ignored by the discriminative path.
    """
    import jax

    _enable_persistent_compile_cache()

    from urgent2026_challenge_track1_tpu.models import bsrnn as bsrnn_mod
    from urgent2026_challenge_track1_tpu.models import bsrnn_flowse as flow_mod

    if kind == "discriminative":

        @partial(jax.jit, static_argnums=(1,))
        def enhance(wav, fs, lengths):
            out, _ = bsrnn_mod.bsrnn_se_apply(
                params, model_cfg, stft_cfg, wav, fs, lengths=lengths
            )
            return out

        return lambda wav, fs, key, lengths: enhance(wav, fs, lengths)

    @partial(jax.jit, static_argnums=(2,))
    def enhance_flow(wav, key, fs, lengths):
        return flow_mod.flowse_enhance(
            params, model_cfg, key, wav, fs, N=nfe, solver=solver,
            lengths=lengths,
        )

    return lambda wav, fs, key, lengths: enhance_flow(wav, key, fs, lengths)


def make_sharded_serving_fn(kind, params, model_cfg, stft_cfg, mesh,
                            nfe: int = 15, solver: str = "euler") -> Callable:
    """Engine-shaped enhance over a dp x mp device mesh (multi-chip serving).

    Same ``(wav, fs, key, lengths)`` contract as :func:`make_enhance_fn`,
    but each (fs,) program is built by ``parallel.model_parallel`` — batch
    rows shard over ``dp`` and the dual-path recurrence rows over dp x mp
    (see that module's docstring).  Programs are cached per fs; params ride
    replicated.  A ``lengths=None`` call (full streaming chunks) runs with
    full-bucket lengths — the sharded builders are masked-only, and masking
    a provably-full chunk only costs the fused-kernel fast path, which the
    scan-based sharded program does not use anyway.
    """
    from urgent2026_challenge_track1_tpu.parallel import model_parallel as MP

    _enable_persistent_compile_cache()
    cache: dict = {}
    dp = int(dict(zip(mesh.axis_names, mesh.devices.shape)).get("dp", 1))

    def enhance(wav, fs, key, lengths):
        import jax.numpy as jnp

        fs = int(fs)
        if fs not in cache:
            if kind == "discriminative":
                cache[fs] = MP.make_sharded_enhance(
                    mesh, model_cfg, stft_cfg, fs, lengths=True
                )
            else:
                cache[fs] = MP.make_sharded_flow_enhance(
                    mesh, model_cfg, fs, N=nfe, solver=solver, lengths=True
                )
        wav = jnp.asarray(wav)
        B = wav.shape[0]
        # jit in_shardings=P("dp") rejects batch dims not divisible by dp
        # (so B=1 timer flushes, long-form chunks, and warmup would all
        # crash); pad rows up to the next dp multiple and slice back
        Bp = -(-B // dp) * dp
        if lengths is None:
            lengths = jnp.full((B,), wav.shape[1], jnp.int32)
        if Bp != B:
            wav = jnp.concatenate(
                [wav, jnp.zeros((Bp - B, wav.shape[1]), wav.dtype)]
            )
            lengths = jnp.concatenate(
                [lengths, jnp.full((Bp - B,), wav.shape[1], jnp.int32)]
            )
        if kind == "discriminative":
            out = cache[fs](params, wav, lengths)
        else:
            out = cache[fs](params, key, wav, lengths)
        return out[:B]

    return enhance


class _Request:
    __slots__ = ("wav", "fs", "future", "t_submit")

    def __init__(self, wav: np.ndarray, fs: int):
        self.wav = wav
        self.fs = fs
        self.future: Future = Future()
        self.t_submit = time.monotonic()


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


class BatchingEngine:
    """Groups enhancement requests into device batches.

    Parameters
    ----------
    enhance:       ``(wav (B,T) f32, fs, key, lengths (B,) i32) -> (B,T)``
                   (see :func:`make_enhance_fn`).
    max_batch:     flush a (fs, bucket) group as soon as this many requests
                   are waiting; also the padded batch-size cap.
    max_wait_ms:   flush a group once its oldest request has waited this
                   long, whatever the occupancy (tail-latency bound).
    bucket_seconds: length quantum — requests are padded up to the next
                   multiple so compile count stays bounded over lengths.
    chunk_seconds: inputs longer than this stream through fixed-shape
                   overlap-add chunks instead of joining a batch.
    normalize:     apply the CLI's 0.9 peak normalization to each output.
    max_retries:   re-dispatch a failed batch this many times before failing
                   its requests (the remote-TPU worker can crash transiently
                   — "UNAVAILABLE: TPU worker process crashed"; a retry
                   rebuilds the executable and usually succeeds).
    autostart:     start the background dispatch thread (tests drive
                   :meth:`step` manually with ``autostart=False``).
    """

    def __init__(self, enhance: Callable, *, max_batch: int = 8,
                 max_wait_ms: float = 25.0, bucket_seconds: float = 1.0,
                 chunk_seconds: float = 30.0, normalize: bool = True,
                 max_retries: int = 1, seed: int = 0, autostart: bool = True):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        self._enhance = enhance
        self.max_batch = int(max_batch)
        self.max_wait = float(max_wait_ms) / 1e3
        self.bucket_seconds = float(bucket_seconds)
        self.chunk_seconds = float(chunk_seconds)
        self.normalize = bool(normalize)
        self.max_retries = int(max_retries)
        self._seed = seed
        self._key = None  # jax PRNGKey, created lazily on first dispatch
        self._lock = threading.Lock()
        self._cv = threading.Condition(self._lock)
        # (fs, bucket) -> deque[_Request]; OrderedDict so iteration order is
        # deterministic for tests
        self._queues: "OrderedDict[tuple, deque]" = OrderedDict()
        self._long: deque = deque()
        self._closed = False
        self._stats = {
            "requests": 0, "batches": 0, "batched_requests": 0,
            "long_form": 0, "errors": 0, "retries": 0, "wait_s_sum": 0.0,
        }
        self._dispatch_started: Optional[float] = None  # wedge watchdog
        self._worker: Optional[threading.Thread] = None
        if autostart:
            self._worker = threading.Thread(
                target=self._run, name="batching-engine", daemon=True
            )
            self._worker.start()

    # -- client API ----------------------------------------------------

    def submit(self, wav: np.ndarray, fs: int) -> Future:
        """Enqueue one mono utterance; the Future resolves to the enhanced
        float32 waveform at the input's exact length."""
        wav = np.asarray(wav)
        if wav.ndim not in (1, 2) or (wav.ndim == 2 and wav.shape[1] < 1):
            raise ValueError(f"audio must be (T,) or (T, C), got {wav.shape}")
        if wav.ndim == 2:  # (T, C) -> first channel, like inference.py
            wav = wav[:, 0]
        wav = wav.astype(np.float32)
        if wav.shape[0] == 0:
            raise ValueError("empty audio")
        fs = int(fs)
        if fs <= 0:
            raise ValueError(f"sampling rate must be positive, got {fs}")
        req = _Request(wav, fs)
        with self._cv:
            if self._closed:
                raise RuntimeError("engine is closed")
            self._stats["requests"] += 1
            if wav.shape[0] > self.chunk_seconds * fs:
                self._stats["long_form"] += 1
                self._long.append(req)
            else:
                bucket = self._bucket(wav.shape[0], fs)
                self._queues.setdefault((fs, bucket), deque()).append(req)
            self._cv.notify()
        return req.future

    def enhance_sync(self, wav: np.ndarray, fs: int,
                     timeout: Optional[float] = None) -> np.ndarray:
        return self.submit(wav, fs).result(timeout=timeout)

    def snapshot(self) -> dict:
        """Stats for monitoring endpoints (counts + mean occupancy/wait).

        ``dispatch_in_flight_s`` is the wedge watchdog: a wedged device
        backend (e.g. a dead TPU tunnel — observed to block PJRT calls
        FOREVER) leaves the worker stuck inside one dispatch; liveness
        probes should alarm when this grows beyond the expected batch time.
        """
        with self._lock:
            s = dict(self._stats)
            s["pending"] = sum(len(q) for q in self._queues.values()) + len(
                self._long
            )
            s["dispatch_in_flight_s"] = (
                0.0 if self._dispatch_started is None
                else time.monotonic() - self._dispatch_started
            )
        b = max(s["batches"], 1)
        s["mean_batch_occupancy"] = s["batched_requests"] / b
        s["mean_wait_ms"] = 1e3 * s["wait_s_sum"] / max(s["requests"], 1)
        del s["wait_s_sum"]
        return s

    def reset_stats(self):
        """Zero the counters (e.g. after warmup, before a measured window)."""
        with self._lock:
            for k in self._stats:
                self._stats[k] = type(self._stats[k])()

    def close(self, timeout: float = 30.0):
        """Drain pending requests, then stop the worker."""
        with self._cv:
            self._closed = True
            self._cv.notify_all()
        if self._worker is not None:
            self._worker.join(timeout)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- dispatch internals ---------------------------------------------

    def _bucket(self, n: int, fs: int) -> int:
        q = max(int(self.bucket_seconds * fs), 1)
        return -(-n // q) * q

    def step(self, force: bool = True) -> int:
        """Pick and dispatch one batch synchronously; returns the number of
        requests served (0 if nothing eligible).  ``force=True`` ignores the
        max-wait timer (deterministic tests / manual draining)."""
        with self._lock:
            batch = self._pick_locked(time.monotonic(), force=force)
        if not batch:
            return 0
        self._dispatch(batch)
        return len(batch)

    def _pending_locked(self) -> int:
        return sum(len(q) for q in self._queues.values()) + len(self._long)

    def _pick_locked(self, now: float, force: bool):
        """Pop the most urgent dispatchable group (caller holds the lock).

        Fairness is FIFO by head age across the long-form queue and the
        batch groups: long-form work (which occupies the worker for many
        seconds per item) must not starve short requests past their
        max_wait bound, and vice versa.
        """
        long_t = self._long[0].t_submit if self._long else None
        # a full group flushes immediately unless an older long-form
        # request is ahead of it
        for key, q in self._queues.items():
            if len(q) >= self.max_batch and (long_t is None
                                             or q[0].t_submit <= long_t):
                return self._pop_locked(key)
        oldest_key, oldest_t = None, None
        for key, q in self._queues.items():
            if q and (oldest_t is None or q[0].t_submit < oldest_t):
                oldest_key, oldest_t = key, q[0].t_submit
        if long_t is not None and (oldest_t is None or long_t <= oldest_t):
            return [self._long.popleft()]
        if oldest_key is None:
            return None
        if force or now - oldest_t >= self.max_wait:
            return self._pop_locked(oldest_key)
        return None

    def _pop_locked(self, key):
        q = self._queues[key]
        out = [q.popleft() for _ in range(min(len(q), self.max_batch))]
        if not q:
            del self._queues[key]
        return out

    def _next_key(self):
        import jax

        with self._lock:
            if self._key is None:
                self._key = jax.random.PRNGKey(self._seed)
            self._key, sub = jax.random.split(self._key)
        return sub

    def _run(self):
        while True:
            batch = None
            with self._cv:
                while True:
                    now = time.monotonic()
                    batch = self._pick_locked(now, force=self._closed)
                    if batch is not None:
                        break
                    if self._closed:
                        return
                    # sleep until the oldest head becomes overdue (or a
                    # submit/close notify)
                    timeout = None
                    for q in self._queues.values():
                        if q:
                            due = q[0].t_submit + self.max_wait - now
                            timeout = due if timeout is None else min(timeout, due)
                    self._cv.wait(timeout=max(timeout, 1e-3)
                                  if timeout is not None else None)
            self._dispatch(batch)

    def _finalize(self, req: _Request, y: np.ndarray):
        y = np.asarray(y, np.float32)[: req.wav.shape[0]]
        if self.normalize:
            y = y / (np.abs(y).max() or 1.0) * 0.9
        with self._lock:
            self._stats["wait_s_sum"] += time.monotonic() - req.t_submit
        req.future.set_result(y)

    def _compute(self, batch) -> list:
        """Run the device work for one batch; returns one waveform per
        request (raises on device failure — retried by :meth:`_dispatch`)."""
        import jax.numpy as jnp

        fs = batch[0].fs
        key = self._next_key()
        if len(batch) == 1 and batch[0].wav.shape[0] > self.chunk_seconds * fs:
            from urgent2026_challenge_track1_tpu.models.streaming import (
                enhance_streaming,
            )

            return [enhance_streaming(
                lambda x, n: np.asarray(
                    self._enhance(jnp.asarray(x), fs, key,
                                  None if n == x.shape[1]
                                  else jnp.asarray([n], jnp.int32))
                ),
                batch[0].wav, fs, chunk_seconds=self.chunk_seconds,
            )]
        bucket = self._bucket(max(r.wav.shape[0] for r in batch), fs)
        B = _next_pow2(len(batch))
        x = np.zeros((B, bucket), np.float32)
        # filler rows keep full-bucket lengths: zero audio is processed
        # harmlessly while a zero length would zero norm denominators
        lens = np.full((B,), bucket, np.int32)
        for j, r in enumerate(batch):
            x[j, : r.wav.shape[0]] = r.wav
            lens[j] = r.wav.shape[0]
        out = np.asarray(
            self._enhance(jnp.asarray(x), fs, key, jnp.asarray(lens))
        )
        return [out[j] for j in range(len(batch))]

    def _dispatch(self, batch):
        # claim each future: a client-cancelled request is dropped here, and
        # set_running_or_notify_cancel makes later set_result race-free
        # (cancel() can no longer succeed once the future is RUNNING)
        batch = [r for r in batch if r.future.set_running_or_notify_cancel()]
        if not batch:
            return
        with self._lock:
            self._dispatch_started = time.monotonic()
        try:
            self._dispatch_inner(batch)
        finally:
            with self._lock:
                self._dispatch_started = None

    def _dispatch_inner(self, batch):
        for attempt in range(self.max_retries + 1):
            try:
                outs = self._compute(batch)
                break
            except Exception as e:
                if attempt < self.max_retries:
                    # transient device failure (e.g. a crashed TPU worker):
                    # the next dispatch rebuilds/reloads the executable
                    with self._lock:
                        self._stats["retries"] += 1
                    continue
                with self._lock:  # surface the failure on every waiter
                    self._stats["errors"] += len(batch)
                for r in batch:
                    if not r.future.done():
                        r.future.set_exception(e)
                return
        with self._lock:
            self._stats["batches"] += 1
            self._stats["batched_requests"] += len(batch)
        for r, y in zip(batch, outs):
            self._finalize(r, y)
