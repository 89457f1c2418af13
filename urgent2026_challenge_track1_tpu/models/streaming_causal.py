"""Real-time stateful streaming enhancement for the causal BSRNN.

The reference exposes a ``causal`` switch on its BSRNN separator
(``/root/reference/baseline_code/models/bsrnn_flowse.py:199,216,235``) but
never a streaming runtime — and its "causal" model still normalizes with
GroupNorm over the FULL utterance (espnet choose_norm "GN"), which is
non-causal.  This module provides the deployable counterpart:

  * ``BSRNNConfig(causal=True, streaming_norm=True)`` — every GroupNorm that
    spans time becomes cumulative (ops/norms.cumulative_group_norm), so the
    whole network is causal with bounded state;
  * ``make_streaming_step`` — ONE jitted program per (fs, batch, chunk):
    consumes ``chunk_frames * hop`` new samples, carries the STFT input
    tail, every norm's running sums, every time-LSTM's (h, c), and the
    iSTFT overlap-add tail (signal + window-energy envelope), and emits
    ``chunk_frames * hop`` fully-finalized output samples;
  * ``StreamingSession`` — host wrapper handling the center reflect-padding
    at stream start/end, arbitrary feed sizes, and exact-length flush.

Chaining chunks reproduces the offline forward bit-for-bit up to fp
reassociation: ``tests/test_streaming_causal.py`` pins
``StreamingSession.process(x) == bsrnn_se_apply(x)`` for the same config.

Algorithmic latency = ``chunk_frames * hop + n_fft // 2`` samples (e.g.
chunk_frames=2 at 48 kHz: 2*480 + 480 = 30 ms) plus the device step time.

TPU-first design: the step has a single static shape — no per-length
compiles, no host DSP in the loop; state lives on device between steps.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from urgent2026_challenge_track1_tpu.dsp import stft as dsp
from urgent2026_challenge_track1_tpu.models import bsrnn as B

__all__ = ["init_model_states", "make_streaming_step", "StreamingSession"]


def init_model_states(params, cfg: B.BSRNNConfig, batch: int, n_bands: int):
    """Zero streaming carry for ``bsrnn_apply(..., states=...)``.

    Norm states are ``(count, s1, s2)`` running sums shaped like each norm's
    per-frame statistics (time axis kept at 1); the time-LSTM carry is
    ``(h, c)`` for the ``batch * n_bands`` independent band rows.
    """
    n_layers = params["layers"]["fc_time_w"].shape[0]
    hidden = params["layers"]["rnn_time"]["w_hh"].shape[-1]

    def z3(shape):
        return tuple(jnp.zeros(shape, jnp.float32) for _ in range(3))

    per_batch = (n_layers, batch, 1, 1, 1)
    per_band = (batch, 1, n_bands, 1)
    lstm_shape = (n_layers, batch * n_bands, hidden)
    return {
        "band_split": z3(per_band),
        "layers": {
            "norm_time": z3(per_batch),
            "rnn_time": (
                jnp.zeros(lstm_shape, jnp.dtype(cfg.compute_dtype)),
                jnp.zeros(lstm_shape, jnp.float32),
            ),
            "norm_freq": z3(per_batch),
        },
        "mask": z3(per_band),
        "residual": z3(per_band),
    }


def _padded_window(n_fft: int, win: int) -> np.ndarray:
    w = np.asarray(dsp.hann_window(win))
    if win < n_fft:
        left = (n_fft - win) // 2
        w = np.pad(w, (left, n_fft - win - left))
    return w.astype(np.float32)


@functools.lru_cache(maxsize=256)
def _build_step(cfg: B.BSRNNConfig, stft_cfg: dsp.STFTConfig, fs: int,
                chunk_frames: int):
    """One jitted streaming step.  Returns (fn, n_fft, hop, n_bands)."""
    if not (cfg.causal and cfg.streaming_norm):
        raise ValueError(
            "streaming requires BSRNNConfig(causal=True, streaming_norm=True)"
        )
    n_fft, win, hop = stft_cfg.geometry(fs)
    n_bins = stft_cfg.n_bins(fs)
    n_bands = B.band_count(cfg.input_dim, cfg.target_fs, fs, n_bins)
    C = chunk_frames
    window = jnp.asarray(_padded_window(n_fft, win))
    tail = n_fft - hop

    def step(params, state, chunk, n_valid):
        """chunk: (B, C*hop) next raw samples; n_valid: () valid frames in
        this step (C mid-stream, fewer on the final/drain steps).  Returns
        (new_state, emitted (B, C*hop)) — emitted samples are final."""
        buf = jnp.concatenate([state["in_tail"], chunk], axis=-1)
        frames = dsp._frame(buf, n_fft, hop) * window  # (B, C, n_fft)
        spec = jnp.fft.rfft(frames, axis=-1)
        spec = dsp.spec_transform(spec, stft_cfg)
        enh, mstates = B.bsrnn_apply(params, spec, cfg, fs, states=state["model"])
        enh = dsp.spec_inverse_transform(enh, stft_cfg)
        td = jnp.fft.irfft(enh, n=n_fft, axis=-1) * window  # (B, C, n_fft)
        fmask = (jnp.arange(C) < n_valid).astype(td.dtype)
        td = td * fmask[None, :, None]
        full = dsp._ola(td, n_fft, hop)  # (B, (C-1)*hop + n_fft)
        env_f = dsp._ola(jnp.square(window)[None, :] * fmask[:, None], n_fft, hop)
        full = full.at[:, :tail].add(state["ola"])
        env_f = env_f.at[:tail].add(state["env"])
        emit = full[:, : C * hop] / jnp.maximum(env_f[: C * hop], 1e-11)
        new_state = {
            "model": mstates,
            "in_tail": buf[:, C * hop :],
            "ola": full[:, C * hop :],
            "env": env_f[C * hop :],
        }
        return new_state, emit

    return jax.jit(step), n_fft, hop, n_bands


def make_streaming_step(cfg: B.BSRNNConfig, stft_cfg: dsp.STFTConfig,
                        fs: int, chunk_frames: int = 8):
    """(jitted step fn, n_fft, hop, n_bands) — see ``_build_step``; cached
    per config.  The step takes ``params`` per call (params-agnostic)."""
    return _build_step(cfg, stft_cfg, fs, int(chunk_frames))


class StreamingSession:
    """Stateful chunk-in / chunk-out enhancement of an unbounded stream.

    ``feed(samples)`` accepts any number of new samples (B, n) and returns
    whatever output samples became final; ``flush()`` returns the rest so
    that ``concat(feeds..., flush)`` has exactly the fed length and equals
    the offline ``bsrnn_se_apply`` of the full signal (same
    causal+streaming_norm config).  Total fed length must exceed
    ``n_fft // 2`` samples (the reflect center-pad, as in torch.stft).
    """

    def __init__(self, params, cfg: B.BSRNNConfig, stft_cfg: dsp.STFTConfig,
                 fs: int, batch: int = 1, chunk_frames: int = 8):
        self.params = params
        self.cfg = cfg
        self.fs = fs
        self.batch = batch
        (self._step, self.n_fft, self.hop, self._n_bands) = _build_step(
            cfg, stft_cfg, fs, int(chunk_frames)
        )
        self.chunk_frames = int(chunk_frames)
        self.pad = self.n_fft // 2
        self._chunk = self.chunk_frames * self.hop
        self._in_tail_len = self.n_fft - self.hop
        # host buffers
        self._pending = np.zeros((batch, 0), np.float32)  # xp not yet consumed
        self._head: Optional[np.ndarray] = np.zeros((batch, 0), np.float32)
        self._recent = np.zeros((batch, 0), np.float32)  # last pad+1 raw samples
        self._fed = 0
        self._frames_done = 0
        self._emit_pos = 0  # OLA positions emitted so far
        self._delivered = 0  # output samples handed to the caller
        self._state = None
        self._flushed = False

    @property
    def latency_samples(self) -> int:
        """Algorithmic latency: samples that must arrive before the first
        output sample can be emitted."""
        return self._chunk + self.pad

    def _append_pending(self, xp: np.ndarray) -> None:
        self._pending = np.concatenate([self._pending, xp], axis=-1)

    def _prime(self) -> bool:
        """Seed the device state once the STFT left-context is available."""
        if self._state is not None:
            return True
        if self._pending.shape[-1] < self._in_tail_len:
            return False
        self._state = {
            "model": init_model_states(self.params, self.cfg, self.batch,
                                       self._n_bands),
            "in_tail": jnp.asarray(self._pending[:, : self._in_tail_len]),
            "ola": jnp.zeros((self.batch, self._in_tail_len), jnp.float32),
            "env": jnp.zeros((self._in_tail_len,), jnp.float32),
        }
        self._pending = self._pending[:, self._in_tail_len :]
        return True

    def _run_steps(self, n_valid_fn, drain_until: Optional[int] = None):
        """Consume full chunks from ``_pending``; optionally keep running
        zero-input drain steps until ``_emit_pos >= drain_until``."""
        outs = []
        while True:
            # prime FIRST: it consumes n_fft-hop samples from _pending, so
            # chunk availability must be judged on what remains (judging
            # before priming dispatched a short first chunk for feed sizes
            # in [chunk-pad, chunk-1] — silent output corruption)
            if not self._prime():
                break
            have = self._pending.shape[-1] >= self._chunk
            draining = drain_until is not None and self._emit_pos < drain_until
            if have:
                chunk = self._pending[:, : self._chunk]
                self._pending = self._pending[:, self._chunk :]
            elif draining:
                chunk = np.zeros((self.batch, self._chunk), np.float32)
                if self._pending.shape[-1]:
                    chunk[:, : self._pending.shape[-1]] = self._pending
                    self._pending = self._pending[:, :0]
            else:
                break
            n_valid = n_valid_fn(self._frames_done)
            self._state, emit = self._step(
                self.params, self._state, jnp.asarray(chunk),
                jnp.asarray(n_valid, jnp.int32),
            )
            self._frames_done += n_valid
            outs.append(np.asarray(emit))
            self._emit_pos += self._chunk
            if drain_until is not None and self._emit_pos >= drain_until \
                    and self._pending.shape[-1] < self._chunk:
                break
        if not outs:
            return np.zeros((self.batch, 0), np.float32)
        return np.concatenate(outs, axis=-1)

    def _deliverable(self, emitted: np.ndarray, limit: int) -> np.ndarray:
        """Map emitted OLA positions to output samples [pad, pad+T)."""
        start_pos = self._emit_pos - emitted.shape[-1]
        lo = max(self.pad + self._delivered, start_pos)
        hi = min(limit, self._emit_pos)
        if hi <= lo:
            return np.zeros((self.batch, 0), np.float32)
        out = emitted[:, lo - start_pos : hi - start_pos]
        self._delivered += out.shape[-1]
        return out

    def feed(self, samples: np.ndarray) -> np.ndarray:
        """Push new samples; returns finalized output samples (maybe empty)."""
        if self._flushed:
            raise RuntimeError("session already flushed")
        samples = np.atleast_2d(np.asarray(samples, np.float32))
        if samples.shape[0] != self.batch:
            raise ValueError(f"expected batch {self.batch}, got {samples.shape}")
        self._fed += samples.shape[-1]
        keep = self.pad + 1
        self._recent = np.concatenate([self._recent, samples], axis=-1)[:, -keep:]
        if self._head is not None:
            # accumulate until the reflect prefix xp[i] = x[pad-i] exists
            self._head = np.concatenate([self._head, samples], axis=-1)
            if self._head.shape[-1] <= self.pad:
                return np.zeros((self.batch, 0), np.float32)
            prefix = self._head[:, self.pad : 0 : -1]
            self._append_pending(np.concatenate([prefix, self._head], axis=-1))
            self._head = None
        else:
            self._append_pending(samples)
        emitted = self._run_steps(lambda done: self.chunk_frames)
        # mid-stream every processed frame is valid; cap at what's final
        return self._deliverable(emitted, self.pad + self._fed)

    def flush(self) -> np.ndarray:
        """End of stream: returns the remaining output samples."""
        if self._flushed:
            raise RuntimeError("session already flushed")
        self._flushed = True
        T = self._fed
        if T <= self.pad:
            raise ValueError(
                f"stream too short: need more than {self.pad} samples, got {T}"
            )
        if self._head is not None:
            prefix = self._head[:, self.pad : 0 : -1]
            self._append_pending(np.concatenate([prefix, self._head], axis=-1))
            self._head = None
        # reflect suffix: xp[pad+T+j] = x[T-2-j] — _recent holds the last
        # pad+1 raw samples, so x[T-2-j] = _recent[pad-1-j]
        suffix = self._recent[:, self.pad - 1 :: -1] if self.pad else \
            np.zeros((self.batch, 0), np.float32)
        self._append_pending(suffix)
        total_frames = dsp.num_frames(T, self.n_fft, self.hop, center=True)
        out_end = self.pad + T

        def n_valid(done: int) -> int:
            return max(0, min(self.chunk_frames, total_frames - done))

        emitted = self._run_steps(n_valid, drain_until=out_end)
        return self._deliverable(emitted, out_end)

    def process(self, wav: np.ndarray, feed_size: Optional[int] = None
                ) -> np.ndarray:
        """Convenience: stream ``wav`` through in ``feed_size``-sample feeds
        (default: one chunk) and return the full enhanced signal."""
        wav = np.atleast_2d(np.asarray(wav, np.float32))
        feed_size = int(feed_size or self._chunk)
        outs = []
        for i in range(0, wav.shape[-1], feed_size):
            outs.append(self.feed(wav[:, i : i + feed_size]))
        outs.append(self.flush())
        return np.concatenate(outs, axis=-1)
