#!/bin/env python
"""HTTP enhancement-serving daemon with dynamic (fs, bucket) batching.

No reference counterpart — the reference only ships a batch-mode scp CLI
(``baseline_code/inference.py``); this daemon promotes the same enhance
paths to an online service shaped for TPU serving: concurrent requests are
coalesced into device batches by ``serving.BatchingEngine`` so the single
compiled program per (fs, length-bucket) runs at high occupancy.

Endpoints
---------
POST /enhance      body = wav/flac bytes -> enhanced wav bytes
                   (``?subtype=FLOAT`` for lossless float32 output,
                   default PCM_16 like ``inference.py``)
POST /stream       real-time full-duplex enhancement (requires a causal +
                   streaming_norm checkpoint): chunked-transfer request
                   body of raw little-endian float32 mono PCM at ``?fs=``;
                   the response streams back the same format as samples
                   become final — output begins while the request is still
                   uploading (models/streaming_causal.StreamingSession)
GET  /healthz      liveness + backend platform
GET  /stats        batching statistics (occupancy, waits, errors)

Usage:
  python serve.py --ckpt_path <orbax dir | torch .ckpt> --port 8080
"""

import argparse
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from urgent2026_challenge_track1_tpu.utils import audio_io

STANDARD_FS = (8000, 16000, 22050, 24000, 32000, 44100, 48000)


def make_server(engine, host: str = "127.0.0.1", port: int = 8080,
                platform: str = "?", streamer=None, stream_chunk_frames: int = 8):
    """A ThreadingHTTPServer wired to ``engine`` (separated from main() so
    tests can run it on an ephemeral port with a fake engine).

    ``streamer``: optional ``(fs, chunk_frames) -> StreamingSession`` factory
    enabling POST /stream (built in main() when the checkpoint is a
    causal+streaming_norm discriminative model)."""

    class Handler(BaseHTTPRequestHandler):
        # keep-alive: every response carries Content-Length, so persistent
        # connections are safe and save per-request TCP setup
        protocol_version = "HTTP/1.1"

        # one line per request, to stderr like BaseHTTPRequestHandler but
        # without reverse-DNS lookups stalling the 1-CPU host
        def address_string(self):
            return str(self.client_address[0])

        def _json(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok", "platform": platform})
            elif self.path == "/stats":
                self._json(200, engine.snapshot())
            else:
                self._json(404, {"error": f"no route {self.path}"})

        def _request_chunks(self):
            """Yield the body as it arrives: chunked-transfer framing when
            the client uses it, else the whole Content-Length body at once."""
            if self.headers.get("Transfer-Encoding", "").lower() == "chunked":
                while True:
                    line = self.rfile.readline(65536)
                    if not line:
                        return  # client hung up
                    size = int(line.split(b";")[0].strip() or b"0", 16)
                    if size == 0:
                        while True:  # drain optional trailers
                            t = self.rfile.readline(65536)
                            if t in (b"\r\n", b"\n", b""):
                                return
                    data = self.rfile.read(size)
                    self.rfile.read(2)  # CRLF after each chunk
                    yield data
            else:
                n = int(self.headers.get("Content-Length", 0))
                if n > 0:
                    yield self.rfile.read(n)

        def _do_stream(self, query: str):
            """POST /stream: full-duplex chunked f32 PCM enhancement."""
            from urllib.parse import parse_qs

            q = parse_qs(query)
            if streamer is None:
                # drain so keep-alive connections stay in sync
                for _ in self._request_chunks():
                    pass
                return self._json(
                    400, {"error": "this checkpoint cannot stream: /stream "
                                   "needs a causal + streaming_norm "
                                   "discriminative model"})
            allowed_chunks = sorted({1, 2, 4, 8, 16, 32, stream_chunk_frames})
            try:
                fs = int(q["fs"][0])
                if fs not in STANDARD_FS:
                    raise ValueError(f"fs must be one of {STANDARD_FS}")
                chunk_frames = int(q.get("chunk_frames",
                                         [stream_chunk_frames])[0])
                # each (fs, chunk_frames) pair is a separate compiled
                # program (tens of seconds on a TPU tunnel): bound the set a
                # client can force rather than letting it churn the compile
                # cache with arbitrary values
                if chunk_frames not in allowed_chunks:
                    raise ValueError(f"chunk_frames must be one of "
                                     f"{allowed_chunks}")
            except (KeyError, ValueError) as e:
                for _ in self._request_chunks():
                    pass
                return self._json(400, {"error": f"bad query: {e}"})
            sess = streamer(fs, chunk_frames)
            started = False

            def emit(out: np.ndarray):
                nonlocal started
                if not started:
                    # defer the 200 until there is something to say: a
                    # too-short body then gets a clean 400 instead of a
                    # truncated chunked success
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "application/octet-stream")
                    self.send_header("Transfer-Encoding", "chunked")
                    self.send_header("X-Sample-Rate", str(fs))
                    self.send_header("X-Latency-Samples",
                                     str(sess.latency_samples))
                    self.end_headers()
                    started = True
                if out.size:
                    b = out[0].astype("<f4").tobytes()
                    self.wfile.write(f"{len(b):X}\r\n".encode() + b + b"\r\n")
                    self.wfile.flush()

            try:
                pend = b""
                for data in self._request_chunks():
                    pend += data
                    n4 = len(pend) - len(pend) % 4
                    if n4:
                        samples = np.frombuffer(pend[:n4], "<f4")[None, :]
                        pend = pend[n4:]
                        out = sess.feed(samples)
                        if out.size:
                            emit(out)
                final = sess.flush()
                emit(final)  # sends the headers even when final is empty
                self.wfile.write(b"0\r\n\r\n")
            except Exception as e:
                if started:
                    # headers are out: a truncated chunked stream is the
                    # error signal; log and drop the connection
                    self.log_error("stream aborted: %s", e)
                    self.close_connection = True
                else:
                    self._json(400, {"error": f"stream failed: {e}"})

        def do_POST(self):
            from urllib.parse import parse_qs

            path, _, query = self.path.partition("?")
            if path == "/stream":
                return self._do_stream(query)
            # always drain the body first: with HTTP/1.1 keep-alive, unread
            # bytes would desynchronize the next request on the connection
            n = int(self.headers.get("Content-Length", 0))
            body_in = self.rfile.read(n) if n > 0 else b""
            if path != "/enhance":
                return self._json(404, {"error": f"no route {path}"})
            # validate the output subtype BEFORE spending device time
            subtype = parse_qs(query).get("subtype", ["PCM_16"])[0]
            if subtype not in ("PCM_16", "FLOAT"):
                return self._json(
                    400, {"error": f"subtype must be PCM_16 or FLOAT, "
                                   f"got {subtype!r}"})
            try:
                if not body_in:
                    return self._json(400, {"error": "empty body"})
                wav, fs = audio_io.read_bytes(body_in)
            except Exception as e:
                return self._json(400, {"error": f"undecodable audio: {e}"})
            try:
                y = engine.enhance_sync(wav, fs, timeout=600.0)
            except Exception as e:
                return self._json(500, {"error": str(e)})
            body = audio_io.write_bytes(y, fs, subtype=subtype)
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(len(body)))
            self.send_header("X-Sample-Rate", str(fs))
            self.end_headers()
            self.wfile.write(body)

    return ThreadingHTTPServer((host, port), Handler)


def main(args):
    import jax

    if args.device == "cpu":
        # must precede first backend use (CLAUDE.md: env overrides are
        # clobbered by the TPU plugin sitecustomize)
        jax.config.update("jax_platforms", "cpu")

    from urgent2026_challenge_track1_tpu.serving import (
        BatchingEngine,
        make_enhance_fn,
    )
    from urgent2026_challenge_track1_tpu.utils.checkpoint import (
        load_model_for_inference,
    )

    kind, params, model_cfg, stft_cfg = load_model_for_inference(args.ckpt_path)
    platform = jax.devices()[0].platform
    print(f"Loaded {kind} model from {args.ckpt_path} on {platform}")
    if args.mesh:
        from urgent2026_challenge_track1_tpu.parallel import make_mesh
        from urgent2026_challenge_track1_tpu.serving import (
            make_sharded_serving_fn,
        )

        mesh = make_mesh(args.mesh)
        print(f"model-parallel serving over mesh {dict(zip(mesh.axis_names, mesh.devices.shape))}")
        enhance = make_sharded_serving_fn(kind, params, model_cfg, stft_cfg,
                                          mesh, nfe=args.nfe,
                                          solver=args.solver)
    else:
        enhance = make_enhance_fn(kind, params, model_cfg, stft_cfg,
                                  nfe=args.nfe, solver=args.solver)

    if args.warmup_fs:
        # compile the common programs before accepting traffic (first
        # compile is tens of seconds on the TPU tunnel)
        import jax.numpy as jnp
        import numpy as np

        for fs in args.warmup_fs:
            x = jnp.zeros((1, fs), jnp.float32)
            np.asarray(enhance(x, fs, jax.random.PRNGKey(0),
                               jnp.asarray([fs], jnp.int32)))
            print(f"warmed up fs={fs}")

    streamer = None
    if (kind == "discriminative" and getattr(model_cfg, "causal", False)
            and getattr(model_cfg, "streaming_norm", False)):
        from urgent2026_challenge_track1_tpu.models.streaming_causal import (
            StreamingSession,
        )

        def streamer(fs, chunk_frames):
            return StreamingSession(params, model_cfg, stft_cfg, fs,
                                    chunk_frames=chunk_frames)

        print("real-time /stream enabled (causal streaming checkpoint)")

    engine = BatchingEngine(
        enhance, max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
        chunk_seconds=args.chunk_seconds,
    )
    server = make_server(engine, args.host, args.port, platform=platform,
                         streamer=streamer,
                         stream_chunk_frames=args.stream_chunk_frames)
    print(f"serving on http://{args.host}:{args.port} "
          f"(max_batch={args.max_batch}, max_wait={args.max_wait_ms}ms)")

    import signal

    def _graceful(signum, frame):
        # orchestrators send SIGTERM: stop accepting, drain, exit cleanly
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _graceful)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        print("shutting down: draining pending requests")
    finally:
        threading.Thread(target=server.shutdown, daemon=True).start()
        engine.close()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt_path", type=str, required=True,
                        help="Checkpoint: orbax dir or torch .ckpt")
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--device", type=str, default="tpu",
                        help="'cpu' forces the CPU backend")
    parser.add_argument("--max_batch", type=int, default=8,
                        help="flush a (fs, bucket) group at this occupancy")
    parser.add_argument("--max_wait_ms", type=float, default=25.0,
                        help="tail-latency bound: flush the oldest group "
                             "after this wait even if not full")
    parser.add_argument("--nfe", type=int, default=15,
                        help="flow-model sampler steps (ignored for "
                             "discriminative ckpts)")
    parser.add_argument("--solver", type=str, default="euler",
                        choices=["euler", "midpoint", "heun"])
    parser.add_argument("--chunk_seconds", type=float, default=30.0,
                        help="longer inputs stream as fixed overlap-add "
                             "chunks instead of joining a batch")
    parser.add_argument("--mesh", type=str, default="",
                        help="serve model-parallel over a device mesh, e.g. "
                             "'dp=2,mp=4' (batch rows shard over dp, "
                             "recurrence rows over dp x mp)")
    parser.add_argument("--warmup_fs", type=int, nargs="*", default=[],
                        help="sampling rates to pre-compile (e.g. 16000 "
                             "48000) before accepting traffic")
    parser.add_argument("--stream_chunk_frames", type=int, default=8,
                        help="/stream default STFT frames per device step "
                             "(latency = chunk_frames*hop + n_fft//2 "
                             "samples; clients may override per request "
                             "with ?chunk_frames=)")
    main(parser.parse_args())
