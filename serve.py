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
GET  /healthz      liveness + backend platform
GET  /stats        batching statistics (occupancy, waits, errors)

Usage:
  python serve.py --ckpt_path <orbax dir | torch .ckpt> --port 8080
"""

import argparse
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from urgent2026_challenge_track1_tpu.utils import audio_io


def make_server(engine, host: str = "127.0.0.1", port: int = 8080,
                platform: str = "?"):
    """A ThreadingHTTPServer wired to ``engine`` (separated from main() so
    tests can run it on an ephemeral port with a fake engine)."""

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

        def do_POST(self):
            from urllib.parse import parse_qs

            path, _, query = self.path.partition("?")
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

    engine = BatchingEngine(
        enhance, max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
        chunk_seconds=args.chunk_seconds,
    )
    server = make_server(engine, args.host, args.port, platform=platform)
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
    main(parser.parse_args())
