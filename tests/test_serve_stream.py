"""POST /stream: real-time full-duplex HTTP enhancement over chunked transfer.

Drives serve.make_server's streaming route against a tiny causal +
streaming_norm model: wire-format parity with the offline forward, true
interleaving (output arrives while the request is still uploading), and the
error paths.  The batching engine is a stub — /stream bypasses it by design
(per-session state cannot batch across requests the way stateless
utterances can).
"""

import http.client
import select
import socket
import threading

import jax
import numpy as np
import pytest

from urgent2026_challenge_track1_tpu.dsp import stft as dsp
from urgent2026_challenge_track1_tpu.models import bsrnn as M
from urgent2026_challenge_track1_tpu.models.streaming_causal import StreamingSession

RNG = np.random.default_rng(11)
STFT_CFG = dsp.STFTConfig(n_fft=960, hop_length=480)


class _StubEngine:
    def snapshot(self):
        return {}

    def enhance_sync(self, wav, fs, timeout=None):  # pragma: no cover
        raise AssertionError("/stream must not touch the batching engine")

    def close(self):
        pass


@pytest.fixture(scope="module")
def stream_server():
    from serve import make_server

    cfg = M.BSRNNConfig(input_dim=481, num_channel=8, num_layer=1,
                        causal=True, streaming_norm=True)
    params = M.init_bsrnn(jax.random.PRNGKey(2), cfg)

    def streamer(fs, chunk_frames):
        return StreamingSession(params, cfg, STFT_CFG, fs,
                                chunk_frames=chunk_frames)

    server = make_server(_StubEngine(), "127.0.0.1", 0, platform="cpu",
                         streamer=streamer, stream_chunk_frames=2)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        yield port, params, cfg
    finally:
        server.shutdown()


def test_stream_parity_with_offline(stream_server):
    port, params, cfg = stream_server
    fs, L = 16000, 7321
    wav = 0.1 * RNG.standard_normal((1, L)).astype(np.float32)

    def chunks():
        raw = wav[0].astype("<f4").tobytes()
        for i in range(0, len(raw), 1600):
            yield raw[i : i + 1600]

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
    conn.request("POST", f"/stream?fs={fs}&chunk_frames=2", body=chunks(),
                 headers={"Transfer-Encoding": "chunked"}, encode_chunked=True)
    r = conn.getresponse()
    assert r.status == 200, r.read()[:300]
    assert int(r.headers["X-Sample-Rate"]) == fs
    assert int(r.headers["X-Latency-Samples"]) > 0
    out = np.frombuffer(r.read(), "<f4")
    assert out.shape == (L,)

    import jax.numpy as jnp

    offline, _ = jax.jit(
        lambda p, x: M.bsrnn_se_apply(p, cfg, STFT_CFG, x, fs)
    )(params, jnp.asarray(wav))
    np.testing.assert_allclose(out, np.asarray(offline)[0], rtol=1e-4,
                               atol=2e-5)


def test_stream_is_full_duplex(stream_server):
    """Enhanced audio arrives while the request body is still open — the
    real-time property a request/response endpoint cannot give."""
    port, _, _ = stream_server
    fs = 16000
    hop, pad = 160, 160
    s = socket.create_connection(("127.0.0.1", port), timeout=300)
    s.sendall(
        (f"POST /stream?fs={fs}&chunk_frames=2 HTTP/1.1\r\n"
         f"Host: x\r\nTransfer-Encoding: chunked\r\n\r\n").encode()
    )
    # feed 2 s of audio (far past the ~3*hop+pad latency), keep body OPEN
    raw = (0.1 * RNG.standard_normal(2 * fs)).astype("<f4").tobytes()
    for i in range(0, len(raw), 4096):
        part = raw[i : i + 4096]
        s.sendall(f"{len(part):X}\r\n".encode() + part + b"\r\n")
    # the server must now be able to respond although the request is unfinished
    got = b""
    deadline = 120.0
    while b"\r\n\r\n" not in got or len(got.split(b"\r\n\r\n", 1)[1]) == 0:
        ready, _, _ = select.select([s], [], [], deadline)
        assert ready, "no streamed response while the request was still open"
        data = s.recv(65536)
        assert data, "server closed the connection mid-stream"
        got += data
    head, body = got.split(b"\r\n\r\n", 1)
    assert b"200" in head.split(b"\r\n", 1)[0]
    assert b"Transfer-Encoding: chunked" in head
    assert len(body) > 0  # output before the terminal request chunk
    # close the stream and drain the rest
    s.sendall(b"0\r\n\r\n")
    while b"0\r\n\r\n" not in got[-(len(got) - len(head)):]:
        data = s.recv(65536)
        if not data:
            break
        got += data
    s.close()


def test_stream_rejects_bad_query(stream_server):
    port, _, _ = stream_server
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("POST", "/stream?fs=12345", body=b"",
                 headers={"Content-Length": "0"})
    r = conn.getresponse()
    assert r.status == 400
    assert b"fs must be" in r.read()
    conn.request("POST", "/stream", body=b"", headers={"Content-Length": "0"})
    r = conn.getresponse()
    assert r.status == 400


def test_stream_unavailable_without_streaming_ckpt():
    from serve import make_server

    server = make_server(_StubEngine(), "127.0.0.1", 0, platform="cpu")
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("POST", "/stream?fs=16000", body=b"\x00" * 8,
                     headers={"Content-Length": "8"})
        r = conn.getresponse()
        assert r.status == 400
        assert b"cannot stream" in r.read()
    finally:
        server.shutdown()
