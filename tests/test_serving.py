"""Serving runtime: dynamic (fs, bucket) batching engine + HTTP daemon.

No reference counterpart (the reference's inference.py:48-64 loops B=1 over
an scp); these tests pin the TPU-serving contract: grouping by (fs, bucket),
power-of-two padded dispatch, exact-length slicing + 0.9 peak normalization,
max-wait flushes, long-form streaming routing, and the wire format.
"""

import http.client
import threading
import time

import numpy as np
import pytest

from urgent2026_challenge_track1_tpu.serving import BatchingEngine


class FakeEnhance:
    """Records every dispatch; halves the signal (so outputs are checkable
    before normalization)."""

    def __init__(self):
        self.calls = []
        self.lock = threading.Lock()

    def __call__(self, wav, fs, key, lengths):
        wav = np.asarray(wav)
        with self.lock:
            self.calls.append(
                (wav.shape, int(fs),
                 None if lengths is None else np.asarray(lengths).copy())
            )
        return wav * 0.5


def _norm(y):
    return y / (np.abs(y).max() or 1.0) * 0.9


def test_grouping_and_exact_lengths():
    fake = FakeEnhance()
    eng = BatchingEngine(fake, max_batch=4, autostart=False)
    rng = np.random.default_rng(0)
    reqs = []  # mixed rates and lengths -> three (fs, bucket) groups
    for fs, L in [(8000, 6500), (8000, 8000), (8000, 7200),
                  (16000, 12000), (16000, 15999), (8000, 12345)]:
        w = 0.1 * rng.standard_normal(L).astype(np.float32)
        reqs.append((w, fs, eng.submit(w, fs)))

    served = 0
    while eng.step():
        served += 1
    assert served == 3  # one dispatch per (fs, bucket) group

    for w, fs, fut in reqs:
        y = fut.result(timeout=1)
        assert y.shape == w.shape
        np.testing.assert_allclose(y, _norm(w * 0.5), rtol=1e-6)

    # each dispatch is padded to a power of two with filler lengths = bucket
    shapes = sorted(c[0] for c in fake.calls)
    assert shapes == [(1, 16000), (2, 16000), (4, 8000)]
    for shape, fs, lens in fake.calls:
        assert lens.shape[0] == shape[0] and (lens <= shape[1]).all()
        if shape == (4, 8000):  # 3 real requests + 1 filler row
            assert sorted(lens.tolist()) == [6500, 7200, 8000, 8000]

    snap = eng.snapshot()
    assert snap["requests"] == 6 and snap["batches"] == 3
    assert snap["pending"] == 0 and snap["errors"] == 0


def test_full_batch_flush_and_max_batch_split():
    fake = FakeEnhance()
    eng = BatchingEngine(fake, max_batch=4, autostart=False)
    futs = [eng.submit(np.ones(4000, np.float32), 8000) for _ in range(6)]
    assert eng.step(force=False) == 4  # full group flushes without waiting
    assert eng.step(force=False) == 0  # remaining 2 not yet overdue
    assert eng.step(force=True) == 2
    for f in futs:
        f.result(timeout=1)
    assert [c[0][0] for c in fake.calls] == [4, 2]


def test_max_wait_flush_autostarted():
    eng = BatchingEngine(FakeEnhance(), max_batch=64, max_wait_ms=30)
    try:
        t0 = time.monotonic()
        y = eng.enhance_sync(np.ones(1000, np.float32), 8000, timeout=5)
        assert y.shape == (1000,)
        assert time.monotonic() - t0 < 4  # flushed by the timer, not a full batch
    finally:
        eng.close()


def test_long_form_routes_to_streaming():
    calls = []

    def fake(wav, fs, key, lengths):
        calls.append(np.asarray(wav).shape)
        return np.asarray(wav)

    eng = BatchingEngine(fake, chunk_seconds=1.0, normalize=False,
                         autostart=False)
    w = np.sin(np.linspace(0, 100, 3 * 8000 + 123)).astype(np.float32)
    fut = eng.submit(w, 8000)
    assert eng.step() == 1
    y = fut.result(timeout=1)
    assert y.shape == w.shape
    assert all(s == (1, 8000) for s in calls)  # fixed 1 s chunks, B=1
    assert len(calls) >= 3
    np.testing.assert_allclose(y, w, atol=1e-5)  # crossfade of identity
    assert eng.snapshot()["long_form"] == 1


def test_dispatch_error_propagates_to_all_waiters():
    def boom(wav, fs, key, lengths):
        raise RuntimeError("device fell over")

    eng = BatchingEngine(boom, max_batch=2, autostart=False)
    futs = [eng.submit(np.ones(100, np.float32), 8000) for _ in range(2)]
    eng.step()
    for f in futs:
        with pytest.raises(RuntimeError, match="device fell over"):
            f.result(timeout=1)
    assert eng.snapshot()["errors"] == 2


def test_close_drains_pending():
    fake = FakeEnhance()
    eng = BatchingEngine(fake, max_batch=64, max_wait_ms=10_000)
    futs = [eng.submit(np.ones(500, np.float32), 8000) for _ in range(3)]
    eng.close()  # must flush the waiting group before stopping
    for f in futs:
        assert f.result(timeout=1).shape == (500,)
    with pytest.raises(RuntimeError, match="closed"):
        eng.submit(np.ones(10, np.float32), 8000)


def test_engine_with_real_tiny_model():
    import jax

    from urgent2026_challenge_track1_tpu.config import Config
    from urgent2026_challenge_track1_tpu.models import bsrnn as M
    from urgent2026_challenge_track1_tpu.serving import make_enhance_fn
    from urgent2026_challenge_track1_tpu.train.trainer import build_model

    cfg = Config(model_configs={"num_channel": 8, "num_layer": 1})
    bundle = build_model(cfg)
    params = M.init_bsrnn(jax.random.PRNGKey(0), bundle.model_cfg)
    enhance = make_enhance_fn("discriminative", params, bundle.model_cfg,
                              bundle.stft_cfg)
    with BatchingEngine(enhance, max_batch=2, max_wait_ms=20) as eng:
        rng = np.random.default_rng(1)
        futs = [eng.submit(0.1 * rng.standard_normal(L), 8000)
                for L in (6100, 7900, 8000)]
        outs = [f.result(timeout=120) for f in futs]
    for (L, y) in zip((6100, 7900, 8000), outs):
        assert y.shape == (L,)
        assert np.isfinite(y).all()
        assert 0.85 <= np.abs(y).max() <= 0.901


def test_http_server_round_trip(tmp_path):
    from serve import make_server
    from urgent2026_challenge_track1_tpu.utils import audio_io

    eng = BatchingEngine(FakeEnhance(), max_batch=4, max_wait_ms=10)
    server = make_server(eng, "127.0.0.1", 0, platform="cpu")
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)

        conn.request("GET", "/healthz")
        r = conn.getresponse()
        assert r.status == 200 and b'"ok"' in r.read()

        w = 0.25 * np.sin(np.linspace(0, 40, 5000)).astype(np.float32)
        body = audio_io.write_bytes(w, 16000, subtype="FLOAT")
        conn.request("POST", "/enhance?subtype=FLOAT", body=body,
                     headers={"Content-Type": "audio/wav"})
        r = conn.getresponse()
        assert r.status == 200
        assert r.getheader("X-Sample-Rate") == "16000"
        y, fs = audio_io.read_bytes(r.read())
        assert fs == 16000 and y.shape == (5000,)
        np.testing.assert_allclose(y, _norm(w * 0.5), atol=1e-6)

        conn.request("GET", "/stats")
        r = conn.getresponse()
        import json

        stats = json.loads(r.read())
        assert stats["requests"] == 1 and stats["errors"] == 0

        conn.request("POST", "/enhance", body=b"not audio")
        r = conn.getresponse()
        assert r.status == 400 and b"undecodable" in r.read()

        conn.request("POST", "/nope", body=b"x")
        assert conn.getresponse().status == 404
    finally:
        server.shutdown()
        eng.close()


def test_audio_io_bytes_round_trip():
    from urgent2026_challenge_track1_tpu.utils import audio_io

    w = 0.5 * np.sin(np.linspace(0, 30, 4321))
    buf = audio_io.write_bytes(w, 22050)  # PCM_16 default
    y, fs = audio_io.read_bytes(buf)
    assert fs == 22050 and y.shape == w.shape
    np.testing.assert_allclose(y, w, atol=1.0 / 32768)

    buf = audio_io.write_bytes(np.stack([w, -w], 1), 8000, subtype="FLOAT")
    y, fs = audio_io.read_bytes(buf)
    assert fs == 8000 and y.shape == (4321, 2)
    np.testing.assert_allclose(y[:, 0], w, atol=1e-7)

    # flac bytes decode through the same entry point
    from urgent2026_challenge_track1_tpu.utils import flac

    pcm = (0.3 * np.sin(np.linspace(0, 20, 2000))).astype(np.float64)
    y, fs = audio_io.read_bytes(flac.encode(pcm, 16000, bits=16))
    assert fs == 16000 and y.shape == (2000,)
    np.testing.assert_allclose(y, pcm, atol=2.0 / 32768)


def test_engine_with_sharded_serving_fn():
    """Multi-chip serving: BatchingEngine over make_sharded_serving_fn on
    the virtual 8-device mesh matches the single-device engine output."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")

    from urgent2026_challenge_track1_tpu.dsp.stft import STFTConfig
    from urgent2026_challenge_track1_tpu.models import bsrnn as M
    from urgent2026_challenge_track1_tpu.parallel import make_mesh
    from urgent2026_challenge_track1_tpu.serving import (
        make_enhance_fn,
        make_sharded_serving_fn,
    )

    cfg = M.BSRNNConfig(input_dim=481, num_channel=16, num_layer=2,
                        causal=False)
    stft_cfg = STFTConfig(n_fft=960, hop_length=480)
    params = M.init_bsrnn(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh("dp=2,mp=4")
    sharded = make_sharded_serving_fn("discriminative", params, cfg,
                                      stft_cfg, mesh)
    plain = make_enhance_fn("discriminative", params, cfg, stft_cfg)

    rng = np.random.default_rng(7)
    wavs = [0.1 * rng.standard_normal(L).astype(np.float32)
            for L in (6100, 8000, 7333)]
    with BatchingEngine(sharded, max_batch=4, max_wait_ms=20) as eng:
        got = [f.result(timeout=300)
               for f in [eng.submit(w, 8000) for w in wavs]]
    with BatchingEngine(plain, max_batch=4, max_wait_ms=20) as eng:
        ref = [f.result(timeout=300)
               for f in [eng.submit(w, 8000) for w in wavs]]
    for g, r, w in zip(got, ref, wavs):
        assert g.shape == w.shape
        np.testing.assert_allclose(g, r, atol=3e-5)


def test_engine_recovers_after_dispatch_error():
    """One failed batch must not wedge the worker: later requests succeed."""
    state = {"n": 0}

    def flaky(wav, fs, key, lengths):
        state["n"] += 1
        if state["n"] == 1:
            raise RuntimeError("transient device error")
        return np.asarray(wav) * 0.5

    with BatchingEngine(flaky, max_batch=1, max_wait_ms=5,
                        max_retries=0) as eng:
        w = np.ones(800, np.float32)
        with pytest.raises(RuntimeError, match="transient"):
            eng.enhance_sync(w, 8000, timeout=5)
        y = eng.enhance_sync(w, 8000, timeout=5)
    np.testing.assert_allclose(y, _norm(w * 0.5), rtol=1e-6)


def test_dispatch_retries_transient_failure():
    """Default max_retries=1: a batch that fails once (e.g. a crashed TPU
    worker) is re-dispatched and the request still succeeds."""
    state = {"n": 0}

    def flaky(wav, fs, key, lengths):
        state["n"] += 1
        if state["n"] == 1:
            raise RuntimeError("UNAVAILABLE: TPU worker process crashed")
        return np.asarray(wav) * 0.5

    eng = BatchingEngine(flaky, max_batch=2, autostart=False)
    w = np.ones(800, np.float32)
    fut = eng.submit(w, 8000)
    assert eng.step() == 1
    np.testing.assert_allclose(fut.result(timeout=1), _norm(w * 0.5),
                               rtol=1e-6)
    snap = eng.snapshot()
    assert snap["retries"] == 1 and snap["errors"] == 0


def test_engine_stress_concurrent_submitters():
    """Many threads x mixed (fs, length) requests: every future resolves to
    its own enhanced audio (no cross-request mixups under concurrency)."""
    from concurrent.futures import ThreadPoolExecutor

    with BatchingEngine(FakeEnhance(), max_batch=4, max_wait_ms=5) as eng:
        rng = np.random.default_rng(3)
        cases = []
        for i in range(60):
            fs = int(rng.choice([8000, 16000]))
            L = int(rng.integers(fs // 2, 2 * fs))
            # unique constant per request -> a mixup would be detected
            cases.append((np.full(L, 0.001 * (i + 1), np.float32), fs))

        def one(case):
            w, fs = case
            return eng.enhance_sync(w, fs, timeout=30)

        with ThreadPoolExecutor(8) as pool:
            outs = list(pool.map(one, cases))
        snap = eng.snapshot()
    for (w, fs), y in zip(cases, outs):
        assert y.shape == w.shape
        np.testing.assert_allclose(y, _norm(w * 0.5), rtol=1e-5)
    assert snap["requests"] == 60 and snap["errors"] == 0
    assert snap["batches"] < 60  # batching actually happened


def test_serve_cli_subprocess_end_to_end(tmp_path):
    """The real daemon CLI (serve.py subprocess on CPU): checkpoint load,
    warmup, HTTP enhance — output bit-identical to the in-process jitted
    path on the same orbax checkpoint."""
    import socket
    import subprocess
    import sys
    from pathlib import Path

    import jax

    from urgent2026_challenge_track1_tpu.config import Config
    from urgent2026_challenge_track1_tpu.models import bsrnn as M
    from urgent2026_challenge_track1_tpu.serving import make_enhance_fn
    from urgent2026_challenge_track1_tpu.train.trainer import (
        CheckpointIO,
        TrainState,
        build_model,
        make_optimizer,
    )
    from urgent2026_challenge_track1_tpu.utils import audio_io

    repo = Path(__file__).parent.parent
    cfg = Config(model_configs={"num_channel": 8, "num_layer": 1})
    bundle = build_model(cfg)
    params = M.init_bsrnn(jax.random.PRNGKey(0), bundle.model_cfg)
    opt = make_optimizer(cfg)
    state = TrainState(params, opt.init(params), None, step=1, epoch=0)
    CheckpointIO(str(tmp_path / "ckpt"), save_top_k=1).save(
        1, state, val_loss=1.0, config_dict=cfg.to_dict()
    )

    with socket.socket() as s:  # a free ephemeral port for the daemon
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    # deliberate deviation from the repo PYTHONPATH rule: /root/.axon_site
    # is EXCLUDED so the child daemon runs on genuine CPU (serve.py
    # --device cpu also guards this; belt and braces for CI boxes)
    proc = subprocess.Popen(
        [sys.executable, str(repo / "serve.py"), "--ckpt_path",
         str(tmp_path / "ckpt"), "--device", "cpu", "--port", str(port),
         "--max_batch", "2", "--max_wait_ms", "10"],
        cwd=str(repo), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": str(repo)},
    )
    try:
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            try:
                conn = http.client.HTTPConnection("127.0.0.1", port,
                                                  timeout=5)
                conn.request("GET", "/healthz")
                if conn.getresponse().status == 200:
                    break
            except OSError:
                assert proc.poll() is None, proc.stdout.read()[-2000:]
                time.sleep(0.5)
        else:
            raise AssertionError("daemon never became healthy")

        fs, L = 16000, 13000
        rng = np.random.default_rng(5)
        w = (0.1 * rng.standard_normal(L)).astype(np.float32)
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        conn.request("POST", "/enhance", body=audio_io.write_bytes(w, fs))
        r = conn.getresponse()
        assert r.status == 200, r.read()[-500:]
        served, got_fs = audio_io.read_bytes(r.read())
        assert got_fs == fs and served.shape == (L,)

        # the exact bytes the in-process jitted path would produce, loading
        # the checkpoint the same way the daemon does (inference-mode
        # compute dtype comes from load_model_for_inference, not Config)
        from urgent2026_challenge_track1_tpu.utils.checkpoint import (
            load_model_for_inference,
        )

        kind, lparams, lcfg, lstft = load_model_for_inference(
            str(tmp_path / "ckpt")
        )
        enhance = make_enhance_fn(kind, lparams, lcfg, lstft)
        import jax.numpy as jnp

        bucket = -(-L // fs) * fs
        x = np.zeros((1, bucket), np.float32)
        x[0, :L] = w
        ref = np.asarray(enhance(jnp.asarray(x), fs, jax.random.PRNGKey(0),
                                 jnp.asarray([L], np.int32)))[0, :L]
        ref = ref / (np.abs(ref).max() or 1.0) * 0.9
        ref_pcm, _ = audio_io.read_bytes(audio_io.write_bytes(ref, fs))
        # bf16-tolerance, not bit-equality: this test process forces the
        # 8-virtual-device XLA CPU config (conftest) while the daemon child
        # runs the default one, and XLA CPU's bf16 matmul reduction order is
        # not stable across configs (identically-configured processes ARE
        # bit-identical — verified vs the inference.py CLI).
        np.testing.assert_allclose(served, ref_pcm, atol=5e-3)
        num = np.sum(ref_pcm * ref_pcm)
        den = np.sum((served - ref_pcm) ** 2) or 1e-12
        assert 10 * np.log10(num / den) > 35  # same enhancement, high SNR
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()


def test_submit_rejects_bad_inputs():
    with BatchingEngine(FakeEnhance(), autostart=False) as eng:
        for bad in (np.float32(0.5), np.zeros((10, 0), np.float32),
                    np.zeros((2, 3, 4), np.float32), np.zeros(0, np.float32)):
            with pytest.raises(ValueError):
                eng.submit(bad, 8000)
        with pytest.raises(ValueError):
            eng.submit(np.ones(100, np.float32), 0)
        # (T, C) stereo takes channel 0
        w2 = np.stack([np.ones(50, np.float32), -np.ones(50, np.float32)], 1)
        fut = eng.submit(w2, 8000)
        eng.step()
        np.testing.assert_allclose(fut.result(timeout=1),
                                   _norm(np.ones(50) * 0.5), rtol=1e-6)


def test_dispatch_watchdog_visible_in_snapshot():
    """A wedged backend shows up as a growing dispatch_in_flight_s (the
    dead-tunnel failure mode blocks PJRT calls forever; /stats must show it)."""
    import threading as th

    release = th.Event()

    def wedged(wav, fs, key, lengths):
        release.wait(10)
        return np.asarray(wav)

    with BatchingEngine(wedged, max_batch=1, max_wait_ms=5,
                        normalize=False) as eng:
        assert eng.snapshot()["dispatch_in_flight_s"] == 0.0
        fut = eng.submit(np.ones(100, np.float32), 8000)
        deadline = time.monotonic() + 5
        while time.monotonic() < deadline:
            if eng.snapshot()["dispatch_in_flight_s"] > 0.05:
                break
            time.sleep(0.02)
        else:
            raise AssertionError("watchdog never showed the stuck dispatch")
        release.set()
        fut.result(timeout=5)
        assert eng.snapshot()["dispatch_in_flight_s"] == 0.0


def test_cancelled_future_does_not_kill_worker():
    """fut.cancel() on a queued request must drop it, not wedge the engine
    (set_result on a cancelled Future raises InvalidStateError)."""
    fake = FakeEnhance()
    with BatchingEngine(fake, max_batch=4, max_wait_ms=10_000) as eng:
        doomed = eng.submit(np.ones(100, np.float32), 8000)
        assert doomed.cancel()
        ok = eng.submit(2 * np.ones(100, np.float32), 8000)
        # force the flush via a full batch (generous timeouts: first-use
        # jax init on a loaded 1-CPU host can take several seconds)
        more = [eng.submit(np.ones(100, np.float32), 8000) for _ in range(3)]
        y = ok.result(timeout=60)
        np.testing.assert_allclose(y, _norm(np.ones(100)), rtol=1e-6)
        for f in more:
            f.result(timeout=60)
        # the worker survived; a fresh request still completes
        assert eng.enhance_sync(np.ones(50, np.float32), 8000,
                                timeout=60).shape == (50,)


def test_long_form_does_not_starve_short_requests():
    """FIFO by head age: an older short request dispatches before a newer
    long-form one (and vice versa)."""
    # both dispatch shapes are (1, 8000) (bucket padding == chunk size), so
    # discriminate by lengths: the short batch carries [4000], streaming's
    # full chunks carry None
    order = []

    def fake(wav, fs, key, lengths):
        order.append(None if lengths is None
                     else int(np.asarray(lengths)[0]))
        return np.asarray(wav)

    eng = BatchingEngine(fake, chunk_seconds=1.0, max_batch=8,
                         normalize=False, autostart=False)
    short = eng.submit(np.ones(4000, np.float32), 8000)   # older
    time.sleep(0.01)
    longf = eng.submit(np.ones(2 * 8000 + 5, np.float32), 8000)  # newer, long
    assert eng.step() == 1 and order == [4000]          # short first
    assert eng.step() == 1                              # then the long one
    short.result(timeout=1), longf.result(timeout=1)

    order.clear()
    longf = eng.submit(np.ones(2 * 8000 + 5, np.float32), 8000)  # older, long
    time.sleep(0.01)
    short = eng.submit(np.ones(4000, np.float32), 8000)  # newer
    assert eng.step() == 1 and order[0] is None         # long first (chunks)
    assert eng.step() == 1 and order[-1] == 4000
    short.result(timeout=1), longf.result(timeout=1)


def test_http_bad_subtype_and_keepalive_after_404(tmp_path):
    from serve import make_server
    from urgent2026_challenge_track1_tpu.utils import audio_io

    eng = BatchingEngine(FakeEnhance(), max_batch=4, max_wait_ms=10)
    server = make_server(eng, "127.0.0.1", 0, platform="cpu")
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        w = 0.2 * np.ones(3000, np.float32)
        body = audio_io.write_bytes(w, 8000)

        # invalid subtype -> clean 400 BEFORE any device work
        conn.request("POST", "/enhance?subtype=PCM_24", body=body)
        r = conn.getresponse()
        assert r.status == 400 and b"subtype" in r.read()

        # a 404 POST with a body must not desync the keep-alive connection
        conn.request("POST", "/nope", body=body)
        r = conn.getresponse()
        assert r.status == 404
        r.read()  # keep-alive: consume the 404 body before reusing

        conn.request("POST", "/enhance", body=body)  # same connection
        r = conn.getresponse()
        assert r.status == 200
        y, fs = audio_io.read_bytes(r.read())
        assert fs == 8000 and y.shape == (3000,)
    finally:
        server.shutdown()
        eng.close()


def test_sharded_serving_fn_pads_batch_to_dp_multiple():
    """B=1 (timer flushes, warmup, long-form chunks) must work on a dp>1
    mesh: the wrapper pads rows to a dp multiple and slices back."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")

    import jax.numpy as jnp

    from urgent2026_challenge_track1_tpu.dsp.stft import STFTConfig
    from urgent2026_challenge_track1_tpu.models import bsrnn as M
    from urgent2026_challenge_track1_tpu.parallel import make_mesh
    from urgent2026_challenge_track1_tpu.serving import (
        make_enhance_fn,
        make_sharded_serving_fn,
    )

    cfg = M.BSRNNConfig(input_dim=481, num_channel=16, num_layer=2,
                        causal=False)
    stft_cfg = STFTConfig(n_fft=960, hop_length=480)
    params = M.init_bsrnn(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh("dp=2,mp=4")
    sharded = make_sharded_serving_fn("discriminative", params, cfg,
                                      stft_cfg, mesh)
    plain = make_enhance_fn("discriminative", params, cfg, stft_cfg)

    rng = np.random.default_rng(9)
    for B in (1, 3):  # both indivisible by dp=2
        x = jnp.asarray(0.1 * rng.standard_normal((B, 8000))
                        .astype(np.float32))
        lens = jnp.asarray([8000] * B, np.int32)
        got = np.asarray(sharded(x, 8000, jax.random.PRNGKey(0), lens))
        ref = np.asarray(plain(x, 8000, jax.random.PRNGKey(0), lens))
        assert got.shape == (B, 8000)
        np.testing.assert_allclose(got, ref, atol=3e-5)
    # lengths=None (full streaming chunk) also works at B=1
    x = jnp.asarray(0.1 * rng.standard_normal((1, 8000)).astype(np.float32))
    got = np.asarray(sharded(x, 8000, jax.random.PRNGKey(0), None))
    assert got.shape == (1, 8000)


def test_engine_with_flow_model():
    """The generative family through the engine: flowse_enhance consumes the
    per-batch PRNG key and lengths via the same make_enhance_fn contract."""
    import jax

    from urgent2026_challenge_track1_tpu.models import bsrnn_flowse as FM
    from urgent2026_challenge_track1_tpu.serving import make_enhance_fn

    fcfg = FM.FlowSEConfig(n_fft=960, hop_length=480, bsrnn_hidden=8,
                           num_layer=1)
    params = FM.init_flowse(jax.random.PRNGKey(0), fcfg)
    enhance = make_enhance_fn("flowse", params, fcfg, fcfg.stft_cfg, nfe=2)
    rng = np.random.default_rng(2)
    with BatchingEngine(enhance, max_batch=2, max_wait_ms=20) as eng:
        futs = [eng.submit(0.1 * rng.standard_normal(L), 8000)
                for L in (6100, 8000)]
        outs = [f.result(timeout=300) for f in futs]
    for L, y in zip((6100, 8000), outs):
        assert y.shape == (L,)
        assert np.isfinite(y).all()
        assert 0.85 <= np.abs(y).max() <= 0.901
