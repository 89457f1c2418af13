"""Streaming chunked enhancement: identity/near-identity reconstruction."""

import numpy as np

from urgent2026_challenge_track1_tpu.models.streaming import enhance_streaming


def test_identity_chunking_reconstructs():
    rng = np.random.default_rng(0)
    fs = 8000
    wav = rng.standard_normal(int(fs * 7.3)).astype(np.float32)
    out = enhance_streaming(lambda x: x, wav, fs, chunk_seconds=2.0, overlap_seconds=0.25)
    assert out.shape == wav.shape
    np.testing.assert_allclose(out, wav, atol=1e-5)


def test_short_input_single_chunk():
    fs = 8000
    wav = np.ones(1000, np.float32)
    calls = []

    def enh(x):
        calls.append(x.shape)
        return x * 2.0

    out = enhance_streaming(enh, wav, fs, chunk_seconds=2.0)
    assert len(calls) == 1 and calls[0] == (1, 16000)  # fixed chunk shape
    np.testing.assert_allclose(out, 2.0 * wav)


def test_all_chunks_same_shape():
    fs = 8000
    wav = np.random.default_rng(1).standard_normal(fs * 11).astype(np.float32)
    shapes = set()
    out = enhance_streaming(
        lambda x: (shapes.add(x.shape), x)[1], wav, fs, chunk_seconds=3.0
    )
    assert shapes == {(1, fs * 3)}  # one compiled program
    assert out.shape == wav.shape
