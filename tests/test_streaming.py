"""Streaming chunked enhancement: identity/near-identity reconstruction."""

import numpy as np

from urgent2026_challenge_track1_tpu.models.streaming import enhance_streaming


def test_identity_chunking_reconstructs():
    rng = np.random.default_rng(0)
    fs = 8000
    wav = rng.standard_normal(int(fs * 7.3)).astype(np.float32)
    out = enhance_streaming(lambda x, n: x, wav, fs, chunk_seconds=2.0, overlap_seconds=0.25)
    assert out.shape == wav.shape
    np.testing.assert_allclose(out, wav, atol=1e-5)


def test_short_input_single_chunk():
    fs = 8000
    wav = np.ones(1000, np.float32)
    calls = []

    def enh(x, n):
        calls.append((x.shape, n))
        return x * 2.0

    out = enhance_streaming(enh, wav, fs, chunk_seconds=2.0)
    assert len(calls) == 1 and calls[0] == ((1, 16000), 1000)
    np.testing.assert_allclose(out, 2.0 * wav)


def test_all_chunks_same_shape():
    fs = 8000
    wav = np.random.default_rng(1).standard_normal(fs * 11).astype(np.float32)
    shapes = set()
    out = enhance_streaming(
        lambda x, n: (shapes.add(x.shape), x)[1], wav, fs, chunk_seconds=3.0
    )
    assert shapes == {(1, fs * 3)}  # one compiled program
    assert out.shape == wav.shape


def test_callback_valid_lengths():
    """Full chunks report n_valid == chunk (callers skip masking there);
    only the zero-padded final chunk reports a shorter valid length."""
    fs = 8000
    wav = np.ones(int(fs * 4.5), np.float32)
    ns = []
    enhance_streaming(
        lambda x, n: (ns.append((x.shape[1], n)), x)[1], wav, fs,
        chunk_seconds=2.0, overlap_seconds=0.5,
    )
    chunk = 2 * fs
    assert all(shape == chunk for shape, _ in ns)
    assert all(n == chunk for _, n in ns[:-1])
    assert ns[-1][1] < chunk  # padded tail chunk knows its true length


def test_overlap_clamped_to_half_chunk():
    """overlap >= chunk would zero the hop and loop forever (found driving
    the CLI with --chunk_seconds 1.0 against the 1 s default overlap)."""
    fs = 8000
    wav = np.ones(int(fs * 3.5), np.float32)
    out = enhance_streaming(lambda x, n: x, wav, fs,
                            chunk_seconds=1.0, overlap_seconds=1.0)
    assert out.shape == wav.shape
    np.testing.assert_allclose(out, wav, atol=1e-5)
