"""On-device simulation DSP vs the host numpy renderer."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal

from urgent2026_challenge_track1_tpu.simulation import dsp as host
from urgent2026_challenge_track1_tpu.simulation import jax_dsp as dev


@pytest.fixture(scope="module")
def sig():
    rng = np.random.default_rng(0)
    fs = 16000
    t = np.arange(fs) / fs
    speech = (0.3 * np.sin(2 * np.pi * 220 * t) * (np.clip(np.sin(2 * np.pi * 3 * t), 0, None) + 0.1)).astype(np.float64)
    noise = (0.2 * rng.standard_normal(fs)).astype(np.float64)
    return speech, noise, fs


def test_fft_convolve_matches_scipy(sig):
    speech, _, fs = sig
    h = np.zeros(500)
    h[3] = 1.0
    h[100] = 0.5
    ref = scipy.signal.convolve(speech[None], h[None], mode="full")[:, : len(speech)]
    out = np.asarray(dev.fft_convolve(jnp.asarray(speech)[None], jnp.asarray(h)[None]))
    np.testing.assert_allclose(out, ref, atol=1e-5)  # f32 rfft


def test_vad_mask_matches_host(sig):
    speech, _, fs = sig
    x = np.concatenate([np.zeros(4000), speech, np.zeros(4000)])
    ref = host.detect_non_silence(x[None])[0]
    out = np.asarray(dev.detect_non_silence_mask(jnp.asarray(x)[None]))[0]
    # identical on >99% of samples (edge-extension handling may differ by one frame)
    assert (ref == out).mean() > 0.99


def test_mix_at_snr_matches_host(sig):
    speech, noise, fs = sig
    rng = np.random.default_rng(5)
    ref_noisy, ref_noise = host.mix_noise(speech[None].copy(), noise[None].copy(), snr=7.0, rng=rng)
    noisy, scaled = dev.mix_at_snr(
        jnp.asarray(speech)[None], jnp.asarray(noise)[None], jnp.asarray([7.0])
    )
    # same-length noise -> no random offset; compare directly
    np.testing.assert_allclose(np.asarray(noisy), ref_noisy, rtol=2e-3, atol=1e-5)


def test_early_rir_mask(sig):
    _, _, fs = sig
    rir = np.zeros((1, 4000))
    rir[0, 50] = 1.0
    rir[0, 2000] = 0.5
    mask = np.asarray(dev.early_rir_mask(jnp.asarray(rir), fs))
    assert mask[0, 50] == 1.0 and mask[0, 49 + int(0.05 * fs)] == 1.0
    assert mask[0, 50 + int(0.05 * fs)] == 0.0


def test_quantile_clip_matches_host(sig):
    speech, _, fs = sig
    ref = host.clipping(speech[None], 0.05, 0.92)
    out = np.asarray(dev.quantile_clip(jnp.asarray(speech)[None], jnp.asarray([0.05]), jnp.asarray([0.92])))
    np.testing.assert_allclose(out, ref, atol=1e-7)


def test_packet_loss(sig):
    speech, _, fs = sig
    n_packets = len(speech) // (20 * fs // 1000)
    mask = np.ones((1, n_packets), np.float32)
    mask[0, 5] = 0.0
    out = np.asarray(dev.apply_packet_loss(jnp.asarray(speech)[None], jnp.asarray(mask)))
    pk = 20 * fs // 1000
    assert np.all(out[0, 5 * pk : 6 * pk] == 0)
    assert np.allclose(out[0, : 5 * pk], speech[: 5 * pk])


def test_high_pass_matches_host(sig):
    speech, _, fs = sig
    ref = host.high_pass_filter(speech[None], fs)
    out = np.asarray(dev.high_pass(jnp.asarray(speech)[None], fs))
    # same zero-phase response up to edge effects
    err = np.abs(out[0, 500:-500] - ref[0, 500:-500]).max()
    assert err < 5e-3, err


def test_bandwidth_lowpass_removes_band(sig):
    _, _, fs = sig
    t = np.arange(fs) / fs
    x = np.sin(2 * np.pi * 440 * t) + np.sin(2 * np.pi * 7000 * t)
    y = np.asarray(dev.bandwidth_lowpass(jnp.asarray(x)[None], fs, 8000))
    spec = np.abs(np.fft.rfft(y[0]))
    freqs = np.fft.rfftfreq(fs, 1 / fs)
    assert spec[np.abs(freqs - 7000) < 5].max() < spec[np.abs(freqs - 440) < 5].max() * 1e-2


def test_render_batch_end_to_end(sig):
    import jax

    speech, noise, fs = sig
    B, T = 2, len(speech)
    speeches = jnp.asarray(np.stack([speech, speech * 0.5]))
    noises = jnp.asarray(np.stack([noise, noise]))
    rir = np.zeros((B, 2000))
    rir[:, 10] = 1.0
    rir[0, 900] = 0.4  # item 0 reverberant
    n_packets = T // (20 * fs // 1000)
    packet_mask = np.ones((B, n_packets), np.float32)
    packet_mask[1, 3:5] = 0.0
    bw_mask = np.ones((B, T // 2 + 1), np.float32)

    fn = jax.jit(lambda *a: dev.render_batch(*a, fs=fs, highpass=True),)
    target, noisy = fn(
        speeches, noises, jnp.asarray(rir), jnp.asarray([5.0, 10.0]),
        jnp.asarray([1.0, 0.0]), jnp.asarray([0.0, 0.02]), jnp.asarray([1.0, 0.95]),
        jnp.asarray(packet_mask), jnp.asarray(bw_mask),
    )
    target, noisy = np.asarray(target), np.asarray(noisy)
    assert target.shape == noisy.shape == (B, T)
    assert np.isfinite(target).all() and np.isfinite(noisy).all()
    peak = max(np.abs(target).max(), np.abs(noisy).max())
    assert peak <= 0.9 + 1e-5
    # packet loss zeroed item 1's packets
    pk = 20 * fs // 1000
    assert np.abs(noisy[1, 3 * pk : 5 * pk]).max() < 1e-7


def test_quantile_clip_masked_matches_unpadded():
    """Quantiles must be computed over the true item extent: bucket padding
    zeros would otherwise drag both quantiles toward 0 (host renderer
    computes them on the exact-length signal)."""
    import numpy as np

    from urgent2026_challenge_track1_tpu.simulation import jax_dsp

    rng = np.random.default_rng(0)
    x = rng.standard_normal(3000)
    padded = np.zeros(8000)
    padded[:3000] = x
    want = np.asarray(
        jax_dsp.quantile_clip(x[None], np.array([0.05]), np.array([0.95]))
    )[0]
    got = np.asarray(
        jax_dsp.quantile_clip(
            padded[None], np.array([0.05]), np.array([0.95]), lengths=np.array([3000])
        )
    )[0]
    np.testing.assert_allclose(got[:3000], want, rtol=1e-5, atol=1e-6)
    assert np.all(got[3000:] == 0.0), "padding must stay zero"


def test_mix_at_snr_masked_matches_unpadded():
    """Achieved SNR must not depend on bucket padding: VAD statistics are
    computed over the true item extent when lengths is given."""
    import numpy as np

    from urgent2026_challenge_track1_tpu.simulation import jax_dsp

    rng = np.random.default_rng(3)
    T = 32000
    sp = 0.3 * np.sin(2 * np.pi * 220 * np.arange(T) / 16000) * (
        np.clip(np.sin(2 * np.pi * 3 * np.arange(T) / 16000), 0, None) + 0.1
    )
    nz = 0.1 * rng.standard_normal(T)
    want_noisy, want_scaled = jax_dsp.mix_at_snr(
        np.asarray(sp)[None], np.asarray(nz)[None], np.array([10.0])
    )
    padded_sp = np.pad(sp, (0, T))[None]
    padded_nz = np.pad(nz, (0, T))[None]
    got_noisy, got_scaled = jax_dsp.mix_at_snr(
        padded_sp, padded_nz, np.array([10.0]), lengths=np.array([T])
    )
    np.testing.assert_allclose(
        np.asarray(got_scaled)[0, :T], np.asarray(want_scaled)[0], rtol=1e-4
    )


def test_mix_at_snr_short_item_not_silenced():
    """An item shorter than one VAD frame must still get noise mixed (the
    host path returns an all-ones mask for sub-frame signals); an all-False
    mask would scale the noise to exactly zero."""
    import numpy as np

    from urgent2026_challenge_track1_tpu.simulation import jax_dsp

    rng = np.random.default_rng(5)
    T, L = 16000, 600  # item shorter than frame_length=1024
    sp = np.zeros(T)
    sp[:L] = 0.3 * np.sin(2 * np.pi * 200 * np.arange(L) / 16000)
    nz = np.zeros(T)
    nz[:L] = 0.1 * rng.standard_normal(L)
    _, scaled = jax_dsp.mix_at_snr(sp[None], nz[None], np.array([10.0]),
                                   lengths=np.array([L]))
    assert float(np.abs(np.asarray(scaled)[0, :L]).max()) > 1e-4


def test_render_batch_sampled_op_order(sig):
    """Per-item aug_order applies the ops in the SAMPLED chain order (host
    renderer semantics, VERDICT r2 item 9): clipping-then-bandwidth differs
    from bandwidth-then-clipping, and the device output matches a manual
    application in each item's own order."""
    import jax

    speech, noise, fs = sig
    B, T = 2, len(speech)
    speeches = jnp.asarray(np.stack([speech, speech]))
    noises = jnp.asarray(np.stack([noise, noise]))
    rir = np.zeros((B, 100), np.float32)
    rir[:, 0] = 1.0
    n_packets = max(T // (20 * fs // 1000), 1)
    packet_mask = np.ones((B, n_packets), np.float32)
    freqs = np.fft.rfftfreq(T, 1.0 / fs)
    bw_mask = np.tile((freqs <= fs / 8).astype(np.float32), (B, 1))
    clip_lo = jnp.asarray([0.05, 0.05])
    clip_hi = jnp.asarray([0.9, 0.9])
    snr = jnp.asarray([10.0, 10.0])
    no_rir = jnp.asarray([0.0, 0.0])

    def run(order):
        t, n = dev.render_batch(
            speeches, noises, jnp.asarray(rir), snr, no_rir, clip_lo, clip_hi,
            jnp.asarray(packet_mask), jnp.asarray(bw_mask), fs=fs,
            highpass=False, aug_order=jnp.asarray(order, jnp.int32),
        )
        return np.asarray(n)

    # item0: bw->clip->pl; item1: clip->bw->pl — outputs must differ
    mixed = run([[0, 1, 2], [1, 0, 2]])
    same = run([[0, 1, 2], [0, 1, 2]])
    assert np.allclose(mixed[0], same[0], atol=1e-7)
    assert not np.allclose(mixed[1], same[1], atol=1e-5)

    # manual ground truth for item1's order (clip before bw), pre-normalization
    mixed_pre, noise_scaled = dev.mix_at_snr(speeches, noises, snr)
    x = dev.quantile_clip(mixed_pre, clip_lo, clip_hi)
    x = dev.bandwidth_mask_apply(x, jnp.asarray(bw_mask))
    x = dev.apply_packet_loss(x, jnp.asarray(packet_mask))
    peak = jnp.maximum(
        jnp.max(jnp.abs(x), -1),
        jnp.maximum(jnp.max(jnp.abs(speeches), -1), jnp.max(jnp.abs(noise_scaled), -1)),
    )
    manual = np.asarray(x * (0.9 / jnp.maximum(peak, 1e-6))[:, None])
    np.testing.assert_allclose(mixed[1], manual[1], atol=1e-5)


def test_bandwidth_mask_apply_pow2_grid():
    """The pow2-grid bandwidth op (TPU avoids Bluestein at odd T): an
    all-ones mask is a bit-exact identity, and a real cutoff matches the
    direct circular-T brickwall closely away from the edges while killing
    the stop band."""
    import numpy as np

    rng = np.random.default_rng(3)
    fs, T = 16000, 24000          # 1.5 s: NOT a power of two
    B = 2
    x = rng.standard_normal((B, T)).astype(np.float32)
    freqs = np.fft.rfftfreq(T, 1.0 / fs)

    ones = jnp.asarray(np.ones((B, T // 2 + 1), np.float32))
    out = np.asarray(dev.bandwidth_mask_apply(jnp.asarray(x), ones))
    np.testing.assert_allclose(out, x, atol=2e-6)

    bw = 4000.0  # keep content below bw/2
    mask = jnp.asarray(np.tile((freqs <= bw / 2).astype(np.float32), (B, 1)))
    y = np.asarray(dev.bandwidth_mask_apply(jnp.asarray(x), mask))
    Y = np.fft.rfft(y, axis=-1)
    # stop band suppressed by orders of magnitude (not bit-zero: the pow2
    # grid's brickwall lands within one T-grid bin of the requested cutoff)
    stop = np.abs(Y[:, freqs > bw / 2 + 100.0])
    passband = np.abs(Y[:, freqs <= bw / 2 - 50.0])
    assert stop.max() < 0.02 * passband.mean()
    # and the passband matches the direct circular version
    y_circ = np.asarray(
        jnp.fft.irfft(jnp.fft.rfft(jnp.asarray(x), T) * mask, T))
    Yc = np.fft.rfft(y_circ, axis=-1)
    band = freqs <= bw / 2 - 50.0
    np.testing.assert_allclose(
        np.abs(Y[:, band]), np.abs(Yc[:, band]), rtol=0.2, atol=2.0)


def test_bandwidth_mask_prefix_contract():
    """ADVICE r4: bandwidth_mask_apply reconstructs the pow2-grid mask from
    sum(bw_mask) alone, which is exact ONLY for prefix-of-ones masks (the
    only kind collate_device_render builds).  Pin the contract: (a) the
    collate-style mask is a prefix mask per is_prefix_mask; (b) a non-prefix
    (band-stop) mask at non-pow2 T is NOT faithfully applied — so any future
    soft/band-stop mask must fail this check loudly instead of silently
    rendering wrong audio."""
    import numpy as np

    fs, T = 16000, 24000  # non-pow2
    freqs = np.fft.rfftfreq(T, 1.0 / fs)
    prefix = np.tile((freqs <= 2000.0).astype(np.float32), (2, 1))
    assert dev.is_prefix_mask(prefix)
    assert dev.is_prefix_mask(np.ones((2, T // 2 + 1), np.float32))

    bandstop = prefix.copy()
    bandstop[:, freqs <= 1000.0] = 0.0  # kill DC..1 kHz: not a prefix mask
    assert not dev.is_prefix_mask(bandstop)
    soft = prefix * 0.5
    assert not dev.is_prefix_mask(soft)

    # demonstrate the silent misapplication the contract guards against: a
    # faithful band-stop would null the low band; the pow2-grid path (mask
    # rebuilt from sum alone) keeps it nearly intact
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, T)).astype(np.float32)
    y_stop = np.asarray(dev.bandwidth_mask_apply(jnp.asarray(x), jnp.asarray(bandstop)))
    low = freqs <= 900.0
    e_in = np.abs(np.fft.rfft(x, axis=-1))[:, low].mean()
    e_out = np.abs(np.fft.rfft(y_stop, axis=-1))[:, low].mean()
    assert e_out > 0.5 * e_in  # low band survives == mask was misapplied
