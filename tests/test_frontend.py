"""Device STFT front-end vs numpy oracle."""

import jax.numpy as jnp
import numpy as np

from mtl_tpu.ops.frontend import (
    WINDOWS,
    dft_matrices,
    log_spectrogram,
    log_spectrogram_oracle,
)


def _tone(n, sr=16000, f0=440.0, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(n) / sr
    return (np.sin(2 * np.pi * f0 * t) + 0.1 * rng.randn(n)).astype(np.float32)


def test_hamming_matches_scipy_formula():
    w = WINDOWS["hamming"](320)
    # endpoints of symmetric hamming
    np.testing.assert_allclose(w[0], 0.08, atol=1e-6)
    np.testing.assert_allclose(w[-1], 0.08, atol=1e-6)
    np.testing.assert_allclose(w[160], max(w), atol=1e-2)


def test_dft_matmul_equals_rfft():
    n_fft = 320
    cos_b, nsin_b = dft_matrices(n_fft, "hamming")
    frame = _tone(n_fft)
    w = WINDOWS["hamming"](n_fft)
    ref = np.fft.rfft(frame * w, n=n_fft)
    re = frame @ cos_b
    im = frame @ nsin_b
    np.testing.assert_allclose(re, ref.real, atol=1e-2)
    np.testing.assert_allclose(im, ref.imag, atol=1e-2)


def test_log_spectrogram_matches_oracle():
    """Production path: host reflect-pads each utterance (collate_audio),
    device STFT runs prepadded — must match the librosa-equivalent oracle on
    BOTH rows of a ragged zero-padded batch."""
    sr, n_fft, hop = 16000, 320, 160
    pad = n_fft // 2
    n1, n2 = 4000, 2560
    a1, a2 = _tone(n1, f0=440), _tone(n2, f0=880, seed=1)
    smax = max(n1, n2)
    batch = np.zeros((2, smax + 2 * pad), np.float32)
    p1 = np.pad(a1, (pad, pad), mode="reflect")
    p2 = np.pad(a2, (pad, pad), mode="reflect")
    batch[0, :len(p1)] = p1
    batch[1, :len(p2)] = p2
    lengths = jnp.array([n1, n2])

    feats, frame_lengths = log_spectrogram(
        jnp.asarray(batch), lengths, n_fft, hop, "hamming", normalize=True,
        prepadded=True,
    )
    t1 = 1 + n1 // hop
    t2 = 1 + n2 // hop
    assert int(frame_lengths[0]) == t1 and int(frame_lengths[1]) == t2
    assert feats.shape == (2, t1, n_fft // 2 + 1)

    o1 = log_spectrogram_oracle(a1, n_fft, hop, "hamming", normalize=True)
    o2 = log_spectrogram_oracle(a2, n_fft, hop, "hamming", normalize=True)
    np.testing.assert_allclose(np.asarray(feats[0, :t1]), o1, atol=5e-3)
    np.testing.assert_allclose(np.asarray(feats[1, :t2]), o2, atol=5e-3)
    # padded frames zeroed
    np.testing.assert_array_equal(np.asarray(feats[1, t2:]), 0.0)


def test_log_fbank_matches_oracle():
    from mtl_tpu.ops.frontend import log_fbank, log_fbank_oracle

    sr = 16000
    n1, n2 = 4000, 2560
    a1, a2 = _tone(n1, f0=440), _tone(n2, f0=880, seed=1)
    batch = np.zeros((2, n1), np.float32)
    batch[0] = a1
    batch[1, :n2] = a2
    feats, fl = log_fbank(jnp.asarray(batch), jnp.array([n1, n2]), sr,
                          nfilt=80, normalize=False)
    o1 = log_fbank_oracle(a1, sr, 80)
    o2 = log_fbank_oracle(a2, sr, 80)
    assert feats.shape[-1] == 80
    t1, t2 = int(fl[0]), int(fl[1])
    assert t1 == o1.shape[0] and t2 == o2.shape[0]
    # f32 device DFT cannot resolve near-zero mel bins the float64 oracle
    # can (log amplifies ~1e-6 absolute power error); compare bins with
    # meaningful energy (log-power > -10 == power > 5e-5)
    for row, o in ((np.asarray(feats[0, :t1]), o1),
                   (np.asarray(feats[1, :t2]), o2)):
        mask = o > -10.0
        assert mask.mean() > 0.5  # most bins carry energy in these tones
        np.testing.assert_allclose(row[mask], o[mask], atol=2e-2)
    np.testing.assert_array_equal(np.asarray(feats[1, t2:]), 0.0)


def test_unnormalized_is_log1p_magnitude():
    sr, n_fft, hop = 16000, 320, 160
    a = _tone(1600)
    feats, _ = log_spectrogram(
        jnp.asarray(a)[None], jnp.array([1600]), n_fft, hop, normalize=False
    )
    o = log_spectrogram_oracle(a, n_fft, hop, normalize=False)
    np.testing.assert_allclose(np.asarray(feats[0]), o, atol=5e-3)
    assert float(feats.min()) >= 0.0  # log1p of magnitude is nonnegative
