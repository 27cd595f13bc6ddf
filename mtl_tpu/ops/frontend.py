"""Device-resident log-spectrogram front-end.

Replaces the reference's per-utterance CPU librosa pipeline
(utils/data_loader.py:65-96):

    D = librosa.stft(y, n_fft=sr*win, hop=sr*stride, win_length=n_fft,
                     window=scipy.signal.hamming)       # center=True, reflect
    spect = log1p(|D|); spect = (spect - mean) / std    # per utterance

Instead of librosa's C FFT on the host, the whole padded batch is transformed
on the TPU: framing via a gather, a *DFT-as-matmul* (two real matmuls on the
MXU — for n_fft=320 this beats generic FFT codelets and fuses with the
window), then log1p magnitude and masked per-utterance normalization. The
matmul formulation also makes the Pallas fusion (ops/stft_pallas.py) a drop-in.

Numerical parity notes:
* window: symmetric hamming (scipy.signal.hamming(M) == 0.54-0.46cos(2πn/(M-1)))
  — librosa calls the window callable directly when given a function.
* centering: reflect-pad n_fft//2 on both sides (librosa center=True default).
* normalization: mean/std over the utterance's *valid* frames only, std with
  torch's unbiased (n-1) semantics (spect.std() at utils/data_loader.py:92).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def hamming_window(n: int) -> np.ndarray:
    """Symmetric hamming window, scipy.signal.hamming(n, sym=True) parity."""
    if n == 1:
        return np.ones(1, dtype=np.float32)
    k = np.arange(n, dtype=np.float64)
    return (0.54 - 0.46 * np.cos(2.0 * np.pi * k / (n - 1))).astype(np.float32)


def hann_window(n: int) -> np.ndarray:
    if n == 1:
        return np.ones(1, dtype=np.float32)
    k = np.arange(n, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * k / (n - 1))).astype(np.float32)


def blackman_window(n: int) -> np.ndarray:
    if n == 1:
        return np.ones(1, dtype=np.float32)
    k = np.arange(n, dtype=np.float64)
    w = (0.42 - 0.5 * np.cos(2 * np.pi * k / (n - 1))
         + 0.08 * np.cos(4 * np.pi * k / (n - 1)))
    return w.astype(np.float32)


def bartlett_window(n: int) -> np.ndarray:
    if n == 1:
        return np.ones(1, dtype=np.float32)
    k = np.arange(n, dtype=np.float64)
    return (1.0 - np.abs(2.0 * k / (n - 1) - 1.0)).astype(np.float32)


WINDOWS = {
    "hamming": hamming_window,
    "hann": hann_window,
    "blackman": blackman_window,
    "bartlett": bartlett_window,
}


@functools.lru_cache(maxsize=8)
def dft_matrices(n_fft: int, window: str = "hamming") -> Tuple[np.ndarray, np.ndarray]:
    """Windowed real-DFT basis: (cos [n_fft, F], -sin [n_fft, F]) with the
    window folded in, so spectrogram = frames @ basis (two MXU matmuls)."""
    f = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(f, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    w = WINDOWS[window](n_fft).astype(np.float64)[:, None]
    return (
        (np.cos(ang) * w).astype(np.float32),
        (-np.sin(ang) * w).astype(np.float32),
    )


def num_frames(num_samples: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Frame count for center=True STFT: 1 + n_samples // hop."""
    return 1 + num_samples // hop


def frame_signal(
    audio: jnp.ndarray, n_fft: int, hop: int, prepadded: bool = False
) -> jnp.ndarray:
    """[B, S] -> [B, T, n_fft] frames with center reflect padding.

    T = 1 + S // hop (librosa center=True). ``prepadded=True`` means the host
    already reflect-padded each utterance by n_fft//2 on both sides (see
    data/dataset.py:collate_audio) — required for exact librosa parity on
    zero-padded batches, where device-side reflection would reflect padding
    zeros instead of the true utterance tail. When hop divides n_fft (the
    standard 20ms/10ms config) framing is r slices + a concat over hop-sized
    chunks — compiles to cheap reshapes, no gather.
    """
    pad = n_fft // 2
    if prepadded:
        x = audio
        s = audio.shape[1] - 2 * pad
    else:
        x = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
        s = audio.shape[1]
    b = audio.shape[0]
    n_t = 1 + s // hop
    if n_fft % hop == 0:
        r = n_fft // hop
        need = (n_t - 1 + r) * hop
        if x.shape[1] < need:
            x = jnp.pad(x, ((0, 0), (0, need - x.shape[1])))
        chunks = x[:, :need].reshape(b, -1, hop)  # [B, n_t-1+r, hop]
        return jnp.concatenate(
            [chunks[:, i:i + n_t] for i in range(r)], axis=-1
        )
    idx = jnp.arange(n_t)[:, None] * hop + jnp.arange(n_fft)[None, :]
    return x[:, idx]  # gather -> [B, T, n_fft]


def log_spectrogram(
    audio: jnp.ndarray,  # [B, S] float32 padded waveforms
    audio_lengths: jnp.ndarray,  # [B] valid sample counts
    n_fft: int,
    hop: int,
    window: str = "hamming",
    normalize: bool = True,
    use_pallas: bool = False,
    prepadded: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused STFT -> log1p(|.|) -> masked per-utterance normalize.

    Returns (features [B, T, F], frame_lengths [B]).
    """
    cos_b, nsin_b = dft_matrices(n_fft, window)
    cos_b = jnp.asarray(cos_b)
    nsin_b = jnp.asarray(nsin_b)

    frames = frame_signal(audio, n_fft, hop, prepadded)  # [B, T, n_fft]
    if use_pallas:
        from .stft_pallas import stft_logmag_pallas

        spect = stft_logmag_pallas(frames, cos_b, nsin_b)
    else:
        re = jnp.einsum("btn,nf->btf", frames, cos_b,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        im = jnp.einsum("btn,nf->btf", frames, nsin_b,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        spect = jnp.log1p(jnp.sqrt(re * re + im * im))  # [B, T, F]

    t = spect.shape[1]
    frame_lengths = jnp.minimum(num_frames(audio_lengths, n_fft, hop), t)

    if normalize:
        spect = normalize_per_utterance(spect, frame_lengths)
    # zero padded frames so downstream convs see clean zeros
    valid = (jnp.arange(t)[None, :] < frame_lengths[:, None])[..., None]
    spect = jnp.where(valid, spect, 0.0)
    return spect, frame_lengths


def normalize_per_utterance(
    spect: jnp.ndarray, frame_lengths: jnp.ndarray
) -> jnp.ndarray:
    """Masked per-utterance mean/std normalize; unbiased std (torch parity)."""
    b, t, f = spect.shape
    valid = (jnp.arange(t)[None, :] < frame_lengths[:, None])[..., None]
    n = (frame_lengths * f).astype(jnp.float32)[:, None, None]
    masked = jnp.where(valid, spect, 0.0)
    mean = jnp.sum(masked, axis=(1, 2), keepdims=True) / n
    sq = jnp.where(valid, (spect - mean) ** 2, 0.0)
    var = jnp.sum(sq, axis=(1, 2), keepdims=True) / jnp.maximum(n - 1.0, 1.0)
    return (spect - mean) * jax.lax.rsqrt(var + 1e-12) * valid


# ---------------------------------------------------------------------------
# Log-mel filterbank front-end (python_speech_features.logfbank parity —
# the reference's LogFBankDataset alternative front-end,
# utils/data_loader.py:145-155: logfbank(sig, rate, nfilt=80) with psf
# defaults winlen=0.025, winstep=0.01, nfft=512, preemph=0.97, rectangular
# window, power spectrum |rfft|^2/nfft, log with eps floor).
# ---------------------------------------------------------------------------

def hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=4)
def mel_filterbank(nfilt: int, nfft: int, sample_rate: int,
                   lowfreq: float = 0.0,
                   highfreq: Optional[float] = None) -> np.ndarray:
    """[nfft//2+1, nfilt] triangular mel filters (psf get_filterbanks)."""
    highfreq = highfreq or sample_rate / 2.0
    mels = np.linspace(hz_to_mel(lowfreq), hz_to_mel(highfreq), nfilt + 2)
    bins = np.floor((nfft + 1) * mel_to_hz(mels) / sample_rate).astype(int)
    fbank = np.zeros((nfilt, nfft // 2 + 1), np.float64)
    for j in range(nfilt):
        for i in range(bins[j], bins[j + 1]):
            fbank[j, i] = (i - bins[j]) / max(bins[j + 1] - bins[j], 1)
        for i in range(bins[j + 1], bins[j + 2]):
            fbank[j, i] = (bins[j + 2] - i) / max(bins[j + 2] - bins[j + 1], 1)
    return fbank.T.astype(np.float32)  # [F, nfilt]


def psf_num_frames(num_samples, winlen: int, hop: int):
    """python_speech_features framesig frame count (no centering; final
    partial frame zero-padded)."""
    if isinstance(num_samples, (int, np.integer)):
        if num_samples <= winlen:
            return 1
        return 1 + int(np.ceil((num_samples - winlen) / hop))
    return jnp.where(
        num_samples <= winlen,
        1,
        1 + jnp.ceil((num_samples - winlen) / hop).astype(jnp.int32),
    )


def log_fbank(
    audio: jnp.ndarray,  # [B, S] raw (NOT prepadded) waveforms
    audio_lengths: jnp.ndarray,  # [B]
    sample_rate: int = 16000,
    nfilt: int = 80,
    winlen: float = 0.025,
    winstep: float = 0.01,
    nfft: int = 512,
    preemph: float = 0.97,
    normalize: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused preemphasis -> frame -> |DFT|^2/nfft -> mel -> log, batched on
    device. Returns (features [B, T, nfilt], frame_lengths [B])."""
    win = int(winlen * sample_rate)
    hop = int(winstep * sample_rate)
    b, s = audio.shape

    x = jnp.concatenate(
        [audio[:, :1], audio[:, 1:] - preemph * audio[:, :-1]], axis=1
    )
    # kill the preemphasis artifact at each utterance's zero-pad boundary
    # (x[len] = -preemph * audio[len-1] would otherwise leak into the final
    # frame; psf preemphasizes the unpadded signal)
    x = jnp.where(jnp.arange(s)[None, :] < audio_lengths[:, None], x, 0.0)
    n_t = psf_num_frames(s, win, hop)
    # frame via hop-chunk concat (r chunks cover the window), slice to win
    r = int(np.ceil(win / hop))
    need = (n_t - 1 + r) * hop
    if x.shape[1] < need:
        x = jnp.pad(x, ((0, 0), (0, need - x.shape[1])))
    chunks = x[:, :need].reshape(b, -1, hop)
    frames = jnp.concatenate(
        [chunks[:, i:i + n_t] for i in range(r)], axis=-1
    )[:, :, :win]  # [B, T, win]

    cos_b, nsin_b = dft_matrices_rect(nfft, win)
    re = jnp.einsum("btn,nf->btf", frames, jnp.asarray(cos_b),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    im = jnp.einsum("btn,nf->btf", frames, jnp.asarray(nsin_b),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    power = (re * re + im * im) / nfft
    fb = jnp.asarray(mel_filterbank(nfilt, nfft, sample_rate))
    feat = jnp.einsum("btf,fm->btm", power, fb,
                      preferred_element_type=jnp.float32)
    feat = jnp.log(jnp.maximum(feat, np.finfo(np.float32).eps))

    frame_lengths = jnp.minimum(
        psf_num_frames(audio_lengths, win, hop), feat.shape[1]
    )
    if normalize:
        feat = normalize_per_utterance(feat, frame_lengths)
    valid = (jnp.arange(feat.shape[1])[None, :] < frame_lengths[:, None])[..., None]
    return jnp.where(valid, feat, 0.0), frame_lengths


@functools.lru_cache(maxsize=4)
def dft_matrices_rect(nfft: int, win: int) -> Tuple[np.ndarray, np.ndarray]:
    """Rectangular-window DFT basis truncated to win rows (frames shorter
    than nfft are zero-padded in psf — equivalent to dropping basis rows)."""
    f = nfft // 2 + 1
    n = np.arange(win, dtype=np.float64)[:, None]
    k = np.arange(f, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / nfft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


def log_fbank_oracle(audio: np.ndarray, sample_rate: int = 16000,
                     nfilt: int = 80, winlen: float = 0.025,
                     winstep: float = 0.01, nfft: int = 512,
                     preemph: float = 0.97) -> np.ndarray:
    """Numpy oracle of python_speech_features.logfbank for tests."""
    win = int(winlen * sample_rate)
    hop = int(winstep * sample_rate)
    x = np.append(audio[0], audio[1:] - preemph * audio[:-1])
    n_t = psf_num_frames(len(x), win, hop)
    pad_len = (n_t - 1) * hop + win
    x = np.pad(x, (0, max(0, pad_len - len(x))))
    frames = np.stack([x[i * hop:i * hop + win] for i in range(n_t)])
    spec = np.abs(np.fft.rfft(frames, n=nfft, axis=-1)) ** 2 / nfft
    fb = mel_filterbank(nfilt, nfft, sample_rate)
    feat = spec @ fb
    return np.log(np.maximum(feat, np.finfo(np.float32).eps)).astype(
        np.float32
    )


def log_spectrogram_oracle(
    audio: np.ndarray, n_fft: int, hop: int, window: str = "hamming",
    normalize: bool = True,
) -> np.ndarray:
    """Host/numpy oracle for tests: straightforward rFFT implementation of the
    same math (librosa-equivalent). Returns [T, F] for a single utterance."""
    pad = n_fft // 2
    x = np.pad(audio.astype(np.float64), (pad, pad), mode="reflect")
    w = WINDOWS[window](n_fft).astype(np.float64)
    n_t = 1 + len(audio) // hop
    frames = np.stack([x[i * hop:i * hop + n_fft] * w for i in range(n_t)])
    spec = np.abs(np.fft.rfft(frames, n=n_fft, axis=-1))
    spec = np.log1p(spec)
    if normalize:
        mean = spec.mean()
        std = spec.std(ddof=1)
        spec = (spec - mean) / std
    return spec.astype(np.float32)
