"""Host-side audio I/O and augmentation.

Replaces the reference's torchaudio loading + sox subprocesses
(utils/audio.py:7-61). The hot paths (WAV decode, tempo resample) have a
native C++ core (native/audio_io.cpp, compiled on demand and bound via
ctypes, like the edit-distance kernel) with numerically matching numpy
fallbacks — the reference's audio path was native too (torchaudio C++ +
the sox binary), and decode dominates the cold host-pipeline cost:

* ``load_audio``: WAV (PCM16/PCM32/float32) decode via the stdlib ``wave``
  module, mean over channels (utils/audio.py:7-12 semantics), or ``.npy``
  float arrays (test fixtures).
* ``augment_audio``: random tempo in [0.85, 1.15] via linear-interpolation
  resampling and random gain in [-6, 8] dB (utils/audio.py:49-61 —
  ``augment_audio_with_sox`` semantics without the sox binary).
* ``inject_noise``: mix a random noise-file segment at a random level scaled
  by the energy ratio (utils/data_loader.py:388-399).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import wave
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libaudio.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "audio_io.cpp")
_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _load_native() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if not os.path.exists(_SO_PATH) or (
            os.path.exists(_SRC_PATH)
            and os.path.getmtime(_SRC_PATH) > os.path.getmtime(_SO_PATH)
        ):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 _SRC_PATH, "-o", _SO_PATH],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_SO_PATH)
        lib.wav_probe.restype = ctypes.c_int32
        lib.wav_probe.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_int64),
                                  ctypes.POINTER(ctypes.c_int32)]
        lib.wav_decode.restype = ctypes.c_int32
        lib.wav_decode.argtypes = [ctypes.c_char_p,
                                   ctypes.POINTER(ctypes.c_float),
                                   ctypes.c_int64]
        lib.resample_linear_f32.restype = None
        lib.resample_linear_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float)]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _native_decode(path: str) -> Optional[np.ndarray]:
    lib = _load_native()
    if lib is None:
        return None
    n = ctypes.c_int64()
    sr = ctypes.c_int32()
    p = path.encode()
    if lib.wav_probe(p, ctypes.byref(n), ctypes.byref(sr)) != 0:
        return None  # unsupported codec/container -> Python fallback
    out = np.empty(n.value, np.float32)
    if lib.wav_decode(p, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                      n.value) != 0:
        return None
    return out


def _pcm_to_float(raw: bytes, width: int, path: str) -> np.ndarray:
    if width == 2:
        return np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    if width == 4:
        return np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    if width == 1:
        return (np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
                - 128.0) / 128.0
    if width == 3:  # 24-bit packed
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        y = (b[:, 0].astype(np.int32) | (b[:, 1].astype(np.int32) << 8)
             | (b[:, 2].astype(np.int32) << 16))
        y = np.where(y >= 1 << 23, y - (1 << 24), y)
        return y.astype(np.float32) / float(1 << 23)
    raise ValueError(f"unsupported sample width {width} in {path}")


def _load_wav_riff(path: str) -> np.ndarray:
    """Minimal RIFF/WAVE parser for formats the stdlib ``wave`` module
    rejects: IEEE-float (format 3) and WAVE_FORMAT_EXTENSIBLE (0xFFFE)
    wrapping PCM or float. Covers the float-WAV exports common in
    CommonVoice-style corpora without any native dependency."""
    import struct

    with open(path, "rb") as f:
        header = f.read(12)
        if len(header) < 12 or header[:4] != b"RIFF" or header[8:12] != b"WAVE":
            raise ValueError(
                f"unsupported audio container in {path!r}: not a RIFF/WAVE "
                "file (mp3/flac/ogg need an external decoder; convert to wav "
                "or .npy)"
            )
        fmt = None
        data = None
        while True:
            chunk = f.read(8)
            if len(chunk) < 8:
                break
            cid, size = chunk[:4], struct.unpack("<I", chunk[4:])[0]
            payload = f.read(size + (size & 1))[:size]
            if cid == b"fmt ":
                fmt = payload
            elif cid == b"data":
                data = payload
            if fmt is not None and data is not None:
                break
    if fmt is None or data is None:
        raise ValueError(f"malformed WAV (missing fmt/data chunk): {path!r}")
    (audio_format, n_ch, _rate, _byte_rate, _block, bits) = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if audio_format == 0xFFFE and len(fmt) >= 40:  # EXTENSIBLE: subformat GUID
        audio_format = struct.unpack("<H", fmt[24:26])[0]
    if audio_format == 3:  # IEEE float
        dtype = {32: "<f4", 64: "<f8"}.get(bits)
        if dtype is None:
            raise ValueError(f"unsupported float bit depth {bits} in {path!r}")
        y = np.frombuffer(data, dtype=dtype).astype(np.float32)
    elif audio_format == 1:  # PCM
        y = _pcm_to_float(data, bits // 8, path)
    else:
        raise ValueError(
            f"unsupported WAV codec {audio_format:#x} in {path!r} (only PCM "
            "and IEEE-float are supported; convert compressed audio to wav)"
        )
    if n_ch > 1:
        y = y[: len(y) - len(y) % n_ch].reshape(-1, n_ch).mean(axis=1)
    return np.ascontiguousarray(y, dtype=np.float32)


def load_audio(path: str) -> np.ndarray:
    """Decode an audio file to float32 mono in [-1, 1].

    Fast path: stdlib ``wave`` for plain PCM WAV; fallback: a minimal RIFF
    parser for IEEE-float / extensible WAVs; ``.npy`` arrays for fixtures.
    Non-WAV containers raise a clear error naming the remedy."""
    if path.endswith(".npy"):
        y = np.load(path)
        if y.ndim > 1:
            y = y.mean(axis=-1)
        return y.astype(np.float32)
    y = _native_decode(path)
    if y is not None:
        return y
    try:
        with wave.open(path, "rb") as f:
            n_ch = f.getnchannels()
            width = f.getsampwidth()
            n = f.getnframes()
            raw = f.readframes(n)
    except wave.Error:
        return _load_wav_riff(path)
    y = _pcm_to_float(raw, width, path)
    if n_ch > 1:
        y = y.reshape(-1, n_ch).mean(axis=1)
    return y


def get_audio_length(path: str, sample_rate: int = 16000) -> float:
    """Duration in seconds (utils/audio.py:14-18 soxi parity)."""
    if path.endswith(".npy"):
        return len(np.load(path, mmap_mode="r")) / sample_rate
    with wave.open(path, "rb") as f:
        return f.getnframes() / f.getframerate()


def resample_linear(y: np.ndarray, rate: float) -> np.ndarray:
    """Tempo change by factor ``rate`` (>1 = faster = shorter)."""
    n_out = max(1, int(round(len(y) / rate)))
    lib = _load_native()
    if lib is not None and len(y) > 1:
        y32 = np.ascontiguousarray(y, np.float32)
        out = np.empty(n_out, np.float32)
        lib.resample_linear_f32(
            y32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(y32),
            n_out, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out
    x_old = np.arange(len(y), dtype=np.float64)
    x_new = np.linspace(0, len(y) - 1, n_out)
    return np.interp(x_new, x_old, y).astype(np.float32)


def augment_audio(
    y: np.ndarray,
    rng: np.random.RandomState,
    tempo_range: Tuple[float, float] = (0.85, 1.15),
    gain_range: Tuple[float, float] = (-6.0, 8.0),
) -> np.ndarray:
    """Random tempo + gain perturbation (utils/audio.py:49-61 parity)."""
    tempo = rng.uniform(*tempo_range)
    gain_db = rng.uniform(*gain_range)
    y = resample_linear(y, tempo)
    return (y * (10.0 ** (gain_db / 20.0))).astype(np.float32)


class NoiseInjector:
    """Mix noise-file segments at random SNR (utils/data_loader.py:367-399)."""

    def __init__(
        self,
        noise_dir: str,
        sample_rate: int = 16000,
        noise_levels: Tuple[float, float] = (0.0, 0.5),
    ):
        if not os.path.exists(noise_dir):
            raise IOError(f"Directory doesn't exist: {noise_dir}")
        self.paths = sorted(
            os.path.join(noise_dir, f)
            for f in os.listdir(noise_dir)
            if f.endswith((".wav", ".npy"))
        )
        self.sample_rate = sample_rate
        self.noise_levels = noise_levels

    def inject(self, data: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
        noise_path = self.paths[rng.randint(len(self.paths))]
        noise = load_audio(noise_path)
        level = rng.uniform(*self.noise_levels)
        if len(noise) < len(data):
            reps = int(np.ceil(len(data) / len(noise)))
            noise = np.tile(noise, reps)
        start = rng.randint(0, len(noise) - len(data) + 1)
        seg = noise[start:start + len(data)]
        noise_energy = np.sqrt(seg.dot(seg) / seg.size) + 1e-12
        data_energy = np.sqrt(data.dot(data) / data.size)
        return (data + level * seg * data_energy / noise_energy).astype(
            np.float32
        )
