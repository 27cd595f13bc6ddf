"""Coverage for the small utility surfaces: logger (tee semantics) and the
standalone ChineseEnglishTokenizer (segment/merge logic, offline gating)."""

import logging
import sys
import types

import numpy as np
import pytest


def test_setup_logging_writes_file_and_resume_appends(tmp_path):
    from mtl_tpu.utils.logger import log_print, setup_logging

    setup_logging("t1", resume=False, log_dir=str(tmp_path))
    log_print("hello-one")
    path = tmp_path / "t1.log"
    assert "hello-one" in path.read_text()

    # fresh (w+) truncates; resume (a+) appends — reference filemode
    # semantics (meta_transfer_train.py:129-139)
    setup_logging("t1", resume=False, log_dir=str(tmp_path))
    log_print("hello-two")
    text = path.read_text()
    assert "hello-one" not in text and "hello-two" in text

    setup_logging("t1", resume=True, log_dir=str(tmp_path))
    log_print("hello-three")
    text = path.read_text()
    assert "hello-two" in text and "hello-three" in text

    # detach the file handler so later tests can't write into tmp_path
    for handler in logging.root.handlers[:]:
        logging.root.removeHandler(handler)


class _FakeHF:
    """Stands in for a HuggingFace tokenizer: id = offset + codepoint."""

    def __init__(self, size):
        self._size = size

    def __len__(self):
        return self._size

    def encode(self, text, add_special_tokens=False):
        return [ord(c) % self._size for c in text if c != " "]

    def decode(self, ids):
        return " ".join(chr(i) for i in ids)


def test_chinese_english_tokenizer_segments_and_offsets(monkeypatch):
    """The hybrid tokenizer routes EN segments to the EN tokenizer, ZH
    segments to the ZH tokenizer with ids offset by the EN vocab size
    (utils/tokenizer.py:22-193)."""
    fake = types.SimpleNamespace(
        AutoTokenizer=types.SimpleNamespace(
            from_pretrained=lambda name, local_files_only=True:
                _FakeHF(200000 if "gpt2" in name else 30000)
        )
    )
    monkeypatch.setitem(sys.modules, "transformers", fake)

    from mtl_tpu.data.tokenizer import ChineseEnglishTokenizer

    tok = ChineseEnglishTokenizer()
    assert len(tok) == 230000

    ids = tok.encode("hi 你好 ok")
    en_sz = tok.en_vocab_size
    # EN ids below the offset, ZH ids above
    assert ids[0] < en_sz and ids[1] < en_sz
    assert ids[2] >= en_sz and ids[3] >= en_sz
    assert ids[4] < en_sz and ids[5] < en_sz

    # roundtrip through decode keeps the language segments in order
    out = tok.decode(ids)
    assert "h" in out and "你好" in out.replace(" ", "")


def test_chinese_english_tokenizer_offline_gate(monkeypatch):
    """Without cached vocabularies construction raises the documented
    error instead of attempting network access."""
    def boom(name, local_files_only=True):
        raise OSError("no cached files")

    fake = types.SimpleNamespace(
        AutoTokenizer=types.SimpleNamespace(from_pretrained=boom))
    monkeypatch.setitem(sys.modules, "transformers", fake)

    from mtl_tpu.data.tokenizer import ChineseEnglishTokenizer

    with pytest.raises(RuntimeError, match="cached GPT2/BERT-zh"):
        ChineseEnglishTokenizer()


def _write_wav(path, data, n_ch=1, fmt="pcm16", rate=16000):
    """Minimal WAV writer covering PCM16/24/32/float32."""
    import struct

    data = np.asarray(data, np.float64).reshape(-1)
    frames = data.reshape(-1, n_ch) if n_ch > 1 else data[:, None]
    if fmt == "pcm16":
        codec, bits = 1, 16
        raw = (np.clip(frames, -1, 1) * 32767).astype("<i2").tobytes()
    elif fmt == "pcm32":
        codec, bits = 1, 32
        raw = (np.clip(frames, -1, 1) * 2147483647).astype("<i4").tobytes()
    elif fmt == "pcm24":
        codec, bits = 1, 24
        v = (np.clip(frames, -1, 1) * ((1 << 23) - 1)).astype(np.int32)
        b = np.zeros((v.size, 3), np.uint8)
        flat = v.reshape(-1)
        b[:, 0] = flat & 0xFF
        b[:, 1] = (flat >> 8) & 0xFF
        b[:, 2] = (flat >> 16) & 0xFF
        raw = b.tobytes()
    elif fmt == "float32":
        codec, bits = 3, 32
        raw = frames.astype("<f4").tobytes()
    else:
        raise ValueError(fmt)
    block = n_ch * bits // 8
    hdr = struct.pack("<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(raw), b"WAVE",
                      b"fmt ", 16, codec, n_ch, rate, rate * block, block,
                      bits, b"data", len(raw))
    with open(path, "wb") as f:
        f.write(hdr + raw)


@pytest.mark.parametrize("fmt,n_ch", [("pcm16", 1), ("pcm16", 2),
                                      ("pcm24", 1), ("pcm32", 1),
                                      ("float32", 1)])
def test_native_wav_decode_matches_python(tmp_path, fmt, n_ch):
    """native/audio_io.cpp decode == the numpy fallback, all codecs."""
    import numpy as np

    from mtl_tpu.data import audio

    rng = np.random.RandomState(0)
    data = rng.uniform(-0.9, 0.9, size=320 * n_ch)
    path = str(tmp_path / f"x_{fmt}_{n_ch}.wav")
    _write_wav(path, data, n_ch=n_ch, fmt=fmt)

    got_native = audio._native_decode(path)
    if got_native is None:
        pytest.skip("native audio lib unavailable")
    # python paths: wave module (pcm) or RIFF parser (float)
    try:
        import wave as _w

        with _w.open(path, "rb") as f:
            raw = f.readframes(f.getnframes())
            y = audio._pcm_to_float(raw, f.getsampwidth(), path)
            if f.getnchannels() > 1:
                y = y.reshape(-1, f.getnchannels()).mean(axis=1)
    except Exception:
        y = audio._load_wav_riff(path)
    np.testing.assert_allclose(got_native, y, atol=2e-7)
    assert got_native.dtype == np.float32

    # load_audio end-to-end prefers the native path and agrees
    np.testing.assert_allclose(audio.load_audio(path), y, atol=2e-7)


def test_native_resample_matches_numpy():
    import numpy as np

    from mtl_tpu.data import audio

    if audio._load_native() is None:
        pytest.skip("native audio lib unavailable")
    rng = np.random.RandomState(1)
    y = rng.randn(1000).astype(np.float32)
    for rate in (0.85, 1.0, 1.15, 2.5):
        got = audio.resample_linear(y, rate)
        n_out = max(1, int(round(len(y) / rate)))
        ref = np.interp(np.linspace(0, len(y) - 1, n_out),
                        np.arange(len(y), dtype=np.float64),
                        y).astype(np.float32)
        np.testing.assert_allclose(got, ref, atol=1e-6)
