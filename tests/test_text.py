"""Text preprocessing + analyzer tests."""

import numpy as np

from mtl_tpu.data.text import (
    merge_abbreviation,
    preprocess_mixed_language_sentence,
    remove_emojis,
    remove_punctuation,
    remove_special_char,
)


def test_remove_emojis():
    assert remove_emojis("hi 😀 there") == "hi  there"


def test_merge_abbreviation():
    assert merge_abbreviation("u. s. a. today") == "u.s.a. today"
    assert merge_abbreviation("plain words here") == "plain words here"


def test_remove_punctuation_typo_fixes():
    assert "don't" in remove_punctuation("x dont y")
    out = remove_punctuation("hello, world!")
    assert "," not in out and "!" not in out


def test_preprocess_mixed_language_sentence():
    out = preprocess_mixed_language_sentence("Hello (uh) 你好 WORLD!")
    assert "(" not in out and "uh" not in out
    assert "你好" in out
    assert out == out.lower()
    # degenerate sentences reduce to ""
    assert preprocess_mixed_language_sentence("(") == ""
    assert preprocess_mixed_language_sentence("") == ""


def test_segment_wav_corpus(tmp_path):
    from mtl_tpu.data.audio import load_audio
    from mtl_tpu.data.synthetic import write_wav
    from mtl_tpu.data.text import segment_wav_corpus

    sr = 16000
    y = np.sin(np.arange(sr * 2) / sr * 800).astype(np.float32)
    wav = str(tmp_path / "conv.wav")
    write_wav(wav, y, sr)
    tr = tmp_path / "conv.txt"
    tr.write_text("id\t0\t500\tx\thello world\nid\t500\t1500\tx\t你好 there\n")
    out = segment_wav_corpus(wav, str(tr), str(tmp_path / "parts"), sr)
    assert len(out) == 2
    seg0 = load_audio(out[0])
    assert abs(len(seg0) - sr // 2) < 10


def test_analyzer(tmp_path):
    from mtl_tpu.config import Config
    from mtl_tpu.data.dataset import SpectrogramDataset
    from mtl_tpu.data.synthetic import make_synthetic_corpus
    from mtl_tpu.data.vocab import Vocab
    from mtl_tpu.train.analyzer import Analyzer

    manifests, labels = make_synthetic_corpus(
        str(tmp_path / "c"), num_tasks=1, utts_per_task=3, max_sec=0.4
    )
    cfg = Config()
    cfg.data.labels_path = labels
    vocab = Vocab.from_json(labels)
    ds = SpectrogramDataset(vocab, cfg, manifests)
    stats = Analyzer().analyze([ds], out_dir=str(tmp_path / "out"))
    assert stats["dataset_0"]["count"] == 3
    assert stats["dataset_0"]["src_max"] >= stats["dataset_0"]["src_min"]
