"""Text preprocessing + analyzer tests."""

import numpy as np

from mtl_tpu.data.text import (
    en_tokenize_basic,
    get_word_segments_per_language_with_tokenization,
    merge_abbreviation,
    preprocess_mixed_language_sentence,
    remove_emojis,
    remove_punctuation,
    remove_special_char,
    zh_tokenize_fmm,
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


def test_en_tokenize_basic():
    assert en_tokenize_basic("don't stop") == ["do", "n't", "stop"]
    assert en_tokenize_basic("it's john's, right?") == \
        ["it", "'s", "john", "'s", ",", "right", "?"]


def test_zh_tokenize_fmm():
    # no lexicon: per-character (what the char-level vocab consumes)
    assert zh_tokenize_fmm("你好 世界") == ["你", "好", "世", "界"]
    # with a lexicon: forward maximum matching, longest wins
    lex = {"你好", "世界", "你好世"}
    assert zh_tokenize_fmm("你好世界", lexicon=lex) == ["你好世", "界"]
    assert zh_tokenize_fmm("你好 世界", lexicon=lex) == ["你好", "世界"]


def test_word_segments_with_tokenization():
    seq = "we don't know 你好 世界 okay 再见"
    # tokenize_lang=-1: pure run segmentation, no tokenizer runs
    segs = get_word_segments_per_language_with_tokenization(seq)
    assert segs == ["we don't know", "你好 世界", "okay", "再见"]
    # tokenize_lang=0: English runs PTB-split
    segs = get_word_segments_per_language_with_tokenization(
        seq, tokenize_lang=0)
    assert segs == ["we do n't know", "你好 世界", "okay", "再见"]
    # tokenize_lang=1: mid-sequence ZH runs get spaces stripped then
    # segmented; the FINAL ZH run is tokenized as-is (reference quirk,
    # utils/data.py:185 vs :172)
    segs = get_word_segments_per_language_with_tokenization(
        seq, tokenize_lang=1)
    assert segs == ["we don't know", "你 好 世 界", "okay", "再 见"]
    # the preprocess entry point routes through it
    out = preprocess_mixed_language_sentence(
        "hello 你好世界 friend", tokenize=True, tokenize_lang=1)
    assert out == "hello 你 好 世 界 friend"


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
