"""Coverage for the small utility surfaces: logger (tee semantics) and the
standalone ChineseEnglishTokenizer (segment/merge logic, offline gating)."""

import logging
import sys
import types

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
