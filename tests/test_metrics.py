"""CER/WER/segmentation golden-value tests + native/numpy agreement."""

import numpy as np
import pytest

from mtl_tpu.utils import metrics
from mtl_tpu.utils.edit_distance import _load_native, _np_distance, _codes, distance


def test_edit_distance_golden():
    assert distance("kitten", "sitting") == 3
    assert distance("", "abc") == 3
    assert distance("abc", "") == 3
    assert distance("abc", "abc") == 0
    assert distance("你好吗", "你好") == 1


def test_native_matches_numpy():
    rng = np.random.RandomState(0)
    for _ in range(20):
        a = "".join(chr(97 + rng.randint(5)) for _ in range(rng.randint(0, 15)))
        b = "".join(chr(97 + rng.randint(5)) for _ in range(rng.randint(0, 15)))
        assert distance(a, b) == _np_distance(_codes(a), _codes(b))


def test_native_library_builds():
    assert _load_native() is not None, "native C++ edit distance failed to build"


def test_batch_distance():
    from mtl_tpu.utils.edit_distance import distance_batch

    pairs = [("kitten", "sitting"), ("", ""), ("abc", "axc"), ("你好", "你坏")]
    assert distance_batch(pairs) == [3, 0, 1, 1]


def test_wer():
    assert metrics.calculate_wer("the cat sat", "the cat sat") == 0
    assert metrics.calculate_wer("the dog sat", "the cat sat") == 1
    assert metrics.calculate_wer("cat", "the cat sat") == 2


def test_language_segmentation():
    segs = metrics.get_word_segments_per_language("hello 你好 world")
    assert segs == ["hello", "你好", "world"]
    segs = metrics.get_word_segments_per_language("a b 你 好 c")
    assert segs == ["a b", "你 好", "c"]


def test_cer_en_zh():
    en_d, zh_d, en_n, zh_n = metrics.calculate_cer_en_zh(
        "hello 你好", "hallo 你坏"
    )
    assert en_d == 1 and zh_d == 1
    assert en_n == len("hallo") and zh_n == 2
