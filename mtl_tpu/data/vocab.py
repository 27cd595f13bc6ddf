"""Character vocabulary with fixed special tokens.

Behavioral parity with the reference `Vocab` (utils/data.py:1-28):
PAD/SOS/EOS/OOV occupy ids 0/1/2/3 and are prepended before any labels from
the labels JSON; duplicate labels are ignored.
"""

from __future__ import annotations

import json
from typing import Iterable, List, Dict


PAD_TOKEN = "<PAD>"
SOS_TOKEN = "<SOS>"
EOS_TOKEN = "<EOS>"
OOV_TOKEN = "<OOV>"

PAD_ID, SOS_ID, EOS_ID, OOV_ID = 0, 1, 2, 3


class Vocab:
    """Label <-> id mapping for the character-level ASR task."""

    PAD_TOKEN = PAD_TOKEN
    SOS_TOKEN = SOS_TOKEN
    EOS_TOKEN = EOS_TOKEN
    OOV_TOKEN = OOV_TOKEN

    PAD_ID = PAD_ID
    SOS_ID = SOS_ID
    EOS_ID = EOS_ID
    OOV_ID = OOV_ID

    def __init__(self) -> None:
        self.special_token_list: List[str] = [
            PAD_TOKEN,
            SOS_TOKEN,
            EOS_TOKEN,
            OOV_TOKEN,
        ]
        self.label2id: Dict[str, int] = {}
        self.id2label: List[str] = []
        for token in self.special_token_list:
            self.add_label(token)

    def add_label(self, label: str) -> None:
        if label not in self.label2id:
            self.label2id[label] = len(self.id2label)
            self.id2label.append(label)

    def __len__(self) -> int:
        return len(self.id2label)

    @property
    def size(self) -> int:
        return len(self.id2label)

    @classmethod
    def from_labels(cls, labels: Iterable[str]) -> "Vocab":
        vocab = cls()
        for label in labels:
            vocab.add_label(label)
        return vocab

    @classmethod
    def from_json(cls, labels_path: str) -> "Vocab":
        """Build a vocab from a labels JSON file (list of characters)."""
        with open(labels_path, encoding="utf-8") as f:
            labels = json.load(f)
        return cls.from_labels(labels)

    def encode_transcript(self, text: str) -> List[int]:
        """Map transcript characters to ids, silently dropping OOV characters.

        Parity with reference utils/data_loader.py:360 which uses
        ``filter(None, [label2id.get(x) ...])`` — note that this also drops
        any character mapping to id 0 (PAD), matching the reference quirk.
        """
        return [
            i
            for i in (self.label2id.get(ch) for ch in text)
            if i  # drops both None (OOV) and 0 (PAD) — reference parity
        ]

    def decode_ids(self, ids: Iterable[int]) -> str:
        return "".join(self.id2label[int(i)] for i in ids)

    def to_dict(self) -> dict:
        return {"labels": list(self.id2label[len(self.special_token_list):])}

    @classmethod
    def from_dict(cls, d: dict) -> "Vocab":
        return cls.from_labels(d["labels"])


def post_process(string: str, special_token_list: Iterable[str]) -> str:
    """Strip special tokens and map the sentencepiece space marker to ' '.

    Parity with reference utils/functions.py:360-364.
    """
    for token in special_token_list:
        string = string.replace(token, "")
    return string.replace("▁", " ")
