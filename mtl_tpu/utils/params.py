"""Parameter utilities.

Parity: compute_num_params (utils/functions.py:36-41) and generate_labels
(:16-34)."""

from __future__ import annotations

from typing import Iterable, List, Tuple

import jax
import numpy as np


def compute_num_params(params) -> Tuple[int, int]:
    """(trainable, non-trainable) parameter counts. JAX params are all
    trainable pytree leaves; the second element exists for reference parity
    (it is always 0 here)."""
    total = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))
    return total, 0


def generate_labels(labels: List[str],
                    special_token_list: Iterable[str]):
    """Build label<->id maps with specials first, skipping duplicates
    (utils/functions.py:16-34)."""
    label2id, id2label = {}, {}
    count = 0
    for token in special_token_list:
        label2id[token] = count
        id2label[count] = token
        count += 1
    for label in labels:
        if label not in label2id:
            label2id[label] = count
            id2label[count] = label
            count += 1
        else:
            print("multiple label: ", label)
    return label2id, id2label
