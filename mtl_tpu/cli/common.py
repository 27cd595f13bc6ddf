"""Shared CLI assembly: vocab, datasets, model, resume."""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

from ..config import Config
from ..data.dataset import SpectrogramDataset
from ..data.vocab import Vocab
from ..models.transformer import build_model
from ..utils.logger import log_print, setup_logging


def setup(cfg: Config):
    """Logging + banner (meta_transfer_train.py:120-139 parity)."""
    setup_logging(cfg.name, resume=bool(cfg.continue_from))
    log_print("=" * 50)
    log_print("THE EXPERIMENT LOG IS SAVED IN: log/" + cfg.name)
    log_print(f"TRAINING MANIFEST: {cfg.data.train_manifest_list}")
    log_print(f"VALID MANIFEST: {cfg.data.valid_manifest_list}")
    log_print(f"TEST MANIFEST: {cfg.data.test_manifest_list}")
    log_print("=" * 50)
    if cfg.continue_from:
        log_print("RESUME TRAINING")
    else:
        log_print("TRAINING FROM SCRATCH")


def build_vocab(cfg: Config) -> Vocab:
    return Vocab.from_json(cfg.data.labels_path)


def build_datasets(
    cfg: Config, vocab: Vocab
) -> Tuple[SpectrogramDataset, List[SpectrogramDataset]]:
    """Train dataset sees ALL train manifests (task identity is chosen at
    sample() time — meta_transfer_train.py:159-165); one eval dataset per
    valid manifest."""
    train_ds = SpectrogramDataset(
        vocab, cfg, cfg.data.train_manifest_list, normalize=True,
        augment=cfg.audio.augment, is_train=True,
        partitions=cfg.data.train_partition_list, seed=cfg.train.seed,
    )
    valid_sets = [
        SpectrogramDataset(vocab, cfg, [m], normalize=True, augment=False,
                           seed=cfg.train.seed + 1 + i)
        for i, m in enumerate(cfg.data.valid_manifest_list)
    ]
    return train_ds, valid_sets


def build_asr_model(cfg: Config, vocab: Vocab):
    model = build_model(cfg, len(vocab))
    return model


def maybe_resume(cfg: Config):
    """Returns (cfg, vocab, None, start_it, metrics) — rebuilding cfg/vocab
    from the checkpoint like load_meta_model (utils/functions.py:158-188).
    Only the cheap JSON sidecar is read here; the tensor state is restored
    exactly once, inside the trainer, into a typed target (avoids a second
    full restore — ~minutes over a degraded TPU tunnel)."""
    if not cfg.continue_from:
        return cfg, None, None, 0, None
    from ..utils.checkpoint import load_checkpoint_meta

    saved_cfg, vocab, step, metrics = load_checkpoint_meta(cfg.continue_from)
    # CLI manifests/iteration counts may be overridden by the new invocation
    saved_cfg.data = cfg.data
    saved_cfg.train.epochs = cfg.train.epochs
    saved_cfg.continue_from = cfg.continue_from
    saved_cfg.name = cfg.name
    return saved_cfg, vocab, None, step, metrics
