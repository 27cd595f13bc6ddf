"""Logging setup: file + stdout, reference log-file semantics.

Parity: every entry point configures ``logging.basicConfig(filename=
"log/<name>.log", filemode="w+" fresh / "a+" resume)`` and mirrors prints
(e.g. meta_transfer_train.py:129-139)."""

from __future__ import annotations

import logging
import os
import sys


def setup_logging(name: str, resume: bool = False, log_dir: str = "log"):
    os.makedirs(log_dir, exist_ok=True)
    for handler in logging.root.handlers[:]:
        logging.root.removeHandler(handler)
    logging.basicConfig(
        filename=os.path.join(log_dir, f"{name}.log"),
        filemode="a+" if resume else "w+",
        format="%(asctime)s - %(message)s",
        level=logging.INFO,
    )
    return logging.getLogger(name)


def log_print(msg: str) -> None:
    print(msg, flush=True)
    logging.info(msg)
