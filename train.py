#!/usr/bin/env python
"""CLI entry point — reference-parity flags (see mtl_tpu/cli/asr.py)."""
from mtl_tpu.cli.asr import train_main

if __name__ == "__main__":
    train_main()
