#!/usr/bin/env python
"""CLI entry point — reference-parity flags (see mtl_tpu/cli/asr.py)."""
from mtl_tpu.cli.asr import test_main

if __name__ == "__main__":
    test_main()
