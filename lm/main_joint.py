#!/usr/bin/env python
"""LM CLI entry point — reference-parity flags (see mtl_tpu/cli/lm.py)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mtl_tpu.cli.lm import main_joint_main

if __name__ == "__main__":
    main_joint_main()
