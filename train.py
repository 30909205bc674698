#!/usr/bin/env python
"""Top-level train entry (same flags as the reference playground/train.py)."""
import sys

from rgbdc_tpu.cli.train import main

if __name__ == "__main__":
    main(sys.argv[1:])
