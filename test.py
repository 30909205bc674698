#!/usr/bin/env python
"""Top-level test entry (same flags as the reference playground/test.py)."""
import sys

from rgbdc_tpu.cli.test import main

if __name__ == "__main__":
    main(sys.argv[1:])
