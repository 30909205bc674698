"""Per-phase loggers (reference utils/logger.py:10-23): timestamped file +
stdout, one logger per phase name."""

import logging
import sys
import time
from pathlib import Path


def setup_logger(phase: str, log_dir: str | None = None, level=logging.INFO,
                 screen: bool = True) -> logging.Logger:
    logger = logging.getLogger(phase)
    logger.setLevel(level)
    logger.propagate = False
    if logger.handlers:
        return logger
    fmt = logging.Formatter("%(asctime)s %(levelname)s: %(message)s")
    if log_dir is not None:
        Path(log_dir).mkdir(parents=True, exist_ok=True)
        ts = time.strftime("%y%m%d-%H%M%S")
        fh = logging.FileHandler(Path(log_dir) / f"{phase}_{ts}.log")
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    if screen:
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
    return logger
