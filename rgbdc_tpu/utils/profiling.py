"""Profiling + timing instrumentation.

Replaces the reference's cuda.synchronize wall-clock brackets
(testing/tester_single.py:116-121) with `block_until_ready` timers, and its
absent profiler story with `jax.profiler` trace capture:

    with trace_if_enabled():          # RGBDC_TRACE_DIR=/tmp/trace python ...
        ... run workload ...

Traces open in TensorBoard / Perfetto / xprof.
"""

from __future__ import annotations

import contextlib
import os
import time

import jax


@contextlib.contextmanager
def trace_if_enabled(trace_dir: str | None = None):
    """jax.profiler trace over the block when RGBDC_TRACE_DIR (or the
    argument) is set; no-op otherwise."""
    trace_dir = trace_dir or os.environ.get("RGBDC_TRACE_DIR")
    if not trace_dir:
        yield
        return
    with jax.profiler.trace(trace_dir):
        yield


class DeviceTimer:
    """Wall-clock timer that waits for device completion, the
    `cuda.synchronize`-bracketed timing the reference uses."""

    def __init__(self):
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.time() - self._t0
        return False

    @staticmethod
    def sync(*arrays):
        for a in arrays:
            jax.block_until_ready(a)


def setup_seed(seed: int) -> None:
    """Pin all host-side RNGs (reference training/trainer.py:143-147).
    Device randomness in JAX is explicit via PRNG keys, so this covers the
    python/numpy data-pipeline state only."""
    import random

    import numpy as np

    random.seed(seed)
    np.random.seed(seed)
