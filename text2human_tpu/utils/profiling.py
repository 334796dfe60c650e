"""Profiling and step-timing utilities.

The reference only wall-clocks iterations (train_vqvae.py:80-105).  On TPU we
additionally expose jax.profiler traces (viewable in TensorBoard/XProf) and a
simple per-section timer that forces device completion before reading clocks.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def block_on(tree) -> None:
    """Force completion of every array in a pytree (host sync)."""
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()


class StepTimer:
    """Running mean/percentile step timer with device synchronization."""

    def __init__(self):
        self.times = []

    @contextlib.contextmanager
    def measure(self, result_tree=None):
        t0 = time.perf_counter()
        yield
        if result_tree is not None:
            block_on(result_tree)
        self.times.append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p90_s": float(np.percentile(arr, 90)),
            "steps_per_sec": float(1.0 / arr.mean()),
        }
