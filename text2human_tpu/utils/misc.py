"""Experiment-directory and seeding helpers (reference utils/util.py)."""

from __future__ import annotations

import os
import random
import time
from typing import Any, Dict

import numpy as np


def _mkdir_or_archive(path: str, overwrite: bool):
    """Create ``path``; an existing non-debug dir is renamed away with a
    timestamp suffix instead of aborting the run."""
    if os.path.isdir(path) and not overwrite:
        stamp = time.strftime("%Y%m%d_%H%M%S")
        archived = f"{path}_archived_{stamp}"
        n = 1
        while os.path.exists(archived):  # same-second reruns
            archived = f"{path}_archived_{stamp}_{n}"
            n += 1
        os.rename(path, archived)
    os.makedirs(path, exist_ok=True)


def make_exp_dirs(opt: Dict[str, Any]):
    """Create the experiment/results tree (reference utils/util.py:14-22).

    Training dirs are reusable (``--resume`` needs the checkpoints in place);
    existing inference result dirs are archived with a timestamp instead of
    aborting (the reference hard-fails on both)."""
    path_opt = dict(opt["path"])
    if opt.get("is_train"):
        os.makedirs(path_opt.pop("experiments_root"), exist_ok=True)
        os.makedirs(path_opt.pop("models"), exist_ok=True)
    else:
        overwrite = "debug" in opt.get("name", "")
        _mkdir_or_archive(path_opt.pop("results_root"), overwrite)


def set_random_seed(seed: int):
    """Seed python/numpy (JAX RNG is explicit keys; reference utils/util.py:25-31)."""
    random.seed(seed)
    np.random.seed(seed)


class AverageMeter:
    """Running average (reference utils/util.py:97-123)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class ProgressBar:
    """Minimal terminal progress bar (reference utils/util.py:34-94)."""

    def __init__(self, task_num: int = 0, bar_width: int = 40):
        import sys
        import time as _time

        self.task_num = task_num
        self.bar_width = bar_width
        self.completed = 0
        self.start_time = _time.time()
        self._out = sys.stdout

    def update(self, msg: str = ""):
        import time as _time

        self.completed += 1
        elapsed = max(_time.time() - self.start_time, 1e-9)
        fps = self.completed / elapsed
        if self.task_num > 0:
            pct = self.completed / float(self.task_num)
            filled = int(self.bar_width * pct)
            bar = ">" * filled + "-" * (self.bar_width - filled)
            eta = int(elapsed * (1 - pct) / max(pct, 1e-9) + 0.5)
            self._out.write(
                f"\r[{bar}] {self.completed}/{self.task_num} "
                f"{fps:.1f} it/s eta {eta}s {msg}"
            )
            if self.completed >= self.task_num:
                # terminate the bar line like the reference (utils/util.py:
                # 92-94): later prints must not overwrite/append to it
                self._out.write("\n")
        else:
            self._out.write(
                f"\rcompleted {self.completed} ({fps:.1f} it/s) {msg}"
            )
        self._out.flush()


def enable_compilation_cache(cache_dir: str = ""):
    """Turn on JAX's persistent compilation cache for fast warm starts.

    The full serving pipeline costs 1-2 minutes of XLA compilation cold; with
    the cache a second process start compiles in seconds (BENCHMARKS.md
    "Serving cold start").  Directory precedence: explicit arg >
    $T2H_COMPILE_CACHE > ~/.cache/text2human_tpu/xla.
    """
    import jax

    path = (
        cache_dir
        or os.environ.get("T2H_COMPILE_CACHE")
        or os.path.join(
            os.path.expanduser("~"), ".cache", "text2human_tpu", "xla"
        )
    )
    try:
        os.makedirs(path, exist_ok=True)
    except OSError as e:  # read-only HOME etc. — a cache must never abort a run
        import logging

        logging.getLogger("base").warning(
            "compilation cache disabled (%s: %s)", path, e
        )
        return ""
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
