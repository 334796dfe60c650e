"""Experiment-directory and seeding helpers (reference utils/util.py)."""

from __future__ import annotations

import os
import random
from typing import Any, Dict

import numpy as np


def make_exp_dirs(opt: Dict[str, Any]):
    """Create the experiment/results tree (reference utils/util.py:14-22).
    Non-debug result dirs must not already exist (exist_ok=False)."""
    path_opt = dict(opt["path"])
    if opt.get("is_train"):
        overwrite = "debug" in opt.get("name", "")
        os.makedirs(path_opt.pop("experiments_root"), exist_ok=overwrite)
        os.makedirs(path_opt.pop("models"), exist_ok=overwrite)
    else:
        os.makedirs(path_opt.pop("results_root"))


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
