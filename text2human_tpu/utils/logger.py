"""Logging and metric streaming.

Parity target: reference utils/logger.py (MessageLogger with ETA + TensorBoard
scalars).  TensorBoard is optional; metrics additionally stream to a JSONL
file, which is friendlier for headless TPU jobs.
"""

from __future__ import annotations

import datetime
import json
import logging
import os
import time
from typing import Any, Dict, Optional


def get_root_logger(
    logger_name: str = "base",
    log_level: int = logging.INFO,
    log_file: Optional[str] = None,
) -> logging.Logger:
    logger = logging.getLogger(logger_name)
    logger.setLevel(log_level)  # don't inherit a stricter root level
    fmt = "%(asctime)s.%(msecs)03d - %(levelname)s: %(message)s"
    if not logger.hasHandlers():
        logging.basicConfig(format=fmt, level=log_level)
    if log_file is not None:
        # attach the file handler even on a cached logger (a later run may log
        # to a different experiment dir); drop handlers whose file was deleted
        # (they would keep writing to the unlinked inode)
        target = os.path.abspath(log_file)
        fresh = False
        for h in list(logger.handlers):
            base = getattr(h, "baseFilename", None)
            if base is None:
                continue
            if base == target and os.path.exists(base):
                fresh = True
            else:
                # one active experiment log at a time: drop stale/deleted file
                # handlers so a later run doesn't cross-write the earlier log
                logger.removeHandler(h)
                h.close()
        if not fresh:
            handler = logging.FileHandler(log_file, "a")
            handler.setFormatter(logging.Formatter(fmt))
            handler.setLevel(log_level)
            logger.addHandler(handler)
    return logger


class JsonlWriter:
    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a")

    def write(self, record: Dict[str, Any]):
        self._f.write(json.dumps(record) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()


class MessageLogger:
    """Formatted per-iteration logging with ETA (reference utils/logger.py:6-71)."""

    def __init__(
        self,
        exp_name: str,
        print_freq: int,
        max_iters: int,
        start_iter: int = 1,
        tb_logger=None,
        jsonl_path: Optional[str] = None,
    ):
        self.exp_name = exp_name
        self.interval = print_freq
        self.start_iter = start_iter
        self.max_iters = max_iters
        self.tb_logger = tb_logger
        self.jsonl = JsonlWriter(jsonl_path) if jsonl_path else None
        self.start_time = time.time()
        self.logger = get_root_logger()

    def __call__(self, log_vars: Dict[str, Any]):
        log_vars = dict(log_vars)
        epoch = log_vars.pop("epoch")
        current_iter = log_vars.pop("iter")
        lrs = log_vars.pop("lrs", [])

        message = (
            f"[{self.exp_name[:5]}..][epoch:{epoch:3d}, iter:{current_iter:8,d}, lr:("
        )
        message += ",".join(f"{v:.3e}" for v in lrs) + ")] "

        if "time" in log_vars:
            iter_time = log_vars.pop("time")
            data_time = log_vars.pop("data_time", 0.0)
            total_time = time.time() - self.start_time
            time_sec_avg = total_time / max(current_iter - self.start_iter + 1, 1)
            eta_sec = time_sec_avg * (self.max_iters - current_iter - 1)
            eta_str = str(datetime.timedelta(seconds=int(max(eta_sec, 0))))
            message += f"[eta: {eta_str}, time: {iter_time:.3f}, data_time: {data_time:.3f}] "

        scalars = {}
        for k, v in log_vars.items():
            v = float(v)
            scalars[k] = v
            message += f"{k}: {v:.4e} "
            if self.tb_logger is not None:
                self.tb_logger.add_scalar(k, v, current_iter)
        if self.jsonl is not None:
            self.jsonl.write({"epoch": epoch, "iter": current_iter, **scalars})

        self.logger.info(message)


def init_tb_logger(log_dir: str):
    """TensorBoard writer if the (torch) dependency is available."""
    try:
        from torch.utils.tensorboard import SummaryWriter
    except ImportError:
        return None
    return SummaryWriter(log_dir=log_dir)
