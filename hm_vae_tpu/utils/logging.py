"""Metric logging: TensorBoard-compatible writer + JSONL fallback.

The reference scrapes trainer attributes matching ``loss|grad|...`` by
reflection into a SummaryWriter (``utils_common.py:138-147``).  Here metrics
are an explicit dict; the writer prefers TensorBoard (available through the
baked-in torch) and always mirrors to a JSONL file for machine reading.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict


class MetricWriter:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def write(self, step: int, metrics: Dict[str, float],
              prefix: str = "") -> None:
        scalars = {
            (prefix + k): float(v) for k, v in metrics.items()
        }
        rec = {"step": int(step), "time": time.time(), **scalars}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, v, step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class NullMetricWriter:
    """No-op writer for non-primary processes in multi-host runs: metrics
    are replicated across processes (the loss is a global-batch mean under
    GSPMD), so only process 0 writes them."""

    def write(self, step, metrics, prefix: str = "") -> None:
        pass

    def close(self) -> None:
        pass


def make_result_folders(output_directory: str):
    """checkpoints/ + images/ under the run dir (utils_common.py:127-136)."""
    image_directory = os.path.join(output_directory, "images")
    checkpoint_directory = os.path.join(output_directory, "checkpoints")
    os.makedirs(image_directory, exist_ok=True)
    os.makedirs(checkpoint_directory, exist_ok=True)
    return checkpoint_directory, image_directory
