"""Metric logging: stdout + log file + JSONL (TensorBoard-format-free).

Replaces the reference's log_string + SummaryWriter combo (train.py:55-60,
114-116): metrics accumulate per window and flush as one JSONL record per
step, which any dashboard can tail; scalars are also mirrored to
TensorBoard if tensorboardX/torch.utils.tensorboard happens to be available.
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from typing import Any, Dict

import numpy as np


class MetricLogger:
    def __init__(self, log_dir: str, filename: str = "log_train.txt"):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._file = open(os.path.join(log_dir, filename), "a")
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._acc: Dict[str, list] = defaultdict(list)
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(os.path.join(log_dir, "tb"))
        except Exception:
            pass

    def log(self, msg: str) -> None:
        line = f"[{time.strftime('%H:%M:%S')}] {msg}"
        print(line, flush=True)
        self._file.write(line + "\n")
        self._file.flush()

    def accumulate(self, metrics: Dict[str, Any]) -> None:
        for k, v in metrics.items():
            v = float(np.asarray(v))
            if np.isfinite(v):
                self._acc[k].append(v)

    def flush(self, prefix: str, step: int) -> Dict[str, float]:
        means = {k: float(np.mean(v)) for k, v in self._acc.items() if v}
        self._acc.clear()
        record = {"step": step, "prefix": prefix, **means}
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in means.items():
                self._tb.add_scalar(f"{prefix}/{k}", v, step)
        shown = {k: round(v, 4) for k, v in list(means.items())[:6]}
        self.log(f"{prefix} step {step}: {shown}")
        return means
