"""Metrics logging (reference: TensorBoardLogger + self.log,
centernet_detection.py:393, centernet.py:75-90).

Writes JSONL event streams (always) and TensorBoard summaries when a writer
implementation is importable (torch.utils.tensorboard ships with the baked-in
torch). Scalar-only, append-only, host-side.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Mapping, Optional


class MetricsLogger:
    def __init__(self, log_dir: Optional[str] = None, name: str = "centernet"):
        self.log_dir = log_dir
        self._jsonl = None
        self._tb = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def log_step(self, step: int, metrics: Mapping[str, float]) -> None:
        self._write({"step": step, **metrics})
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, v, step)

    def log_epoch(self, epoch: int, metrics: Mapping[str, float]) -> None:
        self._write({"epoch": epoch, **metrics})
        if self._tb is not None:
            for k, v in metrics.items():
                if isinstance(v, (int, float)):
                    self._tb.add_scalar(k, v, epoch)

    def _write(self, record: Dict) -> None:
        if self._jsonl is not None:
            record = {"time": time.time(), **record}
            self._jsonl.write(json.dumps(record) + "\n")
            self._jsonl.flush()

    def close(self):
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
