"""Metric logging: EMA loss meters and the [METRIC] stdout protocol.

The reference tracks EMA(0.9) running losses for its progress bar
(t2i_moe_gan.py:1441-1458) and emits `[METRIC] name: value` lines scraped
by the SageMaker HPO regex `.*name: ([0-9\\.]+).*`
(sagemaker_train.py:206-228, hyperparameter_tuning.py:213-219). The same
protocol drives this repo's HPO harness, so tuned pipelines port over.
"""

from __future__ import annotations

import json
import logging
import sys
import time
from typing import Mapping

logger = logging.getLogger("moegan_tpu")


class EMAMeter:
    """Exponential-moving-average meters (ref decay 0.9, :1441)."""

    def __init__(self, decay: float = 0.9):
        self.decay = decay
        self.values: dict[str, float] = {}

    def update(self, metrics: Mapping[str, float]) -> dict[str, float]:
        for k, v in metrics.items():
            v = float(v)
            if k in self.values:
                self.values[k] = self.decay * self.values[k] + (1 - self.decay) * v
            else:
                self.values[k] = v
        return dict(self.values)

    def __getitem__(self, k):
        return self.values[k]


class MetricLogger:
    """Structured stdout metrics with [METRIC] HPO protocol + jsonl sink."""

    def __init__(self, jsonl_path: str | None = None, namespace: str = "MoEGAN"):
        self.jsonl_path = jsonl_path
        self.namespace = namespace
        self._fh = open(jsonl_path, "a") if jsonl_path else None

    def log_metric(self, name: str, value: float, step: int | None = None):
        """One `[METRIC] name: value` line (HPO regex contract)."""
        print(f"[METRIC] {name}: {float(value):.6f}", flush=True)
        if self._fh:
            rec = {"ts": time.time(), "name": name, "value": float(value)}
            if step is not None:
                rec["step"] = step
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()

    def log_metrics(self, metrics: Mapping[str, float], step: int | None = None):
        for k, v in metrics.items():
            self.log_metric(k, v, step)

    def log_vector(self, name: str, values, step: int | None = None):
        """Vector-valued observability signal (e.g. per-block expert
        utilization) -> jsonl + a readable stderr line. Not a [METRIC]
        line: the HPO regex only parses scalars."""
        vals = [
            [round(float(x), 6) for x in row] if hasattr(row, "__len__") else round(float(row), 6)
            for row in values
        ]
        self.log_line(f"{name}: {vals}")
        if self._fh:
            rec = {"ts": time.time(), "name": name, "value": vals}
            if step is not None:
                rec["step"] = step
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()

    def log_line(self, msg: str):
        logger.info(msg)
        print(msg, file=sys.stderr, flush=True)

    def close(self):
        if self._fh:
            self._fh.close()
