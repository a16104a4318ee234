"""Structured metric sink: JSONL always, wandb when available & configured.

Replaces the reference's wandb-only logging
(reference:utils/train_utils.py:101-104,147-148,229-247) with an offline-first
logger (this framework must run in airgapped TPU pods)."""

from __future__ import annotations

import json
import os
import time
from pathlib import Path
from typing import Optional


class MetricLogger:
    def __init__(self, jsonl_path, project: str = "frankenstein_tpu",
                 use_wandb: Optional[bool] = None):
        self.path = Path(jsonl_path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._fh = open(self.path, "a", buffering=1)
        self._wandb = None
        if use_wandb is None:
            use_wandb = bool(os.environ.get("WANDB_API_KEY"))
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb
                wandb.init(project=project)
            except Exception:
                self._wandb = None

    def log(self, step: int, metrics: dict):
        rec = {"step": int(step), "time": time.time(), **metrics}
        self._fh.write(json.dumps(rec) + "\n")
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self):
        self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()
