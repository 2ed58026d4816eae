"""Metrics logging: JSONL file logger with optional wandb passthrough.

The reference logs per-epoch metrics to Weights & Biases
(training/trainer.py:106-111, 267).  This environment has no egress, so the
default sink is an append-only JSONL file (one metrics dict per line, with a
wall-clock timestamp); if wandb is importable AND WANDB_API_KEY is configured,
metrics are mirrored there too.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, out_dir: str, run_name: str, project: str = "EgoNN_GL",
                 config: Optional[Dict] = None, use_wandb: str = "auto"):
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, f"{run_name}.metrics.jsonl")
        self._fh = open(self.path, "a")
        self._wandb = None
        if use_wandb in ("auto", "on"):
            try:
                import wandb  # type: ignore

                if os.environ.get("WANDB_API_KEY") or use_wandb == "on":
                    self._wandb = wandb
                    wandb.init(project=project, name=run_name, config=config or {})
            except Exception:
                self._wandb = None
        if config:
            self.log({"_config": _jsonable(config)})

    def log(self, metrics: Dict):
        rec = {"_ts": time.time(), **_jsonable(metrics)}
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self._wandb is not None:
            try:
                self._wandb.log(metrics)
            except Exception:
                pass

    def close(self):
        self._fh.close()
        if self._wandb is not None:
            try:
                self._wandb.finish()
            except Exception:
                pass


def _jsonable(x):
    if isinstance(x, dict):
        return {str(k): _jsonable(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_jsonable(v) for v in x]
    if hasattr(x, "item") and getattr(x, "size", 2) == 1:
        return x.item()
    if hasattr(x, "tolist"):
        return x.tolist()
    if isinstance(x, (int, float, str, bool)) or x is None:
        return x
    return str(x)
