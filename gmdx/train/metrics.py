"""Scalar metrics logging: tensorboard + JSONL, wandb-compatible hook.

Replaces the reference's accelerate tracker plumbing (``--report_to
tensorboard|wandb|comet``, run config dumped at init —
train_vqgan_lora.py:780-783, train_gm_unet.py:1079-1084). Tensorboard is the
default backend; every scalar also lands in ``metrics.jsonl`` so headless
runs are greppable without any viewer.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(
        self,
        log_dir: str,
        *,
        backend: str = "tensorboard",
        project: str = "gmdx",
        config: Optional[dict] = None,
    ):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if backend == "tensorboard":
            try:
                from flax.metrics import tensorboard

                self._tb = tensorboard.SummaryWriter(log_dir)
            except Exception:  # tb optional; JSONL always works
                self._tb = None
        if config is not None:
            with open(os.path.join(log_dir, f"{project}_config.json"), "w") as f:
                json.dump(
                    {k: v for k, v in config.items() if _jsonable(v)}, f, indent=2
                )

    def log(self, step: int, scalars: Dict[str, float]) -> None:
        rec = {"step": int(step), "time": time.time(), **{
            k: float(v) for k, v in scalars.items()
        }}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.scalar(k, float(v), step)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.flush()


def _jsonable(v) -> bool:
    try:
        json.dumps(v)
        return True
    except TypeError:
        return False


__all__ = ["MetricsLogger"]
