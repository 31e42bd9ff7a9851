"""Scalar metrics logging: tensorboard/wandb + JSONL.

Replaces the reference's accelerate tracker plumbing (``--report_to
tensorboard|wandb|comet``, run config dumped at init —
train_vqgan_lora.py:780-783, train_gm_unet.py:1079-1084). Tensorboard is the
default backend; ``wandb`` is wired when the package is importable (a missing
install raises at construction — no silent downgrade); ``comet`` is rejected
loudly like the reference's other dead flags. Every scalar also lands in
``metrics.jsonl`` so headless runs are greppable without any viewer.
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
        self._wandb = None
        if backend == "tensorboard":
            try:
                from flax.metrics import tensorboard

                self._tb = tensorboard.SummaryWriter(log_dir)
            except Exception:  # tb optional; JSONL always works
                self._tb = None
        elif backend == "wandb":
            try:
                import wandb
            except ImportError as e:
                raise RuntimeError(
                    "--report_to wandb requested but the wandb package is "
                    "not installed; install wandb or use "
                    "tensorboard (metrics.jsonl is always written)"
                ) from e
            self._wandb = wandb.init(
                project=project, dir=log_dir, config=config or {}
            )
        else:
            raise ValueError(
                f"unsupported --report_to backend {backend!r}: gmdx supports "
                "'tensorboard' (default) and 'wandb'. The reference also "
                "advertises 'comet' via accelerate but ships no comet "
                "config; gmdx rejects it loudly rather than silently "
                "logging nowhere."
            )
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
        if self._wandb is not None:
            self._wandb.log(
                {k: float(v) for k, v in scalars.items()}, step=int(step)
            )

    def log_images(self, step: int, images: Dict[str, "object"]) -> None:
        """Log HWC uint8/float arrays (validation grids) to the live backend.

        Mirrors the reference's tracker image logging
        (train_vqgan_lora.py:303-322, train_gm_unet.py:264-279). Disk copies
        are written by the validation code itself; this only feeds viewers.
        """
        if self._tb is not None:
            for k, v in images.items():
                self._tb.image(k, v, step)
        if self._wandb is not None:
            import wandb

            self._wandb.log(
                {k: wandb.Image(v) for k, v in images.items()}, step=int(step)
            )

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.flush()
        if self._wandb is not None:
            self._wandb.finish()


def _jsonable(v) -> bool:
    try:
        json.dumps(v)
        return True
    except TypeError:
        return False


__all__ = ["MetricsLogger"]
