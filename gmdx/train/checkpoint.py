"""Orbax checkpointing: step-numbered dirs, keep-N pruning, "latest" resume.

Reference behavior being matched (SURVEY.md §5.4):
  * ``accelerator.save_state(output_dir/checkpoint-{step})`` every N steps
    with ``--checkpoints_total_limit`` oldest-first pruning
    (train_gm_unet.py:1224-1248);
  * ``--resume_from_checkpoint {path|latest}`` where "latest" scans for the
    max step suffix (train_gm_unet.py:1105-1131).

Orbax's CheckpointManager provides the step numbering, pruning, and atomic
writes natively; this module pins the layout and adds the "latest"/path
resolution so the CLI flags keep their reference semantics.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import orbax.checkpoint as ocp


def make_manager(
    output_dir: str,
    *,
    max_to_keep: Optional[int] = None,
    item_names: Optional[tuple] = None,
    async_checkpointing: bool = False,
) -> ocp.CheckpointManager:
    """``async_checkpointing=True`` (--async_checkpointing in the trainer
    CLIs): orbax blocks only until the state is copied off the device, then
    commits the write on a background thread — the train loop keeps
    dispatching while the checkpoint streams to disk. Saves stay atomic
    (tmp dir + rename), so a kill mid-write never yields a half checkpoint
    that ``resolve_resume_step`` could pick up; call
    ``manager.wait_until_finished()`` before relying on durability (the
    CLIs do at exit). The reference's accelerate.save_state is fully
    synchronous (train_gm_unet.py:1246)."""
    options = ocp.CheckpointManagerOptions(
        max_to_keep=max_to_keep,
        step_prefix="checkpoint",
        create=True,
        enable_async_checkpointing=async_checkpointing,
    )
    return ocp.CheckpointManager(
        os.path.abspath(output_dir), options=options, item_names=item_names
    )


def save_state(
    manager: ocp.CheckpointManager, step: int, state: Any, *, wait: bool = True
) -> None:
    """``wait=False`` pairs with an async manager: returns once the state
    is safely copied to host (device buffers free to be donated by the next
    train step), leaving the disk write in flight."""
    manager.save(step, args=ocp.args.StandardSave(state))
    if wait:
        manager.wait_until_finished()


def restore_state(
    manager: ocp.CheckpointManager, step: int, abstract_state: Any
) -> Any:
    return manager.restore(step, args=ocp.args.StandardRestore(abstract_state))


def resolve_resume_step(output_dir: str, resume_from: str) -> Optional[int]:
    """Map ``--resume_from_checkpoint {latest|path|step}`` to a step number.

    Returns None when nothing to resume (the reference logs a warning and
    starts fresh, train_gm_unet.py:1116-1121).
    """
    if resume_from is None:
        return None
    if resume_from != "latest":
        m = re.search(r"checkpoint[-_](\d+)$", resume_from.rstrip("/"))
        if m:
            return int(m.group(1))
        if resume_from.isdigit():
            return int(resume_from)
        return None
    if not os.path.isdir(output_dir):
        return None
    steps = []
    for name in os.listdir(output_dir):
        m = re.fullmatch(r"checkpoint_?(\d+)", name)
        if m:
            steps.append(int(m.group(1)))
    return max(steps) if steps else None


__all__ = ["make_manager", "save_state", "restore_state", "resolve_resume_step"]
