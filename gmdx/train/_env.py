"""Process-level environment defaults shared by the train-step builders."""

from __future__ import annotations

import os


def default_parity_chain_off() -> None:
    """Default the resnet parity chain (gmdx/models/layers.py) OFF for
    training processes.

    The chain is an inference optimization: under AD its VJP rules pay
    NHWC<->parity conversions around the direct-conv training primal —
    measured 439.2 -> 450.8 ms/step on the donated batch-8 512^2 Stage-2
    step (BENCHNOTES.md). Exporting GMDX_PARITY_CHAIN=1 opts back in.

    Called from the step BUILDERS (not at module import) so merely
    importing gmdx.train does not flip inference-only processes; note the
    setting is process-global, so inference traced in the same process
    AFTER building a train step (e.g. periodic eval sampling) also runs
    chain-off — a deliberate trade for the training memory/step win.
    """
    os.environ.setdefault("GMDX_PARITY_CHAIN", "0")
