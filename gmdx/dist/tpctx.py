"""Tensor-parallel kernel context: lets the Pallas fast paths compose with
a Megatron-style ``model`` mesh axis.

The Pallas kernels are opaque custom calls to XLA's SPMD partitioner — under
a TP mesh the partitioner would have to all-gather their operands, erasing
the TP latency win (VERDICT.md round-2 weak #4). Head-parallel attention,
however, composes *exactly* with the column-parallel to_q/k/v layout
(gmdx/dist/tp.py: ``inner = H*D`` head-major, so ``inner/tp`` contiguous
lanes are whole heads): each model shard can run the SAME kernel over its
own heads with zero communication. This module carries the (mesh, axes)
needed for the attention dispatch to wrap its kernel call in
``jax.shard_map`` over the model axis; the non-attention kernels
(Winograd/GEGLU/fused-GN) fuse across row-parallel psum boundaries and
stay on the XLA path under TP (their dispatch checks :func:`active`).

Usage (the TP consumers — generate_hdr --tp_size, dryrun): build the
DP×TP mesh, shard params, then trace/execute the pipeline inside
``with tp_kernel_context(mesh):``. Traces created inside the context bake
the shard_map in; don't reuse a pipeline object across TP and non-TP runs.
"""

from __future__ import annotations

import contextlib
import dataclasses
import threading
from typing import Optional

__all__ = ["TPContext", "tp_kernel_context", "active"]


@dataclasses.dataclass(frozen=True)
class TPContext:
    mesh: object  # jax.sharding.Mesh with the model (and optionally data) axis
    axis: str = "model"
    data_axis: Optional[str] = "data"  # None: batch replicated over the mesh

    @property
    def size(self) -> int:
        return self.mesh.shape[self.axis]


_state = threading.local()


def active() -> Optional[TPContext]:
    """The innermost active TP kernel context, or None."""
    ctx = getattr(_state, "ctx", None)
    return ctx


@contextlib.contextmanager
def tp_kernel_context(mesh, axis: str = "model", data_axis="data"):
    """Activate TP-aware kernel dispatch while tracing/executing under a
    ``model``-sharded param layout. ``data_axis=None`` declares the batch
    replicated (e.g. single-image serving on a pure-TP mesh)."""
    if data_axis is not None and (
        data_axis not in mesh.shape or mesh.shape[data_axis] == 1
    ):
        data_axis = None
    prev = getattr(_state, "ctx", None)
    _state.ctx = TPContext(mesh=mesh, axis=axis, data_axis=data_axis)
    try:
        yield _state.ctx
    finally:
        _state.ctx = prev
