"""jax.sharding mesh utilities for data-parallel training/inference.

The reference scales via HF Accelerate's DDP wrapper over NCCL (gradient
all-reduce inside accelerator.backward, train_gm_unet.py:1042-1044). The
TPU-native equivalent: a 1-D ``data`` mesh over ICI (DCN across hosts),
batch-sharded inputs via NamedSharding, replicated params, and XLA inserting
the gradient psum automatically when the jitted train step closes over
sharded inputs + replicated params (scaling-book recipe: annotate shardings,
let the compiler place collectives).

A ``model`` axis is reserved for tensor-parallel experiments at >512^2
resolutions; the SD-1.5 UNet fits per-chip so DP is the default.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def local_device_count() -> int:
    return jax.local_device_count()


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices.

    Default: 1-D data-parallel mesh over all devices. Pass ``shape`` for
    multi-axis layouts, e.g. shape=(4, 2), axis_names=("data", "model").
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),)
    dev_array = np.asarray(devices).reshape(tuple(shape))
    return Mesh(dev_array, tuple(axis_names))


def make_train_mesh(strategy: str = "ddp", tp_size: int = 2) -> Mesh:
    """Mesh for a trainer's ``--shard_strategy``: a 1-D ``data`` mesh for
    ddp/zero1/fsdp, a 2-D ``data``×``model`` mesh for tp/sp (``tp_size``
    chips per model-shard (tp) or image-shard (sp) group; the inner axis so
    the group's collectives ride the fastest ICI hops)."""
    if strategy in ("tp", "sp"):
        n = len(jax.devices())
        if tp_size < 2 or n % tp_size:
            raise ValueError(
                f"--shard_strategy {strategy} needs a group size >= 2 "
                f"dividing the device count ({n}); got {tp_size}"
            )
        return make_mesh(
            None, ("data", "model"), shape=(n // tp_size, tp_size)
        )
    return make_mesh()


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def spatial_sharding(
    mesh: Mesh,
    ndim: int = 4,
    h_dim: int = 2,
    batch_axis: str = "data",
    sp_axis: str = "model",
) -> NamedSharding:
    """Batch over ``data`` + image H over ``sp_axis`` (spatial/sequence
    parallelism). Feeding activations placed this way into the jitted
    step is the whole mechanism: GSPMD propagates the spatial split
    through the conv/GN/attention stack, inserting halo exchanges for the
    3x3 convs and K/V gathers for attention. No reference equivalent
    (SURVEY.md §5.7 — the reference caps at one GPU's memory); this is
    what takes >1024² HDR frames past one chip's HBM."""
    spec = [None] * ndim
    spec[0] = batch_axis
    spec[h_dim] = sp_axis
    return NamedSharding(mesh, P(*spec))


def shard_batch_spatial(mesh: Mesh, batch, h_dim: int = 2):
    """Device-put NCHW image leaves (ndim >= 4) batch+H sharded;
    everything else (ids, embeddings) batch-sharded only."""

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 4:
            return jax.device_put(
                x, spatial_sharding(mesh, x.ndim, h_dim)
            )
        return jax.device_put(x, data_sharding(mesh))

    return jax.tree.map(put, batch)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data", *, process_local: bool = False):
    """Device-put a host batch pytree with the batch dim sharded.

    Default: ``batch`` is the GLOBAL batch, identical on every host —
    correct under multi-host (each process transfers only its addressable
    rows) but each host must materialize (decode) all of it.
    ``process_local=True``: ``batch`` holds only THIS process's rows
    (``global_rows / process_count``, the slice a ``process_shard`` loader
    yields) and the global array is assembled zero-copy via
    ``jax.make_array_from_process_local_data`` — the multi-host input
    pipeline path that keeps host decode O(local), not O(global).
    """
    sharding = data_sharding(mesh, axis)
    if process_local and jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sharding, x),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    """Device-put a pytree fully replicated across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def _shard_largest_axis(mesh: Mesh, tree, axis: str):
    """Split each leaf's largest divisible dim over ``axis`` (replicate
    leaves with no divisible dim). The building block for ZeRO-1 and FSDP."""
    n = mesh.shape[axis]

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            for d in sorted(
                range(x.ndim), key=lambda d: -x.shape[d]
            ):
                if x.shape[d] % n == 0 and x.shape[d] >= n:
                    spec = [None] * x.ndim
                    spec[d] = axis
                    return jax.device_put(
                        x, NamedSharding(mesh, P(*spec))
                    )
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(put, tree)


def zero1_shard(mesh: Mesh, tree, axis: str = "data"):
    """ZeRO-1-style sharding: split each leaf's largest divisible axis over
    the data axis (replicate leaves with no divisible axis).

    Intended for optimizer state (Adam m/v are as large as the params): the
    reference only has DeepSpeed *plumbing* for this (SURVEY.md §2.3); here
    the SPMD partitioner consumes these shardings directly — the jitted train
    step updates each shard locally and XLA inserts the all-gather where the
    updated params are consumed.
    """
    return _shard_largest_axis(mesh, tree, axis)


def fsdp_shard(mesh: Mesh, tree, axis: str = "data"):
    """FSDP/ZeRO-3-style sharding: the *parameters* themselves (and, applied
    to the optimizer state too, everything per-parameter) live split over the
    data axis.

    TPU-native mechanics (scaling-book recipe — annotate, let XLA place the
    collectives): pass params sharded this way into the jitted train step and
    keep the same sharding on the outputs; the SPMD partitioner inserts
    weight all-gathers where layers consume them in fwd/bwd and a
    reduce-scatter for the gradients, i.e. classic FSDP scheduling without
    any hand-written communication. Peak per-chip memory for params/grads/
    opt-state drops by ~the mesh size; the trade is all-gather traffic on
    ICI each step. Use when the model (or its optimizer state) no longer
    fits replicated — e.g. EMA + Adam at >1024^2 ControlNet scale.
    """
    return _shard_largest_axis(mesh, tree, axis)


def apply_shard_strategy(
    mesh: Mesh,
    state,
    strategy: str,
    *,
    param_fields: Sequence[str],
    opt_fields: Sequence[str],
    axis: str = "data",
):
    """Place a train-state dataclass on the mesh per ``--shard_strategy``.

    ddp: everything replicated. zero1: ``opt_fields`` split over the data
    axis. fsdp: ``param_fields`` AND ``opt_fields`` split. tp: params AND
    optimizer/EMA trees tensor-parallel over the mesh's ``model`` axis
    (gmdx.dist.tp rules; requires a 2-D data×model mesh — combine with the
    batch sharded over ``data`` for DP×TP). sp: params replicated like ddp —
    the parallelism lives in the BATCH placement (``shard_batch_spatial``:
    image H split over the ``model`` axis, GSPMD inserts conv halos /
    attention gathers). Remaining fields (and None-valued ones) are
    replicated. Each field is placed straight from host — replicating the
    whole state first would allocate exactly the copies zero1/fsdp exist
    to avoid.
    """
    import dataclasses as _dc

    if strategy in ("ddp", "sp"):
        return replicate(mesh, state)
    if strategy == "tp":
        from gmdx.dist.tp import tp_shard_params

        sharded = set(opt_fields) | set(param_fields)
        updates = {}
        for f in _dc.fields(state):
            v = getattr(state, f.name)
            if v is None:
                continue
            if f.name in sharded:
                updates[f.name] = tp_shard_params(mesh, v, axis="model")
            else:
                updates[f.name] = replicate(mesh, v)
        return _dc.replace(state, **updates)
    if strategy not in ("zero1", "fsdp"):
        raise ValueError(f"unknown shard strategy {strategy!r}")
    sharded = set(opt_fields)
    if strategy == "fsdp":
        sharded |= set(param_fields)
    updates = {}
    for f in _dc.fields(state):
        v = getattr(state, f.name)
        if v is None:
            continue
        if f.name in sharded:
            updates[f.name] = _shard_largest_axis(mesh, v, axis)
        else:
            updates[f.name] = replicate(mesh, v)
    return _dc.replace(state, **updates)


__all__ = [
    "make_mesh",
    "make_train_mesh",
    "zero1_shard",
    "fsdp_shard",
    "apply_shard_strategy",
    "data_sharding",
    "spatial_sharding",
    "replicated_sharding",
    "shard_batch",
    "shard_batch_spatial",
    "replicate",
    "local_device_count",
]
