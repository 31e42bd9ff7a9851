"""Tensor-parallel (Megatron-style) parameter shardings for the UNet/VAE.

The reference has no tensor parallelism (SURVEY.md §2.3: DDP only; the
SD-1.5 UNet fits per chip) — this module is new TPU-native capability for
latency-bound serving: split the transformer-block and resnet matmuls over
a ``model`` mesh axis so ONE denoise step uses several chips' MXUs.

The mechanics are pure GSPMD (scaling-book recipe): annotate each PARAM
with a :class:`~jax.sharding.PartitionSpec` over the ``model`` axis and let
XLA's SPMD partitioner place the collectives —

* column-parallel (output dim sharded, comm-free): attention ``to_q/k/v``,
  the GEGLU ``ff/proj_in``, resnet ``conv1`` output channels and the
  ``time_emb_proj`` that biases them;
* row-parallel (input dim sharded, XLA inserts the psum): attention
  ``to_out``, ``ff/proj_out``, resnet ``conv2`` input channels.

Head-parallel attention falls out of the column split: ``inner = H*D`` is
laid out head-major, so ``inner/tp`` contiguous lanes = whole heads when
``tp`` divides ``H`` (SD-1.5: H=8 → tp ∈ {2,4,8}). The GroupNorm between
``conv1`` and ``conv2`` stays comm-free when the per-shard channel count is
a multiple of the group size (SD-1.5: C/32 divides C/tp for tp ≤ 8).

Because the rules match on *path names* (``…/to_q/kernel``), they apply
unchanged to any tree that embeds the param tree — optax Adam ``mu``/``nu``
states and the EMA copy — so the whole train state shards consistently.

Pallas kernels under TP: the kernels are opaque custom calls to the SPMD
partitioner, so they cannot be auto-partitioned — but head-parallel
attention composes exactly with the column-parallel q/k/v layout. Trace
the pipeline inside ``gmdx.dist.tpctx.tp_kernel_context(mesh)`` and the
attention dispatch wraps its kernel call in a per-shard ``jax.shard_map``
over the ``model`` axis (whole heads per shard, zero extra communication),
keeping the flash/KV-resident fast path live under TP. The non-attention
kernels (Winograd/GEGLU/fused-GN) fuse across the row-parallel psum
boundary and stay on the XLA path inside the context (their dispatch
checks ``tpctx.active()``). DP remains the throughput layout; TP is the
latency lever.
"""

from __future__ import annotations

from typing import Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import tree_flatten_with_path, tree_unflatten

__all__ = ["tp_param_specs", "tp_shard_params", "tp_spec_for_path"]

# Column-parallel 2-D kernels: (in, out) with OUT sharded. No collective:
# each shard computes its output slice from the full input.
_COL2D = ("to_q", "to_k", "to_v", "proj_in", "time_emb_proj", "linear_1")
# Row-parallel 2-D kernels: (in, out) with IN sharded. The matmul produces
# partial sums; the partitioner inserts one psum over ``model``.
_ROW2D = ("to_out", "proj_out", "linear_2")


def tp_spec_for_path(
    path: Sequence[str], shape: Sequence[int], n_shards: int,
    axis: str = "model",
) -> P:
    """PartitionSpec for one leaf, by flax param path.

    Unmatched leaves — and matched ones whose sharded dim does not divide
    by ``n_shards`` (e.g. the final ``conv_out`` with 4 output channels) —
    replicate. Matching is on the trailing ``parent/leaf`` path pair, so
    optax/EMA trees that embed the param tree inherit the same specs.
    """
    if len(path) < 2 or n_shards <= 1:
        return P()
    parent, leaf = path[-2], path[-1]
    nd = len(shape)

    def div(d: int) -> bool:
        return shape[d] % n_shards == 0

    if leaf == "kernel":
        if nd == 2 and parent in _COL2D and div(1):
            return P(None, axis)
        if nd == 2 and parent in _ROW2D and div(0):
            return P(axis, None)
        # Resnet 3x3 pair (HWIO): conv1 column-parallel on O, conv2
        # row-parallel on I. 1x1 transformer proj_in/proj_out convs are 4-D
        # too but stay replicated (their C_out feeds LayerNorm, which needs
        # full channels — sharding them buys a gather, not a win).
        if nd == 4 and parent == "conv1" and div(3):
            return P(None, None, None, axis)
        if nd == 4 and parent == "conv2" and div(2):
            return P(None, None, axis, None)
    elif leaf == "bias":
        # Column-parallel outputs carry their bias slice; row-parallel
        # biases add AFTER the psum and replicate.
        if nd == 1 and div(0) and parent in (
            "to_q", "to_k", "to_v", "proj_in", "time_emb_proj", "linear_1",
            "conv1",
        ):
            return P(axis)
    return P()


def _path_names(key_path) -> tuple:
    return tuple(
        getattr(k, "key", getattr(k, "name", str(k))) for k in key_path
    )


def tp_param_specs(tree, n_shards: int, axis: str = "model"):
    """Pytree of PartitionSpecs mirroring ``tree`` (params, EMA, or optax
    state — anything whose leaf paths end in the flax param names)."""
    flat, treedef = tree_flatten_with_path(tree)
    specs = [
        tp_spec_for_path(
            _path_names(kp), getattr(v, "shape", ()), n_shards, axis
        )
        for kp, v in flat
    ]
    return tree_unflatten(treedef, specs)


def tp_shard_params(mesh: Mesh, tree, axis: str = "model"):
    """Device-put ``tree`` with tensor-parallel shardings over ``axis``
    (unmatched/indivisible leaves replicate across the whole mesh)."""
    n = mesh.shape[axis]
    flat, treedef = tree_flatten_with_path(tree)
    out = [
        jax.device_put(
            v,
            NamedSharding(
                mesh,
                tp_spec_for_path(
                    _path_names(kp), getattr(v, "shape", ()), n, axis
                ),
            ),
        )
        for kp, v in flat
    ]
    return tree_unflatten(treedef, out)
