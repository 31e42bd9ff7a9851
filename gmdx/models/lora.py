"""LoRA as a functional param-tree transformation.

The reference wraps the VAE with PEFT, targeting **every** Conv2d/Linear at
r=64, alpha=64 (train_vqgan_lora.py:809-821). Here LoRA is not a module
wrapper but a pair of pure functions over the Flax param tree:

  * ``init_lora_params``   — build {path: {"a", "b"}} factors for every
    matching kernel (Dense: (in, r) x (r, out); Conv: (kh, kw, in, r) x
    (1, 1, r, out), the PEFT conv factorization so checkpoints interchange).
  * ``merge_lora``         — params + scale * (a @ b), returning a new tree.

Training differentiates through ``merge_lora`` w.r.t. the LoRA factors only;
inference merges once and runs the base model unchanged. This is the
idiomatic JAX shape for adapters: no module surgery, no wrapper classes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
Path = Tuple[str, ...]


@dataclasses.dataclass(frozen=True)
class LoRAConfig:
    rank: int = 64
    alpha: float = 64.0

    @property
    def scale(self) -> float:
        return self.alpha / self.rank


def _is_lora_kernel(path: Path, leaf: Any) -> bool:
    """Every Dense (ndim 2) and Conv (ndim 4) kernel — the reference targets
    all of them. Embeddings/norm scales are named differently and skipped."""
    return (
        path
        and path[-1] == "kernel"
        and hasattr(leaf, "ndim")
        and leaf.ndim in (2, 4)
    )


def lora_targets(
    params, predicate: Optional[Callable[[Path, Any], bool]] = None
) -> Dict[Path, Any]:
    predicate = predicate or _is_lora_kernel
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for keypath, leaf in flat:
        path = tuple(
            k.key if hasattr(k, "key") else str(k) for k in keypath
        )
        if predicate(path, leaf):
            out[path] = leaf
    return out


def init_lora_params(
    key: Array,
    params,
    config: LoRAConfig = LoRAConfig(),
    predicate: Optional[Callable[[Path, Any], bool]] = None,
) -> Dict[Path, Dict[str, Array]]:
    """Kaiming-ish init: ``a`` ~ N(0, 1/r), ``b`` zeros (delta starts at 0)."""
    targets = lora_targets(params, predicate)
    keys = jax.random.split(key, max(len(targets), 1))
    lora = {}
    for k, (path, kernel) in zip(keys, sorted(targets.items())):
        r = config.rank
        if kernel.ndim == 2:
            d_in, d_out = kernel.shape
            a = jax.random.normal(k, (d_in, r), jnp.float32) / jnp.sqrt(r)
            b = jnp.zeros((r, d_out), jnp.float32)
        else:
            kh, kw, d_in, d_out = kernel.shape
            a = jax.random.normal(k, (kh, kw, d_in, r), jnp.float32) / jnp.sqrt(r)
            b = jnp.zeros((1, 1, r, d_out), jnp.float32)
        lora[path] = {"a": a, "b": b}
    return lora


def _delta(a: Array, b: Array) -> Array:
    if a.ndim == 2:
        return a @ b
    # Conv: compose (kh, kw, in, r) with the 1x1 (1, 1, r, out).
    return jnp.einsum("hwir,xyro->hwio", a, b)


def merge_lora(
    params,
    lora: Dict[Path, Dict[str, Array]],
    scale: float,
):
    """Return a param tree with ``kernel += scale * delta`` at every adapted
    path. Pure; differentiable w.r.t. the LoRA factors."""

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    leaves = []
    for keypath, leaf in flat:
        path = tuple(k.key if hasattr(k, "key") else str(k) for k in keypath)
        if path in lora:
            f = lora[path]
            leaf = leaf + scale * _delta(f["a"], f["b"]).astype(leaf.dtype)
        leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def apply_lora(params, lora, config: LoRAConfig = LoRAConfig()):
    """Convenience: merge with the config's alpha/rank scale."""
    return merge_lora(params, lora, config.scale)


__all__ = [
    "LoRAConfig",
    "lora_targets",
    "init_lora_params",
    "merge_lora",
    "apply_lora",
]
