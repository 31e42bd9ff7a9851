"""Param-tree serialization: safetensors files with '/'-joined key paths.

The reference ecosystem ships weights as safetensors state dicts; keeping the
same container (flat {path: tensor} with '/' separators) makes gmdx
checkpoints inspectable with stock tooling and gives torch→flax weight
importers a single interchange point. Values are stored as numpy (host);
loading returns numpy leaves — callers device_put with their shardings.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def flatten_tree(tree: Any, sep: str = "/") -> Dict[str, np.ndarray]:
    import jax

    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for keypath, leaf in flat:
        parts = []
        for k in keypath:
            if hasattr(k, "key"):
                parts.append(str(k.key))
            elif hasattr(k, "idx"):
                parts.append(str(k.idx))
            else:
                parts.append(str(k))
        out[sep.join(parts)] = np.asarray(leaf)
    return out


def unflatten_tree(flat: Dict[str, np.ndarray], sep: str = "/") -> Dict:
    tree: Dict = {}
    for path, value in flat.items():
        parts = path.split(sep)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def save_params(path: str, params: Any) -> None:
    """Write a param tree to a .safetensors file."""
    import jax
    from safetensors.numpy import save_file

    # Fetch device leaves CONCURRENTLY first: flatten_tree's sequential
    # per-leaf np.asarray pays a full round trip PER ARRAY on
    # remote/tunneled devices (measured 0.13-1.3 s RTT — tens of minutes
    # for an SD-scale tree), and jax.device_get serializes the same way on
    # such backends. The PJRT copy releases the GIL, so a thread pool
    # overlaps the round trips. No-op for host trees.
    leaves, treedef = jax.tree_util.tree_flatten(params)
    if any(isinstance(x, jax.Array) for x in leaves):
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=16) as ex:
            leaves = list(ex.map(np.asarray, leaves))
        params = jax.tree_util.tree_unflatten(treedef, leaves)
    save_file(flatten_tree(params), path)


def load_params(path: str) -> Dict:
    """Load a .safetensors file back into a nested dict of numpy arrays."""
    from safetensors.numpy import load_file

    return unflatten_tree(load_file(path))


__all__ = ["flatten_tree", "unflatten_tree", "save_params", "load_params"]
