"""Persistent VAE latent cache for Stage-2 training.

The from-pixels input pipeline is host-decode-bound (~2.85 images/s/core at
512^2, BENCH_extra.json config 2) while the training step consumes 12-18
samples/s/chip — keeping a chip fed from pixels needs ~5-7 host cores. The
cache decodes once, stores the frozen VAE's posterior (mean, std) per image
column as float16 (~128 KB/sample at 512^2) plus tokenized captions, and
training samples the posterior on device each step — the training
distribution is unchanged vs from-pixels (the reference re-decodes every
epoch through torch DataLoader workers, train_gm_unet.py:996-1012).

``compute_latent_cache`` builds it in RAM (used by ``--cache_latents``);
``save_latent_cache`` / ``load_latent_cache`` persist it as .npz so
``scripts/tools/precompute_latents.py`` can build once and every training
run (``--latent_cache_path``) skips both the decode AND the encode pass.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

import numpy as np

logger = logging.getLogger("gmdx.train")

_META_KEYS = ("__resolution", "__fingerprint")


def latent_cache_fingerprint(dataset_files, n_samples, vae_params) -> str:
    """Identity digest of (dataset, VAE weights) a cache was built from.

    A cache built from a different parquet or different VAE weights has the
    same shapes as the right one — nothing downstream would catch the swap
    and training would silently run on wrong latents. Stored in the npz at
    save time and verified at load (mirrors the resolution check)."""
    import hashlib
    import os

    import jax

    h = hashlib.sha256()
    if isinstance(dataset_files, str):
        dataset_files = [dataset_files]
    for f in dataset_files:
        h.update(os.path.abspath(f).encode())
    h.update(str(int(n_samples)).encode())
    leaves = jax.tree.leaves(vae_params)
    probe = leaves[:3] + leaves[-3:] if len(leaves) > 6 else leaves
    for leaf in probe:
        arr = np.asarray(leaf, np.float32)
        h.update(repr(arr.shape).encode())
        h.update(arr.ravel()[:64].tobytes())
    return h.hexdigest()[:16]


def compute_latent_cache(
    dataset,
    tokenizer,
    vae,
    vae_params,
    *,
    resolution: int,
    enc_batch: int = 16,
    num_workers: int = 4,
    max_samples: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """One pass over the dataset: posterior (mean, std) of both image
    columns through the frozen VAE, float16, plus tokenized captions."""
    import jax
    import jax.numpy as jnp

    from gmdx.data import make_dataloader

    @jax.jit
    def stats(params, images):
        post = vae.apply({"params": params}, images, method=vae.encode)
        return post.mean, post.std

    # batch_size=1 so the dataloader's ragged-tail drop excludes nothing —
    # with the training global batch the last (global_bs - 1) rows of the
    # parquet would be permanently missing from training. Encoding still
    # runs in fixed device chunks (padded tail, padding sliced off).
    loader = make_dataloader(
        dataset, tokenizer, batch_size=1,
        resolution=resolution, center_crop=True, random_flip=False,
        shuffle=False, num_epochs=1, num_workers=num_workers,
        max_samples=max_samples,
    )
    pixels, gains, ids = [], [], []
    for item in loader:
        pixels.append(item["pixel_values"][0])
        gains.append(item["gainmap_values"][0])
        ids.append(item["input_ids"][0])
    n = len(ids)
    cache: Dict[str, np.ndarray] = {"input_ids": np.stack(ids)}
    enc_bs = max(1, enc_batch)
    for images, prefix in ((pixels, "sdr"), (gains, "gm")):
        means, stds = [], []
        for start in range(0, n, enc_bs):
            chunk = np.stack(images[start : start + enc_bs])
            pad = enc_bs - chunk.shape[0]
            if pad:
                chunk = np.concatenate([chunk, chunk[-1:].repeat(pad, 0)])
            m, s = stats(vae_params, jnp.asarray(chunk))
            means.append(np.asarray(m, dtype=np.float16)[: enc_bs - pad])
            stds.append(np.asarray(s, dtype=np.float16)[: enc_bs - pad])
        cache[f"{prefix}_latent_mean"] = np.concatenate(means)
        cache[f"{prefix}_latent_std"] = np.concatenate(stds)
    logger.info("cached VAE posteriors for %d samples", n)
    return cache


def save_latent_cache(path: str, cache: Dict[str, np.ndarray],
                      *, resolution: int,
                      fingerprint: Optional[str] = None) -> None:
    meta = {"__resolution": np.int64(resolution)}
    if fingerprint is not None:
        meta["__fingerprint"] = np.array(fingerprint)
    np.savez(path, **meta, **cache)


def load_latent_cache(
    path: str, *, resolution: int, fingerprint: Optional[str] = None
) -> Dict[str, np.ndarray]:
    """Load a precomputed cache; rejects a resolution mismatch loudly (a
    256^2 cache silently feeding a 512^2 run would train the wrong shapes
    — actually it would fail shape checks, but fail here with the cause)
    and a dataset/VAE fingerprint mismatch (same shapes, wrong latents —
    nothing downstream would catch it)."""
    with np.load(path) as z:
        stored = int(z["__resolution"])
        if stored != resolution:
            raise ValueError(
                f"latent cache {path} was built at {stored}^2 but this run "
                f"trains at {resolution}^2 — rebuild with "
                f"scripts/tools/precompute_latents.py --resolution {resolution}"
            )
        if fingerprint is not None:
            if "__fingerprint" in z.files:
                stored_fp = str(z["__fingerprint"])
                if stored_fp != fingerprint:
                    raise ValueError(
                        f"latent cache {path} was built from a different "
                        f"dataset or VAE (fingerprint {stored_fp} != "
                        f"{fingerprint}) — rebuild with "
                        f"scripts/tools/precompute_latents.py"
                    )
            else:
                logger.warning(
                    "latent cache %s has no dataset/VAE fingerprint "
                    "(pre-r5 format) — cannot verify it matches this run",
                    path,
                )
        return {k: z[k] for k in z.files if k not in _META_KEYS}


__all__ = [
    "compute_latent_cache",
    "save_latent_cache",
    "load_latent_cache",
    "latent_cache_fingerprint",
]
