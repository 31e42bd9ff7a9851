"""Precompute the frozen VAE's posterior latents for a Text-SDR-GM parquet.

The from-pixels input pipeline is host-decode-bound: config 2 measures
~2.85 images/s/core of JPEG/PNG decode + preprocess, while the 512^2
training step consumes 12-18 samples/s/chip (BENCH_extra.json) — from-pixels
training needs ~5-7 host cores per chip to keep up. This CLI runs the decode
ONCE, encodes both image columns through the frozen VAE on the TPU, and
writes the posterior (mean, std) float16 stats + tokenized captions to an
``.npz`` next to the parquet. `train_gm_unet.py --cache_latents
--latent_cache_path <file.npz>` then loads it directly — training becomes
host-independent (the per-step posterior *sampling* stays on device, so the
training distribution is unchanged), and the cache is reused across runs
instead of being rebuilt per process (reference has no analog; its
dataloader re-decodes every epoch, train_gm_unet.py:996-1012).

Usage:
  python scripts/tools/precompute_latents.py --train_metadata data.parquet \
      --pretrained_model_name_or_path PIPE_DIR --resolution 512 \
      --out latents_512.npz
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train_metadata", required=True)
    ap.add_argument("--pretrained_model_name_or_path", required=True)
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--out", required=True, help="output .npz path")
    ap.add_argument("--batch", type=int, default=16,
                    help="device encode chunk")
    ap.add_argument("--num_workers", type=int, default=4)
    ap.add_argument("--max_train_samples", type=int, default=None)
    args = ap.parse_args()

    import numpy as np

    from gmdx.utils import enable_compilation_cache

    enable_compilation_cache()
    from gmdx.data import ParquetImageDataset
    from gmdx.io.pipeline import load_pipeline
    from gmdx.train.latent_cache import (
        compute_latent_cache,
        latent_cache_fingerprint,
        save_latent_cache,
    )

    bundle = load_pipeline(args.pretrained_model_name_or_path)
    dataset = ParquetImageDataset(args.train_metadata)
    t0 = time.time()
    cache = compute_latent_cache(
        dataset, bundle["tokenizer"], bundle["modules"]["vae"],
        bundle["params"]["vae"],
        resolution=args.resolution, enc_batch=args.batch,
        num_workers=args.num_workers,
        max_samples=args.max_train_samples,
    )
    dt = time.time() - t0
    n = cache["input_ids"].shape[0]
    save_latent_cache(
        args.out, cache, resolution=args.resolution,
        fingerprint=latent_cache_fingerprint(
            args.train_metadata, len(dataset), bundle["params"]["vae"]
        ),
    )
    mb = sum(v.nbytes for v in cache.values()) / 1e6
    print(
        f"cached {n} samples at {args.resolution}^2 in {dt:.1f}s "
        f"({n / dt:.2f} samples/s end-to-end), {mb:.1f} MB -> {args.out}"
    )


if __name__ == "__main__":
    main()
