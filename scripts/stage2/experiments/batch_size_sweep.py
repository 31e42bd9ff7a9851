"""C21 batch_size_sweep: batched single-UNet GM inference throughput sweep.

Reference: scripts/stage2/experiments/batch_size_sweep.py:156-288 (broken
as-is: --batch_size never added to the parser, `idx` used before definition
— SURVEY.md C21; fixed here). GM is resized to the original size before
Eq.(1) (:263-267).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(__file__), "..", "..", "inference", "experiments"
    ),
)

from _common import export_hdr_outputs, load_gm_pipeline  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pretrained_model_name_or_path", required=True)
    p.add_argument("--sdr_input_path", required=True)
    p.add_argument("--output_dir", default="batch_sweep_outputs")
    p.add_argument("--batch_size", type=int, default=4)  # fixed: flag exists
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--qmax", type=float, default=99.0)
    p.add_argument(
        "--prompt", default="high quality, high dynamic range, 8k resolution"
    )
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gmdx.io import load_image

    pipe, params = load_gm_pipeline(
        args.pretrained_model_name_or_path, dtype=jnp.bfloat16
    )
    pngs = sorted(glob.glob(os.path.join(args.sdr_input_path, "*.png")))
    key = jax.random.key(args.seed)
    bs = args.batch_size
    for start in range(0, len(pngs), bs):
        chunk = pngs[start : start + bs]
        if len(chunk) < bs:
            chunk = chunk + [chunk[-1]] * (bs - len(chunk))  # static shapes
        originals = [load_image(q) for q in chunk]
        batch01 = np.stack(
            [
                load_image(q, size=(args.resolution, args.resolution))
                for q in chunk
            ]
        )
        x = jnp.asarray(np.transpose(batch01 * 2 - 1, (0, 3, 1, 2)))
        k1, k2 = jax.random.split(jax.random.fold_in(key, start))
        t0 = time.perf_counter()
        sdr_latent = pipe.encode_sdr(params, x, k1)
        gm_latent = pipe(
            params, sdr_latent, [args.prompt] * bs, key=k2,
            num_inference_steps=args.num_inference_steps,
            output_type="latent",
        )
        gm01 = np.clip(
            np.asarray(pipe.decode_latents(params, gm_latent)) / 2 + 0.5, 0, 1
        )
        dt = time.perf_counter() - t0
        print(f"batch of {bs}: {dt:.2f}s ({bs / dt:.3f} img/s)")
        for idx, (orig, path) in enumerate(zip(originals, chunk[: len(pngs) - start])):
            name = os.path.splitext(os.path.basename(path))[0]
            h, w = orig.shape[:2]
            gm = jax.image.resize(
                jnp.asarray(gm01[idx]), (3, h, w), method="bilinear"
            )
            export_hdr_outputs(
                args.output_dir, name, orig,
                np.asarray(gm).transpose(1, 2, 0), args.qmax,
            )


if __name__ == "__main__":
    main()
