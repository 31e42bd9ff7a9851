"""C16 legacy_test: dual-UNet at 16:9 aspect with an SDR input on the side.

Reference: scripts/inference/experiments/legacy_test.py:157-301 — resizes
inputs to (res/16*9, res) 16:9 (:198-208), encodes the input SDR (which the
dual pipeline then ignores — kept for behavioral parity, the encode exercises
the non-square VAE path), halts after the first image via ``assert stop``;
here a --max_images flag replaces the debug halt.
"""

from __future__ import annotations

import argparse
import glob
import os

from _common import export_hdr_outputs, load_dual_pipeline


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pretrained_model_name_or_path", required=True)
    p.add_argument("--sdr_input_path", required=True)
    p.add_argument("--output_dir", default="legacy_test_outputs")
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--qmax", type=float, default=99.0)
    p.add_argument("--max_images", type=int, default=1)
    p.add_argument("--prompt", default="high dynamic range photograph")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gmdx.io import load_image, to_model_input

    pipe, params = load_dual_pipeline(args.pretrained_model_name_or_path)
    # 16:9 frame: height = resolution/16*9 rounded to a multiple of 8.
    w = args.resolution
    h = int(round(w / 16 * 9 / 8)) * 8

    pngs = sorted(glob.glob(os.path.join(args.sdr_input_path, "*.png")))
    for i, path in enumerate(pngs[: args.max_images]):
        name = os.path.splitext(os.path.basename(path))[0]
        sdr01 = load_image(path, size=(h, w))
        # Parity: encode the input SDR even though the dual sampler ignores
        # it (exercises the non-square encode path, reference :223-248).
        _ = pipe.encode_sdr(
            params, jnp.asarray(to_model_input(sdr01)),
            jax.random.key(args.seed),
        )
        sdr, gm = pipe(
            params, args.prompt, key=jax.random.key(args.seed),
            height=h, width=w,
            num_inference_steps=args.num_inference_steps,
            guidance_scale=args.guidance_scale,
        )
        export_hdr_outputs(
            args.output_dir, name, np.asarray(sdr[0]), np.asarray(gm[0]),
            args.qmax,
        )
        print(f"{name}: {w}x{h} done")


if __name__ == "__main__":
    main()
