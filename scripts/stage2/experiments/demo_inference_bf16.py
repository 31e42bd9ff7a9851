"""C19/C20 demo_training_loop + accelerate_training_smoke: half-precision
single-UNet SDR→HDR inference demos.

Reference: scripts/stage2/experiments/demo_training_loop.py (fp16 whole
pipeline, 16:9 resize, full-res HDR with cv2 resize back, :192-304) and
accelerate_training_smoke.py (fp16 over a directory, clips before write,
:28-29, 211). Both are misnamed inference demos; merged here as one bf16
(TPU half precision) demo with --aspect {16:9,square} and full-res export.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

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
    p.add_argument("--output_dir", default="demo_bf16_outputs")
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--aspect", choices=["square", "16:9"], default="16:9")
    p.add_argument("--qmax", type=float, default=99.0)
    p.add_argument(
        "--prompt",
        default="8k resolution, HDR10, very bright, high dynamic range",
    )
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gmdx.io import load_image, to_model_input

    pipe, params = load_gm_pipeline(
        args.pretrained_model_name_or_path, dtype=jnp.bfloat16
    )
    w = args.resolution
    h = int(round(w / 16 * 9 / 8)) * 8 if args.aspect == "16:9" else w

    pngs = sorted(glob.glob(os.path.join(args.sdr_input_path, "*.png")))
    key = jax.random.key(args.seed)
    for i, path in enumerate(pngs):
        name = os.path.splitext(os.path.basename(path))[0]
        original = load_image(path)  # full resolution
        sdr01 = load_image(path, size=(h, w))
        k1, k2 = jax.random.split(jax.random.fold_in(key, i))
        sdr_latent = pipe.encode_sdr(
            params, jnp.asarray(to_model_input(sdr01)), k1
        )
        gm_latent = pipe(
            params, sdr_latent, args.prompt, key=k2,
            num_inference_steps=args.num_inference_steps,
            output_type="latent",
        )
        gm01 = np.clip(
            np.asarray(pipe.decode_latents(params, gm_latent)[0]) / 2 + 0.5,
            0, 1,
        )
        # Full-res HDR: resize the GM back to the original size (reference
        # demo_training_loop.py:291-304).
        oh, ow = original.shape[:2]
        gm_full = np.asarray(
            jax.image.resize(jnp.asarray(gm01), (3, oh, ow), method="bilinear")
        ).transpose(1, 2, 0)
        export_hdr_outputs(args.output_dir, name, original, gm_full, args.qmax)
        print(f"[{i + 1}/{len(pngs)}] {name} full-res {ow}x{oh}")


if __name__ == "__main__":
    main()
