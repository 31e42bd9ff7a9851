"""C22 scheduler_tuning: single-UNet GM inference with DPM-Solver++.

Reference: scripts/stage2/experiments/scheduler_tuning.py:157-350 —
DPM-Solver++ (algorithm_type='dpmsolver++', solver_order=2,
thresholding=False 'for HDR preservation'), 100 steps, half precision.
bf16 is the TPU-native half precision.
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
    p.add_argument("--output_dir", default="scheduler_tuning_outputs")
    p.add_argument("--num_inference_steps", type=int, default=100)
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

    from gmdx.io import load_image, to_model_input

    pipe, params = load_gm_pipeline(
        args.pretrained_model_name_or_path, scheduler="dpm++",
        dtype=jnp.bfloat16,
    )
    pngs = sorted(glob.glob(os.path.join(args.sdr_input_path, "*.png")))
    key = jax.random.key(args.seed)
    for i, path in enumerate(pngs):
        name = os.path.splitext(os.path.basename(path))[0]
        sdr01 = load_image(path, size=(args.resolution, args.resolution))
        k1, k2 = jax.random.split(jax.random.fold_in(key, i))
        sdr_latent = pipe.encode_sdr(params, jnp.asarray(to_model_input(sdr01)), k1)
        gm_latent = pipe(
            params, sdr_latent, args.prompt, key=k2,
            num_inference_steps=args.num_inference_steps,
            output_type="latent",
        )
        gm01 = np.clip(
            np.asarray(pipe.decode_latents(params, gm_latent)[0]) / 2 + 0.5,
            0, 1,
        ).transpose(1, 2, 0)
        export_hdr_outputs(args.output_dir, name, sdr01, gm01, args.qmax)
        print(f"[{i + 1}/{len(pngs)}] {name}")


if __name__ == "__main__":
    main()
