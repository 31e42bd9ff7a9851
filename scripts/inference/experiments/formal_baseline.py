"""C13 formal_baseline: dual-UNet text-to-HDR over the fixed prompt set.

Reference: scripts/inference/experiments/formal_baseline.py:158-261 — DDPM
scheduler, 50 steps, seed 42, qmax=99, latent output + manual decode.
"""

from __future__ import annotations

import argparse

from _common import (BASELINE_PROMPTS, export_hdr_outputs,
                     load_dual_pipeline, take_prompts)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pretrained_model_name_or_path", required=True)
    p.add_argument("--output_dir", default="formal_baseline_outputs")
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--qmax", type=float, default=99.0)
    p.add_argument("--num_prompts", type=int, default=None)
    args = p.parse_args()

    import jax
    import numpy as np

    pipe, params = load_dual_pipeline(
        args.pretrained_model_name_or_path, scheduler="ddpm"
    )
    prompts = take_prompts(BASELINE_PROMPTS, args.num_prompts)
    for i, prompt in enumerate(prompts):
        sdr, gm = pipe(
            params, prompt, key=jax.random.key(args.seed),
            height=args.resolution, width=args.resolution,
            num_inference_steps=args.num_inference_steps,
            guidance_scale=args.guidance_scale,
            # parity: the reference passes kwargs the pipeline swallows
            noise_level=20,
        )
        export_hdr_outputs(
            args.output_dir, f"{i:02d}", np.asarray(sdr[0]),
            np.asarray(gm[0]), args.qmax,
        )
        print(f"[{i + 1}/{len(prompts)}] {prompt}")


if __name__ == "__main__":
    main()
