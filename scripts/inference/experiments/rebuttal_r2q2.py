"""C17 rebuttal_r2q2: dual-UNet sampling with a custom (Stage-1 LoRA-tuned)
VAE swapped in.

Reference: scripts/inference/experiments/rebuttal_r2q2.py:160-296 — loads a
bespoke VAE checkpoint (:173-175), 80 steps, guidance 8.0, seed 1231; passes
``use_karras_sigmas=True`` which the pipeline silently swallows (parity: gmdx
pipelines swallow unknown kwargs the same way).
"""

from __future__ import annotations

import argparse

from _common import (BASELINE_PROMPTS, export_hdr_outputs,
                     load_dual_pipeline, take_prompts)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pretrained_model_name_or_path", required=True)
    p.add_argument("--vae_ckpt", default=None,
                   help="Stage-1 finetuned_VAE pipeline dir to swap in")
    p.add_argument("--output_dir", default="rebuttal_r2q2_outputs")
    p.add_argument("--num_inference_steps", type=int, default=80)
    p.add_argument("--guidance_scale", type=float, default=8.0)
    p.add_argument("--seed", type=int, default=1231)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--qmax", type=float, default=99.0)
    p.add_argument("--num_prompts", type=int, default=None,
                   help="limit the prompt list (default: all 11)")
    p.add_argument(
        "--karras", action="store_true",
        help="actually sample on a Karras rho=7 sigma grid (DPM-Solver++ "
        "scheduler). The reference passes use_karras_sigmas=True as a "
        "pipeline kwarg, which is silently swallowed — default behavior "
        "keeps that parity; this flag turns the intent on for real.",
    )
    args = p.parse_args()

    import jax
    import numpy as np

    pipe, params = load_dual_pipeline(args.pretrained_model_name_or_path)
    if args.vae_ckpt:
        from gmdx.io.pipeline import load_component
        import os

        sub = os.path.join(args.vae_ckpt, "vae")
        vae, vae_params = load_component(sub if os.path.isdir(sub) else args.vae_ckpt)
        pipe.vae = vae
        params = dict(params)
        params["vae"] = vae_params
        print(f"swapped in VAE from {args.vae_ckpt}")

    if args.karras:
        from gmdx.schedulers import DPMSolverMultistepScheduler

        pipe.scheduler = DPMSolverMultistepScheduler(use_karras_sigmas=True)
        print("Karras sigma grid enabled (DPM-Solver++ 2M)")

    prompts = take_prompts(BASELINE_PROMPTS, args.num_prompts)
    for i, prompt in enumerate(prompts):
        sdr, gm = pipe(
            params, prompt, key=jax.random.key(args.seed),
            height=args.resolution, width=args.resolution,
            num_inference_steps=args.num_inference_steps,
            guidance_scale=args.guidance_scale,
            use_karras_sigmas=True,  # swallowed (reference parity)
        )
        export_hdr_outputs(
            args.output_dir, f"{i:02d}", np.asarray(sdr[0]),
            np.asarray(gm[0]), args.qmax,
        )
        print(f"[{i + 1}/{len(prompts)}] done")


if __name__ == "__main__":
    main()
