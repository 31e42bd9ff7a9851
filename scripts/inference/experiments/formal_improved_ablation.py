"""C15 formal_improved_ablation: inference-steps sweep of the improved
sampler.

Reference: scripts/inference/experiments/formal_improved_ablation.py:250-276
— steps in [25, 50, 100, 250, 500, 1000], per-steps output dirs, generator
re-seeded per run.
"""

from __future__ import annotations

import argparse
import os

from _common import (
    IMPROVED_PROMPTS,
    NEGATIVE_PROMPT,
    export_hdr_outputs,
    load_dual_pipeline,
    take_prompts,
)

STEP_GRID = [25, 50, 100, 250, 500, 1000]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pretrained_model_name_or_path", required=True)
    p.add_argument("--output_dir", default="formal_ablation_outputs")
    p.add_argument("--guidance_scale", type=float, default=9.0)
    p.add_argument("--eta", type=float, default=0.7)
    p.add_argument("--seed", type=int, default=4369)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--qmax", type=float, default=99.0)
    p.add_argument("--num_prompts", type=int, default=4,
                   help="prompts per steps setting")
    p.add_argument("--steps", type=int, nargs="*", default=STEP_GRID)
    args = p.parse_args()

    import jax
    import numpy as np

    pipe, params = load_dual_pipeline(
        args.pretrained_model_name_or_path, scheduler="dpm++"
    )
    for steps in args.steps:
        out = os.path.join(args.output_dir, f"steps_{steps}")
        for i, prompt in enumerate(take_prompts(IMPROVED_PROMPTS, args.num_prompts)):
            sdr, gm = pipe(
                params, prompt, negative_prompt=NEGATIVE_PROMPT,
                key=jax.random.key(args.seed),  # re-seeded per run (parity)
                height=args.resolution, width=args.resolution,
                num_inference_steps=steps,
                guidance_scale=args.guidance_scale, eta=args.eta,
            )
            export_hdr_outputs(
                out, f"{i:02d}", np.asarray(sdr[0]), np.asarray(gm[0]),
                args.qmax,
            )
        print(f"steps={steps} done -> {out}")


if __name__ == "__main__":
    main()
