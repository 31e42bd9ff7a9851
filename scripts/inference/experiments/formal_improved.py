"""C14 formal_improved: DPM-Solver++ dual-UNet text-to-HDR with the tuned
sampler settings.

Reference: scripts/inference/experiments/formal_improved.py:160-305 —
DPM-Solver++ scheduler, 75 steps, guidance 9.0, eta 0.7, long HDR-quality
prompts + big negative prompt, seed 4369.
"""

from __future__ import annotations

import argparse

from _common import (
    IMPROVED_PROMPTS,
    NEGATIVE_PROMPT,
    export_hdr_outputs,
    load_dual_pipeline,
    take_prompts,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pretrained_model_name_or_path", required=True)
    p.add_argument("--output_dir", default="formal_improved_outputs")
    p.add_argument("--num_inference_steps", type=int, default=75)
    p.add_argument("--guidance_scale", type=float, default=9.0)
    p.add_argument("--eta", type=float, default=0.7)
    p.add_argument("--seed", type=int, default=4369)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--qmax", type=float, default=99.0)
    p.add_argument("--num_prompts", type=int, default=None)
    p.add_argument(
        "--lora_scale", type=float, default=0.8,
        help="the reference passes cross_attention_kwargs={'scale': 0.8} "
        "(formal_improved.py:259-269); applied here via the pipeline's LoRA "
        "merge when <name>_lora trees are present in params — a silent "
        "no-op otherwise, exactly like the reference without LoRA loaded",
    )
    args = p.parse_args()

    import jax
    import numpy as np

    pipe, params = load_dual_pipeline(
        args.pretrained_model_name_or_path, scheduler="dpm++"
    )
    prompts = take_prompts(IMPROVED_PROMPTS, args.num_prompts)
    for i, prompt in enumerate(prompts):
        sdr, gm = pipe(
            params, prompt, negative_prompt=NEGATIVE_PROMPT,
            key=jax.random.key(args.seed),
            height=args.resolution, width=args.resolution,
            num_inference_steps=args.num_inference_steps,
            guidance_scale=args.guidance_scale, eta=args.eta,
            cross_attention_kwargs={"scale": args.lora_scale},
        )
        export_hdr_outputs(
            args.output_dir, f"{i:02d}", np.asarray(sdr[0]),
            np.asarray(gm[0]), args.qmax,
        )
        print(f"[{i + 1}/{len(prompts)}] done")


if __name__ == "__main__":
    main()
