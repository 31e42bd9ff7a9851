"""Shared loading/export helpers for the experiment harnesses (C13-C22).

Each reference experiment re-declares component loading, a numpy Eq.(1)
twin, and an .hdr writer (e.g. formal_baseline.py:32-43,158-225); here they
share one implementation over the gmdx pipeline layout.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))


def load_dual_pipeline(pipeline_dir: str, scheduler: str = "pndm",
                       controlnet: bool = False):
    """Load a dual-UNet (optionally ControlNet) pipeline + params from a gmdx
    pipeline directory containing unet/gm_unet/vae/text_encoder/tokenizer."""
    from gmdx.io.pipeline import load_pipeline
    from gmdx.pipelines import (
        StableDiffusionControlNetHDRPipeline,
        StableDiffusionDualUNetPipeline,
    )
    from gmdx.schedulers import SCHEDULERS

    bundle = load_pipeline(pipeline_dir)
    mods, params = bundle["modules"], bundle["params"]
    sched = SCHEDULERS[scheduler]()
    if "gm_unet" not in mods:
        raise ValueError(
            f"{pipeline_dir} has no gm_unet/ — create one with "
            "scripts/tools/init_pipeline.py --dual"
        )
    cls = (
        StableDiffusionControlNetHDRPipeline
        if controlnet
        else StableDiffusionDualUNetPipeline
    )
    kw = {}
    if controlnet:
        from gmdx.models import ControlNetModel, SD15_CONTROLNET_CONFIG

        kw["controlnet"] = ControlNetModel(SD15_CONTROLNET_CONFIG)
    pipe = cls(
        mods["unet"], mods["vae"], mods["text_encoder"], bundle["tokenizer"],
        sched, gm_unet=mods["gm_unet"], **kw,
    )
    return pipe, params


def load_gm_pipeline(pipeline_dir: str, scheduler: str = "pndm",
                     dtype=None):
    """Load the single-UNet GM pipeline (8-ch unet) + params."""
    from gmdx.io.pipeline import load_pipeline
    from gmdx.pipelines import StableDiffusionGMPipeline
    from gmdx.schedulers import SCHEDULERS

    bundle = load_pipeline(pipeline_dir)
    mods, params = bundle["modules"], bundle["params"]
    unet = mods.get("gm_unet") or mods["unet"]
    unet_params = (
        params.get("gm_unet") if "gm_unet" in params else params["unet"]
    )
    if dtype is not None:
        unet = type(unet)(unet.config, dtype=dtype)
        vae = type(mods["vae"])(mods["vae"].config, dtype=dtype)
    else:
        vae = mods["vae"]
    pipe = StableDiffusionGMPipeline(
        unet, vae, mods["text_encoder"], bundle["tokenizer"],
        SCHEDULERS[scheduler](),
    )
    p = dict(params)
    p["unet"] = unet_params
    return pipe, p


def export_hdr_outputs(output_dir: str, name: str, sdr01, gm01, qmax: float):
    """Save sdr/gm PNGs + the Eq.(1) .hdr (un-clamped, experiment parity)."""
    import jax.numpy as jnp
    import numpy as np

    from gmdx.io import save_hdr_image, save_image
    from gmdx.ops import apply_gm_to_sdr

    os.makedirs(output_dir, exist_ok=True)
    save_image(os.path.join(output_dir, f"sdr_{name}.png"), sdr01)
    save_image(os.path.join(output_dir, f"gm_{name}.png"), gm01)
    hdr = np.asarray(
        apply_gm_to_sdr(
            jnp.asarray(gm01.transpose(2, 0, 1)),
            jnp.asarray(sdr01.transpose(2, 0, 1)),
            qmax=qmax,
            clip_output=False,
        )
    )
    save_hdr_image(
        os.path.join(output_dir, f"hdr_{name}.hdr"),
        hdr.transpose(1, 2, 0),
        qmax=qmax,
    )


def take_prompts(prompt_list, num_prompts):
    """First ``num_prompts`` entries of ``prompt_list`` (all when None).

    Rejects ``num_prompts < 1`` loudly: a plain ``list[:0]`` /
    ``list[:-2]`` slice would silently run zero (or fewer-from-the-end)
    prompts and exit 0 with no output.
    """
    if num_prompts is None:
        return prompt_list
    if num_prompts < 1:
        raise SystemExit(f"--num_prompts must be >= 1, got {num_prompts}")
    return prompt_list[:num_prompts]


# Prompt sets for the formal experiments (reference keeps fixed prompt lists
# pinned in-script, formal_baseline.py:198-210 / formal_improved.py:201-246).
BASELINE_PROMPTS = [
    "a sunrise over a mountain lake with mist",
    "city skyline at night with neon signs",
    "a desert canyon under the midday sun",
    "fireworks over a harbor",
    "a candle-lit library interior",
    "sunlight streaming through a forest canopy",
    "a lighthouse beam cutting through fog at dusk",
    "lava flowing into the ocean at night",
    "an alpine meadow under a clear blue sky",
    "a thunderstorm with lightning over wheat fields",
    "stage lights at a concert",
]

QUALITY_SUFFIX = (
    ", high dynamic range, HDR10, 8k resolution, professional photography, "
    "sharp focus, vivid highlights"
)

NEGATIVE_PROMPT = (
    "lowres, blurry, jpeg artifacts, overexposed, underexposed, washed out, "
    "flat lighting, low contrast, watermark, text"
)

IMPROVED_PROMPTS = [p + QUALITY_SUFFIX for p in BASELINE_PROMPTS] + [
    "molten glass being blown in a dark workshop" + QUALITY_SUFFIX,
    "aurora borealis over a snowy ridge" + QUALITY_SUFFIX,
    "a neon-soaked alley in the rain at midnight" + QUALITY_SUFFIX,
    "golden hour light on sandstone arches" + QUALITY_SUFFIX,
    "a welder's torch in an industrial hall" + QUALITY_SUFFIX,
    "moonlight on a calm sea with scattered clouds" + QUALITY_SUFFIX,
    "a stained-glass cathedral interior at noon" + QUALITY_SUFFIX,
    "car headlights on a wet mountain road at night" + QUALITY_SUFFIX,
    "a campfire on a beach under the stars" + QUALITY_SUFFIX,
    "sun glinting off glacier ice" + QUALITY_SUFFIX,
    "a jazz club lit by a single spotlight" + QUALITY_SUFFIX,
    "morning fog burning off a vineyard" + QUALITY_SUFFIX,
]
