"""Create a gmdx pipeline directory with freshly initialized weights.

The reference pulls SD-1.5 weights from the HuggingFace hub; in a clean-room
TPU deployment you either import converted weights (gmdx.io.torch_import) or
start from random init. This tool writes the standard pipeline layout
(gmdx/io/pipeline.py) at SD-1.5 scale (--size sd15) or test scale (--size
tiny) so every CLI has a loadable checkpoint to start from.

Usage:
    python scripts/tools/init_pipeline.py --output_dir /path/to/pipe \
        --size tiny --dual --seed 0
"""

from __future__ import annotations

import argparse
import dataclasses


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--size", choices=["sd15", "tiny"], default="tiny")
    p.add_argument(
        "--dual",
        action="store_true",
        help="also write the 8-channel gm_unet (dual-UNet pipelines)",
    )
    p.add_argument(
        "--gm_only",
        action="store_true",
        help="write the 8-channel UNet as 'unet' (single-UNet GM pipeline)",
    )
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--scheduler", default="pndm",
                   choices=["pndm", "ddpm", "ddim", "dpm++"])
    return p.parse_args()


def main():
    args = parse_args()

    import jax
    import jax.numpy as jnp

    from gmdx.io.pipeline import save_pipeline
    from gmdx.models import (
        AutoencoderKL,
        CLIPTextModel,
        CLIPTokenizer,
        SD15_GM_UNET_CONFIG,
        SD15_UNET_CONFIG,
        SD15_VAE_CONFIG,
        TINY_CLIP_CONFIG,
        TINY_UNET_CONFIG,
        TINY_VAE_CONFIG,
        UNet2DConditionModel,
    )
    from gmdx.models.clip_text import CLIP_VIT_L_CONFIG
    from gmdx.schedulers import SCHEDULERS

    if args.size == "sd15":
        unet_cfg, vae_cfg, clip_cfg = (
            SD15_UNET_CONFIG,
            SD15_VAE_CONFIG,
            CLIP_VIT_L_CONFIG,
        )
        gm_cfg = SD15_GM_UNET_CONFIG
    else:
        unet_cfg, vae_cfg, clip_cfg = (
            TINY_UNET_CONFIG,
            TINY_VAE_CONFIG,
            TINY_CLIP_CONFIG,
        )
        gm_cfg = dataclasses.replace(TINY_UNET_CONFIG, in_channels=8)

    rng = jax.random.key(args.seed)
    ctx_dim = unet_cfg.cross_attention_dim
    lat = unet_cfg.sample_size

    components = {}
    if args.gm_only:
        unet = UNet2DConditionModel(gm_cfg)
        unet_in = 8
    else:
        unet = UNet2DConditionModel(unet_cfg)
        unet_in = unet_cfg.in_channels
    print(f"init unet ({args.size}, in={unet_in})...", flush=True)
    components["unet"] = (
        unet,
        jax.jit(unet.init)(
            rng,
            jnp.zeros((1, unet_in, lat, lat)),
            jnp.array(1.0),
            jnp.zeros((1, 77, ctx_dim)),
        )["params"],
    )
    if args.dual:
        gm_unet = UNet2DConditionModel(gm_cfg)
        print("init gm_unet...", flush=True)
        components["gm_unet"] = (
            gm_unet,
            jax.jit(gm_unet.init)(
                rng,
                jnp.zeros((1, 8, lat, lat)),
                jnp.array(1.0),
                jnp.zeros((1, 77, ctx_dim)),
            )["params"],
        )

    vae = AutoencoderKL(vae_cfg)
    print("init vae...", flush=True)
    img = 64 if args.size == "sd15" else 32
    components["vae"] = (
        vae,
        jax.jit(vae.init)(
            rng, jnp.zeros((1, 3, img, img)), jax.random.key(args.seed + 1)
        )["params"],
    )

    text = CLIPTextModel(clip_cfg)
    print("init text_encoder...", flush=True)
    components["text_encoder"] = (
        text,
        jax.jit(text.init)(rng, jnp.zeros((1, 77), jnp.int32))["params"],
    )

    tokenizer = CLIPTokenizer.tiny()
    scheduler = SCHEDULERS[args.scheduler]()

    save_pipeline(
        args.output_dir,
        components=components,
        tokenizer=tokenizer,
        scheduler=scheduler,
    )
    print(f"wrote pipeline to {args.output_dir}")


if __name__ == "__main__":
    main()
