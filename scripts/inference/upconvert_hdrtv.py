"""SDR→HDRTV up-conversion CLI with ControlNet conditioning (driver config 5).

New capability vs the reference (ControlNet appears only in its README,
README.md:23,149). The input SDR frame conditions the SDR branch via
ControlNet while the GM branch synthesizes the gain map jointly; output is a
BT.2020 Radiance .hdr at up to 1024^2.
"""

from __future__ import annotations

import argparse
import glob
import os


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pretrained_model_name_or_path", required=True,
                   help="dual pipeline dir (unet/gm_unet/vae/text_encoder)")
    p.add_argument("--controlnet_ckpt", default=None,
                   help="controlnet component dir; default = encoder copy of "
                        "the pipeline's unet (zero adapter)")
    p.add_argument("--sdr_input_path", required=True)
    p.add_argument("--output_dir", default="hdrtv_outputs")
    p.add_argument("--resolution", type=int, default=1024)
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--conditioning_scale", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--qmax", type=float, default=99.0)
    p.add_argument("--max_images", type=int, default=None)
    p.add_argument(
        "--prompt",
        default="high dynamic range, HDR10, 4000 nits peak brightness",
    )
    p.add_argument(
        "--sp_size", type=int, default=1,
        help="Spatial-parallel width: shard the frame's H axis over this "
        "many chips (params replicated, GSPMD conv halos / attention "
        "gathers) — the 1024²+ default resolution is where a single "
        "chip's HBM runs out first. 1 = single-chip (default).",
    )
    p.add_argument(
        "--low_memory", action="store_true",
        help="Sequential CFG: run the uncond/cond ControlNet+UNet passes "
        "one after another instead of a CFG-doubled batch — roughly "
        "halves peak activation HBM (gmdx/pipelines/dual.py low_memory).",
    )
    return p.parse_args()


def main():
    args = parse_args()

    import jax
    import jax.numpy as jnp
    from gmdx.io import load_image, save_hdr_image, save_image
    from gmdx.io.pipeline import load_pipeline
    from gmdx.models import (
        ControlNetConfig,
        ControlNetModel,
        controlnet_params_from_unet,
    )
    from gmdx.pipelines import (
        StableDiffusionControlNetHDRPipeline,
        upconvert_sdr_to_hdrtv,
    )

    bundle = load_pipeline(args.pretrained_model_name_or_path)
    mods, params = bundle["modules"], dict(bundle["params"])

    if args.controlnet_ckpt:
        from gmdx.io.pipeline import load_component

        cnet, params["controlnet"] = load_component(args.controlnet_ckpt)
    else:
        cnet = ControlNetModel(ControlNetConfig(unet=mods["unet"].config))
        init = cnet.init(
            jax.random.key(0),
            jnp.zeros((1, 4, args.resolution // 8, args.resolution // 8)),
            jnp.array(1.0),
            jnp.zeros((1, 77, mods["unet"].config.cross_attention_dim)),
            jnp.zeros((1, 3, args.resolution, args.resolution)),
        )["params"]
        params["controlnet"] = controlnet_params_from_unet(
            init, params["unet"]
        )
        print("no --controlnet_ckpt: using zero adapter from UNet encoder")

    pipe = StableDiffusionControlNetHDRPipeline(
        mods["unet"], mods["vae"], mods["text_encoder"], bundle["tokenizer"],
        bundle["scheduler"], gm_unet=mods["gm_unet"], controlnet=cnet,
    )

    sp_mesh = None
    if args.sp_size > 1:
        from gmdx.dist import make_mesh, replicate, spatial_sharding

        n = len(jax.devices())
        if n < args.sp_size:
            raise ValueError(
                f"--sp_size {args.sp_size} exceeds the device count ({n})"
            )
        # One frame at a time: the spatial group is the whole submesh;
        # params replicated, the H split rides the input placement.
        sp_mesh = make_mesh(
            args.sp_size, ("data", "model"), shape=(1, args.sp_size)
        )
        params = replicate(sp_mesh, params)

    os.makedirs(args.output_dir, exist_ok=True)
    pngs = sorted(glob.glob(os.path.join(args.sdr_input_path, "*.png")))
    pngs = pngs[: args.max_images]
    for i, path in enumerate(pngs):
        name = os.path.splitext(os.path.basename(path))[0]
        sdr01 = load_image(path, size=(args.resolution, args.resolution))
        sdr_in = jnp.asarray(sdr01.transpose(2, 0, 1))[None]
        if sp_mesh is not None:
            sdr_in = jax.device_put(sdr_in, spatial_sharding(sp_mesh, 4))
        sdr_out, gm_out, hdr = upconvert_sdr_to_hdrtv(
            pipe, params, sdr_in, args.prompt,
            key=jax.random.fold_in(jax.random.key(args.seed), i),
            num_inference_steps=args.num_inference_steps,
            guidance_scale=args.guidance_scale,
            conditioning_scale=args.conditioning_scale,
            qmax=args.qmax,
            low_memory=args.low_memory,
        )
        save_image(os.path.join(args.output_dir, f"sdr_{name}.png"), sdr_out[0])
        save_image(os.path.join(args.output_dir, f"gm_{name}.png"), gm_out[0])
        save_hdr_image(
            os.path.join(args.output_dir, f"hdrtv_{name}.hdr"),
            hdr[0].transpose(1, 2, 0),
            qmax=args.qmax,
        )
        print(f"[{i + 1}/{len(pngs)}] {name}")


if __name__ == "__main__":
    main()
