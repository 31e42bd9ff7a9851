"""Stage-3 SDR→HDR up-conversion CLI (reference scripts/inference/
generate_hdr.py:145-282, same flag surface).

Per PNG under --sdr_input_path: normalize to [-1, 1], VAE-encode (×scaling),
run the single-UNet GM pipeline (50 steps, fixed seed), decode both the SDR
round-trip and the gain map, save sdr_*.png / gm_*.png, reconstruct HDR with
qmax=99 via Eq.(1) from BOTH the decoded SDR and the original SDR, and write
Radiance .hdr files (BT.2020 primaries, values normalized by qmax+1).

Unlike the reference (which feeds numpy into a torch op and would TypeError —
SURVEY.md C12), reconstruction here runs on device via gmdx.ops.

--pretrained_model_name_or_path: a gmdx pipeline dir (vae + text_encoder +
tokenizer + scheduler). --unet_ckpt: the trained 8-ch GM UNet component dir
(or a pipeline dir containing `unet/`).
"""

from __future__ import annotations

import argparse
import glob
import os
import zlib


def parse_args():
    parser = argparse.ArgumentParser(description="Test the trained model.")
    parser.add_argument(
        "--pretrained_model_name_or_path", type=str, default=None, required=True,
        help="Path to the gmdx pipeline directory (vae/text_encoder/tokenizer).",
    )
    parser.add_argument(
        "--unet_ckpt", type=str, default=None, required=True,
        help="Path to the trained GM UNet component (or pipeline dir).",
    )
    parser.add_argument(
        "--sdr_input_path", type=str, default=None, required=True,
        help="Path to the input SDR image directory.",
    )
    parser.add_argument(
        "--output_dir", type=str, default="test_outputs",
        help="The output directory where the model predictions will be written.",
    )
    parser.add_argument("--seed", type=int, default=42,
                        help="A seed for reproducible testing.")
    parser.add_argument("--resolution", type=int, default=512,
                        help="The resolution for validation images.")
    parser.add_argument("--num_inference_steps", type=int, default=50)
    parser.add_argument("--qmax", type=float, default=99.0)
    parser.add_argument(
        "--prompt", type=str,
        default="high quality, high dynamic range, 8k resolution",
    )
    parser.add_argument(
        "--tp_size", type=int, default=1,
        help="Tensor-parallel width: split every denoise step over this "
        "many chips (gmdx.dist.tp Megatron-style specs, new capability — "
        "the reference is single-GPU here). 1 = single-chip (default).",
    )
    parser.add_argument(
        "--batch_size", type=int, default=1,
        help="Frames per sampling-loop dispatch. CFG already doubles the "
        "UNet batch, but batch 1 still underfills the chip — the measured "
        "serving throughput (BENCHNOTES.md) assumes batched dispatch. "
        "batch 1 reproduces the reference's per-image outputs exactly; "
        "batch > 1 draws the sampling noise per chunk instead of per image "
        "(different draws, same model).",
    )
    parser.add_argument(
        "--sp_size", type=int, default=1,
        help="Spatial-parallel width: shard the image/latent H axis over "
        "this many chips (GSPMD conv halos / attention gathers) — for "
        "resolutions past one chip's HBM. Mutually exclusive with "
        "--tp_size. 1 = single-chip (default).",
    )
    parser.add_argument(
        "--low_memory", action="store_true",
        help="Sequential CFG: run the uncond/cond UNet passes one after "
        "another instead of one doubled batch — peak activation HBM "
        "roughly halves, fitting larger batch/resolution combinations on "
        "one chip (e.g. 1024^2 batch 4 on 16 GB) at some throughput cost.",
    )
    parser.add_argument(
        "--aot_cache", action="store_true",
        help="Persist the denoise program (serialized trace + compiled TPU "
        "executable, .cache/jax_export/) keyed on source+shapes+settings: "
        "warm serving processes skip re-trace AND re-compile entirely "
        "(sets GMDX_AOT_CACHE=1; same tier bench.py uses).",
    )
    return parser.parse_args()


def main():
    args = parse_args()
    if args.aot_cache:
        os.environ["GMDX_AOT_CACHE"] = "1"

    import jax
    from gmdx.utils import enable_compilation_cache

    enable_compilation_cache()  # default-on persistent compile cache
    import jax.numpy as jnp
    import numpy as np

    from gmdx.io import load_image, save_image, to_model_input, save_hdr_image
    from gmdx.io.pipeline import load_component, load_pipeline
    from gmdx.ops import apply_gm_to_sdr
    from gmdx.pipelines import StableDiffusionGMPipeline

    os.makedirs(args.output_dir, exist_ok=True)

    bundle = load_pipeline(args.pretrained_model_name_or_path)
    unet_dir = args.unet_ckpt
    if os.path.isdir(os.path.join(unet_dir, "unet")):
        unet_dir = os.path.join(unet_dir, "unet")
    unet, unet_params = load_component(unet_dir)
    if unet.config.in_channels != 8:
        raise ValueError(
            f"--unet_ckpt must be the 8-channel GM UNet, got "
            f"in_channels={unet.config.in_channels}"
        )

    pipe = StableDiffusionGMPipeline(
        unet,
        bundle["modules"]["vae"],
        bundle["modules"]["text_encoder"],
        bundle["tokenizer"],
        bundle["scheduler"],
    )
    params = {
        "unet": unet_params,
        "vae": bundle["params"]["vae"],
        "text_encoder": bundle["params"]["text_encoder"],
    }
    if args.tp_size > 1 and args.sp_size > 1:
        raise ValueError("--tp_size and --sp_size are mutually exclusive")
    sp_mesh = None
    if args.tp_size > 1 or args.sp_size > 1:
        from gmdx.dist import make_mesh

        width = max(args.tp_size, args.sp_size)
        n = len(jax.devices())
        if n % width:
            raise ValueError(
                f"--tp_size/--sp_size {width} does not divide the device "
                f"count ({n})"
            )
        if args.tp_size > 1:
            from gmdx.dist import tp_shard_params
            from gmdx.dist.tpctx import tp_kernel_context

            mesh = make_mesh(
                None, ("data", "model"), shape=(n // width, width)
            )
            params = tp_shard_params(mesh, params)
            # Keep the Pallas attention fast path live under TP: traces
            # created while the context is active wrap their attention
            # kernel calls in a head-parallel shard_map over the model
            # axis (gmdx/dist/tpctx.py). Entered for the remainder of
            # main() — every pipeline trace below happens under TP.
            import contextlib

            _stack = contextlib.ExitStack()
            _stack.enter_context(tp_kernel_context(mesh))
        else:
            # Params stay replicated; the parallelism is the INPUT
            # placement — the pipeline's jitted ops inherit the H split
            # (conv halos, attention gathers placed by GSPMD). One image
            # at a time, so the spatial group is the whole (sub)mesh.
            from gmdx.dist import replicate

            sp_mesh = make_mesh(width, ("data", "model"), shape=(1, width))
            params = replicate(sp_mesh, params)

    pngs = sorted(glob.glob(os.path.join(args.sdr_input_path, "*.png")))
    if not pngs:
        raise FileNotFoundError(f"no .png files under {args.sdr_input_path}")
    print(f"found {len(pngs)} SDR images")

    key = jax.random.key(args.seed)
    bs = max(1, args.batch_size)
    for chunk_start in range(0, len(pngs), bs):
        chunk = pngs[chunk_start : chunk_start + bs]
        names, origs, latents = [], [], []
        for path in chunk:
            name = os.path.splitext(os.path.basename(path))[0]
            sdr01 = load_image(path, size=(args.resolution, args.resolution))
            sdr_in = jnp.asarray(to_model_input(sdr01))  # (1,3,H,W) [-1,1]
            if sp_mesh is not None:
                from gmdx.dist import spatial_sharding

                sdr_in = jax.device_put(sdr_in, spatial_sharding(sp_mesh, 4))
            # Per-image encode key: batch size never changes the encode
            # draw. crc32, not hash(): Python string hashing is randomized
            # per process (PYTHONHASHSEED), which silently made --seed
            # non-reproducible across runs.
            k_enc, _ = jax.random.split(
                jax.random.fold_in(key, zlib.crc32(name.encode()) % 2**31)
            )
            names.append(name)
            origs.append(np.asarray(sdr01, np.float32).transpose(2, 0, 1))
            latents.append(pipe.encode_sdr(params, sdr_in, k_enc))

        sdr_latent = jnp.concatenate(latents, axis=0)
        # One sampling-loop dispatch for the whole chunk — at batch 1 the
        # key matches the original per-image loop; at batch > 1 the noise
        # is drawn per chunk (documented: different draws, same model).
        _, k_pipe = jax.random.split(
            jax.random.fold_in(key, zlib.crc32(names[0].encode()) % 2**31)
        )
        gm_latent = pipe(
            params,
            sdr_latent,
            [args.prompt] * len(names),  # one (shared) prompt per frame
            key=k_pipe,
            num_inference_steps=args.num_inference_steps,
            output_type="latent",
            low_memory=args.low_memory,
        )

        decoded_sdr = np.asarray(pipe.decode_latents(params, sdr_latent))
        decoded_gm = np.asarray(pipe.decode_latents(params, gm_latent))
        for b, name in enumerate(names):
            dec_sdr01 = np.clip(decoded_sdr[b] / 2 + 0.5, 0, 1)
            gm01 = np.clip(decoded_gm[b] / 2 + 0.5, 0, 1)

            save_image(
                os.path.join(args.output_dir, f"sdr_{name}.png"),
                dec_sdr01.transpose(1, 2, 0),
            )
            save_image(
                os.path.join(args.output_dir, f"gm_{name}.png"),
                gm01.transpose(1, 2, 0),
            )

            # HDR from the decoded and the original SDR (reference :256-265).
            for tag, base in (("decoded", dec_sdr01), ("original", origs[b])):
                hdr = np.asarray(
                    apply_gm_to_sdr(
                        jnp.asarray(gm01), jnp.asarray(base), qmax=args.qmax,
                        clip_output=False,
                    )
                )
                save_hdr_image(
                    os.path.join(args.output_dir, f"hdr_{tag}_{name}.hdr"),
                    hdr.transpose(1, 2, 0),
                    qmax=args.qmax,
                )
            print(f"{name}: done")


if __name__ == "__main__":
    main()
