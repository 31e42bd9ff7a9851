"""Run the PyTorch reference pipelines vs gmdx and record PSNR parity.

The driver gate (BASELINE.json): HDR PSNR >= 40 dB vs the PyTorch reference.
This harness executes the reference pipeline classes from /root/reference
unmodified (under gmdx.refbridge's diffusers shim) with tiny random-init
torch models, pushes those weights through the production converter into
gmdx, injects identical initial latents + prompt embeddings, and compares:

  * GM pipeline latent + decoded image          (driver config 1 loop,
    reference stable_diffusion_gm.py:1040-1091)
  * dual-UNet SDR + GM latents                  (driver config 4 loop,
    stable_diffusion_dual_unet.py:1040-1113)
  * the full HDR export chain: decode -> Eq.(1) qmax=99 -> Radiance .hdr ->
    read-back                                    (generate_hdr.py:250-282)

Writes the results table to docs/PARITY.md (--doc) and exits nonzero if any
PSNR falls under --threshold.

Usage:
    python scripts/tools/parity_vs_reference.py [--steps 50] [--doc]
"""

from __future__ import annotations

import argparse
import datetime
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from gmdx.refbridge import force_cpu_jax  # noqa: E402

force_cpu_jax()

from gmdx.refbridge import parity  # noqa: E402


def reference_hdr_chain(stack, sdr_latent, gm_latent, out_path):
    """generate_hdr.py's export path on the torch side: decode both latents,
    numpy-twin Eq.(1) (no output clamp, formal_baseline.py:32-43), qmax=99,
    cv2 Radiance write with the /(qmax+1) normalization (:27-30)."""
    import cv2
    import torch

    qmax = 99.0
    with torch.no_grad():
        sdr = stack["vae"].decode(
            torch.from_numpy(sdr_latent) / 0.18215, return_dict=False
        )[0]
        gm = stack["vae"].decode(
            torch.from_numpy(gm_latent) / 0.18215, return_dict=False
        )[0]
    sdr01 = (sdr / 2 + 0.5).clamp(0, 1).permute(0, 2, 3, 1).numpy()[0]
    gm01 = (gm / 2 + 0.5).clamp(0, 1).permute(0, 2, 3, 1).numpy()[0]
    eps = 1.0 / 64.0
    hdr = (np.clip(sdr01, 0, 1) ** 2.2 + eps) * (1.0 + gm01 * qmax) - eps
    cv2.imwrite(out_path, (hdr / (qmax + 1)).astype(np.float32)[:, :, ::-1])
    return hdr


def gmdx_hdr_chain(params, sdr_latent, gm_latent, out_path, scale="tiny"):
    """The same chain through gmdx ops/io (generate_hdr CLI path)."""
    import jax.numpy as jnp

    from gmdx.io import save_hdr_image
    from gmdx.models import AutoencoderKL
    from gmdx.ops import apply_gm_to_sdr

    qmax = 99.0
    vae = AutoencoderKL(parity.scale_configs(scale)["vae"])

    def dec(z):
        img = vae.apply(
            {"params": params["vae"]}, jnp.asarray(z) / 0.18215,
            method=vae.decode,
        )
        return np.clip(np.asarray(img) / 2.0 + 0.5, 0.0, 1.0)[0]

    sdr01 = dec(sdr_latent)  # (3, H, W)
    gm01 = dec(gm_latent)
    hdr = np.asarray(
        apply_gm_to_sdr(
            jnp.asarray(gm01), jnp.asarray(sdr01), qmax=qmax, clip_output=False
        )
    )
    save_hdr_image(out_path, hdr.transpose(1, 2, 0), qmax=qmax)
    return hdr.transpose(1, 2, 0)


def read_hdr_file(path):
    import cv2

    return cv2.imread(path, cv2.IMREAD_ANYDEPTH | cv2.IMREAD_COLOR)[:, :, ::-1]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--threshold", type=float, default=40.0)
    ap.add_argument("--out-dir", default="/tmp/gmdx_parity")
    ap.add_argument("--config", choices=("tiny", "sd15"), default="tiny",
                    help="tiny = CPU-minutes tier across schedulers; sd15 = "
                    "the FULL pinned SD-1.5 config (random weights) at "
                    "reduced steps — single-core CPU hours")
    ap.add_argument("--doc", action="store_true",
                    help="tiny: rewrite docs/PARITY_RESULTS.md; sd15: append "
                    "the full-config section to it")
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    rows = []  # (config, metric, psnr)

    def record(config, metric, val):
        rows.append((config, metric, val))
        print(f"{config:44s} {metric:16s} {val:8.2f} dB", flush=True)

    if args.config == "sd15":
        run_sd15(args, record, rows)
        return

    stack = parity.make_torch_stack(0)
    params = parity.gmdx_params_from_torch(stack)
    inputs = parity.make_inputs(42)

    # --- GM pipeline across schedulers -------------------------------
    for sched, steps, gs in (
        ("pndm", args.steps, 7.5),
        ("ddim", args.steps, 7.5),
        ("dpm", 20, 7.5),
    ):
        ref_lat, ref_img = parity.run_reference_gm(
            stack, inputs, num_inference_steps=steps, scheduler=sched,
            guidance_scale=gs,
        )
        got_lat, got_img = parity.run_gmdx_gm(
            params, inputs, num_inference_steps=steps, scheduler=sched,
            guidance_scale=gs,
        )
        cfg = f"GM pipeline {sched} {steps} steps gs {gs}"
        record(cfg, "gm latent", parity.psnr(ref_lat, got_lat))
        record(cfg, "decoded image", parity.psnr(ref_img, got_img, peak=1.0))

    # --- dual pipeline ------------------------------------------------
    for sched, steps, gs, rescale in (
        ("pndm", args.steps, 7.5, 0.0),
        ("dpm", 75, 9.0, 0.0),
        ("pndm", args.steps, 7.5, 0.7),
    ):
        ref_sdr, ref_gm = parity.run_reference_dual(
            stack, inputs, num_inference_steps=steps, scheduler=sched,
            guidance_scale=gs, guidance_rescale=rescale,
        )
        got_sdr, got_gm = parity.run_gmdx_dual(
            params, inputs, num_inference_steps=steps, scheduler=sched,
            guidance_scale=gs, guidance_rescale=rescale,
        )
        cfg = f"dual pipeline {sched} {steps} steps gs {gs} gr {rescale}"
        record(cfg, "sdr latent", parity.psnr(ref_sdr, got_sdr))
        record(cfg, "gm latent", parity.psnr(ref_gm, got_gm))

    # --- HDR chain (driver config 1 export path) ----------------------
    ref_lat, _ = parity.run_reference_gm(
        stack, inputs, num_inference_steps=args.steps, scheduler="pndm"
    )
    got_lat, _ = parity.run_gmdx_gm(
        params, inputs, num_inference_steps=args.steps, scheduler="pndm"
    )
    ref_hdr_path = os.path.join(args.out_dir, "ref.hdr")
    gmdx_hdr_path = os.path.join(args.out_dir, "gmdx.hdr")
    ref_hdr = reference_hdr_chain(
        stack, inputs["sdr_latent"], ref_lat, ref_hdr_path
    )
    gmdx_hdr = gmdx_hdr_chain(
        params, inputs["sdr_latent"], got_lat, gmdx_hdr_path
    )
    record("HDR chain qmax=99 (in-memory)", "hdr image",
           parity.psnr(ref_hdr, gmdx_hdr))
    record("HDR chain qmax=99 (.hdr files read back)", "hdr file",
           parity.psnr(read_hdr_file(ref_hdr_path),
                       read_hdr_file(gmdx_hdr_path)))

    worst = min(v for _, _, v in rows)
    ok = worst >= args.threshold
    print(f"\n{'PASS' if ok else 'FAIL'}: worst {worst:.2f} dB "
          f"(threshold {args.threshold} dB, {len(rows)} measurements)")

    if args.doc:
        _write_doc(rows, worst, args)
    sys.exit(0 if ok else 1)


def run_sd15(args, record, rows) -> None:
    """Full-SD-1.5-config parity (VERDICT.md round-2 item 1): the pinned
    production config (generate_hdr.py:115-142) with random weights, GM +
    dual PNDM loops at reduced steps, plus the qmax=99 HDR export chain.
    Each UNet forward is seconds-to-minutes of single-core CPU — steps
    default to 10 here."""
    steps = args.steps if args.steps != 50 else 10
    print(f"[sd15] building full-config torch stack (random init)...",
          flush=True)
    stack = parity.make_torch_stack(0, scale="sd15")
    print("[sd15] converting weights through gmdx.io.torch_import...",
          flush=True)
    params = parity.gmdx_params_from_torch(stack)
    inputs = parity.make_inputs(42, scale="sd15")

    print(f"[sd15] GM pipeline pndm {steps} steps (reference side)...",
          flush=True)
    ref_lat, _ = parity.run_reference_gm(
        stack, inputs, num_inference_steps=steps, scheduler="pndm",
        with_image=False,
    )
    print("[sd15] GM pipeline (gmdx side)...", flush=True)
    got_lat, _ = parity.run_gmdx_gm(
        params, inputs, num_inference_steps=steps, scheduler="pndm",
        scale="sd15", with_image=False,
    )
    cfg = f"SD-1.5 full config: GM pipeline pndm {steps} steps gs 7.5"
    record(cfg, "gm latent", parity.psnr(ref_lat, got_lat))

    print(f"[sd15] dual pipeline pndm {steps} steps (reference side)...",
          flush=True)
    ref_sdr, ref_gm = parity.run_reference_dual(
        stack, inputs, num_inference_steps=steps, scheduler="pndm",
    )
    print("[sd15] dual pipeline (gmdx side)...", flush=True)
    got_sdr, got_gm = parity.run_gmdx_dual(
        params, inputs, num_inference_steps=steps, scheduler="pndm",
        scale="sd15",
    )
    cfg = f"SD-1.5 full config: dual pipeline pndm {steps} steps gs 7.5"
    record(cfg, "sdr latent", parity.psnr(ref_sdr, got_sdr))
    record(cfg, "gm latent", parity.psnr(ref_gm, got_gm))

    print("[sd15] HDR export chain (512^2 VAE decodes)...", flush=True)
    ref_hdr_path = os.path.join(args.out_dir, "ref_sd15.hdr")
    gmdx_hdr_path = os.path.join(args.out_dir, "gmdx_sd15.hdr")
    ref_hdr = reference_hdr_chain(
        stack, inputs["sdr_latent"], ref_gm, ref_hdr_path
    )
    gmdx_hdr = gmdx_hdr_chain(
        params, inputs["sdr_latent"], got_gm, gmdx_hdr_path, scale="sd15"
    )
    record("SD-1.5 full config: HDR chain qmax=99 (in-memory)", "hdr image",
           parity.psnr(ref_hdr, gmdx_hdr))
    record("SD-1.5 full config: HDR chain (.hdr files read back)", "hdr file",
           parity.psnr(read_hdr_file(ref_hdr_path),
                       read_hdr_file(gmdx_hdr_path)))

    worst = min(v for _, _, v in rows)
    ok = worst >= args.threshold
    print(f"\n{'PASS' if ok else 'FAIL'}: worst {worst:.2f} dB "
          f"(threshold {args.threshold} dB, {len(rows)} measurements)")
    if args.doc:
        _append_sd15_doc(rows, worst, args, steps)
    sys.exit(0 if ok else 1)


def _append_sd15_doc(rows, worst, args, steps) -> None:
    doc = os.path.join(os.path.dirname(__file__), "..", "..", "docs",
                       "PARITY_RESULTS.md")
    date = datetime.date.today().isoformat()
    with open(doc, "a") as f:
        f.write(
            f"\n## Full SD-1.5 config ({date})\n\n"
            "Produced by `python scripts/tools/parity_vs_reference.py "
            f"--config sd15 --steps {steps} --doc`. Same methodology as "
            "above, but at the FULL pinned SD-1.5 config "
            "(`/root/reference/scripts/inference/generate_hdr.py:115-142`): "
            "859M-param UNets, 4096-token attention, 64x64 latents, 512^2 "
            "VAE decodes — random weights, reduced steps (single-core CPU "
            "budget). Exercises the numerics that the tiny tier cannot: "
            "head_dim-40/80/160 attention dispatch, GroupNorm(32) over 1280 "
            "channels, the full down/up block stack.\n\n"
            "| configuration | metric | PSNR (dB) |\n|---|---|---|\n"
        )
        for cfg, metric, val in rows:
            f.write(f"| {cfg} | {metric} | {val:.2f} |\n")
        f.write(
            f"\n**Worst: {worst:.2f} dB** — gate is >= {args.threshold} dB.\n"
        )
    print(f"appended sd15 section to {os.path.normpath(doc)}")


def _write_doc(rows, worst, args) -> None:
    doc = os.path.join(os.path.dirname(__file__), "..", "..", "docs",
                       "PARITY_RESULTS.md")
    date = datetime.date.today().isoformat()
    with open(doc, "w") as f:
        f.write(
            f"# PSNR parity vs the PyTorch reference ({date})\n\n"
            "Produced by `python scripts/tools/parity_vs_reference.py "
            f"--steps {args.steps} --doc`.\n\n"
            "The reference side is the unmodified pipeline classes from "
            "`/root/reference/gm_diffusion/pipelines/` executed on CPU "
            "under `gmdx.refbridge` (diffusers shim + torch SD-architecture "
            "models + torch scheduler transcriptions), with tiny "
            "random-initialized weights. The gmdx side consumes the same "
            "weights through `gmdx.io.torch_import` (the production "
            "checkpoint path) and the same injected latents/embeddings. "
            "Full-scale SD-1.5 weights are unobtainable in this sandbox "
            "(zero egress); the SD-1.5 key/shape manifest test covers the "
            "converter at full scale structurally.\n\n"
            "| configuration | metric | PSNR (dB) |\n|---|---|---|\n"
        )
        for cfg, metric, val in rows:
            f.write(f"| {cfg} | {metric} | {val:.2f} |\n")
        f.write(
            f"\n**Worst: {worst:.2f} dB** — gate is >= {args.threshold} dB "
            "(driver BASELINE.json).\n"
        )
    print(f"wrote {os.path.normpath(doc)}")


if __name__ == "__main__":
    main()
