"""End-to-end parity: reference PyTorch pipelines vs gmdx, tiny scale.

The driver gate is "HDR PSNR >= 40 dB vs PyTorch reference" (BASELINE.json).
Full-scale SD-1.5 weights are unobtainable here (zero egress), so the proof
runs the *reference pipeline classes themselves* (loaded unmodified from
/root/reference under gmdx.refbridge.diffusers_shim) with tiny
randomly-initialized torch UNet/VAE models, exports those exact weights into
gmdx through the production converter (gmdx.io.torch_import), injects
identical initial latents + prompt embeddings into both sides, and compares
decoded outputs — precisely the fallback VERDICT.md round 1 prescribed.

What this proves: the denoise-loop algebra (CFG, scheduler stepping, dual
x0-conditioning), the weight-layout conversion, and the VAE decode/postprocess
chain all match the reference *implementation* to fp32 numerics. What it
cannot prove without real weights: behavior at SD-1.5 scale (covered
structurally by tests/test_sd15_manifest.py's key/shape manifest check).

Reference anchors: single-UNet loop gm_diffusion/pipelines/
stable_diffusion_gm.py:1040-1091; dual loop stable_diffusion_dual_unet.py:
1040-1113; latents= injection :796.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import numpy as np

from gmdx.models.unet2d import UNetConfig
from gmdx.models.vae import VAEConfig

# Tiny but structurally faithful configs. The VAE must keep the full 4-block
# stack: the reference GM pipeline hard-codes the x8 latent->pixel factor
# (stable_diffusion_gm.py:1006-1015 sizes latents from sdr_latent.shape * 8)
# and vae_scale_factor is derived as 2**(n_blocks-1). Channel widths are 32
# everywhere (GroupNorm(32) floor).
PARITY_GM_UNET_CONFIG = UNetConfig(
    in_channels=8,
    block_out_channels=(32, 64),
    num_attention_heads=2,
    cross_attention_dim=32,
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    sample_size=8,
)
PARITY_SDR_UNET_CONFIG = dataclasses.replace(PARITY_GM_UNET_CONFIG, in_channels=4)
PARITY_VAE_CONFIG = VAEConfig(
    block_out_channels=(32, 32, 32, 32), sample_size=64
)

SEQ_LEN = 7  # tiny context length
CTX_DIM = 32


def scale_configs(scale: str = "tiny"):
    """Model configs + input dims per parity scale.

    "tiny" is the CPU-minutes tier; "sd15" is the FULL pinned SD-1.5 config
    (reference generate_hdr.py:115-142) — random weights, real architecture,
    so numerics that only manifest at full config (head_dim dispatch,
    4096-token attention, GroupNorm(32) over 1280 channels, the 64x64 latent
    path) are exercised (VERDICT.md round-2 weak #1)."""
    if scale == "tiny":
        return {
            "gm_unet": PARITY_GM_UNET_CONFIG,
            "sdr_unet": PARITY_SDR_UNET_CONFIG,
            "vae": PARITY_VAE_CONFIG,
            "latent_hw": 8,
            "seq_len": SEQ_LEN,
            "ctx_dim": CTX_DIM,
        }
    if scale == "small":
        # Tiny channel widths but REAL sequence lengths: latents 32x32
        # (256^2 image) puts the UNet level-0 attention at 1024 tokens
        # (flash/KV-resident dispatch range), level-1 at 256 (KV-resident
        # floor), and the VAE mid attention at 1024 — so an on-chip run
        # with default kernels exercises the production Pallas paths while
        # the torch oracle stays CPU-minutes (kernel_parity_tpu --vs-torch).
        return {
            "gm_unet": PARITY_GM_UNET_CONFIG,
            "sdr_unet": PARITY_SDR_UNET_CONFIG,
            "vae": PARITY_VAE_CONFIG,
            "latent_hw": 32,
            "seq_len": SEQ_LEN,
            "ctx_dim": CTX_DIM,
        }
    if scale == "sd15":
        from gmdx.models import (
            SD15_GM_UNET_CONFIG,
            SD15_UNET_CONFIG,
            SD15_VAE_CONFIG,
        )

        return {
            "gm_unet": SD15_GM_UNET_CONFIG,
            "sdr_unet": SD15_UNET_CONFIG,
            "vae": SD15_VAE_CONFIG,
            "latent_hw": 64,
            "seq_len": 77,
            "ctx_dim": 768,
        }
    raise ValueError(f"unknown parity scale {scale!r}")


def make_torch_stack(seed: int = 0, scale: str = "tiny"):
    """Random-init torch models for the reference side. Returns a dict."""
    import torch

    from gmdx.refbridge import torch_models

    cfgs = scale_configs(scale)
    torch.manual_seed(seed)
    gm_unet = torch_models.UNet2DConditionModel(cfgs["gm_unet"]).eval()
    sdr_unet = torch_models.UNet2DConditionModel(cfgs["sdr_unet"]).eval()
    vae = torch_models.AutoencoderKL(cfgs["vae"]).eval()
    return {"gm_unet": gm_unet, "sdr_unet": sdr_unet, "vae": vae}


def torch_state_dict_numpy(module) -> Dict[str, np.ndarray]:
    # .numpy() aliases the tensor's storage — copy, so a later in-place
    # torch optimizer step can't mutate the converted params (train parity
    # runs the torch side's opt.step() on the same modules).
    return {
        k: v.detach().cpu().numpy().copy()
        for k, v in module.state_dict().items()
    }


def gmdx_params_from_torch(stack) -> Dict:
    """Run the production converter over the torch weights."""
    from gmdx.io.torch_import import (
        convert_unet_state_dict,
        convert_vae_state_dict,
    )

    return {
        "unet": convert_unet_state_dict(torch_state_dict_numpy(stack["gm_unet"])),
        "sdr_unet": convert_unet_state_dict(
            torch_state_dict_numpy(stack["sdr_unet"])
        ),
        "vae": convert_vae_state_dict(torch_state_dict_numpy(stack["vae"])),
    }


def make_inputs(seed: int = 42, scale: str = "tiny") -> Dict[str, np.ndarray]:
    """Shared inputs: initial latents, SDR conditioning latent, embeddings."""
    import torch

    cfgs = scale_configs(scale)
    hw, sl, cd = cfgs["latent_hw"], cfgs["seq_len"], cfgs["ctx_dim"]
    g = torch.Generator().manual_seed(seed)
    return {
        "latents": torch.randn(1, 4, hw, hw, generator=g).numpy(),
        "sdr_latent": torch.randn(1, 4, hw, hw, generator=g).numpy(),
        "prompt_embeds": torch.randn(1, sl, cd, generator=g).numpy(),
        "negative_prompt_embeds": torch.randn(
            1, sl, cd, generator=g
        ).numpy(),
    }


# -------------------------------------------------------------------------
# reference side
# -------------------------------------------------------------------------


def _ref_scheduler(name: str):
    from gmdx.refbridge import torch_schedulers as ts

    return {
        "pndm": ts.PNDMScheduler,
        "ddim": ts.DDIMScheduler,
        "ddpm": ts.DDPMScheduler,
        "dpm": ts.DPMSolverMultistepScheduler,
    }[name]()


def run_reference_gm(
    stack, inputs, *, num_inference_steps: int = 50,
    guidance_scale: float = 7.5, scheduler: str = "pndm",
    guidance_rescale: float = 0.0, eta: float = 0.0,
    with_image: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Reference single-UNet GM pipeline. Returns (gm_latent, image01_nhwc)."""
    import torch

    from gmdx.refbridge import load_reference_pipeline

    cls = load_reference_pipeline("StableDiffusionGMPipeline")
    pipe = cls(
        vae=stack["vae"], text_encoder=None, tokenizer=None,
        unet=stack["gm_unet"], scheduler=_ref_scheduler(scheduler),
        safety_checker=None, feature_extractor=None, image_encoder=None,
        requires_safety_checker=False,
    )
    kw = dict(
        sdr_latent=torch.from_numpy(inputs["sdr_latent"]),
        prompt_embeds=torch.from_numpy(inputs["prompt_embeds"]),
        negative_prompt_embeds=torch.from_numpy(
            inputs["negative_prompt_embeds"]
        ),
        latents=torch.from_numpy(inputs["latents"]),
        num_inference_steps=num_inference_steps,
        guidance_scale=guidance_scale,
        guidance_rescale=guidance_rescale,
        eta=eta,
        generator=torch.Generator().manual_seed(7),
        return_dict=False,
    )
    with torch.no_grad():
        latent = pipe(output_type="latent", **kw)[0]
        # with_image=False skips the second full pipeline run (the denoise
        # loop re-executes for output_type="np") — at sd15 scale that is
        # minutes of single-core CPU for a decode the HDR chain covers.
        image = pipe(output_type="np", **kw)[0] if with_image else None
    return latent.numpy(), image


def run_reference_dual(
    stack, inputs, *, num_inference_steps: int = 50,
    guidance_scale: float = 7.5, scheduler: str = "pndm",
    guidance_rescale: float = 0.0, eta: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Reference dual-UNet pipeline. Returns (sdr_latent, gm_latent)."""
    import torch

    from gmdx.refbridge import load_reference_pipeline

    cls = load_reference_pipeline("StableDiffusionDualUNetPipeline")
    pipe = cls(
        vae=stack["vae"], text_encoder=None, tokenizer=None,
        unet=stack["sdr_unet"], gm_unet=stack["gm_unet"],
        scheduler=_ref_scheduler(scheduler),
        safety_checker=None, feature_extractor=None, image_encoder=None,
        requires_safety_checker=False,
    )
    # CFG batch for the dual pipeline: embeds enter as [neg, pos]; the GM
    # branch slices prompt_embeds[1:] (conditional only).
    with torch.no_grad():
        sdr_lat, gm_lat = pipe(
            prompt_embeds=torch.from_numpy(inputs["prompt_embeds"]),
            negative_prompt_embeds=torch.from_numpy(
                inputs["negative_prompt_embeds"]
            ),
            latents=torch.from_numpy(inputs["latents"]),
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale,
            guidance_rescale=guidance_rescale,
            eta=eta,
            generator=torch.Generator().manual_seed(7),
            output_type="latent",
        )
    return sdr_lat.numpy(), gm_lat.numpy()


# -------------------------------------------------------------------------
# gmdx side
# -------------------------------------------------------------------------


def _gmdx_scheduler(name: str):
    import gmdx.schedulers as S

    return {
        "pndm": S.PNDMScheduler,
        "ddim": S.DDIMScheduler,
        "ddpm": S.DDPMScheduler,
        "dpm": S.DPMSolverMultistepScheduler,
    }[name]()


def run_gmdx_gm(
    params, inputs, *, num_inference_steps: int = 50,
    guidance_scale: float = 7.5, scheduler: str = "pndm",
    guidance_rescale: float = 0.0, eta: float = 0.0, scale: str = "tiny",
    with_image: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """gmdx single-UNet GM pipeline with injected latents/embeds."""
    import jax.numpy as jnp

    from gmdx.models import AutoencoderKL, UNet2DConditionModel
    from gmdx.pipelines import StableDiffusionGMPipeline

    cfgs = scale_configs(scale)
    unet = UNet2DConditionModel(cfgs["gm_unet"])
    vae = AutoencoderKL(cfgs["vae"])
    pipe = StableDiffusionGMPipeline(unet, vae, None, None,
                                     _gmdx_scheduler(scheduler))
    p = {"unet": params["unet"], "vae": params["vae"]}
    gm_latents = pipe.denoise(
        p,
        jnp.asarray(inputs["sdr_latent"]),
        jnp.asarray(inputs["prompt_embeds"]),
        jnp.asarray(inputs["negative_prompt_embeds"]),
        jnp.asarray(inputs["latents"]),
        num_inference_steps=num_inference_steps,
        guidance_scale=guidance_scale,
        guidance_rescale=guidance_rescale,
        eta=eta,
    )
    if not with_image:
        return np.asarray(gm_latents), None
    img = pipe.decode_latents(p, gm_latents)
    img01 = np.clip(np.asarray(img) / 2.0 + 0.5, 0.0, 1.0)
    return np.asarray(gm_latents), np.transpose(img01, (0, 2, 3, 1))


def run_gmdx_dual(
    params, inputs, *, num_inference_steps: int = 50,
    guidance_scale: float = 7.5, scheduler: str = "pndm",
    guidance_rescale: float = 0.0, eta: float = 0.0, scale: str = "tiny",
) -> Tuple[np.ndarray, np.ndarray]:
    import jax.numpy as jnp

    from gmdx.models import AutoencoderKL, UNet2DConditionModel
    from gmdx.pipelines import StableDiffusionDualUNetPipeline

    cfgs = scale_configs(scale)
    sdr_unet = UNet2DConditionModel(cfgs["sdr_unet"])
    gm_unet = UNet2DConditionModel(cfgs["gm_unet"])
    vae = AutoencoderKL(cfgs["vae"])
    pipe = StableDiffusionDualUNetPipeline(
        sdr_unet, vae, None, None, _gmdx_scheduler(scheduler),
        gm_unet=gm_unet,
    )
    p = {
        "unet": params["sdr_unet"],
        "gm_unet": params["unet"],
        "vae": params["vae"],
    }
    sdr_lat, gm_lat = pipe.denoise_dual(
        p,
        jnp.asarray(inputs["prompt_embeds"]),
        jnp.asarray(inputs["negative_prompt_embeds"]),
        jnp.asarray(inputs["latents"]),
        num_inference_steps=num_inference_steps,
        guidance_scale=guidance_scale,
        guidance_rescale=guidance_rescale,
        eta=eta,
    )
    return np.asarray(sdr_lat), np.asarray(gm_lat)


# -------------------------------------------------------------------------
# metric
# -------------------------------------------------------------------------


def psnr(a: np.ndarray, b: np.ndarray, peak: float | None = None) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch {a.shape} vs {b.shape}")
    if peak is None:
        peak = max(float(np.abs(a).max()), float(np.abs(b).max()), 1e-9)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * float(np.log10(peak**2 / mse))


__all__ = [
    "scale_configs",
    "PARITY_GM_UNET_CONFIG",
    "PARITY_SDR_UNET_CONFIG",
    "PARITY_VAE_CONFIG",
    "make_torch_stack",
    "gmdx_params_from_torch",
    "make_inputs",
    "run_reference_gm",
    "run_reference_dual",
    "run_gmdx_gm",
    "run_gmdx_dual",
    "psnr",
]
