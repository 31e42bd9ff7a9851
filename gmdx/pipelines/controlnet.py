"""ControlNet-conditioned text-to-HDR + SDR→HDRTV up-conversion pipeline.

Driver config 5 (BASELINE.md): "ControlNet-conditioned HDR generation +
SDR-to-HDRTV up-conversion at 1024^2" — capability the reference only
mentions in its README (README.md:23,149; no code — SURVEY.md §7.3). Built
as the dual-UNet joint sampler (gmdx/pipelines/dual.py) with ControlNet
residuals steering the SDR branch:

  * text-to-HDR with control: any control image (edges, depth, or an SDR
    frame) conditions the SDR branch; the GM branch stays x0-conditioned.
  * SDR→HDRTV: the control image IS the input SDR frame; the denoised SDR
    branch reconstructs it while the GM branch synthesizes the gain map;
    Eq.(1) + BT.2020 export happens in the caller as usual.

The ControlNet runs on the CFG-doubled batch like the SDR UNet (standard
diffusers semantics); the GM branch never sees control residuals.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp

from gmdx.pipelines.dual import StableDiffusionDualUNetPipeline
from gmdx.pipelines.gm import rescale_noise_cfg, scheduler_step

Array = jax.Array


@dataclasses.dataclass
class StableDiffusionControlNetHDRPipeline(StableDiffusionDualUNetPipeline):
    """Dual-UNet HDR sampler + ControlNet on the SDR branch.

    Extra param tree key: ``params["controlnet"]``.
    """

    controlnet: Any = None
    # Control kwargs stashed by __call__ so the inherited call body threads
    # them into denoise_dual without duplicating it.
    _control_kwargs: Optional[dict] = None

    @functools.cached_property
    def _denoise_control_jit(self):
        return jax.jit(
            self._denoise_control_impl,
            static_argnames=(
                "conditioning_scale",
                "num_inference_steps",
                "guidance_scale",
                "guidance_rescale",
                "eta",
                "return_intermediates",
                "low_memory",
            ),
        )

    def denoise_dual(
        self,
        params,
        prompt_embeds: Array,
        negative_prompt_embeds: Optional[Array],
        latents: Array,
        *,
        control_image: Optional[Array] = None,  # (B, 3, H, W) in [0, 1]
        conditioning_scale: float = 1.0,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        guidance_rescale: float = 0.0,
        eta: float = 0.0,
        step_keys: Optional[Array] = None,
        return_intermediates: bool = False,
        low_memory: bool = False,
    ):
        # Resolve the __call__-stashed control kwargs OUTSIDE the jitted
        # impl (a closure read inside jit would bake the first control
        # image into the cached trace).
        if control_image is None and self._control_kwargs:
            control_image = self._control_kwargs.get("control_image")
            conditioning_scale = self._control_kwargs.get(
                "conditioning_scale", conditioning_scale
            )
        if control_image is None:
            return super().denoise_dual(
                params, prompt_embeds, negative_prompt_embeds, latents,
                num_inference_steps=num_inference_steps,
                guidance_scale=guidance_scale,
                guidance_rescale=guidance_rescale, eta=eta,
                step_keys=step_keys, return_intermediates=return_intermediates,
                low_memory=low_memory,
            )
        if step_keys is None:
            step_keys = jax.random.split(
                jax.random.key(0), self._num_steps(num_inference_steps)
            )
        return self._denoise_control_jit(
            params, prompt_embeds, negative_prompt_embeds, latents,
            control_image,
            conditioning_scale=float(conditioning_scale),
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale,
            guidance_rescale=guidance_rescale,
            eta=eta,
            step_keys=step_keys,
            return_intermediates=return_intermediates,
            low_memory=low_memory,
        )

    def _denoise_control_impl(
        self,
        params,
        prompt_embeds: Array,
        negative_prompt_embeds: Optional[Array],
        latents: Array,
        control_image: Array,
        *,
        conditioning_scale: float = 1.0,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        guidance_rescale: float = 0.0,
        eta: float = 0.0,
        step_keys: Optional[Array] = None,
        return_intermediates: bool = False,
        low_memory: bool = False,
    ):
        do_cfg = negative_prompt_embeds is not None
        context = (
            jnp.concatenate([negative_prompt_embeds, prompt_embeds])
            if do_cfg
            else prompt_embeds
        )
        # Sequential CFG (see dual.py denoise_dual low_memory): one batch-B
        # ControlNet+UNet pass per context instead of a CFG-doubled batch.
        ctx_stack = (
            jnp.stack([negative_prompt_embeds, prompt_embeds])
            if (do_cfg and low_memory)
            else None
        )
        sched = self.scheduler
        acp = sched.alphas_cumprod
        n_steps = self._num_steps(num_inference_steps)
        # NHWC across the scan (see gm.py _denoise_impl).
        latents = jnp.transpose(latents, (0, 2, 3, 1))
        sdr_state = self._init_sched_state(num_inference_steps, latents.shape)
        gm_state = self._init_sched_state(num_inference_steps, latents.shape)
        gm_latents = latents
        if step_keys is None:
            step_keys = jax.random.split(jax.random.key(0), n_steps)

        sdr_unet = functools.partial(self.unet.apply, {"params": params["unet"]})
        gm_unet = functools.partial(
            self.gm_unet.apply, {"params": params["gm_unet"]}
        )
        cnet = functools.partial(
            self.controlnet.apply, {"params": params["controlnet"]}
        )
        ctrl = jnp.transpose(control_image, (0, 2, 3, 1))
        if do_cfg and not low_memory:
            ctrl = jnp.concatenate([ctrl, ctrl], axis=0)

        def sched_step(st, eps, lat, key):
            return scheduler_step(sched, st, eps, lat, key=key, eta=eta)

        def body(carry, key):
            sdr_st, gm_st, lat, gm_lat = carry
            t = sdr_st.timestep

            lat_in = sched.scale_model_input(sdr_st, lat)
            gm_lat = sched.scale_model_input(gm_st, gm_lat)
            if do_cfg and low_memory:
                def one_pass(c):
                    down_res, mid_res = cnet(
                        lat_in, t, c, ctrl, conditioning_scale,
                        channels_last=True,
                    )
                    return sdr_unet(
                        lat_in, t, c,
                        down_block_additional_residuals=down_res,
                        mid_block_additional_residual=mid_res,
                        channels_last=True,
                    )

                eps2 = jax.lax.map(one_pass, ctx_stack)
                eps_uncond, eps_text = eps2[0], eps2[1]
                eps = eps_uncond + guidance_scale * (eps_text - eps_uncond)
                if guidance_rescale > 0.0:
                    eps = rescale_noise_cfg(eps, eps_text, guidance_rescale)
            else:
                if do_cfg:
                    lat_in = jnp.concatenate([lat_in, lat_in], axis=0)
                down_res, mid_res = cnet(
                    lat_in, t, context, ctrl, conditioning_scale,
                    channels_last=True,
                )
                eps = sdr_unet(
                    lat_in, t, context,
                    down_block_additional_residuals=down_res,
                    mid_block_additional_residual=mid_res,
                    channels_last=True,
                )
                if do_cfg:
                    eps_uncond, eps_text = jnp.split(eps, 2, axis=0)
                    eps = eps_uncond + guidance_scale * (
                        eps_text - eps_uncond
                    )
                    if guidance_rescale > 0.0:
                        eps = rescale_noise_cfg(
                            eps, eps_text, guidance_rescale
                        )

            a_t = acp[t]
            x0 = (lat - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)

            k_sdr, k_gm = jax.random.split(key)
            sdr_st, lat = sched_step(sdr_st, eps, lat, k_sdr)

            gm_in = jnp.concatenate([x0, gm_lat], axis=-1)
            gm_eps = gm_unet(gm_in, t, prompt_embeds, channels_last=True)
            gm_st, gm_lat = sched_step(gm_st, gm_eps, gm_lat, k_gm)

            y = (lat, gm_lat) if return_intermediates else None
            return (sdr_st, gm_st, lat, gm_lat), y

        (sdr_state, gm_state, latents, gm_latents), inter = jax.lax.scan(
            body, (sdr_state, gm_state, latents, gm_latents),
            step_keys[:n_steps],
        )
        latents = jnp.transpose(latents, (0, 3, 1, 2))
        gm_latents = jnp.transpose(gm_latents, (0, 3, 1, 2))
        if return_intermediates:
            inter = jax.tree.map(
                lambda a: jnp.transpose(a, (0, 1, 4, 2, 3)), inter
            )
            return (latents, gm_latents), inter
        return latents, gm_latents

    def __call__(
        self,
        params,
        prompt: str | Sequence[str] = "",
        *,
        control_image: Optional[Array] = None,
        conditioning_scale: float = 1.0,
        **kwargs,
    ):
        self._control_kwargs = {
            "control_image": control_image,
            "conditioning_scale": conditioning_scale,
        }
        try:
            return super().__call__(params, prompt, **kwargs)
        finally:
            self._control_kwargs = None


def upconvert_sdr_to_hdrtv(
    pipe: StableDiffusionControlNetHDRPipeline,
    params,
    sdr_image01: Array,  # (B, 3, H, W) in [0, 1]
    prompt: str = "high dynamic range, HDR10, 4000 nits peak brightness",
    *,
    key: Optional[Array] = None,
    num_inference_steps: int = 50,
    guidance_scale: float = 7.5,
    conditioning_scale: float = 1.0,
    qmax: float = 99.0,
    prompt_embeds: Optional[Array] = None,
    negative_prompt_embeds: Optional[Array] = None,
    low_memory: bool = False,
):
    """SDR→HDRTV: condition the SDR branch on the input frame, synthesize the
    gain map jointly, return (sdr01, gm01, hdr) numpy arrays (BT.2020-ready;
    callers export via gmdx.io.save_hdr_image).

    ``prompt_embeds``/``negative_prompt_embeds`` bypass the tokenizer/text
    encoder (same passthrough as the pipelines' ``__call__``) — used by
    tokenizer-less setups like the bench harness."""
    import numpy as np

    from gmdx.ops import apply_gm_to_sdr

    b, _, h, w = sdr_image01.shape
    sdr01_np, gm01_np = pipe(
        params,
        [prompt] * b,
        control_image=sdr_image01,
        conditioning_scale=conditioning_scale,
        key=key,
        height=h,
        width=w,
        num_inference_steps=num_inference_steps,
        guidance_scale=guidance_scale,
        prompt_embeds=prompt_embeds,
        negative_prompt_embeds=negative_prompt_embeds,
        low_memory=low_memory,
    )
    # Resize the gain map to the input resolution before Eq.(1) — the
    # reference's own batched experiment does the same
    # (scripts/stage2/experiments/batch_size_sweep.py:263-267).
    gm = jnp.asarray(gm01_np.transpose(0, 3, 1, 2))
    if gm.shape[-2:] != (h, w):
        gm = jax.image.resize(gm, (b, gm.shape[1], h, w), method="bilinear")
    hdr = np.asarray(
        apply_gm_to_sdr(
            gm, jnp.asarray(sdr_image01), qmax=qmax, clip_output=False
        )
    )
    return sdr01_np, gm01_np, hdr


__all__ = [
    "StableDiffusionControlNetHDRPipeline",
    "upconvert_sdr_to_hdrtv",
]
