"""Dual-UNet text-to-HDR pipeline: joint SDR + gain-map denoising.

Behavioral parity with the reference StableDiffusionDualUNetPipeline
(gm_diffusion/pipelines/stable_diffusion_dual_unet.py:156,1040-1132),
preserving its subtleties (SURVEY.md §7.3):
  * separate scheduler state per branch (the reference deepcopies the
    scheduler, :1036-1037 — here simply two state pytrees);
  * the GM branch is conditioned on the SDR branch's x0 prediction computed
    from alphas_cumprod BEFORE the SDR scheduler step (:1072-1075);
  * the GM branch runs conditional-only — no CFG (:1083-1092);
  * gm_latents start as a copy of the SDR latents (:1012) and are overwritten
    by gm_scheduler.scale_model_input at the top of each step (:1048);
  * the batch>1 embedding mis-slice (``prompt_embeds[1:]``) is fixed to
    ``[batch:]`` as the reference's own Vis subclass does
    (visualize_latents.py:274) — identical behavior at batch 1.

The "Improved" pipeline is a verified byte-for-byte clone in the reference
(SURVEY.md C8); here it is an alias kept for API parity.

Also covers C9 (visualize_latents): ``return_intermediates=True`` stacks the
per-step (sdr, gm) latents from the scan ys instead of host-side clones.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gmdx.pipelines.gm import (
    StableDiffusionGMPipeline,
    rescale_noise_cfg,
    scheduler_step,
)

Array = jax.Array


@dataclasses.dataclass
class StableDiffusionDualUNetPipeline(StableDiffusionGMPipeline):
    """Adds the vanilla 4-ch SDR UNet next to the 8-ch GM UNet.

    ``unet`` (inherited) is the SDR UNet; ``gm_unet`` is the 8-channel one.
    """

    gm_unet: Any = None

    def prepare_latents(self, key, batch_size, height, width, dtype=jnp.float32):
        noise = jax.random.normal(
            key, (batch_size, 4, height // 8, width // 8), dtype
        )
        return noise * self.scheduler.init_noise_sigma

    @functools.cached_property
    def _denoise_dual_jit(self):
        # Same rationale as StableDiffusionGMPipeline._denoise_jit: weights
        # as arguments, not baked constants.
        return jax.jit(
            self._denoise_dual_impl,
            static_argnames=(
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
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        guidance_rescale: float = 0.0,
        eta: float = 0.0,
        step_keys: Optional[Array] = None,
        return_intermediates: bool = False,
        low_memory: bool = False,
    ):
        if step_keys is None:
            step_keys = jax.random.split(
                jax.random.key(0), self._num_steps(num_inference_steps)
            )
        statics = dict(
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale,
            guidance_rescale=guidance_rescale,
            eta=eta,
            return_intermediates=return_intermediates,
            low_memory=low_memory,
        )
        hit, out = self._aot_cached(
            self._denoise_dual_impl, statics,
            (params, prompt_embeds, negative_prompt_embeds, latents),
            step_keys,
        )
        if hit:
            return out
        return self._denoise_dual_jit(
            params, prompt_embeds, negative_prompt_embeds, latents,
            step_keys=step_keys,
            **statics,
        )

    def _denoise_dual_impl(
        self,
        params,
        prompt_embeds: Array,
        negative_prompt_embeds: Optional[Array],
        latents: Array,
        *,
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
        # Sequential CFG (low_memory): the uncond/cond SDR-UNet passes run
        # one after another over a lax.map'd context stack instead of one
        # CFG-doubled batch, so only ONE batch-B UNet's activations are live
        # at a time — peak HBM roughly halves on the dominant tensor class
        # and batch 4 fits a 16 GB chip at 1024^2 (BENCH_extra 5a). Same
        # math, same step count; throughput trades MXU batching for memory.
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
        gm_latents = latents  # reference :1012 latents.clone()
        if step_keys is None:
            step_keys = jax.random.split(jax.random.key(0), n_steps)

        sdr_unet = functools.partial(self.unet.apply, {"params": params["unet"]})
        gm_unet = functools.partial(
            self.gm_unet.apply, {"params": params["gm_unet"]}
        )

        def sched_step(st, eps, lat, key):
            return scheduler_step(sched, st, eps, lat, key=key, eta=eta)

        def body(carry, key):
            sdr_st, gm_st, lat, gm_lat = carry
            t = sdr_st.timestep

            # --- SDR branch with CFG (reference :1045-1069) ---
            lat_in = sched.scale_model_input(sdr_st, lat)
            # gm scale_model_input overwrites gm_latents (reference :1048).
            gm_lat = sched.scale_model_input(gm_st, gm_lat)
            if do_cfg and low_memory:
                eps2 = jax.lax.map(
                    lambda c: sdr_unet(lat_in, t, c, channels_last=True),
                    ctx_stack,
                )
                eps_uncond, eps_text = eps2[0], eps2[1]
                eps = eps_uncond + guidance_scale * (eps_text - eps_uncond)
                if guidance_rescale > 0.0:
                    eps = rescale_noise_cfg(eps, eps_text, guidance_rescale)
            else:
                if do_cfg:
                    lat_in = jnp.concatenate([lat_in, lat_in], axis=0)
                eps = sdr_unet(lat_in, t, context, channels_last=True)
                if do_cfg:
                    eps_uncond, eps_text = jnp.split(eps, 2, axis=0)
                    eps = eps_uncond + guidance_scale * (
                        eps_text - eps_uncond
                    )
                    if guidance_rescale > 0.0:
                        eps = rescale_noise_cfg(
                            eps, eps_text, guidance_rescale
                        )

            # --- x0 prediction BEFORE the SDR step (reference :1072-1075) ---
            a_t = acp[t]
            x0 = (lat - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)

            k_sdr, k_gm = jax.random.split(key)
            sdr_st, lat = sched_step(sdr_st, eps, lat, k_sdr)

            # --- GM branch, conditional-only (reference :1080-1093) ---
            gm_in = jnp.concatenate([x0, gm_lat], axis=-1)
            gm_eps = gm_unet(gm_in, t, prompt_embeds, channels_last=True)
            gm_st, gm_lat = sched_step(gm_st, gm_eps, gm_lat, k_gm)

            y = (lat, gm_lat) if return_intermediates else None
            return (sdr_st, gm_st, lat, gm_lat), y

        (sdr_state, gm_state, latents, gm_latents), inter = jax.lax.scan(
            body,
            (sdr_state, gm_state, latents, gm_latents),
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
        key: Optional[Array] = None,
        negative_prompt: str | Sequence[str] | None = None,
        height: int = 512,
        width: int = 512,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        guidance_rescale: float = 0.0,
        eta: float = 0.0,
        latents: Optional[Array] = None,
        prompt_embeds: Optional[Array] = None,
        negative_prompt_embeds: Optional[Array] = None,
        num_images_per_prompt: int = 1,
        cross_attention_kwargs: Optional[dict] = None,
        timesteps=None,
        sigmas=None,
        clip_skip: Optional[int] = None,
        output_type: str = "pil",
        return_intermediates: bool = False,
        low_memory: bool = False,
        callback_on_step_end=None,
        callback_on_step_end_tensor_inputs=None,
        callback=None,
        callback_steps: Optional[int] = None,
        **_ignored,  # parity: reference swallows unknown kwargs (:811)
    ):
        """Returns a (sdr, gm) tuple — postprocessed [0,1] NHWC numpy images,
        or raw latents when ``output_type == "latent"``.

        Return-shape parity: the reference ALSO returns a 2-tuple
        ``(sdr_latent, gm_latent)`` for every output type — its
        ``image = [latents, gm_latents]`` at
        stable_diffusion_dual_unet.py:1121 is an intermediate list whose two
        entries are postprocessed separately (identity for "latent") and
        returned as ``(sdr_latent, gm_latent)`` at :1131; the
        StableDiffusionPipelineOutput path after the early return (:1134-1140)
        is dead code. Consumers index the tuple
        (e.g. formal_baseline.py:219-225 ``sdr_latent, gm_latent = pipeline(...)``)."""
        self.check_inputs(
            prompt, height=height, width=width,
            guidance_rescale=guidance_rescale,
            negative_prompt=negative_prompt, latents=latents,
        )
        self._reject_custom_schedule(timesteps, sigmas)
        cb_tensor_inputs = self._validate_callback_args(
            callback_on_step_end, callback_on_step_end_tensor_inputs,
            callback, callback_steps,
        )
        has_cb = callback_on_step_end is not None or callback is not None
        if key is None:
            key = jax.random.key(0)
        k_lat, k_steps = jax.random.split(key)
        do_cfg = guidance_scale > 1.0
        prompt_embeds, neg_embeds = self._resolve_embeds(
            params, prompt, negative_prompt, prompt_embeds,
            negative_prompt_embeds, do_cfg=do_cfg, clip_skip=clip_skip,
            num_images_per_prompt=num_images_per_prompt,
        )
        params = self._apply_lora_scale(params, cross_attention_kwargs)
        batch = prompt_embeds.shape[0]
        if latents is None:
            latents = self.prepare_latents(k_lat, batch, height, width)
        n_steps = self._num_steps(num_inference_steps)
        step_keys = jax.random.split(k_steps, n_steps)
        capture = return_intermediates or has_cb
        out = self.denoise_dual(
            params,
            prompt_embeds,
            neg_embeds,
            latents,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale,
            guidance_rescale=guidance_rescale,
            eta=eta,
            step_keys=step_keys,
            return_intermediates=capture,
            low_memory=low_memory,
        )
        if capture:
            (sdr_lat, gm_lat), inter = out
        else:
            sdr_lat, gm_lat = out
            inter = None
        if has_cb:
            # The reference's `latents` local is the SDR branch
            # (stable_diffusion_dual_unet.py:1077-1088).
            self._emulate_step_end_callbacks(
                callback_on_step_end=callback_on_step_end,
                tensor_inputs=cb_tensor_inputs,
                callback=callback,
                callback_steps=callback_steps,
                step_latents=inter[0],
                timesteps=self._step_timesteps(
                    num_inference_steps, latents.shape
                ),
                prompt_embeds=prompt_embeds,
                negative_prompt_embeds=neg_embeds,
            )

        if output_type == "latent":
            result = (sdr_lat, gm_lat)
        else:
            both = np.asarray(
                self.decode_latents(
                    params, jnp.concatenate([sdr_lat, gm_lat], axis=0),
                    chunk=1 if low_memory else None,
                )
            )
            both = np.transpose(
                np.clip(both / 2.0 + 0.5, 0.0, 1.0), (0, 2, 3, 1)
            )
            b = sdr_lat.shape[0]
            result = (both[:b], both[b:])
        if return_intermediates:
            return result, inter
        return result


class StableDiffusionDualUNetImprovedPipeline(StableDiffusionDualUNetPipeline):
    """Alias: the reference's "improved" pipeline is byte-identical to the
    dual pipeline apart from its name (SURVEY.md C8; diff shows only a
    comment noting '20% SD-UNet warmup made no difference')."""


__all__ = [
    "StableDiffusionDualUNetPipeline",
    "StableDiffusionDualUNetImprovedPipeline",
]
