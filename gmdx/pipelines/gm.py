"""Single-UNet gain-map pipeline: SDR-latent-conditioned GM synthesis.

Behavioral parity with the reference StableDiffusionGMPipeline
(gm_diffusion/pipelines/stable_diffusion_gm.py:156,780-1106): 4-channel noise
latents sized from the conditioning SDR latent, per-step channel concat
[sdr_latent, latents] -> 8-ch UNet, CFG duplication, optional
rescale_noise_cfg, scheduler step — but the whole denoise loop is ONE jitted
``lax.scan`` (the jit step boundary replaces the reference's per-step
``xm.mark_step()``), prompts are encoded once on the host boundary, and the
scheduler is explicit functional state in the scan carry.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def rescale_noise_cfg(
    noise_cfg: Array, noise_pred_text: Array, guidance_rescale: float = 0.0
) -> Array:
    """Rescale CFG output toward the text branch's std (Lin et al. 2023,
    reference stable_diffusion_dual_unet.py:71-94)."""
    axes = tuple(range(1, noise_cfg.ndim))
    std_text = jnp.std(noise_pred_text, axis=axes, keepdims=True)
    std_cfg = jnp.std(noise_cfg, axis=axes, keepdims=True)
    rescaled = noise_cfg * (std_text / std_cfg)
    return guidance_rescale * rescaled + (1.0 - guidance_rescale) * noise_cfg


def get_guidance_scale_embedding(
    w: Array, embedding_dim: int = 512, dtype=jnp.float32
) -> Array:
    """Sinusoidal guidance-scale embedding for guidance-distilled UNets
    (reference stable_diffusion_gm.py:719-747; SD-1.5 itself has no
    time_cond_proj, so this is exposed for API parity and LCM-style models)."""
    w = jnp.atleast_1d(w) * 1000.0
    half = embedding_dim // 2
    emb = jnp.log(10000.0) / (half - 1)
    emb = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
    emb = w.astype(jnp.float32)[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb.astype(dtype)


@functools.lru_cache(maxsize=None)
def _step_kwarg_names(sched_cls) -> frozenset:
    import inspect

    return frozenset(inspect.signature(sched_cls.step).parameters)


def scheduler_step(sched, state, eps, latents, *, key=None, eta: float = 0.0):
    """Dispatch a scheduler step across the family's signatures: DDIM takes
    (eta, key), DDPM takes key, PNDM/DPM++ take neither. Dispatch inspects
    the signature — catching TypeError would swallow real errors raised
    inside a matching step() and silently retry without eta/key."""
    names = _step_kwarg_names(type(sched))
    kwargs = {}
    if "key" in names:
        kwargs["key"] = key
    if "eta" in names:
        kwargs["eta"] = eta
    return sched.step(state, eps, latents, **kwargs)


@dataclasses.dataclass
class StableDiffusionGMPipeline:
    """Functional pipeline: modules are static, params are call arguments."""

    unet: Any  # 8-channel UNet2DConditionModel
    vae: Any  # AutoencoderKL
    text_encoder: Any  # CLIPTextModel
    tokenizer: Any  # CLIPTokenizer
    scheduler: Any  # functional scheduler (PNDM by default)
    # Optional NSFW filter hook (reference run_safety_checker,
    # stable_diffusion_gm.py:585-597): callable (images01_nhwc) ->
    # (images01_nhwc, has_nsfw_list). None disables, like the reference's
    # safety_checker=None load path.
    safety_checker: Any = None

    # Step-end-callback surface (reference stable_diffusion_gm.py:806-810,
    # 1073-1088; tensor whitelist at stable_diffusion_dual_unet.py:200).
    _callback_tensor_inputs = ("latents", "prompt_embeds", "negative_prompt_embeds")

    # -- validation (reference check_inputs, stable_diffusion_gm.py:627-694)
    @staticmethod
    def check_inputs(
        prompt=None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        guidance_rescale: float = 0.0,
        negative_prompt=None,
        latents: Optional[Array] = None,
    ) -> None:
        """Raise ValueError on malformed inputs instead of failing deep in
        the traced graph."""
        for name, v in (("height", height), ("width", width)):
            if v is not None and v % 8 != 0:
                raise ValueError(f"{name} must be divisible by 8, got {v}")
        if prompt is not None and not isinstance(prompt, (str, list, tuple)):
            raise ValueError(f"prompt must be str or list, got {type(prompt)}")
        if negative_prompt is not None and not isinstance(
            negative_prompt, (str, list, tuple)
        ):
            raise ValueError(
                f"negative_prompt must be str or list, got {type(negative_prompt)}"
            )
        if (
            isinstance(prompt, (list, tuple))
            and isinstance(negative_prompt, (list, tuple))
            and len(prompt) != len(negative_prompt)
        ):
            raise ValueError(
                f"prompt batch {len(prompt)} != negative_prompt batch "
                f"{len(negative_prompt)}"
            )
        if not 0.0 <= guidance_rescale <= 1.0:
            raise ValueError(f"guidance_rescale must be in [0, 1], got {guidance_rescale}")
        if latents is not None and (latents.ndim != 4 or latents.shape[1] != 4):
            raise ValueError(
                f"latents must be (B, 4, h, w), got {getattr(latents, 'shape', None)}"
            )

    # -- prompt handling (host boundary) ----------------------------------
    def encode_prompt(
        self,
        params,
        prompt: str | Sequence[str],
        negative_prompt: str | Sequence[str] | None = None,
        *,
        do_cfg: bool = True,
        clip_skip: Optional[int] = None,
    ) -> tuple[Array, Optional[Array]]:
        """Returns (cond_embeds, uncond_embeds or None), each (B, 77, D)."""
        if isinstance(prompt, str):
            prompt = [prompt]
        ids = jnp.asarray(self.tokenizer(list(prompt))["input_ids"])
        embed = functools.partial(
            self.text_encoder.apply, {"params": params["text_encoder"]}
        )
        cond = embed(ids, clip_skip=clip_skip)
        if not do_cfg:
            return cond, None
        if negative_prompt is None:
            negative_prompt = [""] * len(prompt)
        elif isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * len(prompt)
        neg_ids = jnp.asarray(self.tokenizer(list(negative_prompt))["input_ids"])
        uncond = embed(neg_ids, clip_skip=clip_skip)
        return cond, uncond

    def encode_sdr(self, params, sdr_image: Array, key: Array) -> Array:
        """VAE-encode an SDR image batch (B, 3, H, W) in [-1, 1] to a scaled
        latent (B, 4, H/8, W/8) — the generate_hdr.py:208-209 preprocessing."""
        post = self.vae.apply(
            {"params": params["vae"]}, sdr_image, method=self.vae.encode
        )
        return post.sample(key) * self.vae.config.scaling_factor

    def decode_latents(
        self, params, latents: Array, chunk: Optional[int] = None
    ) -> Array:
        """Latents -> image in [-1, 1] (B, 3, H, W).

        ``chunk`` decodes ``chunk`` images at a time via ``lax.map`` instead
        of one batched pass: at 1024² the decoder's level-0 activations are
        ~1 GB/image/layer, and the batched decode — not the denoise — is
        what OOMs batch ≥4 on a 16 GB chip (BENCHNOTES r5). Requires
        ``B % chunk == 0``."""

        def dec(z):
            return self.vae.apply(
                {"params": params["vae"]},
                z / self.vae.config.scaling_factor,
                method=self.vae.decode,
            )

        b = latents.shape[0]
        if chunk is None or b <= chunk:
            return dec(latents)
        if b % chunk != 0:
            raise ValueError(
                f"decode chunk {chunk} must divide the batch {b}"
            )
        groups = latents.reshape((b // chunk, chunk) + latents.shape[1:])
        out = jax.lax.map(dec, groups)
        return out.reshape((b,) + out.shape[2:])

    # -- sampling ----------------------------------------------------------
    def prepare_latents(
        self, key: Array, sdr_latent: Array, dtype=jnp.float32
    ) -> Array:
        """4-ch noise sized from the SDR latent (reference hard-forces 4
        channels and derives H, W from the conditioning latent,
        stable_diffusion_gm.py:1002-1015)."""
        b, _, h, w = sdr_latent.shape
        noise = jax.random.normal(key, (b, 4, h, w), dtype)
        return noise * self.scheduler.init_noise_sigma

    def _num_steps(self, num_inference_steps: int) -> int:
        if hasattr(self.scheduler, "num_steps"):
            return self.scheduler.num_steps(num_inference_steps)
        return num_inference_steps

    def _init_sched_state(self, num_inference_steps: int, shape):
        try:
            return self.scheduler.init_state(num_inference_steps, shape)
        except TypeError:
            return self.scheduler.init_state(num_inference_steps)

    @functools.cached_property
    def _denoise_jit(self):
        # Params enter as jit ARGUMENTS: closing over them would bake multi-GB
        # weight constants into the lowering (slow compile, re-lowered per
        # params object). One cached executable per (shapes, static config).
        return jax.jit(
            self._denoise_impl,
            static_argnames=(
                "num_inference_steps",
                "guidance_scale",
                "guidance_rescale",
                "eta",
                "return_intermediates",
                "low_memory",
            ),
        )

    def _aot_cached(self, impl, statics: dict, args: tuple, step_keys):
        """Serving AOT tier (opt-in, ``GMDX_AOT_CACHE=1``): route a denoise
        call through gmdx.utils.cached_export — serialized trace + (on TPU)
        serialized executable keyed on source/avals/statics — so a serving
        process skips re-trace AND re-compile on warm start, the same
        mechanism bench.py uses. Returns (sentinel, result): sentinel False
        when disabled (callers fall back to the in-process jit)."""
        import os

        if os.environ.get("GMDX_AOT_CACHE", "0") != "1":
            return False, None
        from gmdx.utils import cached_export

        def fn(*a):  # step_keys rides as the LAST traced argument
            return impl(*a[:-1], step_keys=a[-1], **statics)

        # Key EVERYTHING trace-determining that is baked in as a constant
        # rather than arriving as a traced argument: scheduler config values
        # (prediction_type / beta schedule change numerics at identical
        # avals), model configs that don't change param shapes (head count,
        # norm eps), and whether a TP kernel context was active at trace
        # time (a TP trace bakes a shard_map over a mesh a single-chip run
        # doesn't have — sharing those cache entries would be a collision).
        from gmdx.dist import tpctx as _tpctx

        def _cfg(mod):
            cfg = getattr(mod, "config", None)
            return repr(cfg) if cfg is not None else type(mod).__name__

        ctx = _tpctx.active()
        ctx_tag = (
            "tp0" if ctx is None
            else f"tp({getattr(ctx, 'axis', '?')},{getattr(ctx, 'size', '?')})"
        )
        # The raw config reprs run to hundreds of characters — embedding
        # them in the key (which becomes the artifact FILENAME) overflows
        # NAME_MAX and the cache write fails silently; digest them instead.
        import hashlib

        baked = (
            "sched:" + repr(getattr(self.scheduler, "config", None))
            + "|unet:" + _cfg(self.unet)
            + "|vae:" + _cfg(self.vae)
            + (
                "|gmunet:" + _cfg(self.gm_unet)
                if getattr(self, "gm_unet", None) is not None else ""
            )
            + "|" + ctx_tag
        )
        key = (
            f"pipe-{type(self).__name__}-{impl.__name__}-"
            f"{type(self.scheduler).__name__}-"
            + "-".join(f"{k}={v}" for k, v in sorted(statics.items()))
            + "-" + hashlib.sha256(baked.encode()).hexdigest()[:16]
        )
        call_args = args + (step_keys,)
        return True, cached_export(fn, *call_args, key=key)(*call_args)

    def denoise(
        self,
        params,
        sdr_latent: Array,
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
        args = (params, sdr_latent, prompt_embeds, negative_prompt_embeds,
                latents)
        hit, out = self._aot_cached(
            self._denoise_impl, statics, args, step_keys
        )
        if hit:
            return out
        return self._denoise_jit(
            params, sdr_latent, prompt_embeds, negative_prompt_embeds,
            latents,
            step_keys=step_keys,
            **statics,
        )

    def _denoise_impl(
        self,
        params,
        sdr_latent: Array,
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
        """The hot loop (reference stable_diffusion_gm.py:1040-1091) as a
        scan. Jit-closed over static step count and CFG structure. ``eta``
        reaches the scheduler when it supports it (DDIM — the reference's
        prepare_extra_step_kwargs path, :610-625). ``low_memory`` runs the
        CFG pair as two sequential UNet passes (lax.map over a context
        stack) instead of one doubled batch — peak activation HBM roughly
        halves for large resolutions (see dual.py)."""
        do_cfg = negative_prompt_embeds is not None
        context = (
            jnp.concatenate([negative_prompt_embeds, prompt_embeds])
            if do_cfg
            else prompt_embeds
        )
        ctx_stack = (
            jnp.stack([negative_prompt_embeds, prompt_embeds])
            if (do_cfg and low_memory)
            else None
        )
        sched = self.scheduler
        n_steps = self._num_steps(num_inference_steps)
        # NHWC through the whole scan: one transpose in, one out, none of
        # the per-step NCHW<->NHWC boundary copies (7% of step time in
        # device traces). Scheduler math is elementwise — layout-agnostic.
        sdr_nhwc = jnp.transpose(sdr_latent, (0, 2, 3, 1))
        lat_nhwc = jnp.transpose(latents, (0, 2, 3, 1))
        state = self._init_sched_state(num_inference_steps, lat_nhwc.shape)
        if step_keys is None:
            step_keys = jax.random.split(jax.random.key(0), n_steps)

        unet_apply = functools.partial(self.unet.apply, {"params": params["unet"]})

        def body(carry, inp):
            st, lat = carry
            key = inp
            t = st.timestep
            lat_scaled = sched.scale_model_input(st, lat)
            model_in = jnp.concatenate([sdr_nhwc, lat_scaled], axis=-1)
            if do_cfg and low_memory:
                eps2 = jax.lax.map(
                    lambda c: unet_apply(model_in, t, c, channels_last=True),
                    ctx_stack,
                )
                eps_uncond, eps_text = eps2[0], eps2[1]
                eps = eps_uncond + guidance_scale * (eps_text - eps_uncond)
                if guidance_rescale > 0.0:
                    eps = rescale_noise_cfg(eps, eps_text, guidance_rescale)
            else:
                if do_cfg:
                    model_in = jnp.concatenate([model_in, model_in], axis=0)
                eps = unet_apply(model_in, t, context, channels_last=True)
                if do_cfg:
                    eps_uncond, eps_text = jnp.split(eps, 2, axis=0)
                    eps = eps_uncond + guidance_scale * (
                        eps_text - eps_uncond
                    )
                    if guidance_rescale > 0.0:
                        eps = rescale_noise_cfg(
                            eps, eps_text, guidance_rescale
                        )
            st, lat = scheduler_step(sched, st, eps, lat, key=key, eta=eta)
            return (st, lat), (lat if return_intermediates else None)

        (state, lat_nhwc), inter = jax.lax.scan(
            body, (state, lat_nhwc), step_keys[:n_steps]
        )
        latents = jnp.transpose(lat_nhwc, (0, 3, 1, 2))
        if return_intermediates:
            return latents, jnp.transpose(inter, (0, 1, 4, 2, 3))
        return latents

    def _resolve_embeds(
        self, params, prompt, negative_prompt, prompt_embeds,
        negative_prompt_embeds, *, do_cfg, clip_skip, num_images_per_prompt,
    ):
        """Prompt handling shared by the pipeline ``__call__``s: direct
        ``prompt_embeds=`` passthrough (reference __call__ surface,
        stable_diffusion_gm.py:797-798) and diffusers' per-prompt
        ``num_images_per_prompt`` duplication (repeat-interleave on batch)."""
        if prompt_embeds is None:
            prompt_embeds, neg_embeds = self.encode_prompt(
                params, prompt, negative_prompt, do_cfg=do_cfg,
                clip_skip=clip_skip,
            )
        else:
            prompt_embeds = jnp.asarray(prompt_embeds)
            neg_embeds = (
                jnp.asarray(negative_prompt_embeds)
                if do_cfg and negative_prompt_embeds is not None
                else None
            )
            if do_cfg and neg_embeds is None:
                raise ValueError(
                    "prompt_embeds with guidance_scale > 1 needs "
                    "negative_prompt_embeds too"
                )
        n = num_images_per_prompt
        if n > 1:
            prompt_embeds = jnp.repeat(prompt_embeds, n, axis=0)
            if neg_embeds is not None:
                neg_embeds = jnp.repeat(neg_embeds, n, axis=0)
        return prompt_embeds, neg_embeds

    @staticmethod
    def _reject_custom_schedule(timesteps, sigmas) -> None:
        """API parity for the reference's ``timesteps=``/``sigmas=`` args:
        its retrieve_timesteps (stable_diffusion_gm.py:97-153) raises for
        schedulers whose set_timesteps doesn't accept them — which is every
        scheduler the reference pins (DDPM/PNDM/DDIM/DPM++). Same behavior,
        same failure mode, clearer message."""
        if timesteps is not None or sigmas is not None:
            raise ValueError(
                "custom `timesteps`/`sigmas` schedules are not supported by "
                "this scheduler family (matching the reference's "
                "retrieve_timesteps rejection for its pinned schedulers); "
                "use num_inference_steps"
            )

    # -- step-end callbacks ------------------------------------------------
    def _validate_callback_args(
        self, callback_on_step_end, tensor_inputs, callback, callback_steps
    ):
        """Validate the callback surface (reference check_inputs,
        stable_diffusion_gm.py:643-654) and resolve the tensor-input list
        (PipelineCallback-style objects carry their own ``tensor_inputs``,
        reference :915-916). Returns the resolved tensor-input tuple."""
        if callback_steps is not None and (
            not isinstance(callback_steps, int) or callback_steps <= 0
        ):
            raise ValueError(
                f"`callback_steps` has to be a positive integer but is "
                f"{callback_steps} of type {type(callback_steps)}."
            )
        if callback_on_step_end is not None and hasattr(
            callback_on_step_end, "tensor_inputs"
        ):
            tensor_inputs = callback_on_step_end.tensor_inputs
        if tensor_inputs is None:
            tensor_inputs = ("latents",)
        bad = [k for k in tensor_inputs if k not in self._callback_tensor_inputs]
        if bad:
            raise ValueError(
                f"`callback_on_step_end_tensor_inputs` has to be in "
                f"{list(self._callback_tensor_inputs)}, but found {bad}"
            )
        return tuple(tensor_inputs)

    def _step_timesteps(self, num_inference_steps: int, sample_shape):
        """Per-scan-step timestep sequence (host-side, for callbacks)."""
        if hasattr(self.scheduler, "timesteps"):
            ts = self.scheduler.timesteps(num_inference_steps)
        else:
            ts = self._init_sched_state(num_inference_steps, sample_shape).timesteps
        return np.asarray(ts)[: self._num_steps(num_inference_steps)]

    def _emulate_step_end_callbacks(
        self,
        *,
        callback_on_step_end,
        tensor_inputs,
        callback,
        callback_steps,
        step_latents,
        timesteps,
        prompt_embeds,
        negative_prompt_embeds,
    ):
        """Invoke the reference's step-end callback surface over the
        captured per-step latents (scan ys).

        The reference calls ``callback_on_step_end(self, i, t,
        callback_kwargs)`` inside its Python loop and lets the returned dict
        REPLACE ``latents``/``prompt_embeds`` (stable_diffusion_gm.py:
        1073-1082). gmdx's denoise loop is one compiled ``lax.scan``, so the
        emulation is post-hoc: observer callbacks (progress, logging,
        trajectory capture — every use in the reference tree, SURVEY.md
        C9/C18) see exactly the reference's per-step tensors; callbacks that
        try to MUTATE the state are rejected loudly instead of being
        silently ignored. Legacy ``callback(step_idx, t, latents)`` (every
        ``callback_steps`` steps, reference :1085-1088) is return-ignored by
        the reference, i.e. observer-only by construction."""
        n = len(timesteps)
        pe = np.asarray(prompt_embeds)
        ne = (
            np.asarray(negative_prompt_embeds)
            if negative_prompt_embeds is not None
            else None
        )
        for i in range(n):
            t = timesteps[i]
            lat_i = np.asarray(step_latents[i])  # ys stack: (steps, B, C, H, W)
            if callback_on_step_end is not None:
                available = {
                    "latents": lat_i,
                    "prompt_embeds": pe,
                    "negative_prompt_embeds": ne,
                }
                cb_kwargs = {k: available[k] for k in tensor_inputs}
                out = callback_on_step_end(self, i, t, cb_kwargs)
                if out:
                    for k, ref_val in (
                        ("latents", lat_i),
                        ("prompt_embeds", pe),
                        ("negative_prompt_embeds", ne),
                    ):
                        v = out.pop(k, None)
                        if v is None or v is ref_val:
                            continue
                        if ref_val is not None and np.array_equal(
                            np.asarray(v), ref_val
                        ):
                            continue
                        raise NotImplementedError(
                            f"callback_on_step_end returned a modified "
                            f"'{k}': tensor-mutating step-end callbacks "
                            f"are not supported (the gmdx denoise loop is "
                            f"a single compiled scan; mutation would be "
                            f"silently ignored). Use observer callbacks, "
                            f"or return_intermediates=True for trajectory "
                            f"access."
                        )
            if callback is not None and i % (callback_steps or 1) == 0:
                # step_idx = i // scheduler.order; every gmdx scheduler has
                # order 1 (like the reference's pinned set), so step_idx == i.
                callback(i, t, lat_i)

    def _apply_lora_scale(self, params, cross_attention_kwargs):
        """The reference routes ``cross_attention_kwargs={"scale": s}`` to
        its LoRA attention processors (formal_improved.py:259-269). gmdx's
        LoRA is a param-tree transform, so the equivalent is merging the
        factors at ``s x alpha/rank`` before the denoise scan. Looks for
        ``<name>_lora`` trees next to each model's params; silently no-ops
        when absent, exactly like the reference without LoRA layers loaded."""
        if not cross_attention_kwargs:
            return params
        scale = cross_attention_kwargs.get("scale")
        if scale is None:
            return params
        from gmdx.models.lora import LoRAConfig, merge_lora

        out = dict(params)
        for name in ("unet", "gm_unet"):
            lora = params.get(f"{name}_lora")
            if lora is not None and name in params:
                out[name] = merge_lora(
                    params[name], lora, scale * LoRAConfig().scale
                )
        return out

    def __call__(
        self,
        params,
        sdr_latent: Array,
        prompt: str | Sequence[str] = "",
        *,
        key: Optional[Array] = None,
        negative_prompt: str | Sequence[str] | None = None,
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
        low_memory: bool = False,
        callback_on_step_end=None,
        callback_on_step_end_tensor_inputs=None,
        callback=None,
        callback_steps: Optional[int] = None,
    ):
        """Full sampling call. ``output_type``: "latent" returns the GM
        latent; otherwise returns decoded images in [0, 1] NHWC (numpy).

        ``callback_on_step_end`` / legacy ``callback``+``callback_steps``
        match the reference surface (stable_diffusion_gm.py:806-810,
        1073-1088) for observer callbacks; see
        ``_emulate_step_end_callbacks`` for the semantics and the loud
        rejection of tensor-mutating callbacks.

        ``latents=`` accepts pre-drawn initial noise for parity harnesses
        (the reference supports the same injection,
        stable_diffusion_gm.py:796); ``prompt_embeds=`` bypasses the
        tokenizer/text-encoder (:797). ``num_images_per_prompt`` also
        repeats ``sdr_latent`` — the reference would hit a shape error in
        its channel concat for n>1 (a latent defect not replicated)."""
        self.check_inputs(
            prompt, guidance_rescale=guidance_rescale,
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
        if num_images_per_prompt > 1:
            sdr_latent = jnp.repeat(sdr_latent, num_images_per_prompt, axis=0)
        if latents is None:
            latents = self.prepare_latents(k_lat, sdr_latent)
        n_steps = self._num_steps(num_inference_steps)
        step_keys = jax.random.split(k_steps, n_steps)
        out = self.denoise(
            params,
            sdr_latent,
            prompt_embeds,
            neg_embeds,
            latents,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale,
            guidance_rescale=guidance_rescale,
            eta=eta,
            step_keys=step_keys,
            return_intermediates=has_cb,
            low_memory=low_memory,
        )
        if has_cb:
            gm_latents, inter = out
            self._emulate_step_end_callbacks(
                callback_on_step_end=callback_on_step_end,
                tensor_inputs=cb_tensor_inputs,
                callback=callback,
                callback_steps=callback_steps,
                step_latents=inter,
                timesteps=self._step_timesteps(
                    num_inference_steps, latents.shape
                ),
                prompt_embeds=prompt_embeds,
                negative_prompt_embeds=neg_embeds,
            )
        else:
            gm_latents = out
        if output_type == "latent":
            return gm_latents
        img = self.decode_latents(
            params, gm_latents, chunk=1 if low_memory else None
        )
        img = np.asarray(img)
        img = np.clip(img / 2.0 + 0.5, 0.0, 1.0)
        img = np.transpose(img, (0, 2, 3, 1))
        if self.safety_checker is not None:
            img, _ = self.safety_checker(img)
        return img


__all__ = [
    "StableDiffusionGMPipeline",
    "rescale_noise_cfg",
    "get_guidance_scale_embedding",
    "scheduler_step",
]
