"""Pipeline parallelism for the dual-UNet text-to-HDR sampler.

The reference has NO pipeline parallelism (SURVEY.md §2.3: PP "No" — the
closest thing is sequential CPU-offload ordering,
gm_diffusion/pipelines/stable_diffusion_gm.py:197). This module is new
TPU-native scale-out capability: the dual-UNet denoise loop
(gm_diffusion/pipelines/stable_diffusion_dual_unet.py:1040-1113) has a
one-directional per-step dependency — the GM branch consumes the SDR
branch's x0 prediction, the SDR branch never reads the GM branch — so the
two chains form a natural 2-stage dataflow pipeline:

  stage 0 (SDR submesh): CFG-doubled SDR UNet forward + scheduler step,
      emitting the per-step x0 predictions;
  stage 1 (GM submesh):  conditional-only GM UNet forward + scheduler
      step, running one chunk behind stage 0.

Mechanics (TPU-idiomatic, not a NCCL translation): each stage is its own
1-D ``data`` mesh (DP within the stage — PP composes with DP); the
denoise loop is split into ``chunk``-step jitted ``lax.scan`` segments;
the x0 stack (chunk, B, h, w, 4 — ~1.3 MB for chunk=5 at 512², far below
ICI line rate) hops stage 0 → stage 1 via an async cross-mesh
``device_put``. JAX's async dispatch provides the overlap: the Python
driver enqueues SDR chunk k+1 before GM chunk k completes, so after the
one-chunk fill bubble both submeshes run continuously.

Steady-state speedup: the sequential loop pays 3 UNet-forward equivalents
per step (CFG×2 SDR + 1 GM, reference :1040-1113); the pipeline's critical
path is the SDR stage's 2 — a 1.5× latency win for 2× the chips, with the
GM stage free to take a tensor-parallel or larger-batch layout. Combine
with gmdx.dist.tp on either submesh for further latency scaling.

Numerics: the chunked scans execute exactly the per-step algebra of
``StableDiffusionDualUNetPipeline._denoise_dual_impl`` (same op sequence,
same PRNG key split); outputs match the single-device path to fp32
fusion-reassociation tolerance (~1e-4 relative — XLA fuses the chunked
and monolithic scan bodies differently; asserted in tests/test_pp.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gmdx.pipelines.gm import rescale_noise_cfg, scheduler_step

Array = jax.Array

__all__ = ["pp_stage_meshes", "PipelinedDualUNet"]


def pp_stage_meshes(
    devices: Optional[Sequence[jax.Device]] = None,
) -> tuple[Mesh, Mesh]:
    """Split ``devices`` (default: all) into two equal 1-D ``data`` meshes —
    stage 0 (SDR) gets the first half so its collectives ride the closest
    ICI hops, stage 1 (GM) the second half."""
    import numpy as np

    devs = list(devices) if devices is not None else list(jax.devices())
    if len(devs) < 2 or len(devs) % 2:
        raise ValueError(
            f"pipeline parallelism needs an even device count >= 2, "
            f"got {len(devs)}"
        )
    half = len(devs) // 2
    return (
        Mesh(np.asarray(devs[:half]), ("data",)),
        Mesh(np.asarray(devs[half:]), ("data",)),
    )


@dataclasses.dataclass
class PipelinedDualUNet:
    """2-stage pipelined wrapper around a StableDiffusionDualUNetPipeline.

    ``pipe`` supplies the modules/scheduler; ``mesh_sdr``/``mesh_gm`` are
    the stage submeshes (default: halves of all devices); ``chunk`` is the
    pipeline granularity in denoise steps — smaller chunks shrink the fill
    bubble (1 chunk) but pay more dispatch round-trips.
    """

    pipe: Any
    mesh_sdr: Optional[Mesh] = None
    mesh_gm: Optional[Mesh] = None
    chunk: int = 5

    def __post_init__(self):
        if self.mesh_sdr is None or self.mesh_gm is None:
            self.mesh_sdr, self.mesh_gm = pp_stage_meshes()
        self._sdr_chunk_jit = jax.jit(
            self._sdr_chunk,
            static_argnames=(
                "guidance_scale", "guidance_rescale", "eta", "do_cfg",
            ),
        )
        self._gm_chunk_jit = jax.jit(
            self._gm_chunk, static_argnames=("eta",)
        )

    # -- placement ----------------------------------------------------------
    def _repl(self, mesh: Mesh):
        return NamedSharding(mesh, P())

    def _batched(self, mesh: Mesh, ndim: int):
        return NamedSharding(mesh, P(*(("data",) + (None,) * (ndim - 1))))

    def place_params(self, params):
        """SDR UNet weights replicated on stage 0, GM UNet on stage 1.

        Per-stage DP replicates within the submesh only — each chip holds
        one UNet, not both (the memory point of the split). Other entries
        (vae/text_encoder for the caller's encode/decode) go to stage 1,
        where the final gm latents land.
        """
        out = {}
        for k, v in params.items():
            mesh = self.mesh_sdr if k == "unet" else self.mesh_gm
            out[k] = jax.device_put(v, self._repl(mesh))
        return out

    # -- stage bodies (the exact per-step algebra of dual.py) ----------------
    def _sdr_chunk(
        self,
        unet_params,
        context,
        sdr_st,
        lat,
        keys,
        *,
        guidance_scale: float,
        guidance_rescale: float,
        eta: float,
        do_cfg: bool = True,
    ):
        """``chunk`` SDR steps: CFG forward, x0-before-step, scheduler step
        (reference stable_diffusion_dual_unet.py:1045-1078). Emits the x0
        stack the GM stage consumes."""
        sched = self.pipe.scheduler
        acp = sched.alphas_cumprod
        unet = functools.partial(self.pipe.unet.apply, {"params": unet_params})

        def body(carry, key):
            st, lat = carry
            t = st.timestep
            lat_in = sched.scale_model_input(st, lat)
            if do_cfg:
                lat_in = jnp.concatenate([lat_in, lat_in], axis=0)
            eps = unet(lat_in, t, context, channels_last=True)
            if do_cfg:
                eps_uncond, eps_text = jnp.split(eps, 2, axis=0)
                eps = eps_uncond + guidance_scale * (eps_text - eps_uncond)
                if guidance_rescale > 0.0:
                    eps = rescale_noise_cfg(eps, eps_text, guidance_rescale)
            a_t = acp[t]
            x0 = (lat - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
            st, lat = scheduler_step(sched, st, eps, lat, key=key, eta=eta)
            return (st, lat), x0

        (sdr_st, lat), x0s = jax.lax.scan(body, (sdr_st, lat), keys)
        return sdr_st, lat, x0s

    def _gm_chunk(self, gm_params, prompt_embeds, gm_st, gm_lat, x0s, keys,
                  *, eta: float):
        """``chunk`` GM steps: scale_model_input overwrite, conditional-only
        forward on [x0 ‖ gm_latents], scheduler step (reference :1048,
        1080-1093)."""
        sched = self.pipe.scheduler
        gm_unet = functools.partial(
            self.pipe.gm_unet.apply, {"params": gm_params}
        )

        def body(carry, xs):
            st, gm_lat = carry
            x0, key = xs
            gm_lat = sched.scale_model_input(st, gm_lat)
            gm_in = jnp.concatenate([x0, gm_lat], axis=-1)
            gm_eps = gm_unet(gm_in, st.timestep, prompt_embeds,
                             channels_last=True)
            st, gm_lat = scheduler_step(
                sched, st, gm_eps, gm_lat, key=key, eta=eta
            )
            return (st, gm_lat), None

        (gm_st, gm_lat), _ = jax.lax.scan(body, (gm_st, gm_lat), (x0s, keys))
        return gm_st, gm_lat

    # -- driver ---------------------------------------------------------------
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
    ):
        """Pipelined drop-in for ``StableDiffusionDualUNetPipeline
        .denoise_dual`` (NCHW in/out, same PRNG stream, same results).

        The loop enqueues SDR chunk k, ships its x0 stack to the GM submesh,
        enqueues GM chunk k, and immediately proceeds to SDR chunk k+1 —
        JAX's async dispatch keeps both submeshes busy; nothing blocks until
        the final values are read by the caller.
        """
        pipe = self.pipe
        n_steps = pipe._num_steps(num_inference_steps)
        if step_keys is None:
            step_keys = jax.random.split(jax.random.key(0), n_steps)
        # Same per-step split as dual.py's body (k_sdr, k_gm = split(key)).
        ks = jax.vmap(jax.random.split)(step_keys[:n_steps])
        sdr_keys, gm_keys = ks[:, 0], ks[:, 1]

        do_cfg = negative_prompt_embeds is not None
        context = (
            jnp.concatenate([negative_prompt_embeds, prompt_embeds])
            if do_cfg
            else prompt_embeds
        )

        # Placement: SDR side on mesh0, GM side on mesh1, batch over 'data'.
        lat = jnp.transpose(latents, (0, 2, 3, 1))
        sdr_st = pipe._init_sched_state(num_inference_steps, lat.shape)
        gm_st = pipe._init_sched_state(num_inference_steps, lat.shape)
        m0, m1 = self.mesh_sdr, self.mesh_gm
        context = jax.device_put(context, self._repl(m0))
        prompt_embeds = jax.device_put(prompt_embeds, self._repl(m1))
        lat0 = jax.device_put(lat, self._batched(m0, lat.ndim))
        gm_lat = jax.device_put(lat, self._batched(m1, lat.ndim))
        sdr_st = jax.device_put(sdr_st, self._repl(m0))
        gm_st = jax.device_put(gm_st, self._repl(m1))
        unet_params = jax.device_put(params["unet"], self._repl(m0))
        gm_params = jax.device_put(params["gm_unet"], self._repl(m1))

        # x0 stack is (chunk, B, h, w, 4): batch is dim 1 on the GM submesh.
        x0_shd = NamedSharding(m1, P(None, "data"))
        lat = lat0
        starts = list(range(0, n_steps, self.chunk))
        for s in starts:
            e = min(s + self.chunk, n_steps)
            sdr_st, lat, x0s = self._sdr_chunk_jit(
                unet_params, context, sdr_st, lat, sdr_keys[s:e],
                guidance_scale=guidance_scale,
                guidance_rescale=guidance_rescale,
                eta=eta, do_cfg=do_cfg,
            )
            x0s = jax.device_put(x0s, x0_shd)  # async stage-0 -> stage-1 hop
            gm_st, gm_lat = self._gm_chunk_jit(
                gm_params, prompt_embeds, gm_st, gm_lat, x0s,
                jax.device_put(gm_keys[s:e], self._repl(m1)), eta=eta,
            )

        return (
            jnp.transpose(lat, (0, 3, 1, 2)),
            jnp.transpose(gm_lat, (0, 3, 1, 2)),
        )
