"""Latent Consistency Model scheduler — 1-8 step sampling.

New capability beyond the reference (which pins 50-75 step PNDM/DDPM/DPM++
loops, SURVEY.md §2.2): with LCM-distilled UNet weights (e.g. LCM-LoRA,
PAPERS.md) the dual/GM pipelines can sample in 4 steps instead of 50 — a
>10x wall-clock lever on the same TPU kernels. Semantics follow the public
LCM formulation: consistency boundary-condition scalings

    c_skip = sigma_data^2 / ((t * s)^2 + sigma_data^2)
    c_out  = (t * s) / sqrt((t * s)^2 + sigma_data^2)

with ``denoised = c_out * x0_pred + c_skip * sample``, and an ancestral
re-noise to the next timestep on every step but the last. Timesteps are a
strided subset of the ``original_inference_steps`` DDIM grid.

Pure functional state like every gmdx scheduler: ``step`` needs a per-step
PRNG key (the re-noise draw), and the final-step branch is a ``jnp.where``
so the whole loop stays inside one ``lax.scan``.
"""

from __future__ import annotations

import dataclasses

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from gmdx.schedulers import base
from gmdx.schedulers.base import SchedulerConfig

Array = jax.Array


@flax.struct.dataclass
class LCMState:
    timesteps: Array  # (N,) int32, descending
    step_index: Array  # scalar int32
    num_inference_steps: int = flax.struct.field(pytree_node=False)

    @property
    def timestep(self) -> Array:
        return self.timesteps[self.step_index]


class LCMScheduler:
    order = 1
    init_noise_sigma = 1.0

    def __init__(
        self,
        original_inference_steps: int = 50,
        timestep_scaling: float = 10.0,
        sigma_data: float = 0.5,
        **kwargs,
    ):
        self.config = SchedulerConfig(**kwargs)
        self.original_inference_steps = original_inference_steps
        self.timestep_scaling = timestep_scaling
        self.sigma_data = sigma_data
        self.betas = base.make_betas(self.config)
        self.alphas_cumprod = jnp.cumprod(1.0 - self.betas)
        self.final_alpha_cumprod = (
            jnp.array(1.0, jnp.float32)
            if self.config.set_alpha_to_one
            else self.alphas_cumprod[0]
        )

    def add_noise(self, original: Array, noise: Array, timesteps: Array) -> Array:
        return base.add_noise(self.alphas_cumprod, original, noise, timesteps)

    def timesteps(self, num_inference_steps: int) -> Array:
        """Strided subset of the LCM origin grid (k*i - 1, i=1..orig), host-side."""
        orig = self.original_inference_steps
        if num_inference_steps > orig:
            raise ValueError(
                f"num_inference_steps ({num_inference_steps}) must be <= "
                f"original_inference_steps ({orig})"
            )
        k = self.config.num_train_timesteps // orig
        grid = (np.arange(1, orig + 1) * k - 1)[::-1]  # descending
        idx = np.linspace(
            0, len(grid), num=num_inference_steps, endpoint=False
        ).astype(np.int64)
        return jnp.asarray(grid[idx], jnp.int32)

    def init_state(self, num_inference_steps: int) -> LCMState:
        return LCMState(
            timesteps=self.timesteps(num_inference_steps),
            step_index=jnp.zeros((), jnp.int32),
            num_inference_steps=num_inference_steps,
        )

    def scale_model_input(self, state: LCMState, sample: Array) -> Array:
        return sample

    def scalings_for_boundary_conditions(self, t: Array) -> tuple[Array, Array]:
        st = t.astype(jnp.float32) * self.timestep_scaling
        sd2 = self.sigma_data**2
        c_skip = sd2 / (st**2 + sd2)
        c_out = st / jnp.sqrt(st**2 + sd2)
        return c_skip, c_out

    def step(
        self,
        state: LCMState,
        model_output: Array,
        sample: Array,
        *,
        key: Array,
    ) -> tuple[LCMState, Array]:
        """One consistency step; returns (state, prev_sample).

        The ``denoised`` (clean) estimate is ``prev_sample`` on the final
        step — callers that need the clean image mid-loop can recompute it
        from the same scalings.
        """
        t = state.timestep
        is_last = state.step_index == state.num_inference_steps - 1
        prev_t = jnp.where(
            is_last,
            t,
            state.timesteps[
                jnp.minimum(state.step_index + 1, state.num_inference_steps - 1)
            ],
        )
        alpha_prev = jnp.where(
            prev_t >= 0,
            self.alphas_cumprod[jnp.maximum(prev_t, 0)],
            self.final_alpha_cumprod,
        )

        x0 = base.predict_x0(
            self.alphas_cumprod, sample, model_output, t,
            self.config.prediction_type,
        )
        if self.config.clip_sample:
            r = self.config.clip_sample_range
            x0 = jnp.clip(x0, -r, r)

        c_skip, c_out = self.scalings_for_boundary_conditions(t)
        denoised = c_out * x0 + c_skip * sample

        noise = jax.random.normal(key, sample.shape, sample.dtype)
        renoised = (
            jnp.sqrt(alpha_prev) * denoised
            + jnp.sqrt(1.0 - alpha_prev) * noise
        )
        prev_sample = jnp.where(is_last, denoised, renoised)
        return (
            dataclasses.replace(state, step_index=state.step_index + 1),
            prev_sample,
        )


__all__ = ["LCMScheduler", "LCMState"]
