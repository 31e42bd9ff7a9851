"""DDIM scheduler — deterministic (eta=0) or partially stochastic sampling.

Covers the reference's eta kwarg path (stable_diffusion_gm.py:610-625).
Pure functional step over explicit state.
"""

from __future__ import annotations

import dataclasses

import flax.struct
import jax
import jax.numpy as jnp

from gmdx.schedulers import base
from gmdx.schedulers.base import SchedulerConfig

Array = jax.Array


@flax.struct.dataclass
class DDIMState:
    timesteps: Array
    step_index: Array
    step_ratio: int = flax.struct.field(pytree_node=False)

    @property
    def timestep(self) -> Array:
        return self.timesteps[self.step_index]


class DDIMScheduler:
    order = 1
    init_noise_sigma = 1.0

    def __init__(self, **kwargs):
        self.config = SchedulerConfig(**kwargs)
        self.betas = base.make_betas(self.config)
        self.alphas_cumprod = jnp.cumprod(1.0 - self.betas)
        self.final_alpha_cumprod = (
            jnp.array(1.0, jnp.float32)
            if self.config.set_alpha_to_one
            else self.alphas_cumprod[0]
        )

    def add_noise(self, original: Array, noise: Array, timesteps: Array) -> Array:
        return base.add_noise(self.alphas_cumprod, original, noise, timesteps)

    def init_state(self, num_inference_steps: int) -> DDIMState:
        timesteps, step_ratio = base.leading_timesteps(
            self.config, num_inference_steps
        )
        return DDIMState(
            timesteps=timesteps,
            step_index=jnp.zeros((), jnp.int32),
            step_ratio=step_ratio,
        )

    def scale_model_input(self, state: DDIMState, sample: Array) -> Array:
        return sample

    def step(
        self,
        state: DDIMState,
        model_output: Array,
        sample: Array,
        *,
        eta: float = 0.0,
        key: Array | None = None,
        noise: Array | None = None,
    ) -> tuple[DDIMState, Array]:
        t = state.timestep
        prev_t = t - state.step_ratio

        alpha_prod_t = self.alphas_cumprod[t]
        alpha_prod_prev = jnp.where(
            prev_t >= 0,
            self.alphas_cumprod[jnp.maximum(prev_t, 0)],
            self.final_alpha_cumprod,
        )
        beta_prod_t = 1.0 - alpha_prod_t

        x0 = base.predict_x0(
            self.alphas_cumprod, sample, model_output, t, self.config.prediction_type
        )
        eps = base.predict_eps(
            self.alphas_cumprod, sample, model_output, t, self.config.prediction_type
        )
        if self.config.clip_sample:
            r = self.config.clip_sample_range
            x0 = jnp.clip(x0, -r, r)
            eps = (sample - jnp.sqrt(alpha_prod_t) * x0) / jnp.sqrt(beta_prod_t)

        variance = (
            (1.0 - alpha_prod_prev)
            / (1.0 - alpha_prod_t)
            * (1.0 - alpha_prod_t / alpha_prod_prev)
        )
        std = eta * jnp.sqrt(variance)

        dir_xt = jnp.sqrt(1.0 - alpha_prod_prev - std**2) * eps
        prev_sample = jnp.sqrt(alpha_prod_prev) * x0 + dir_xt
        if eta > 0.0:
            if noise is None:
                if key is None:
                    raise ValueError(
                        "DDIMScheduler.step with eta > 0 needs a per-step "
                        "PRNG key or an explicit noise tensor (a fixed "
                        "default would reuse one draw across all steps)"
                    )
                noise = jax.random.normal(key, sample.shape, sample.dtype)
            prev_sample = prev_sample + std * noise

        return (
            dataclasses.replace(state, step_index=state.step_index + 1),
            prev_sample,
        )


__all__ = ["DDIMScheduler", "DDIMState"]
