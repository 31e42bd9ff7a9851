"""DDPM (ancestral) scheduler — training noising + stochastic sampling.

Semantics match the diffusers DDPMScheduler the reference trains with
(scripts/stage2/train_gm_unet.py:756,1169-1176) and samples with in
formal_baseline (fixed-small variance, leading timestep spacing), expressed
as a pure step function over an explicit state pytree.
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
class DDPMState:
    timesteps: Array  # (N,) int32, descending
    step_index: Array  # () int32
    step_ratio: int = flax.struct.field(pytree_node=False)

    @property
    def timestep(self) -> Array:
        return self.timesteps[self.step_index]


class DDPMScheduler:
    """Stochastic ancestral sampler with fixed-small posterior variance."""

    order = 1
    init_noise_sigma = 1.0

    def __init__(self, variance_type: str = "fixed_small", **kwargs):
        self.config = SchedulerConfig(**kwargs)
        self.variance_type = variance_type
        self.betas = base.make_betas(self.config)
        self.alphas_cumprod = jnp.cumprod(1.0 - self.betas)
        # diffusers' DDPMScheduler has no set_alpha_to_one: below t=0 it
        # always uses ᾱ=1 ("self.one"). Using alphas_cumprod[0] here instead
        # shifted the final ancestral step by ~0.12 maxabs vs the torch
        # oracle (refbridge trajectory parity).
        self.final_alpha_cumprod = jnp.array(1.0, jnp.float32)

    # -- training API ---------------------------------------------------
    def add_noise(self, original: Array, noise: Array, timesteps: Array) -> Array:
        return base.add_noise(self.alphas_cumprod, original, noise, timesteps)

    def get_velocity(self, sample: Array, noise: Array, timesteps: Array) -> Array:
        return base.get_velocity(self.alphas_cumprod, sample, noise, timesteps)

    # -- sampling API ----------------------------------------------------
    def init_state(self, num_inference_steps: int) -> DDPMState:
        timesteps, step_ratio = base.leading_timesteps(
            self.config, num_inference_steps
        )
        return DDPMState(
            timesteps=timesteps,
            step_index=jnp.zeros((), jnp.int32),
            step_ratio=step_ratio,
        )

    def scale_model_input(self, state: DDPMState, sample: Array) -> Array:
        return sample

    def _alpha_prev(self, prev_t: Array) -> Array:
        return jnp.where(
            prev_t >= 0,
            self.alphas_cumprod[jnp.maximum(prev_t, 0)],
            self.final_alpha_cumprod,
        )

    def step(
        self,
        state: DDPMState,
        model_output: Array,
        sample: Array,
        key: Array | None = None,
        noise: Array | None = None,
    ) -> tuple[DDPMState, Array]:
        """``noise=`` overrides the key-drawn ancestral noise (parity
        harnesses replay recorded draws; drawing all noise upfront is also
        the scan-idiomatic pattern)."""
        t = state.timestep
        prev_t = t - state.step_ratio

        alpha_prod_t = self.alphas_cumprod[t]
        alpha_prod_prev = self._alpha_prev(prev_t)
        beta_prod_t = 1.0 - alpha_prod_t
        beta_prod_prev = 1.0 - alpha_prod_prev
        current_alpha = alpha_prod_t / alpha_prod_prev
        current_beta = 1.0 - current_alpha

        x0 = base.predict_x0(
            self.alphas_cumprod, sample, model_output, t, self.config.prediction_type
        )
        if self.config.clip_sample:
            r = self.config.clip_sample_range
            x0 = jnp.clip(x0, -r, r)

        # Posterior mean coefficients (DDPM Eq. 7).
        x0_coeff = jnp.sqrt(alpha_prod_prev) * current_beta / beta_prod_t
        xt_coeff = jnp.sqrt(current_alpha) * beta_prod_prev / beta_prod_t
        prev_sample = x0_coeff * x0 + xt_coeff * sample

        # Fixed-small variance, noise only while t > 0.
        variance = jnp.clip(beta_prod_prev / beta_prod_t * current_beta, 1e-20, None)
        if noise is None:
            if key is None:
                # A silent fixed default would inject the SAME noise tensor
                # at every ancestral step — correlated-noise artifacts.
                raise ValueError(
                    "DDPMScheduler.step needs a per-step PRNG key or an "
                    "explicit noise tensor (ancestral sampling adds fresh "
                    "noise each step)"
                )
            noise = jax.random.normal(key, sample.shape, sample.dtype)
        prev_sample = prev_sample + jnp.where(t > 0, jnp.sqrt(variance), 0.0) * noise

        return (
            dataclasses.replace(state, step_index=state.step_index + 1),
            prev_sample,
        )


__all__ = ["DDPMScheduler", "DDPMState"]
