"""PNDM scheduler (PLMS path, skip_prk_steps=True) with scan-friendly state.

This is the reference's pinned inference scheduler (Stage-2 validation at 49
steps, train_gm_unet.py:171-176; README configs/pndm_scheduler). The diffusers
implementation keeps a Python list of up to four past epsilon predictions and
a step counter; under jit that history becomes a fixed-shape (4, ...) ring
buffer in the state pytree and every branch of the PLMS warmup collapses to
coefficient selection by ``jnp.where`` on the counter — no data-dependent
Python control flow, one traced step function for all 50 iterations.

PLMS algebra (Liu et al., "Pseudo Numerical Methods for Diffusion Models"):
  step 0:  eps_eff = e0                       (Euler, sample stashed)
  step 1:  eps_eff = (e_new + e0) / 2         (redo step 0 from stashed sample,
                                               timesteps shifted one notch)
  step 2:  eps_eff = (3 e1 - e0) / 2
  step 3:  eps_eff = (23 e2 - 16 e1 + 5 e0) / 12
  step 4+: eps_eff = (55 e3 - 59 e2 + 37 e1 - 9 e0) / 24
transfer: x_prev = sqrt(a_prev/a_t) x - (a_prev - a_t) eps_eff /
          (a_t sqrt(b_prev) + sqrt(a_t b_t a_prev))
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

# eps_eff = C[k, 0] * e_new + sum_i C[k, 1+i] * ets[i]  (ets[0] newest),
# selected by k = min(counter, 4). For counter != 1 the new eps is already
# pushed into ets[0], so column 0 is only used by the counter==1 row.
_PLMS_COEFFS = np.array(
    [
        #  e_new   ets[0]    ets[1]    ets[2]   ets[3]
        [0.0, 1.0, 0.0, 0.0, 0.0],  # counter 0
        [0.5, 0.5, 0.0, 0.0, 0.0],  # counter 1 (e_new not pushed)
        [0.0, 3.0 / 2.0, -1.0 / 2.0, 0.0, 0.0],  # counter 2
        [0.0, 23.0 / 12.0, -16.0 / 12.0, 5.0 / 12.0, 0.0],  # counter 3
        [0.0, 55.0 / 24.0, -59.0 / 24.0, 37.0 / 24.0, -9.0 / 24.0],  # counter 4+
    ],
    dtype=np.float32,
)


@flax.struct.dataclass
class PNDMState:
    timesteps: Array  # (N,) int32, descending (PLMS spacing, 2nd-to-last dup'd)
    step_index: Array  # () int32, position in `timesteps`
    counter: Array  # () int32, PLMS warmup counter
    ets: Array  # (4, *sample_shape) ring buffer, index 0 = newest
    cur_sample: Array  # stashed x_t for the counter==1 replay
    step_ratio: int = flax.struct.field(pytree_node=False)

    @property
    def timestep(self) -> Array:
        return self.timesteps[self.step_index]


class PNDMScheduler:
    order = 1
    init_noise_sigma = 1.0

    def __init__(self, skip_prk_steps: bool = True, **kwargs):
        if not skip_prk_steps:
            raise NotImplementedError(
                "Runge-Kutta warmup (skip_prk_steps=False) is not used anywhere "
                "in the reference; only the PLMS path is implemented."
            )
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

    def timesteps(self, num_inference_steps: int) -> Array:
        """PLMS spacing: leading grid with the 2nd-to-last entry duplicated
        (the counter==1 replay consumes it), descending."""
        ts, _ = base.leading_timesteps(self.config, num_inference_steps)
        asc = ts[::-1]  # ascending
        plms = jnp.concatenate([asc[:-1], asc[-2:-1], asc[-1:]])
        return plms[::-1].astype(jnp.int32)

    def num_steps(self, num_inference_steps: int) -> int:
        """Length of the step loop (one longer than N: the duplicated entry)."""
        return num_inference_steps + 1 if num_inference_steps > 1 else 1

    def init_state(self, num_inference_steps: int, sample_shape, dtype=jnp.float32):
        step_ratio = self.config.num_train_timesteps // num_inference_steps
        return PNDMState(
            timesteps=self.timesteps(num_inference_steps),
            step_index=jnp.zeros((), jnp.int32),
            counter=jnp.zeros((), jnp.int32),
            ets=jnp.zeros((4,) + tuple(sample_shape), dtype),
            cur_sample=jnp.zeros(tuple(sample_shape), dtype),
            step_ratio=step_ratio,
        )

    def scale_model_input(self, state: PNDMState, sample: Array) -> Array:
        return sample

    def step(
        self, state: PNDMState, model_output: Array, sample: Array
    ) -> tuple[PNDMState, Array]:
        t = state.timestep
        counter = state.counter
        is_replay = counter == 1

        # Push eps into the ring buffer except on the replay step.
        pushed = jnp.concatenate([model_output[None], state.ets[:-1]], axis=0)
        ets = jnp.where(is_replay, state.ets, pushed)

        # Stash x_t on step 0; consume it on step 1.
        cur_sample = jnp.where(counter == 0, sample, state.cur_sample)
        sample_eff = jnp.where(is_replay, state.cur_sample, sample)

        # Effective epsilon: coefficient row by warmup stage.
        k = jnp.minimum(counter, 4)
        c = jnp.asarray(_PLMS_COEFFS)[k].astype(model_output.dtype)
        eps_eff = c[0] * model_output + jnp.tensordot(
            c[1:], ets, axes=([0], [0])
        )

        # Replay uses the shifted timestep pair (t+ratio -> t).
        t_eff = jnp.where(is_replay, t + state.step_ratio, t)
        prev_t = jnp.where(is_replay, t, t - state.step_ratio)

        prev_sample = self._transfer(sample_eff, t_eff, prev_t, eps_eff)

        new_state = dataclasses.replace(
            state,
            step_index=state.step_index + 1,
            counter=counter + 1,
            ets=ets,
            cur_sample=cur_sample,
        )
        return new_state, prev_sample

    def _transfer(
        self, sample: Array, t: Array, prev_t: Array, eps: Array
    ) -> Array:
        """PNDM Eq. (9) transfer from x_t to x_{t_prev} given effective eps."""
        alpha_t = self.alphas_cumprod[t]
        alpha_prev = jnp.where(
            prev_t >= 0,
            self.alphas_cumprod[jnp.maximum(prev_t, 0)],
            self.final_alpha_cumprod,
        )
        beta_t = 1.0 - alpha_t
        beta_prev = 1.0 - alpha_prev

        if self.config.prediction_type == "v_prediction":
            eps = jnp.sqrt(alpha_t) * eps + jnp.sqrt(beta_t) * sample
        elif self.config.prediction_type != "epsilon":
            raise ValueError(
                f"PNDM supports epsilon/v_prediction, got "
                f"{self.config.prediction_type!r}"
            )

        sample_coeff = jnp.sqrt(alpha_prev / alpha_t)
        denom = alpha_t * jnp.sqrt(beta_prev) + jnp.sqrt(
            alpha_t * beta_t * alpha_prev
        )
        return sample_coeff * sample - (alpha_prev - alpha_t) * eps / denom


__all__ = ["PNDMScheduler", "PNDMState"]
