"""DPM-Solver++ multistep (order 2, midpoint) scheduler.

Covers the reference's "improved" experiments configuration
(algorithm_type="dpmsolver++", solver_order=2, thresholding=False "for HDR
preservation" — scheduler_tuning.py:190-201, formal_improved.py:195).

Functional multistep state: the previous step's x0 prediction lives in the
state pytree; ``lower_order_final`` (first-order at the last step) and the
first-order warmup collapse to ``jnp.where`` selection so one traced step
serves the whole scan.
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
class DPMState:
    timesteps: Array  # (N,) int32, descending (linspace spacing)
    step_index: Array  # () int32
    prev_x0: Array  # x0 prediction from the previous step
    num_inference_steps: int = flax.struct.field(pytree_node=False)

    @property
    def timestep(self) -> Array:
        return self.timesteps[self.step_index]


class DPMSolverMultistepScheduler:
    order = 1  # one model eval per step (multistep)
    init_noise_sigma = 1.0

    def __init__(
        self,
        solver_order: int = 2,
        algorithm_type: str = "dpmsolver++",
        thresholding: bool = False,
        lower_order_final: bool = True,
        use_karras_sigmas: bool = False,
        final_sigmas_type: str = "zero",
        **kwargs,
    ):
        if final_sigmas_type not in ("zero", "sigma_min"):
            raise ValueError(
                f"final_sigmas_type must be 'zero' or 'sigma_min', got "
                f"{final_sigmas_type!r}"
            )
        if algorithm_type != "dpmsolver++":
            raise NotImplementedError("only algorithm_type='dpmsolver++'")
        if solver_order not in (1, 2):
            raise NotImplementedError("solver_order must be 1 or 2")
        if thresholding:
            raise NotImplementedError(
                "dynamic thresholding is disabled in every reference config "
                "('for HDR preservation')"
            )
        kwargs.setdefault("timestep_spacing", "linspace")
        self.config = SchedulerConfig(**kwargs)
        self.solver_order = solver_order
        self.lower_order_final = lower_order_final
        self.use_karras_sigmas = use_karras_sigmas
        self.final_sigmas_type = final_sigmas_type
        self.betas = base.make_betas(self.config)
        self.alphas_cumprod = jnp.cumprod(1.0 - self.betas)
        # VP-SDE half-log-SNR parameterization.
        self.alpha_t = jnp.sqrt(self.alphas_cumprod)
        self.sigma_t = jnp.sqrt(1.0 - self.alphas_cumprod)
        self.lambda_t = jnp.log(self.alpha_t) - jnp.log(self.sigma_t)

    def add_noise(self, original: Array, noise: Array, timesteps: Array) -> Array:
        return base.add_noise(self.alphas_cumprod, original, noise, timesteps)

    def timesteps(self, num_inference_steps: int) -> Array:
        if self.use_karras_sigmas:
            # Karras rho=7 sigma grid mapped back to the discrete schedule.
            sigmas = (self.sigma_t / self.alpha_t)  # ascending in t
            rho = 7.0
            smin, smax = float(sigmas[0]), float(sigmas[-1])
            ramp = jnp.linspace(0.0, 1.0, num_inference_steps)
            ks = (smax ** (1 / rho) + ramp * (smin ** (1 / rho) - smax ** (1 / rho))) ** rho
            ts = jnp.argmin(
                jnp.abs(sigmas[None, :] - ks[:, None]), axis=1
            ).astype(jnp.int32)
            return ts
        ts = jnp.linspace(
            0, self.config.num_train_timesteps - 1, num_inference_steps + 1
        )
        return jnp.round(ts)[::-1][:-1].astype(jnp.int32)

    def init_state(self, num_inference_steps: int, sample_shape, dtype=jnp.float32):
        return DPMState(
            timesteps=self.timesteps(num_inference_steps),
            step_index=jnp.zeros((), jnp.int32),
            prev_x0=jnp.zeros(tuple(sample_shape), dtype),
            num_inference_steps=num_inference_steps,
        )

    def scale_model_input(self, state: DPMState, sample: Array) -> Array:
        return sample

    def step(
        self, state: DPMState, model_output: Array, sample: Array
    ) -> tuple[DPMState, Array]:
        i = state.step_index
        n = state.num_inference_steps
        t = state.timesteps[i]
        # Target timestep of this transfer; 0-boundary handled by index clamp.
        t_prev = jnp.where(i + 1 < n, state.timesteps[jnp.minimum(i + 1, n - 1)], 0)
        t_prevprev = state.timesteps[jnp.maximum(i - 1, 0)]

        x0 = base.predict_x0(
            self.alphas_cumprod, sample, model_output, t, self.config.prediction_type
        )

        lam_t, lam_prev = self.lambda_t[t], self._lambda(t_prev)
        lam_pp = self.lambda_t[t_prevprev]
        sig_t, sig_prev = self.sigma_t[t], self._sigma(t_prev)
        alp_prev = self._alpha(t_prev)

        h = lam_prev - lam_t
        em1 = jnp.expm1(-h)

        # First-order (DPM-Solver++ 1S) update.
        first = (sig_prev / sig_t) * sample - alp_prev * em1 * x0

        # Second-order (2M, midpoint) update using the previous x0.
        h0 = lam_t - lam_pp
        r0 = h0 / jnp.where(h == 0, 1.0, h)
        d1 = (x0 - state.prev_x0) / jnp.where(r0 == 0, 1.0, r0)
        second = first - 0.5 * alp_prev * em1 * d1

        use_first = jnp.logical_or(
            i < 1,  # multistep warmup
            jnp.logical_and(
                self.lower_order_final and n < 15, i == n - 1
            ),
        )
        if self.solver_order == 1:
            prev_sample = first
        else:
            prev_sample = jnp.where(use_first, first, second)

        if self.final_sigmas_type == "zero":
            # diffusers default: the last transfer targets sigma = 0, where
            # the DPM-Solver++ update degenerates to the x0 prediction
            # (lambda -> inf, expm1(-h) -> -1). Clamping to t=0 instead
            # (sigma ~ 0.029) would leave visible noise in the output.
            prev_sample = jnp.where(i == n - 1, x0, prev_sample)

        new_state = dataclasses.replace(
            state, step_index=i + 1, prev_x0=x0
        )
        return new_state, prev_sample

    def _lambda(self, t: Array) -> Array:
        return self.lambda_t[jnp.maximum(t, 0)]

    def _sigma(self, t: Array) -> Array:
        return self.sigma_t[jnp.maximum(t, 0)]

    def _alpha(self, t: Array) -> Array:
        return self.alpha_t[jnp.maximum(t, 0)]


__all__ = ["DPMSolverMultistepScheduler", "DPMState"]
