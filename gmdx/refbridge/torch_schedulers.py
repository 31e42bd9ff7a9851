"""Torch transcriptions of the diffusers scheduler algorithms.

diffusers itself is not installed in this sandbox, so these serve as the
reference-side schedulers when running the GM-Diffusion pipeline classes
(which call the diffusers scheduler API: ``set_timesteps`` /
``scale_model_input`` / ``step(model_output, t, sample, return_dict=False)``)
and as the **independent oracle** for the JAX schedulers' trajectory goldens
(tests/goldens/schedulers/*.npz). They are written torch-side from the
published algorithms (DDPM: Ho et al. 2020; DDIM: Song et al. 2020; PLMS:
Liu et al. 2022; DPM-Solver++(2M): Lu et al. 2022) with diffusers'
conventions: scaled_linear betas, 'leading' timestep spacing with
steps_offset, set_alpha_to_one=False final-alpha handling.

Honest scope note (docs/PARITY.md): with zero network egress and no
diffusers wheel on disk, goldens from diffusers' *own* binaries are
unobtainable here; two independently written implementations (this torch
one and gmdx's JAX/scan one) agreeing step-for-step is the strongest
available evidence.

Torch-only module — no jax imports.
"""

from __future__ import annotations

import math
from types import SimpleNamespace
from typing import List, Optional

import torch


def make_betas(num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
               beta_schedule="scaled_linear") -> torch.Tensor:
    if beta_schedule == "linear":
        return torch.linspace(beta_start, beta_end, num_train_timesteps,
                              dtype=torch.float32)
    if beta_schedule == "scaled_linear":
        return torch.linspace(beta_start**0.5, beta_end**0.5,
                              num_train_timesteps, dtype=torch.float32) ** 2
    if beta_schedule == "squaredcos_cap_v2":
        def alpha_bar(t):
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
        n = num_train_timesteps
        return torch.tensor(
            [min(1 - alpha_bar((i + 1) / n) / alpha_bar(i / n), 0.999)
             for i in range(n)], dtype=torch.float32)
    raise ValueError(beta_schedule)


class _Base:
    """Shared: beta table, leading-spacing timesteps, add_noise."""

    order = 1
    init_noise_sigma = 1.0

    def __init__(self, num_train_timesteps=1000, beta_start=0.00085,
                 beta_end=0.012, beta_schedule="scaled_linear",
                 prediction_type="epsilon", steps_offset=1,
                 set_alpha_to_one=False, clip_sample=False,
                 timestep_spacing="leading", **extra):
        self.config = SimpleNamespace(
            num_train_timesteps=num_train_timesteps, beta_start=beta_start,
            beta_end=beta_end, beta_schedule=beta_schedule,
            prediction_type=prediction_type, steps_offset=steps_offset,
            set_alpha_to_one=set_alpha_to_one, clip_sample=clip_sample,
            timestep_spacing=timestep_spacing, **extra,
        )
        self.betas = make_betas(num_train_timesteps, beta_start, beta_end,
                                beta_schedule)
        self.alphas = 1.0 - self.betas
        self.alphas_cumprod = torch.cumprod(self.alphas, dim=0)
        self.final_alpha_cumprod = (
            torch.tensor(1.0) if set_alpha_to_one else self.alphas_cumprod[0]
        )
        self.num_inference_steps: Optional[int] = None
        self.timesteps: Optional[torch.Tensor] = None

    def _leading_timesteps(self, num_inference_steps: int) -> torch.Tensor:
        """arange(N) * (T // N) + steps_offset, descending (int64)."""
        step_ratio = self.config.num_train_timesteps // num_inference_steps
        ts = torch.arange(0, num_inference_steps, dtype=torch.int64) * step_ratio
        ts = ts + self.config.steps_offset
        return ts.flip(0)

    def scale_model_input(self, sample, timestep=None):
        return sample

    def add_noise(self, original, noise, timesteps):
        a = self.alphas_cumprod[timesteps].sqrt()
        s = (1.0 - self.alphas_cumprod[timesteps]).sqrt()
        while a.ndim < original.ndim:
            a, s = a.unsqueeze(-1), s.unsqueeze(-1)
        return a * original + s * noise

    def _predict_x0(self, sample, model_output, alpha_prod_t):
        pt = self.config.prediction_type
        if pt == "epsilon":
            return (sample - (1 - alpha_prod_t) ** 0.5 * model_output) / alpha_prod_t ** 0.5
        if pt == "v_prediction":
            return alpha_prod_t ** 0.5 * sample - (1 - alpha_prod_t) ** 0.5 * model_output
        if pt == "sample":
            return model_output
        raise ValueError(pt)


class DDPMScheduler(_Base):
    """Ancestral sampler, variance 'fixed_small' (diffusers default)."""

    def set_timesteps(self, num_inference_steps: int, device=None):
        self.num_inference_steps = num_inference_steps
        self.timesteps = self._leading_timesteps(num_inference_steps)

    def step(self, model_output, timestep, sample, generator=None,
             variance_noise=None, return_dict=True, **kwargs):
        """``variance_noise`` is a parity-harness extension (not in
        diffusers' DDPM API): inject the ancestral noise tensor so the same
        draw can be fed to the JAX side."""
        t = int(timestep)
        step_ratio = self.config.num_train_timesteps // self.num_inference_steps
        prev_t = t - step_ratio
        alpha_prod_t = self.alphas_cumprod[t]
        alpha_prod_prev = (
            self.alphas_cumprod[prev_t] if prev_t >= 0 else torch.tensor(1.0)
        )
        beta_prod_t = 1 - alpha_prod_t
        beta_prod_prev = 1 - alpha_prod_prev
        current_alpha = alpha_prod_t / alpha_prod_prev
        current_beta = 1 - current_alpha

        x0 = self._predict_x0(sample, model_output, alpha_prod_t)
        if self.config.clip_sample:
            x0 = x0.clamp(-1.0, 1.0)

        # mu_t coefficients (Ho et al. Eq. 7)
        x0_coeff = (alpha_prod_prev ** 0.5 * current_beta) / beta_prod_t
        xt_coeff = (current_alpha ** 0.5 * beta_prod_prev) / beta_prod_t
        prev = x0_coeff * x0 + xt_coeff * sample

        if t > 0:
            variance = beta_prod_prev / beta_prod_t * current_beta
            variance = torch.clamp(variance, min=1e-20)
            noise = variance_noise
            if noise is None:
                noise = torch.randn(
                    sample.shape, generator=generator, dtype=sample.dtype
                )
            prev = prev + variance ** 0.5 * noise

        if not return_dict:
            return (prev,)
        return SimpleNamespace(prev_sample=prev, pred_original_sample=x0)


class DDIMScheduler(_Base):
    """Deterministic (eta=0) / stochastic (eta>0) DDIM."""

    def set_timesteps(self, num_inference_steps: int, device=None):
        self.num_inference_steps = num_inference_steps
        self.timesteps = self._leading_timesteps(num_inference_steps)

    def step(self, model_output, timestep, sample, eta: float = 0.0,
             use_clipped_model_output=False, generator=None,
             variance_noise=None, return_dict=True, **kwargs):
        t = int(timestep)
        prev_t = t - self.config.num_train_timesteps // self.num_inference_steps
        alpha_prod_t = self.alphas_cumprod[t]
        alpha_prod_prev = (
            self.alphas_cumprod[prev_t] if prev_t >= 0
            else self.final_alpha_cumprod
        )
        beta_prod_t = 1 - alpha_prod_t

        x0 = self._predict_x0(sample, model_output, alpha_prod_t)
        if self.config.prediction_type == "epsilon":
            eps = model_output
        elif self.config.prediction_type == "v_prediction":
            eps = alpha_prod_t ** 0.5 * model_output + beta_prod_t ** 0.5 * sample
        else:
            eps = (sample - alpha_prod_t ** 0.5 * x0) / beta_prod_t ** 0.5
        if self.config.clip_sample:
            x0 = x0.clamp(-1.0, 1.0)
            eps = (sample - alpha_prod_t ** 0.5 * x0) / beta_prod_t ** 0.5

        # sigma_t(eta) (Song et al. Eq. 16)
        variance = (1 - alpha_prod_prev) / (1 - alpha_prod_t) * (
            1 - alpha_prod_t / alpha_prod_prev
        )
        std = eta * variance ** 0.5

        if use_clipped_model_output:
            eps = (sample - alpha_prod_t ** 0.5 * x0) / beta_prod_t ** 0.5
        dir_xt = (1 - alpha_prod_prev - std**2) ** 0.5 * eps
        prev = alpha_prod_prev ** 0.5 * x0 + dir_xt
        if eta > 0:
            if variance_noise is None:
                variance_noise = torch.randn(
                    sample.shape, generator=generator, dtype=sample.dtype
                )
            prev = prev + std * variance_noise

        if not return_dict:
            return (prev,)
        return SimpleNamespace(prev_sample=prev, pred_original_sample=x0)


class PNDMScheduler(_Base):
    """PLMS path (skip_prk_steps=True) — the SD-1.5 pinned scheduler."""

    def __init__(self, *args, skip_prk_steps=True, **kwargs):
        super().__init__(*args, **kwargs)
        self.config.skip_prk_steps = skip_prk_steps
        if not skip_prk_steps:
            raise NotImplementedError("only the PLMS path is implemented")
        self.ets: List[torch.Tensor] = []
        self.counter = 0
        self.cur_sample: Optional[torch.Tensor] = None

    def set_timesteps(self, num_inference_steps: int, device=None):
        self.num_inference_steps = num_inference_steps
        base_ts = self._leading_timesteps(num_inference_steps).flip(0)  # asc
        if num_inference_steps > 1:
            plms = torch.cat([base_ts[:-1], base_ts[-2:-1], base_ts[-1:]])
        else:
            plms = base_ts
        self.timesteps = plms.flip(0)
        self.ets = []
        self.counter = 0
        self.cur_sample = None

    def step(self, model_output, timestep, sample, return_dict=True, **kwargs):
        t = int(timestep)
        step_ratio = self.config.num_train_timesteps // self.num_inference_steps
        prev_t = t - step_ratio

        if self.counter != 1:
            self.ets = self.ets[-3:] + [model_output]
        else:
            prev_t = t
            t = t + step_ratio

        if len(self.ets) == 1 and self.counter == 0:
            eps = model_output
            self.cur_sample = sample
        elif len(self.ets) == 1 and self.counter == 1:
            eps = (model_output + self.ets[-1]) / 2
            sample = self.cur_sample
            self.cur_sample = None
        elif len(self.ets) == 2:
            eps = (3 * self.ets[-1] - self.ets[-2]) / 2
        elif len(self.ets) == 3:
            eps = (23 * self.ets[-1] - 16 * self.ets[-2] + 5 * self.ets[-3]) / 12
        else:
            eps = (55 * self.ets[-1] - 59 * self.ets[-2] + 37 * self.ets[-3]
                   - 9 * self.ets[-4]) / 24

        prev = self._transfer(sample, t, prev_t, eps)
        self.counter += 1
        if not return_dict:
            return (prev,)
        return SimpleNamespace(prev_sample=prev)

    def _transfer(self, sample, t, prev_t, eps):
        alpha_t = self.alphas_cumprod[t]
        alpha_prev = (
            self.alphas_cumprod[prev_t] if prev_t >= 0
            else self.final_alpha_cumprod
        )
        if self.config.prediction_type == "v_prediction":
            eps = alpha_t ** 0.5 * eps + (1 - alpha_t) ** 0.5 * sample
        beta_t = 1 - alpha_t
        beta_prev = 1 - alpha_prev
        sample_coeff = (alpha_prev / alpha_t) ** 0.5
        denom = alpha_t * beta_prev ** 0.5 + (alpha_t * beta_t * alpha_prev) ** 0.5
        return sample_coeff * sample - (alpha_prev - alpha_t) * eps / denom


class DPMSolverMultistepScheduler(_Base):
    """DPM-Solver++(2M), algorithm_type='dpmsolver++', solver_order=2.

    The configuration the reference's scheduler_tuning/formal_improved use
    (thresholding off, midpoint solver); data-prediction (x0) form.
    """

    def __init__(self, *args, solver_order=2, algorithm_type="dpmsolver++",
                 thresholding=False, lower_order_final=True, **kwargs):
        super().__init__(*args, **kwargs)
        self.config.solver_order = solver_order
        self.config.algorithm_type = algorithm_type
        self.config.thresholding = thresholding
        self.config.lower_order_final = lower_order_final
        if algorithm_type != "dpmsolver++" or solver_order != 2 or thresholding:
            raise NotImplementedError(
                "only DPM-Solver++ order 2 without thresholding is used by "
                "the reference"
            )
        self.model_outputs: List[Optional[torch.Tensor]] = [None, None]
        self.lower_order_nums = 0
        self._step_index = 0

    def set_timesteps(self, num_inference_steps: int, device=None):
        self.num_inference_steps = num_inference_steps
        # diffusers DPM: linspace over [0, T-1] then 'leading'-like handling;
        # default timestep_spacing for DPMSolverMultistep is 'linspace'.
        n = self.config.num_train_timesteps
        ts = (
            torch.linspace(0, n - 1, num_inference_steps + 1)
            .round()
            .flip(0)[:-1]
            .to(torch.int64)
        )
        self.timesteps = ts
        self.model_outputs = [None, None]
        self.lower_order_nums = 0
        self._step_index = 0
        # sigma table in the lambda parameterization
        self.alpha_t = self.alphas_cumprod ** 0.5
        self.sigma_t = (1 - self.alphas_cumprod) ** 0.5
        self.lambda_t = torch.log(self.alpha_t) - torch.log(self.sigma_t)

    def _x0(self, model_output, t, sample):
        a, s = self.alpha_t[t], self.sigma_t[t]
        pt = self.config.prediction_type
        if pt == "epsilon":
            return (sample - s * model_output) / a
        if pt == "v_prediction":
            return a * sample - s * model_output
        return model_output

    def step(self, model_output, timestep, sample, return_dict=True, **kwargs):
        i = self._step_index
        t = int(self.timesteps[i])
        prev_t = int(self.timesteps[i + 1]) if i + 1 < len(self.timesteps) else 0

        x0 = self._x0(model_output, t, sample)
        self.model_outputs = [self.model_outputs[1], x0]

        # diffusers forces first order on warmup, and on the final step only
        # for short schedules (lower_order_final gate: < 15 steps); the
        # final-sigma-zero transfer below handles the last step regardless.
        lower_order = (
            self.lower_order_nums < 1
            or (self.config.lower_order_final and len(self.timesteps) < 15
                and i == len(self.timesteps) - 1)
        )
        a_prev = self.alpha_t[prev_t] if prev_t > 0 else torch.tensor(1.0)
        s_prev = self.sigma_t[prev_t] if prev_t > 0 else torch.tensor(0.0)
        l_prev = (
            torch.log(a_prev) - torch.log(s_prev.clamp_min(1e-10))
            if prev_t > 0 else torch.tensor(float("inf"))
        )
        l_t = self.lambda_t[t]
        h = l_prev - l_t
        s_t = self.sigma_t[t]

        if prev_t == 0:
            # last transfer lands exactly on x0
            prev = x0 if lower_order or self.model_outputs[0] is None else x0
        elif lower_order or self.model_outputs[0] is None:
            # DPM-Solver++(1): x_prev = (s_prev/s_t) x - a_prev (e^{-h}-1) x0
            prev = (s_prev / s_t) * sample - a_prev * (torch.expm1(-h)) * x0
        else:
            # 2M midpoint: D1 correction from the previous x0
            t_prev1 = int(self.timesteps[i - 1])
            l_prev1 = self.lambda_t[t_prev1]
            h_last = l_t - l_prev1
            r = h_last / h
            d0 = x0
            d1 = (x0 - self.model_outputs[0]) / r
            prev = (
                (s_prev / s_t) * sample
                - a_prev * torch.expm1(-h) * d0
                - 0.5 * a_prev * torch.expm1(-h) * d1
            )

        if self.lower_order_nums < 1:
            self.lower_order_nums += 1
        self._step_index += 1
        if not return_dict:
            return (prev,)
        return SimpleNamespace(prev_sample=prev)


__all__ = [
    "DDPMScheduler",
    "DDIMScheduler",
    "PNDMScheduler",
    "DPMSolverMultistepScheduler",
    "make_betas",
]
