"""Shared scheduler math: beta schedules, ᾱ tables, forward noising.

Default hyperparameters pin the SD-1.5 scheduler family the reference loads
from the hub (scaled_linear betas 0.00085→0.012 over 1000 train steps,
epsilon prediction, steps_offset 1, set_alpha_to_one False — see
reference scripts/stage2/train_gm_unet.py:756 and README.md:111).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"  # "linear" | "scaled_linear" | "squaredcos_cap_v2"
    prediction_type: str = "epsilon"  # "epsilon" | "v_prediction" | "sample"
    steps_offset: int = 1
    set_alpha_to_one: bool = False
    clip_sample: bool = False
    clip_sample_range: float = 1.0
    timestep_spacing: str = "leading"  # "leading" | "linspace" | "trailing"


def make_betas(config: SchedulerConfig) -> Array:
    """Build the beta schedule table (float32, shape [num_train_timesteps])."""
    n = config.num_train_timesteps
    if config.beta_schedule == "linear":
        return jnp.linspace(config.beta_start, config.beta_end, n, dtype=jnp.float32)
    if config.beta_schedule == "scaled_linear":
        return (
            jnp.linspace(
                config.beta_start**0.5, config.beta_end**0.5, n, dtype=jnp.float32
            )
            ** 2
        )
    if config.beta_schedule == "squaredcos_cap_v2":
        def alpha_bar(t):
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

        betas = [
            min(1 - alpha_bar((i + 1) / n) / alpha_bar(i / n), 0.999) for i in range(n)
        ]
        return jnp.asarray(betas, dtype=jnp.float32)
    raise ValueError(f"unknown beta_schedule {config.beta_schedule!r}")


def alphas_cumprod_from_config(config: SchedulerConfig) -> Array:
    return jnp.cumprod(1.0 - make_betas(config), axis=0)


def _extract(table: Array, t: Array, ndim: int) -> Array:
    """Gather per-sample values from a 1-D table and right-pad for broadcast."""
    vals = table[t]
    return vals.reshape(vals.shape + (1,) * (ndim - vals.ndim))


def add_noise(
    alphas_cumprod: Array, original: Array, noise: Array, timesteps: Array
) -> Array:
    """Forward q(x_t | x_0): ``sqrt(ᾱ_t) x0 + sqrt(1-ᾱ_t) ε``.

    ``timesteps`` may be scalar or per-sample (leading-dim) integers.
    """
    a = _extract(jnp.sqrt(alphas_cumprod), timesteps, original.ndim)
    s = _extract(jnp.sqrt(1.0 - alphas_cumprod), timesteps, original.ndim)
    return a * original + s * noise


def get_velocity(
    alphas_cumprod: Array, sample: Array, noise: Array, timesteps: Array
) -> Array:
    """v-prediction target ``sqrt(ᾱ_t) ε − sqrt(1-ᾱ_t) x0``."""
    a = _extract(jnp.sqrt(alphas_cumprod), timesteps, sample.ndim)
    s = _extract(jnp.sqrt(1.0 - alphas_cumprod), timesteps, sample.ndim)
    return a * noise - s * sample


def predict_x0(
    alphas_cumprod: Array,
    sample: Array,
    model_output: Array,
    t: Array,
    prediction_type: str,
) -> Array:
    """Recover x0 from the model output under the configured parameterization."""
    a = _extract(alphas_cumprod, t, sample.ndim)
    if prediction_type == "epsilon":
        return (sample - jnp.sqrt(1.0 - a) * model_output) / jnp.sqrt(a)
    if prediction_type == "v_prediction":
        return jnp.sqrt(a) * sample - jnp.sqrt(1.0 - a) * model_output
    if prediction_type == "sample":
        return model_output
    raise ValueError(f"unknown prediction_type {prediction_type!r}")


def predict_eps(
    alphas_cumprod: Array,
    sample: Array,
    model_output: Array,
    t: Array,
    prediction_type: str,
) -> Array:
    """Recover ε from the model output under the configured parameterization."""
    a = _extract(alphas_cumprod, t, sample.ndim)
    if prediction_type == "epsilon":
        return model_output
    if prediction_type == "v_prediction":
        return jnp.sqrt(a) * model_output + jnp.sqrt(1.0 - a) * sample
    if prediction_type == "sample":
        return (sample - jnp.sqrt(a) * model_output) / jnp.sqrt(1.0 - a)
    raise ValueError(f"unknown prediction_type {prediction_type!r}")


def leading_timesteps(
    config: SchedulerConfig, num_inference_steps: int
) -> Tuple[Array, int]:
    """'leading' spacing: arange(N) * (T // N) + steps_offset, descending.

    Returns (timesteps[int32, N], step_ratio).
    """
    step_ratio = config.num_train_timesteps // num_inference_steps
    ts = (jnp.arange(0, num_inference_steps, dtype=jnp.int32) * step_ratio)
    ts = ts + config.steps_offset
    return ts[::-1], step_ratio


__all__ = [
    "SchedulerConfig",
    "make_betas",
    "alphas_cumprod_from_config",
    "add_noise",
    "get_velocity",
    "predict_x0",
    "predict_eps",
    "leading_timesteps",
]
