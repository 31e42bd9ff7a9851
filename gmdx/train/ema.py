"""Exponential moving average of a param tree.

Replaces diffusers' ``EMAModel`` (used by both reference trainers,
train_gm_unet.py:802-812,1210-1216; train_vqgan_lora.py:828-830,1226-1227)
with a pure pytree transform: state is ``(shadow_params, step)``, update is a
single fused ``tree.map`` under jit. The reference's ``--offload_ema`` CPU
offload is unnecessary here — the shadow tree can live on host via
``jax.device_put`` with a CPU sharding if HBM is tight, but v5e HBM fits the
UNet + optimizer + EMA comfortably at SD-1.5 scale.

Decay ramp matches diffusers EMAModel:
  * warmup (default): decay_t = 1 - (1 + step/inv_gamma)^(-power)
  * classic:          decay_t = (1 + step) / (10 + step)
clamped to [min_decay, max_decay].
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class EMAConfig:
    max_decay: float = 0.9999
    min_decay: float = 0.0
    use_warmup: bool = True
    inv_gamma: float = 1.0
    power: float = 2.0 / 3.0


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class EMAState:
    shadow: Any
    step: Array

    def tree_flatten(self):
        return (self.shadow, self.step), None

    @classmethod
    def tree_unflatten(cls, _aux, children):
        return cls(*children)


def ema_init(params) -> EMAState:
    # jnp.copy (not asarray): the shadow must not alias the live params —
    # donated train steps would otherwise see the same buffer twice.
    return EMAState(
        shadow=jax.tree.map(jnp.copy, params),
        step=jnp.zeros((), jnp.int32),
    )


def ema_decay_for_step(config: EMAConfig, step: Array) -> Array:
    step_f = step.astype(jnp.float32)
    if config.use_warmup:
        decay = 1.0 - (1.0 + step_f / config.inv_gamma) ** -config.power
    else:
        decay = (1.0 + step_f) / (10.0 + step_f)
    return jnp.clip(decay, config.min_decay, config.max_decay)


def ema_update(config: EMAConfig, state: EMAState, params) -> EMAState:
    step = state.step + 1
    decay = ema_decay_for_step(config, step)
    shadow = jax.tree.map(
        lambda s, p: s * decay + p.astype(s.dtype) * (1.0 - decay),
        state.shadow,
        params,
    )
    return EMAState(shadow=shadow, step=step)


__all__ = ["EMAConfig", "EMAState", "ema_init", "ema_update", "ema_decay_for_step"]
