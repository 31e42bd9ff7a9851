"""Optimizers + LR schedules (optax), matching the reference's surface.

The reference uses torch AdamW (beta1/beta2/weight_decay/eps flags,
train_gm_unet.py:898-904) and diffusers ``get_scheduler`` with the names
constant / constant_with_warmup / linear / cosine / cosine_with_restarts /
polynomial (train_gm_unet.py:1035-1040). Both are reproduced as optax
transforms; gradient clipping (``--max_grad_norm``) composes in the chain so
the whole update is one fused jitted step.
"""

from __future__ import annotations

import math
from typing import Optional

import optax


def get_lr_schedule(
    name: str,
    learning_rate: float,
    *,
    num_warmup_steps: int = 0,
    num_training_steps: Optional[int] = None,
    num_cycles: float = 0.5,
    power: float = 1.0,
) -> optax.Schedule:
    """diffusers get_scheduler parity (same names, same shapes)."""
    name = name.lower()

    def warmup(step):
        if num_warmup_steps <= 0:
            return 1.0
        import jax.numpy as jnp

        return jnp.minimum(1.0, (step + 1) / num_warmup_steps)

    if name == "constant":
        return lambda step: learning_rate
    if name == "constant_with_warmup":
        return lambda step: learning_rate * warmup(step)
    if num_training_steps is None:
        raise ValueError(f"schedule {name!r} needs num_training_steps")

    import jax.numpy as jnp

    def linear(step):
        prog = jnp.clip(
            (step - num_warmup_steps)
            / jnp.maximum(1, num_training_steps - num_warmup_steps),
            0.0,
            1.0,
        )
        return learning_rate * warmup(step) * (1.0 - prog)

    def cosine(step):
        prog = jnp.clip(
            (step - num_warmup_steps)
            / jnp.maximum(1, num_training_steps - num_warmup_steps),
            0.0,
            1.0,
        )
        return (
            learning_rate
            * warmup(step)
            * 0.5
            * (1.0 + jnp.cos(math.pi * 2.0 * num_cycles * prog))
        )

    def cosine_with_restarts(step):
        prog = jnp.clip(
            (step - num_warmup_steps)
            / jnp.maximum(1, num_training_steps - num_warmup_steps),
            0.0,
            1.0,
        )
        cycle_prog = (prog * num_cycles) % 1.0
        return (
            learning_rate
            * warmup(step)
            * jnp.where(prog >= 1.0, 0.0, 0.5 * (1.0 + jnp.cos(math.pi * cycle_prog)))
        )

    def polynomial(step):
        prog = jnp.clip(
            (step - num_warmup_steps)
            / jnp.maximum(1, num_training_steps - num_warmup_steps),
            0.0,
            1.0,
        )
        return learning_rate * warmup(step) * (1.0 - prog) ** power

    table = {
        "linear": linear,
        "cosine": cosine,
        "cosine_with_restarts": cosine_with_restarts,
        "polynomial": polynomial,
    }
    if name not in table:
        raise ValueError(f"unknown lr schedule {name!r}")
    return table[name]


def make_adamw(
    schedule: optax.Schedule,
    *,
    beta1: float = 0.9,
    beta2: float = 0.999,
    weight_decay: float = 1e-2,
    epsilon: float = 1e-8,
    max_grad_norm: Optional[float] = 1.0,
    low_precision_moments: bool = False,
) -> optax.GradientTransformation:
    """AdamW with optional global-norm clipping (reference clips before the
    optimizer step, train_gm_unet.py:1202-1204).

    ``low_precision_moments`` keeps the first moment in bfloat16 — the
    TPU-native analog of the reference's bitsandbytes --use_8bit_adam
    (train_vqgan_lora.py:910-939): same goal (shrink optimizer HBM), same
    knob surface."""
    chain = []
    if max_grad_norm is not None and max_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(
        optax.adamw(
            learning_rate=schedule,
            b1=beta1,
            b2=beta2,
            eps=epsilon,
            weight_decay=weight_decay,
            mu_dtype="bfloat16" if low_precision_moments else None,
        )
    )
    return optax.chain(*chain)


__all__ = ["get_lr_schedule", "make_adamw"]
