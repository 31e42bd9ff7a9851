"""ControlNet training: ε-prediction with a frozen SD UNet, trainable copy.

New capability beyond the reference code (its README names ControlNet at
README.md:23,149 but ships none — SURVEY.md §7.3). The objective is the
standard ControlNet recipe specialized to the SDR→HDRTV pipeline
(gmdx/pipelines/controlnet.py): the control image is the full-resolution
SDR frame, the denoising target its own latent, so at inference the SDR
branch is steered toward the given frame while the GM branch synthesizes
the gain map.

Per step: VAE-encode the target (posterior sample ×0.18215), draw noise +
uniform timesteps, run the ControlNet on the noisy latent + control image,
feed its residuals into the FROZEN UNet's additional-residual hooks, MSE
against ε, AdamW on the ControlNet params only. One jitted step; DP via
batch-sharded inputs (XLA inserts the gradient psum), ZeRO-1/FSDP via
the gmdx.dist placement helpers.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from gmdx.schedulers import DDPMScheduler
from gmdx.schedulers.base import add_noise
from gmdx.train.ema import EMAConfig, EMAState, ema_init, ema_update
from gmdx.train.stage2 import Stage2Config, make_optimizer

Array = jax.Array

# Same knob surface as stage 2 (lr/adam/ema/precision); alias so callers
# read the intended type.
ControlNetTrainConfig = Stage2Config


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ControlNetState:
    params: Any  # trainable ControlNet params
    opt_state: Any
    ema: Optional[EMAState]
    step: Array

    def tree_flatten(self):
        return (self.params, self.opt_state, self.ema, self.step), None

    @classmethod
    def tree_unflatten(cls, _aux, children):
        return cls(*children)


def init_controlnet_state(
    config: ControlNetTrainConfig,
    controlnet_params,
    optimizer: optax.GradientTransformation,
) -> ControlNetState:
    return ControlNetState(
        params=controlnet_params,
        opt_state=optimizer.init(controlnet_params),
        ema=ema_init(controlnet_params) if config.use_ema else None,
        step=jnp.zeros((), jnp.int32),
    )


def make_controlnet_train_step(
    config: ControlNetTrainConfig,
    *,
    unet,
    vae,
    text_encoder,
    controlnet,
    noise_scheduler: Optional[DDPMScheduler] = None,
    optimizer: Optional[optax.GradientTransformation] = None,
    donate: bool = True,
):
    """Build the jitted ControlNet train step.

    ``step_fn(state, frozen, batch, key) -> (state, metrics)`` with
    ``frozen = {"unet": ..., "vae": ..., "text_encoder": ...}`` and
    ``batch = {"image": (B,3,H,W) in [-1,1], "cond": (B,3,H,W) in [-1,1],
    "input_ids": (B,77) int32}`` (``cond`` is rescaled to the ControlNet's
    [0,1] convention inside the step).
    """
    from gmdx.train._env import default_parity_chain_off

    default_parity_chain_off()

    noise_scheduler = noise_scheduler or DDPMScheduler()
    optimizer = optimizer or make_optimizer(config)
    acp = noise_scheduler.alphas_cumprod
    num_train_timesteps = noise_scheduler.config.num_train_timesteps
    wd = config.weight_dtype

    def step_fn(state: ControlNetState, frozen, batch, key: Array):
        k_enc, k_noise, k_t = jax.random.split(key, 3)
        scaling = vae.config.scaling_factor

        post = vae.apply(
            {"params": frozen["vae"]},
            batch["image"].astype(wd),
            method=vae.encode,
        )
        latents = post.sample(k_enc) * scaling
        context = text_encoder.apply(
            {"params": frozen["text_encoder"]}, batch["input_ids"]
        )
        cond_img = (batch["cond"].astype(wd) + 1.0) / 2.0  # [-1,1] -> [0,1]
        b = latents.shape[0]
        # The conditioning embedder downsamples 8x to the latent grid; match
        # it for VAEs with other scale factors (the tiny test configs).
        want = (b, cond_img.shape[1], latents.shape[2] * 8, latents.shape[3] * 8)
        if cond_img.shape != want:
            cond_img = jax.image.resize(cond_img, want, "bilinear")
        noise = jax.random.normal(k_noise, latents.shape, jnp.float32)
        timesteps = jax.random.randint(k_t, (b,), 0, num_train_timesteps)
        noisy = add_noise(acp, latents.astype(jnp.float32), noise, timesteps)
        noisy = noisy.astype(wd)

        def loss_fn(params):
            downs, mid = controlnet.apply(
                {"params": params}, noisy, timesteps, context, cond_img
            )
            pred = unet.apply(
                {"params": frozen["unet"]},
                noisy,
                timesteps,
                context,
                down_block_additional_residuals=downs,
                mid_block_additional_residual=mid,
            )
            return jnp.mean(
                (pred.astype(jnp.float32) - noise) ** 2
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        # EMA advances only at optimizer-sync boundaries via
        # make_controlnet_ema_step — same accumulation semantics as stage 2
        # (reference train_gm_unet.py:1210-1215, sync-gated EMA).
        new_state = ControlNetState(
            params=params,
            opt_state=opt_state,
            ema=state.ema,
            step=state.step + 1,
        )
        return new_state, {"loss": loss, "grad_norm": gnorm}

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_controlnet_ema_step(config: ControlNetTrainConfig):
    """EMA advance at an optimizer-sync boundary (see stage2.make_ema_step)."""

    def step_fn(state: ControlNetState) -> ControlNetState:
        if state.ema is None:
            return state
        return ControlNetState(
            params=state.params,
            opt_state=state.opt_state,
            ema=ema_update(EMAConfig(), state.ema, state.params),
            step=state.step,
        )

    return jax.jit(step_fn, donate_argnums=(0,))


__all__ = [
    "ControlNetTrainConfig",
    "ControlNetState",
    "init_controlnet_state",
    "make_controlnet_train_step",
    "make_controlnet_ema_step",
]
