"""Stage-2 GM-UNet training: ε-prediction DDPM over [SDR ‖ noisy-GM] latents.

Reference hot loop (scripts/stage2/train_gm_unet.py:1141-1275): per step,
VAE-encode SDR and GM (×0.18215), draw noise (optional ``noise_offset`` /
``input_perturbation``), uniform timesteps, add_noise on the GM latents, run
the 8-ch UNet on ``cat([sdr_latents, noisy_gm], 1)`` with CLIP text cond,
MSE against ε, clip-grad + AdamW, EMA. The frozen VAE/text-encoder forwards,
the noising, the UNet, the loss, and the optimizer update all fuse into one
jitted step here; data parallelism comes from batch-sharded inputs over a
``data`` mesh axis with replicated params (XLA inserts the gradient psum).

min-SNR weighting (``snr_gamma``) is implemented for real: the reference
parses the flag and imports ``compute_snr`` but never applies it
(train_gm_unet.py:490-510 vs :1192 — SURVEY.md C11); a plain-MSE default
keeps parity.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from gmdx.schedulers import DDPMScheduler
from gmdx.schedulers.base import add_noise, get_velocity
from gmdx.train.ema import EMAConfig, EMAState, ema_init, ema_update
from gmdx.train.optim import get_lr_schedule, make_adamw

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class Stage2Config:
    learning_rate: float = 1e-5
    lr_scheduler: str = "constant"
    lr_warmup_steps: int = 0
    max_train_steps: Optional[int] = None
    gradient_accumulation_steps: int = 1
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_weight_decay: float = 1e-2
    adam_epsilon: float = 1e-8
    max_grad_norm: float = 1.0
    noise_offset: float = 0.0
    input_perturbation: float = 0.0
    snr_gamma: Optional[float] = None
    use_8bit_adam: bool = False
    prediction_type: str = "epsilon"
    use_ema: bool = False
    weight_dtype: Any = jnp.float32


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Stage2State:
    params: Any  # trainable UNet params
    opt_state: Any
    ema: Optional[EMAState]
    step: Array

    def tree_flatten(self):
        return (self.params, self.opt_state, self.ema, self.step), None

    @classmethod
    def tree_unflatten(cls, _aux, children):
        return cls(*children)


def make_optimizer(config: Stage2Config) -> optax.GradientTransformation:
    schedule = get_lr_schedule(
        config.lr_scheduler,
        config.learning_rate,
        num_warmup_steps=config.lr_warmup_steps,
        num_training_steps=config.max_train_steps,
    )
    opt = make_adamw(
        schedule,
        beta1=config.adam_beta1,
        beta2=config.adam_beta2,
        weight_decay=config.adam_weight_decay,
        epsilon=config.adam_epsilon,
        max_grad_norm=config.max_grad_norm,
        low_precision_moments=config.use_8bit_adam,
    )
    if config.gradient_accumulation_steps > 1:
        # Accumulate micro-batch grads on device; params update every k-th
        # call (the reference's accelerate.accumulate semantics).
        opt = optax.MultiSteps(opt, config.gradient_accumulation_steps)
    return opt


def init_state(
    config: Stage2Config, unet_params, optimizer: optax.GradientTransformation
) -> Stage2State:
    return Stage2State(
        params=unet_params,
        opt_state=optimizer.init(unet_params),
        ema=ema_init(unet_params) if config.use_ema else None,
        step=jnp.zeros((), jnp.int32),
    )


def stage2_loss(
    unet_apply,
    params,
    *,
    sdr_latents: Array,
    gm_latents: Array,
    encoder_hidden_states: Array,
    noise: Array,
    timesteps: Array,
    alphas_cumprod: Array,
    config: Stage2Config,
    perturbed_noise: Optional[Array] = None,
) -> Array:
    """The per-batch training loss given already-encoded latents."""
    noising = perturbed_noise if perturbed_noise is not None else noise
    noisy_gm = add_noise(alphas_cumprod, gm_latents, noising, timesteps)
    model_in = jnp.concatenate([sdr_latents, noisy_gm], axis=1)
    pred = unet_apply(params, model_in, timesteps, encoder_hidden_states)

    if config.prediction_type == "epsilon":
        target = noise
    elif config.prediction_type == "v_prediction":
        target = get_velocity(alphas_cumprod, gm_latents, noise, timesteps)
    else:
        raise ValueError(f"unknown prediction_type {config.prediction_type!r}")

    err = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    per_sample = jnp.mean(err, axis=tuple(range(1, err.ndim)))
    if config.snr_gamma is not None:
        acp = alphas_cumprod[timesteps]
        snr = acp / (1.0 - acp)
        if config.prediction_type == "epsilon":
            weight = jnp.minimum(snr, config.snr_gamma) / snr
        else:  # v_prediction
            weight = jnp.minimum(snr, config.snr_gamma) / (snr + 1.0)
        per_sample = per_sample * weight
    return jnp.mean(per_sample)


def make_train_step(
    config: Stage2Config,
    *,
    unet,
    vae,
    text_encoder,
    noise_scheduler: Optional[DDPMScheduler] = None,
    optimizer: Optional[optax.GradientTransformation] = None,
    donate: bool = True,
):
    """Build the jitted end-to-end train step.

    Returns ``step_fn(state, frozen, batch, key) -> (state, metrics)`` where
    ``frozen = {"vae": vae_params, "text_encoder": text_params}`` and
    ``batch = {"sdr": (B,3,H,W) in [-1,1], "gm": (B,3,H,W) in [-1,1],
    "input_ids": (B,77) int32}``. Shard the batch's leading dim over the
    ``data`` mesh axis and replicate state/frozen; no further annotation is
    needed — jit propagates the shardings and inserts the grad all-reduce.
    """
    from gmdx.train._env import default_parity_chain_off

    default_parity_chain_off()

    noise_scheduler = noise_scheduler or DDPMScheduler()
    optimizer = optimizer or make_optimizer(config)
    acp = noise_scheduler.alphas_cumprod
    num_train_timesteps = noise_scheduler.config.num_train_timesteps
    wd = config.weight_dtype

    unet_apply = lambda p, *a: unet.apply({"params": p}, *a)

    def step_fn(state: Stage2State, frozen, batch, key: Array):
        k_sdr, k_gm, k_noise, k_off, k_pert, k_t = jax.random.split(key, 6)
        scaling = vae.config.scaling_factor

        def encode(images, k):
            post = vae.apply(
                {"params": frozen["vae"]},
                images.astype(wd),
                method=vae.encode,
            )
            return post.sample(k) * scaling

        if "sdr_latent_mean" in batch:
            # Cached-latent path (--cache_latents): the frozen VAE encodes
            # are ~46% of the device step at 512² (BENCHNOTES.md), and the
            # posterior (mean, std) is a deterministic function of the
            # image — cache those and keep the per-step posterior *sampling*
            # on device, so the training distribution is unchanged.
            def sample_cached(prefix, k):
                mean = batch[f"{prefix}_latent_mean"].astype(jnp.float32)
                std = batch[f"{prefix}_latent_std"].astype(jnp.float32)
                eps = jax.random.normal(k, mean.shape, jnp.float32)
                return ((mean + std * eps) * scaling).astype(wd)

            sdr_latents = sample_cached("sdr", k_sdr)
            gm_latents = sample_cached("gm", k_gm)
        else:
            sdr_latents = encode(batch["sdr"], k_sdr)
            gm_latents = encode(batch["gm"], k_gm)
        context = text_encoder.apply(
            {"params": frozen["text_encoder"]}, batch["input_ids"]
        )

        b = gm_latents.shape[0]
        noise = jax.random.normal(k_noise, gm_latents.shape, jnp.float32)
        if config.noise_offset > 0:
            # Per-sample-per-channel DC offset (train_gm_unet.py:1164-1168).
            noise = noise + config.noise_offset * jax.random.normal(
                k_off, gm_latents.shape[:2] + (1, 1), jnp.float32
            )
        perturbed = None
        if config.input_perturbation > 0:
            perturbed = noise + config.input_perturbation * jax.random.normal(
                k_pert, noise.shape, jnp.float32
            )
        timesteps = jax.random.randint(k_t, (b,), 0, num_train_timesteps)

        def loss_fn(params):
            return stage2_loss(
                unet_apply,
                params,
                sdr_latents=sdr_latents,
                gm_latents=gm_latents,
                encoder_hidden_states=context,
                noise=noise,
                timesteps=timesteps,
                alphas_cumprod=acp,
                config=config,
                perturbed_noise=perturbed,
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        # EMA is NOT advanced here: the reference steps EMA only when
        # ``accelerator.sync_gradients`` — once per *optimizer update*, not
        # per micro-batch (train_gm_unet.py:1210-1215). The CLI calls
        # make_ema_step at each sync boundary instead. Under accumulation
        # (optax.MultiSteps) ``updates`` is all-zeros between syncs and
        # apply_updates is the identity, matching accelerate's no-op
        # optimizer.step().
        new_state = Stage2State(
            params=params,
            opt_state=opt_state,
            ema=state.ema,
            step=state.step + 1,
        )
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            # Per-module norms (reference log_grad_norm,
            # train_vqgan_lora.py:329-334): top-level tree keys keep the
            # metric count bounded at SD scale.
            "module_grad_norms": {
                k: optax.global_norm(v) for k, v in grads.items()
            },
        }
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_ema_step(config: Stage2Config):
    """EMA advance at an optimizer-sync boundary.

    The reference steps EMA once per accelerate sync
    (train_gm_unet.py:1210-1215: ``if accelerator.sync_gradients: ...
    ema_gm_unet.step(gm_unet.parameters())``) — so under gradient
    accumulation the shadow sees each updated parameter vector exactly once
    and the decay-ramp counter counts optimizer updates. The CLI calls this
    at every sync boundary (mirrors stage1.make_ema_step)."""

    def step_fn(state: Stage2State) -> Stage2State:
        if state.ema is None:
            return state
        return Stage2State(
            params=state.params,
            opt_state=state.opt_state,
            ema=ema_update(EMAConfig(), state.ema, state.params),
            step=state.step,
        )

    return jax.jit(step_fn, donate_argnums=(0,))


__all__ = [
    "Stage2Config",
    "Stage2State",
    "make_optimizer",
    "init_state",
    "stage2_loss",
    "make_train_step",
    "make_ema_step",
]
