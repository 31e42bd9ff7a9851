"""Stage-1 VAE-LoRA + GAN training: learn the gain-map decoder head.

Reference (scripts/stage1/train_vqgan_lora.py:1080-1290): LoRA r=64 on every
VAE conv/linear via PEFT plus an unfrozen ``decoder.conv_out``; alternating
generator/discriminator steps keyed by the *dataloader index*
``(i // grad_accum) % 2`` (:1114 — the cadence is preserved by the caller
alternating ``gen_step``/``disc_step`` per batch); generator loss =
recon(L2|L1) + VGG19 perceptual + adaptive_weight · (−D(fake)) where the
adaptive weight is the ratio of the two losses' gradient norms at the
decoder's conv_out kernel (:1165-1177); discriminator loss = hinge + R1-style
gradient penalty on the reals (:1197-1214, helper :141-152).

TPU-native shape: trainables are {lora factors, conv_out kernel/bias} — the
frozen VAE param tree is never copied per step; ``merge_lora`` builds the
effective params inside the jitted step, and the adaptive weight's
grad-norm-ratio uses ``jax.grad`` w.r.t. only the conv_out kernel (reverse
AD stops there — no full double backward). The gradient penalty is a true
grad-of-grad through the discriminator, which JAX composes directly.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from gmdx.models.lora import LoRAConfig, merge_lora
from gmdx.models.vgg import perceptual_loss as vgg_feature_mse
from gmdx.models.vgg import resize_for_vgg
from gmdx.ops import apply_gm_to_sdr, gamut_compress
from gmdx.train.ema import EMAConfig, EMAState, ema_update

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class Stage1Config:
    qmax: float = 49.0
    vae_loss: str = "l2"  # "l2" | "l1"
    lora: LoRAConfig = LoRAConfig(rank=64, alpha=64.0)
    gp_weight: float = 10.0
    adaptive_weight_max: float = 1e4
    scaling_factor: float = 0.18215
    use_ema: bool = False
    # timm transform resolution for the perceptual backbone (reference
    # resolves it from the timm cfg, 224 for vgg19 — train_vqgan_lora.py:857)
    vgg_resolution: int = 224


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Stage1State:
    trainables: Any  # {"lora": {...}, "conv_out": {"kernel","bias"}}
    disc_params: Any
    disc_vars: Any  # spectral-norm power-iteration vectors (mutable coll.)
    opt_state: Any
    disc_opt_state: Any
    ema: Optional[EMAState]
    step: Array

    def tree_flatten(self):
        return (
            self.trainables,
            self.disc_params,
            self.disc_vars,
            self.opt_state,
            self.disc_opt_state,
            self.ema,
            self.step,
        ), None

    @classmethod
    def tree_unflatten(cls, _aux, children):
        return cls(*children)


def _set_conv_out(vae_params, conv_out):
    """Return a param tree with decoder/conv_out replaced (pure)."""
    params = dict(vae_params)
    decoder = dict(params["decoder"])
    decoder["conv_out"] = conv_out
    params["decoder"] = decoder
    return params


def effective_vae_params(config: Stage1Config, vae_params, trainables):
    """Trainable base conv_out FIRST, then LoRA on top: the reference PEFT
    model keeps conv_out's LoRA adapter active *and* unfreezes its base
    weight (train_vqgan_lora.py:809-822 — conv_out is in target_modules and
    then requires_grad_(True)), so the effective kernel is
    ``trainable_base + scale·(a@b)``. Merging after the swap keeps the
    conv_out LoRA factors in the gradient path."""
    base = _set_conv_out(vae_params, trainables["conv_out"])
    return merge_lora(base, trainables["lora"], config.lora.scale)


def init_trainables(key: Array, vae_params, config: Stage1Config):
    from gmdx.models.lora import init_lora_params

    lora = init_lora_params(key, vae_params, config.lora)
    return {
        "lora": lora,
        "conv_out": jax.tree.map(
            jnp.asarray, vae_params["decoder"]["conv_out"]
        ),
    }


def gm_forward(
    config: Stage1Config,
    vae,
    params,
    miss_pixels: Array,
    key: Array,
    eps: Optional[Array] = None,
):
    """sigmoid(decode(encode(x).sample()·s / s)) — the reference's GM head
    (train_vqgan_lora.py:1121-1123). ``miss_pixels`` in [-1, 1] NCHW.
    ``eps`` overrides the posterior-sampling draw (parity harnesses feed the
    torch-generated eps so both sides see identical latents)."""
    post = vae.apply({"params": params}, miss_pixels, method=vae.encode)
    sampled = post.sample(key) if eps is None else post.mean + post.std * eps
    latent = sampled * config.scaling_factor
    decoded = vae.apply(
        {"params": params}, latent / config.scaling_factor, method=vae.decode
    )
    return jax.nn.sigmoid(decoded)


def reconstruct_and_tonemap(
    config: Stage1Config, gm: Array, sdr01: Array, tmo_fn: Callable
) -> Array:
    hdr = apply_gm_to_sdr(gm, sdr01, qmax=config.qmax)
    return gamut_compress(tmo_fn(hdr, qmax=config.qmax))


def perceptual(
    vgg, vgg_params, a01: Array, b01: Array, resolution: int = 224
) -> Array:
    """VGG19 feature-pyramid MSE, mean over levels (reference helper
    :113-129): resize to the backbone resolution + imagenet normalize."""
    fa = vgg.apply({"params": vgg_params}, resize_for_vgg(a01, resolution))
    fb = vgg.apply({"params": vgg_params}, resize_for_vgg(b01, resolution))
    return vgg_feature_mse(fa, fb)


def make_gen_step(
    config: Stage1Config,
    *,
    vae,
    discriminator,
    vgg,
    tmo_fn: Callable,
    optimizer: optax.GradientTransformation,
    donate: bool = True,
):
    """Generator step. ``batch = {"pixel_values", "miss_pixel_values"}`` both
    in [-1, 1] NCHW; frozen = {"vae", "vgg"} param trees."""
    from gmdx.train._env import default_parity_chain_off

    default_parity_chain_off()


    def disc_apply(disc_params, disc_vars, x01):
        # Inference pass: frozen power-iteration stats (update only in D step).
        return discriminator.apply(
            {"params": disc_params, **disc_vars}, x01, update_sn=False
        )

    def step_fn(state: Stage1State, frozen, batch, key: Array):
        target01 = (batch["pixel_values"] + 1.0) / 2.0
        miss = batch["miss_pixel_values"]
        sdr01 = (miss + 1.0) / 2.0

        # One forward, shared by the loss AND the adaptive-weight probes.
        # ``kernel`` is threaded as a SEPARATE argument that replaces the
        # conv_out base kernel, so one jax.vjp over (trainables, kernel)
        # yields both the short probe pullbacks (cotangents on perc/adv,
        # gradient read at ``kernel`` only — XLA DCE prunes the decoder-
        # body backward for those calls) and the full parameter gradient.
        # The previous shape — a second losses() closure inside jax.vjp —
        # re-traced encode+decode+VGG+disc, and XLA did NOT CSE the two
        # numerically identical forwards (profiled: every decoder conv
        # appeared twice, jvp() next to jvp(jvp()), BENCHNOTES r5).
        def losses(trainables, kernel):
            t = dict(trainables)
            co = dict(t["conv_out"])
            co["kernel"] = kernel
            t["conv_out"] = co
            params = effective_vae_params(config, frozen["vae"], t)
            gm = gm_forward(
                config, vae, params, miss, key, eps=batch.get("encode_eps")
            )
            tmo = reconstruct_and_tonemap(config, gm, sdr01, tmo_fn)
            if config.vae_loss == "l2":
                recon = jnp.mean((target01 - tmo) ** 2)
            else:
                recon = jnp.mean(jnp.abs(target01 - tmo))
            perc = perceptual(
                vgg, frozen["vgg"], target01, tmo,
                resolution=config.vgg_resolution,
            )
            adv = -jnp.mean(disc_apply(state.disc_params, state.disc_vars, tmo))
            return recon, perc, adv

        (recon, perc, adv), pull = jax.vjp(
            losses, state.trainables, state.trainables["conv_out"]["kernel"]
        )
        one, zero = jnp.ones(()), jnp.zeros(())

        # Adaptive weight: grad-norm ratio at the conv_out kernel
        # (reference :1165-1174); a constant (stop_grad) in the loss.
        def kernel_grad_norm(cotangents):
            _, g = pull(cotangents)
            return jnp.linalg.norm(jax.lax.stop_gradient(g))

        adaptive = kernel_grad_norm((zero, one, zero)) / jnp.maximum(
            kernel_grad_norm((zero, zero, one)), 1e-8
        )
        adaptive = jnp.minimum(adaptive, config.adaptive_weight_max)
        loss = recon + perc + adaptive * adv
        parts = {
            "recon": recon,
            "perceptual": perc,
            "adversarial": adv,
            "adaptive_weight": adaptive,
        }

        # Full gradient of recon + perc + adaptive*adv in ONE pullback.
        # Inside losses() the trainables' own conv_out.kernel is shadowed
        # by the separate ``kernel`` argument, so its cotangent arrives in
        # g_kernel and trainable-tree slot is zeros — add them back.
        g_train, g_kernel = pull(
            (one, one, jax.lax.stop_gradient(adaptive))
        )
        co_grads = dict(g_train["conv_out"])
        co_grads["kernel"] = co_grads["kernel"] + g_kernel
        grads = dict(g_train)
        grads["conv_out"] = co_grads
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.trainables
        )
        trainables = optax.apply_updates(state.trainables, updates)
        # EMA is NOT advanced here: the reference steps its EMA once per
        # *optimizer sync* — after generator AND discriminator windows alike
        # (train_vqgan_lora.py:1225-1229, `if accelerator.sync_gradients`) —
        # so the CLI calls make_ema_step at each sync boundary instead.
        # Under gradient accumulation (optax.MultiSteps-wrapped optimizer)
        # `updates` is all-zeros between syncs and apply_updates is the
        # identity, matching accelerate's no-op optimizer.step().
        new_state = dataclasses.replace(
            state,
            trainables=trainables,
            opt_state=opt_state,
            step=state.step + 1,
        )
        metrics = {
            "gen_loss": loss,
            "grad_norm": optax.global_norm(grads),
            "module_grad_norms": {
                "lora": optax.global_norm(grads["lora"]),
                "conv_out": optax.global_norm(grads["conv_out"]),
            },
            **parts,
        }
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_ema_step(config: Stage1Config):
    """EMA advance at an optimizer-sync boundary.

    The reference steps EMA once per accelerate sync — after generator AND
    discriminator updates alike (train_vqgan_lora.py:1225-1229:
    ``if accelerator.sync_gradients: ... ema_model.step(vae.parameters())``)
    — so the EMA decay-ramp counter advances twice per gen/disc cycle and
    the post-disc step decays the shadow toward unchanged generator params.
    The CLI calls this at every sync to reproduce that schedule exactly."""

    def step_fn(state: Stage1State) -> Stage1State:
        if state.ema is None:
            return state
        return dataclasses.replace(
            state, ema=ema_update(EMAConfig(), state.ema, state.trainables)
        )

    return jax.jit(step_fn, donate_argnums=(0,))


def make_disc_step(
    config: Stage1Config,
    *,
    vae,
    discriminator,
    tmo_fn: Callable,
    optimizer: optax.GradientTransformation,
    donate: bool = True,
):
    """Discriminator step: hinge + gradient penalty on reals
    (reference :1197-1214; penalty = weight · mean((‖∂D/∂x_real‖₂ − 1)²))."""

    def step_fn(state: Stage1State, frozen, batch, key: Array):
        target01 = (batch["pixel_values"] + 1.0) / 2.0
        miss = batch["miss_pixel_values"]
        sdr01 = (miss + 1.0) / 2.0

        # Fake images from the current generator, detached (:1197).
        params = effective_vae_params(config, frozen["vae"], state.trainables)
        gm = gm_forward(
            config, vae, params, miss, key, eps=batch.get("encode_eps")
        )
        fake = jax.lax.stop_gradient(
            reconstruct_and_tonemap(config, gm, sdr01, tmo_fn)
        )

        def loss_fn(disc_params):
            def real_sum(x01):
                out = discriminator.apply(
                    {"params": disc_params, **state.disc_vars},
                    x01,
                    update_sn=False,
                )
                return jnp.sum(out), out

            (_, real_out), grad_images = jax.value_and_grad(
                real_sum, has_aux=True
            )(target01)
            fake_out = discriminator.apply(
                {"params": disc_params, **state.disc_vars}, fake, update_sn=False
            )
            hinge = jnp.mean(
                jax.nn.relu(1.0 + fake_out) + jax.nn.relu(1.0 - real_out)
            )
            g = grad_images.reshape(grad_images.shape[0], -1)
            # safe_norm, not jnp.linalg.norm: when D is momentarily constant
            # w.r.t. its input (e.g. a saturated sigmoid head at init),
            # ||g|| = 0 and sqrt's gradient is NaN — one poisoned disc step
            # then NaNs the whole run. The reference's torch `.norm(2,dim=1)`
            # has a GUARDED subgradient (exactly 0 at 0); safe_norm matches.
            gp = config.gp_weight * jnp.mean(
                (optax.safe_norm(g, 0.0, axis=1) - 1.0) ** 2
            )
            return hinge + gp, {"hinge": hinge, "gp": gp}

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.disc_params
        )
        updates, disc_opt_state = optimizer.update(
            grads, state.disc_opt_state, state.disc_params
        )
        disc_params = optax.apply_updates(state.disc_params, updates)

        # Refresh the spectral-norm power-iteration vectors once per D step.
        _, disc_vars = discriminator.apply(
            {"params": disc_params, **state.disc_vars},
            fake,
            update_sn=True,
            mutable=list(state.disc_vars.keys()),
        )

        new_state = dataclasses.replace(
            state,
            disc_params=disc_params,
            disc_vars=disc_vars,
            disc_opt_state=disc_opt_state,
            step=state.step + 1,
        )
        metrics = {
            "disc_loss": loss,
            "grad_norm": optax.global_norm(grads),
            **parts,
        }
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


__all__ = [
    "Stage1Config",
    "Stage1State",
    "init_trainables",
    "effective_vae_params",
    "gm_forward",
    "reconstruct_and_tonemap",
    "make_gen_step",
    "make_disc_step",
    "make_ema_step",
]
