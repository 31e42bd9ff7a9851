"""Stage-1 trainer parity: the reference VAE-LoRA + GAN step vs gmdx.

The torch side is assembled from the reference's OWN code wherever it can
execute in this sandbox:

  * ops — ``apply_gm_to_sdr`` / ``fix_mulog_tmo`` / ``gamut_compress`` are
    file-loaded from /root/reference/gm_diffusion/stage1/tone_mapping.py
    (torch-only imports) and used directly;
  * Discriminator — the reference class from .../stage1/discriminator.py,
    loaded under the diffusers shim;
  * LoRA — the real ``peft.get_peft_model`` over the refbridge torch VAE
    with target_modules = every Conv2d/Linear, exactly the reference's
    selection loop (train_vqgan_lora.py:809-822), incl. the unfrozen base
    ``decoder.conv_out``;
  * the loss math — a line-by-line transcription of the hot loop
    (train_vqgan_lora.py:1121-1220) and its helpers ``get_perceptual_loss``
    (:113-129), ``grad_layer_wrt_loss`` (:132-138), ``gradient_penalty``
    (:141-152). Only timm itself is absent (no timm in the sandbox): the
    perceptual backbone is a random-init torchvision-layout VGG19 whose
    weights cross through the production ``convert_vgg19_state_dict``.

The gmdx side runs the production ``make_gen_step`` / ``make_disc_step``
(gmdx/train/stage1.py) with the same weights (through the production
converters), the same injected posterior eps, and the same AdamW settings.

Spectral norm: torch updates the discriminator's power-iteration vectors on
every forward in train mode, while gmdx freezes them within a step and
refreshes once per D step (a documented TPU-native reshaping — no in-step
buffer mutation under jit). The harness pre-converges u/v torch-side
(power iteration is a fixed point), after which the two schedules compute
identical sigmas to fp32 precision.

Torch-only tooling — never imported by the JAX runtime path.
"""

from __future__ import annotations

import importlib.util
import os
import sys
from typing import Dict, List, Optional, Tuple

import numpy as np

from gmdx.refbridge import REFERENCE_ROOT
from gmdx.refbridge.parity import PARITY_VAE_CONFIG, psnr

RES = 32            # pixel resolution (latents 4x4 through the 4-block VAE)
BATCH = 2
VGG_RES = 64        # perceptual backbone resolution (integer 2x of RES so
                    # torch-nearest and exact-nearest indices coincide)
LORA_RANK = 4       # tiny-scale stand-in for the reference's r=64, alpha=r
QMAX = 49.0         # Stage-1 qmax (train_vqgan_lora.py:1133)
DISC_KW = dict(in_channels=3, cond_channels=0, hidden_channels=64, depth=4)

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


# -------------------------------------------------------------------------
# reference code loading
# -------------------------------------------------------------------------


def _load_ref_module(fname: str, needs_shim: bool = False):
    if needs_shim:
        from gmdx.refbridge.diffusers_shim import install_shim

        install_shim()
    path = os.path.join(REFERENCE_ROOT, "gm_diffusion", "stage1", fname)
    mod_name = f"gmdx_refbridge_stage1_{fname[:-3]}"
    if mod_name in sys.modules:
        return sys.modules[mod_name]
    spec = importlib.util.spec_from_file_location(mod_name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[mod_name] = mod
    spec.loader.exec_module(mod)
    return mod


def reference_ops():
    """The reference tone-mapping ops, loaded from the reference tree."""
    return _load_ref_module("tone_mapping.py")


def reference_discriminator_cls():
    return _load_ref_module("discriminator.py", needs_shim=True).Discriminator


# -------------------------------------------------------------------------
# torch stack + converters
# -------------------------------------------------------------------------


def make_stage1_torch_stack(seed: int = 0):
    """peft-wrapped VAE + reference Discriminator + VGG19, random init."""
    import torch
    from peft import LoraConfig, get_peft_model
    from torch import nn

    from gmdx.refbridge import torch_models

    torch.manual_seed(seed)
    vae = torch_models.AutoencoderKL(PARITY_VAE_CONFIG)
    vae.requires_grad_(False)
    # the reference targets every Conv2d/Linear (train_vqgan_lora.py:809-813)
    target_modules = [
        name
        for name, module in vae.named_modules()
        if isinstance(module, (nn.Conv2d, nn.Linear))
    ]
    lora_config = LoraConfig(
        target_modules=target_modules, r=LORA_RANK, lora_alpha=LORA_RANK,
        bias="none",
    )
    vae = get_peft_model(vae, lora_config)
    vae.decoder.conv_out.requires_grad_(True)  # :822

    disc = reference_discriminator_cls()(**DISC_KW)
    # Converge the spectral-norm power iteration so torch's per-forward
    # update and gmdx's per-D-step refresh agree at the fixed point.
    disc.train()
    with torch.no_grad():
        probe = torch.randn(1, 3, RES, RES)
        for _ in range(100):
            disc(probe)

    vgg = torch_models.VGG19Features()
    vgg.requires_grad_(False)
    vgg.eval()
    return {"vae": vae, "disc": disc, "vgg": vgg}


def _single_leaf_path(tree, prefix=()) -> Tuple[Tuple[str, ...], np.ndarray]:
    """The (path, leaf) of a tree containing exactly one array leaf."""
    if isinstance(tree, dict):
        items = list(tree.items())
        assert len(items) == 1, f"expected single branch, got {list(tree)}"
        k, v = items[0]
        return _single_leaf_path(v, prefix + (k,))
    return prefix, tree


def split_peft_state_dict(vae_peft):
    """peft state dict -> (clean base diffusers-keyed sd, lora sd)."""
    sd = {
        k: v.detach().cpu().numpy().copy()
        for k, v in vae_peft.get_base_model().state_dict().items()
    }
    base_sd, lora_sd = {}, {}
    for k, v in sd.items():
        if ".lora_A." in k or ".lora_B." in k:
            lora_sd[k] = v
        else:
            base_sd[k.replace(".base_layer.", ".")] = v
    return base_sd, lora_sd


def convert_peft_lora(base_sd, lora_sd) -> Dict:
    """peft lora_A/lora_B tensors -> the gmdx LoRA tree {path: {a, b}}.

    The flax path for each adapted kernel is discovered by probing the
    production VAE converter with that module's (zeroed) base weight — no
    re-implementation of the name mapping. Factor layouts follow
    gmdx/models/lora.py: Dense a=(in,r) b=(r,out); Conv a=(kh,kw,in,r)
    b=(1,1,r,out) (peft ships A=(r,in,kh,kw), B=(out,r,1,1))."""
    from gmdx.io.torch_import import convert_vae_state_dict

    lora: Dict = {}
    for key, value in lora_sd.items():
        mod, _, rest = key.partition(".lora_")
        which = rest[0]  # 'A' | 'B'
        base_w = base_sd[mod + ".weight"]
        probe = convert_vae_state_dict(
            {mod + ".weight": np.zeros(base_w.shape, np.float32)}
        )
        path, _ = _single_leaf_path(probe)
        if value.ndim == 4:
            factor = value.transpose(2, 3, 1, 0)  # -> (kh, kw, in, r)/(1,1,r,out)
        else:
            factor = value.T
        lora.setdefault(path, {})["a" if which == "A" else "b"] = factor
    return lora


def convert_discriminator(disc, flax_disc) -> Tuple[Dict, Dict]:
    """Reference (torch spectral-norm) discriminator -> flax params +
    batch_stats (power-iteration u and sigma)."""
    import jax
    import jax.numpy as jnp

    sd = {k: v.detach().cpu().numpy().copy()
          for k, v in disc.state_dict().items()}
    variables = flax_disc.init(
        jax.random.key(0), jnp.zeros((1, 3, RES, RES)), update_sn=False
    )
    params = jax.device_get(variables["params"])
    bstats = jax.device_get(variables["batch_stats"])

    depth = disc.config["depth"]
    conv_positions = [0] + [2 + 3 * i for i in range(depth - 1)]
    for j, ti in enumerate(conv_positions):
        w = sd[f"encoder.{ti}.weight_orig"]  # (out, in, kh, kw)
        params[f"conv_{j}"]["kernel"] = w.transpose(2, 3, 1, 0)
        params[f"conv_{j}"]["bias"] = sd[f"encoder.{ti}.bias"]
        u = sd[f"encoder.{ti}.weight_u"]  # (out,)
        w_mat = w.reshape(w.shape[0], -1)
        v = sd[f"encoder.{ti}.weight_v"]  # (in*kh*kw,)
        sigma = float(u @ (w_mat @ v))
        # flax stores u (1, out) + sigma per wrapped kernel under
        # batch_stats/SpectralNorm_*/{conv_name}/kernel/{u,sigma}
        for wrapper, slots in bstats.items():
            if f"conv_{j}/kernel/u" in slots:
                slots[f"conv_{j}/kernel/u"] = u[None, :].copy()
                slots[f"conv_{j}/kernel/sigma"] = np.asarray(
                    sigma, np.float32
                )
    params["shuffle"]["kernel"] = sd["shuffle.weight"].transpose(2, 3, 1, 0)
    params["shuffle"]["bias"] = sd["shuffle.bias"]
    return params, bstats


def gmdx_stage1_params_from_torch(stack) -> Dict:
    """All gmdx-side trees from the torch stack via production converters."""
    from gmdx.io.torch_import import (
        convert_vae_state_dict,
        convert_vgg19_state_dict,
    )
    from gmdx.models.discriminator import Discriminator as FlaxDisc

    base_sd, lora_sd = split_peft_state_dict(stack["vae"])
    vae_params = convert_vae_state_dict(base_sd)
    lora = convert_peft_lora(base_sd, lora_sd)
    disc_params, disc_vars = convert_discriminator(
        stack["disc"], FlaxDisc(**DISC_KW)
    )
    vgg_params = convert_vgg19_state_dict(
        {k: v.detach().cpu().numpy().copy()
         for k, v in stack["vgg"].state_dict().items()}
    )
    return {
        "vae": vae_params,
        "lora": lora,
        "conv_out": {
            "kernel": vae_params["decoder"]["conv_out"]["kernel"].copy(),
            "bias": vae_params["decoder"]["conv_out"]["bias"].copy(),
        },
        "disc": disc_params,
        "disc_vars": {"batch_stats": disc_vars},
        "vgg": vgg_params,
    }


# -------------------------------------------------------------------------
# shared inputs
# -------------------------------------------------------------------------


def make_stage1_inputs(seed: int, num_steps: int = 4) -> List[Dict]:
    import torch

    g = torch.Generator().manual_seed(seed)
    lat = (BATCH, PARITY_VAE_CONFIG.latent_channels, RES // 8, RES // 8)
    return [
        {
            "pixel_values": torch.rand((BATCH, 3, RES, RES), generator=g)
            * 2 - 1,
            "miss_pixel_values": torch.rand(
                (BATCH, 3, RES, RES), generator=g
            ) * 2 - 1,
            "encode_eps": torch.randn(lat, generator=g),
        }
        for _ in range(num_steps)
    ]


# -------------------------------------------------------------------------
# torch side: reference hot loop transcription
# -------------------------------------------------------------------------


def run_reference_stage1(
    stack,
    step_inputs: List[Dict],
    *,
    lr: float = 1e-4,
    disc_lr: float = 1e-4,
    max_grad_norm: float = 1.0,
    vae_loss: str = "l2",
    grad_accum: int = 1,
) -> List[Dict]:
    """Alternating generator/discriminator steps, reference cadence
    ``(i // grad_accum) % 2 == 0`` (train_vqgan_lora.py:1114). With
    ``grad_accum > 1`` this transcribes accelerate's accumulate() semantics
    (:1150,1199): zero_grad at window start, ``(loss/ga).backward()`` per
    micro-batch (accelerate scales the loss so accumulated grads are the
    window MEAN), clip + optimizer.step() only at the window end. Records
    per-micro-step scalars and the post-step trainable trees converted into
    gmdx layout for direct comparison; ``grad_norm`` only exists on sync
    records (it is the clipped ACCUMULATED norm there)."""
    import torch
    import torch.nn.functional as F

    ops = reference_ops()
    vae, disc, vgg = stack["vae"], stack["disc"], stack["vgg"]
    disc.train()  # reference trains D in train mode (u/v update per forward)

    mean = torch.tensor(IMAGENET_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(IMAGENET_STD).view(1, 3, 1, 1)

    def normalize(x):
        return (x - mean) / std

    def get_perceptual_loss(pixel_values, fmap):
        # train_vqgan_lora.py:113-129 (timm transform = resize + normalize)
        a = normalize(F.interpolate(pixel_values, VGG_RES))
        b = normalize(F.interpolate(fmap, VGG_RES))
        fa, fb = vgg(a), vgg(b)
        loss = F.mse_loss(fa[0], fb[0])
        for i in range(1, len(fa)):
            loss = loss + F.mse_loss(fa[i], fb[i])
        return loss / len(fa)

    def grad_layer_wrt_loss(loss, layer):  # :132-138
        return torch.autograd.grad(
            outputs=loss, inputs=layer,
            grad_outputs=torch.ones_like(loss), retain_graph=True,
        )[0].detach()

    def gradient_penalty(images, output, weight=10):  # :141-152
        gradients = torch.autograd.grad(
            outputs=output, inputs=images,
            grad_outputs=torch.ones(output.size()),
            create_graph=True, retain_graph=True, only_inputs=True,
        )[0]
        bsz = gradients.shape[0]
        gradients = torch.reshape(gradients, (bsz, -1))
        return weight * ((gradients.norm(2, dim=1) - 1) ** 2).mean()

    gen_params = [p for p in vae.parameters() if p.requires_grad]
    opt = torch.optim.AdamW(
        gen_params, lr=lr, betas=(0.9, 0.999), weight_decay=1e-2, eps=1e-8
    )
    dopt = torch.optim.AdamW(
        list(disc.parameters()), lr=disc_lr, betas=(0.9, 0.999),
        weight_decay=1e-2, eps=1e-8,
    )

    records = []
    for i, inp in enumerate(step_inputs):
        generator_step = (i // grad_accum) % 2 == 0
        window_start = i % grad_accum == 0
        window_end = (i + 1) % grad_accum == 0
        pixel_values = inp["pixel_values"]
        miss_pixel_values = inp["miss_pixel_values"]

        # :1121-1123 with injected posterior eps
        ld = vae.encode(miss_pixel_values).latent_dist
        sdr_latent = (ld.mean + ld.std * inp["encode_eps"]) * 0.18215
        fmap_gm = torch.sigmoid(vae.decode(sdr_latent / 0.18215).sample)
        sdr_image = (miss_pixel_values + 1) / 2
        target = (pixel_values + 1) / 2

        fmap_hdr = ops.apply_gm_to_sdr(gm=fmap_gm, sdr=sdr_image, qmax=QMAX)
        tmo = ops.gamut_compress(ops.fix_mulog_tmo(fmap_hdr, qmax=QMAX))

        rec: Dict = {"kind": "gen" if generator_step else "disc"}
        if generator_step:
            if window_start:
                opt.zero_grad(set_to_none=True)
            if vae_loss == "l2":  # :1149-1155
                loss = F.mse_loss(target, tmo)
            else:
                loss = F.l1_loss(target, tmo)
            perceptual_loss = get_perceptual_loss(target, tmo)
            gen_loss = -disc(tmo).mean()
            last_dec_layer = vae.decoder.conv_out.weight  # :1165 (base w)
            norm_p = grad_layer_wrt_loss(perceptual_loss, last_dec_layer).norm(p=2)
            norm_g = grad_layer_wrt_loss(gen_loss, last_dec_layer).norm(p=2)
            adaptive_weight = (norm_p / norm_g.clamp(min=1e-8)).clamp(max=1e4)
            rec.update(
                recon=float(loss.detach()),
                perceptual=float(perceptual_loss.detach()),
                adversarial=float(gen_loss.detach()),
                adaptive_weight=float(adaptive_weight),
            )
            loss = loss + perceptual_loss + adaptive_weight * gen_loss
            rec["loss"] = float(loss.detach())
            (loss / grad_accum).backward()
            if window_end:
                rec["grad_norm"] = float(
                    torch.nn.utils.clip_grad_norm_(
                        vae.parameters(), max_grad_norm
                    )
                )
                opt.step()
            base_sd, lora_sd = split_peft_state_dict(vae)
            rec["trainables"] = {
                "lora": convert_peft_lora(base_sd, lora_sd),
                "conv_out": {
                    "kernel": np.transpose(
                        base_sd["decoder.conv_out.weight"], (2, 3, 1, 0)
                    ),
                    "bias": base_sd["decoder.conv_out.bias"],
                },
            }
        else:
            if window_start:
                dopt.zero_grad(set_to_none=True)
            tmo = tmo.detach()  # :1199 tmo_fmap_hdr.detach_()
            target = target.clone().requires_grad_()
            real = disc(target)
            fake = disc(tmo)
            loss = (F.relu(1 + fake) + F.relu(1 - real)).mean()
            gp = gradient_penalty(target, real)
            rec.update(hinge=float(loss.detach()), gp=float(gp.detach()))
            loss = loss + gp
            rec["loss"] = float(loss.detach())
            (loss / grad_accum).backward()
            if window_end:
                rec["grad_norm"] = float(
                    torch.nn.utils.clip_grad_norm_(
                        disc.parameters(), max_grad_norm
                    )
                )
                dopt.step()
            from gmdx.models.discriminator import Discriminator as FlaxDisc

            disc_params, _ = convert_discriminator(disc, FlaxDisc(**DISC_KW))
            rec["disc_params"] = disc_params
        records.append(rec)
    return records


# -------------------------------------------------------------------------
# gmdx side: production train steps
# -------------------------------------------------------------------------


def run_gmdx_stage1(
    converted,
    step_inputs: List[Dict],
    *,
    lr: float = 1e-4,
    disc_lr: float = 1e-4,
    max_grad_norm: float = 1.0,
    vae_loss: str = "l2",
    grad_accum: int = 1,
) -> List[Dict]:
    import jax
    import jax.numpy as jnp

    from gmdx.models import AutoencoderKL
    from gmdx.models.discriminator import Discriminator as FlaxDisc
    from gmdx.models.lora import LoRAConfig
    from gmdx.models.vgg import VGG19Features
    from gmdx.ops import fix_mulog_tmo
    from gmdx.train.optim import make_adamw
    from gmdx.train.stage1 import (
        Stage1Config,
        Stage1State,
        make_disc_step,
        make_gen_step,
    )

    vae = AutoencoderKL(PARITY_VAE_CONFIG)
    disc = FlaxDisc(**DISC_KW)
    vgg = VGG19Features()
    config = Stage1Config(
        qmax=QMAX,
        vae_loss=vae_loss,
        lora=LoRAConfig(rank=LORA_RANK, alpha=float(LORA_RANK)),
        vgg_resolution=VGG_RES,
    )
    gen_opt = make_adamw(
        lambda _: lr, max_grad_norm=max_grad_norm, weight_decay=1e-2,
        epsilon=1e-8,
    )
    disc_opt = make_adamw(
        lambda _: disc_lr, max_grad_norm=max_grad_norm, weight_decay=1e-2,
        epsilon=1e-8,
    )
    if grad_accum > 1:
        # Production accumulation path (scripts/stage1/train_vqgan_lora.py):
        # MultiSteps means the window-mean gradient goes through the same
        # clip->AdamW chain the torch transcription applies at window end.
        import optax

        gen_opt = optax.MultiSteps(gen_opt, every_k_schedule=grad_accum)
        disc_opt = optax.MultiSteps(disc_opt, every_k_schedule=grad_accum)

    gen_step = make_gen_step(
        config, vae=vae, discriminator=disc, vgg=vgg,
        tmo_fn=fix_mulog_tmo, optimizer=gen_opt, donate=False,
    )
    disc_step = make_disc_step(
        config, vae=vae, discriminator=disc, tmo_fn=fix_mulog_tmo,
        optimizer=disc_opt, donate=False,
    )

    trainables = jax.tree.map(
        jnp.asarray, {"lora": converted["lora"], "conv_out": converted["conv_out"]}
    )
    disc_params = jax.tree.map(jnp.asarray, converted["disc"])
    state = Stage1State(
        trainables=trainables,
        disc_params=disc_params,
        disc_vars=jax.tree.map(jnp.asarray, converted["disc_vars"]),
        opt_state=gen_opt.init(trainables),
        disc_opt_state=disc_opt.init(disc_params),
        ema=None,
        step=jnp.zeros((), jnp.int32),
    )
    frozen = {
        "vae": jax.tree.map(jnp.asarray, converted["vae"]),
        "vgg": jax.tree.map(jnp.asarray, converted["vgg"]),
    }

    records = []
    key = jax.random.key(0)  # unused: eps is injected
    for i, inp in enumerate(step_inputs):
        batch = {
            "pixel_values": jnp.asarray(inp["pixel_values"].numpy()),
            "miss_pixel_values": jnp.asarray(
                inp["miss_pixel_values"].numpy()
            ),
            "encode_eps": jnp.asarray(inp["encode_eps"].numpy()),
        }
        if (i // grad_accum) % 2 == 0:
            state, metrics = gen_step(state, frozen, batch, key)
            records.append(
                {
                    "kind": "gen",
                    "loss": float(metrics["gen_loss"]),
                    "recon": float(metrics["recon"]),
                    "perceptual": float(metrics["perceptual"]),
                    "adversarial": float(metrics["adversarial"]),
                    "adaptive_weight": float(metrics["adaptive_weight"]),
                    "grad_norm": float(metrics["grad_norm"]),
                    "trainables": jax.device_get(state.trainables),
                }
            )
        else:
            state, metrics = disc_step(state, frozen, batch, key)
            records.append(
                {
                    "kind": "disc",
                    "loss": float(metrics["disc_loss"]),
                    "hinge": float(metrics["hinge"]),
                    "gp": float(metrics["gp"]),
                    "grad_norm": float(metrics["grad_norm"]),
                    "disc_params": jax.device_get(state.disc_params),
                }
            )
    return records


# -------------------------------------------------------------------------
# comparison
# -------------------------------------------------------------------------


def _tree_flat_psnr(a, b) -> float:
    import jax

    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    flat_a = np.concatenate([np.ravel(np.asarray(x)) for x in la])
    flat_b = np.concatenate([np.ravel(np.asarray(x)) for x in lb])
    return psnr(flat_a, flat_b)


def stage1_parity(
    seed: int = 0, num_steps: int = 4, grad_accum: int = 1
) -> Dict:
    stack = make_stage1_torch_stack(seed)
    converted = gmdx_stage1_params_from_torch(stack)
    inputs = make_stage1_inputs(seed + 1, num_steps=num_steps)
    ref = run_reference_stage1(stack, inputs, grad_accum=grad_accum)
    got = run_gmdx_stage1(converted, inputs, grad_accum=grad_accum)
    out = {"steps": []}
    # With accumulation the torch side only has a (window-accumulated)
    # grad_norm on sync records, while gmdx metrics report the per-micro-
    # batch norm — not comparable; compare it only in the ga=1 harness.
    scalar_keys = ("loss", "recon", "perceptual", "adversarial",
                   "adaptive_weight", "hinge", "gp") + (
        ("grad_norm",) if grad_accum == 1 else ()
    )
    for r, g in zip(ref, got):
        assert r["kind"] == g["kind"]
        rec = {"kind": r["kind"]}
        for k in scalar_keys:
            if k in r:
                rec[f"{k}_ref"] = r[k]
                rec[f"{k}_gmdx"] = g[k]
                rec[f"{k}_rel_err"] = abs(r[k] - g[k]) / max(abs(r[k]), 1e-12)
        if r["kind"] == "gen":
            rec["trainables_flat_psnr_db"] = _tree_flat_psnr(
                r["trainables"], g["trainables"]
            )
        else:
            rec["disc_params_flat_psnr_db"] = _tree_flat_psnr(
                r["disc_params"], g["disc_params"]
            )
        out["steps"].append(rec)
    return out


__all__ = [
    "make_stage1_torch_stack",
    "gmdx_stage1_params_from_torch",
    "make_stage1_inputs",
    "run_reference_stage1",
    "run_gmdx_stage1",
    "stage1_parity",
]
