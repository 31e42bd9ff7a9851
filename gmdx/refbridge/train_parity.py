"""Trainer-step parity: the reference PyTorch training math vs gmdx.

Round-1/2 parity work proved the *inference* loops (docs/PARITY_RESULTS.md);
this module proves the *training* step. The torch side transcribes the
reference hot loops verbatim at tiny scale — Stage 2 from
scripts/stage2/train_gm_unet.py:1141-1207 (VAE-encode both frames ×0.18215,
DDPM add_noise on the GM latents, 8-ch UNet ε-prediction, float MSE,
clip_grad_norm_(1.0), torch AdamW) — against gmdx's production pieces
(``gmdx.train.stage2.stage2_loss`` + ``make_optimizer``) with:

  * identical weights, shipped through the production converter
    (gmdx.io.torch_import) — the same path real SD-1.5 checkpoints take;
  * identical inputs: images, posterior-sampling eps, diffusion noise,
    timesteps, prompt embeddings (torch-generated, injected on both sides);
  * per-tensor comparison of loss, pre-clip gradients, and post-AdamW
    updated params (gradients/params mapped back to torch keys via
    ``export_unet_state_dict``).

Two consecutive steps are compared so Adam's bias correction (t=1, t=2) and
the second-step moment accumulation are both exercised.

The only divergence from the reference script is RNG *injection*: the
reference draws eps/noise/timesteps inline with torch RNG; here they are
drawn once (torch) and fed to both sides, which is exactly the latents=
injection strategy the inference parity gate uses (VERDICT.md round 1).

Torch-only tooling — never imported by the JAX runtime path.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import numpy as np

from gmdx.refbridge.parity import (
    CTX_DIM,
    PARITY_GM_UNET_CONFIG,
    PARITY_VAE_CONFIG,
    SEQ_LEN,
    psnr,
)

RES = 32  # pixel resolution; latents are RES/8 = 4x4 through the 4-block VAE
BATCH = 2


# -------------------------------------------------------------------------
# shared inputs
# -------------------------------------------------------------------------


def make_stage2_inputs(seed: int, num_steps: int = 2) -> List[Dict]:
    """Per-step input bundles, torch-generated, fed to BOTH sides."""
    import torch

    g = torch.Generator().manual_seed(seed)
    lat = (BATCH, 4, RES // 8, RES // 8)
    steps = []
    for _ in range(num_steps):
        steps.append(
            {
                # images in [-1, 1] like the dataloader output
                "sdr": torch.rand((BATCH, 3, RES, RES), generator=g) * 2 - 1,
                "gm": torch.rand((BATCH, 3, RES, RES), generator=g) * 2 - 1,
                "eps_sdr": torch.randn(lat, generator=g),
                "eps_gm": torch.randn(lat, generator=g),
                "noise": torch.randn(lat, generator=g),
                "offset_noise": torch.randn(
                    (BATCH, 4, 1, 1), generator=g
                ),
                "perturb_noise": torch.randn(lat, generator=g),
                "timesteps": torch.randint(
                    0, 1000, (BATCH,), generator=g
                ),
                "context": torch.randn(
                    (BATCH, SEQ_LEN, CTX_DIM), generator=g
                ),
            }
        )
    return steps


# -------------------------------------------------------------------------
# torch side: the reference loss + optimizer math, verbatim
# -------------------------------------------------------------------------


def run_reference_stage2(
    stack,
    step_inputs: List[Dict],
    *,
    lr: float = 1e-5,
    noise_offset: float = 0.0,
    input_perturbation: float = 0.0,
    max_grad_norm: float = 1.0,
    grad_accum: int = 1,
    dtype=None,
) -> List[Dict]:
    """Reference Stage-2 steps (train_gm_unet.py:1141-1207). Returns one
    record per step: loss, grad_norm, pre-clip grads and post-step params
    as torch-keyed numpy dicts. ``dtype=torch.float64`` turns this into the
    high-precision oracle used to separate fp32 roundoff from real
    divergence (pre-GroupNorm bias gradients cancel almost exactly, so
    their fp32 values are conditioning noise on ANY implementation).

    ``grad_accum > 1`` transcribes accelerate's accumulate() semantics
    (train_gm_unet.py:1202-1219): zero_grad at window start, ``(loss/ga)``
    backward per micro-batch (accelerate scales the loss so accumulated
    grads are the window mean), clip + optimizer step only at window end
    (``accelerator.sync_gradients``). Between syncs the record holds only
    the loss — params are untouched and are re-recorded for the
    frozen-inside-a-window assertion."""
    import torch

    vae = stack["vae"]
    unet = stack["gm_unet"]
    if dtype is not None:
        vae = vae.to(dtype)
        unet = unet.to(dtype)
        step_inputs = [
            {
                k: (v.to(dtype) if v.is_floating_point() else v)
                for k, v in inp.items()
            }
            for inp in step_inputs
        ]

    from gmdx.refbridge.torch_schedulers import DDPMScheduler
    vae.requires_grad_(False)  # train_gm_unet.py:785-789 freezes the VAE
    unet.requires_grad_(True)
    sched = DDPMScheduler()
    # torch AdamW with the reference's flag defaults (train_gm_unet.py:898-904)
    opt = torch.optim.AdamW(
        unet.parameters(), lr=lr, betas=(0.9, 0.999), weight_decay=1e-2,
        eps=1e-8,
    )
    records = []
    for idx, inp in enumerate(step_inputs):
        if idx % grad_accum == 0:
            opt.zero_grad(set_to_none=True)
        with torch.no_grad():
            # vae.encode(...).latent_dist.sample() * scaling_factor
            # (train_gm_unet.py:1156-1159) with injected posterior eps
            ld = vae.encode(inp["sdr"]).latent_dist
            sdr_latents = (ld.mean + ld.std * inp["eps_sdr"]) * 0.18215
            ld = vae.encode(inp["gm"]).latent_dist
            gm_latents = (ld.mean + ld.std * inp["eps_gm"]) * 0.18215

        gm_noise = inp["noise"].clone()
        if noise_offset:  # train_gm_unet.py:1164-1165
            gm_noise += noise_offset * inp["offset_noise"]
        if input_perturbation:  # :1166-1167
            new_gm_noise = gm_noise + input_perturbation * inp["perturb_noise"]
        timesteps = inp["timesteps"].long()
        noisy = sched.add_noise(
            gm_latents,
            new_gm_noise if input_perturbation else gm_noise,
            timesteps,
        )
        model_in = torch.cat([sdr_latents, noisy], dim=1)  # :1187
        pred = unet(model_in, timesteps, inp["context"], return_dict=False)[0]
        loss = torch.nn.functional.mse_loss(
            pred.float(), gm_noise.float(), reduction="mean"
        )  # ε-target, :1182-1192
        # accelerate.backward scales by 1/gradient_accumulation_steps
        (loss / grad_accum).backward()
        rec = {
            "loss": float(loss.detach()),
            "params": {
                k: p.detach().clone().numpy()
                for k, p in unet.named_parameters()
            },
        }
        if (idx + 1) % grad_accum == 0:  # accelerator.sync_gradients
            rec["grads"] = {
                k: p.grad.detach().clone().numpy()
                for k, p in unet.named_parameters()
            }
            rec["grad_norm"] = float(
                torch.linalg.vector_norm(
                    torch.stack(
                        [p.grad.detach().norm() for p in unet.parameters()]
                    )
                )
            )
            torch.nn.utils.clip_grad_norm_(unet.parameters(), max_grad_norm)
            opt.step()
            rec["params"] = {
                k: p.detach().clone().numpy()
                for k, p in unet.named_parameters()
            }
        records.append(rec)
    return records


# -------------------------------------------------------------------------
# gmdx side: production loss + optimizer with the same injected inputs
# -------------------------------------------------------------------------


def run_gmdx_stage2(
    params_unet,
    params_vae,
    step_inputs: List[Dict],
    *,
    lr: float = 1e-5,
    noise_offset: float = 0.0,
    input_perturbation: float = 0.0,
    max_grad_norm: float = 1.0,
    grad_accum: int = 1,
) -> List[Dict]:
    """gmdx Stage-2 steps via the production ``stage2_loss``/``make_optimizer``
    (gmdx/train/stage2.py), RNG draws replaced by the shared inputs.

    ``grad_accum > 1`` exercises the production optax.MultiSteps wrapper:
    between syncs ``updates`` is all-zeros (params recorded each micro-step
    to prove it); at sync the inner AdamW consumes the window-mean gradient
    — recorded as the mean of the per-micro-batch grads, which is exactly
    what MultiSteps' running mean hands the inner optimizer."""
    import jax
    import jax.numpy as jnp
    import optax

    from gmdx.io.torch_import import export_unet_state_dict
    from gmdx.models import AutoencoderKL, UNet2DConditionModel
    from gmdx.schedulers import DDPMScheduler
    from gmdx.train.stage2 import Stage2Config, make_optimizer, stage2_loss

    unet = UNet2DConditionModel(PARITY_GM_UNET_CONFIG)
    vae = AutoencoderKL(PARITY_VAE_CONFIG)
    config = Stage2Config(
        learning_rate=lr,
        noise_offset=noise_offset,
        input_perturbation=input_perturbation,
        max_grad_norm=max_grad_norm,
        gradient_accumulation_steps=grad_accum,
    )
    optimizer = make_optimizer(config)
    acp = DDPMScheduler().alphas_cumprod
    unet_apply = lambda p, *a: unet.apply({"params": p}, *a)

    def encode(images, eps):
        post = vae.apply({"params": params_vae}, images, method=vae.encode)
        return (post.mean + post.std * eps) * 0.18215

    params = params_unet
    opt_state = optimizer.init(params)
    records = []
    window_grads = []
    for idx, inp in enumerate(step_inputs):
        np_in = {k: jnp.asarray(v.numpy()) for k, v in inp.items()}
        sdr_latents = encode(np_in["sdr"], np_in["eps_sdr"])
        gm_latents = encode(np_in["gm"], np_in["eps_gm"])
        noise = np_in["noise"]
        if noise_offset:
            noise = noise + noise_offset * np_in["offset_noise"]
        perturbed = None
        if input_perturbation:
            perturbed = noise + input_perturbation * np_in["perturb_noise"]

        def loss_fn(p):
            return stage2_loss(
                unet_apply,
                p,
                sdr_latents=sdr_latents,
                gm_latents=gm_latents,
                encoder_hidden_states=np_in["context"],
                noise=noise,
                timesteps=np_in["timesteps"].astype(jnp.int32),
                alphas_cumprod=acp,
                config=config,
                perturbed_noise=perturbed,
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        window_grads.append(grads)
        rec = {
            "loss": float(loss),
            "params": export_unet_state_dict(jax.device_get(params)),
        }
        if (idx + 1) % grad_accum == 0:
            k = len(window_grads)
            mean_grads = jax.tree.map(
                lambda *g: sum(g) / k, *window_grads
            )
            window_grads = []
            rec["grads"] = export_unet_state_dict(
                jax.device_get(mean_grads)
            )
            rec["grad_norm"] = float(optax.global_norm(mean_grads))
        records.append(rec)
    return records


# -------------------------------------------------------------------------
# comparison
# -------------------------------------------------------------------------


def compare_tensor_dicts(
    ref: Dict[str, np.ndarray], got: Dict[str, np.ndarray]
) -> Tuple[float, str]:
    """Worst-case PSNR across matching keys. Key sets must be identical."""
    if set(ref) != set(got):
        missing = set(ref) ^ set(got)
        raise AssertionError(f"key mismatch: {sorted(missing)[:8]}")
    worst, worst_key = float("inf"), ""
    for k in ref:
        v = psnr(ref[k], got[k])
        if v < worst:
            worst, worst_key = v, k
    return worst, worst_key


def flat_psnr(
    ref: Dict[str, np.ndarray], got: Dict[str, np.ndarray]
) -> float:
    """PSNR over the concatenation of all tensors — the whole-gradient (or
    whole-parameter-vector) accuracy, immune to individual near-zero
    tensors whose own scale is pure cancellation noise."""
    a = np.concatenate([np.ravel(ref[k]) for k in sorted(ref)])
    b = np.concatenate([np.ravel(got[k]) for k in sorted(got)])
    return psnr(a, b)


def stage2_parity(
    seed: int = 0,
    *,
    noise_offset: float = 0.0,
    input_perturbation: float = 0.0,
    fp64_oracle: bool = True,
    grad_accum: int = 1,
    num_steps: int = 2,
) -> Dict:
    """Run both sides, return the comparison summary.

    With ``fp64_oracle`` a third run — the torch reference in float64 —
    anchors the comparison: for every gradient tensor we report the worst
    *deficit* of gmdx's fp32 accuracy (PSNR vs the fp64 oracle) below the
    torch fp32 run's own accuracy. A deficit near 0 dB means gmdx gradients
    are exactly as close to the true gradient as the reference's own fp32
    arithmetic — the strongest claim fp32 parity can make."""
    import torch

    from gmdx.refbridge.parity import gmdx_params_from_torch, make_torch_stack

    stack = make_torch_stack(seed)
    params = gmdx_params_from_torch(stack)
    inputs = make_stage2_inputs(seed + 1, num_steps=num_steps)
    kw = dict(
        noise_offset=noise_offset,
        input_perturbation=input_perturbation,
        grad_accum=grad_accum,
    )
    oracle = None
    if fp64_oracle:
        oracle = run_reference_stage2(
            make_torch_stack(seed), inputs, dtype=torch.float64, **kw
        )
    ref = run_reference_stage2(stack, inputs, **kw)
    got = run_gmdx_stage2(params["unet"], params["vae"], inputs, **kw)
    out = {"steps": []}
    for i, (r, g) in enumerate(zip(ref, got)):
        param_psnr, param_key = compare_tensor_dicts(r["params"], g["params"])
        rec = {
            "is_sync": "grads" in r,
            "loss_ref": r["loss"],
            "loss_gmdx": g["loss"],
            "loss_rel_err": abs(r["loss"] - g["loss"])
            / max(abs(r["loss"]), 1e-12),
            "param_flat_psnr_db": flat_psnr(r["params"], g["params"]),
            "param_psnr_db": param_psnr,
            "param_psnr_worst_key": param_key,
        }
        if "grads" in r:
            assert "grads" in g, "sync-boundary mismatch between sides"
            grad_psnr, grad_key = compare_tensor_dicts(
                r["grads"], g["grads"]
            )
            rec.update(
                grad_norm_ref=r["grad_norm"],
                grad_norm_gmdx=g["grad_norm"],
                grad_flat_psnr_db=flat_psnr(r["grads"], g["grads"]),
                grad_psnr_db=grad_psnr,
                grad_psnr_worst_key=grad_key,
            )
        if oracle is not None and "grads" in r:
            o = oracle[i]["grads"]
            worst_deficit, worst_key, floor_at_worst = float("inf"), "", 0.0
            min_floor, min_floor_key, torch_at_min = float("inf"), "", 0.0
            for k in o:
                torch_floor = psnr(o[k], r["grads"][k])
                gmdx_floor = psnr(o[k], g["grads"][k])
                deficit = gmdx_floor - torch_floor
                if deficit < worst_deficit:
                    worst_deficit = deficit
                    worst_key = k
                    floor_at_worst = torch_floor
                if gmdx_floor < min_floor:
                    min_floor = gmdx_floor
                    min_floor_key = k
                    torch_at_min = torch_floor
            rec["grad_vs_fp64_worst_deficit_db"] = worst_deficit
            rec["grad_vs_fp64_worst_key"] = worst_key
            rec["grad_vs_fp64_torch_floor_db"] = floor_at_worst
            rec["grad_vs_fp64_min_gmdx_floor_db"] = min_floor
            rec["grad_vs_fp64_min_floor_key"] = min_floor_key
            rec["grad_vs_fp64_torch_floor_at_min_db"] = torch_at_min
        out["steps"].append(rec)
    return out


__all__ = [
    "make_stage2_inputs",
    "run_reference_stage2",
    "run_gmdx_stage2",
    "compare_tensor_dicts",
    "stage2_parity",
]
