"""Convert checkpoints between diffusers/transformers and gmdx layouts.

Import: a diffusers SD-1.5 pipeline directory (unet/vae/text_encoder/
safety_checker subdirs holding *.safetensors + config.json) becomes a gmdx
pipeline directory — component configs and the scheduler config are
translated, not assumed, so non-default-sized checkpoints (different block
widths, v-prediction schedules, LCM-distilled models) come across intact.
Export: a gmdx pipeline directory becomes a diffusers-layout directory with
per-component config.json + model_index.json + scheduler config, loadable
by the reference's torch stack (diffusers ``from_pretrained``).

    python scripts/tools/convert_torch_checkpoint.py import \
        --src /path/to/sd15-diffusers --dst ./pipe_gmdx
    python scripts/tools/convert_torch_checkpoint.py export \
        --src ./pipe_gmdx --dst ./sd15-diffusers
"""

from __future__ import annotations

import argparse
import dataclasses
import glob
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

_SCHED_CLASSES = (
    "PNDMScheduler",
    "DDIMScheduler",
    "DDPMScheduler",
    "DPMSolverMultistepScheduler",
    "LCMScheduler",
)


def _find_safetensors(subdir: str):
    """Pick the full-precision weight file; 'fp16'/'bf16' variant files sort
    lexicographically before the plain name and must not shadow it."""
    cands = sorted(glob.glob(os.path.join(subdir, "*.safetensors")))
    if not cands:
        return None
    plain = [c for c in cands if ".fp16." not in c and ".bf16." not in c
             and ".non_ema." not in c]
    return (plain or cands)[0]


def _read_json(path: str):
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def _pick(src: dict, mapping: dict) -> dict:
    """{diffusers_key: gmdx_field} for every key present in src."""
    out = {}
    for k, field in mapping.items():
        if src and k in src and src[k] is not None:
            v = src[k]
            out[field] = tuple(v) if isinstance(v, list) else v
    return out


def _unet_config(src_cfg: dict | None, tree) -> "UNetConfig":
    from gmdx.models import UNetConfig

    kw = _pick(src_cfg or {}, {
        "out_channels": "out_channels",
        "block_out_channels": "block_out_channels",
        "layers_per_block": "layers_per_block",
        "cross_attention_dim": "cross_attention_dim",
        "down_block_types": "down_block_types",
        "up_block_types": "up_block_types",
        "sample_size": "sample_size",
    })
    # SD-1.5's pinned config stores the head COUNT under attention_head_dim
    # (the historical diffusers quirk the reference's config surgery works
    # around — generate_hdr.py:99-113); prefer num_attention_heads if set.
    heads = (src_cfg or {}).get("num_attention_heads") or (
        src_cfg or {}
    ).get("attention_head_dim")
    if isinstance(heads, int):
        kw["num_attention_heads"] = heads
    # in_channels always from the converted conv_in kernel (HWIO) — it is
    # what the params actually are (8-ch GM UNets).
    kw["in_channels"] = int(tree["conv_in"]["kernel"].shape[2])
    return UNetConfig(**kw)


def _vae_config(src_cfg: dict | None) -> "VAEConfig":
    from gmdx.models import VAEConfig

    return VAEConfig(**_pick(src_cfg or {}, {
        "in_channels": "in_channels",
        "out_channels": "out_channels",
        "block_out_channels": "block_out_channels",
        "layers_per_block": "layers_per_block",
        "latent_channels": "latent_channels",
        "scaling_factor": "scaling_factor",
        "sample_size": "sample_size",
    }))


def _clip_config(src_cfg: dict | None) -> "CLIPTextConfig":
    from gmdx.models.clip_text import CLIPTextConfig

    return CLIPTextConfig(**_pick(src_cfg or {}, {
        "vocab_size": "vocab_size",
        "hidden_size": "hidden_size",
        "num_hidden_layers": "num_layers",
        "num_attention_heads": "num_heads",
        "intermediate_size": "intermediate_size",
        "max_position_embeddings": "max_position_embeddings",
        "layer_norm_eps": "layer_norm_eps",
    }))


def _vision_config(src_cfg: dict | None) -> "CLIPVisionConfig":
    from gmdx.models import CLIPVisionConfig

    vision = (src_cfg or {}).get("vision_config") or {}
    kw = _pick(vision, {
        "image_size": "image_size",
        "patch_size": "patch_size",
        "hidden_size": "hidden_size",
        "num_hidden_layers": "num_layers",
        "num_attention_heads": "num_heads",
        "intermediate_size": "intermediate_size",
        "projection_dim": "projection_dim",
        "layer_norm_eps": "layer_norm_eps",
    })
    if "projection_dim" not in kw and src_cfg and "projection_dim" in src_cfg:
        kw["projection_dim"] = src_cfg["projection_dim"]
    return CLIPVisionConfig(**kw)


def _import_scheduler(src: str):
    """Translate the source scheduler config; warn + default when unknown."""
    from gmdx.schedulers import SCHEDULERS, PNDMScheduler
    from gmdx.schedulers.base import SchedulerConfig

    cfg = _read_json(os.path.join(src, "scheduler", "scheduler_config.json"))
    if cfg is None:
        cfg = _read_json(os.path.join(src, "scheduler", "config.json"))
    if cfg is None:
        print("scheduler: no config in source, defaulting to PNDM")
        return PNDMScheduler()
    cls = cfg.get("_class_name", "PNDMScheduler")
    by_class = {
        "PNDMScheduler": "pndm",
        "DDIMScheduler": "ddim",
        "DDPMScheduler": "ddpm",
        "DPMSolverMultistepScheduler": "dpm++",
        "LCMScheduler": "lcm",
    }
    base_fields = {f.name for f in dataclasses.fields(SchedulerConfig)}
    extras_by_class = {
        "DDPMScheduler": {"variance_type"},
        "DPMSolverMultistepScheduler": {
            "solver_order", "lower_order_final", "use_karras_sigmas",
            "final_sigmas_type",
        },
        "LCMScheduler": {
            "original_inference_steps", "timestep_scaling", "sigma_data",
        },
    }
    if cls not in by_class:
        print(f"scheduler: unknown class {cls!r}, defaulting to PNDM "
              "(re-check prediction_type/beta schedule manually)")
        return PNDMScheduler(**{
            k: v for k, v in cfg.items() if k in base_fields
        })
    allowed = base_fields | extras_by_class.get(cls, set())
    kw = {k: v for k, v in cfg.items() if k in allowed}
    return SCHEDULERS[by_class[cls]](**kw)


def do_import(src: str, dst: str) -> None:
    import numpy as np

    from gmdx.io.params import save_params
    from gmdx.io.pipeline import save_scheduler, save_tokenizer
    from gmdx.io.torch_import import (
        convert_clip_text_state_dict,
        convert_safety_checker_state_dict,
        convert_unet_state_dict,
        convert_vae_state_dict,
        load_torch_safetensors,
    )

    os.makedirs(dst, exist_ok=True)
    components = []

    def _leaves(tree):
        for v in tree.values():
            if isinstance(v, dict):
                yield from _leaves(v)
            else:
                yield v

    def write(name, tree, config, class_name):
        out = os.path.join(dst, name)
        os.makedirs(out, exist_ok=True)
        cfg = dataclasses.asdict(config)
        cfg["_class_name"] = class_name
        with open(os.path.join(out, "config.json"), "w") as f:
            json.dump(cfg, f, indent=2)
        save_params(os.path.join(out, "params.safetensors"), tree)
        components.append(name)
        n = sum(np.asarray(x).size for x in _leaves(tree))
        print(f"{name}: {n / 1e6:.1f}M params")

    for name, conv, make_cfg, cls in (
        ("unet", convert_unet_state_dict, _unet_config,
         "UNet2DConditionModel"),
        ("gm_unet", convert_unet_state_dict, _unet_config,
         "UNet2DConditionModel"),
        ("vae", convert_vae_state_dict, lambda c, t: _vae_config(c),
         "AutoencoderKL"),
        ("text_encoder", convert_clip_text_state_dict,
         lambda c, t: _clip_config(c), "CLIPTextModel"),
        ("safety_checker", convert_safety_checker_state_dict,
         lambda c, t: _vision_config(c), "StableDiffusionSafetyChecker"),
    ):
        sub = os.path.join(src, name)
        st_path = _find_safetensors(sub) if os.path.isdir(sub) else None
        if st_path is None:
            if name != "gm_unet" and name != "safety_checker":
                print(f"{name}: not found in {src}, skipped")
            continue
        tree = conv(load_torch_safetensors(st_path))
        src_cfg = _read_json(os.path.join(sub, "config.json"))
        write(name, tree, make_cfg(src_cfg, tree), cls)

    # Tokenizer: copy vocab/merges when present.
    tok_src = os.path.join(src, "tokenizer")
    if os.path.isdir(tok_src):
        from gmdx.models import CLIPTokenizer

        tok = CLIPTokenizer.from_pretrained(tok_src)
        save_tokenizer(os.path.join(dst, "tokenizer"), tok)
        components.append("tokenizer")
    save_scheduler(os.path.join(dst, "scheduler"), _import_scheduler(src))
    components.append("scheduler")
    with open(os.path.join(dst, "model_index.json"), "w") as f:
        json.dump({"components": sorted(components)}, f, indent=2)
    print(f"imported -> {dst} ({sorted(components)})")


# ---------------------------------------------------------------------------
# Export: gmdx -> diffusers layout (weights + configs diffusers can load).
# ---------------------------------------------------------------------------


def _unet_diffusers_config(cfg) -> dict:
    return {
        "_class_name": "UNet2DConditionModel",
        "in_channels": cfg.in_channels,
        "out_channels": cfg.out_channels,
        "block_out_channels": list(cfg.block_out_channels),
        "layers_per_block": cfg.layers_per_block,
        # SD-1.5 quirk preserved: head count under attention_head_dim.
        "attention_head_dim": cfg.num_attention_heads,
        "cross_attention_dim": cfg.cross_attention_dim,
        "down_block_types": list(cfg.down_block_types),
        "up_block_types": list(cfg.up_block_types),
        "sample_size": cfg.sample_size,
        "act_fn": "silu",
        "norm_num_groups": 32,
        "norm_eps": 1e-05,
        "center_input_sample": False,
        "downsample_padding": 1,
        "flip_sin_to_cos": True,
        "freq_shift": 0,
        "mid_block_scale_factor": 1,
    }


def _vae_diffusers_config(cfg) -> dict:
    n = len(cfg.block_out_channels)
    return {
        "_class_name": "AutoencoderKL",
        "in_channels": cfg.in_channels,
        "out_channels": cfg.out_channels,
        "block_out_channels": list(cfg.block_out_channels),
        "layers_per_block": cfg.layers_per_block,
        "latent_channels": cfg.latent_channels,
        "scaling_factor": cfg.scaling_factor,
        "sample_size": cfg.sample_size,
        "down_block_types": ["DownEncoderBlock2D"] * n,
        "up_block_types": ["UpDecoderBlock2D"] * n,
        "act_fn": "silu",
        "norm_num_groups": 32,
    }


def _clip_transformers_config(cfg) -> dict:
    return {
        "architectures": ["CLIPTextModel"],
        "model_type": "clip_text_model",
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "intermediate_size": cfg.intermediate_size,
        "max_position_embeddings": cfg.max_position_embeddings,
        "layer_norm_eps": cfg.layer_norm_eps,
        "hidden_act": "quick_gelu",
    }


def _checker_transformers_config(cfg) -> dict:
    return {
        "architectures": ["StableDiffusionSafetyChecker"],
        "model_type": "clip",
        "projection_dim": cfg.projection_dim,
        "vision_config": {
            "model_type": "clip_vision_model",
            "image_size": cfg.image_size,
            "patch_size": cfg.patch_size,
            "hidden_size": cfg.hidden_size,
            "num_hidden_layers": cfg.num_layers,
            "num_attention_heads": cfg.num_heads,
            "intermediate_size": cfg.intermediate_size,
            "projection_dim": cfg.projection_dim,
            "layer_norm_eps": cfg.layer_norm_eps,
            "hidden_act": "quick_gelu",
        },
    }


def _export_scheduler_config(sched) -> dict:
    cfg = dataclasses.asdict(sched.config)
    for extra in (
        "variance_type", "solver_order", "lower_order_final",
        "use_karras_sigmas", "final_sigmas_type",
        "original_inference_steps", "timestep_scaling", "sigma_data",
    ):
        if hasattr(sched, extra):
            cfg[extra] = getattr(sched, extra)
    cfg["_class_name"] = type(sched).__name__
    return cfg


def do_export(src: str, dst: str) -> None:
    from safetensors.numpy import save_file

    from gmdx.io.pipeline import load_pipeline
    from gmdx.io.torch_import import (
        export_clip_text_state_dict,
        export_safety_checker_state_dict,
        export_unet_state_dict,
        export_vae_state_dict,
    )

    bundle = load_pipeline(src)
    exporters = {
        "unet": (export_unet_state_dict,
                 "diffusion_pytorch_model.safetensors", _unet_diffusers_config),
        "gm_unet": (export_unet_state_dict,
                    "diffusion_pytorch_model.safetensors", _unet_diffusers_config),
        "vae": (export_vae_state_dict,
                "diffusion_pytorch_model.safetensors", _vae_diffusers_config),
        "text_encoder": (export_clip_text_state_dict,
                         "model.safetensors", _clip_transformers_config),
        "safety_checker": (export_safety_checker_state_dict,
                           "model.safetensors", _checker_transformers_config),
    }
    index = {
        "_class_name": "StableDiffusionPipeline",
        "_diffusers_version": "0.27.0",
    }
    for name, params in bundle["params"].items():
        if name not in exporters:
            print(f"{name}: no exporter, skipped")
            continue
        conv, fname, cfg_fn = exporters[name]
        out = os.path.join(dst, name)
        os.makedirs(out, exist_ok=True)
        save_file(conv(params), os.path.join(out, fname))
        with open(os.path.join(out, "config.json"), "w") as f:
            json.dump(cfg_fn(bundle["modules"][name].config), f, indent=2)
        lib = "diffusers" if fname.startswith("diffusion") else "transformers"
        cls = ("UNet2DConditionModel" if "unet" in name else
               "AutoencoderKL" if name == "vae" else
               "CLIPTextModel" if name == "text_encoder" else
               "StableDiffusionSafetyChecker")
        index[name] = [lib, cls]
        print(f"{name} -> {out}/{fname}")
    if bundle.get("scheduler") is not None:
        out = os.path.join(dst, "scheduler")
        os.makedirs(out, exist_ok=True)
        with open(os.path.join(out, "scheduler_config.json"), "w") as f:
            json.dump(_export_scheduler_config(bundle["scheduler"]), f, indent=2)
        index["scheduler"] = ["diffusers",
                              type(bundle["scheduler"]).__name__]
        print(f"scheduler -> {out}/scheduler_config.json")
    tok_src = os.path.join(src, "tokenizer")
    if os.path.isdir(tok_src):
        out = os.path.join(dst, "tokenizer")
        os.makedirs(out, exist_ok=True)
        for fn in ("vocab.json", "merges.txt"):
            p = os.path.join(tok_src, fn)
            if os.path.exists(p):
                shutil.copy(p, os.path.join(out, fn))
        index["tokenizer"] = ["transformers", "CLIPTokenizer"]
        print(f"tokenizer -> {out}")
    with open(os.path.join(dst, "model_index.json"), "w") as f:
        json.dump(index, f, indent=2)
    print(f"exported -> {dst}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("direction", choices=["import", "export"])
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    args = p.parse_args()
    if args.direction == "import":
        do_import(args.src, args.dst)
    else:
        do_export(args.src, args.dst)


if __name__ == "__main__":
    main()
