"""Pipeline directory save/load — the gmdx checkpoint layout.

Mirrors the diffusers pipeline directory the reference saves/loads
(train_gm_unet.py:1283-1295 saves a complete StableDiffusionGMPipeline;
generate_hdr.py:152-176 loads per-component), with safetensors weights and
JSON dataclass configs:

    pipeline_dir/
      model_index.json                 # which components exist
      unet/config.json + params.safetensors
      gm_unet/config.json + params.safetensors     (dual pipelines)
      vae/config.json + params.safetensors
      text_encoder/config.json + params.safetensors
      tokenizer/vocab.json + merges.txt
      scheduler/config.json
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict

from gmdx.io.params import load_params, save_params


def _write_json(path: str, obj) -> None:
    with open(path, "w") as f:
        json.dump(obj, f, indent=2)


def _read_json(path: str):
    with open(path) as f:
        return json.load(f)


def save_component(dirpath: str, config, params, class_name: str) -> None:
    os.makedirs(dirpath, exist_ok=True)
    cfg = dataclasses.asdict(config) if dataclasses.is_dataclass(config) else dict(config)
    cfg["_class_name"] = class_name
    _write_json(os.path.join(dirpath, "config.json"), cfg)
    save_params(os.path.join(dirpath, "params.safetensors"), params)


def save_tokenizer(dirpath: str, tokenizer) -> None:
    os.makedirs(dirpath, exist_ok=True)
    _write_json(os.path.join(dirpath, "vocab.json"), tokenizer.encoder)
    merges = sorted(tokenizer.bpe_ranks.items(), key=lambda kv: kv[1])
    with open(os.path.join(dirpath, "merges.txt"), "w", encoding="utf-8") as f:
        f.write("#version: gmdx\n")
        for (a, b), _rank in merges:
            f.write(f"{a} {b}\n")


def save_scheduler(dirpath: str, scheduler) -> None:
    os.makedirs(dirpath, exist_ok=True)
    cfg = dataclasses.asdict(scheduler.config)
    # Constructor extras living outside SchedulerConfig (DPM solver order,
    # DDPM variance type, ...).
    for extra in (
        "variance_type",
        "solver_order",
        "lower_order_final",
        "use_karras_sigmas",
        "final_sigmas_type",
        "original_inference_steps",
        "timestep_scaling",
        "sigma_data",
    ):
        if hasattr(scheduler, extra):
            cfg[extra] = getattr(scheduler, extra)
    cfg["_class_name"] = type(scheduler).__name__
    _write_json(os.path.join(dirpath, "config.json"), cfg)


def save_pipeline(
    path: str,
    *,
    components: Dict[str, tuple],  # name -> (module_or_config, params)
    tokenizer=None,
    scheduler=None,
) -> None:
    """``components`` maps subdir name to (flax module with .config, params)."""
    os.makedirs(path, exist_ok=True)
    index = {"components": sorted(components.keys())}
    for name, (module, params) in components.items():
        save_component(
            os.path.join(path, name),
            module.config,
            params,
            type(module).__name__,
        )
    if tokenizer is not None:
        save_tokenizer(os.path.join(path, "tokenizer"), tokenizer)
        index["components"].append("tokenizer")
    if scheduler is not None:
        save_scheduler(os.path.join(path, "scheduler"), scheduler)
        index["components"].append("scheduler")
    _write_json(os.path.join(path, "model_index.json"), index)


def _build_module(cfg: dict):
    """Instantiate the right module + config dataclass from a config.json."""
    class_name = cfg.pop("_class_name")
    if class_name == "UNet2DConditionModel":
        from gmdx.models import UNet2DConditionModel, UNetConfig

        for k in ("block_out_channels", "down_block_types", "up_block_types"):
            if k in cfg:
                cfg[k] = tuple(cfg[k])
        return UNet2DConditionModel(UNetConfig(**cfg))
    if class_name == "AutoencoderKL":
        from gmdx.models import AutoencoderKL, VAEConfig

        if "block_out_channels" in cfg:
            cfg["block_out_channels"] = tuple(cfg["block_out_channels"])
        return AutoencoderKL(VAEConfig(**cfg))
    if class_name == "CLIPTextModel":
        from gmdx.models import CLIPTextModel
        from gmdx.models.clip_text import CLIPTextConfig

        return CLIPTextModel(CLIPTextConfig(**cfg))
    if class_name == "StableDiffusionSafetyChecker":
        from gmdx.models import CLIPVisionConfig, StableDiffusionSafetyChecker

        return StableDiffusionSafetyChecker(CLIPVisionConfig(**cfg))
    if class_name == "ControlNetModel":
        from gmdx.models import ControlNetModel
        from gmdx.models.controlnet import ControlNetConfig
        from gmdx.models.unet2d import UNetConfig

        ucfg = dict(cfg.pop("unet"))
        for k in ("block_out_channels", "down_block_types", "up_block_types"):
            if k in ucfg:
                ucfg[k] = tuple(ucfg[k])
        cfg["conditioning_embedding_channels"] = tuple(
            cfg["conditioning_embedding_channels"]
        )
        return ControlNetModel(
            ControlNetConfig(unet=UNetConfig(**ucfg), **cfg)
        )
    raise ValueError(f"unknown component class {class_name!r}")


def load_component(dirpath: str):
    cfg = _read_json(os.path.join(dirpath, "config.json"))
    module = _build_module(cfg)
    params = load_params(os.path.join(dirpath, "params.safetensors"))
    return module, params


def load_scheduler(dirpath: str):
    from gmdx.schedulers import SCHEDULERS

    cfg = _read_json(os.path.join(dirpath, "config.json"))
    class_name = cfg.pop("_class_name")
    by_class = {
        "DDPMScheduler": "ddpm",
        "DDIMScheduler": "ddim",
        "PNDMScheduler": "pndm",
        "DPMSolverMultistepScheduler": "dpm++",
        "LCMScheduler": "lcm",
    }
    return SCHEDULERS[by_class[class_name]](**cfg)


def load_pipeline(path: str) -> Dict[str, Any]:
    """Load every component present; returns
    {"modules": {name: module}, "params": {name: tree},
     "tokenizer": ..., "scheduler": ...}."""
    index = _read_json(os.path.join(path, "model_index.json"))
    modules: Dict[str, Any] = {}
    params: Dict[str, Any] = {}
    tokenizer = None
    scheduler = None
    for name in index["components"]:
        sub = os.path.join(path, name)
        if name == "tokenizer":
            from gmdx.models import CLIPTokenizer

            tokenizer = CLIPTokenizer.from_pretrained(sub)
        elif name == "scheduler":
            scheduler = load_scheduler(sub)
        else:
            modules[name], params[name] = load_component(sub)
    return {
        "modules": modules,
        "params": params,
        "tokenizer": tokenizer,
        "scheduler": scheduler,
    }


__all__ = [
    "save_pipeline",
    "load_pipeline",
    "save_component",
    "load_component",
    "save_tokenizer",
    "save_scheduler",
    "load_scheduler",
]
