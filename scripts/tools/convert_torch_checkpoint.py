"""Convert checkpoints between diffusers/transformers and gmdx layouts.

Import: a diffusers SD-1.5 pipeline directory (unet/vae/text_encoder
subdirs holding *.safetensors) becomes a gmdx pipeline directory, so
reference users bring their trained weights across with one command.
Export: a gmdx pipeline directory becomes diffusers-layout state dicts
(diffusion_pytorch_model.safetensors / model.safetensors) consumable by the
reference's torch stack.

    python scripts/tools/convert_torch_checkpoint.py import \
        --src /path/to/sd15-diffusers --dst ./pipe_gmdx
    python scripts/tools/convert_torch_checkpoint.py export \
        --src ./pipe_gmdx --dst ./sd15-diffusers
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def _find_safetensors(subdir: str):
    cands = sorted(glob.glob(os.path.join(subdir, "*.safetensors")))
    return cands[0] if cands else None


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
    from gmdx.models import (
        CLIP_VIT_L_VISION_CONFIG,
        SD15_UNET_CONFIG,
        SD15_VAE_CONFIG,
        UNetConfig,
    )
    from gmdx.models.clip_text import CLIP_VIT_L_CONFIG
    from gmdx.schedulers import PNDMScheduler

    os.makedirs(dst, exist_ok=True)
    components = []

    import dataclasses

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

    def _leaves(tree):
        for v in tree.values():
            if isinstance(v, dict):
                yield from _leaves(v)
            else:
                yield v

    for name, conv, cfg_default, cls in (
        ("unet", convert_unet_state_dict, SD15_UNET_CONFIG, "UNet2DConditionModel"),
        ("gm_unet", convert_unet_state_dict, None, "UNet2DConditionModel"),
        ("vae", convert_vae_state_dict, SD15_VAE_CONFIG, "AutoencoderKL"),
        ("text_encoder", convert_clip_text_state_dict, CLIP_VIT_L_CONFIG,
         "CLIPTextModel"),
        ("safety_checker", convert_safety_checker_state_dict,
         CLIP_VIT_L_VISION_CONFIG, "StableDiffusionSafetyChecker"),
    ):
        sub = os.path.join(src, name)
        st_path = _find_safetensors(sub) if os.path.isdir(sub) else None
        if st_path is None:
            if cfg_default is not None and name != "gm_unet":
                print(f"{name}: not found in {src}, skipped")
            continue
        tree = conv(load_torch_safetensors(st_path))
        cfg = cfg_default
        if name in ("unet", "gm_unet"):
            # Read in_channels from the converted conv_in kernel (HWIO).
            c_in = tree["conv_in"]["kernel"].shape[2]
            cfg = UNetConfig(in_channels=int(c_in))
        write(name, tree, cfg, cls)

    # Tokenizer: copy vocab/merges when present.
    tok_src = os.path.join(src, "tokenizer")
    if os.path.isdir(tok_src):
        from gmdx.models import CLIPTokenizer

        tok = CLIPTokenizer.from_pretrained(tok_src)
        save_tokenizer(os.path.join(dst, "tokenizer"), tok)
        components.append("tokenizer")
    save_scheduler(os.path.join(dst, "scheduler"), PNDMScheduler())
    components.append("scheduler")
    with open(os.path.join(dst, "model_index.json"), "w") as f:
        json.dump({"components": sorted(components)}, f, indent=2)
    print(f"imported -> {dst} ({sorted(components)})")


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
        "unet": (export_unet_state_dict, "diffusion_pytorch_model.safetensors"),
        "gm_unet": (export_unet_state_dict, "diffusion_pytorch_model.safetensors"),
        "vae": (export_vae_state_dict, "diffusion_pytorch_model.safetensors"),
        "text_encoder": (export_clip_text_state_dict, "model.safetensors"),
        "safety_checker": (export_safety_checker_state_dict, "model.safetensors"),
    }
    for name, params in bundle["params"].items():
        if name not in exporters:
            print(f"{name}: no exporter, skipped")
            continue
        conv, fname = exporters[name]
        out = os.path.join(dst, name)
        os.makedirs(out, exist_ok=True)
        save_file(conv(params), os.path.join(out, fname))
        print(f"{name} -> {out}/{fname}")
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
