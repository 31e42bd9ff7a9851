"""Generate the expected SD-1.5 checkpoint key+shape manifest.

Writes tests/goldens/sd15_manifest.json: the diffusers/transformers state
dict key space (name -> shape) for the full SD-1.5 components the reference
loads (scripts/inference/generate_hdr.py:115-142 pins the UNet config;
AutoencoderKL and CLIP ViT-L/14 come from the same checkpoint layout):

  * unet        — UNet2DConditionModel, in_channels 4 (and the 8-channel GM
                  variant differs only in conv_in.weight's dim 1)
  * vae         — AutoencoderKL (128,256,512,512)
  * text_encoder— transformers CLIPTextModel ViT-L/14 text tower
  * safety_checker — StableDiffusionSafetyChecker key space (CLIP ViT-L/14
                  vision tower + projection + concept embeds)

Sources of truth: gmdx.refbridge.torch_models (module tree reproduces
diffusers naming — proven by strict load_state_dict at tiny scale in
tests/test_parity_reference.py) instantiated on the torch *meta* device (no
memory), and transformers' real CLIP classes for the text/vision towers.
The gmdx export functions are NOT consulted here — that independence is the
point (tests/test_sd15_manifest.py compares them against this manifest).
"""

from __future__ import annotations

import json
import os
import sys

import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

OUT = os.path.join(
    os.path.dirname(__file__), "..", "..", "tests", "goldens",
    "sd15_manifest.json",
)


def shapes(module: torch.nn.Module, drop_buffers=()) -> dict:
    out = {}
    for k, v in module.state_dict().items():
        if any(k.endswith(b) for b in drop_buffers):
            continue
        out[k] = list(v.shape)
    return dict(sorted(out.items()))


def main() -> None:
    from transformers import CLIPTextConfig, CLIPTextModel
    from transformers import CLIPVisionConfig, CLIPVisionModel

    from gmdx.models.unet2d import SD15_UNET_CONFIG
    from gmdx.models.vae import SD15_VAE_CONFIG
    from gmdx.refbridge import torch_models

    with torch.device("meta"):
        unet = torch_models.UNet2DConditionModel(SD15_UNET_CONFIG)
        vae = torch_models.AutoencoderKL(SD15_VAE_CONFIG)
        # SD-1.5 text encoder: CLIP ViT-L/14 text tower.
        text = CLIPTextModel(CLIPTextConfig(
            vocab_size=49408, hidden_size=768, intermediate_size=3072,
            num_hidden_layers=12, num_attention_heads=12,
            max_position_embeddings=77, hidden_act="quick_gelu",
            projection_dim=768,
        ))
        # Safety checker: CLIP ViT-L/14 vision tower + projection + concept
        # embeds, under the StableDiffusionSafetyChecker prefixes.
        vision = CLIPVisionModel(CLIPVisionConfig(
            hidden_size=1024, intermediate_size=4096, num_hidden_layers=24,
            num_attention_heads=16, image_size=224, patch_size=14,
            projection_dim=768, hidden_act="quick_gelu",
        ))

    manifest = {
        "unet": shapes(unet),
        "vae": shapes(vae),
        "text_encoder": shapes(text),
    }
    sc = {}
    for k, v in shapes(vision).items():
        sc["vision_model." + k] = v
    sc["visual_projection.weight"] = [768, 1024]
    sc["concept_embeds"] = [17, 768]
    sc["special_care_embeds"] = [3, 768]
    sc["concept_embeds_weights"] = [17]
    sc["special_care_embeds_weights"] = [3]
    manifest["safety_checker"] = dict(sorted(sc.items()))

    with open(OUT, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    for name, m in manifest.items():
        n_params = sum(
            int(torch.tensor(s).prod()) if s else 1 for s in m.values()
        )
        print(f"{name}: {len(m)} tensors, {n_params/1e6:.1f}M params")
    print("wrote", os.path.normpath(OUT))


if __name__ == "__main__":
    main()
