"""Import PyTorch SD-1.5 checkpoints (diffusers/transformers layout) into
gmdx Flax param trees.

The reference loads its weights via diffusers ``from_pretrained``
(scripts/inference/generate_hdr.py:152-164, train_gm_unet.py:756-781). This
module is the clean-room equivalent: read the ``*.safetensors`` state dicts
and remap key names + tensor layouts:

  * Linear:    torch (out, in)        -> flax (in, out)
  * Conv2d:    torch (out, in, kh, kw) -> flax (kh, kw, in, out)  [HWIO]
  * Norms:     weight -> scale
  * Embedding: weight -> embedding

Covers the UNet2DConditionModel, AutoencoderKL, and CLIPTextModel key spaces
for the SD-1.5 architecture gmdx pins (SURVEY.md §2.2). Unknown source keys
raise (no silent drops) so a mismatched checkpoint fails loudly.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _linear(w: np.ndarray) -> np.ndarray:
    if w.ndim == 4:  # 1x1-conv-as-linear in old VAE attention checkpoints
        w = w[:, :, 0, 0]
    return np.ascontiguousarray(w.T)


def _conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _set(tree: Dict, path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


_NORM_PARAM = {"weight": "scale", "bias": "bias"}
_LINEAR_PARAM = {"weight": "kernel", "bias": "bias"}


def _convert_resnet(rest: str, value: np.ndarray, out: Dict, prefix: str) -> bool:
    """diffusers resnet subkeys -> gmdx ResnetBlock2D names."""
    mod, _, param = rest.partition(".")
    if mod in ("norm1", "norm2"):
        _set(out, f"{prefix}/{mod}/norm/{_NORM_PARAM[param]}", value)
    elif mod in ("conv1", "conv2", "conv_shortcut"):
        v = _conv(value) if param == "weight" else value
        _set(out, f"{prefix}/{mod}/{_LINEAR_PARAM[param]}", v)
    elif mod == "time_emb_proj":
        v = _linear(value) if param == "weight" else value
        _set(out, f"{prefix}/time_emb_proj/{_LINEAR_PARAM[param]}", v)
    else:
        return False
    return True


def _convert_transformer2d(rest: str, value: np.ndarray, out: Dict, prefix: str) -> bool:
    """diffusers Transformer2DModel subkeys -> gmdx Transformer2D names."""
    if rest.startswith("norm."):
        param = rest.split(".")[-1]
        _set(out, f"{prefix}/norm/norm/{_NORM_PARAM[param]}", value)
        return True
    for proj in ("proj_in", "proj_out"):
        if rest.startswith(proj + "."):
            param = rest.split(".")[-1]
            # SD-1.5 uses 1x1 convs for the spatial projections.
            v = value
            if param == "weight":
                v = _conv(value) if value.ndim == 4 else _linear(value).reshape(
                    1, 1, *value.T.shape
                )
            _set(out, f"{prefix}/{proj}/{_LINEAR_PARAM[param]}", v)
            return True
    if rest.startswith("transformer_blocks."):
        _, d, sub = rest.split(".", 2)
        bp = f"{prefix}/blocks_{d}"
        mod, _, tail = sub.partition(".")
        if mod in ("norm1", "norm2", "norm3"):
            _set(out, f"{bp}/{mod}/{_NORM_PARAM[tail]}", value)
            return True
        if mod in ("attn1", "attn2"):
            proj, _, param = tail.partition(".")
            if proj == "to_out":
                param = param.split(".")[-1]  # to_out.0.weight
                v = _linear(value) if param == "weight" else value
                _set(out, f"{bp}/{mod}/to_out/{_LINEAR_PARAM[param]}", v)
            else:  # to_q/to_k/to_v, no bias
                v = _linear(value) if param == "weight" else value
                _set(out, f"{bp}/{mod}/{proj}/{_LINEAR_PARAM[param]}", v)
            return True
        if mod == "ff":
            # ff.net.0.proj -> proj_in (GEGLU), ff.net.2 -> proj_out
            parts = tail.split(".")
            param = parts[-1]
            name = "proj_in" if parts[1] == "0" else "proj_out"
            v = _linear(value) if param == "weight" else value
            _set(out, f"{bp}/ff/{name}/{_LINEAR_PARAM[param]}", v)
            return True
    return False


def convert_unet_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """diffusers UNet2DConditionModel state dict -> gmdx UNet param tree."""
    out: Dict = {}
    for key, value in sd.items():
        value = np.asarray(value)
        param = key.split(".")[-1]
        if key.startswith("conv_in.") or key.startswith("conv_out."):
            name = key.split(".")[0]
            v = _conv(value) if param == "weight" else value
            _set(out, f"{name}/{_LINEAR_PARAM[param]}", v)
        elif key.startswith("time_embedding."):
            _, lin, param = key.split(".")
            v = _linear(value) if param == "weight" else value
            _set(out, f"time_embedding/{lin}/{_LINEAR_PARAM[param]}", v)
        elif key.startswith("conv_norm_out."):
            _set(out, f"conv_norm_out/norm/{_NORM_PARAM[param]}", value)
        elif key.startswith(("down_blocks.", "up_blocks.")):
            side = "down" if key.startswith("down") else "up"
            _, i, kind, rest = key.split(".", 3)
            if kind == "resnets":
                j, rest2 = rest.split(".", 1)
                ok = _convert_resnet(rest2, value, out, f"{side}_{i}_resnet_{j}")
            elif kind == "attentions":
                j, rest2 = rest.split(".", 1)
                ok = _convert_transformer2d(
                    rest2, value, out, f"{side}_{i}_attn_{j}"
                )
            elif kind in ("downsamplers", "upsamplers"):
                # downsamplers.0.conv.weight
                tag = "downsample" if kind == "downsamplers" else "upsample"
                v = _conv(value) if param == "weight" else value
                _set(out, f"{side}_{i}_{tag}/conv/{_LINEAR_PARAM[param]}", v)
                ok = True
            else:
                ok = False
            if not ok:
                raise KeyError(f"unhandled UNet key: {key}")
        elif key.startswith("mid_block."):
            _, kind, j, rest = key.split(".", 3)
            if kind == "resnets":
                ok = _convert_resnet(rest, value, out, f"mid_resnet_{j}")
            else:
                ok = _convert_transformer2d(rest, value, out, "mid_attn")
            if not ok:
                raise KeyError(f"unhandled UNet key: {key}")
        else:
            raise KeyError(f"unhandled UNet key: {key}")
    return out


def _convert_vae_attention(rest: str, value: np.ndarray, out: Dict, prefix: str) -> bool:
    if rest.startswith("group_norm."):
        param = rest.split(".")[-1]
        _set(out, f"{prefix}/group_norm/norm/{_NORM_PARAM[param]}", value)
        return True
    for proj in ("to_q", "to_k", "to_v", "to_out", "query", "key", "value",
                 "proj_attn"):
        if rest.startswith(proj + "."):
            param = rest.split(".")[-1]
            name = {
                "query": "to_q", "key": "to_k", "value": "to_v",
                "proj_attn": "to_out",
            }.get(proj, proj)
            v = _linear(value) if param == "weight" else value
            _set(out, f"{prefix}/{name}/{_LINEAR_PARAM[param]}", v)
            return True
    return False


def convert_vae_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """diffusers AutoencoderKL state dict -> gmdx VAE param tree."""
    out: Dict = {}
    for key, value in sd.items():
        value = np.asarray(value)
        param = key.split(".")[-1]
        if key.startswith(("quant_conv.", "post_quant_conv.")):
            name = key.split(".")[0]
            v = _conv(value) if param == "weight" else value
            _set(out, f"{name}/{_LINEAR_PARAM[param]}", v)
            continue
        half, rest = key.split(".", 1)  # encoder | decoder
        if half not in ("encoder", "decoder"):
            raise KeyError(f"unhandled VAE key: {key}")
        if rest.startswith(("conv_in.", "conv_out.")):
            name = rest.split(".")[0]
            v = _conv(value) if param == "weight" else value
            _set(out, f"{half}/{name}/{_LINEAR_PARAM[param]}", v)
        elif rest.startswith("conv_norm_out."):
            _set(out, f"{half}/conv_norm_out/norm/{_NORM_PARAM[param]}", value)
        elif rest.startswith(("down_blocks.", "up_blocks.")):
            side = "down" if rest.startswith("down") else "up"
            _, i, kind, rest2 = rest.split(".", 3)
            if kind == "resnets":
                j, rest3 = rest2.split(".", 1)
                ok = _convert_resnet(
                    rest3, value, out, f"{half}/{side}_{i}_resnet_{j}"
                )
            elif kind in ("downsamplers", "upsamplers"):
                tag = "downsample" if kind == "downsamplers" else "upsample"
                v = _conv(value) if param == "weight" else value
                _set(out, f"{half}/{side}_{i}_{tag}/conv/{_LINEAR_PARAM[param]}", v)
                ok = True
            else:
                ok = False
            if not ok:
                raise KeyError(f"unhandled VAE key: {key}")
        elif rest.startswith("mid_block."):
            _, kind, j, rest2 = rest.split(".", 3)
            if kind == "resnets":
                ok = _convert_resnet(rest2, value, out, f"{half}/mid_resnet_{j}")
            else:
                ok = _convert_vae_attention(rest2, value, out, f"{half}/mid_attn")
            if not ok:
                raise KeyError(f"unhandled VAE key: {key}")
        else:
            raise KeyError(f"unhandled VAE key: {key}")
    return out


def convert_clip_text_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """transformers CLIPTextModel state dict -> gmdx CLIPTextModel tree."""
    out: Dict = {}
    for key, value in sd.items():
        value = np.asarray(value)
        key = key.removeprefix("text_model.")
        param = key.split(".")[-1]
        if key == "embeddings.token_embedding.weight":
            _set(out, "token_embedding/embedding", value)
        elif key == "embeddings.position_embedding.weight":
            _set(out, "position_embedding/embedding", value)
        elif key == "embeddings.position_ids":
            continue  # buffer, not a param
        elif key.startswith("final_layer_norm."):
            _set(out, f"final_layer_norm/{_NORM_PARAM[param]}", value)
        elif key.startswith("encoder.layers."):
            _, _, i, rest = key.split(".", 3)
            lp = f"layers_{i}"
            if rest.startswith("layer_norm1."):
                _set(out, f"{lp}/norm1/{_NORM_PARAM[param]}", value)
            elif rest.startswith("layer_norm2."):
                _set(out, f"{lp}/norm2/{_NORM_PARAM[param]}", value)
            elif rest.startswith("self_attn."):
                proj = rest.split(".")[1]  # q_proj/k_proj/v_proj/out_proj
                v = _linear(value) if param == "weight" else value
                _set(out, f"{lp}/attn/{proj}/{_LINEAR_PARAM[param]}", v)
            elif rest.startswith("mlp."):
                fc = rest.split(".")[1]
                v = _linear(value) if param == "weight" else value
                _set(out, f"{lp}/{fc}/{_LINEAR_PARAM[param]}", v)
            else:
                raise KeyError(f"unhandled CLIP key: {key}")
        else:
            raise KeyError(f"unhandled CLIP key: {key}")
    return out


# torchvision/timm VGG19 ``features`` indices that carry conv weights
# (configuration E; ReLU/MaxPool slots have no params).
_VGG19_CONV_INDICES = (0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34)


def convert_vgg19_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """torchvision/timm VGG19 state dict -> gmdx VGG19Features param tree.

    Both torchvision ``vgg19(weights=...)`` and timm ``vgg19`` name the conv
    stack ``features.<idx>.weight|bias``; the reference builds its perceptual
    extractor from the timm variant (train_vqgan_lora.py:837-863).
    ``classifier.*`` / ``head.*`` / ``pre_logits.*`` keys (present in full
    ImageNet checkpoints) are skipped — the perceptual loss only uses the
    feature stack. Anything else raises.
    """
    idx_to_conv = {v: i for i, v in enumerate(_VGG19_CONV_INDICES)}
    out: Dict = {}
    for key, value in sd.items():
        if key.startswith(("classifier.", "head.", "pre_logits.")):
            continue
        value = np.asarray(value)
        parts = key.split(".")
        if len(parts) == 3 and parts[0] == "features" and parts[2] in (
            "weight", "bias"
        ):
            conv = idx_to_conv.get(int(parts[1]))
            if conv is None:
                raise KeyError(f"non-conv VGG19 features index in key: {key}")
            v = _conv(value) if parts[2] == "weight" else value
            _set(out, f"conv_{conv}/{_LINEAR_PARAM[parts[2]]}", v)
        else:
            raise KeyError(f"unhandled VGG19 key: {key}")
    missing = [i for i in range(len(_VGG19_CONV_INDICES))
               if f"conv_{i}" not in out]
    if missing:
        raise KeyError(f"VGG19 checkpoint missing conv layers: {missing}")
    return out


def export_vgg19_state_dict(params: Dict) -> Dict[str, np.ndarray]:
    out = {}
    for path, value in _flatten(params).items():
        name, param = path.split("/")
        conv = int(name.split("_")[1])
        idx = _VGG19_CONV_INDICES[conv]
        if param == "kernel":
            out[f"features.{idx}.weight"] = _inv_conv(value)
        else:
            out[f"features.{idx}.bias"] = value
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a torch checkpoint (.safetensors / .pth / .pt / .bin) to numpy."""
    if path.endswith(".safetensors"):
        return load_torch_safetensors(path)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.float().numpy() for k, v in sd.items()}


def load_torch_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Read a torch-saved .safetensors into numpy (bf16 -> fp32)."""
    import ml_dtypes  # noqa: F401  (registers bfloat16 for numpy)
    from safetensors.numpy import load_file

    sd = load_file(path)
    return {
        k: (v.astype(np.float32) if v.dtype.name == "bfloat16" else v)
        for k, v in sd.items()
    }


# ---------------------------------------------------------------------------
# Inverse direction: gmdx Flax trees -> diffusers/transformers state dicts,
# so checkpoints trained here can be consumed by the reference's ecosystem.
# Also the round-trip oracle for the import tests.
# ---------------------------------------------------------------------------


def _flatten(tree: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, p))
        else:
            out[p] = np.asarray(v)
    return out


def _inv_linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _inv_conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (3, 2, 0, 1)))


def _export_resnet(flax_rest: str, value: np.ndarray, torch_prefix: str):
    mod, sub = flax_rest.split("/", 1)
    if mod in ("norm1", "norm2"):
        param = {"scale": "weight", "bias": "bias"}[sub.split("/")[-1]]
        return f"{torch_prefix}.{mod}.{param}", value
    if mod in ("conv1", "conv2", "conv_shortcut"):
        if sub == "kernel":
            return f"{torch_prefix}.{mod}.weight", _inv_conv(value)
        return f"{torch_prefix}.{mod}.bias", value
    if mod == "time_emb_proj":
        if sub == "kernel":
            return f"{torch_prefix}.{mod}.weight", _inv_linear(value)
        return f"{torch_prefix}.{mod}.bias", value
    raise KeyError(f"unhandled resnet path {flax_rest}")


def _export_transformer2d(flax_rest: str, value: np.ndarray, torch_prefix: str):
    parts = flax_rest.split("/")
    if parts[0] == "norm":
        param = {"scale": "weight", "bias": "bias"}[parts[-1]]
        return f"{torch_prefix}.norm.{param}", value
    if parts[0] in ("proj_in", "proj_out"):
        if parts[-1] == "kernel":
            return f"{torch_prefix}.{parts[0]}.weight", _inv_conv(value)
        return f"{torch_prefix}.{parts[0]}.bias", value
    if parts[0].startswith("blocks_"):
        d = parts[0].split("_")[1]
        bp = f"{torch_prefix}.transformer_blocks.{d}"
        mod = parts[1]
        if mod in ("norm1", "norm2", "norm3"):
            param = {"scale": "weight", "bias": "bias"}[parts[-1]]
            return f"{bp}.{mod}.{param}", value
        if mod in ("attn1", "attn2"):
            proj = parts[2]
            tail = "to_out.0" if proj == "to_out" else proj
            if parts[-1] == "kernel":
                return f"{bp}.{mod}.{tail}.weight", _inv_linear(value)
            return f"{bp}.{mod}.{tail}.bias", value
        if mod == "ff":
            name = "net.0.proj" if parts[2] == "proj_in" else "net.2"
            if parts[-1] == "kernel":
                return f"{bp}.ff.{name}.weight", _inv_linear(value)
            return f"{bp}.ff.{name}.bias", value
    raise KeyError(f"unhandled transformer path {flax_rest}")


def export_unet_state_dict(params: Dict) -> Dict[str, np.ndarray]:
    out = {}
    for path, value in _flatten(params).items():
        top, rest = path.split("/", 1)
        param = rest.split("/")[-1]
        if top in ("conv_in", "conv_out"):
            out[f"{top}.weight" if param == "kernel" else f"{top}.bias"] = (
                _inv_conv(value) if param == "kernel" else value
            )
        elif top == "time_embedding":
            lin = rest.split("/")[0]
            k = f"time_embedding.{lin}." + ("weight" if param == "kernel" else "bias")
            out[k] = _inv_linear(value) if param == "kernel" else value
        elif top == "conv_norm_out":
            p = {"scale": "weight", "bias": "bias"}[param]
            out[f"conv_norm_out.{p}"] = value
        elif top.startswith(("down_", "up_")):
            bits = top.split("_")  # e.g. down_0_resnet_1 / down_0_downsample
            side, i, kind = bits[0], bits[1], bits[2]
            tp = f"{side}_blocks.{i}"
            if kind == "resnet":
                k, v = _export_resnet(rest, value, f"{tp}.resnets.{bits[3]}")
            elif kind == "attn":
                k, v = _export_transformer2d(rest, value, f"{tp}.attentions.{bits[3]}")
            else:  # downsample / upsample
                samp = "downsamplers" if kind == "downsample" else "upsamplers"
                k = f"{tp}.{samp}.0.conv." + ("weight" if param == "kernel" else "bias")
                v = _inv_conv(value) if param == "kernel" else value
            out[k] = v
        elif top.startswith("mid_resnet_"):
            j = top.split("_")[-1]
            k, v = _export_resnet(rest, value, f"mid_block.resnets.{j}")
            out[k] = v
        elif top == "mid_attn":
            k, v = _export_transformer2d(rest, value, "mid_block.attentions.0")
            out[k] = v
        else:
            raise KeyError(f"unhandled UNet export path {path}")
    return out


def _export_vae_attention(flax_rest: str, value: np.ndarray, torch_prefix: str):
    parts = flax_rest.split("/")
    if parts[0] == "group_norm":
        param = {"scale": "weight", "bias": "bias"}[parts[-1]]
        return f"{torch_prefix}.group_norm.{param}", value
    proj = parts[0]
    tail = "to_out.0" if proj == "to_out" else proj
    if parts[-1] == "kernel":
        return f"{torch_prefix}.{tail}.weight", _inv_linear(value)
    return f"{torch_prefix}.{tail}.bias", value


def export_vae_state_dict(params: Dict) -> Dict[str, np.ndarray]:
    out = {}
    for path, value in _flatten(params).items():
        top, rest = path.split("/", 1)
        param = rest.split("/")[-1]
        if top in ("quant_conv", "post_quant_conv"):
            out[f"{top}.weight" if param == "kernel" else f"{top}.bias"] = (
                _inv_conv(value) if param == "kernel" else value
            )
            continue
        half = top  # encoder | decoder
        sub, rest2 = rest.split("/", 1)
        param = rest2.split("/")[-1]
        if sub in ("conv_in", "conv_out"):
            k = f"{half}.{sub}." + ("weight" if param == "kernel" else "bias")
            out[k] = _inv_conv(value) if param == "kernel" else value
        elif sub == "conv_norm_out":
            p = {"scale": "weight", "bias": "bias"}[param]
            out[f"{half}.conv_norm_out.{p}"] = value
        elif sub.startswith(("down_", "up_")):
            bits = sub.split("_")
            side, i, kind = bits[0], bits[1], bits[2]
            tp = f"{half}.{side}_blocks.{i}"
            if kind == "resnet":
                k, v = _export_resnet(rest2, value, f"{tp}.resnets.{bits[3]}")
            else:
                samp = "downsamplers" if kind == "downsample" else "upsamplers"
                k = f"{tp}.{samp}.0.conv." + (
                    "weight" if param == "kernel" else "bias"
                )
                v = _inv_conv(value) if param == "kernel" else value
            out[k] = v
        elif sub.startswith("mid_resnet_"):
            j = sub.split("_")[-1]
            k, v = _export_resnet(rest2, value, f"{half}.mid_block.resnets.{j}")
            out[k] = v
        elif sub == "mid_attn":
            k, v = _export_vae_attention(
                rest2, value, f"{half}.mid_block.attentions.0"
            )
            out[k] = v
        else:
            raise KeyError(f"unhandled VAE export path {path}")
    return out


def export_clip_text_state_dict(params: Dict) -> Dict[str, np.ndarray]:
    out = {}
    for path, value in _flatten(params).items():
        parts = path.split("/")
        param = parts[-1]
        if parts[0] == "token_embedding":
            out["text_model.embeddings.token_embedding.weight"] = value
        elif parts[0] == "position_embedding":
            out["text_model.embeddings.position_embedding.weight"] = value
        elif parts[0] == "final_layer_norm":
            p = {"scale": "weight", "bias": "bias"}[param]
            out[f"text_model.final_layer_norm.{p}"] = value
        elif parts[0].startswith("layers_"):
            i = parts[0].split("_")[1]
            lp = f"text_model.encoder.layers.{i}"
            if parts[1] in ("norm1", "norm2"):
                ln = "layer_norm1" if parts[1] == "norm1" else "layer_norm2"
                p = {"scale": "weight", "bias": "bias"}[param]
                out[f"{lp}.{ln}.{p}"] = value
            elif parts[1] == "attn":
                proj = parts[2]
                if param == "kernel":
                    out[f"{lp}.self_attn.{proj}.weight"] = _inv_linear(value)
                else:
                    out[f"{lp}.self_attn.{proj}.bias"] = value
            elif parts[1] in ("fc1", "fc2"):
                if param == "kernel":
                    out[f"{lp}.mlp.{parts[1]}.weight"] = _inv_linear(value)
                else:
                    out[f"{lp}.mlp.{parts[1]}.bias"] = value
            else:
                raise KeyError(f"unhandled CLIP export path {path}")
        else:
            raise KeyError(f"unhandled CLIP export path {path}")
    return out


def convert_safety_checker_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """diffusers StableDiffusionSafetyChecker state dict -> gmdx tree.

    Key space: ``vision_model.vision_model.*`` (CLIP ViT tower, incl. HF's
    ``pre_layrnorm`` typo), ``visual_projection.weight`` and the four
    concept-embedding tensors.
    """
    out: Dict = {}
    for key, value in sd.items():
        value = np.asarray(value)
        param = key.split(".")[-1]
        if key in (
            "concept_embeds",
            "special_care_embeds",
            "concept_embeds_weights",
            "special_care_embeds_weights",
        ):
            out[key] = value
        elif key == "visual_projection.weight":
            _set(out, "visual_projection/kernel", _linear(value))
        elif key.startswith("vision_model.vision_model."):
            rest = key.removeprefix("vision_model.vision_model.")
            vp = "vision_model"
            if rest == "embeddings.class_embedding":
                _set(out, f"{vp}/class_embedding", value)
            elif rest == "embeddings.patch_embedding.weight":
                _set(out, f"{vp}/patch_embedding/kernel", _conv(value))
            elif rest == "embeddings.position_embedding.weight":
                _set(out, f"{vp}/position_embedding/embedding", value)
            elif rest == "embeddings.position_ids":
                continue  # buffer
            elif rest.startswith("pre_layrnorm."):  # HF typo, kept verbatim
                _set(out, f"{vp}/pre_layernorm/{_NORM_PARAM[param]}", value)
            elif rest.startswith("post_layernorm."):
                _set(out, f"{vp}/post_layernorm/{_NORM_PARAM[param]}", value)
            elif rest.startswith("encoder.layers."):
                _, _, i, sub = rest.split(".", 3)
                lp = f"{vp}/layers_{i}"
                if sub.startswith("layer_norm1."):
                    _set(out, f"{lp}/norm1/{_NORM_PARAM[param]}", value)
                elif sub.startswith("layer_norm2."):
                    _set(out, f"{lp}/norm2/{_NORM_PARAM[param]}", value)
                elif sub.startswith("self_attn."):
                    proj = sub.split(".")[1]
                    v = _linear(value) if param == "weight" else value
                    _set(out, f"{lp}/attn/{proj}/{_LINEAR_PARAM[param]}", v)
                elif sub.startswith("mlp."):
                    fc = sub.split(".")[1]
                    v = _linear(value) if param == "weight" else value
                    _set(out, f"{lp}/{fc}/{_LINEAR_PARAM[param]}", v)
                else:
                    raise KeyError(f"unhandled safety-checker key: {key}")
            else:
                raise KeyError(f"unhandled safety-checker key: {key}")
        else:
            raise KeyError(f"unhandled safety-checker key: {key}")
    return out


def export_safety_checker_state_dict(params: Dict) -> Dict[str, np.ndarray]:
    out = {}
    for path, value in _flatten(params).items():
        parts = path.split("/")
        param = parts[-1]
        if parts[0] in (
            "concept_embeds",
            "special_care_embeds",
            "concept_embeds_weights",
            "special_care_embeds_weights",
        ):
            out[parts[0]] = value
        elif parts[0] == "visual_projection":
            out["visual_projection.weight"] = _inv_linear(value)
        elif parts[0] == "vision_model":
            vp = "vision_model.vision_model"
            if parts[1] == "class_embedding":
                out[f"{vp}.embeddings.class_embedding"] = value
            elif parts[1] == "patch_embedding":
                out[f"{vp}.embeddings.patch_embedding.weight"] = _inv_conv(value)
            elif parts[1] == "position_embedding":
                out[f"{vp}.embeddings.position_embedding.weight"] = value
            elif parts[1] in ("pre_layernorm", "post_layernorm"):
                hf = "pre_layrnorm" if parts[1] == "pre_layernorm" else "post_layernorm"
                p = {"scale": "weight", "bias": "bias"}[param]
                out[f"{vp}.{hf}.{p}"] = value
            elif parts[1].startswith("layers_"):
                i = parts[1].split("_")[1]
                lp = f"{vp}.encoder.layers.{i}"
                if parts[2] in ("norm1", "norm2"):
                    ln = "layer_norm1" if parts[2] == "norm1" else "layer_norm2"
                    p = {"scale": "weight", "bias": "bias"}[param]
                    out[f"{lp}.{ln}.{p}"] = value
                elif parts[2] == "attn":
                    proj = parts[3]
                    if param == "kernel":
                        out[f"{lp}.self_attn.{proj}.weight"] = _inv_linear(value)
                    else:
                        out[f"{lp}.self_attn.{proj}.bias"] = value
                elif parts[2] in ("fc1", "fc2"):
                    if param == "kernel":
                        out[f"{lp}.mlp.{parts[2]}.weight"] = _inv_linear(value)
                    else:
                        out[f"{lp}.mlp.{parts[2]}.bias"] = value
                else:
                    raise KeyError(f"unhandled safety-checker export path {path}")
            else:
                raise KeyError(f"unhandled safety-checker export path {path}")
        else:
            raise KeyError(f"unhandled safety-checker export path {path}")
    return out


__all__ = [
    "convert_unet_state_dict",
    "convert_vae_state_dict",
    "convert_clip_text_state_dict",
    "convert_safety_checker_state_dict",
    "convert_vgg19_state_dict",
    "export_vgg19_state_dict",
    "load_torch_checkpoint",
    "export_unet_state_dict",
    "export_vae_state_dict",
    "export_clip_text_state_dict",
    "export_safety_checker_state_dict",
    "load_torch_safetensors",
]
