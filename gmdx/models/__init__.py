"""Flax model zoo: the SD-1.5 components the reference loads from the hub
(SURVEY.md §2.2), rebuilt TPU-native, plus the in-repo discriminator.

All modules compute in NHWC (TPU-preferred conv layout) with NCHW accepted at
the public pipeline boundary for parity with the reference's torch tensors.
"""

from gmdx.models.unet2d import (
    UNet2DConditionModel,
    UNetConfig,
    SD15_UNET_CONFIG,
    SD15_GM_UNET_CONFIG,
    TINY_UNET_CONFIG,
    inflate_conv_in,
)
from gmdx.models.vae import (
    AutoencoderKL,
    DiagonalGaussianDistribution,
    SD15_VAE_CONFIG,
    TINY_VAE_CONFIG,
)
from gmdx.models.clip_text import CLIPTextModel, CLIP_VIT_L_CONFIG, TINY_CLIP_CONFIG
from gmdx.models.tokenizer import CLIPTokenizer
from gmdx.models.discriminator import Discriminator
from gmdx.models.vgg import VGG19Features, perceptual_loss, resize_for_vgg
from gmdx.models.vae import VAEConfig
from gmdx.models.clip_text import CLIPTextConfig
from gmdx.models.controlnet import (
    ControlNetModel,
    ControlNetConfig,
    ConditioningEmbedding,
    SD15_CONTROLNET_CONFIG,
    TINY_CONTROLNET_CONFIG,
    controlnet_params_from_unet,
)
from gmdx.models.safety_checker import (
    CLIPVisionModel,
    CLIPVisionConfig,
    StableDiffusionSafetyChecker,
    CLIP_VIT_L_VISION_CONFIG,
    TINY_VISION_CONFIG,
    preprocess_for_clip,
    run_safety_checker,
    make_safety_checker_fn,
)
from gmdx.models.lora import (
    LoRAConfig,
    init_lora_params,
    apply_lora,
    merge_lora,
    lora_targets,
)

__all__ = [
    "UNet2DConditionModel",
    "UNetConfig",
    "SD15_UNET_CONFIG",
    "SD15_GM_UNET_CONFIG",
    "TINY_UNET_CONFIG",
    "inflate_conv_in",
    "VAEConfig",
    "CLIPTextConfig",
    "perceptual_loss",
    "resize_for_vgg",
    "AutoencoderKL",
    "DiagonalGaussianDistribution",
    "SD15_VAE_CONFIG",
    "TINY_VAE_CONFIG",
    "CLIPTextModel",
    "CLIP_VIT_L_CONFIG",
    "TINY_CLIP_CONFIG",
    "CLIPTokenizer",
    "Discriminator",
    "VGG19Features",
    "ControlNetModel",
    "ControlNetConfig",
    "ConditioningEmbedding",
    "SD15_CONTROLNET_CONFIG",
    "TINY_CONTROLNET_CONFIG",
    "controlnet_params_from_unet",
    "CLIPVisionModel",
    "CLIPVisionConfig",
    "StableDiffusionSafetyChecker",
    "CLIP_VIT_L_VISION_CONFIG",
    "TINY_VISION_CONFIG",
    "preprocess_for_clip",
    "run_safety_checker",
    "make_safety_checker_fn",
    "LoRAConfig",
    "init_lora_params",
    "apply_lora",
    "merge_lora",
    "lora_targets",
]
