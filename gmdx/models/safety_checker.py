"""Stable Diffusion safety checker: CLIP vision tower + concept thresholds.

Parity target: the diffusers ``StableDiffusionSafetyChecker`` the reference
pipelines register and invoke after decode (stable_diffusion_gm.py:585-597,
1106 — ``run_safety_checker`` encodes the decoded images with CLIP ViT-L/14,
projects, and compares cosine similarity against fixed concept embeddings,
blacking out flagged images). The reference loads it from the SD-1.5
checkpoint; gmdx rebuilds it as Flax so the full pipeline directory converts.

TPU notes: one 257-token ViT forward per decoded image — a single fused
attention stack on the MXU; the 224x224 bicubic resize + normalize
preprocessing is a few fused elementwise ops. No Pallas needed at S=257.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gmdx.models.clip_text import CLIPEncoderLayer, CLIPTextConfig

Array = jax.Array

# OpenAI CLIP preprocessing constants (transformers CLIPImageProcessor).
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    projection_dim: int = 768
    layer_norm_eps: float = 1e-5
    num_concepts: int = 17
    num_special_concepts: int = 3


CLIP_VIT_L_VISION_CONFIG = CLIPVisionConfig()
TINY_VISION_CONFIG = CLIPVisionConfig(
    image_size=32,
    patch_size=8,
    hidden_size=32,
    num_layers=2,
    num_heads=2,
    intermediate_size=64,
    projection_dim=16,
    num_concepts=4,
    num_special_concepts=2,
)


def _text_cfg(cfg: CLIPVisionConfig) -> CLIPTextConfig:
    """Encoder-layer config view: the ViT blocks are structurally identical
    to the text tower's (quickgelu MLP, pre-LN), just non-causal."""
    return CLIPTextConfig(
        hidden_size=cfg.hidden_size,
        num_layers=cfg.num_layers,
        num_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        layer_norm_eps=cfg.layer_norm_eps,
    )


class CLIPVisionModel(nn.Module):
    """CLIP ViT vision tower; returns the post-LN pooled class embedding."""

    config: CLIPVisionConfig = CLIP_VIT_L_VISION_CONFIG
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: Array) -> Array:
        """pixel_values: (B, 3, H, W) CLIP-normalized. Returns (B, hidden)."""
        cfg = self.config
        x = pixel_values.transpose(0, 2, 3, 1)  # NHWC for TPU convs
        b = x.shape[0]
        patches = nn.Conv(
            cfg.hidden_size,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            use_bias=False,
            dtype=self.dtype,
            name="patch_embedding",
        )(x)
        n = patches.shape[1] * patches.shape[2]
        patches = patches.reshape(b, n, cfg.hidden_size)
        cls = self.param(
            "class_embedding",
            nn.initializers.normal(0.02),
            (cfg.hidden_size,),
        )
        cls = jnp.broadcast_to(cls.astype(self.dtype), (b, 1, cfg.hidden_size))
        h = jnp.concatenate([cls, patches], axis=1)
        pos = nn.Embed(
            n + 1, cfg.hidden_size, dtype=self.dtype, name="position_embedding"
        )(jnp.arange(n + 1)[None, :])
        h = h + pos
        h = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="pre_layernorm"
        )(h)
        full = jnp.ones((1, 1, n + 1, n + 1), bool)  # non-causal
        tcfg = _text_cfg(cfg)
        for i in range(cfg.num_layers):
            h = CLIPEncoderLayer(tcfg, dtype=self.dtype, name=f"layers_{i}")(h, full)
        pooled = h[:, 0]
        pooled = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="post_layernorm"
        )(pooled)
        return pooled.astype(jnp.float32)


def _cosine(a: Array, b: Array) -> Array:
    """Row-normalized cosine similarity, (B, D) x (N, D) -> (B, N)."""
    an = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    bn = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    return an @ bn.T


class StableDiffusionSafetyChecker(nn.Module):
    """Flags NSFW images by cosine distance to fixed concept embeddings.

    Mirrors diffusers' threshold logic: special-care concepts lower every
    concept threshold by 0.01 when any of them fires, and flagged images are
    blacked out (the reference's run_safety_checker behavior).
    """

    config: CLIPVisionConfig = CLIP_VIT_L_VISION_CONFIG
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, clip_input: Array) -> Array:
        """clip_input (B, 3, S, S) CLIP-normalized -> (B,) bool nsfw flags."""
        cfg = self.config
        pooled = CLIPVisionModel(cfg, dtype=self.dtype, name="vision_model")(
            clip_input
        )
        embeds = nn.Dense(
            cfg.projection_dim,
            use_bias=False,
            dtype=jnp.float32,
            name="visual_projection",
        )(pooled)
        init = nn.initializers.normal(0.02)
        concept = self.param(
            "concept_embeds", init, (cfg.num_concepts, cfg.projection_dim)
        )
        special = self.param(
            "special_care_embeds",
            init,
            (cfg.num_special_concepts, cfg.projection_dim),
        )
        concept_w = self.param(
            "concept_embeds_weights", nn.initializers.ones, (cfg.num_concepts,)
        )
        special_w = self.param(
            "special_care_embeds_weights",
            nn.initializers.ones,
            (cfg.num_special_concepts,),
        )
        special_scores = _cosine(embeds, special) - special_w[None, :]
        adjustment = jnp.where(
            jnp.any(special_scores > 0.0, axis=-1), 0.01, 0.0
        )
        concept_scores = (
            _cosine(embeds, concept) - concept_w[None, :] + adjustment[:, None]
        )
        return jnp.any(concept_scores > 0.0, axis=-1)


def preprocess_for_clip(images01: Array, image_size: int = 224) -> Array:
    """(B, H, W, 3) images in [0, 1] -> (B, 3, S, S) CLIP-normalized input.

    Matches transformers' CLIPImageProcessor geometry: resize the SHORTEST
    edge to ``image_size`` (bicubic), then center-crop the long edge — an
    aspect-ratio squash would change the embeddings (and potentially the
    NSFW verdicts) for non-square frames vs the reference.
    """
    b, h, w, c = images01.shape
    if h <= w:
        nh, nw = image_size, max(image_size, round(w * image_size / h))
    else:
        nh, nw = max(image_size, round(h * image_size / w)), image_size
    resized = jax.image.resize(images01, (b, nh, nw, c), method="bicubic")
    top = (nh - image_size) // 2
    left = (nw - image_size) // 2
    cropped = jax.lax.dynamic_slice(
        resized, (0, top, left, 0), (b, image_size, image_size, c)
    )
    mean = jnp.asarray(CLIP_IMAGE_MEAN, dtype=cropped.dtype)
    std = jnp.asarray(CLIP_IMAGE_STD, dtype=cropped.dtype)
    normed = (jnp.clip(cropped, 0.0, 1.0) - mean) / std
    return normed.transpose(0, 3, 1, 2)


def run_safety_checker(
    checker: StableDiffusionSafetyChecker,
    params,
    images01: Array,
):
    """Reference run_safety_checker (stable_diffusion_gm.py:585-597): returns
    (images with flagged ones blacked out, has_nsfw (B,) bool)."""
    clip_input = preprocess_for_clip(
        images01, image_size=checker.config.image_size
    )
    has_nsfw = checker.apply({"params": params}, clip_input)
    keep = (~has_nsfw).astype(images01.dtype)[:, None, None, None]
    return images01 * keep, has_nsfw


def make_safety_checker_fn(checker: StableDiffusionSafetyChecker, params):
    """Build the callable the pipelines' ``safety_checker=`` hook expects:
    NHWC [0,1] images -> (filtered images, has_nsfw flags), jitted once."""
    jitted = jax.jit(
        lambda p, imgs: run_safety_checker(checker, p, imgs)
    )

    def fn(images01):
        out, flags = jitted(params, jnp.asarray(images01))
        return np.asarray(out), np.asarray(flags)

    return fn


__all__ = [
    "CLIPVisionConfig",
    "CLIPVisionModel",
    "StableDiffusionSafetyChecker",
    "CLIP_VIT_L_VISION_CONFIG",
    "TINY_VISION_CONFIG",
    "preprocess_for_clip",
    "run_safety_checker",
    "make_safety_checker_fn",
    "CLIP_IMAGE_MEAN",
    "CLIP_IMAGE_STD",
]
