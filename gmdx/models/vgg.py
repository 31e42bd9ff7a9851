"""VGG19 feature extractor for the Stage-1 perceptual loss.

The reference pulls a timm VGG19 with ``features_only=True`` and compares
stage feature maps (train_vqgan_lora.py:837-863, 113-129). This is the same
topology (configuration E) in Flax/NHWC, returning the five post-ReLU stage
outputs (before each max-pool), with ImageNet normalization folded in.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# Configuration E: channels per conv, 'M' = 2x2 max pool.
VGG19_LAYOUT: Tuple = (
    64, 64, "M",
    128, 128, "M",
    256, 256, 256, 256, "M",
    512, 512, 512, 512, "M",
    512, 512, 512, 512, "M",
)

# Host constants (no device allocation at import time).
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class VGG19Features(nn.Module):
    """Input: (B, 3, H, W) NCHW in [0, 1]. Returns the 5 stage feature maps
    (NHWC) feeding the perceptual loss."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> List[Array]:
        h = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype)
        h = (h - jnp.asarray(IMAGENET_MEAN, h.dtype)) / jnp.asarray(IMAGENET_STD, h.dtype)
        feats: List[Array] = []
        conv_idx = 0
        for spec in VGG19_LAYOUT:
            if spec == "M":
                feats.append(h)
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
            else:
                h = nn.Conv(
                    spec, (3, 3), padding=1, dtype=self.dtype,
                    name=f"conv_{conv_idx}",
                )(h)
                h = nn.relu(h)
                conv_idx += 1
        return feats


def perceptual_loss(
    feats_a: Sequence[Array], feats_b: Sequence[Array]
) -> Array:
    """Stage-averaged MSE between feature pyramids (reference semantics:
    train_vqgan_lora.py:113-129 averages F.mse_loss over the stages)."""
    total = 0.0
    for fa, fb in zip(feats_a, feats_b):
        total = total + jnp.mean(
            (fa.astype(jnp.float32) - fb.astype(jnp.float32)) ** 2
        )
    return total / len(feats_a)


def resize_for_vgg(
    x: Array, resolution: int = 224, method: str = "torch_nearest"
) -> Array:
    """Resize a (B, 3, H, W) batch to the VGG input resolution.

    The reference feeds the perceptual backbone through
    ``F.interpolate(pixel_values, timm_model_resolution)`` whose default
    mode is **nearest** (train_vqgan_lora.py:114-115): source index =
    ``floor(i * in/out)``. ``torch_nearest`` reproduces that exactly (jax's
    own "nearest" uses pixel-center alignment, which picks different
    source rows). "bilinear"/"nearest" fall through to jax.image.resize."""
    b, c, h, w = x.shape
    if method == "torch_nearest":
        ih = np.minimum(
            (np.arange(resolution) * (h / resolution)).astype(np.int32), h - 1
        )
        iw = np.minimum(
            (np.arange(resolution) * (w / resolution)).astype(np.int32), w - 1
        )
        return x[:, :, ih][:, :, :, iw]
    return jax.image.resize(x, (b, c, resolution, resolution), method=method)


__all__ = ["VGG19Features", "VGG19_LAYOUT", "perceptual_loss", "resize_for_vgg"]
