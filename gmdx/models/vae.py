"""AutoencoderKL (SD-1.5 VAE), Flax/NHWC, with the Stage-1 sigmoid GM head.

Parity target: the diffusers AutoencoderKL the reference fine-tunes and
samples (encode -> DiagonalGaussianDistribution.sample() * 0.18215 -> decode;
train_gm_unet.py:1156-1159, train_vqgan_lora.py:1121-1123). Encoder blocks
(128,256,512,512) x2 resnets, attention mid block, latent_channels 4,
quant/post_quant 1x1 convs.

NCHW at the call boundary, NHWC inside.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from gmdx.models.layers import (
    Downsample2D,
    GroupNorm,
    ResnetBlock2D,
    Upsample2D,
    VAEAttention,
)

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    scaling_factor: float = 0.18215
    sample_size: int = 512
    # Gradient checkpointing: rematerialize resnet/attention activations in
    # the backward pass (Stage-1 --gradient_checkpointing,
    # reference train_vqgan_lora.py:536 -> vae.enable_gradient_checkpointing).
    # Same remat granularity as UNet2DConditionModel (unet2d.py:62-66).
    remat: bool = False


SD15_VAE_CONFIG = VAEConfig()
TINY_VAE_CONFIG = VAEConfig(block_out_channels=(32, 64), sample_size=32)


class DiagonalGaussianDistribution:
    """Posterior N(mean, diag(std^2)) parameterized by concatenated moments."""

    def __init__(self, moments: Array, channel_axis: int = 1):
        self.mean, logvar = jnp.split(moments, 2, axis=channel_axis)
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)

    def sample(self, key: Array) -> Array:
        return self.mean + self.std * jax.random.normal(
            key, self.mean.shape, self.mean.dtype
        )

    def mode(self) -> Array:
        return self.mean

    def kl(self) -> Array:
        return 0.5 * jnp.sum(
            self.mean**2 + jnp.exp(self.logvar) - 1.0 - self.logvar,
            axis=tuple(range(1, self.mean.ndim)),
        )


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:  # NHWC in, NHWC moments out
        cfg = self.config
        Res = nn.remat(ResnetBlock2D) if cfg.remat else ResnetBlock2D
        Attn = nn.remat(VAEAttention) if cfg.remat else VAEAttention
        n = len(cfg.block_out_channels)
        h = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype,
            name="conv_in",
        )(x)
        for i, out_ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = Res(
                    out_ch, use_temb=False, dtype=self.dtype,
                    name=f"down_{i}_resnet_{j}",
                )(h)
            if i < n - 1:
                h = Downsample2D(
                    out_ch, asymmetric_pad=True, dtype=self.dtype,
                    name=f"down_{i}_downsample",
                )(h)
        mid = cfg.block_out_channels[-1]
        h = Res(mid, use_temb=False, dtype=self.dtype, name="mid_resnet_0")(h)
        h = Attn(mid, dtype=self.dtype, name="mid_attn")(h)
        h = Res(mid, use_temb=False, dtype=self.dtype, name="mid_resnet_1")(h)
        h = GroupNorm(32, 1e-6, dtype=self.dtype, name="conv_norm_out")(
            h, activate=True
        )
        return nn.Conv(
            2 * cfg.latent_channels, (3, 3), padding=1, dtype=self.dtype,
            name="conv_out",
        )(h)


class Decoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: Array) -> Array:  # NHWC latent in, NHWC image out
        cfg = self.config
        Res = nn.remat(ResnetBlock2D) if cfg.remat else ResnetBlock2D
        Attn = nn.remat(VAEAttention) if cfg.remat else VAEAttention
        n = len(cfg.block_out_channels)
        mid = cfg.block_out_channels[-1]
        h = nn.Conv(mid, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        h = Res(mid, use_temb=False, dtype=self.dtype, name="mid_resnet_0")(h)
        h = Attn(mid, dtype=self.dtype, name="mid_attn")(h)
        h = Res(mid, use_temb=False, dtype=self.dtype, name="mid_resnet_1")(h)
        rev = tuple(reversed(cfg.block_out_channels))
        for i, out_ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                h = Res(
                    out_ch, use_temb=False, dtype=self.dtype,
                    name=f"up_{i}_resnet_{j}",
                )(h)
            if i < n - 1:
                h = Upsample2D(out_ch, dtype=self.dtype, name=f"up_{i}_upsample")(h)
        h = GroupNorm(32, 1e-6, dtype=self.dtype, name="conv_norm_out")(
            h, activate=True
        )
        return nn.Conv(
            cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(h)


class AutoencoderKL(nn.Module):
    """KL VAE. ``method=`` dispatch: encode / decode / __call__ round-trip.

    The Stage-1 gain-map head (sigmoid over decode, train_vqgan_lora.py:1123)
    belongs to the caller — pipelines apply ``jax.nn.sigmoid`` so the same
    module serves both the RGB and GM roles.
    """

    config: VAEConfig = SD15_VAE_CONFIG
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype)
        self.quant_conv = nn.Conv(
            2 * self.config.latent_channels, (1, 1), dtype=self.dtype,
            name="quant_conv",
        )
        self.post_quant_conv = nn.Conv(
            self.config.latent_channels, (1, 1), dtype=self.dtype,
            name="post_quant_conv",
        )

    def encode(self, x: Array) -> DiagonalGaussianDistribution:
        """x: (B, 3, H, W) NCHW -> posterior over (B, 4, H/8, W/8)."""
        h = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype)
        moments = self.quant_conv(self.encoder(h))
        moments = jnp.transpose(moments, (0, 3, 1, 2)).astype(jnp.float32)
        return DiagonalGaussianDistribution(moments, channel_axis=1)

    def decode(self, z: Array) -> Array:
        """z: (B, 4, h, w) NCHW -> (B, 3, 8h, 8w)."""
        h = jnp.transpose(z, (0, 2, 3, 1)).astype(self.dtype)
        h = self.post_quant_conv(h)
        img = self.decoder(h)
        return jnp.transpose(img, (0, 3, 1, 2)).astype(jnp.float32)

    def __call__(self, x: Array, key: Array) -> Array:
        """Full round-trip (used for init and the Stage-1 generator path)."""
        posterior = self.encode(x)
        z = posterior.sample(key)
        return self.decode(z)


__all__ = [
    "AutoencoderKL",
    "VAEConfig",
    "DiagonalGaussianDistribution",
    "Encoder",
    "Decoder",
    "SD15_VAE_CONFIG",
    "TINY_VAE_CONFIG",
]
