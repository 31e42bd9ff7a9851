"""ControlNet for the SD-1.5 UNet — new capability vs the reference.

The reference mentions ControlNet-conditioned HDR generation only in its
README (README.md:23,149 — no code exists; SURVEY.md §7.3 plans it as a
conditioning adapter). This is the standard ControlNet architecture (Zhang &
Agrawala 2023) over gmdx's UNet blocks: a trainable copy of the UNet encoder
+ mid whose per-skip outputs pass through zero-initialized 1x1 convs and add
into the frozen UNet's skips; the control image (e.g. the SDR frame for
SDR→HDRTV up-conversion) enters through a small strided conv embedder that
maps pixel space to the latent grid.

``controlnet_params_from_unet`` initializes the encoder copy from trained
UNet weights (the standard ControlNet init), zero convs at zero so the
adapter starts as an exact no-op.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from gmdx.models.layers import (
    Downsample2D,
    ResnetBlock2D,
    TimestepEmbedding,
    Transformer2D,
    timestep_embedding,
)
from gmdx.models.unet2d import SD15_UNET_CONFIG, TINY_UNET_CONFIG, UNetConfig

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ControlNetConfig:
    unet: UNetConfig = SD15_UNET_CONFIG
    conditioning_channels: int = 3
    conditioning_embedding_channels: Tuple[int, ...] = (16, 32, 96, 256)


SD15_CONTROLNET_CONFIG = ControlNetConfig()
# len(conditioning_embedding_channels) - 1 stride-2 stages must equal the
# image->latent factor (8x for the SD VAE pipelines), so 4 entries.
TINY_CONTROLNET_CONFIG = ControlNetConfig(
    unet=TINY_UNET_CONFIG, conditioning_embedding_channels=(8, 16, 16, 32)
)


class ConditioningEmbedding(nn.Module):
    """Maps the full-resolution control image down to the latent grid:
    3x3 convs with stride-2 steps (one per 2x factor between image and
    latent), SiLU between, zero-initialized output conv."""

    out_channels: int
    block_channels: Tuple[int, ...]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cond: Array) -> Array:  # NHWC image -> NHWC latent grid
        h = nn.Conv(
            self.block_channels[0], (3, 3), padding=1, dtype=self.dtype,
            name="conv_in",
        )(cond)
        h = nn.silu(h)
        for i, ch in enumerate(self.block_channels[1:]):
            h = nn.Conv(
                ch, (3, 3), padding=1, dtype=self.dtype, name=f"blocks_{2*i}"
            )(h)
            h = nn.silu(h)
            h = nn.Conv(
                ch, (3, 3), strides=2, padding=1, dtype=self.dtype,
                name=f"blocks_{2*i+1}",
            )(h)
            h = nn.silu(h)
        return nn.Conv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="conv_out",
        )(h)


class ControlNetModel(nn.Module):
    config: ControlNetConfig = SD15_CONTROLNET_CONFIG
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: Array,  # (B, C, h, w) latent, NCHW boundary
        timesteps: Array,
        encoder_hidden_states: Array,
        controlnet_cond: Array,  # (B, 3, H, W) control image in [0, 1]
        conditioning_scale: float = 1.0,
        channels_last: bool = False,
    ) -> Tuple[Tuple[Array, ...], Array]:
        """Returns (down_block_residuals, mid_residual) in NHWC, ready for
        UNet2DConditionModel's additional-residual hooks. ``channels_last``
        takes sample/cond as NHWC (the denoise scans' on-device layout)."""
        cfg = self.config.unet
        if channels_last:
            x = sample.astype(self.dtype)
            cond = controlnet_cond.astype(self.dtype)
        else:
            x = jnp.transpose(sample, (0, 2, 3, 1)).astype(self.dtype)
            cond = jnp.transpose(controlnet_cond, (0, 2, 3, 1)).astype(self.dtype)
        context = encoder_hidden_states.astype(self.dtype)
        b = x.shape[0]

        if jnp.ndim(timesteps) == 0:
            timesteps = jnp.broadcast_to(timesteps, (b,))
        t_sin = timestep_embedding(
            timesteps,
            cfg.block_out_channels[0],
            flip_sin_to_cos=cfg.flip_sin_to_cos,
            downscale_freq_shift=cfg.freq_shift,
        ).astype(self.dtype)
        temb = TimestepEmbedding(
            cfg.block_out_channels[0] * 4, dtype=self.dtype, name="time_embedding"
        )(t_sin)

        def heads_for(ch: int) -> Tuple[int, int]:
            n = cfg.num_attention_heads
            return n, ch // n

        h = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype,
            name="conv_in",
        )(x)
        h = h + ConditioningEmbedding(
            cfg.block_out_channels[0],
            self.config.conditioning_embedding_channels,
            dtype=self.dtype,
            name="cond_embedding",
        )(cond)

        def zero_conv(ch: int, name: str):
            return nn.Conv(
                ch, (1, 1), dtype=self.dtype,
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros,
                name=name,
            )

        skips = [h]
        n_blocks = len(cfg.block_out_channels)
        for i, block_type in enumerate(cfg.down_block_types):
            out_ch = cfg.block_out_channels[i]
            heads, head_dim = heads_for(out_ch)
            for j in range(cfg.layers_per_block):
                h = ResnetBlock2D(
                    out_ch, dtype=self.dtype, name=f"down_{i}_resnet_{j}"
                )(h, temb)
                if block_type == "CrossAttnDownBlock2D":
                    h = Transformer2D(
                        out_ch, heads, head_dim, cfg.cross_attention_dim,
                        depth=cfg.transformer_depth, dtype=self.dtype,
                        name=f"down_{i}_attn_{j}",
                    )(h, context)
                skips.append(h)
            if i < n_blocks - 1:
                h = Downsample2D(
                    out_ch, dtype=self.dtype, name=f"down_{i}_downsample"
                )(h)
                skips.append(h)

        mid_ch = cfg.block_out_channels[-1]
        heads, head_dim = heads_for(mid_ch)
        h = ResnetBlock2D(mid_ch, dtype=self.dtype, name="mid_resnet_0")(h, temb)
        h = Transformer2D(
            mid_ch, heads, head_dim, cfg.cross_attention_dim,
            depth=cfg.transformer_depth, dtype=self.dtype, name="mid_attn",
        )(h, context)
        h = ResnetBlock2D(mid_ch, dtype=self.dtype, name="mid_resnet_1")(h, temb)

        down_res = tuple(
            zero_conv(s.shape[-1], f"controlnet_down_{k}")(s) * conditioning_scale
            for k, s in enumerate(skips)
        )
        mid_res = zero_conv(mid_ch, "controlnet_mid")(h) * conditioning_scale
        return down_res, mid_res


def controlnet_params_from_unet(controlnet_params, unet_params):
    """Copy every shared-name module (conv_in, time_embedding, down/mid
    blocks) from trained UNet params into a freshly initialized ControlNet
    tree; zero convs + cond embedding keep their (zero) init. Returns a new
    tree."""
    out = dict(controlnet_params)
    for name, sub in unet_params.items():
        if name in out and (
            name in ("conv_in", "time_embedding")
            or name.startswith(("down_", "mid_"))
        ):
            out[name] = jax.tree.map(jnp.asarray, sub)
    return out


__all__ = [
    "ControlNetModel",
    "ControlNetConfig",
    "ConditioningEmbedding",
    "SD15_CONTROLNET_CONFIG",
    "TINY_CONTROLNET_CONFIG",
    "controlnet_params_from_unet",
]
