"""Conditional 2-D UNet (SD-1.5 architecture), Flax/NHWC.

Config parity: the exact SD-1.5 layout the reference pins in code
(scripts/inference/generate_hdr.py:115-135): block_out_channels
(320,640,1280,1280), 8 attention heads (diffusers' ``attention_head_dim=8``
means head *count* for SD-1.5), cross_attention_dim 768, layers_per_block 2,
down = CrossAttnDown x3 + Down, up = Up + CrossAttnUp x3, GroupNorm(32,1e-5),
SiLU. Both the 4-channel (vanilla SD) and 8-channel (GM UNet with inflated
conv_in, train_gm_unet.py:658-677) variants are the same module with a
different ``in_channels``.

I/O is NCHW at the call boundary (parity with the reference pipelines);
internals are NHWC for TPU conv efficiency — transposed once on entry/exit.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from gmdx.models.layers import (
    Downsample2D,
    GroupNorm,
    ResnetBlock2D,
    TimestepEmbedding,
    Transformer2D,
    Upsample2D,
    timestep_embedding,
)

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    num_attention_heads: int = 8
    cross_attention_dim: int = 768
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "DownBlock2D",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
    )
    transformer_depth: int = 1
    sample_size: int = 64
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    # Gradient checkpointing: rematerialize resnet/transformer activations in
    # the backward pass (the reference's --gradient_checkpointing,
    # train_gm_unet.py:868-870), trading ~30% step FLOPs for O(depth) less
    # activation HBM.
    remat: bool = False


SD15_UNET_CONFIG = UNetConfig()
SD15_GM_UNET_CONFIG = UNetConfig(in_channels=8)
TINY_UNET_CONFIG = UNetConfig(
    block_out_channels=(32, 64),
    num_attention_heads=2,
    cross_attention_dim=32,
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    sample_size=8,
)


class UNet2DConditionModel(nn.Module):
    config: UNetConfig = SD15_UNET_CONFIG
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: Array,  # (B, C_in, H, W) — NCHW boundary (see channels_last)
        timesteps: Array,  # () or (B,)
        encoder_hidden_states: Array,  # (B, S, cross_attention_dim)
        down_block_additional_residuals: Optional[Tuple[Array, ...]] = None,
        mid_block_additional_residual: Optional[Array] = None,
        channels_last: bool = False,
    ) -> Array:
        """ControlNet hooks: the additional residuals (NHWC, one per skip +
        one for the mid state) are added exactly where diffusers adds them —
        to each stored skip and to the mid-block output.

        ``channels_last=True`` takes/returns NHWC directly, skipping the
        boundary transposes — the denoise scans keep latents NHWC across all
        50 steps (layout copies were ~7% of the step in device traces);
        NCHW remains the default boundary for reference API parity."""
        cfg = self.config
        if channels_last:
            x = sample.astype(self.dtype)
        else:
            x = jnp.transpose(sample, (0, 2, 3, 1)).astype(self.dtype)
        context = encoder_hidden_states.astype(self.dtype)
        b = x.shape[0]

        # Time embedding.
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

        if cfg.remat:
            ResBlock = nn.remat(ResnetBlock2D)
            TfmBlock = nn.remat(Transformer2D)
        else:
            ResBlock, TfmBlock = ResnetBlock2D, Transformer2D

        # --- down ---
        h = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype,
            name="conv_in",
        )(x)
        skips = [h]
        n_blocks = len(cfg.block_out_channels)
        for i, block_type in enumerate(cfg.down_block_types):
            out_ch = cfg.block_out_channels[i]
            heads, head_dim = heads_for(out_ch)
            for j in range(cfg.layers_per_block):
                h = ResBlock(
                    out_ch, dtype=self.dtype, name=f"down_{i}_resnet_{j}"
                )(h, temb)
                if block_type == "CrossAttnDownBlock2D":
                    h = TfmBlock(
                        out_ch,
                        heads,
                        head_dim,
                        cfg.cross_attention_dim,
                        depth=cfg.transformer_depth,
                        dtype=self.dtype,
                        name=f"down_{i}_attn_{j}",
                    )(h, context)
                skips.append(h)
            if i < n_blocks - 1:
                h = Downsample2D(out_ch, dtype=self.dtype, name=f"down_{i}_downsample")(h)
                skips.append(h)

        # --- mid ---
        mid_ch = cfg.block_out_channels[-1]
        heads, head_dim = heads_for(mid_ch)
        h = ResBlock(mid_ch, dtype=self.dtype, name="mid_resnet_0")(h, temb)
        h = TfmBlock(
            mid_ch,
            heads,
            head_dim,
            cfg.cross_attention_dim,
            depth=cfg.transformer_depth,
            dtype=self.dtype,
            name="mid_attn",
        )(h, context)
        h = ResBlock(mid_ch, dtype=self.dtype, name="mid_resnet_1")(h, temb)

        if down_block_additional_residuals is not None:
            if len(down_block_additional_residuals) != len(skips):
                raise ValueError(
                    f"expected {len(skips)} down residuals, got "
                    f"{len(down_block_additional_residuals)}"
                )
            skips = [
                s + r.astype(s.dtype)
                for s, r in zip(skips, down_block_additional_residuals)
            ]
        if mid_block_additional_residual is not None:
            h = h + mid_block_additional_residual.astype(h.dtype)

        # --- up ---
        rev_channels = tuple(reversed(cfg.block_out_channels))
        for i, block_type in enumerate(cfg.up_block_types):
            out_ch = rev_channels[i]
            heads, head_dim = heads_for(out_ch)
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResBlock(
                    out_ch, dtype=self.dtype, name=f"up_{i}_resnet_{j}"
                )(h, temb)
                if block_type == "CrossAttnUpBlock2D":
                    h = TfmBlock(
                        out_ch,
                        heads,
                        head_dim,
                        cfg.cross_attention_dim,
                        depth=cfg.transformer_depth,
                        dtype=self.dtype,
                        name=f"up_{i}_attn_{j}",
                    )(h, context)
            if i < n_blocks - 1:
                h = Upsample2D(out_ch, dtype=self.dtype, name=f"up_{i}_upsample")(h)

        # --- out ---
        h = GroupNorm(32, 1e-5, dtype=self.dtype, name="conv_norm_out")(
            h, activate=True
        )
        h = nn.Conv(
            cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(h)
        if channels_last:
            return h.astype(jnp.float32)
        return jnp.transpose(h, (0, 3, 1, 2)).astype(jnp.float32)


def inflate_conv_in(params, new_in_channels: int, scale: float = 0.5):
    """Widen a trained UNet's conv_in from C to ``new_in_channels`` by tiling
    the kernel along the input-channel axis and scaling (the reference
    repeats weights x0.5 so activations keep their magnitude,
    train_gm_unet.py:658-677). Returns a new param tree.
    """
    import flax

    params = flax.core.unfreeze(params) if hasattr(params, "unfreeze") else dict(params)
    kernel = params["conv_in"]["kernel"]  # (kh, kw, C_in, C_out) NHWC layout
    c_in = kernel.shape[2]
    if new_in_channels % c_in != 0:
        raise ValueError(f"cannot inflate conv_in {c_in} -> {new_in_channels}")
    reps = new_in_channels // c_in
    new_kernel = jnp.tile(kernel, (1, 1, reps, 1)) * scale
    new_conv = dict(params["conv_in"])
    new_conv["kernel"] = new_kernel
    params["conv_in"] = new_conv
    return params


__all__ = [
    "UNet2DConditionModel",
    "UNetConfig",
    "SD15_UNET_CONFIG",
    "SD15_GM_UNET_CONFIG",
    "TINY_UNET_CONFIG",
    "inflate_conv_in",
]
