"""Torch SD-1.5-architecture UNet/VAE with diffusers state-dict naming.

These are the reference-side halves of the parity harness: the diffusers
package is not installed here, so the reference pipelines (which expect
diffusers ``UNet2DConditionModel`` / ``AutoencoderKL`` instances) are fed
these instead. Submodule names reproduce the diffusers module tree exactly,
so ``load_state_dict(export_unet_state_dict(gmdx_params), strict=True)``
both transfers the weights *and* proves the converter emits the real
diffusers key space (VERDICT.md round-1 item 5).

Architecture parity target: the SD-1.5 config the reference pins at
scripts/inference/generate_hdr.py:115-135 (GroupNorm(32), SiLU, GEGLU FF,
pre-norm transformer blocks, nearest-2x upsample). Forward math mirrors
gmdx/models/{unet2d,vae,layers}.py at fp32.

Torch-only module — no jax imports.
"""

from __future__ import annotations

import dataclasses
from types import SimpleNamespace
from typing import List, Optional, Tuple

import torch
import torch.nn.functional as F
from torch import nn


def _cfg_namespace(**kw) -> SimpleNamespace:
    ns = SimpleNamespace(**kw)
    return ns


class TimestepEmbedding(nn.Module):
    def __init__(self, in_dim: int, dim: int):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


def timestep_embedding(
    timesteps: torch.Tensor,
    dim: int,
    *,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> torch.Tensor:
    """Sinusoid matching gmdx/models/layers.py:timestep_embedding."""
    import math

    timesteps = torch.atleast_1d(timesteps).float()
    half = dim // 2
    exponent = -math.log(max_period) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = timesteps[:, None] * torch.exp(exponent)[None, :]
    sin, cos = torch.sin(emb), torch.cos(emb)
    out = torch.cat([cos, sin] if flip_sin_to_cos else [sin, cos], dim=-1)
    if dim % 2 == 1:
        out = F.pad(out, (0, 1))
    return out


class ResnetBlock2D(nn.Module):
    def __init__(self, in_ch: int, out_ch: int, temb_dim: Optional[int]):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, in_ch, eps=1e-5)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        if temb_dim is not None:
            self.time_emb_proj = nn.Linear(temb_dim, out_ch)
        self.norm2 = nn.GroupNorm(32, out_ch, eps=1e-5)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        if in_ch != out_ch:
            self.conv_shortcut = nn.Conv2d(in_ch, out_ch, 1)
        else:
            self.conv_shortcut = None

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None and hasattr(self, "time_emb_proj"):
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class Attention(nn.Module):
    """Transformer-block attention: no-bias qkv, bias on to_out.0."""

    def __init__(self, query_dim: int, heads: int, head_dim: int,
                 context_dim: Optional[int] = None):
        super().__init__()
        inner = heads * head_dim
        ctx = context_dim if context_dim is not None else query_dim
        self.heads = heads
        self.head_dim = head_dim
        self.to_q = nn.Linear(query_dim, inner, bias=False)
        self.to_k = nn.Linear(ctx, inner, bias=False)
        self.to_v = nn.Linear(ctx, inner, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(inner, query_dim), nn.Dropout(0.0)])

    def forward(self, x, context=None):
        context = x if context is None else context
        b, sq, _ = x.shape
        sk = context.shape[1]
        q = self.to_q(x).view(b, sq, self.heads, self.head_dim).transpose(1, 2)
        k = self.to_k(context).view(b, sk, self.heads, self.head_dim).transpose(1, 2)
        v = self.to_v(context).view(b, sk, self.heads, self.head_dim).transpose(1, 2)
        out = F.scaled_dot_product_attention(q, k, v)
        out = out.transpose(1, 2).reshape(b, sq, self.heads * self.head_dim)
        return self.to_out[1](self.to_out[0](out))


class GEGLU(nn.Module):
    def __init__(self, dim: int, inner: int):
        super().__init__()
        self.proj = nn.Linear(dim, inner * 2)

    def forward(self, x):
        hidden, gate = self.proj(x).chunk(2, dim=-1)
        return hidden * F.gelu(gate)


class FeedForward(nn.Module):
    def __init__(self, dim: int, mult: int = 4):
        super().__init__()
        inner = dim * mult
        self.net = nn.ModuleList(
            [GEGLU(dim, inner), nn.Dropout(0.0), nn.Linear(inner, dim)]
        )

    def forward(self, x):
        for layer in self.net:
            x = layer(x)
        return x


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim: int, heads: int, head_dim: int, context_dim: int):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = Attention(dim, heads, head_dim)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = Attention(dim, heads, head_dim, context_dim=context_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = FeedForward(dim)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        return x + self.ff(self.norm3(x))


class Transformer2DModel(nn.Module):
    def __init__(self, channels: int, heads: int, head_dim: int,
                 context_dim: int, depth: int = 1):
        super().__init__()
        self.norm = nn.GroupNorm(32, channels, eps=1e-6)
        self.proj_in = nn.Conv2d(channels, channels, 1)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(channels, heads, head_dim, context_dim)
             for _ in range(depth)]
        )
        self.proj_out = nn.Conv2d(channels, channels, 1)

    def forward(self, x, context):
        b, c, h, w = x.shape
        residual = x
        x = self.proj_in(self.norm(x))
        x = x.permute(0, 2, 3, 1).reshape(b, h * w, c)
        for block in self.transformer_blocks:
            x = block(x, context)
        x = x.reshape(b, h, w, c).permute(0, 3, 1, 2)
        return self.proj_out(x) + residual


class Downsample2D(nn.Module):
    def __init__(self, channels: int, asymmetric_pad: bool = False):
        super().__init__()
        self.asymmetric_pad = asymmetric_pad
        pad = 0 if asymmetric_pad else 1
        self.conv = nn.Conv2d(channels, channels, 3, stride=2, padding=pad)

    def forward(self, x):
        if self.asymmetric_pad:
            x = F.pad(x, (0, 1, 0, 1))
        return self.conv(x)


class Upsample2D(nn.Module):
    def __init__(self, channels: int):
        super().__init__()
        self.conv = nn.Conv2d(channels, channels, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class _DownBlock(nn.Module):
    """Holds resnets / attentions / downsamplers under diffusers names."""

    def __init__(self, in_ch, out_ch, temb_dim, layers, cross_attn, heads,
                 head_dim, context_dim, add_downsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(in_ch if j == 0 else out_ch, out_ch, temb_dim)
             for j in range(layers)]
        )
        if cross_attn:
            self.attentions = nn.ModuleList(
                [Transformer2DModel(out_ch, heads, head_dim, context_dim)
                 for _ in range(layers)]
            )
        if add_downsample:
            self.downsamplers = nn.ModuleList([Downsample2D(out_ch)])


class _UpBlock(nn.Module):
    def __init__(self, prev_ch, skip_chs, out_ch, temb_dim, cross_attn, heads,
                 head_dim, context_dim, add_upsample):
        super().__init__()
        resnets = []
        ch = prev_ch
        for skip in skip_chs:
            resnets.append(ResnetBlock2D(ch + skip, out_ch, temb_dim))
            ch = out_ch
        self.resnets = nn.ModuleList(resnets)
        if cross_attn:
            self.attentions = nn.ModuleList(
                [Transformer2DModel(out_ch, heads, head_dim, context_dim)
                 for _ in range(len(skip_chs))]
            )
        if add_upsample:
            self.upsamplers = nn.ModuleList([Upsample2D(out_ch)])


class _MidBlock(nn.Module):
    def __init__(self, ch, temb_dim, heads, head_dim, context_dim):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(ch, ch, temb_dim), ResnetBlock2D(ch, ch, temb_dim)]
        )
        self.attentions = nn.ModuleList(
            [Transformer2DModel(ch, heads, head_dim, context_dim)]
        )


class UNet2DConditionModel(nn.Module):
    """Diffusers-named SD UNet; config mirrors gmdx UNetConfig fields."""

    def __init__(self, config):
        super().__init__()
        # accept the gmdx dataclass or a plain namespace
        cfg = config
        if dataclasses.is_dataclass(cfg):
            cfg = SimpleNamespace(**dataclasses.asdict(cfg))
        self.config = cfg
        self.config.time_cond_proj_dim = None  # pipeline probes this
        self.sample_size = cfg.sample_size
        chs: Tuple[int, ...] = tuple(cfg.block_out_channels)
        temb_dim = chs[0] * 4
        heads = cfg.num_attention_heads
        ctx = cfg.cross_attention_dim
        layers = cfg.layers_per_block
        n = len(chs)

        self.conv_in = nn.Conv2d(cfg.in_channels, chs[0], 3, padding=1)
        self.time_embedding = TimestepEmbedding(chs[0], temb_dim)

        self.down_blocks = nn.ModuleList()
        skip_chs: List[int] = [chs[0]]
        in_ch = chs[0]
        for i, btype in enumerate(cfg.down_block_types):
            out_ch = chs[i]
            cross = btype == "CrossAttnDownBlock2D"
            add_down = i < n - 1
            self.down_blocks.append(
                _DownBlock(in_ch, out_ch, temb_dim, layers, cross, heads,
                           out_ch // heads, ctx, add_down)
            )
            skip_chs.extend([out_ch] * layers)
            if add_down:
                skip_chs.append(out_ch)
            in_ch = out_ch

        self.mid_block = _MidBlock(chs[-1], temb_dim, heads, chs[-1] // heads, ctx)

        self.up_blocks = nn.ModuleList()
        rev = tuple(reversed(chs))
        prev_ch = chs[-1]
        for i, btype in enumerate(cfg.up_block_types):
            out_ch = rev[i]
            cross = btype == "CrossAttnUpBlock2D"
            skips = [skip_chs.pop() for _ in range(layers + 1)]
            self.up_blocks.append(
                _UpBlock(prev_ch, skips, out_ch, temb_dim, cross, heads,
                         out_ch // heads, ctx, add_upsample=i < n - 1)
            )
            prev_ch = out_ch

        self.conv_norm_out = nn.GroupNorm(32, chs[0], eps=1e-5)
        self.conv_out = nn.Conv2d(chs[0], cfg.out_channels, 3, padding=1)

    @property
    def dtype(self):
        return next(self.parameters()).dtype

    @property
    def device(self):
        return next(self.parameters()).device

    def forward(self, sample, timestep, encoder_hidden_states,
                timestep_cond=None, cross_attention_kwargs=None,
                added_cond_kwargs=None, return_dict: bool = True):
        cfg = self.config
        b = sample.shape[0]
        t = torch.as_tensor(timestep)
        if t.ndim == 0:
            t = t.expand(b)
        t_sin = timestep_embedding(
            t, cfg.block_out_channels[0],
            flip_sin_to_cos=cfg.flip_sin_to_cos,
            downscale_freq_shift=cfg.freq_shift,
        ).to(sample.dtype)
        temb = self.time_embedding(t_sin)
        context = encoder_hidden_states

        h = self.conv_in(sample)
        skips = [h]
        for block in self.down_blocks:
            attns = getattr(block, "attentions", None)
            for j, resnet in enumerate(block.resnets):
                h = resnet(h, temb)
                if attns is not None:
                    h = attns[j](h, context)
                skips.append(h)
            if hasattr(block, "downsamplers"):
                h = block.downsamplers[0](h)
                skips.append(h)

        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, context)
        h = self.mid_block.resnets[1](h, temb)

        for block in self.up_blocks:
            attns = getattr(block, "attentions", None)
            for j, resnet in enumerate(block.resnets):
                h = torch.cat([h, skips.pop()], dim=1)
                h = resnet(h, temb)
                if attns is not None:
                    h = attns[j](h, context)
            if hasattr(block, "upsamplers"):
                h = block.upsamplers[0](h)

        h = self.conv_out(F.silu(self.conv_norm_out(h)))
        if not return_dict:
            return (h,)
        return SimpleNamespace(sample=h)


class VAEAttention(nn.Module):
    """Single-head VAE mid-block attention, diffusers `Attention` names."""

    def __init__(self, channels: int):
        super().__init__()
        self.group_norm = nn.GroupNorm(32, channels, eps=1e-6)
        self.to_q = nn.Linear(channels, channels)
        self.to_k = nn.Linear(channels, channels)
        self.to_v = nn.Linear(channels, channels)
        self.to_out = nn.ModuleList([nn.Linear(channels, channels), nn.Dropout(0.0)])

    def forward(self, x):
        b, c, h, w = x.shape
        residual = x
        y = self.group_norm(x)
        y = y.permute(0, 2, 3, 1).reshape(b, h * w, c)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        out = F.scaled_dot_product_attention(
            q[:, None], k[:, None], v[:, None]
        )[:, 0]
        out = self.to_out[1](self.to_out[0](out))
        return out.reshape(b, h, w, c).permute(0, 3, 1, 2) + residual


class _VAEMidBlock(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(ch, ch, None), ResnetBlock2D(ch, ch, None)]
        )
        self.attentions = nn.ModuleList([VAEAttention(ch)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class _VAEDownBlock(nn.Module):
    def __init__(self, in_ch, out_ch, layers, add_downsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(in_ch if j == 0 else out_ch, out_ch, None)
             for j in range(layers)]
        )
        if add_downsample:
            self.downsamplers = nn.ModuleList(
                [Downsample2D(out_ch, asymmetric_pad=True)]
            )


class _VAEUpBlock(nn.Module):
    def __init__(self, in_ch, out_ch, layers, add_upsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(in_ch if j == 0 else out_ch, out_ch, None)
             for j in range(layers)]
        )
        if add_upsample:
            self.upsamplers = nn.ModuleList([Upsample2D(out_ch)])


class Encoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        chs = tuple(cfg.block_out_channels)
        n = len(chs)
        self.conv_in = nn.Conv2d(cfg.in_channels, chs[0], 3, padding=1)
        self.down_blocks = nn.ModuleList()
        in_ch = chs[0]
        for i, out_ch in enumerate(chs):
            self.down_blocks.append(
                _VAEDownBlock(in_ch, out_ch, cfg.layers_per_block, i < n - 1)
            )
            in_ch = out_ch
        self.mid_block = _VAEMidBlock(chs[-1])
        self.conv_norm_out = nn.GroupNorm(32, chs[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(chs[-1], 2 * cfg.latent_channels, 3, padding=1)

    def forward(self, x):
        h = self.conv_in(x)
        for block in self.down_blocks:
            for resnet in block.resnets:
                h = resnet(h)
            if hasattr(block, "downsamplers"):
                h = block.downsamplers[0](h)
        h = self.mid_block(h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class Decoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        chs = tuple(cfg.block_out_channels)
        n = len(chs)
        rev = tuple(reversed(chs))
        self.conv_in = nn.Conv2d(cfg.latent_channels, rev[0], 3, padding=1)
        self.mid_block = _VAEMidBlock(rev[0])
        self.up_blocks = nn.ModuleList()
        in_ch = rev[0]
        for i, out_ch in enumerate(rev):
            self.up_blocks.append(
                _VAEUpBlock(in_ch, out_ch, cfg.layers_per_block + 1, i < n - 1)
            )
            in_ch = out_ch
        self.conv_norm_out = nn.GroupNorm(32, chs[0], eps=1e-6)
        self.conv_out = nn.Conv2d(chs[0], cfg.out_channels, 3, padding=1)

    def forward(self, z):
        h = self.conv_in(z)
        h = self.mid_block(h)
        for block in self.up_blocks:
            for resnet in block.resnets:
                h = resnet(h)
            if hasattr(block, "upsamplers"):
                h = block.upsamplers[0](h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class DiagonalGaussianDistribution:
    def __init__(self, moments: torch.Tensor):
        self.mean, logvar = moments.chunk(2, dim=1)
        self.logvar = logvar.clamp(-30.0, 20.0)
        self.std = torch.exp(0.5 * self.logvar)

    def sample(self, generator=None):
        noise = torch.randn(
            self.mean.shape, generator=generator, dtype=self.mean.dtype
        )
        return self.mean + self.std * noise

    def mode(self):
        return self.mean


class AutoencoderKL(nn.Module):
    """Diffusers-named KL VAE; config mirrors gmdx VAEConfig fields."""

    def __init__(self, config):
        super().__init__()
        cfg = config
        if dataclasses.is_dataclass(cfg):
            cfg = SimpleNamespace(**dataclasses.asdict(cfg))
        self.config = cfg
        self.encoder = Encoder(cfg)
        self.decoder = Decoder(cfg)
        self.quant_conv = nn.Conv2d(2 * cfg.latent_channels, 2 * cfg.latent_channels, 1)
        self.post_quant_conv = nn.Conv2d(cfg.latent_channels, cfg.latent_channels, 1)

    @property
    def dtype(self):
        return next(self.parameters()).dtype

    @property
    def device(self):
        return next(self.parameters()).device

    def encode(self, x, return_dict: bool = True):
        posterior = DiagonalGaussianDistribution(self.quant_conv(self.encoder(x)))
        if not return_dict:
            return (posterior,)
        return SimpleNamespace(latent_dist=posterior)

    def decode(self, z, return_dict: bool = True, generator=None):
        img = self.decoder(self.post_quant_conv(z))
        if not return_dict:
            return (img,)
        return SimpleNamespace(sample=img)


class VGG19Features(nn.Module):
    """VGG19 conv stack in the torchvision ``features.N.*`` key layout
    (what ``gmdx.io.torch_import.convert_vgg19_state_dict`` consumes and the
    timm/torchvision checkpoints ship). Forward takes an already-normalized
    NCHW batch and returns the five pre-pool stage maps — the same taps as
    gmdx/models/vgg.py:VGG19Features."""

    LAYOUT = (
        64, 64, "M",
        128, 128, "M",
        256, 256, 256, 256, "M",
        512, 512, 512, 512, "M",
        512, 512, 512, 512, "M",
    )

    def __init__(self, width_mult: float = 1.0):
        super().__init__()
        layers = []
        in_ch = 3
        for spec in self.LAYOUT:
            if spec == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                out_ch = max(int(spec * width_mult), 1)
                layers.append(nn.Conv2d(in_ch, out_ch, 3, padding=1))
                layers.append(nn.ReLU(inplace=False))
                in_ch = out_ch
        self.features = nn.Sequential(*layers)

    def forward(self, x):
        feats = []
        h = x
        for layer in self.features:
            if isinstance(layer, nn.MaxPool2d):
                feats.append(h)
            h = layer(h)
        return feats


__all__ = [
    "UNet2DConditionModel",
    "AutoencoderKL",
    "DiagonalGaussianDistribution",
    "VGG19Features",
    "timestep_embedding",
]
