"""CLIP text encoder (ViT-L/14 text tower), Flax.

Parity target: the transformers CLIPTextModel the reference uses for prompt
encoding (77-token causal transformer, quickgelu, final LayerNorm; clip_skip
selects an earlier hidden state then re-applies the final LN —
stable_diffusion_gm.py:424-439). 77-token sequences are tiny, so attention is
a plain fused-softmax einsum with causal mask; the flash kernel is reserved
for the latent grids.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5


CLIP_VIT_L_CONFIG = CLIPTextConfig()
TINY_CLIP_CONFIG = CLIPTextConfig(
    vocab_size=1000, hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64
)


def quick_gelu(x: Array) -> Array:
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, causal_mask: Array) -> Array:
        cfg = self.config
        head_dim = cfg.hidden_size // cfg.num_heads
        b, s, _ = x.shape

        def split_heads(t):
            return t.reshape(b, s, cfg.num_heads, head_dim).transpose(0, 2, 1, 3)

        q = split_heads(nn.Dense(cfg.hidden_size, dtype=self.dtype, name="q_proj")(x))
        k = split_heads(nn.Dense(cfg.hidden_size, dtype=self.dtype, name="k_proj")(x))
        v = split_heads(nn.Dense(cfg.hidden_size, dtype=self.dtype, name="v_proj")(x))

        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * head_dim**-0.5
        logits = jnp.where(causal_mask, logits, -1e9)
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", w, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, cfg.hidden_size)
        return nn.Dense(cfg.hidden_size, dtype=self.dtype, name="out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, causal_mask: Array) -> Array:
        cfg = self.config
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="norm1")(x)
        x = x + CLIPAttention(cfg, dtype=self.dtype, name="attn")(h, causal_mask)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    config: CLIPTextConfig = CLIP_VIT_L_CONFIG
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: Array,  # (B, S) int32
        clip_skip: Optional[int] = None,
    ) -> Array:
        """Returns the (B, S, hidden) embedding the SD UNet cross-attends to:
        the final-LN output, or with clip_skip the final LN applied to the
        hidden state ``clip_skip`` layers before the last."""
        cfg = self.config
        b, s = input_ids.shape
        tok = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=self.dtype, name="token_embedding"
        )(input_ids)
        pos = nn.Embed(
            cfg.max_position_embeddings,
            cfg.hidden_size,
            dtype=self.dtype,
            name="position_embedding",
        )(jnp.arange(s)[None, :])
        x = tok + pos

        causal = jnp.tril(jnp.ones((1, 1, s, s), bool))
        # diffusers clip_skip semantics: hidden_states[-(clip_skip + 2)], i.e.
        # run (num_layers - clip_skip - 1) layers, then the final LN.
        n_run = (
            cfg.num_layers if clip_skip is None else cfg.num_layers - clip_skip - 1
        )
        for i in range(n_run):
            x = CLIPEncoderLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(x, causal)
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="final_layer_norm"
        )(x)
        return x.astype(jnp.float32)


__all__ = [
    "CLIPTextModel",
    "CLIPTextConfig",
    "CLIP_VIT_L_CONFIG",
    "TINY_CLIP_CONFIG",
    "quick_gelu",
]
