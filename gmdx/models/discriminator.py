"""Paella-style conv GAN discriminator for Stage-1 adversarial training.

Behavioral parity with the reference's port (gm_diffusion/stage1/
discriminator.py:13-48): spectral-norm 3x3 stride-2 conv stack of ``depth``
layers with channel ramp hidden/(2^max(d-i,0)) (d = max(depth-3, 3)),
InstanceNorm + LeakyReLU(0.2) between layers, optional conditioning vector
broadcast to the final feature map, 1x1 head, sigmoid.

NCHW at the call boundary; NHWC inside. Spectral norm uses flax's power-
iteration wrapper, so ``__call__`` takes a ``train``/``update_sn`` flag and
mutable ``batch_stats``.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class InstanceNorm(nn.Module):
    """Per-sample, per-channel spatial normalization (no affine params,
    matching torch's InstanceNorm2d(affine=False) default)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:  # NHWC
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon)


class Discriminator(nn.Module):
    in_channels: int = 3
    cond_channels: int = 0
    hidden_channels: int = 512
    depth: int = 6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: Array, cond: Optional[Array] = None, *, update_sn: bool = False
    ) -> Array:
        """x: (B, C, H, W) -> sigmoid score map (B, 1, H', W')."""
        h = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype)
        d = max(self.depth - 3, 3)

        def sn_conv(features: int, name: str):
            return nn.SpectralNorm(
                nn.Conv(
                    features, (3, 3), strides=2, padding=1, dtype=self.dtype,
                    name=name,
                ),
                collection_name="batch_stats",
            )

        h = sn_conv(self.hidden_channels // (2**d), "conv_0")(
            h, update_stats=update_sn
        )
        h = nn.leaky_relu(h, 0.2)
        for i in range(self.depth - 1):
            c_out = self.hidden_channels // (2 ** max(d - 1 - i, 0))
            h = sn_conv(c_out, f"conv_{i + 1}")(h, update_stats=update_sn)
            h = InstanceNorm(name=f"norm_{i + 1}")(h)
            h = nn.leaky_relu(h, 0.2)

        if cond is not None:
            b, _, hh, ww = h.shape[0], None, h.shape[1], h.shape[2]
            cond_map = jnp.broadcast_to(
                cond.astype(h.dtype)[:, None, None, :],
                (b, hh, ww, cond.shape[-1]),
            )
            h = jnp.concatenate([h, cond_map], axis=-1)

        h = nn.Conv(1, (1, 1), dtype=self.dtype, name="shuffle")(h)
        h = jax.nn.sigmoid(h.astype(jnp.float32))
        return jnp.transpose(h, (0, 3, 1, 2))


__all__ = ["Discriminator", "InstanceNorm"]
