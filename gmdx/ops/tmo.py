"""Tone-mapping operators as pure jnp functions.

Behavioral parity targets (reference: gm_diffusion/stage1/tone_mapping.py:14-57):
  * ``linear_scale_tmo``  — peak-luminance rescale ``img / (qmax + 1)``.
  * ``hard_clip_tmo``     — clamp to [0, 1]; qmax ignored (API compatibility).
  * ``fix_mulog_tmo``     — mu-law log curve, mu=500, after peak rescale, clamped.
  * ``tmo_mulog``         — mu=5000 curve on ``clip(img/10, 0, 1)``; the reference
                            names this ``tmo_cuda`` (a CUDA-ism); we keep an alias.
  * ``random_tmo``        — mu ~ U(500, 5000) mu-law curve; takes an explicit JAX
                            PRNG key instead of Python ``random`` global state so it
                            is jittable and reproducible under vmap/scan.

All functions are shape- and dtype-polymorphic elementwise maps: they run on the
VPU under jit and fuse with neighbouring ops, so no Pallas kernel is warranted.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array


def linear_scale_tmo(img: Array, qmax: float) -> Array:
    """Scale an HDR tensor back to [0, 1] by dividing by the peak luminance."""
    return img / (qmax + 1.0)


def hard_clip_tmo(hdr_img: Array, qmax: float | None = None) -> Array:
    """Clamp HDR values to [0, 1]; ignores ``qmax`` but keeps the signature."""
    del qmax
    return jnp.clip(hdr_img, 0.0, 1.0)


def _mulog(x: Array, mu) -> Array:
    """mu-law companding curve ``log(1 + mu x) / log(1 + mu)`` on [0, 1] input."""
    return jnp.log1p(mu * x) / jnp.log1p(jnp.asarray(mu, dtype=x.dtype))


def fix_mulog_tmo(hdr_img: Array, qmax: float) -> Array:
    """Logarithmic tone mapping with a fixed mu=500 parameter."""
    x = hdr_img / (qmax + 1.0)
    mu = 500.0
    tm = jnp.log1p(mu * x) / math.log1p(mu)
    return jnp.clip(tm, 0.0, 1.0)


def mulog_tmo(hdr_img: Array) -> Array:
    """mu=5000 logarithmic tone mapping on ``clip(img / 10, 0, 1)``.

    The reference version (``tmo_cuda``) raises ValueError when the rescaled
    input leaves [0, 1]; that check is unreachable after its own clamp, and a
    Python raise cannot exist under jit, so it is dropped here.
    """
    x = jnp.clip(hdr_img / 10.0, 0.0, 1.0)
    mu = 5000.0
    return jnp.log1p(mu * x) / math.log1p(mu)


def random_tmo(key: Array, hdr_img: Array, qmax: float) -> Array:
    """mu-law tone map with mu ~ U(500, 5000), seeded by an explicit PRNG key.

    The reference draws mu from Python's global ``random`` module
    (tone_mapping.py:50-57); here the draw is a jittable ``jax.random.uniform``
    so a traced training step stays deterministic per key.
    """
    x = hdr_img / (qmax + 1.0)
    mu = jax.random.uniform(key, (), dtype=jnp.float32, minval=500.0, maxval=5000.0)
    mu = mu.astype(x.dtype)
    tm = jnp.log1p(mu * x) / jnp.log1p(mu)
    return jnp.clip(tm, 0.0, 1.0)


# Aliases keeping the reference's public names importable.
tmo_cuda = mulog_tmo
tmo_mulog = mulog_tmo
random_tmo_cuda = random_tmo

__all__ = [
    "linear_scale_tmo",
    "hard_clip_tmo",
    "fix_mulog_tmo",
    "mulog_tmo",
    "tmo_mulog",
    "tmo_cuda",
    "random_tmo",
    "random_tmo_cuda",
]
