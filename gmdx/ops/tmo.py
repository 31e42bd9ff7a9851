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


# BT.2020 luminance coefficients (the HDR frames are BT.2020 linear light
# before gamut compression — SURVEY.md §2.1 C3).
_BT2020_Y = (0.2627, 0.6780, 0.0593)


def tmo_2446a(
    hdr_img: Array,
    *,
    l_hdr: float = 1000.0,
    l_sdr: float = 100.0,
    alpha: float = 0.05,
    eps: float = 1e-6,
    channel_axis: int = 1,
) -> Array:
    """ITU-R BT.2446-0 Method A HDR->SDR tone mapping.

    The reference parses ``--tmo_2446a`` and sketches
    ``RGB_tmo_2446a(fmap_hdr/10)`` in a comment, but never defines the
    function (train_vqgan_lora.py:510-513, 1137-1139 — dead flag). This is a
    real implementation of the standard so the flag works in gmdx:

      1. crosstalk matrix ``(1-2a)RGB + a(G+B, R+B, R+G)`` desaturates
         highlights before the curve (a = 0.05 per the standard);
      2. luminance Y (BT.2020 weights), gamma-adjusted ``Y' = Y^(1/2.4)``;
      3. perceptual log compression ``Y'p = log(1+(rho_h-1)Y')/log(rho_h)``
         with ``rho = 1 + 32 (L/10000)^(1/2.4)`` at the HDR peak;
      4. the three-segment BT.2446-A knee curve on Y'p;
      5. inverse log + gamma at the SDR peak, per-pixel linear gain
         ``Y_sdr/Y_hdr`` applied to the crosstalked RGB, inverse crosstalk.

    Input is linear HDR normalized so 1.0 = ``l_hdr`` nits (the gmdx trainer
    passes ``hdr/(qmax+1)``). Output is linear SDR in [0, 1] (1.0 = ``l_sdr``
    nits). ``channel_axis`` follows gamut_compress: default 1 (NCHW training
    batches); pass -1 for NHWC.
    """
    x = jnp.moveaxis(jnp.clip(hdr_img, 0.0, None), channel_axis, -1)
    dt = x.dtype
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    # Step 1: crosstalk.
    a = alpha
    rc = (1 - 2 * a) * r + a * (g + b)
    gc = (1 - 2 * a) * g + a * (r + b)
    bc = (1 - 2 * a) * b + a * (r + g)
    xc = jnp.stack([rc, gc, bc], axis=-1)
    wy = jnp.asarray(_BT2020_Y, dtype=dt)
    y_hdr = jnp.clip(jnp.einsum("...c,c->...", xc, wy), 0.0, 1.0)
    # Steps 2-3: gamma + perceptual log compression at the HDR peak.
    yp = jnp.power(jnp.clip(y_hdr, eps, 1.0), 1.0 / 2.4)
    rho_h = 1.0 + 32.0 * (l_hdr / 10000.0) ** (1.0 / 2.4)
    ypp = jnp.log1p((rho_h - 1.0) * yp) / math.log(rho_h)
    # Step 4: three-segment knee curve (constants from BT.2446-0 Table 3).
    yc = jnp.where(
        ypp <= 0.7399,
        1.0770 * ypp,
        jnp.where(
            ypp < 0.9909,
            -1.1510 * ypp * ypp + 2.7811 * ypp - 0.6302,
            0.5000 * ypp + 0.5000,
        ),
    )
    # Step 5: invert the log + gamma at the SDR peak, scale, un-crosstalk.
    rho_s = 1.0 + 32.0 * (l_sdr / 10000.0) ** (1.0 / 2.4)
    y_sdr_p = jnp.expm1(yc * math.log(rho_s)) / (rho_s - 1.0)
    y_sdr = jnp.power(jnp.clip(y_sdr_p, 0.0, 1.0), 2.4)
    gain = y_sdr / jnp.maximum(y_hdr, eps)
    out = xc * gain[..., None]
    ro, go, bo = out[..., 0], out[..., 1], out[..., 2]
    d = 1.0 - 3.0 * a
    ri = ((1 - a) * ro - a * (go + bo)) / d
    gi = ((1 - a) * go - a * (ro + bo)) / d
    bi = ((1 - a) * bo - a * (ro + go)) / d
    out = jnp.clip(jnp.stack([ri, gi, bi], axis=-1), 0.0, 1.0).astype(dt)
    return jnp.moveaxis(out, -1, channel_axis)


# Aliases keeping the reference's public names importable.
tmo_cuda = mulog_tmo
tmo_mulog = mulog_tmo
random_tmo_cuda = random_tmo
RGB_tmo_2446a = tmo_2446a  # the name the reference's dead comment uses

__all__ = [
    "linear_scale_tmo",
    "hard_clip_tmo",
    "fix_mulog_tmo",
    "mulog_tmo",
    "tmo_mulog",
    "tmo_cuda",
    "random_tmo",
    "random_tmo_cuda",
    "tmo_2446a",
    "RGB_tmo_2446a",
]
