"""Eq.(1) HDR reconstruction from an SDR base layer + gain map.

Reference: gm_diffusion/stage1/tone_mapping.py:60-71 (torch, clamps output to
[0, qmax+1]) and the numpy twins embedded in every experiment script (e.g.
scripts/inference/experiments/formal_baseline.py:32-43, which do NOT clamp the
output). Per SURVEY.md §7.3 both conventions are exposed here through one
dtype-polymorphic function with a ``clip_output`` flag.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def apply_gm_to_sdr(
    gm: Array,
    sdr: Array,
    qmax: float = 9.0,
    eps: float = 1.0 / 64.0,
    *,
    clip_output: bool = True,
) -> Array:
    """Lift an SDR tensor to HDR using a gain-map prediction.

    ``HDR = (clip(sdr, 0, 1)^2.2 + eps) * (1 + gm * qmax) - eps``

    Args:
      gm: gain map in [0, 1], broadcastable against ``sdr``.
      sdr: SDR base layer, nominally in [0, 1] (clamped internally).
      qmax: peak gain. Reference discipline: 49 during Stage-1 training and
        validation, 99 at Stage-3 inference, 9 as the op default.
      eps: linearization offset (1/64 in the paper's Eq. (1)).
      clip_output: True matches the torch op (clamp to [0, qmax+1], used for
        training); False matches the experiments' numpy twin (used for parity
        with exported .hdr files).
    """
    sdr_linear = jnp.clip(sdr, 0.0, 1.0) ** 2.2
    hdr = (sdr_linear + eps) * (1.0 + gm * qmax) - eps
    if clip_output:
        hdr = jnp.clip(hdr, 0.0, qmax + 1.0)
    return hdr


__all__ = ["apply_gm_to_sdr"]
