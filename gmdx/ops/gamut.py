"""BT.2020 -> BT.709 gamut compression.

Reference: gm_diffusion/stage1/tone_mapping.py:74-90. The reference permutes a
NCHW batch to NHWC, right-multiplies by the transposed 3x3 conversion matrix,
permutes back, and clamps to [0, 1].

Here the op is axis-polymorphic: it contracts the channel axis with one einsum
(a tiny matmul XLA fuses into the surrounding elementwise graph — the NCHW
permute round-trip would cost two HBM-bandwidth transposes on TPU for nothing).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# Row-major BT.2020 -> BT.709 primaries conversion (same values as
# tone_mapping.py:78-86 before the in-code transpose). Host constant —
# importing gmdx must not touch a device backend.
BT2020_TO_BT709 = np.array(
    [
        [1.660491, -0.587641, -0.072850],
        [-0.124550, 1.132900, -0.008349],
        [-0.018151, -0.100579, 1.118730],
    ],
    dtype=np.float32,
)


def gamut_compress(tmo_hdr_img: Array, *, channel_axis: int = 1) -> Array:
    """Convert a tone-mapped image from BT.2020 to BT.709 and clamp to [0, 1].

    Args:
      tmo_hdr_img: image with a size-3 channel axis, e.g. (B, 3, H, W).
      channel_axis: which axis carries RGB. Default 1 (NCHW) matches the
        reference's batched contract; pass -1 for NHWC device layouts.
    """
    m = jnp.asarray(BT2020_TO_BT709, dtype=tmo_hdr_img.dtype)
    moved = jnp.moveaxis(tmo_hdr_img, channel_axis, -1)
    # HIGHEST precision: a 3x3 contraction is free, and the default TPU
    # bf16 MXU path would cost ~3 decimal digits of color accuracy.
    out = jnp.einsum(
        "...c,oc->...o", moved, m, precision=jax.lax.Precision.HIGHEST
    )
    out = jnp.moveaxis(out, -1, channel_axis)
    return jnp.clip(out, 0.0, 1.0)


__all__ = ["gamut_compress", "BT2020_TO_BT709"]
