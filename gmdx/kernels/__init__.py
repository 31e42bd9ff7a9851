"""Compute kernels: attention and fused-norm seams with Pallas fast paths.

Every model-layer call goes through these wrappers so the Pallas TPU kernels
and the jnp reference paths stay interchangeable (set ``use_pallas=False`` or
the GMDX_NO_PALLAS env var to force the XLA path).
"""

from gmdx.kernels.attention import dot_product_attention
from gmdx.kernels.flash_attention import flash_attention
from gmdx.kernels.geglu_ff import geglu_ff, geglu_ff_ln
from gmdx.kernels.winograd import winograd_conv3x3

__all__ = [
    "dot_product_attention",
    "flash_attention",
    "geglu_ff",
    "geglu_ff_ln",
    "winograd_conv3x3",
]
