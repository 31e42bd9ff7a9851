"""Pure-jnp HDR math ops (layer L1 of the reference).

Reference surface: gm_diffusion/stage1/__init__.py:6-28.
"""

from gmdx.ops.tmo import (
    linear_scale_tmo,
    hard_clip_tmo,
    fix_mulog_tmo,
    mulog_tmo,
    tmo_mulog,
    tmo_cuda,
    random_tmo,
    random_tmo_cuda,
    tmo_2446a,
    RGB_tmo_2446a,
)
from gmdx.ops.reconstruct import apply_gm_to_sdr
from gmdx.ops.gamut import gamut_compress, BT2020_TO_BT709
from gmdx.ops.exposure import (
    RandomExposureAdjust,
    random_exposure_adjust,
    sample_camera_curve,
    apply_inv_sigmoid_curve,
    discretize_to_uint16,
    hdr_to_ldr,
)

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
    "apply_gm_to_sdr",
    "gamut_compress",
    "BT2020_TO_BT709",
    "RandomExposureAdjust",
    "random_exposure_adjust",
    "sample_camera_curve",
    "apply_inv_sigmoid_curve",
    "discretize_to_uint16",
    "hdr_to_ldr",
]
