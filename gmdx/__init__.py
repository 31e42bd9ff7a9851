"""gmdx — TPU-native gain-map decomposed HDR diffusion framework.

A ground-up JAX / Flax / Pallas rebuild of the capabilities of GM-Diffusion
("HDR Image Generation via Gain Map Decomposed Diffusion", ICCV 2025).

Public surface mirrors the reference package exports
(reference: gm_diffusion/__init__.py:16-34) while the implementation is
idiomatic TPU-first JAX: pure functional ops, explicit PRNG keys, scan-based
denoising loops, mesh/pjit parallelism.
"""

from gmdx.ops import (
    apply_gm_to_sdr,
    fix_mulog_tmo,
    hard_clip_tmo,
    linear_scale_tmo,
    tmo_mulog,
    random_tmo,
    gamut_compress,
    RandomExposureAdjust,
)

__version__ = "0.1.0"

__all__ = [
    "apply_gm_to_sdr",
    "fix_mulog_tmo",
    "hard_clip_tmo",
    "linear_scale_tmo",
    "tmo_mulog",
    "random_tmo",
    "gamut_compress",
    "RandomExposureAdjust",
    "__version__",
]
