"""Inference pipelines: single-UNet GM synthesis and dual-UNet text-to-HDR.

Reference surface (gm_diffusion/pipelines/__init__.py:5-19) rebuilt as
functional jitted ``lax.scan`` loops over explicit scheduler state.
"""

from gmdx.pipelines.gm import StableDiffusionGMPipeline, rescale_noise_cfg
from gmdx.pipelines.dual import (
    StableDiffusionDualUNetPipeline,
    StableDiffusionDualUNetImprovedPipeline,
)
from gmdx.pipelines.controlnet import (
    StableDiffusionControlNetHDRPipeline,
    upconvert_sdr_to_hdrtv,
)
from gmdx.pipelines.pp import PipelinedDualUNet, pp_stage_meshes

__all__ = [
    "StableDiffusionGMPipeline",
    "StableDiffusionDualUNetPipeline",
    "StableDiffusionDualUNetImprovedPipeline",
    "StableDiffusionControlNetHDRPipeline",
    "upconvert_sdr_to_hdrtv",
    "PipelinedDualUNet",
    "pp_stage_meshes",
    "rescale_noise_cfg",
]
