"""Reference bridge: run the PyTorch GM-Diffusion reference at tiny scale.

The driver's parity gate (BASELINE.json: "HDR PSNR >= 40 dB vs PyTorch
reference") needs the reference implementation actually executed next to
gmdx. This sandbox has torch + transformers + peft but **no diffusers**, so
this package supplies the minimum to run the reference's own pipeline
*classes* (mounted read-only at /root/reference) unmodified:

  * ``torch_models``      — torch UNet2DConditionModel / AutoencoderKL with
    diffusers-compatible ``state_dict`` key naming, so
    ``gmdx.io.torch_import.export_*_state_dict`` output loads with
    ``load_state_dict(..., strict=True)``. That load IS the converter proof.
  * ``torch_schedulers``  — torch DDPM/PNDM/DDIM/DPM++ transcriptions of the
    diffusers algorithms (independent implementations, written torch-side;
    they double as the trajectory-golden generators for the JAX schedulers).
  * ``diffusers_shim``    — a ``sys.modules`` stand-in for the diffusers
    symbols the reference pipelines import (DiffusionPipeline base,
    randn_tensor, mixins, output dataclasses). Installed only when the real
    diffusers is absent.
  * ``load_reference_pipeline`` — import a pipeline class straight from
    /root/reference/gm_diffusion/pipelines/*.py under the shim.

This package is parity/test tooling: torch-only, never imported by the JAX
runtime path.
"""

from __future__ import annotations

import importlib.util
import os
import sys

REFERENCE_ROOT = os.environ.get("GMDX_REFERENCE_ROOT", "/root/reference")

_PIPELINE_FILES = {
    "StableDiffusionGMPipeline": "stable_diffusion_gm.py",
    "StableDiffusionDualUNetPipeline": "stable_diffusion_dual_unet.py",
    "StableDiffusionDualUNetImprovedPipeline": (
        "stable_diffusion_dual_unet_improved.py"
    ),
}


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "gm_diffusion"))


def force_cpu_jax() -> None:
    """Pin JAX to the CPU backend for parity runs.

    The launch environment's sitecustomize registers a TPU backend before
    user code runs, so the JAX_PLATFORMS env var alone is not enough (same
    workaround as tests/conftest.py). Parity math is fp32 CPU on both sides
    by design — the TPU tunnel would add bf16 matmuls and ~100 ms dispatch
    latency per eager op.
    """
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")


def load_reference_pipeline(class_name: str):
    """Import a reference pipeline class from /root/reference under the shim.

    The file is loaded directly (no package import) so nothing else from the
    reference tree executes. Raises FileNotFoundError when the reference is
    not mounted, KeyError for unknown classes.
    """
    from gmdx.refbridge.diffusers_shim import install_shim

    install_shim()
    fname = _PIPELINE_FILES[class_name]
    path = os.path.join(REFERENCE_ROOT, "gm_diffusion", "pipelines", fname)
    if not os.path.isfile(path):
        raise FileNotFoundError(path)
    mod_name = f"gmdx_refbridge_{fname[:-3]}"
    if mod_name in sys.modules:
        return getattr(sys.modules[mod_name], class_name)
    spec = importlib.util.spec_from_file_location(mod_name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[mod_name] = mod
    spec.loader.exec_module(mod)
    return getattr(mod, class_name)


__all__ = [
    "REFERENCE_ROOT",
    "reference_available",
    "load_reference_pipeline",
]
