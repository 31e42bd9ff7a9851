"""Minimal ``diffusers`` stand-in for running the reference pipeline classes.

The GM-Diffusion pipelines (reference gm_diffusion/pipelines/*.py) subclass
``diffusers.DiffusionPipeline`` and import ~20 utility symbols. diffusers is
not installed in this sandbox; this shim registers just enough of those
symbols in ``sys.modules`` for the reference files to import and *execute*
(the parity harness drives their ``__call__`` with our torch models /
schedulers as components). Only the code paths the reference pipelines
actually hit are implemented; everything else raises via attribute error.

``install_shim()`` is a no-op when the real diffusers is importable.
"""

from __future__ import annotations

import contextlib
import logging as _pylogging
import sys
import types
from dataclasses import dataclass
from typing import Any, List, Optional, Union

import numpy as np
import torch


# --------------------------------------------------------------------------
# configuration_utils
# --------------------------------------------------------------------------
class FrozenDict(dict):
    """dict with attribute read access (diffusers config container)."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e


# --------------------------------------------------------------------------
# image_processor
# --------------------------------------------------------------------------
PipelineImageInput = Any


class VaeImageProcessor:
    def __init__(self, vae_scale_factor: int = 8, do_normalize: bool = True):
        self.vae_scale_factor = vae_scale_factor
        self.do_normalize = do_normalize
        self.config = FrozenDict(
            vae_scale_factor=vae_scale_factor, do_normalize=do_normalize
        )

    @staticmethod
    def denormalize(images: torch.Tensor) -> torch.Tensor:
        return (images / 2 + 0.5).clamp(0, 1)

    @staticmethod
    def numpy_to_pil(images: np.ndarray):
        from PIL import Image

        if images.ndim == 3:
            images = images[None]
        images = (images * 255).round().astype("uint8")
        return [Image.fromarray(im) for im in images]

    @staticmethod
    def pt_to_numpy(images: torch.Tensor) -> np.ndarray:
        return images.cpu().permute(0, 2, 3, 1).float().numpy()

    def preprocess(self, image, height=None, width=None):
        """PIL/numpy [0,1] HWC -> normalized NCHW tensor in [-1, 1]."""
        if isinstance(image, torch.Tensor):
            t = image
        else:
            if not isinstance(image, (list, tuple)):
                image = [image]
            arrs = []
            for im in image:
                a = np.asarray(im, dtype=np.float32)
                if a.dtype == np.uint8 or a.max() > 1.5:
                    a = a.astype(np.float32) / 255.0
                arrs.append(a)
            t = torch.from_numpy(np.stack(arrs)).permute(0, 3, 1, 2)
        if self.do_normalize:
            t = 2.0 * t - 1.0
        return t

    def postprocess(self, image: torch.Tensor, output_type: str = "pil",
                    do_denormalize: Optional[List[bool]] = None):
        if output_type == "latent":
            return image
        if do_denormalize is None:
            do_denormalize = [self.do_normalize] * image.shape[0]
        image = torch.stack(
            [self.denormalize(image[i]) if do_denormalize[i] else image[i]
             for i in range(image.shape[0])]
        )
        if output_type == "pt":
            return image
        image = self.pt_to_numpy(image)
        if output_type == "np":
            return image
        if output_type == "pil":
            return self.numpy_to_pil(image)
        raise ValueError(f"unknown output_type {output_type!r}")


# --------------------------------------------------------------------------
# loaders mixins
# --------------------------------------------------------------------------
class TextualInversionLoaderMixin:
    def maybe_convert_prompt(self, prompt, tokenizer):
        return prompt


class StableDiffusionLoraLoaderMixin:
    pass


class FromSingleFileMixin:
    pass


class IPAdapterMixin:
    pass


# --------------------------------------------------------------------------
# utils
# --------------------------------------------------------------------------
USE_PEFT_BACKEND = False


def deprecate(*args, **kwargs):
    return None


def is_torch_xla_available():
    return False


def replace_example_docstring(example):
    def decorator(fn):
        return fn

    return decorator


def scale_lora_layers(model, lora_scale):
    return None


def unscale_lora_layers(model, lora_scale=None):
    return None


def adjust_lora_scale_text_encoder(text_encoder, lora_scale):
    return None


def randn_tensor(shape, generator=None, device=None, dtype=None, layout=None):
    """diffusers.utils.torch_utils.randn_tensor: CPU generator semantics."""
    if isinstance(generator, list):
        return torch.cat(
            [torch.randn(
                (1, *shape[1:]), generator=g, dtype=dtype, layout=layout
             ) for g in generator]
        ).to(device)
    t = torch.randn(shape, generator=generator, dtype=dtype, layout=layout)
    return t.to(device) if device is not None else t


class _ShimLogging(types.ModuleType):
    @staticmethod
    def get_logger(name=None):
        return _pylogging.getLogger(name or "diffusers_shim")


# --------------------------------------------------------------------------
# pipeline base
# --------------------------------------------------------------------------
class _ProgressBar:
    def __init__(self, total):
        self.total = total
        self.n = 0

    def update(self, n: int = 1):
        self.n += n

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class DiffusionPipeline:
    config_name = "model_index.json"

    def register_modules(self, **kwargs):
        for name, module in kwargs.items():
            setattr(self, name, module)
        if not hasattr(self, "_shim_config"):
            self._shim_config = {}

    def register_to_config(self, **kwargs):
        if not hasattr(self, "_shim_config"):
            self._shim_config = {}
        self._shim_config.update(kwargs)

    @property
    def config(self):
        return FrozenDict(getattr(self, "_shim_config", {}))

    @property
    def _execution_device(self):
        return torch.device("cpu")

    @property
    def device(self):
        return torch.device("cpu")

    def progress_bar(self, iterable=None, total=None):
        if iterable is not None:
            return iter(iterable)
        return _ProgressBar(total)

    def maybe_free_model_hooks(self):
        return None

    def to(self, *args, **kwargs):
        return self


class StableDiffusionMixin:
    pass


@dataclass
class StableDiffusionPipelineOutput:
    images: Any
    nsfw_content_detected: Optional[List[bool]] = None


class StableDiffusionSafetyChecker:
    pass


class ImageProjection:
    pass


class PipelineCallback:
    pass


class MultiPipelineCallbacks:
    pass


class KarrasDiffusionSchedulers:
    pass


class ConfigMixin:
    """Minimal diffusers.ConfigMixin: stores the decorated __init__'s bound
    arguments as ``.config`` (enough for the reference Discriminator,
    gm_diffusion/stage1/discriminator.py:13-15)."""

    @property
    def config(self):
        return getattr(self, "_internal_dict", FrozenDict())

    def register_to_config(self, **kwargs):
        d = dict(getattr(self, "_internal_dict", {}))
        d.update(kwargs)
        self._internal_dict = FrozenDict(d)


def register_to_config(init):
    """Decorator form (diffusers.configuration_utils.register_to_config)."""
    import functools
    import inspect

    @functools.wraps(init)
    def wrapper(self, *args, **kwargs):
        sig = inspect.signature(init)
        bound = sig.bind(self, *args, **kwargs)
        bound.apply_defaults()
        self._internal_dict = FrozenDict(
            {k: v for k, v in bound.arguments.items() if k != "self"}
        )
        init(self, *args, **kwargs)

    return wrapper


class ModelMixin(torch.nn.Module):
    """Minimal diffusers.ModelMixin: an nn.Module with the dtype/device
    conveniences the reference models touch."""

    @property
    def dtype(self):
        return next(self.parameters()).dtype

    @property
    def device(self):
        return next(self.parameters()).device


def _module(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


_installed = False


def install_shim() -> bool:
    """Register the fake diffusers modules. No-op if real diffusers exists.

    Returns True when the shim (or real diffusers) is ready.
    """
    global _installed
    if _installed:
        return True
    try:
        import diffusers  # noqa: F401

        _installed = True
        return True  # real package present; nothing to do
    except ImportError:
        pass

    from gmdx.refbridge import torch_models

    root = _module(
        "diffusers",
        __version__="0.0.0+gmdx-shim",
        DiffusionPipeline=DiffusionPipeline,
    )
    _module("diffusers.callbacks",
            MultiPipelineCallbacks=MultiPipelineCallbacks,
            PipelineCallback=PipelineCallback)
    _module("diffusers.configuration_utils", FrozenDict=FrozenDict,
            ConfigMixin=ConfigMixin, register_to_config=register_to_config)
    _module("diffusers.models.modeling_utils", ModelMixin=ModelMixin)
    _module("diffusers.image_processor",
            PipelineImageInput=PipelineImageInput,
            VaeImageProcessor=VaeImageProcessor)
    _module("diffusers.loaders",
            FromSingleFileMixin=FromSingleFileMixin,
            IPAdapterMixin=IPAdapterMixin,
            StableDiffusionLoraLoaderMixin=StableDiffusionLoraLoaderMixin,
            TextualInversionLoaderMixin=TextualInversionLoaderMixin)
    _module("diffusers.models",
            AutoencoderKL=torch_models.AutoencoderKL,
            ImageProjection=ImageProjection,
            UNet2DConditionModel=torch_models.UNet2DConditionModel)
    _module("diffusers.models.lora",
            adjust_lora_scale_text_encoder=adjust_lora_scale_text_encoder)
    _module("diffusers.schedulers",
            KarrasDiffusionSchedulers=KarrasDiffusionSchedulers)
    utils = _module("diffusers.utils",
                    USE_PEFT_BACKEND=USE_PEFT_BACKEND,
                    deprecate=deprecate,
                    is_torch_xla_available=is_torch_xla_available,
                    replace_example_docstring=replace_example_docstring,
                    scale_lora_layers=scale_lora_layers,
                    unscale_lora_layers=unscale_lora_layers)
    logging_mod = _ShimLogging("diffusers.utils.logging")
    sys.modules["diffusers.utils.logging"] = logging_mod
    utils.logging = logging_mod
    _module("diffusers.utils.torch_utils", randn_tensor=randn_tensor)
    pipelines = _module("diffusers.pipelines")
    _module("diffusers.pipelines.pipeline_utils",
            DiffusionPipeline=DiffusionPipeline,
            StableDiffusionMixin=StableDiffusionMixin)
    sd = _module("diffusers.pipelines.stable_diffusion")
    _module("diffusers.pipelines.stable_diffusion.pipeline_output",
            StableDiffusionPipelineOutput=StableDiffusionPipelineOutput)
    _module("diffusers.pipelines.stable_diffusion.safety_checker",
            StableDiffusionSafetyChecker=StableDiffusionSafetyChecker)
    pipelines.stable_diffusion = sd
    root.pipelines = pipelines
    _installed = True
    return True


__all__ = ["install_shim", "FrozenDict", "VaeImageProcessor", "randn_tensor"]
