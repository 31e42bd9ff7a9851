"""PNG/host image helpers and model-range conversion.

Mirrors the reference's host preprocessing (scripts/inference/generate_hdr.py:
187-193 normalize-to-[-1,1]; 27-30 .hdr export with BGR swizzle + /(qmax+1))
without OpenCV: PIL for PNG, the native RGBE writer for .hdr.
"""

from __future__ import annotations

import numpy as np
from PIL import Image

from gmdx.io.rgbe import write_hdr


def load_image(path: str, size: tuple[int, int] | None = None) -> np.ndarray:
    """Load an image file -> float32 RGB (H, W, 3) in [0, 1].

    Args:
      size: optional (height, width) bicubic resize.
    """
    img = Image.open(path).convert("RGB")
    if size is not None:
        img = img.resize((size[1], size[0]), Image.BICUBIC)
    return np.asarray(img, dtype=np.float32) / 255.0


def save_image(path: str, rgb: np.ndarray) -> None:
    """Save float RGB (H, W, 3) in [0, 1] as an 8-bit image file."""
    arr = np.clip(np.asarray(rgb), 0.0, 1.0)
    Image.fromarray((arr * 255.0 + 0.5).astype(np.uint8)).save(path)


def to_model_input(rgb: np.ndarray) -> np.ndarray:
    """[0, 1]-float or uint8 HWC -> [-1, 1] NCHW float32 (the VAE's
    range/layout). Single range conversion shared with the data pipeline."""
    from gmdx.data.transforms import to_model_range

    x = np.asarray(rgb)
    if x.ndim == 3:
        return to_model_range(x)[None]
    return np.stack([to_model_range(im) for im in x])


def from_model_output(x: np.ndarray) -> np.ndarray:
    """[-1, 1] NCHW -> [0, 1] NHWC float32 (diffusers postprocess convention:
    ``(x / 2 + 0.5).clamp(0, 1)``, stable_diffusion_gm.py:1106)."""
    x = np.asarray(x, dtype=np.float32)
    x = np.clip(x / 2.0 + 0.5, 0.0, 1.0)
    return np.transpose(x, (0, 2, 3, 1))


def save_hdr_image(path: str, hdr_rgb: np.ndarray, qmax: float | None = None) -> None:
    """Write an HDR frame as Radiance .hdr, optionally peak-normalized.

    The reference normalizes by ``(qmax + 1)`` before export
    (generate_hdr.py:270-282); pass ``qmax`` to match, or None to write raw.
    The BGR swizzle in the reference exists only because cv2 wants BGR — the
    on-disk decoded RGB values are identical.
    """
    hdr = np.asarray(hdr_rgb, dtype=np.float32)
    if qmax is not None:
        hdr = hdr / (qmax + 1.0)
    write_hdr(path, np.maximum(hdr, 0.0))


__all__ = [
    "load_image",
    "save_image",
    "to_model_input",
    "from_model_output",
    "save_hdr_image",
]
