"""Host-side paired image transforms (numpy/PIL).

Reference chain (train_gm_unet.py:931-941): bilinear resize of the shorter
side to ``resolution``, center-or-random crop, ToTensor, Normalize(0.5, 0.5).

Deviation (deliberate, SURVEY.md §7.3 "defects not to replicate"): the
reference calls RandomCrop separately on the SDR and gain-map images, drawing
two DIFFERENT crop windows and silently mis-aligning the pair; here a single
crop window is drawn per pair and applied to both.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from PIL import Image


def resized_dims(w: int, h: int, size: int) -> Tuple[int, int]:
    """(new_w, new_h) of a shorter-side resize to ``size``. Shared with the
    native loader (native/imagedec.cpp mirrors this rounding)."""
    if w <= h:
        return size, max(1, round(h * size / w))
    return max(1, round(w * size / h)), size


def resize_shorter_side(img: Image.Image, size: int) -> Image.Image:
    """Bilinear resize so the shorter side equals ``size`` (torchvision
    transforms.Resize(int) semantics)."""
    new_w, new_h = resized_dims(*img.size, size)
    return img.resize((new_w, new_h), Image.BILINEAR)


def paired_crop(
    a: np.ndarray,
    b: np.ndarray,
    size: int,
    rng: np.random.Generator | None = None,
    center: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Crop the SAME (size, size) window from two (H, W, C) arrays."""
    h, w = a.shape[:2]
    if a.shape[:2] != b.shape[:2]:
        raise ValueError(f"paired images disagree on shape: {a.shape} vs {b.shape}")
    if h < size or w < size:
        raise ValueError(f"image {h}x{w} smaller than crop {size}")
    if center or rng is None:
        top, left = (h - size) // 2, (w - size) // 2
    else:
        top = int(rng.integers(0, h - size + 1))
        left = int(rng.integers(0, w - size + 1))
    return (
        a[top : top + size, left : left + size],
        b[top : top + size, left : left + size],
    )


def to_model_range(img: np.ndarray) -> np.ndarray:
    """uint8 [0,255] or float [0,1] HWC -> float32 [-1, 1] CHW.

    Dispatch is by DTYPE, not by pixel max — a max() heuristic silently
    saturates near-black uint8 images (e.g. a gain map whose brightest
    pixel is 1/255)."""
    arr = np.asarray(img)
    if np.issubdtype(arr.dtype, np.integer):
        x = arr.astype(np.float32) / float(np.iinfo(arr.dtype).max)
    else:
        x = arr.astype(np.float32)
    x = x * 2.0 - 1.0
    return np.transpose(x, (2, 0, 1))


def preprocess_pair(
    sdr: Image.Image,
    gm: Image.Image,
    resolution: int,
    *,
    center_crop: bool = False,
    random_flip: bool = False,
    rng: np.random.Generator | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Full paired chain -> two (3, resolution, resolution) float32 in [-1,1].

    ``random_flip`` applies ONE horizontal-flip draw to both images (the
    reference flips SDR and GM independently with separate RandomHorizontalFlip
    instances — same mis-pairing class as its crop; deliberately fixed)."""
    sdr = resize_shorter_side(sdr.convert("RGB"), resolution)
    gm = resize_shorter_side(gm.convert("RGB"), resolution)
    a, b = paired_crop(
        np.asarray(sdr), np.asarray(gm), resolution, rng=rng, center=center_crop
    )
    if random_flip and rng is not None and rng.random() < 0.5:
        a, b = a[:, ::-1], b[:, ::-1]
    return to_model_range(a), to_model_range(b)


__all__ = [
    "resized_dims",
    "resize_shorter_side",
    "paired_crop",
    "to_model_range",
    "preprocess_pair",
]
