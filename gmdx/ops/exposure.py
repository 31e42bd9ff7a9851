"""Camera-exposure simulation augmentation.

Reference: gm_diffusion/stage1/augmentations.py:13-79 (torch class drawing from
Python/torch global RNG). Rebuilt as a pure function over an explicit JAX PRNG
key so the whole augmentation is jittable, vmappable across a batch, and
bit-reproducible per key — the idiomatic JAX replacement for the reference's
host-side per-sample loop.

Chain (identical math): inverse sigmoid camera curve
``((sigma*y) / (1 + sigma - y + 1e-8)) ** (1/n)`` with n ~ N(0.65, 0.1) clipped
to [0.4, 0.9] and sigma ~ N(0.6, 0.1) clipped to [0.4, 0.8]; uint16
discretization; exposure drawn from {0.1, 0.25, 0.5, 1.0, 4.0, 8.0, 16.0};
``clip(img * exposure, 0, 1) ** (1/gamma)``; applied with probability ``prob``.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# Host constant (importing gmdx must not initialize a device backend).
EXPOSURE_LEVELS = np.array([0.1, 0.25, 0.5, 1.0, 4.0, 8.0, 16.0], dtype=np.float32)


def sample_camera_curve(key: Array) -> Tuple[Array, Array]:
    """Draw the (n, sigma) inverse-sigmoid curve parameters (clipped normals)."""
    kn, ks = jax.random.split(key)
    n = jnp.clip(0.65 + 0.1 * jax.random.normal(kn, ()), 0.4, 0.9)
    sigma = jnp.clip(0.6 + 0.1 * jax.random.normal(ks, ()), 0.4, 0.8)
    return n, sigma


def apply_inv_sigmoid_curve(y: Array, n: Array, sigma: Array) -> Array:
    return ((sigma * y) / (1.0 + sigma - y + 1e-8)) ** (1.0 / n)


def discretize_to_uint16(img: Array) -> Array:
    max_int = 2**16 - 1
    return jnp.round(jnp.clip(img * max_int, 0, max_int)) / max_int


def hdr_to_ldr(img: Array, exposure: Array, gamma: float = 2.2) -> Array:
    return jnp.clip(img * exposure, 0.0, 1.0) ** (1.0 / gamma)


def random_exposure_adjust(
    key: Array,
    imgs: Array,
    *,
    gamma: float = 2.2,
    prob: float = 1.0,
) -> Tuple[Array, Dict[str, Array]]:
    """Apply the exposure-simulation chain with one draw shared by the batch.

    Matches the reference semantics of one (exposure, n, sigma) draw per call
    (augmentations.py:52-65); vmap over split keys for per-sample draws.

    Returns ``(ldr_imgs, metadata)`` where metadata holds the applied
    ``exposure``/``n``/``sigma`` (identity values when the prob gate skips).
    """
    k_gate, k_exp, k_curve = jax.random.split(key, 3)

    exposure = jnp.asarray(EXPOSURE_LEVELS)[
        jax.random.randint(k_exp, (), 0, EXPOSURE_LEVELS.shape[0])
    ]
    n, sigma = sample_camera_curve(k_curve)

    linear_img = apply_inv_sigmoid_curve(imgs, n, sigma)
    linear_img = discretize_to_uint16(linear_img)
    ldr_img = hdr_to_ldr(linear_img, exposure, gamma=gamma)

    apply_gate = jax.random.uniform(k_gate, ()) <= prob
    out = jnp.where(apply_gate, ldr_img, imgs)
    metadata = {
        "exposure": jnp.where(apply_gate, exposure, 1.0),
        "n": jnp.where(apply_gate, n, 1.0),
        "sigma": jnp.where(apply_gate, sigma, 0.0),
    }
    return out, metadata


class RandomExposureAdjust:
    """Thin callable wrapper keeping the reference's class-based API.

    Unlike the reference class, ``__call__`` takes a PRNG key first; shapes may
    be (C, H, W), (N, C, H, W), or anything else — the math is elementwise.
    """

    def __init__(self, gamma: float = 2.2, prob: float = 1.0):
        self.gamma = gamma
        self.prob = prob
        self.exposure_levels = EXPOSURE_LEVELS

    def __call__(self, key: Array, imgs: Array, *, return_metadata: bool = False):
        out, meta = random_exposure_adjust(
            key, imgs, gamma=self.gamma, prob=self.prob
        )
        return (out, meta) if return_metadata else out

    # Static helpers mirrored for API parity.
    sample_camera_curve = staticmethod(sample_camera_curve)
    apply_inv_sigmoid_curve = staticmethod(apply_inv_sigmoid_curve)
    discretize_to_uint16 = staticmethod(discretize_to_uint16)

    def hdr_to_ldr(self, img: Array, exposure) -> Array:
        return hdr_to_ldr(img, jnp.asarray(exposure), gamma=self.gamma)

    def __repr__(self) -> str:
        return (
            f"{type(self).__name__}(gamma={self.gamma}, prob={self.prob}, "
            f"exposure_levels={self.exposure_levels.tolist()})"
        )


def _demo() -> None:
    """CLI demo: ``python -m gmdx.ops.exposure`` (parity with the reference's
    ``python -m gm_diffusion.stage1.augmentations`` demo)."""
    key = jax.random.key(0)
    sample = jax.random.uniform(key, (3, 256, 256))
    adjusted, meta = random_exposure_adjust(jax.random.key(1), sample)
    print("Adjustment metadata:", {k: float(v) for k, v in meta.items()})
    print("Input stats:", float(sample.min()), float(sample.max()))
    print("Output stats:", float(adjusted.min()), float(adjusted.max()))


if __name__ == "__main__":
    _demo()
