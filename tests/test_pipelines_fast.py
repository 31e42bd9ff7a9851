"""Quick-tier pipeline loop coverage (VERDICT r3 weak #7).

The full pipeline suite (test_pipelines.py) is slow-tier — so the quick
tier used to exercise ZERO denoise loops. These two tests run one tiny GM
loop and one tiny dual loop end to end (real tiny UNet/VAE/CLIP modules,
2 PNDM steps) so `pytest -m "not slow"` still catches a broken scan loop,
scheduler-state threading, or CFG plumbing.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gmdx.models import (
    AutoencoderKL,
    CLIPTextModel,
    CLIPTokenizer,
    TINY_CLIP_CONFIG,
    TINY_UNET_CONFIG,
    TINY_VAE_CONFIG,
    UNet2DConditionModel,
)
from gmdx.pipelines import (
    StableDiffusionDualUNetPipeline,
    StableDiffusionGMPipeline,
)
from gmdx.schedulers import PNDMScheduler

import pytest


@pytest.fixture(scope="module")
def tiny():
    cfg8 = dataclasses.replace(TINY_UNET_CONFIG, in_channels=8)
    unet8 = UNet2DConditionModel(cfg8)
    unet4 = UNet2DConditionModel(TINY_UNET_CONFIG)
    vae = AutoencoderKL(TINY_VAE_CONFIG)
    text = CLIPTextModel(TINY_CLIP_CONFIG)
    tok = CLIPTokenizer.tiny()
    params = {
        "unet": unet8.init(
            jax.random.key(0), jnp.zeros((1, 8, 4, 4)), jnp.array(1.0),
            jnp.zeros((1, 7, 32)),
        )["params"],
        "unet4": unet4.init(
            jax.random.key(1), jnp.zeros((1, 4, 4, 4)), jnp.array(1.0),
            jnp.zeros((1, 7, 32)),
        )["params"],
        "vae": vae.init(
            jax.random.key(2), jnp.zeros((1, 3, 32, 32)), jax.random.key(3)
        )["params"],
        "text_encoder": text.init(
            jax.random.key(4), jnp.zeros((1, 77), jnp.int32)
        )["params"],
    }
    return unet8, unet4, vae, text, tok, params


def test_gm_loop_quick(tiny):
    unet8, _, vae, text, tok, params = tiny
    pipe = StableDiffusionGMPipeline(unet8, vae, text, tok, PNDMScheduler())
    sdr_latent = jax.random.normal(jax.random.key(5), (1, 4, 4, 4))
    out = pipe(
        params, sdr_latent, "a bright scene",
        key=jax.random.key(6), num_inference_steps=2, output_type="latent",
    )
    assert out.shape == (1, 4, 4, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_dual_loop_quick(tiny):
    unet8, unet4, vae, text, tok, params = tiny
    pipe = StableDiffusionDualUNetPipeline(
        unet4, vae, text, tok, PNDMScheduler(), gm_unet=unet8
    )
    p = {
        "unet": params["unet4"],
        "gm_unet": params["unet"],
        "vae": params["vae"],
        "text_encoder": params["text_encoder"],
    }
    sdr_lat, gm_lat = pipe.denoise_dual(
        p,
        jax.random.normal(jax.random.key(7), (2, 7, 32)),
        jax.random.normal(jax.random.key(8), (2, 7, 32)),
        jax.random.normal(jax.random.key(9), (2, 4, 4, 4)),
        num_inference_steps=2,
    )
    assert sdr_lat.shape == gm_lat.shape == (2, 4, 4, 4)
    assert np.isfinite(np.asarray(sdr_lat)).all()
    assert np.isfinite(np.asarray(gm_lat)).all()
