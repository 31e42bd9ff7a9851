"""Pipeline-parallel dual-UNet sampler vs the sequential reference path.

The 2-stage pipeline (gmdx/pipelines/pp.py) must reproduce the sequential
``StableDiffusionDualUNetPipeline.denoise_dual`` results — same per-step
algebra, same PRNG stream, to fp32 fusion-reassociation tolerance — while
placing the SDR UNet on one submesh and the GM UNet on the other
(spoofed 8-CPU mesh, conftest.py).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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
    PipelinedDualUNet,
    StableDiffusionDualUNetPipeline,
    pp_stage_meshes,
)
from gmdx.schedulers import DDIMScheduler, PNDMScheduler

pytestmark = pytest.mark.slow  # tiny-UNet scan compiles (pytest.ini tiers)

BATCH = 4  # divisible by each 4-device stage submesh


@pytest.fixture(scope="module")
def dual_setup():
    cfg8 = dataclasses.replace(TINY_UNET_CONFIG, in_channels=8)
    unet8 = UNet2DConditionModel(cfg8)
    unet4 = UNet2DConditionModel(TINY_UNET_CONFIG)
    vae = AutoencoderKL(TINY_VAE_CONFIG)
    text = CLIPTextModel(TINY_CLIP_CONFIG)
    tok = CLIPTokenizer.tiny()
    params = {
        "unet": unet4.init(
            jax.random.key(1), jnp.zeros((1, 4, 4, 4)), jnp.array(1.0),
            jnp.zeros((1, 7, 32)),
        )["params"],
        "gm_unet": unet8.init(
            jax.random.key(0), jnp.zeros((1, 8, 4, 4)), jnp.array(1.0),
            jnp.zeros((1, 7, 32)),
        )["params"],
    }
    embeds = jax.random.normal(jax.random.key(7), (BATCH, 7, 32)) * 0.1
    neg = jax.random.normal(jax.random.key(8), (BATCH, 7, 32)) * 0.1
    lat = jax.random.normal(jax.random.key(9), (BATCH, 4, 4, 4))
    return unet4, unet8, vae, text, tok, params, embeds, neg, lat


def _pipes(dual_setup, scheduler):
    unet4, unet8, vae, text, tok, params, embeds, neg, lat = dual_setup
    pipe = StableDiffusionDualUNetPipeline(
        unet4, vae, text, tok, scheduler, gm_unet=unet8
    )
    return pipe, PipelinedDualUNet(pipe, chunk=2), params, embeds, neg, lat


def test_stage_meshes_split_devices():
    m0, m1 = pp_stage_meshes()
    assert m0.shape == {"data": 4} and m1.shape == {"data": 4}
    assert not set(m0.devices.flat) & set(m1.devices.flat)
    with pytest.raises(ValueError):
        pp_stage_meshes(jax.devices()[:3])


def test_pp_matches_sequential_pndm(dual_setup):
    pipe, pp, params, embeds, neg, lat = _pipes(dual_setup, PNDMScheduler())
    n = 5  # PLMS warmup expands this; chunk=2 leaves a ragged tail
    keys = jax.random.split(jax.random.key(3), pipe._num_steps(n))
    ref_sdr, ref_gm = pipe.denoise_dual(
        params, embeds, neg, lat, num_inference_steps=n, step_keys=keys
    )
    pp_sdr, pp_gm = pp.denoise_dual(
        params, embeds, neg, lat, num_inference_steps=n, step_keys=keys
    )
    np.testing.assert_allclose(
        np.asarray(pp_sdr), np.asarray(ref_sdr), rtol=2e-4, atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(pp_gm), np.asarray(ref_gm), rtol=2e-4, atol=5e-5
    )


def test_pp_matches_sequential_ddim_eta(dual_setup):
    """eta=0.7 exercises the per-step PRNG split (k_sdr, k_gm)."""
    pipe, pp, params, embeds, neg, lat = _pipes(dual_setup, DDIMScheduler())
    keys = jax.random.split(jax.random.key(4), 4)
    kw = dict(num_inference_steps=4, eta=0.7, guidance_rescale=0.3,
              step_keys=keys)
    ref_sdr, ref_gm = pipe.denoise_dual(params, embeds, neg, lat, **kw)
    pp_sdr, pp_gm = pp.denoise_dual(params, embeds, neg, lat, **kw)
    np.testing.assert_allclose(
        np.asarray(pp_sdr), np.asarray(ref_sdr), rtol=2e-4, atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(pp_gm), np.asarray(ref_gm), rtol=2e-4, atol=5e-5
    )


def test_pp_no_cfg(dual_setup):
    pipe, pp, params, embeds, neg, lat = _pipes(dual_setup, PNDMScheduler())
    keys = jax.random.split(jax.random.key(5), pipe._num_steps(3))
    ref_sdr, ref_gm = pipe.denoise_dual(
        params, embeds, None, lat, num_inference_steps=3, step_keys=keys
    )
    pp_sdr, pp_gm = pp.denoise_dual(
        params, embeds, None, lat, num_inference_steps=3, step_keys=keys
    )
    np.testing.assert_allclose(
        np.asarray(pp_gm), np.asarray(ref_gm), rtol=2e-4, atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(pp_sdr), np.asarray(ref_sdr), rtol=2e-4, atol=5e-5
    )


def test_pp_stage_placement(dual_setup):
    """Each UNet's weights live only on its stage's devices, and the final
    latents land on their producing stage."""
    pipe, pp, params, embeds, neg, lat = _pipes(dual_setup, PNDMScheduler())
    placed = pp.place_params(params)
    sdr_devs = set(jax.tree.leaves(placed["unet"])[0].sharding.device_set)
    gm_devs = set(jax.tree.leaves(placed["gm_unet"])[0].sharding.device_set)
    assert sdr_devs == set(pp.mesh_sdr.devices.flat)
    assert gm_devs == set(pp.mesh_gm.devices.flat)
    assert not sdr_devs & gm_devs

    keys = jax.random.split(jax.random.key(6), pipe._num_steps(3))
    sdr_lat, gm_lat = pp.denoise_dual(
        placed, embeds, neg, lat, num_inference_steps=3, step_keys=keys
    )
    assert set(sdr_lat.sharding.device_set) <= set(pp.mesh_sdr.devices.flat)
    assert set(gm_lat.sharding.device_set) <= set(pp.mesh_gm.devices.flat)
    assert np.isfinite(np.asarray(gm_lat)).all()
