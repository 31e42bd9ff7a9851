"""ControlNet tests: zero-init no-op property, conditioning effectiveness,
encoder-copy init, and the SDR→HDRTV up-conversion path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gmdx.models import (
    AutoencoderKL,
    CLIPTextModel,
    CLIPTokenizer,
    ControlNetModel,
    TINY_CLIP_CONFIG,
    TINY_CONTROLNET_CONFIG,
    TINY_UNET_CONFIG,
    TINY_VAE_CONFIG,
    UNet2DConditionModel,
    controlnet_params_from_unet,
)
from gmdx.pipelines import (
    StableDiffusionControlNetHDRPipeline,
    upconvert_sdr_to_hdrtv,
)
from gmdx.schedulers import PNDMScheduler

pytestmark = pytest.mark.slow  # excluded from the quick tier (pytest.ini)


LAT = (1, 4, 4, 4)
IMG = (1, 3, 32, 32)  # embedder downsamples 8x: 32 -> 4 (the latent grid)


@pytest.fixture(scope="module")
def setup():
    unet = UNet2DConditionModel(TINY_UNET_CONFIG)
    cnet = ControlNetModel(TINY_CONTROLNET_CONFIG)
    x = jnp.zeros(LAT)
    ctx = jnp.zeros((1, 7, 32))
    ctrl = jnp.zeros(IMG)
    unet_params = unet.init(jax.random.key(0), x, jnp.array(1.0), ctx)["params"]
    cnet_params = cnet.init(
        jax.random.key(1), x, jnp.array(1.0), ctx, ctrl
    )["params"]
    return unet, cnet, unet_params, cnet_params


class TestControlNetModel:
    def test_zero_init_is_noop(self, setup):
        """Fresh ControlNet (zero output convs) must not change the UNet."""
        unet, cnet, unet_params, cnet_params = setup
        x = jax.random.normal(jax.random.key(2), LAT)
        ctx = jax.random.normal(jax.random.key(3), (1, 7, 32))
        ctrl = jax.random.uniform(jax.random.key(4), IMG)
        down, mid = cnet.apply(
            {"params": cnet_params}, x, jnp.array(5.0), ctx, ctrl
        )
        assert all(float(jnp.abs(d).max()) == 0.0 for d in down)
        assert float(jnp.abs(mid).max()) == 0.0
        base = unet.apply({"params": unet_params}, x, jnp.array(5.0), ctx)
        with_res = unet.apply(
            {"params": unet_params}, x, jnp.array(5.0), ctx,
            down_block_additional_residuals=down,
            mid_block_additional_residual=mid,
        )
        np.testing.assert_array_equal(np.asarray(base), np.asarray(with_res))

    def test_nonzero_residuals_change_unet(self, setup):
        unet, cnet, unet_params, cnet_params = setup
        x = jax.random.normal(jax.random.key(2), LAT)
        ctx = jax.random.normal(jax.random.key(3), (1, 7, 32))
        ctrl = jax.random.uniform(jax.random.key(4), IMG)
        # Perturb the zero convs so the adapter produces signal.
        p = jax.tree.map(
            lambda a: a + 0.05 * jax.random.normal(jax.random.key(5), a.shape),
            cnet_params,
        )
        down, mid = cnet.apply({"params": p}, x, jnp.array(5.0), ctx, ctrl)
        assert any(float(jnp.abs(d).max()) > 0 for d in down)
        base = unet.apply({"params": unet_params}, x, jnp.array(5.0), ctx)
        steered = unet.apply(
            {"params": unet_params}, x, jnp.array(5.0), ctx,
            down_block_additional_residuals=down,
            mid_block_additional_residual=mid,
        )
        assert not np.allclose(np.asarray(base), np.asarray(steered))

    def test_conditioning_scale(self, setup):
        _, cnet, _, cnet_params = setup
        x = jax.random.normal(jax.random.key(2), LAT)
        ctx = jax.random.normal(jax.random.key(3), (1, 7, 32))
        ctrl = jax.random.uniform(jax.random.key(4), IMG)
        p = jax.tree.map(
            lambda a: a + 0.05 * jax.random.normal(jax.random.key(5), a.shape),
            cnet_params,
        )
        d1, m1 = cnet.apply({"params": p}, x, jnp.array(5.0), ctx, ctrl, 1.0)
        d2, m2 = cnet.apply({"params": p}, x, jnp.array(5.0), ctx, ctrl, 0.5)
        np.testing.assert_allclose(
            np.asarray(m2), 0.5 * np.asarray(m1), rtol=1e-5, atol=1e-6
        )

    def test_init_from_unet_copies_encoder(self, setup):
        _, cnet, unet_params, cnet_params = setup
        copied = controlnet_params_from_unet(cnet_params, unet_params)
        np.testing.assert_array_equal(
            np.asarray(copied["conv_in"]["kernel"]),
            np.asarray(unet_params["conv_in"]["kernel"]),
        )
        np.testing.assert_array_equal(
            np.asarray(copied["mid_attn"]["proj_in"]["kernel"]),
            np.asarray(unet_params["mid_attn"]["proj_in"]["kernel"]),
        )
        # Zero convs stay zero (adapter starts as a no-op).
        assert float(jnp.abs(copied["controlnet_mid"]["kernel"]).max()) == 0.0


class TestControlNetPipeline:
    @pytest.fixture(scope="class")
    def pipe_setup(self, setup):
        unet, cnet, unet_params, cnet_params = setup
        gm_cfg = dataclasses.replace(TINY_UNET_CONFIG, in_channels=8)
        gm_unet = UNet2DConditionModel(gm_cfg)
        vae = AutoencoderKL(TINY_VAE_CONFIG)
        text = CLIPTextModel(TINY_CLIP_CONFIG)
        tok = CLIPTokenizer.tiny()
        params = {
            "unet": unet_params,
            "controlnet": controlnet_params_from_unet(cnet_params, unet_params),
            "gm_unet": gm_unet.init(
                jax.random.key(6), jnp.zeros((1, 8, 4, 4)), jnp.array(1.0),
                jnp.zeros((1, 7, 32)),
            )["params"],
            "vae": vae.init(
                jax.random.key(7), jnp.zeros((1, 3, 32, 32)), jax.random.key(8)
            )["params"],
            "text_encoder": text.init(
                jax.random.key(9), jnp.zeros((1, 77), jnp.int32)
            )["params"],
        }
        pipe = StableDiffusionControlNetHDRPipeline(
            unet, vae, text, tok, PNDMScheduler(),
            gm_unet=gm_unet, controlnet=cnet,
        )
        return pipe, params

    def test_text_to_hdr_with_control(self, pipe_setup):
        pipe, params = pipe_setup
        ctrl = jax.random.uniform(jax.random.key(10), (1, 3, 32, 32))
        sdr_lat, gm_lat = pipe(
            params, "a scene", control_image=ctrl, key=jax.random.key(0),
            height=32, width=32, num_inference_steps=2, output_type="latent",
        )
        assert sdr_lat.shape == (1, 4, 4, 4)
        assert np.isfinite(np.asarray(sdr_lat)).all()
        assert np.isfinite(np.asarray(gm_lat)).all()

    def test_control_image_matters(self, pipe_setup):
        """With non-zero zero-convs, different control images must steer the
        SDR branch differently."""
        pipe, params = pipe_setup
        p = dict(params)
        p["controlnet"] = jax.tree.map(
            lambda a: a + 0.05 * jax.random.normal(jax.random.key(5), a.shape),
            params["controlnet"],
        )
        common = dict(
            key=jax.random.key(0), height=32, width=32,
            num_inference_steps=2, output_type="latent",
        )
        a, _ = pipe(p, "x", control_image=jnp.zeros((1, 3, 32, 32)), **common)
        b, _ = pipe(
            p, "x",
            control_image=jax.random.uniform(jax.random.key(11), (1, 3, 32, 32)),
            **common,
        )
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_low_memory_matches_batched_cfg(self, pipe_setup):
        """Sequential CFG through the ControlNet step body must match the
        CFG-doubled batch (same math, different batching) — the regression
        that shipped low_memory on dual.py but broke the ControlNet
        override's signature."""
        pipe, params = pipe_setup
        p = dict(params)
        p["controlnet"] = jax.tree.map(
            lambda a: a + 0.05 * jax.random.normal(jax.random.key(5), a.shape),
            params["controlnet"],
        )
        ctrl = jax.random.uniform(jax.random.key(13), (1, 3, 32, 32))
        common = dict(
            control_image=ctrl, key=jax.random.key(0), height=32, width=32,
            num_inference_steps=2, output_type="latent", guidance_scale=6.0,
        )
        a, a_gm = pipe(p, "a scene", **common)
        b, b_gm = pipe(p, "a scene", low_memory=True, **common)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(a_gm), np.asarray(b_gm), rtol=0, atol=2e-5
        )

    def test_no_control_falls_back_to_dual(self, pipe_setup):
        pipe, params = pipe_setup
        out = pipe(
            params, "x", key=jax.random.key(0), height=32, width=32,
            num_inference_steps=2, output_type="latent",
        )
        assert out[0].shape == (1, 4, 4, 4)

    def test_upconvert_sdr_to_hdrtv(self, pipe_setup):
        pipe, params = pipe_setup
        sdr = jax.random.uniform(jax.random.key(12), (1, 3, 32, 32))
        sdr01, gm01, hdr = upconvert_sdr_to_hdrtv(
            pipe, params, sdr, key=jax.random.key(0),
            num_inference_steps=2, qmax=99.0,
        )
        assert gm01.shape == (1, 8, 8, 3)  # tiny VAE decodes 4x4 -> 8x8...

    def test_upconvert_shapes_and_range(self, pipe_setup):
        pipe, params = pipe_setup
        sdr = jax.random.uniform(jax.random.key(12), (1, 3, 32, 32))
        sdr01, gm01, hdr = upconvert_sdr_to_hdrtv(
            pipe, params, sdr, key=jax.random.key(0),
            num_inference_steps=2, qmax=99.0,
        )
        assert hdr.shape[0] == 1 and hdr.shape[1] == 3
        assert np.isfinite(hdr).all()
        assert hdr.max() <= 100.0 + 1e-3


class TestControlNetTraining:
    def test_train_step_descends_and_freezes_unet(self, setup):
        """ControlNet train step: finite loss that drops on a repeated
        batch; gradients flow ONLY into the ControlNet params."""
        from gmdx.models import AutoencoderKL, CLIPTextModel
        from gmdx.schedulers import DDPMScheduler
        from gmdx.train import (
            ControlNetTrainConfig,
            init_controlnet_state,
            make_controlnet_train_step,
        )
        from gmdx.train.stage2 import make_optimizer

        unet, cnet, unet_params, cnet_params = setup
        vae = AutoencoderKL(TINY_VAE_CONFIG)
        text = CLIPTextModel(TINY_CLIP_CONFIG)
        frozen = {
            "unet": unet_params,
            "vae": vae.init(
                jax.random.key(1), jnp.zeros((1, 3, 16, 16)), jax.random.key(2)
            )["params"],
            "text_encoder": text.init(
                jax.random.key(3), jnp.zeros((1, 77), jnp.int32)
            )["params"],
        }
        cfg = ControlNetTrainConfig(learning_rate=1e-3, use_ema=True)
        opt = make_optimizer(cfg)
        state = init_controlnet_state(cfg, cnet_params, opt)
        step = make_controlnet_train_step(
            cfg, unet=unet, vae=vae, text_encoder=text, controlnet=cnet,
            noise_scheduler=DDPMScheduler(), optimizer=opt, donate=False,
        )
        batch = {
            "image": jax.random.uniform(jax.random.key(4), (2, 3, 16, 16))
            * 2 - 1,
            # control image at latent*8 (the tiny VAE downsamples 2x, so
            # the 16px target gives 8x8 latents -> 64px control)
            "cond": jax.random.uniform(jax.random.key(5), (2, 3, 64, 64))
            * 2 - 1,
            "input_ids": jnp.ones((2, 77), jnp.int32),
        }
        state, m1 = step(state, frozen, batch, jax.random.key(0))
        assert np.isfinite(float(m1["loss"]))
        assert float(m1["grad_norm"]) > 0
        assert int(state.step) == 1 and state.ema is not None
        state, m2 = step(state, frozen, batch, jax.random.key(0))
        assert float(m2["loss"]) < float(m1["loss"])

    def test_component_save_load_roundtrip(self, setup, tmp_path):
        """ControlNet saves/loads through the pipeline component format."""
        from gmdx.io.pipeline import load_component, save_component

        unet, cnet, unet_params, cnet_params = setup
        d = str(tmp_path / "controlnet")
        save_component(d, cnet.config, cnet_params, "ControlNetModel")
        loaded, params = load_component(d)
        assert loaded.config == cnet.config
        x = jnp.zeros((1, 4, 4, 4))
        cond = jnp.zeros((1, 3, 32, 32))
        a = cnet.apply({"params": cnet_params}, x, jnp.array(1.0),
                       jnp.zeros((1, 77, 32)), cond)
        b = loaded.apply({"params": params}, x, jnp.array(1.0),
                         jnp.zeros((1, 77, 32)), cond)
        for ra, rb in zip(list(a[0]) + [a[1]], list(b[0]) + [b[1]]):
            np.testing.assert_array_equal(np.asarray(ra), np.asarray(rb))
