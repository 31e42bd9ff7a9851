"""Pipeline integration tests on tiny components.

The denoise-loop algebra (CFG combine, channel concat order, scheduler
integration) is validated against an independent numpy mirror driven by a
linear probe "UNet" whose output is an exact closed-form function of its
input — so any bookkeeping error in the scan shows up as numeric divergence.
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
    StableDiffusionDualUNetImprovedPipeline,
    StableDiffusionDualUNetPipeline,
    StableDiffusionGMPipeline,
)
from gmdx.schedulers import PNDMScheduler
from tests.test_schedulers import numpy_plms_mirror

pytestmark = pytest.mark.slow  # excluded from the quick tier (pytest.ini)


LAT = (1, 4, 4, 4)


class ProbeUNet:
    """Linear probe: eps = 0.1 * (first 4 channels) + 0.2 * (last 4) + c(ctx).

    Distinguishes the sdr-conditioning channels from the noisy ones and is
    sensitive to the context, while staying exactly reproducible in numpy.
    """

    def apply(self, variables, sample, t, context, channels_last=False):
        ctx_term = jnp.mean(context, axis=(1, 2))[:, None, None, None] * 0.05
        if channels_last:
            return (
                0.1 * sample[..., :4] + 0.2 * sample[..., 4:8] + ctx_term
            ).astype(jnp.float32)
        return (
            0.1 * sample[:, :4] + 0.2 * sample[:, 4:8] + ctx_term
        ).astype(jnp.float32)


class ProbeUNet4:
    """4-channel probe for the dual pipeline's SDR branch."""

    def apply(self, variables, sample, t, context, channels_last=False):
        ctx_term = jnp.mean(context, axis=(1, 2))[:, None, None, None] * 0.05
        if channels_last:
            return (0.15 * sample[..., :4] + ctx_term).astype(jnp.float32)
        return (0.15 * sample[:, :4] + ctx_term).astype(jnp.float32)


@pytest.fixture(scope="module")
def components():
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


class TestGMPipeline:
    def test_end_to_end_shapes(self, components):
        unet8, _, vae, text, tok, params = components
        pipe = StableDiffusionGMPipeline(unet8, vae, text, tok, PNDMScheduler())
        sdr_latent = jax.random.normal(jax.random.key(5), LAT)
        out = pipe(
            params, sdr_latent, "a bright scene",
            key=jax.random.key(6), num_inference_steps=3, output_type="latent",
        )
        assert out.shape == LAT
        assert np.isfinite(np.asarray(out)).all()

    def test_deterministic_per_key(self, components):
        unet8, _, vae, text, tok, params = components
        pipe = StableDiffusionGMPipeline(unet8, vae, text, tok, PNDMScheduler())
        sdr_latent = jax.random.normal(jax.random.key(5), LAT)
        a = pipe(params, sdr_latent, "x", key=jax.random.key(7),
                 num_inference_steps=2, output_type="latent")
        b = pipe(params, sdr_latent, "x", key=jax.random.key(7),
                 num_inference_steps=2, output_type="latent")
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        c = pipe(params, sdr_latent, "x", key=jax.random.key(8),
                 num_inference_steps=2, output_type="latent")
        assert not np.allclose(np.asarray(a), np.asarray(c))

    def test_decode_output(self, components):
        unet8, _, vae, text, tok, params = components
        pipe = StableDiffusionGMPipeline(unet8, vae, text, tok, PNDMScheduler())
        sdr_latent = jax.random.normal(jax.random.key(5), LAT)
        img = pipe(params, sdr_latent, "x", key=jax.random.key(6),
                   num_inference_steps=2)
        # Tiny VAE has a single downsample, so 4x4 latents decode to 8x8.
        assert img.shape == (1, 8, 8, 3)
        assert img.min() >= 0.0 and img.max() <= 1.0

    def test_loop_algebra_matches_numpy_mirror(self, components):
        """Probe-UNet trajectory must equal the independent PLMS mirror with
        hand-computed CFG at every step."""
        _, _, vae, text, tok, params = components
        sched = PNDMScheduler()
        pipe = StableDiffusionGMPipeline(ProbeUNet(), vae, text, tok, sched)
        n = 4
        sdr_latent = np.asarray(
            jax.random.normal(jax.random.key(10), LAT), np.float64
        )
        init = np.asarray(jax.random.normal(jax.random.key(11), LAT), np.float64)
        g = 3.0

        cond, uncond = pipe.encode_prompt(params, "hello", None, do_cfg=True)
        c_cond = float(jnp.mean(cond)) * 0.05
        c_uncond = float(jnp.mean(uncond)) * 0.05

        # Mirror: eps_cfg at each step given current latent x.
        acp = np.asarray(sched.alphas_cumprod, np.float64)
        num_calls = sched.num_steps(n)

        # Generate the model outputs the probe would produce, stepping the
        # mirror as we go (model output depends on current x).
        plms_ts, _ = numpy_plms_mirror(
            sched.config, [np.zeros(LAT)] * num_calls, init.copy(), n, acp
        )

        # Re-run mirror with on-the-fly model outputs.
        def probe_eps(x):
            e_u = 0.1 * sdr_latent + 0.2 * x + c_uncond
            e_c = 0.1 * sdr_latent + 0.2 * x + c_cond
            return e_u + g * (e_c - e_u)

        # stateful numpy PLMS with dynamic model outputs
        ratio = sched.config.num_train_timesteps // n
        final_alpha = acp[0]

        def transfer(sample, t, prev_t, eps):
            a_t = acp[t]
            a_p = acp[prev_t] if prev_t >= 0 else final_alpha
            b_t, b_p = 1 - a_t, 1 - a_p
            denom = a_t * b_p**0.5 + (a_t * b_t * a_p) ** 0.5
            return (a_p / a_t) ** 0.5 * sample - (a_p - a_t) * eps / denom

        ets, counter, cur_sample = [], 0, None
        x = init.copy()
        for t in plms_ts:
            mo = probe_eps(x)
            if counter != 1:
                ets = ets[-3:] + [mo]
                prev_t = t - ratio
            else:
                prev_t = t
                t = t + ratio
            if len(ets) == 1 and counter == 0:
                eff = mo
                cur_sample = x
            elif len(ets) == 1 and counter == 1:
                eff = (mo + ets[-1]) / 2
                x = cur_sample
            elif len(ets) == 2:
                eff = (3 * ets[-1] - ets[-2]) / 2
            elif len(ets) == 3:
                eff = (23 * ets[-1] - 16 * ets[-2] + 5 * ets[-3]) / 12
            else:
                eff = (
                    55 * ets[-1] - 59 * ets[-2] + 37 * ets[-3] - 9 * ets[-4]
                ) / 24
            x = transfer(x, t, prev_t, eff)
            counter += 1

        got = pipe.denoise(
            params,
            jnp.asarray(sdr_latent, jnp.float32),
            cond,
            uncond,
            jnp.asarray(init, jnp.float32),
            num_inference_steps=n,
            guidance_scale=g,
        )
        np.testing.assert_allclose(np.asarray(got), x, rtol=1e-3, atol=1e-4)


class TestDualPipeline:
    def test_end_to_end_latent(self, components):
        unet8, unet4, vae, text, tok, params = components
        p = dict(params)
        p["gm_unet"] = params["unet"]
        p["unet"] = params["unet4"]
        pipe = StableDiffusionDualUNetPipeline(
            unet4, vae, text, tok, PNDMScheduler(), gm_unet=unet8
        )
        sdr_lat, gm_lat = pipe(
            p, "a scene", key=jax.random.key(0), height=32, width=32,
            num_inference_steps=3, output_type="latent",
        )
        assert sdr_lat.shape == (1, 4, 4, 4)
        assert gm_lat.shape == (1, 4, 4, 4)
        assert np.isfinite(np.asarray(gm_lat)).all()
        assert not np.allclose(np.asarray(sdr_lat), np.asarray(gm_lat))

    def test_intermediates(self, components):
        unet8, unet4, vae, text, tok, params = components
        p = dict(params)
        p["gm_unet"] = params["unet"]
        p["unet"] = params["unet4"]
        pipe = StableDiffusionDualUNetPipeline(
            unet4, vae, text, tok, PNDMScheduler(), gm_unet=unet8
        )
        (sdr_lat, gm_lat), inter = pipe(
            p, "x", key=jax.random.key(0), height=32, width=32,
            num_inference_steps=3, output_type="latent",
            return_intermediates=True,
        )
        n_steps = PNDMScheduler().num_steps(3)
        assert inter[0].shape == (n_steps, 1, 4, 4, 4)
        assert inter[1].shape == (n_steps, 1, 4, 4, 4)
        np.testing.assert_array_equal(np.asarray(inter[0][-1]), np.asarray(sdr_lat))
        np.testing.assert_array_equal(np.asarray(inter[1][-1]), np.asarray(gm_lat))

    def test_unknown_kwargs_swallowed(self, components):
        unet8, unet4, vae, text, tok, params = components
        p = dict(params)
        p["gm_unet"] = params["unet"]
        p["unet"] = params["unet4"]
        pipe = StableDiffusionDualUNetImprovedPipeline(
            unet4, vae, text, tok, PNDMScheduler(), gm_unet=unet8
        )
        out = pipe(
            p, "x", key=jax.random.key(0), height=32, width=32,
            num_inference_steps=2, output_type="latent",
            use_karras_sigmas=True, noise_level=20,
        )
        assert out[0].shape == (1, 4, 4, 4)

    def test_low_memory_matches_batched_cfg(self, components):
        """Sequential CFG (low_memory=True, VERDICT r4 item 2): two
        batch-B UNet passes via lax.map must produce the same latents as
        the one CFG-doubled batch — same math, different peak memory."""
        unet8, unet4, vae, text, tok, params = components
        p = dict(params)
        p["gm_unet"] = params["unet"]
        p["unet"] = params["unet4"]
        pipe = StableDiffusionDualUNetPipeline(
            unet4, vae, text, tok, PNDMScheduler(), gm_unet=unet8
        )
        kw = dict(
            key=jax.random.key(0), height=32, width=32,
            num_inference_steps=3, guidance_scale=7.5, output_type="latent",
        )
        sdr_a, gm_a = pipe(p, ["a", "b"], **kw)
        sdr_b, gm_b = pipe(p, ["a", "b"], low_memory=True, **kw)
        # fp32 reduction-order roundoff only: batched-vs-split GEMMs reduce
        # in different orders, amplified over the scan (~4e-5 rel observed)
        np.testing.assert_allclose(
            np.asarray(sdr_b), np.asarray(sdr_a), rtol=3e-4, atol=3e-5
        )
        np.testing.assert_allclose(
            np.asarray(gm_b), np.asarray(gm_a), rtol=3e-4, atol=3e-5
        )

    def test_gm_low_memory_matches_batched_cfg(self, components):
        """Same equivalence for the single-UNet GM pipeline's CFG loop."""
        unet8, unet4, vae, text, tok, params = components
        pipe = StableDiffusionGMPipeline(unet8, vae, text, tok, PNDMScheduler())
        key = jax.random.key(1)
        sdr_latent = jax.random.normal(jax.random.key(2), (1, 4, 4, 4))
        kw = dict(
            key=key, num_inference_steps=3, guidance_scale=7.5,
            output_type="latent",
        )
        a = pipe(params, sdr_latent, "a scene", **kw)
        b = pipe(params, sdr_latent, "a scene", low_memory=True, **kw)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=3e-4, atol=3e-5
        )

    def test_chunked_decode_matches_batched(self, components):
        """decode_latents(chunk=N) (the low_memory decode path — at 1024²
        the BATCHED decode is what OOMs, BENCHNOTES r5) must match the one
        batched decode per image."""
        unet8, unet4, vae, text, tok, params = components
        pipe = StableDiffusionGMPipeline(unet8, vae, text, tok, PNDMScheduler())
        lat = jax.random.normal(jax.random.key(3), (4, 4, 4, 4))
        full = np.asarray(pipe.decode_latents(params, lat))
        for chunk in (1, 2):
            got = np.asarray(pipe.decode_latents(params, lat, chunk=chunk))
            np.testing.assert_allclose(got, full, rtol=1e-5, atol=1e-6)
        with pytest.raises(ValueError):
            pipe.decode_latents(params, lat, chunk=3)

    def test_gm_branch_is_conditional_only(self, components):
        """With a probe GM UNet sensitive to context batch size, the GM branch
        must see only the conditional embeddings (batch 1, not 2)."""
        _, _, vae, text, tok, params = components

        seen = {}

        class RecordingProbe:
            def apply(self, variables, sample, t, context, channels_last=False):
                seen["gm_ctx_batch"] = context.shape[0]
                ch_ax = -1 if channels_last else 1
                seen["gm_in_channels"] = sample.shape[ch_ax]
                return jnp.zeros_like(
                    sample[..., 4:8] if channels_last else sample[:, 4:8]
                )

        pipe = StableDiffusionDualUNetPipeline(
            ProbeUNet4(), vae, text, tok, PNDMScheduler(), gm_unet=RecordingProbe()
        )
        p = dict(params)
        p["gm_unet"] = {}  # probes ignore their params
        pipe(
            p, "x", key=jax.random.key(0), height=32, width=32,
            num_inference_steps=2, guidance_scale=7.5, output_type="latent",
        )
        assert seen["gm_ctx_batch"] == 1  # conditional-only, no CFG doubling
        assert seen["gm_in_channels"] == 8  # [x0, gm_latents] concat


class TestEtaPath:
    def test_ddim_eta_changes_output(self, components):
        """eta>0 reaches DDIM's stochastic branch through the pipeline
        (reference prepare_extra_step_kwargs path, stable_diffusion_gm.py:
        610-625); deterministic eta=0 must stay reproducible."""
        from gmdx.schedulers import DDIMScheduler

        unet8, _, vae, text, tok, params = components
        pipe = StableDiffusionGMPipeline(unet8, vae, text, tok, DDIMScheduler())
        sdr_latent = jax.random.normal(jax.random.key(5), LAT)
        common = dict(key=jax.random.key(7), num_inference_steps=3,
                      output_type="latent")
        a = pipe(params, sdr_latent, "x", eta=0.0, **common)
        b = pipe(params, sdr_latent, "x", eta=0.0, **common)
        c = pipe(params, sdr_latent, "x", eta=1.0, **common)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert not np.allclose(np.asarray(a), np.asarray(c))


class TestSafetyChecker:
    def test_hook_invoked(self, components):
        unet8, _, vae, text, tok, params = components
        calls = {}

        def checker(imgs):
            calls["n"] = imgs.shape[0]
            return imgs * 0.0, [True] * imgs.shape[0]

        pipe = StableDiffusionGMPipeline(
            unet8, vae, text, tok, PNDMScheduler(), safety_checker=checker
        )
        sdr_latent = jax.random.normal(jax.random.key(5), LAT)
        img = pipe(params, sdr_latent, "x", key=jax.random.key(6),
                   num_inference_steps=2)
        assert calls["n"] == 1
        assert (img == 0).all()


class TestDualBatchGreaterThanOne:
    def test_gm_context_sliced_by_batch(self, components):
        """At batch 2 under CFG, the GM branch must see exactly the 2
        conditional embeddings — the reference's [1:] mis-slice would pass 3
        (SURVEY.md §3.4; fixed per its own Vis subclass)."""
        _, _, vae, text, tok, params = components

        seen = {}

        class RecordingProbe:
            def apply(self, variables, sample, t, context, channels_last=False):
                seen["gm_ctx_batch"] = context.shape[0]
                return jnp.zeros_like(
                    sample[..., 4:8] if channels_last else sample[:, 4:8]
                )

        pipe = StableDiffusionDualUNetPipeline(
            ProbeUNet4(), vae, text, tok, PNDMScheduler(),
            gm_unet=RecordingProbe(),
        )
        p = dict(params)
        p["gm_unet"] = {}
        sdr, gm = pipe(
            p, ["a", "b"], key=jax.random.key(0), height=32, width=32,
            num_inference_steps=2, guidance_scale=7.5, output_type="latent",
        )
        assert seen["gm_ctx_batch"] == 2
        assert sdr.shape == (2, 4, 4, 4) and gm.shape == (2, 4, 4, 4)


class TestLCMSampling:
    def test_gm_pipeline_with_lcm_4_steps(self, components):
        from gmdx.schedulers import LCMScheduler

        unet8, _, vae, text, tok, params = components
        pipe = StableDiffusionGMPipeline(
            unet8, vae, text, tok, LCMScheduler(original_inference_steps=50)
        )
        sdr_latent = jax.random.normal(jax.random.key(5), LAT)
        out = pipe(
            params, sdr_latent, "a bright scene",
            key=jax.random.key(6), num_inference_steps=4, output_type="latent",
        )
        assert out.shape == LAT
        assert np.isfinite(np.asarray(out)).all()
        # Deterministic per key.
        again = pipe(
            params, sdr_latent, "a bright scene",
            key=jax.random.key(6), num_inference_steps=4, output_type="latent",
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(again))


class TestCallAPIParity:
    """Round-2 reference __call__ surface: prompt_embeds=,
    num_images_per_prompt, cross_attention_kwargs LoRA scale
    (stable_diffusion_gm.py:780-811, formal_improved.py:259-269)."""

    def test_prompt_embeds_injection_matches_encoded(self, components):
        unet8, _, vae, text, tok, params = components
        pipe = StableDiffusionGMPipeline(unet8, vae, text, tok, PNDMScheduler())
        sdr_latent = jax.random.normal(jax.random.key(5), LAT)
        lat = jax.random.normal(jax.random.key(9), LAT)
        cond, uncond = pipe.encode_prompt(params, "a scene", None)
        via_prompt = pipe(
            params, sdr_latent, "a scene", latents=lat,
            num_inference_steps=2, output_type="latent",
        )
        via_embeds = pipe(
            params, sdr_latent, prompt_embeds=cond,
            negative_prompt_embeds=uncond, latents=lat,
            num_inference_steps=2, output_type="latent",
        )
        np.testing.assert_array_equal(np.asarray(via_prompt),
                                      np.asarray(via_embeds))

    def test_prompt_embeds_without_negative_raises_under_cfg(self, components):
        unet8, _, vae, text, tok, params = components
        pipe = StableDiffusionGMPipeline(unet8, vae, text, tok, PNDMScheduler())
        sdr_latent = jax.random.normal(jax.random.key(5), LAT)
        with pytest.raises(ValueError, match="negative_prompt_embeds"):
            pipe(params, sdr_latent,
                 prompt_embeds=jnp.zeros((1, 7, 32)),
                 num_inference_steps=2, output_type="latent")

    def test_num_images_per_prompt_batches(self, components):
        unet8, _, vae, text, tok, params = components
        pipe = StableDiffusionGMPipeline(unet8, vae, text, tok, PNDMScheduler())
        sdr_latent = jax.random.normal(jax.random.key(5), LAT)
        out = pipe(
            params, sdr_latent, "x", key=jax.random.key(6),
            num_images_per_prompt=3, num_inference_steps=2,
            output_type="latent",
        )
        assert out.shape == (3, 4, 4, 4)
        assert np.isfinite(np.asarray(out)).all()

    def test_num_images_per_prompt_dual(self, components):
        unet8, unet4, vae, text, tok, params = components
        pipe = StableDiffusionDualUNetPipeline(
            unet4, vae, text, tok, PNDMScheduler(), gm_unet=unet8,
        )
        p = {"unet": params["unet4"], "gm_unet": params["unet"],
             "vae": params["vae"], "text_encoder": params["text_encoder"]}
        sdr, gm = pipe(
            p, "x", key=jax.random.key(6), height=32, width=32,
            num_images_per_prompt=2, num_inference_steps=2,
            output_type="latent",
        )
        assert sdr.shape == (2, 4, 4, 4) and gm.shape == (2, 4, 4, 4)

    def test_cross_attention_scale_equals_merged_lora(self, components):
        from gmdx.models.lora import LoRAConfig, init_lora_params, merge_lora

        unet8, _, vae, text, tok, params = components
        pipe = StableDiffusionGMPipeline(unet8, vae, text, tok, PNDMScheduler())
        sdr_latent = jax.random.normal(jax.random.key(5), LAT)
        lat = jax.random.normal(jax.random.key(9), LAT)
        lora = init_lora_params(
            jax.random.key(10), params["unet"], LoRAConfig(rank=2, alpha=2)
        )
        # make the delta nonzero (b starts at zeros)
        lora = jax.tree.map(
            lambda x: x + 0.05 * jnp.ones_like(x), lora
        )
        p_with = dict(params)
        p_with["unet_lora"] = lora
        via_kwargs = pipe(
            params | {"unet_lora": lora}, sdr_latent, "x", latents=lat,
            num_inference_steps=2, output_type="latent",
            cross_attention_kwargs={"scale": 0.8},
        )
        merged = dict(params)
        merged["unet"] = merge_lora(
            params["unet"], lora, 0.8 * LoRAConfig().scale
        )
        via_merge = pipe(
            merged, sdr_latent, "x", latents=lat,
            num_inference_steps=2, output_type="latent",
        )
        np.testing.assert_allclose(
            np.asarray(via_kwargs), np.asarray(via_merge), atol=1e-6
        )
        # scale with no LoRA in params: silent no-op (reference behavior)
        no_lora = pipe(
            params, sdr_latent, "x", latents=lat,
            num_inference_steps=2, output_type="latent",
            cross_attention_kwargs={"scale": 0.8},
        )
        base = pipe(
            params, sdr_latent, "x", latents=lat,
            num_inference_steps=2, output_type="latent",
        )
        np.testing.assert_array_equal(np.asarray(no_lora), np.asarray(base))

    def test_custom_timesteps_sigmas_rejected(self, components):
        """The reference's retrieve_timesteps raises for timesteps=/sigmas=
        with every scheduler it pins (stable_diffusion_gm.py:97-153)."""
        unet8, unet4, vae, text, tok, params = components
        pipe = StableDiffusionGMPipeline(unet8, vae, text, tok, PNDMScheduler())
        sdr_latent = jax.random.normal(jax.random.key(5), LAT)
        with pytest.raises(ValueError, match="timesteps"):
            pipe(params, sdr_latent, "x", num_inference_steps=2,
                 timesteps=[999, 500, 1], output_type="latent")
        with pytest.raises(ValueError, match="sigmas"):
            pipe(params, sdr_latent, "x", num_inference_steps=2,
                 sigmas=[1.0, 0.5, 0.0], output_type="latent")
        dual = StableDiffusionDualUNetPipeline(
            unet4, vae, text, tok, PNDMScheduler(), gm_unet=unet8,
        )
        p = {"unet": params["unet4"], "gm_unet": params["unet"],
             "vae": params["vae"], "text_encoder": params["text_encoder"]}
        with pytest.raises(ValueError, match="timesteps"):
            dual(p, "x", height=32, width=32, num_inference_steps=2,
                 timesteps=[999, 1], output_type="latent")


class TestStepEndCallbacks:
    """Reference callback surface (stable_diffusion_gm.py:806-810,898-913,
    1073-1088): ``callback_on_step_end`` + legacy ``callback``/
    ``callback_steps`` — observer semantics emulated post-hoc over the scan
    ys; tensor-mutating callbacks rejected loudly."""

    def _gm(self, components):
        unet8, _, vae, text, tok, params = components
        pipe = StableDiffusionGMPipeline(unet8, vae, text, tok, PNDMScheduler())
        return pipe, params

    def _dual(self, components):
        unet8, unet4, vae, text, tok, params = components
        p = dict(params)
        p["gm_unet"] = params["unet"]
        p["unet"] = params["unet4"]
        pipe = StableDiffusionDualUNetPipeline(
            unet4, vae, text, tok, PNDMScheduler(), gm_unet=unet8
        )
        return pipe, p

    def test_gm_observer_callback_sees_every_step(self, components):
        pipe, params = self._gm(components)
        sdr_latent = jax.random.normal(jax.random.key(5), LAT)
        seen = []

        def on_step_end(pl, i, t, kw):
            assert pl is pipe
            assert set(kw) == {"latents"}
            seen.append((i, int(t), kw["latents"].shape))
            return kw  # returning the kwargs unchanged is the diffusers idiom

        out = pipe(params, sdr_latent, "x", key=jax.random.key(6),
                   num_inference_steps=3, output_type="latent",
                   callback_on_step_end=on_step_end)
        n = PNDMScheduler().num_steps(3)
        assert [i for i, _, _ in seen] == list(range(n))
        ts = [t for _, t, _ in seen]
        assert ts == sorted(ts, reverse=True) or len(set(ts)) < len(ts)
        assert all(s == LAT for _, _, s in seen)
        assert out.shape == LAT

    def test_callback_does_not_change_result(self, components):
        pipe, params = self._gm(components)
        sdr_latent = jax.random.normal(jax.random.key(5), LAT)
        base = pipe(params, sdr_latent, "x", key=jax.random.key(6),
                    num_inference_steps=2, output_type="latent")
        cb = pipe(params, sdr_latent, "x", key=jax.random.key(6),
                  num_inference_steps=2, output_type="latent",
                  callback_on_step_end=lambda pl, i, t, kw: kw)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(cb))

    def test_final_callback_latents_match_output(self, components):
        pipe, params = self._gm(components)
        sdr_latent = jax.random.normal(jax.random.key(5), LAT)
        last = {}

        def on_step_end(pl, i, t, kw):
            last["latents"] = kw["latents"]
            return kw

        out = pipe(params, sdr_latent, "x", key=jax.random.key(6),
                   num_inference_steps=3, output_type="latent",
                   callback_on_step_end=on_step_end)
        np.testing.assert_array_equal(last["latents"], np.asarray(out))

    def test_tensor_inputs_whitelist(self, components):
        pipe, params = self._gm(components)
        sdr_latent = jax.random.normal(jax.random.key(5), LAT)
        got = []

        def on_step_end(pl, i, t, kw):
            got.append(set(kw))
            assert kw["prompt_embeds"].shape[-2] == 77
            return kw

        pipe(params, sdr_latent, "x", num_inference_steps=2,
             output_type="latent", callback_on_step_end=on_step_end,
             callback_on_step_end_tensor_inputs=["latents", "prompt_embeds"])
        assert got and all(s == {"latents", "prompt_embeds"} for s in got)
        with pytest.raises(ValueError, match="tensor_inputs"):
            pipe(params, sdr_latent, "x", num_inference_steps=2,
                 output_type="latent", callback_on_step_end=on_step_end,
                 callback_on_step_end_tensor_inputs=["not_a_tensor"])

    def test_mutating_callback_rejected(self, components):
        pipe, params = self._gm(components)
        sdr_latent = jax.random.normal(jax.random.key(5), LAT)

        def mutator(pl, i, t, kw):
            return {"latents": kw["latents"] + 1.0}

        with pytest.raises(NotImplementedError, match="mutating"):
            pipe(params, sdr_latent, "x", num_inference_steps=2,
                 output_type="latent", callback_on_step_end=mutator)

    def test_legacy_callback_and_steps(self, components):
        pipe, params = self._gm(components)
        sdr_latent = jax.random.normal(jax.random.key(5), LAT)
        seen = []
        pipe(params, sdr_latent, "x", num_inference_steps=3,
             output_type="latent",
             callback=lambda i, t, lat: seen.append(i), callback_steps=2)
        n = PNDMScheduler().num_steps(3)
        assert seen == [i for i in range(n) if i % 2 == 0]
        with pytest.raises(ValueError, match="callback_steps"):
            pipe(params, sdr_latent, "x", num_inference_steps=2,
                 output_type="latent",
                 callback=lambda i, t, lat: None, callback_steps=0)

    def test_dual_callback_sees_sdr_branch(self, components):
        pipe, p = self._dual(components)
        seen = []

        def on_step_end(pl, i, t, kw):
            seen.append(kw["latents"].copy())
            return kw

        (sdr_lat, gm_lat), inter = pipe(
            p, "x", key=jax.random.key(0), height=32, width=32,
            num_inference_steps=3, output_type="latent",
            return_intermediates=True, callback_on_step_end=on_step_end,
        )
        assert len(seen) == PNDMScheduler().num_steps(3)
        # `latents` local in the reference loop is the SDR branch
        # (stable_diffusion_dual_unet.py:1077-1088)
        np.testing.assert_array_equal(seen[-1], np.asarray(sdr_lat))
        np.testing.assert_array_equal(
            np.stack(seen), np.asarray(inter[0])
        )

    def test_pipeline_callback_object_tensor_inputs(self, components):
        """PipelineCallback-style objects carry tensor_inputs (reference
        :915-916)."""
        pipe, params = self._gm(components)
        sdr_latent = jax.random.normal(jax.random.key(5), LAT)
        calls = []

        class CB:
            tensor_inputs = ["latents", "negative_prompt_embeds"]

            def __call__(self, pl, i, t, kw):
                calls.append(set(kw))
                return kw

        pipe(params, sdr_latent, "x", num_inference_steps=2,
             output_type="latent", callback_on_step_end=CB())
        assert calls and all(
            s == {"latents", "negative_prompt_embeds"} for s in calls
        )


class TestAOTCache:
    def test_aot_cache_matches_jit_path(self, components, tmp_path, monkeypatch):
        """GMDX_AOT_CACHE=1 routes denoise through cached_export (serialized
        trace; + serialized executable on TPU) — results must match the
        in-process jit path bit-for-bit, and a second call must hit the
        on-disk artifact."""
        unet8, _, vae, text, tok, params = components
        pipe = StableDiffusionGMPipeline(unet8, vae, text, tok, PNDMScheduler())
        sdr_latent = jax.random.normal(jax.random.key(5), LAT)
        base = pipe(params, sdr_latent, "x", key=jax.random.key(6),
                    num_inference_steps=2, output_type="latent")
        monkeypatch.setenv("GMDX_AOT_CACHE", "1")
        monkeypatch.setenv("GMDX_EXPORT_CACHE", str(tmp_path))
        pipe2 = StableDiffusionGMPipeline(unet8, vae, text, tok, PNDMScheduler())
        aot = pipe2(params, sdr_latent, "x", key=jax.random.key(6),
                    num_inference_steps=2, output_type="latent")
        np.testing.assert_array_equal(np.asarray(base), np.asarray(aot))
        arts = list(tmp_path.glob("*.jaxexp"))
        assert arts, "no export artifact written"
        aot2 = pipe2(params, sdr_latent, "x", key=jax.random.key(6),
                     num_inference_steps=2, output_type="latent")
        np.testing.assert_array_equal(np.asarray(base), np.asarray(aot2))

    def test_aot_cache_dual(self, components, tmp_path, monkeypatch):
        unet8, unet4, vae, text, tok, params = components
        p = dict(params)
        p["gm_unet"] = params["unet"]
        p["unet"] = params["unet4"]
        pipe = StableDiffusionDualUNetPipeline(
            unet4, vae, text, tok, PNDMScheduler(), gm_unet=unet8
        )
        base = pipe(p, "x", key=jax.random.key(0), height=32, width=32,
                    num_inference_steps=2, output_type="latent")
        monkeypatch.setenv("GMDX_AOT_CACHE", "1")
        monkeypatch.setenv("GMDX_EXPORT_CACHE", str(tmp_path))
        pipe2 = StableDiffusionDualUNetPipeline(
            unet4, vae, text, tok, PNDMScheduler(), gm_unet=unet8
        )
        aot = pipe2(p, "x", key=jax.random.key(0), height=32, width=32,
                    num_inference_steps=2, output_type="latent")
        np.testing.assert_array_equal(np.asarray(base[0]), np.asarray(aot[0]))
        np.testing.assert_array_equal(np.asarray(base[1]), np.asarray(aot[1]))
