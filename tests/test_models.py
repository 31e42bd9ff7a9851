"""Model forward tests on tiny configs (deterministic params, jitted)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gmdx.models import (
    AutoencoderKL,
    CLIPTextModel,
    CLIPTokenizer,
    Discriminator,
    LoRAConfig,
    TINY_CLIP_CONFIG,
    TINY_UNET_CONFIG,
    TINY_VAE_CONFIG,
    UNet2DConditionModel,
    VGG19Features,
    apply_lora,
    inflate_conv_in,
    init_lora_params,
    lora_targets,
    perceptual_loss,
)
from gmdx.models.layers import timestep_embedding
from gmdx.models.vae import DiagonalGaussianDistribution
import dataclasses


class TestTimestepEmbedding:
    def test_shape_and_flip(self):
        emb = timestep_embedding(jnp.array([0.0, 10.0, 999.0]), 32)
        assert emb.shape == (3, 32)
        # t=0: cos half = 1, sin half = 0 under flip_sin_to_cos.
        np.testing.assert_allclose(emb[0, :16], 1.0, atol=1e-6)
        np.testing.assert_allclose(emb[0, 16:], 0.0, atol=1e-6)

    def test_distinct_timesteps_distinct_embeddings(self):
        emb = timestep_embedding(jnp.arange(100, dtype=jnp.float32), 64)
        d = np.linalg.norm(np.asarray(emb[1:]) - np.asarray(emb[:-1]), axis=1)
        assert (d > 1e-3).all()


class TestUpsample2D:
    def test_subpixel_matches_naive_composition(self, monkeypatch):
        """The default sub-pixel path (one 2x2 conv on the low-res input +
        depth-to-space) must equal nearest-2x-then-conv3x3 exactly — same
        params, same math, 2.25x fewer MACs (BENCHNOTES.md round 2)."""
        from gmdx.models.layers import Upsample2D

        x = jax.random.normal(jax.random.key(0), (2, 7, 5, 12))
        m = Upsample2D(10)
        monkeypatch.setenv("GMDX_SUBPIXEL_UPSAMPLE", "0")
        params = m.init(jax.random.key(1), x)
        y_naive = m.apply(params, x)
        monkeypatch.setenv("GMDX_SUBPIXEL_UPSAMPLE", "1")
        # identical param tree (converter/checkpoint layout is unchanged)
        params_sub = m.init(jax.random.key(1), x)
        assert jax.tree_util.tree_structure(params) == (
            jax.tree_util.tree_structure(params_sub)
        )
        y_sub = m.apply(params, x)
        assert y_sub.shape == (2, 14, 10, 10)
        np.testing.assert_allclose(
            np.asarray(y_sub), np.asarray(y_naive), atol=1e-5
        )
        # Both lowerings of the phase conv (2x2 conv_general vs 4 shifted
        # matmuls) must agree too.
        monkeypatch.setenv("GMDX_SUBPIXEL_DOT", "0")
        y_conv = m.apply(params, x)
        np.testing.assert_allclose(
            np.asarray(y_sub), np.asarray(y_conv), atol=1e-5
        )


class TestUNet:
    @pytest.fixture(scope="class")
    def unet(self):
        model = UNet2DConditionModel(TINY_UNET_CONFIG)
        x = jnp.zeros((1, 4, 16, 16))
        ctx = jnp.zeros((1, 7, 32))
        params = model.init(jax.random.key(0), x, jnp.array(1.0), ctx)["params"]
        return model, params

    def test_forward_shape(self, unet):
        model, params = unet
        x = jax.random.normal(jax.random.key(1), (2, 4, 16, 16))
        ctx = jax.random.normal(jax.random.key(2), (2, 7, 32))
        out = jax.jit(model.apply)({"params": params}, x, jnp.array(5.0), ctx)
        assert out.shape == (2, 4, 16, 16)
        assert jnp.isfinite(out).all()

    def test_timestep_conditioning_matters(self, unet):
        model, params = unet
        x = jax.random.normal(jax.random.key(1), (1, 4, 16, 16))
        ctx = jax.random.normal(jax.random.key(2), (1, 7, 32))
        f = jax.jit(model.apply)
        a = f({"params": params}, x, jnp.array(1.0), ctx)
        b = f({"params": params}, x, jnp.array(900.0), ctx)
        assert not np.allclose(a, b)

    def test_context_conditioning_matters(self, unet):
        model, params = unet
        x = jax.random.normal(jax.random.key(1), (1, 4, 16, 16))
        f = jax.jit(model.apply)
        a = f({"params": params}, x, jnp.array(1.0),
              jax.random.normal(jax.random.key(2), (1, 7, 32)))
        b = f({"params": params}, x, jnp.array(1.0),
              jax.random.normal(jax.random.key(3), (1, 7, 32)))
        assert not np.allclose(a, b)

    def test_conv_in_inflation(self, unet):
        model, params = unet
        cfg8 = dataclasses.replace(TINY_UNET_CONFIG, in_channels=8)
        model8 = UNet2DConditionModel(cfg8)
        params8 = inflate_conv_in(params, 8, scale=0.5)
        x4 = jax.random.normal(jax.random.key(1), (1, 4, 16, 16))
        ctx = jax.random.normal(jax.random.key(2), (1, 7, 32))
        # Duplicated input at half weight == original output.
        x8 = jnp.concatenate([x4, x4], axis=1)
        out4 = jax.jit(model.apply)({"params": params}, x4, jnp.array(3.0), ctx)
        out8 = jax.jit(model8.apply)({"params": params8}, x8, jnp.array(3.0), ctx)
        np.testing.assert_allclose(out4, out8, rtol=1e-4, atol=1e-5)


class TestVAE:
    @pytest.fixture(scope="class")
    def vae(self):
        model = AutoencoderKL(TINY_VAE_CONFIG)
        x = jnp.zeros((1, 3, 32, 32))
        params = model.init(jax.random.key(0), x, jax.random.key(1))["params"]
        return model, params

    def test_encode_decode_shapes(self, vae):
        model, params = vae
        x = jax.random.normal(jax.random.key(1), (2, 3, 32, 32))

        @jax.jit
        def roundtrip(x, key):
            post = model.apply({"params": params}, x, method=model.encode)
            z = post.sample(key)
            img = model.apply({"params": params}, z, method=model.decode)
            return post.mean, z, img

        mean, z, img = roundtrip(x, jax.random.key(2))
        # (32, 64) tiny config has one downsample: 32 -> 16.
        assert mean.shape == (2, 4, 16, 16)
        assert z.shape == (2, 4, 16, 16)
        assert img.shape == (2, 3, 32, 32)
        assert jnp.isfinite(img).all()

    def test_posterior_math(self):
        moments = jnp.concatenate(
            [jnp.full((1, 4, 2, 2), 1.5), jnp.zeros((1, 4, 2, 2))], axis=1
        )
        post = DiagonalGaussianDistribution(moments)
        np.testing.assert_allclose(post.mode(), 1.5)
        np.testing.assert_allclose(post.std, 1.0)
        s1 = post.sample(jax.random.key(0))
        s2 = post.sample(jax.random.key(0))
        np.testing.assert_array_equal(s1, s2)
        # logvar=0, mean=1.5: kl = 0.5 * sum(mean^2) = 0.5 * 16 * 2.25
        np.testing.assert_allclose(post.kl(), 0.5 * 16 * 2.25, rtol=1e-5)


class TestCLIP:
    def test_forward_and_clip_skip(self):
        model = CLIPTextModel(TINY_CLIP_CONFIG)
        ids = jnp.array([[1, 5, 9, 2, 0, 0, 0]], jnp.int32)
        params = model.init(jax.random.key(0), ids)["params"]
        f = jax.jit(model.apply, static_argnames=("clip_skip",))
        out = f({"params": params}, ids)
        assert out.shape == (1, 7, 32)
        skip = f({"params": params}, ids, clip_skip=1)
        assert skip.shape == (1, 7, 32)
        assert not np.allclose(out, skip)

    def test_causality(self):
        model = CLIPTextModel(TINY_CLIP_CONFIG)
        ids1 = jnp.array([[1, 5, 9, 2, 7]], jnp.int32)
        ids2 = jnp.array([[1, 5, 9, 2, 8]], jnp.int32)  # differs at last pos
        params = model.init(jax.random.key(0), ids1)["params"]
        f = jax.jit(model.apply)
        a, b = f({"params": params}, ids1), f({"params": params}, ids2)
        np.testing.assert_allclose(a[:, :4], b[:, :4], atol=1e-5)
        assert not np.allclose(a[:, 4], b[:, 4])


class TestTokenizer:
    def test_tiny_roundtrip(self):
        tok = CLIPTokenizer.tiny()
        out = tok("Hello WORLD")
        ids = out["input_ids"]
        assert ids.shape == (1, 77)
        assert ids[0, 0] == tok.bos_token_id
        assert tok.eos_token_id in ids[0]
        assert tok.decode(ids[0]) == "hello world"

    def test_padding_and_mask(self):
        tok = CLIPTokenizer.tiny()
        out = tok(["a", "abc def"])
        assert out["input_ids"].shape == (2, 77)
        assert out["attention_mask"][0].sum() == 3  # bos + 'a</w>' + eos
        assert (out["input_ids"][0][3:] == tok.pad_token_id).all()

    def test_truncation(self):
        tok = CLIPTokenizer.tiny()
        out = tok("x " * 200)
        ids = out["input_ids"]
        assert ids.shape == (1, 77)
        assert ids[0, -1] == tok.eos_token_id

    def test_bpe_merges_apply(self):
        # Vocab with a merge: 'a' + 'b</w>' -> 'ab</w>'.
        from gmdx.models.tokenizer import bytes_to_unicode

        chars = list(bytes_to_unicode().values())
        vocab = {c: i for i, c in enumerate(chars)}
        n = len(vocab)
        for i, c in enumerate(chars):
            vocab[c + "</w>"] = n + i
        vocab["ab</w>"] = len(vocab)
        vocab["<|startoftext|>"] = len(vocab)
        vocab["<|endoftext|>"] = len(vocab)
        tok = CLIPTokenizer(vocab, [("a", "b</w>")])
        ids = tok.tokenize("ab")
        assert ids == [vocab["ab</w>"]]
        assert tok.tokenize("cab") == [vocab["c"], vocab["ab</w>"]]


class TestDiscriminator:
    def test_forward(self):
        model = Discriminator(depth=4, hidden_channels=64)
        x = jnp.zeros((1, 3, 64, 64))
        variables = model.init(jax.random.key(0), x)
        f = jax.jit(
            lambda v, x: model.apply(v, x, update_sn=False)
        )
        out = f(variables, jax.random.normal(jax.random.key(1), (2, 3, 64, 64)))
        assert out.shape == (2, 1, 4, 4)
        assert (out >= 0).all() and (out <= 1).all()

    def test_conditioning(self):
        model = Discriminator(depth=4, hidden_channels=64, cond_channels=8)
        x = jnp.zeros((1, 3, 64, 64))
        cond = jnp.zeros((1, 8))
        variables = model.init(jax.random.key(0), x, cond)
        out = jax.jit(lambda v, x, c: model.apply(v, x, c))(
            variables,
            jax.random.normal(jax.random.key(1), (1, 3, 64, 64)),
            jax.random.normal(jax.random.key(2), (1, 8)),
        )
        assert out.shape == (1, 1, 4, 4)


class TestVGG:
    def test_feature_pyramid(self):
        model = VGG19Features()
        x = jnp.zeros((1, 3, 64, 64))
        params = model.init(jax.random.key(0), x)["params"]
        feats = jax.jit(model.apply)({"params": params},
                                     jax.random.uniform(jax.random.key(1), (1, 3, 64, 64)))
        assert len(feats) == 5
        assert feats[0].shape == (1, 64, 64, 64)
        assert feats[-1].shape == (1, 4, 4, 512)
        loss = perceptual_loss(feats, [f + 1.0 for f in feats])
        np.testing.assert_allclose(loss, 1.0, rtol=1e-5)


class TestLoRA:
    def test_targets_all_kernels(self):
        model = UNet2DConditionModel(TINY_UNET_CONFIG)
        x = jnp.zeros((1, 4, 16, 16))
        ctx = jnp.zeros((1, 7, 32))
        params = model.init(jax.random.key(0), x, jnp.array(1.0), ctx)["params"]
        targets = lora_targets(params)
        assert len(targets) > 20
        assert all(p[-1] == "kernel" for p in targets)

    def test_zero_init_is_identity(self):
        model = UNet2DConditionModel(TINY_UNET_CONFIG)
        x = jax.random.normal(jax.random.key(1), (1, 4, 16, 16))
        ctx = jax.random.normal(jax.random.key(2), (1, 7, 32))
        params = model.init(jax.random.key(0), x, jnp.array(1.0), ctx)["params"]
        lora = init_lora_params(jax.random.key(3), params, LoRAConfig(rank=4))
        merged = apply_lora(params, lora, LoRAConfig(rank=4))
        f = jax.jit(model.apply)
        np.testing.assert_allclose(
            f({"params": params}, x, jnp.array(1.0), ctx),
            f({"params": merged}, x, jnp.array(1.0), ctx),
            atol=1e-6,
        )

    def test_nonzero_b_changes_output_and_grads_flow(self):
        model = UNet2DConditionModel(TINY_UNET_CONFIG)
        x = jax.random.normal(jax.random.key(1), (1, 4, 16, 16))
        ctx = jax.random.normal(jax.random.key(2), (1, 7, 32))
        params = model.init(jax.random.key(0), x, jnp.array(1.0), ctx)["params"]
        lora = init_lora_params(jax.random.key(3), params, LoRAConfig(rank=4))
        lora = jax.tree.map(
            lambda a: a + 0.01 * jax.random.normal(jax.random.key(4), a.shape), lora
        )

        def loss_fn(lora):
            merged = apply_lora(params, lora, LoRAConfig(rank=4))
            out = model.apply({"params": merged}, x, jnp.array(1.0), ctx)
            return jnp.mean(out**2)

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(lora)
        norms = [float(jnp.abs(g).max()) for g in jax.tree.leaves(grads)]
        assert max(norms) > 0.0

    def test_conv_factorization_matches_composition(self):
        # delta(x) through einsum == conv(conv(x, A), B) for 1x1 B.
        key = jax.random.key(0)
        a = jax.random.normal(key, (3, 3, 8, 4))
        b = jax.random.normal(jax.random.key(1), (1, 1, 4, 16))
        x = jax.random.normal(jax.random.key(2), (1, 10, 10, 8))
        from gmdx.models.lora import _delta

        delta_kernel = _delta(a, b)
        y1 = jax.lax.conv_general_dilated(
            x, delta_kernel, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        ha = jax.lax.conv_general_dilated(
            x, a, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        y2 = jax.lax.conv_general_dilated(
            ha, b, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        np.testing.assert_allclose(y1, y2, rtol=1e-4, atol=1e-4)


class TestSafetyChecker:
    def _init(self):
        from gmdx.models import StableDiffusionSafetyChecker, TINY_VISION_CONFIG

        checker = StableDiffusionSafetyChecker(TINY_VISION_CONFIG)
        params = checker.init(
            jax.random.key(0), jnp.zeros((1, 3, 32, 32))
        )["params"]
        return checker, params

    def test_forward_shapes(self):
        checker, params = self._init()
        flags = checker.apply({"params": params}, jnp.zeros((3, 3, 32, 32)))
        assert flags.shape == (3,) and flags.dtype == jnp.bool_

    def test_thresholds_control_flagging(self):
        checker, params = self._init()
        x = jax.random.normal(jax.random.key(1), (2, 3, 32, 32))
        # Cosine similarity is <= 1, so thresholds of 2 can never fire and
        # thresholds of -2 always fire.
        never = dict(params, concept_embeds_weights=jnp.full((4,), 2.0),
                     special_care_embeds_weights=jnp.full((2,), 2.0))
        always = dict(params, concept_embeds_weights=jnp.full((4,), -2.0))
        assert not np.any(checker.apply({"params": never}, x))
        assert np.all(checker.apply({"params": always}, x))

    def test_run_safety_checker_blackout(self):
        from gmdx.models import run_safety_checker

        checker, params = self._init()
        params = dict(params, concept_embeds_weights=jnp.full((4,), -2.0))
        imgs = jnp.ones((2, 16, 16, 3)) * 0.5
        out, flags = run_safety_checker(checker, params, imgs)
        assert np.all(flags)
        np.testing.assert_array_equal(np.asarray(out), 0.0)

    def test_preprocess_for_clip(self):
        from gmdx.models import preprocess_for_clip

        x = jnp.ones((1, 64, 48, 3)) * 0.5
        out = preprocess_for_clip(x, image_size=32)
        assert out.shape == (1, 3, 32, 32)
        # 0.5 gray maps to (0.5 - mean) / std per channel.
        from gmdx.models.safety_checker import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD

        expect = (0.5 - np.array(CLIP_IMAGE_MEAN)) / np.array(CLIP_IMAGE_STD)
        got = np.asarray(out)[0, :, 0, 0]
        np.testing.assert_allclose(got, expect, rtol=1e-5)

    def test_make_safety_checker_fn_pipeline_hook(self):
        from gmdx.models import make_safety_checker_fn

        checker, params = self._init()
        fn = make_safety_checker_fn(checker, params)
        imgs = np.random.default_rng(3).uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)
        out, flags = fn(imgs)
        assert out.shape == imgs.shape and flags.shape == (2,)
        assert isinstance(out, np.ndarray)
