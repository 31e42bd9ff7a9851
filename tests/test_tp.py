"""Tensor-parallel sharding (gmdx/dist/tp.py) on the spoofed CPU mesh.

The reference has no tensor parallelism (SURVEY.md §2.3 — DDP only); TP is
new TPU-native capability: Megatron-style PartitionSpecs over a ``model``
mesh axis, GSPMD placing the collectives. These tests pin (a) the spec
rules, (b) that a TP-sharded UNet forward is numerically the replicated
forward, over a 2-D data×model mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from gmdx.dist import make_mesh, tp_param_specs, tp_shard_params
from gmdx.dist.tp import tp_spec_for_path

M = "model"


class TestSpecRules:
    def test_attention_projections(self):
        # column-parallel qkv (out dim), row-parallel to_out (in dim)
        p = ("down_blocks_0", "attentions_0", "blocks_0", "attn1")
        assert tp_spec_for_path(p + ("to_q", "kernel"), (320, 320), 2) == \
            P(None, M)
        assert tp_spec_for_path(p + ("to_k", "kernel"), (768, 320), 2) == \
            P(None, M)
        assert tp_spec_for_path(p + ("to_out", "kernel"), (320, 320), 2) == \
            P(M, None)
        # row-parallel bias adds after the psum -> replicated
        assert tp_spec_for_path(p + ("to_out", "bias"), (320,), 2) == P()

    def test_geglu_ff(self):
        p = ("up_blocks_1", "attentions_2", "blocks_0", "ff")
        assert tp_spec_for_path(p + ("proj_in", "kernel"), (320, 2560), 2) \
            == P(None, M)
        assert tp_spec_for_path(p + ("proj_in", "bias"), (2560,), 2) == P(M)
        assert tp_spec_for_path(p + ("proj_out", "kernel"), (1280, 320), 2) \
            == P(M, None)

    def test_resnet_conv_pair(self):
        p = ("down_blocks_0", "resnets_0")
        assert tp_spec_for_path(
            p + ("conv1", "kernel"), (3, 3, 320, 320), 2
        ) == P(None, None, None, M)
        assert tp_spec_for_path(
            p + ("conv2", "kernel"), (3, 3, 320, 320), 2
        ) == P(None, None, M, None)
        assert tp_spec_for_path(
            p + ("time_emb_proj", "kernel"), (1280, 320), 2
        ) == P(None, M)

    def test_indivisible_dims_replicate(self):
        # final conv_out: 4 output channels at tp=8 -> replicated
        assert tp_spec_for_path(
            ("conv_out", "kernel"), (3, 3, 320, 4), 8
        ) == P()
        assert tp_spec_for_path(("conv1", "kernel"), (3, 3, 8, 6), 4) == P()

    def test_norms_and_embeddings_replicate(self):
        assert tp_spec_for_path(("norm1", "scale"), (320,), 2) == P()
        # 1x1 transformer proj convs (4-D) stay replicated
        assert tp_spec_for_path(
            ("attentions_0", "proj_in", "kernel"), (1, 1, 320, 320), 2
        ) == P()

    def test_optax_embedded_param_paths(self):
        """Adam mu/nu and EMA trees embed the param paths as suffixes —
        the same rules must shard them identically to their params."""
        p = ("0", "mu", "mid_block", "resnets_0", "conv1", "kernel")
        assert tp_spec_for_path(p, (3, 3, 64, 64), 2) == \
            P(None, None, None, M)

    def test_tree_api(self):
        tree = {
            "attn1": {"to_q": {"kernel": jnp.zeros((32, 32))}},
            "norm1": {"scale": jnp.zeros((32,))},
        }
        specs = tp_param_specs(tree, 2)
        assert specs["attn1"]["to_q"]["kernel"] == P(None, M)
        assert specs["norm1"]["scale"] == P()


@pytest.fixture(scope="module")
def tiny_unet():
    from gmdx.models import TINY_UNET_CONFIG, UNet2DConditionModel

    unet = UNet2DConditionModel(TINY_UNET_CONFIG)
    params = unet.init(
        jax.random.key(0),
        jnp.zeros((1, 4, 8, 8)),
        jnp.array(1.0),
        jnp.zeros((1, 77, 32)),
    )["params"]
    return unet, params


def test_unet_forward_tp_matches_replicated(tiny_unet):
    """DP×TP-sharded forward == single-device forward (GSPMD only moves
    layout, never math — this pins that the specs are consistent)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the conftest's 8-device CPU mesh")
    unet, params = tiny_unet

    x = jax.random.normal(jax.random.key(1), (4, 4, 8, 8), jnp.float32)
    t = jnp.array(7.0)
    ctx = jax.random.normal(jax.random.key(2), (4, 77, 32), jnp.float32)

    fwd = jax.jit(lambda p, a, b, c: unet.apply({"params": p}, a, b, c))
    ref = np.asarray(fwd(params, x, t, ctx))

    mesh = make_mesh(8, ("data", "model"), shape=(4, 2))
    sharded = tp_shard_params(mesh, params)
    # at least the qkv/to_out/ff/conv pairs must actually be split
    n_split = sum(
        1
        for s in jax.tree.leaves(
            tp_param_specs(params, 2), is_leaf=lambda x: isinstance(x, P)
        )
        if s != P()
    )
    assert n_split >= 20, f"only {n_split} leaves sharded"

    from gmdx.dist import shard_batch

    xb, ctxb = shard_batch(mesh, (x, ctx))
    out = np.asarray(fwd(sharded, xb, t, ctxb))
    np.testing.assert_allclose(out, ref, rtol=3e-5, atol=3e-5)


def test_unet_forward_spatial_sharding_matches_replicated(tiny_unet):
    """Latents sharded along H (spatial parallelism) — GSPMD inserts the
    conv halos / attention gathers; the result must be bit-compatible
    with the replicated forward."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the conftest's 8-device CPU mesh")
    from gmdx.dist import shard_batch_spatial

    unet, params = tiny_unet
    x = jax.random.normal(jax.random.key(3), (4, 4, 8, 8), jnp.float32)
    ctx = jax.random.normal(jax.random.key(4), (4, 77, 32), jnp.float32)
    fwd = jax.jit(lambda p, a, c: unet.apply({"params": p}, a, jnp.array(5.0), c))
    ref = np.asarray(fwd(params, x, ctx))

    mesh = make_mesh(8, ("data", "model"), shape=(4, 2))
    xb, ctxb = shard_batch_spatial(mesh, (x, ctx))
    out = np.asarray(fwd(params, xb, ctxb))
    np.testing.assert_allclose(out, ref, rtol=3e-5, atol=3e-5)


@pytest.mark.slow
def test_dual_pipeline_with_tp_params_matches_replicated():
    """The flagship dual-UNet sampling loop must produce the same latents
    with TP-sharded params (serving layout) as with replicated params."""
    import dataclasses

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    from gmdx.models import (
        AutoencoderKL,
        CLIPTextModel,
        CLIPTokenizer,
        TINY_CLIP_CONFIG,
        TINY_UNET_CONFIG,
        TINY_VAE_CONFIG,
        UNet2DConditionModel,
    )
    from gmdx.pipelines import StableDiffusionDualUNetPipeline
    from gmdx.schedulers import PNDMScheduler

    cfg8 = dataclasses.replace(TINY_UNET_CONFIG, in_channels=8)
    unet8 = UNet2DConditionModel(cfg8)
    unet4 = UNet2DConditionModel(TINY_UNET_CONFIG)
    vae = AutoencoderKL(TINY_VAE_CONFIG)
    text = CLIPTextModel(TINY_CLIP_CONFIG)
    tok = CLIPTokenizer.tiny()
    params = {
        "gm_unet": unet8.init(
            jax.random.key(0), jnp.zeros((1, 8, 4, 4)), jnp.array(1.0),
            jnp.zeros((1, 7, 32)),
        )["params"],
        "unet": unet4.init(
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
    pipe = StableDiffusionDualUNetPipeline(
        unet4, vae, text, tok, PNDMScheduler(), gm_unet=unet8
    )

    def run(p):
        sdr, gm = pipe(
            p, "a scene", key=jax.random.key(9), height=32, width=32,
            num_inference_steps=3, output_type="latent",
        )
        return np.asarray(sdr), np.asarray(gm)

    ref_sdr, ref_gm = run(params)
    mesh = make_mesh(2, ("data", "model"), shape=(1, 2))
    sdr, gm = run(tp_shard_params(mesh, params))
    np.testing.assert_allclose(sdr, ref_sdr, rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(gm, ref_gm, rtol=3e-5, atol=3e-5)


@pytest.mark.veryslow
def test_dual_pipeline_tp_at_1024_scale():
    """--tp_size 2 correctness at a scaled 1024^2-like shape: 128^2 latents
    (the real 1024^2 latent grid — 16k-token self-attention) with tiny
    channel widths, on the virtual mesh. BENCH_extra 5a's OOM note claims
    tp_size 2 is the single-chip batch-4 mitigation at 1024^2; this tests
    that claim's correctness half instead of asserting it (VERDICT r4 item
    2). veryslow: the 16k-token attention fallback is minutes of 1-core CPU.
    """
    import dataclasses

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    from gmdx.models import (
        TINY_UNET_CONFIG,
        UNet2DConditionModel,
    )
    from gmdx.pipelines import StableDiffusionDualUNetPipeline
    from gmdx.schedulers import PNDMScheduler

    cfg8 = dataclasses.replace(TINY_UNET_CONFIG, in_channels=8)
    unet8 = UNet2DConditionModel(cfg8)
    unet4 = UNet2DConditionModel(TINY_UNET_CONFIG)
    params = {
        "gm_unet": unet8.init(
            jax.random.key(0), jnp.zeros((1, 8, 8, 8)), jnp.array(1.0),
            jnp.zeros((1, 7, 32)),
        )["params"],
        "unet": unet4.init(
            jax.random.key(1), jnp.zeros((1, 4, 8, 8)), jnp.array(1.0),
            jnp.zeros((1, 7, 32)),
        )["params"],
    }
    pipe = StableDiffusionDualUNetPipeline(
        unet4, None, None, None, PNDMScheduler(), gm_unet=unet8
    )
    # 1024^2 pixels -> 128^2 latents; prompt embeds injected (no text stack)
    lat = jax.random.normal(jax.random.key(2), (1, 4, 128, 128))
    cond = jax.random.normal(jax.random.key(3), (1, 7, 32))
    neg = jax.random.normal(jax.random.key(4), (1, 7, 32))

    def run(p):
        sdr, gm = pipe.denoise_dual(
            p, cond, neg, lat, num_inference_steps=1
        )
        return np.asarray(sdr), np.asarray(gm)

    ref_sdr, ref_gm = run(params)
    mesh = make_mesh(2, ("data", "model"), shape=(1, 2))
    sdr, gm = run(tp_shard_params(mesh, params))
    np.testing.assert_allclose(sdr, ref_sdr, rtol=5e-5, atol=5e-5)
    np.testing.assert_allclose(gm, ref_gm, rtol=5e-5, atol=5e-5)


def test_sp_strategy_plumbing():
    """--shard_strategy sp: mesh shape, replicated state placement, and
    device_prefetch's batch+H placement of image leaves."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the conftest's 8-device CPU mesh")
    from flax import struct

    from gmdx.dist import (
        apply_shard_strategy, make_train_mesh, spatial_sharding,
    )
    from gmdx.data import device_prefetch

    mesh = make_train_mesh("sp", 2)
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "data": 4, "model": 2,
    }

    @struct.dataclass
    class S:
        params: dict
        opt_state: dict

    state = S(params={"w": np.ones((4, 4))}, opt_state={"m": np.zeros(3)})
    placed = apply_shard_strategy(
        mesh, state, "sp", param_fields=("params",), opt_fields=("opt_state",)
    )
    assert placed.params["w"].sharding.is_fully_replicated

    batch = {
        "sdr": np.zeros((4, 3, 8, 8), np.float32),
        "input_ids": np.zeros((4, 77), np.int32),
    }
    out = next(iter(device_prefetch(iter([batch]), mesh, spatial=True)))
    assert out["sdr"].sharding == spatial_sharding(mesh, 4)
    assert not out["input_ids"].sharding.spec or (
        out["input_ids"].sharding.spec[0] == "data"
    )


@pytest.mark.slow
def test_gm_pipeline_spatial_input_matches_replicated():
    """generate_hdr's --sp_size layout: params replicated on a (1, sp) mesh,
    the SDR input sharded along H — the sampled GM latents must match the
    unsharded run (GSPMD halos/gathers change nothing numerically)."""
    import dataclasses

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    from gmdx.dist import replicate, spatial_sharding
    from gmdx.models import (
        AutoencoderKL,
        CLIPTextModel,
        CLIPTokenizer,
        TINY_CLIP_CONFIG,
        TINY_UNET_CONFIG,
        TINY_VAE_CONFIG,
        UNet2DConditionModel,
    )
    from gmdx.pipelines import StableDiffusionGMPipeline
    from gmdx.schedulers import PNDMScheduler

    cfg8 = dataclasses.replace(TINY_UNET_CONFIG, in_channels=8)
    unet8 = UNet2DConditionModel(cfg8)
    vae = AutoencoderKL(TINY_VAE_CONFIG)
    text = CLIPTextModel(TINY_CLIP_CONFIG)
    tok = CLIPTokenizer.tiny()
    params = {
        "unet": unet8.init(
            jax.random.key(0), jnp.zeros((1, 8, 4, 4)), jnp.array(1.0),
            jnp.zeros((1, 7, 32)),
        )["params"],
        "vae": vae.init(
            jax.random.key(1), jnp.zeros((1, 3, 32, 32)), jax.random.key(2)
        )["params"],
        "text_encoder": text.init(
            jax.random.key(3), jnp.zeros((1, 77), jnp.int32)
        )["params"],
    }
    pipe = StableDiffusionGMPipeline(unet8, vae, text, tok, PNDMScheduler())
    sdr_in = jax.random.uniform(
        jax.random.key(5), (1, 3, 32, 32), jnp.float32
    ) * 2 - 1

    def run(p, x):
        lat = pipe.encode_sdr(p, x, jax.random.key(6))
        gm = pipe(
            p, lat, "a scene", key=jax.random.key(7),
            num_inference_steps=3, output_type="latent",
        )
        return np.asarray(gm)

    ref = run(params, sdr_in)
    mesh = make_mesh(2, ("data", "model"), shape=(1, 2))
    out = run(
        replicate(mesh, params),
        jax.device_put(sdr_in, spatial_sharding(mesh, 4)),
    )
    np.testing.assert_allclose(out, ref, rtol=3e-5, atol=3e-5)


class TestTPKernelContext:
    """tp_kernel_context routes attention_packed through a head-parallel
    shard_map over the model axis (gmdx/dist/tpctx.py) so the Pallas fast
    path composes with TP instead of silently reverting to XLA behind
    all-gathers (VERDICT round-2 item 5). On the CPU mesh the per-shard
    dispatch lands on the XLA fallback — the test pins the shard_map
    head-slicing math (TP=2 == TP=1), which is dispatch-independent."""

    def _qkv(self, key, b, sq, sk, c):
        kq, kk, kv = jax.random.split(jax.random.key(key), 3)
        return (
            jax.random.normal(kq, (b, sq, c), jnp.float32),
            jax.random.normal(kk, (b, sk, c), jnp.float32),
            jax.random.normal(kv, (b, sk, c), jnp.float32),
        )

    def test_self_attention_matches_no_tp(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs the conftest's 8-device CPU mesh")
        from gmdx.dist.tpctx import tp_kernel_context
        from gmdx.kernels.attention import attention_packed

        q, k, v = self._qkv(0, 4, 64, 64, 64)
        ref = np.asarray(attention_packed(q, k, v, heads=8))
        mesh = make_mesh(8, ("data", "model"), shape=(4, 2))
        with tp_kernel_context(mesh):
            got = np.asarray(attention_packed(q, k, v, heads=8))
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

    def test_cross_attention_matches_no_tp(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs the conftest's 8-device CPU mesh")
        from gmdx.dist.tpctx import tp_kernel_context
        from gmdx.kernels.attention import attention_packed

        q, k, v = self._qkv(1, 4, 64, 77, 64)
        ref = np.asarray(attention_packed(q, k, v, heads=8))
        mesh = make_mesh(8, ("data", "model"), shape=(4, 2))
        with tp_kernel_context(mesh):
            got = np.asarray(attention_packed(q, k, v, heads=8))
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

    def test_indivisible_heads_fall_back(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs the conftest's 8-device CPU mesh")
        from gmdx.dist.tpctx import tp_kernel_context
        from gmdx.kernels.attention import attention_packed

        q, k, v = self._qkv(2, 4, 32, 32, 63)  # 63 = 7 heads * 9: 7 % 2 != 0
        ref = np.asarray(attention_packed(q, k, v, heads=7))
        mesh = make_mesh(8, ("data", "model"), shape=(4, 2))
        with tp_kernel_context(mesh):
            got = np.asarray(attention_packed(q, k, v, heads=7))
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

    def test_unet_forward_under_kernel_context(self, tiny_unet):
        """Full TP-sharded UNet forward traced INSIDE the kernel context —
        shard_map islands inside the GSPMD-partitioned jit."""
        if len(jax.devices()) < 8:
            pytest.skip("needs the conftest's 8-device CPU mesh")
        from gmdx.dist import shard_batch
        from gmdx.dist.tpctx import tp_kernel_context

        unet, params = tiny_unet
        x = jax.random.normal(jax.random.key(9), (4, 4, 8, 8), jnp.float32)
        t = jnp.array(7.0)
        ctx = jax.random.normal(jax.random.key(10), (4, 77, 32), jnp.float32)
        fwd = jax.jit(lambda p, a, b, c: unet.apply({"params": p}, a, b, c))
        ref = np.asarray(fwd(params, x, t, ctx))

        mesh = make_mesh(8, ("data", "model"), shape=(4, 2))
        sharded = tp_shard_params(mesh, params)
        xb, ctxb = shard_batch(mesh, (x, ctx))
        fwd2 = jax.jit(lambda p, a, b, c: unet.apply({"params": p}, a, b, c))
        with tp_kernel_context(mesh):
            out = np.asarray(fwd2(sharded, xb, t, ctxb))
        np.testing.assert_allclose(out, ref, rtol=3e-5, atol=3e-5)

    def test_non_attention_kernels_disabled_under_tp(self):
        from gmdx.dist.tpctx import tp_kernel_context
        from gmdx.kernels.winograd import winograd_eligible

        if len(jax.devices()) < 2:
            pytest.skip("needs >= 2 devices for a model axis")
        shape, out_ch = (8, 64, 64, 64), 64
        baseline = winograd_eligible(shape, out_ch, 2)
        mesh = make_mesh(2, ("data", "model"), shape=(1, 2))
        with tp_kernel_context(mesh):
            assert winograd_eligible(shape, out_ch, 2) is False
        assert winograd_eligible(shape, out_ch, 2) == baseline
