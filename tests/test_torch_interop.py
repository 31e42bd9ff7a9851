"""Torch checkpoint interop tests.

Round trip: gmdx init params -> diffusers/transformers state-dict layout ->
back to gmdx. Exact equality catches key-space mistakes; explicit layout
checks (torch OIHW conv / (out,in) linear) catch transposition errors that a
pure round trip would let cancel.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gmdx.io.torch_import import (
    convert_clip_text_state_dict,
    convert_unet_state_dict,
    convert_vae_state_dict,
    export_clip_text_state_dict,
    export_unet_state_dict,
    export_vae_state_dict,
)
from gmdx.models import (
    AutoencoderKL,
    CLIPTextModel,
    TINY_CLIP_CONFIG,
    TINY_UNET_CONFIG,
    TINY_VAE_CONFIG,
    UNet2DConditionModel,
)


def assert_trees_equal(a, b):
    fa = jax.tree_util.tree_flatten_with_path(a)
    fb = jax.tree_util.tree_flatten_with_path(b)
    paths_a = {jax.tree_util.keystr(p) for p, _ in fa[0]}
    paths_b = {jax.tree_util.keystr(p) for p, _ in fb[0]}
    assert paths_a == paths_b, (
        f"missing: {sorted(paths_a - paths_b)[:5]} "
        f"extra: {sorted(paths_b - paths_a)[:5]}"
    )
    for (pa, va), (_, vb) in zip(fa[0], fb[0]):
        np.testing.assert_array_equal(
            np.asarray(va), np.asarray(vb), err_msg=jax.tree_util.keystr(pa)
        )


class TestUNetInterop:
    def test_round_trip(self):
        model = UNet2DConditionModel(TINY_UNET_CONFIG)
        params = model.init(
            jax.random.key(0), jnp.zeros((1, 4, 16, 16)), jnp.array(1.0),
            jnp.zeros((1, 7, 32)),
        )["params"]
        sd = export_unet_state_dict(params)
        # torch layout sanity: conv_in (out, in, kh, kw).
        assert sd["conv_in.weight"].shape == (32, 4, 3, 3)
        # linear (out, in) for time embedding (inner = 4 * ch0 = 128).
        assert sd["time_embedding.linear_1.weight"].shape == (128, 32)
        # attention projections exist with diffusers naming.
        assert "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight" in sd
        assert "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_out.0.weight" in sd
        assert "mid_block.attentions.0.transformer_blocks.0.ff.net.0.proj.weight" in sd
        back = convert_unet_state_dict(sd)
        assert_trees_equal(params, back)

    def test_round_trip_8ch(self):
        cfg = dataclasses.replace(TINY_UNET_CONFIG, in_channels=8)
        model = UNet2DConditionModel(cfg)
        params = model.init(
            jax.random.key(0), jnp.zeros((1, 8, 16, 16)), jnp.array(1.0),
            jnp.zeros((1, 7, 32)),
        )["params"]
        back = convert_unet_state_dict(export_unet_state_dict(params))
        assert_trees_equal(params, back)

    def test_conv_layout_direction(self):
        """A conv kernel whose HWIO entries are distinguishable must land in
        torch OIHW order."""
        k = np.arange(3 * 3 * 2 * 5, dtype=np.float32).reshape(3, 3, 2, 5)
        params = {"conv_in": {"kernel": k, "bias": np.zeros(5, np.float32)}}
        sd = export_unet_state_dict(params)
        w = sd["conv_in.weight"]
        assert w.shape == (5, 2, 3, 3)
        np.testing.assert_array_equal(w[4, 1], k[:, :, 1, 4])


class TestVAEInterop:
    def test_round_trip(self):
        model = AutoencoderKL(TINY_VAE_CONFIG)
        params = model.init(
            jax.random.key(0), jnp.zeros((1, 3, 32, 32)), jax.random.key(1)
        )["params"]
        sd = export_vae_state_dict(params)
        assert "encoder.mid_block.attentions.0.to_q.weight" in sd
        assert "decoder.up_blocks.0.upsamplers.0.conv.weight" in sd
        assert "quant_conv.weight" in sd
        back = convert_vae_state_dict(sd)
        assert_trees_equal(params, back)

    def test_legacy_attention_names(self):
        """Old LDM checkpoints name VAE attention query/key/value/proj_attn
        and store them as 1x1 convs; both must map."""
        model = AutoencoderKL(TINY_VAE_CONFIG)
        params = model.init(
            jax.random.key(0), jnp.zeros((1, 3, 32, 32)), jax.random.key(1)
        )["params"]
        sd = export_vae_state_dict(params)
        legacy = {}
        for k, v in sd.items():
            k2 = (
                k.replace(".to_q.", ".query.")
                .replace(".to_k.", ".key.")
                .replace(".to_v.", ".value.")
                .replace(".to_out.0.", ".proj_attn.")
            )
            if k2 != k and k2.endswith(".weight"):
                v = v[:, :, None, None]  # torch (out, in) -> (out, in, 1, 1)
            legacy[k2] = v
        back = convert_vae_state_dict(legacy)
        assert_trees_equal(params, back)


class TestCLIPInterop:
    def test_round_trip(self):
        model = CLIPTextModel(TINY_CLIP_CONFIG)
        params = model.init(
            jax.random.key(0), jnp.zeros((1, 7), jnp.int32)
        )["params"]
        sd = export_clip_text_state_dict(params)
        assert "text_model.embeddings.token_embedding.weight" in sd
        assert "text_model.encoder.layers.0.self_attn.q_proj.weight" in sd
        sd["text_model.embeddings.position_ids"] = np.arange(77)[None]
        back = convert_clip_text_state_dict(sd)
        assert_trees_equal(params, back)

    def test_forward_after_round_trip(self):
        """Converted params must produce identical model output."""
        model = CLIPTextModel(TINY_CLIP_CONFIG)
        ids = jnp.array([[1, 5, 9, 2, 0, 0, 0]], jnp.int32)
        params = model.init(jax.random.key(0), ids)["params"]
        back = convert_clip_text_state_dict(export_clip_text_state_dict(params))
        a = model.apply({"params": params}, ids)
        b = model.apply({"params": jax.tree.map(jnp.asarray, back)}, ids)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
