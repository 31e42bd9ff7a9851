"""Torch checkpoint interop tests.

Round trip: gmdx init params -> diffusers/transformers state-dict layout ->
back to gmdx. Exact equality catches key-space mistakes; explicit layout
checks (torch OIHW conv / (out,in) linear) catch transposition errors that a
pure round trip would let cancel.
"""

import dataclasses

import pytest

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

pytestmark = pytest.mark.slow  # excluded from the quick tier (pytest.ini)


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


class TestConverterCLI:
    """scripts/tools/convert_torch_checkpoint.py: gmdx dir -> diffusers
    layout -> gmdx dir round-trips every component's params exactly."""

    def _load_cli(self):
        import importlib.util
        import os

        path = os.path.join(
            os.path.dirname(__file__), "..", "scripts", "tools",
            "convert_torch_checkpoint.py",
        )
        spec = importlib.util.spec_from_file_location("convert_cli", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_export_import_round_trip(self, tmp_path):
        from gmdx.io.pipeline import save_pipeline
        from gmdx.io.params import load_params
        from gmdx.schedulers import PNDMScheduler

        cli = self._load_cli()
        unet = UNet2DConditionModel(TINY_UNET_CONFIG)
        uparams = unet.init(
            jax.random.key(0), jnp.zeros((1, 4, 16, 16)), jnp.array(1.0),
            jnp.zeros((1, 7, 32)),
        )["params"]
        vae = AutoencoderKL(TINY_VAE_CONFIG)
        vparams = vae.init(
            jax.random.key(1), jnp.zeros((1, 3, 32, 32)), jax.random.key(2)
        )["params"]
        text = CLIPTextModel(TINY_CLIP_CONFIG)
        tparams = text.init(
            jax.random.key(3), jnp.zeros((1, 7), jnp.int32)
        )["params"]

        src = str(tmp_path / "gmdx_pipe")
        save_pipeline(
            src,
            components={
                "unet": (unet, uparams),
                "vae": (vae, vparams),
                "text_encoder": (text, tparams),
            },
            scheduler=PNDMScheduler(),
        )
        torch_dir = str(tmp_path / "diffusers")
        cli.do_export(src, torch_dir)
        back_dir = str(tmp_path / "gmdx_back")
        cli.do_import(torch_dir, back_dir)

        for name, orig in (
            ("unet", uparams), ("vae", vparams), ("text_encoder", tparams)
        ):
            got = load_params(f"{back_dir}/{name}/params.safetensors")
            assert_trees_equal(orig, got)

        # Configs must round-trip too (not be assumed SD-1.5-sized): the
        # re-imported pipeline must LOAD and RUN at the tiny shapes.
        from gmdx.io.pipeline import load_pipeline
        from gmdx.schedulers import PNDMScheduler as _PNDM

        bundle = load_pipeline(back_dir)
        assert isinstance(bundle["scheduler"], _PNDM)
        m, p = bundle["modules"]["unet"], bundle["params"]["unet"]
        assert m.config == TINY_UNET_CONFIG
        out = m.apply(
            {"params": p}, jnp.zeros((1, 4, 16, 16)), jnp.array(1.0),
            jnp.zeros((1, 7, 32)),
        )
        assert out.shape == (1, 4, 16, 16)
        assert bundle["modules"]["vae"].config == TINY_VAE_CONFIG
        assert bundle["modules"]["text_encoder"].config == TINY_CLIP_CONFIG


class TestSafetyCheckerInterop:
    def _hf_tiny(self):
        from transformers import CLIPVisionConfig as HFCfg
        from transformers import CLIPVisionModel as HFVision

        hf_cfg = HFCfg(
            image_size=32, patch_size=8, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64, projection_dim=16,
            hidden_act="quick_gelu",
        )
        import torch

        torch.manual_seed(0)
        return HFVision(hf_cfg)

    def _checker_sd(self, hf_vision):
        """Assemble a diffusers-layout safety-checker state dict around the
        HF vision tower (the checker nests it as ``vision_model.``)."""
        import torch

        torch.manual_seed(1)
        sd = {
            f"vision_model.{k}": v.numpy()
            for k, v in hf_vision.state_dict().items()
        }
        sd["visual_projection.weight"] = torch.randn(16, 32).numpy()
        sd["concept_embeds"] = torch.randn(4, 16).numpy()
        sd["special_care_embeds"] = torch.randn(2, 16).numpy()
        sd["concept_embeds_weights"] = torch.rand(4).numpy()
        sd["special_care_embeds_weights"] = torch.rand(2).numpy()
        return sd

    def test_round_trip(self):
        from gmdx.io.torch_import import (
            convert_safety_checker_state_dict,
            export_safety_checker_state_dict,
        )

        sd = self._checker_sd(self._hf_tiny())
        tree = convert_safety_checker_state_dict(sd)
        back = export_safety_checker_state_dict(tree)
        missing = set(sd) - set(back) - {"vision_model.vision_model.embeddings.position_ids"}
        assert not missing, sorted(missing)[:5]
        for k in back:
            np.testing.assert_array_equal(back[k], sd[k], err_msg=k)

    def test_vision_tower_matches_transformers(self):
        import torch

        from gmdx.io.torch_import import convert_safety_checker_state_dict
        from gmdx.models import (
            StableDiffusionSafetyChecker,
            TINY_VISION_CONFIG,
        )

        hf = self._hf_tiny().eval()
        sd = self._checker_sd(hf)
        tree = convert_safety_checker_state_dict(sd)

        x = np.random.default_rng(2).normal(size=(2, 3, 32, 32)).astype(np.float32)
        with torch.no_grad():
            pooled_t = hf(torch.tensor(x)).pooler_output.numpy()
            emb_t = pooled_t @ sd["visual_projection.weight"].T

            def cos(a, b):
                a = a / np.linalg.norm(a, axis=-1, keepdims=True)
                b = b / np.linalg.norm(b, axis=-1, keepdims=True)
                return a @ b.T

            special = cos(emb_t, sd["special_care_embeds"]) - sd[
                "special_care_embeds_weights"
            ]
            adj = np.where(np.any(special > 0, axis=-1), 0.01, 0.0)
            concept = (
                cos(emb_t, sd["concept_embeds"])
                - sd["concept_embeds_weights"]
                + adj[:, None]
            )
            nsfw_t = np.any(concept > 0, axis=-1)

        checker = StableDiffusionSafetyChecker(TINY_VISION_CONFIG)
        nsfw_j = np.asarray(checker.apply({"params": tree}, jnp.asarray(x)))
        np.testing.assert_array_equal(nsfw_j, nsfw_t)

        # And the pooled tower output itself (via the vision submodule).
        from gmdx.models import CLIPVisionModel

        pooled_j = CLIPVisionModel(TINY_VISION_CONFIG).apply(
            {"params": tree["vision_model"]}, jnp.asarray(x)
        )
        np.testing.assert_allclose(
            np.asarray(pooled_j), pooled_t, rtol=2e-4, atol=2e-5
        )


class TestCLIPTextNumericalParity:
    def test_matches_transformers(self):
        """gmdx CLIPTextModel == transformers CLIPTextModel on the same
        weights (the library the reference encodes prompts with)."""
        import torch
        from transformers import CLIPTextConfig as HFCfg
        from transformers import CLIPTextModel as HFText

        hf_cfg = HFCfg(
            vocab_size=1000, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
            max_position_embeddings=77, hidden_act="quick_gelu",
        )
        torch.manual_seed(0)
        hf = HFText(hf_cfg).eval()
        tree = convert_clip_text_state_dict(
            {k: v.numpy() for k, v in hf.state_dict().items()}
        )
        ids = np.random.default_rng(0).integers(0, 1000, (2, 77))
        with torch.no_grad():
            want = hf(torch.tensor(ids)).last_hidden_state.numpy()
        got = CLIPTextModel(TINY_CLIP_CONFIG).apply(
            {"params": tree}, jnp.asarray(ids, jnp.int32)
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)

def test_find_safetensors_prefers_full_precision(tmp_path):
    import importlib.util
    import os

    path = os.path.join(
        os.path.dirname(__file__), "..", "scripts", "tools",
        "convert_torch_checkpoint.py",
    )
    spec = importlib.util.spec_from_file_location("convert_cli2", path)
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)
    d = tmp_path / "unet"
    d.mkdir()
    for n in (
        "diffusion_pytorch_model.fp16.safetensors",
        "diffusion_pytorch_model.safetensors",
    ):
        (d / n).write_bytes(b"")
    assert cli._find_safetensors(str(d)).endswith(
        "diffusion_pytorch_model.safetensors"
    )


class TestVGG19Interop:
    """torchvision/timm VGG19 features -> gmdx VGG19Features converter."""

    def _torch_vgg_features(self):
        import torch
        from torch import nn

        from gmdx.models.vgg import VGG19_LAYOUT

        layers, in_ch = [], 3
        for spec in VGG19_LAYOUT:
            if spec == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers.append(nn.Conv2d(in_ch, spec, 3, padding=1))
                layers.append(nn.ReLU(inplace=False))
                in_ch = spec
        torch.manual_seed(5)
        return nn.Sequential(*layers)

    def test_convert_and_forward_parity(self):
        import torch

        from gmdx.io.torch_import import (
            convert_vgg19_state_dict,
            export_vgg19_state_dict,
        )
        from gmdx.models.vgg import IMAGENET_MEAN, IMAGENET_STD, VGG19Features

        feats = self._torch_vgg_features()
        sd = {f"features.{k}": v.detach().numpy()
              for k, v in feats.state_dict().items()}
        # full ImageNet checkpoints also carry the classifier head — skipped
        sd["classifier.0.weight"] = np.zeros((1, 1), np.float32)
        params = convert_vgg19_state_dict(sd)

        x01 = np.random.default_rng(0).random((1, 3, 64, 64)).astype(np.float32)
        xt = torch.from_numpy(
            (x01 - IMAGENET_MEAN[None, :, None, None])
            / IMAGENET_STD[None, :, None, None]
        )
        ref_stages = []
        h = xt
        with torch.no_grad():
            for layer in feats:
                if isinstance(layer, torch.nn.MaxPool2d):
                    ref_stages.append(h.permute(0, 2, 3, 1).numpy())
                h = layer(h)

        vgg = VGG19Features()
        got = vgg.apply(
            {"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x01)
        )
        assert len(got) == len(ref_stages) == 5
        for i, (a, b) in enumerate(zip(ref_stages, got)):
            np.testing.assert_allclose(
                a, np.asarray(b), atol=5e-4, rtol=1e-4,
                err_msg=f"stage {i}",
            )

    def test_round_trip_and_missing_layer_raises(self):
        from gmdx.io.torch_import import (
            convert_vgg19_state_dict,
            export_vgg19_state_dict,
        )

        feats = self._torch_vgg_features()
        sd = {f"features.{k}": v.detach().numpy()
              for k, v in feats.state_dict().items()}
        params = convert_vgg19_state_dict(sd)
        back = export_vgg19_state_dict(params)
        assert set(back) == set(sd)
        for k in sd:
            np.testing.assert_array_equal(back[k], sd[k])
        sd2 = dict(sd)
        del sd2["features.34.weight"], sd2["features.34.bias"]
        with pytest.raises(KeyError, match="missing conv"):
            convert_vgg19_state_dict(sd2)
