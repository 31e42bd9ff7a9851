"""gmdx exports emit exactly the SD-1.5 checkpoint key+shape space.

tests/goldens/sd15_manifest.json is generated independently of the export
code (scripts/tools/gen_sd15_manifest.py: refbridge torch modules on the
meta device + transformers' real CLIP classes). This test round-trips gmdx's
SD-1.5-config param *shapes* (jax.eval_shape — no init compute) through the
export functions and diffs the resulting key->shape dict against the
manifest, so a converter naming/layout gap surfaces in CI instead of at
first real-weight load (VERDICT.md round-1 item 5; reference load path
scripts/inference/generate_hdr.py:115-164).
"""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gmdx.io.torch_import import (
    export_clip_text_state_dict,
    export_safety_checker_state_dict,
    export_unet_state_dict,
    export_vae_state_dict,
)

MANIFEST = os.path.join(
    os.path.dirname(__file__), "goldens", "sd15_manifest.json"
)

# ~1 min of SD-1.5-scale eval_shape tracing — keep the quick tier <5 min.
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def manifest():
    with open(MANIFEST) as f:
        return json.load(f)


def _shape_tree_to_zeros(tree):
    """ShapeDtypeStruct tree -> broadcast-zero numpy views (no allocation:
    859M params of real zeros would be 3.4 GB; the export transposes are
    views and only reshape-copies touch memory)."""
    return jax.tree.map(
        lambda s: np.broadcast_to(np.float32(0.0), s.shape), tree
    )


def _exported_shapes(export_fn, params):
    return {k: list(v.shape) for k, v in export_fn(params).items()}


def _assert_same(got: dict, want: dict, component: str):
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing and not extra, (
        f"{component}: missing {missing[:8]} extra {extra[:8]} "
        f"({len(missing)} missing / {len(extra)} extra of {len(want)})"
    )
    bad = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not bad, f"{component} shape mismatches: {dict(list(bad.items())[:5])}"


def test_unet_sd15_key_space(manifest):
    from gmdx.models import SD15_UNET_CONFIG, UNet2DConditionModel

    unet = UNet2DConditionModel(SD15_UNET_CONFIG)
    shapes = jax.eval_shape(
        unet.init,
        jax.random.key(0),
        jnp.zeros((1, 4, 8, 8)),
        jnp.array(1.0),
        jnp.zeros((1, 77, 768)),
    )["params"]
    got = _exported_shapes(export_unet_state_dict, _shape_tree_to_zeros(shapes))
    _assert_same(got, manifest["unet"], "unet")


def test_gm_unet_8ch_differs_only_in_conv_in(manifest):
    from gmdx.models import SD15_GM_UNET_CONFIG, UNet2DConditionModel

    unet = UNet2DConditionModel(SD15_GM_UNET_CONFIG)
    shapes = jax.eval_shape(
        unet.init,
        jax.random.key(0),
        jnp.zeros((1, 8, 8, 8)),
        jnp.array(1.0),
        jnp.zeros((1, 77, 768)),
    )["params"]
    got = _exported_shapes(export_unet_state_dict, _shape_tree_to_zeros(shapes))
    want = dict(manifest["unet"])
    want["conv_in.weight"] = [320, 8, 3, 3]
    _assert_same(got, want, "gm_unet")


def test_vae_sd15_key_space(manifest):
    from gmdx.models import AutoencoderKL, SD15_VAE_CONFIG

    vae = AutoencoderKL(SD15_VAE_CONFIG)
    shapes = jax.eval_shape(
        vae.init,
        jax.random.key(0),
        jnp.zeros((1, 3, 64, 64)),
        jax.random.key(1),
    )["params"]
    got = _exported_shapes(export_vae_state_dict, _shape_tree_to_zeros(shapes))
    _assert_same(got, manifest["vae"], "vae")


def test_clip_text_sd15_key_space(manifest):
    from gmdx.models import CLIPTextModel
    from gmdx.models.clip_text import CLIP_VIT_L_CONFIG

    text = CLIPTextModel(CLIP_VIT_L_CONFIG)
    shapes = jax.eval_shape(
        text.init, jax.random.key(0), jnp.zeros((1, 77), jnp.int32)
    )["params"]
    got = _exported_shapes(
        export_clip_text_state_dict, _shape_tree_to_zeros(shapes)
    )
    want = dict(manifest["text_encoder"])
    # transformers versions differ on materializing the position_ids buffer;
    # gmdx neither imports nor exports it (torch_import.py skips it).
    want.pop("text_model.embeddings.position_ids", None)
    _assert_same(got, want, "text_encoder")


def test_safety_checker_sd15_key_space(manifest):
    from gmdx.models.safety_checker import (
        CLIP_VIT_L_VISION_CONFIG,
        StableDiffusionSafetyChecker,
    )

    sc = StableDiffusionSafetyChecker(CLIP_VIT_L_VISION_CONFIG)
    shapes = jax.eval_shape(
        sc.init, jax.random.key(0), jnp.zeros((1, 3, 224, 224))
    )["params"]
    got = _exported_shapes(
        export_safety_checker_state_dict, _shape_tree_to_zeros(shapes)
    )
    want = dict(manifest["safety_checker"])
    want.pop("vision_model.vision_model.embeddings.position_ids", None)
    _assert_same(got, want, "safety_checker")
