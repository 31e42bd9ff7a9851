"""End-to-end PSNR parity vs the reference pipeline classes (slow tier).

Runs the unmodified PyTorch reference pipelines from /root/reference under
gmdx.refbridge (diffusers shim + torch models/schedulers) against gmdx with
converted weights and identical injected latents/embeddings. The full
recorded table (50-75 step configs) lives in docs/PARITY_RESULTS.md via
scripts/tools/parity_vs_reference.py; this test keeps a 10-step version in
CI. Threshold 60 dB — far above the 40 dB driver gate, just under fp32
accumulation reality (observed ~112 dB).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from gmdx.refbridge import parity, reference_available  # noqa: E402

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not reference_available(), reason="/root/reference not mounted"
    ),
]

STEPS = 10
THRESHOLD_DB = 60.0


@pytest.fixture(scope="module")
def stack_params_inputs():
    stack = parity.make_torch_stack(0)
    params = parity.gmdx_params_from_torch(stack)
    inputs = parity.make_inputs(42)
    return stack, params, inputs


@pytest.mark.parametrize("scheduler", ["pndm", "ddim", "dpm"])
def test_gm_pipeline_parity(stack_params_inputs, scheduler):
    stack, params, inputs = stack_params_inputs
    ref_lat, ref_img = parity.run_reference_gm(
        stack, inputs, num_inference_steps=STEPS, scheduler=scheduler
    )
    got_lat, got_img = parity.run_gmdx_gm(
        params, inputs, num_inference_steps=STEPS, scheduler=scheduler
    )
    assert parity.psnr(ref_lat, got_lat) > THRESHOLD_DB
    assert parity.psnr(ref_img, got_img, peak=1.0) > THRESHOLD_DB


@pytest.mark.parametrize("scheduler", ["pndm", "dpm"])
def test_dual_pipeline_parity(stack_params_inputs, scheduler):
    stack, params, inputs = stack_params_inputs
    ref_sdr, ref_gm = parity.run_reference_dual(
        stack, inputs, num_inference_steps=STEPS, scheduler=scheduler
    )
    got_sdr, got_gm = parity.run_gmdx_dual(
        params, inputs, num_inference_steps=STEPS, scheduler=scheduler
    )
    assert parity.psnr(ref_sdr, got_sdr) > THRESHOLD_DB
    assert parity.psnr(ref_gm, got_gm) > THRESHOLD_DB


def test_hdr_chain_parity(stack_params_inputs, tmp_path):
    """The generate_hdr export chain (decode -> Eq.(1) qmax=99 -> Radiance
    .hdr write -> read-back) through both stacks: keeps the harness's
    .hdr-vs-reference compare path (parity_vs_reference.py:41-97) from
    bit-rotting. The file-level bound is RGBE quantization (~59 dB at
    recorded scale); assert the 40 dB driver gate with margin."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "parity_vs_reference",
        os.path.join(
            os.path.dirname(__file__), os.pardir, "scripts", "tools",
            "parity_vs_reference.py",
        ),
    )
    harness = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(harness)

    stack, params, inputs = stack_params_inputs
    rng = np.random.default_rng(7)
    shape = inputs["sdr_latent"].shape
    sdr_lat = rng.standard_normal(shape).astype(np.float32) * 0.18215
    gm_lat = rng.standard_normal(shape).astype(np.float32) * 0.18215

    ref_path = str(tmp_path / "ref.hdr")
    got_path = str(tmp_path / "gmdx.hdr")
    ref_hdr = harness.reference_hdr_chain(stack, sdr_lat, gm_lat, ref_path)
    got_hdr = harness.gmdx_hdr_chain(params, sdr_lat, gm_lat, got_path)

    peak = float(max(ref_hdr.max(), 1e-6))
    assert parity.psnr(ref_hdr, got_hdr, peak=peak) > THRESHOLD_DB
    assert (
        parity.psnr(
            harness.read_hdr_file(ref_path),
            harness.read_hdr_file(got_path),
            peak=peak,
        )
        > 40.0
    )


def test_torch_models_accept_exported_state_dict(stack_params_inputs):
    """strict load of gmdx-exported weights into the diffusers-named torch
    modules: proves the export key space at this architecture."""
    from gmdx.io.torch_import import (
        export_unet_state_dict,
        export_vae_state_dict,
    )

    stack, params, _ = stack_params_inputs
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_unet_state_dict(params["unet"]).items()}
    stack["gm_unet"].load_state_dict(sd, strict=True)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_vae_state_dict(params["vae"]).items()}
    stack["vae"].load_state_dict(sd, strict=True)


@pytest.mark.veryslow
def test_sd15_full_config_single_step_parity():
    """Full pinned SD-1.5 config (random weights), ONE GM-loop step vs the
    reference pipeline class (VERDICT.md round-2 item 1's regression hook;
    the 10-step recorded rows live in docs/PARITY_RESULTS.md via
    parity_vs_reference.py --config sd15). ~20-40 min of single-core CPU:
    kept out of the default slow tier behind the veryslow marker."""
    stack = parity.make_torch_stack(0, scale="sd15")
    params = parity.gmdx_params_from_torch(stack)
    inputs = parity.make_inputs(42, scale="sd15")
    ref_lat, _ = parity.run_reference_gm(
        stack, inputs, num_inference_steps=1, scheduler="pndm",
        with_image=False,
    )
    got_lat, _ = parity.run_gmdx_gm(
        params, inputs, num_inference_steps=1, scheduler="pndm",
        scale="sd15", with_image=False,
    )
    assert parity.psnr(ref_lat, got_lat) > THRESHOLD_DB
