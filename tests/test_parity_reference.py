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
