"""Trainer-step parity vs the PyTorch reference (slow tier).

Stage 2: gmdx's production stage2_loss + make_optimizer against a verbatim
torch transcription of the reference hot loop (train_gm_unet.py:1141-1207),
same weights through the production converter, same injected inputs — loss,
whole-gradient vector, and post-AdamW params must match to fp32 precision,
with an fp64 torch oracle separating roundoff from divergence.

Stage 1: gmdx's production make_gen_step/make_disc_step against the
reference GAN step (train_vqgan_lora.py:1121-1220) assembled from the
reference's own ops + Discriminator + real peft LoRA — recon/perceptual/
adversarial parts, adaptive weight (double backward), hinge + R1 penalty,
and post-step trainables must match.
"""

import pytest

torch = pytest.importorskip("torch")

from gmdx.refbridge import reference_available  # noqa: E402

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not reference_available(), reason="/root/reference not mounted"
    ),
]


def test_stage2_train_step_parity():
    from gmdx.refbridge.train_parity import stage2_parity

    out = stage2_parity(0)
    assert len(out["steps"]) == 2
    for step in out["steps"]:
        assert step["loss_rel_err"] < 1e-4
        assert step["grad_flat_psnr_db"] > 80.0
        assert step["param_flat_psnr_db"] > 80.0
        # every tensor at most 60 dB below torch's own fp32 accuracy
        # vs the fp64 oracle (near-zero pre-norm bias grads are pure
        # cancellation noise on BOTH sides; their deficits are noise too)
        assert step["grad_vs_fp64_worst_deficit_db"] > -60.0


def test_stage2_train_step_parity_noise_offset_perturbation():
    from gmdx.refbridge.train_parity import stage2_parity

    out = stage2_parity(
        5, noise_offset=0.05, input_perturbation=0.1, fp64_oracle=False
    )
    for step in out["steps"]:
        assert step["loss_rel_err"] < 1e-4
        assert step["grad_flat_psnr_db"] > 80.0
        assert step["param_flat_psnr_db"] > 80.0


def test_stage2_train_step_parity_grad_accum():
    """ga=2: gmdx's optax.MultiSteps accumulation vs the accelerate
    accumulate() transcription (zero_grad at window start, (loss/ga)
    backward per micro-batch, clip + AdamW step only at sync —
    train_gm_unet.py:1202-1219). Four micro-batches = two optimizer
    updates; params must be frozen inside each window and the sync-step
    window-mean gradient and post-update params must match the reference
    (VERDICT r4 missing #1)."""
    import numpy as np

    from gmdx.refbridge.train_parity import stage2_parity

    out = stage2_parity(0, grad_accum=2, num_steps=4, fp64_oracle=False)
    syncs = [s["is_sync"] for s in out["steps"]]
    assert syncs == [False, True, False, True]
    for step in out["steps"]:
        assert step["loss_rel_err"] < 1e-4
        # params identical between sides at EVERY micro-step: frozen
        # inside a window, matching after each sync update
        assert step["param_flat_psnr_db"] > 80.0
        if step["is_sync"]:
            assert step["grad_flat_psnr_db"] > 80.0
            assert np.isclose(
                step["grad_norm_ref"], step["grad_norm_gmdx"], rtol=1e-3
            )


def test_stage1_gan_step_parity():
    from gmdx.refbridge.stage1_oracle import stage1_parity

    out = stage1_parity(0, num_steps=4)
    kinds = [s["kind"] for s in out["steps"]]
    assert kinds == ["gen", "disc", "gen", "disc"]
    for step in out["steps"]:
        assert step["loss_rel_err"] < 1e-4
        assert step["grad_norm_rel_err"] < 1e-3
        if step["kind"] == "gen":
            # the double-backward grad-norm-ratio weight (reference
            # :1165-1174) is the most fragile scalar in the loss
            assert step["adaptive_weight_rel_err"] < 1e-3
            assert step["trainables_flat_psnr_db"] > 80.0
        else:
            assert step["hinge_rel_err"] < 1e-4
            assert step["gp_rel_err"] < 1e-4  # grad-of-grad R1 penalty
            assert step["disc_params_flat_psnr_db"] > 70.0


def test_stage1_gan_step_parity_grad_accum():
    """ga=2: gmdx's optax.MultiSteps accumulation vs the accelerate
    accumulate() transcription (zero_grad at window start, (loss/ga)
    backward per micro-batch, clip + step at window end —
    train_vqgan_lora.py:1150,1199). Cadence (i//2)%2 gives one gen window
    then one disc window over 4 batches; micro-step records must show
    frozen params inside a window and matching post-sync updates."""
    from gmdx.refbridge.stage1_oracle import stage1_parity

    out = stage1_parity(0, num_steps=4, grad_accum=2)
    kinds = [s["kind"] for s in out["steps"]]
    assert kinds == ["gen", "gen", "disc", "disc"]
    for step in out["steps"]:
        assert step["loss_rel_err"] < 1e-4
        if step["kind"] == "gen":
            assert step["adaptive_weight_rel_err"] < 1e-3
            assert step["trainables_flat_psnr_db"] > 80.0
        else:
            assert step["hinge_rel_err"] < 1e-4
            assert step["gp_rel_err"] < 1e-4
            assert step["disc_params_flat_psnr_db"] > 70.0
