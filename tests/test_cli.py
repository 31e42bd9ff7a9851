"""End-to-end CLI smoke tests: init a tiny pipeline, train both stages for a
few steps, run Stage-3 inference, and validate every artifact — the full
reference workflow (README.md:82-130) in miniature.

Each CLI runs in a subprocess (proving the argparse surface + imports work
from a cold start) pinned to CPU before the script imports jax internals.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow  # excluded from the quick tier (pytest.ini)


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_script(script, argv, timeout=900):
    """Run a repo script in a CPU-pinned subprocess."""
    script_dir = os.path.dirname(os.path.join(REPO, script))
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "import sys, runpy; "
        f"sys.path.insert(0, {script_dir!r}); "
        f"sys.argv = [{script!r}] + {argv!r}; "
        f"runpy.run_path({os.path.join(REPO, script)!r}, run_name='__main__')"
    )
    return subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO,
    )


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    # Tiny pipeline (dual: unet + gm_unet + vae + text + tokenizer + pndm).
    r = run_script(
        "scripts/tools/init_pipeline.py",
        ["--output_dir", str(root / "pipe"), "--size", "tiny", "--dual"],
    )
    assert r.returncode == 0, r.stderr[-3000:]

    # Synthetic SDR/GM parquet dataset (64x64). 32 pairs: the subprocess
    # inherits the 8-device virtual CPU mesh, so the global batch is
    # train_batch_size x 8.
    rng = np.random.default_rng(0)
    sdr_paths, gm_bytes, texts = [], [], []
    data_dir = root / "data"
    data_dir.mkdir()
    import io as _io

    for i in range(32):
        sdr = Image.fromarray(
            rng.integers(0, 255, (64, 64, 3), dtype=np.uint8), "RGB"
        )
        p = str(data_dir / f"sdr_{i}.png")
        sdr.save(p)
        gm = Image.fromarray(
            rng.integers(0, 255, (64, 64, 3), dtype=np.uint8), "RGB"
        )
        buf = _io.BytesIO()
        gm.save(buf, format="PNG")
        sdr_paths.append(p)
        gm_bytes.append(buf.getvalue())
        texts.append(f"test caption {i}")

    from gmdx.data.parquet import write_parquet_dataset

    meta = str(root / "train.parquet")
    write_parquet_dataset(meta, sdr_paths, gm_bytes, texts)
    return root, meta, str(data_dir)


class TestStage2CLI:
    def test_train_and_artifacts(self, workdir):
        root, meta, data_dir = workdir
        out = str(root / "s2out")
        r = run_script(
            "scripts/stage2/train_gm_unet.py",
            [
                "--pretrained_model_name_or_path", str(root / "pipe"),
                "--train_metadata", meta,
                "--output_dir", out,
                "--resolution", "64",
                "--train_batch_size", "2",
                "--max_train_steps", "3",
                "--checkpointing_steps", "2",
                "--learning_rate", "1e-4",
                "--seed", "0",
                "--use_ema",
            ],
        )
        assert r.returncode == 0, r.stderr[-3000:]
        # Orbax checkpoint written + complete pipeline saved.
        assert os.path.isdir(os.path.join(out, "checkpoint_2"))
        assert os.path.isdir(os.path.join(out, "save_pipeline", "unet"))
        index = json.load(
            open(os.path.join(out, "save_pipeline", "model_index.json"))
        )
        assert set(index["components"]) >= {
            "unet", "vae", "text_encoder", "tokenizer", "scheduler"
        }
        # Saved unet is the 8-channel GM variant.
        cfg = json.load(
            open(os.path.join(out, "save_pipeline", "unet", "config.json"))
        )
        assert cfg["in_channels"] == 8
        # Metrics JSONL has train_loss records.
        lines = open(
            os.path.join(out, "logs", "metrics.jsonl")
        ).read().strip().splitlines()
        assert any("train_loss" in l for l in lines)

    def test_resume_from_checkpoint(self, workdir):
        """--resume_from_checkpoint latest restarts from the saved orbax
        state and continues to the new max step (reference semantics:
        train_gm_unet.py:1105-1131 "latest" = max step-suffix scan)."""
        root, meta, _ = workdir
        out = str(root / "s2out_resume")
        base_args = [
            "--pretrained_model_name_or_path", str(root / "pipe"),
            "--train_metadata", meta,
            "--output_dir", out,
            "--resolution", "64",
            "--train_batch_size", "1",
            "--checkpointing_steps", "2",
            "--learning_rate", "1e-4",
            "--seed", "0",
        ]
        r = run_script(
            "scripts/stage2/train_gm_unet.py",
            base_args + ["--max_train_steps", "2"],
        )
        assert r.returncode == 0, r.stderr[-3000:]
        assert os.path.isdir(os.path.join(out, "checkpoint_2"))

        r = run_script(
            "scripts/stage2/train_gm_unet.py",
            base_args + [
                "--max_train_steps", "4",
                "--resume_from_checkpoint", "latest",
            ],
        )
        assert r.returncode == 0, r.stderr[-3000:]
        assert "resumed from checkpoint step 2" in r.stderr
        assert os.path.isdir(os.path.join(out, "checkpoint_4"))
        assert os.path.isdir(os.path.join(out, "save_pipeline", "unet"))

    def test_dead_flags_rejected(self, workdir):
        root, meta, _ = workdir
        r = run_script(
            "scripts/stage2/train_gm_unet.py",
            [
                "--pretrained_model_name_or_path", str(root / "pipe"),
                "--train_metadata", meta,
                "--dream_training",
            ],
        )
        assert r.returncode != 0
        assert "dead flags" in r.stderr

    def test_fsdp_shard_strategy(self, workdir):
        """--shard_strategy fsdp trains over the 8-device CPU mesh with
        params + opt state sharded (conftest forces the virtual mesh)."""
        root, meta, _ = workdir
        out = str(root / "s2out_fsdp")
        r = run_script(
            "scripts/stage2/train_gm_unet.py",
            [
                "--pretrained_model_name_or_path", str(root / "pipe"),
                "--train_metadata", meta,
                "--output_dir", out,
                "--resolution", "64",
                "--train_batch_size", "1",
                "--max_train_steps", "2",
                "--learning_rate", "1e-4",
                "--seed", "0",
                "--shard_strategy", "fsdp",
            ],
        )
        assert r.returncode == 0, r.stderr[-3000:]
        lines = open(
            os.path.join(out, "logs", "metrics.jsonl")
        ).read().strip().splitlines()
        assert any("train_loss" in l for l in lines)


class TestStage3CLI:
    def test_generate_hdr(self, workdir):
        root, meta, data_dir = workdir
        out = str(root / "s3out")
        r = run_script(
            "scripts/inference/generate_hdr.py",
            [
                "--pretrained_model_name_or_path", str(root / "pipe"),
                "--unet_ckpt", str(root / "s2out" / "save_pipeline"),
                "--sdr_input_path", data_dir,
                "--output_dir", out,
                "--resolution", "64",
                "--num_inference_steps", "2",
                "--seed", "42",
            ],
        )
        assert r.returncode == 0, r.stderr[-3000:]
        names = sorted(os.listdir(out))
        assert any(n.startswith("sdr_") for n in names)
        assert any(n.startswith("gm_") for n in names)
        hdrs = [n for n in names if n.endswith(".hdr")]
        assert len(hdrs) >= 2  # decoded + original variants
        # .hdr files are readable by an external consumer (cv2).
        import cv2

        img = cv2.imread(
            os.path.join(out, hdrs[0]), cv2.IMREAD_ANYDEPTH | cv2.IMREAD_COLOR
        )
        assert img is not None and np.isfinite(img).all()

    def test_generate_hdr_batched(self, workdir):
        """--batch_size: one sampling dispatch per chunk, full artifact set
        per frame (incl. the ragged tail chunk: 32 images / batch 5)."""
        root, meta, data_dir = workdir
        out = str(root / "s3out_batched")
        r = run_script(
            "scripts/inference/generate_hdr.py",
            [
                "--pretrained_model_name_or_path", str(root / "pipe"),
                "--unet_ckpt", str(root / "s2out" / "save_pipeline"),
                "--sdr_input_path", data_dir,
                "--output_dir", out,
                "--resolution", "64",
                "--num_inference_steps", "2",
                "--seed", "42",
                "--batch_size", "5",
            ],
        )
        assert r.returncode == 0, r.stderr[-3000:]
        names = os.listdir(out)
        n_frames = len(
            [n for n in os.listdir(data_dir) if n.endswith(".png")]
        )
        assert len([n for n in names if n.startswith("gm_")]) == n_frames
        assert len([n for n in names if n.endswith(".hdr")]) == 2 * n_frames


class TestExperimentHarnesses:
    def test_formal_baseline(self, workdir):
        root, meta, data_dir = workdir
        out = str(root / "fb_out")
        r = run_script(
            "scripts/inference/experiments/formal_baseline.py",
            [
                "--pretrained_model_name_or_path", str(root / "pipe"),
                "--output_dir", out,
                "--resolution", "32",
                "--num_inference_steps", "2",
                "--num_prompts", "1",
            ],
        )
        assert r.returncode == 0, r.stderr[-3000:]
        assert any(n.endswith(".hdr") for n in os.listdir(out))

    def test_visualize_latents(self, workdir):
        root, meta, data_dir = workdir
        out = str(root / "vis_out")
        r = run_script(
            "scripts/inference/experiments/visualize_latents.py",
            [
                "--pretrained_model_name_or_path", str(root / "pipe"),
                "--output_dir", out,
                "--resolution", "32",
                "--num_inference_steps", "3",
                "--max_frames", "3",
            ],
        )
        assert r.returncode == 0, r.stderr[-3000:]
        assert os.path.exists(os.path.join(out, "trajectory_grid.png"))

    def test_rebuttal_visual_delegate(self, workdir):
        """C18's named harness delegates to visualize_latents (same flags,
        reference scripts/inference/experiments/rebuttal_visual.py:229)."""
        root, meta, data_dir = workdir
        out = str(root / "rv_out")
        r = run_script(
            "scripts/inference/experiments/rebuttal_visual.py",
            [
                "--pretrained_model_name_or_path", str(root / "pipe"),
                "--output_dir", out,
                "--resolution", "32",
                "--num_inference_steps", "2",
                "--max_frames", "2",
            ],
        )
        assert r.returncode == 0, r.stderr[-3000:]
        assert os.path.exists(os.path.join(out, "trajectory_grid.png"))

    def test_num_prompts_zero_rejected(self, workdir):
        """take_prompts guard (ADVICE round 2): --num_prompts 0 exits
        nonzero with a message instead of silently running nothing."""
        root, meta, data_dir = workdir
        r = run_script(
            "scripts/inference/experiments/formal_baseline.py",
            [
                "--pretrained_model_name_or_path", str(root / "pipe"),
                "--output_dir", str(root / "npz_out"),
                "--resolution", "32",
                "--num_inference_steps", "2",
                "--num_prompts", "0",
            ],
        )
        assert r.returncode != 0
        assert "num_prompts" in (r.stderr + r.stdout)

    def test_formal_improved(self, workdir):
        root, meta, data_dir = workdir
        out = str(root / "fi_out")
        r = run_script(
            "scripts/inference/experiments/formal_improved.py",
            [
                "--pretrained_model_name_or_path", str(root / "pipe"),
                "--output_dir", out,
                "--resolution", "32",
                "--num_inference_steps", "3",
                "--num_prompts", "1",
                "--lora_scale", "1.0",
            ],
        )
        assert r.returncode == 0, r.stderr[-3000:]
        assert any(n.endswith(".hdr") for n in os.listdir(out))

    def test_formal_improved_ablation(self, workdir):
        root, meta, data_dir = workdir
        out = str(root / "fia_out")
        r = run_script(
            "scripts/inference/experiments/formal_improved_ablation.py",
            [
                "--pretrained_model_name_or_path", str(root / "pipe"),
                "--output_dir", out,
                "--resolution", "32",
                "--num_prompts", "1",
                "--steps", "2", "3",
            ],
        )
        assert r.returncode == 0, r.stderr[-3000:]
        for steps in (2, 3):
            sub = os.path.join(out, f"steps_{steps}")
            assert os.path.isdir(sub), sub
            assert any(n.endswith(".hdr") for n in os.listdir(sub)), sub

    def test_legacy_test(self, workdir):
        root, meta, data_dir = workdir
        out = str(root / "lt_out")
        r = run_script(
            "scripts/inference/experiments/legacy_test.py",
            [
                "--pretrained_model_name_or_path", str(root / "pipe"),
                "--sdr_input_path", data_dir,
                "--output_dir", out,
                "--resolution", "32",
                "--num_inference_steps", "2",
                "--max_images", "1",
            ],
        )
        assert r.returncode == 0, r.stderr[-3000:]
        assert any(n.endswith(".hdr") for n in os.listdir(out))

    def test_rebuttal_r2q2_with_vae_swap(self, workdir):
        root, meta, data_dir = workdir
        out = str(root / "r2q2_out")
        r = run_script(
            "scripts/inference/experiments/rebuttal_r2q2.py",
            [
                "--pretrained_model_name_or_path", str(root / "pipe"),
                "--vae_ckpt", str(root / "pipe" / "vae"),
                "--output_dir", out,
                "--resolution", "32",
                "--num_inference_steps", "3",
                "--num_prompts", "1",
            ],
        )
        assert r.returncode == 0, r.stderr[-3000:]
        assert any(n.endswith(".hdr") for n in os.listdir(out))

    @pytest.fixture(scope="class")
    def two_pngs(self, workdir):
        """The stage-2 experiment harnesses iterate every PNG in the input
        dir (scheduler_tuning.py:51 etc.); give them a 2-image subset."""
        root, meta, data_dir = workdir
        sub = root / "two_pngs"
        sub.mkdir(exist_ok=True)
        import shutil

        for name in sorted(os.listdir(data_dir))[:2]:
            shutil.copy(os.path.join(data_dir, name), sub / name)
        return str(sub)

    def test_scheduler_tuning(self, workdir, two_pngs):
        root, meta, data_dir = workdir
        out = str(root / "st_out")
        r = run_script(
            "scripts/stage2/experiments/scheduler_tuning.py",
            [
                "--pretrained_model_name_or_path", str(root / "pipe"),
                "--sdr_input_path", two_pngs,
                "--output_dir", out,
                "--resolution", "32",
                "--num_inference_steps", "3",
            ],
        )
        assert r.returncode == 0, r.stderr[-3000:]
        assert any(n.endswith(".hdr") for n in os.listdir(out))

    def test_batch_size_sweep(self, workdir, two_pngs):
        root, meta, data_dir = workdir
        out = str(root / "bss_out")
        r = run_script(
            "scripts/stage2/experiments/batch_size_sweep.py",
            [
                "--pretrained_model_name_or_path", str(root / "pipe"),
                "--sdr_input_path", two_pngs,
                "--output_dir", out,
                "--batch_size", "2",
                "--resolution", "32",
                "--num_inference_steps", "2",
            ],
        )
        assert r.returncode == 0, r.stderr[-3000:]
        assert any(n.endswith(".hdr") for n in os.listdir(out))

    def test_demo_inference_bf16(self, workdir, two_pngs):
        root, meta, data_dir = workdir
        out = str(root / "demo_out")
        r = run_script(
            "scripts/stage2/experiments/demo_inference_bf16.py",
            [
                "--pretrained_model_name_or_path", str(root / "pipe"),
                "--sdr_input_path", two_pngs,
                "--output_dir", out,
                "--resolution", "32",
                "--num_inference_steps", "2",
                "--aspect", "square",
            ],
        )
        assert r.returncode == 0, r.stderr[-3000:]
        assert any(n.endswith(".hdr") for n in os.listdir(out))

    def test_upconvert_hdrtv(self, workdir):
        root, meta, data_dir = workdir
        out = str(root / "hdrtv_out")
        r = run_script(
            "scripts/inference/upconvert_hdrtv.py",
            [
                "--pretrained_model_name_or_path", str(root / "pipe"),
                "--sdr_input_path", data_dir,
                "--output_dir", out,
                "--resolution", "32",
                "--num_inference_steps", "2",
                "--max_images", "1",
            ],
            timeout=1200,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        assert any(n.startswith("hdrtv_") for n in os.listdir(out))


class TestStage1CLI:
    def test_train_and_artifacts(self, workdir):
        root, meta, data_dir = workdir
        out = str(root / "s1out")
        r = run_script(
            "scripts/stage1/train_vqgan_lora.py",
            [
                "--pretrained_model_name_or_path", str(root / "pipe"),
                "--train_metadata", meta,
                "--output_dir", out,
                "--resolution", "64",
                "--train_batch_size", "1",
                "--max_train_steps", "2",  # one gen + one disc step
                "--checkpointing_steps", "2",
                "--rank", "2",
                "--seed", "0",
                "--clip_pixel",
                "--val_images_dir", data_dir,
                "--validation_steps", "2",
                "--debug_mode",
                "--gradient_checkpointing",
                "--use_ema",
            ],
            timeout=1200,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        assert os.path.isdir(os.path.join(out, "finetuned_VAE", "vae"))
        assert os.path.isdir(os.path.join(out, "discriminator"))
        assert os.path.isdir(os.path.join(out, "checkpoint_2"))
        # Validation wrote .hdr + grid previews + the range log.
        val = os.path.join(out, "validation")
        assert any(n.endswith(".hdr") for n in os.listdir(val))
        assert os.path.exists(os.path.join(val, "evaluation_log.txt"))
        # --debug_mode wrote the sdr|gm|hdr|tmo|target strip at batch 0
        # (reference train_vqgan_lora.py:1143-1147).
        assert os.path.exists(
            os.path.join(out, "debug_train", "step_0_concat_image.png")
        )


class TestStage1Resume:
    def test_resume_from_checkpoint(self, workdir):
        """--resume_from_checkpoint latest restores the full GAN state
        (LoRA trainables, discriminator, both optimizer states) and
        continues to the new max step — mirrors the stage-2 resume test
        for the alternating-trainer path (reference semantics:
        train_vqgan_lora.py:1048-1075)."""
        root, meta, _ = workdir
        out = str(root / "s1out_resume")
        base_args = [
            "--pretrained_model_name_or_path", str(root / "pipe"),
            "--train_metadata", meta,
            "--output_dir", out,
            "--resolution", "64",
            "--train_batch_size", "1",
            "--checkpointing_steps", "2",
            "--rank", "2",
            "--seed", "0",
        ]
        r = run_script(
            "scripts/stage1/train_vqgan_lora.py",
            base_args + ["--max_train_steps", "2"],
            timeout=1200,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        assert os.path.isdir(os.path.join(out, "checkpoint_2"))

        r = run_script(
            "scripts/stage1/train_vqgan_lora.py",
            base_args + [
                "--max_train_steps", "4",
                "--resume_from_checkpoint", "latest",
            ],
            timeout=1200,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        assert "resumed from checkpoint step 2" in r.stderr
        assert os.path.isdir(os.path.join(out, "checkpoint_4"))
        # Final artifacts still written after a resumed run.
        assert os.path.isdir(os.path.join(out, "finetuned_VAE", "vae"))
        assert os.path.isdir(os.path.join(out, "discriminator"))


class TestStage1FSDP:
    def test_fsdp_shard_strategy(self, workdir):
        """Stage-1 trainer over the virtual mesh with generator trainables,
        discriminator params, and both optimizer states sharded."""
        root, meta, _ = workdir
        out = str(root / "s1out_fsdp")
        r = run_script(
            "scripts/stage1/train_vqgan_lora.py",
            [
                "--pretrained_model_name_or_path", str(root / "pipe"),
                "--train_metadata", meta,
                "--output_dir", out,
                "--resolution", "64",
                "--train_batch_size", "1",
                "--max_train_steps", "2",
                "--rank", "2",
                "--seed", "0",
                "--shard_strategy", "fsdp",
            ],
            timeout=1200,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        assert os.path.isdir(os.path.join(out, "finetuned_VAE", "vae"))


class TestCacheLatentsCLI:
    def test_cache_latents_trains(self, workdir):
        root, meta, _ = workdir
        out = str(root / "s2out_cache")
        r = run_script(
            "scripts/stage2/train_gm_unet.py",
            [
                "--pretrained_model_name_or_path", str(root / "pipe"),
                "--train_metadata", meta,
                "--output_dir", out,
                "--resolution", "64",
                "--train_batch_size", "1",
                "--max_train_steps", "2",
                "--seed", "0",
                "--cache_latents", "--center_crop",
            ],
        )
        assert r.returncode == 0, r.stderr[-3000:]
        lines = open(
            os.path.join(out, "logs", "metrics.jsonl")
        ).read().strip().splitlines()
        assert any("train_loss" in l for l in lines)

    def test_precomputed_latent_cache_trains(self, workdir):
        """precompute_latents.py writes an .npz the trainer loads via
        --latent_cache_path (skipping decode+encode), and the resolution
        guard rejects a mismatched cache loudly."""
        root, meta, _ = workdir
        npz = str(root / "latents64.npz")
        r = run_script(
            "scripts/tools/precompute_latents.py",
            [
                "--train_metadata", meta,
                "--pretrained_model_name_or_path", str(root / "pipe"),
                "--resolution", "64",
                "--out", npz,
            ],
        )
        assert r.returncode == 0, r.stderr[-3000:]
        assert os.path.exists(npz)
        out = str(root / "s2out_precache")
        r = run_script(
            "scripts/stage2/train_gm_unet.py",
            [
                "--pretrained_model_name_or_path", str(root / "pipe"),
                "--train_metadata", meta,
                "--output_dir", out,
                "--resolution", "64",
                "--train_batch_size", "1",
                "--max_train_steps", "2",
                "--seed", "0",
                "--latent_cache_path", npz,
            ],
        )
        assert r.returncode == 0, r.stderr[-3000:]
        assert "loaded precomputed latent cache" in (r.stderr + r.stdout)
        lines = open(
            os.path.join(out, "logs", "metrics.jsonl")
        ).read().strip().splitlines()
        assert any("train_loss" in l for l in lines)
        # resolution mismatch rejected loudly
        r = run_script(
            "scripts/stage2/train_gm_unet.py",
            [
                "--pretrained_model_name_or_path", str(root / "pipe"),
                "--train_metadata", meta,
                "--output_dir", str(root / "s2out_precache_bad"),
                "--resolution", "32",
                "--train_batch_size", "1",
                "--max_train_steps", "1",
                "--latent_cache_path", npz,
            ],
        )
        assert r.returncode != 0
        assert "rebuild" in (r.stderr + r.stdout)

    @pytest.mark.parametrize("ga", [1, 2])
    def test_resume_continuity_matches_uninterrupted(self, workdir, ga):
        """Resume is exact (VERDICT r3 item 2/4): a run restored from a
        mid-run checkpoint must log the SAME losses as an uninterrupted run
        at the same steps — orbax state + loader skip_batches fast-forward
        + fold_in(key, batch index) together make the trajectory identical.
        ga=2 additionally proves the sync-gated accumulation units (VERDICT
        r4 missing #1): global_step counts optimizer updates, a checkpoint
        at update S fast-forwards S*ga batches, and the MultiSteps
        accumulator window re-aligns across the restart. (The on-chip
        kill/SIGKILL variant is docs/STAGE2_E2E.md.)"""
        import json

        root, meta, _ = workdir

        def losses(out):
            path = os.path.join(out, "logs", "metrics.jsonl")
            recs = [json.loads(l) for l in open(path)]
            return {r["step"]: r["train_loss"] for r in recs
                    if "train_loss" in r}

        base_args = [
            "--pretrained_model_name_or_path", str(root / "pipe"),
            "--train_metadata", meta,
            "--resolution", "64",
            "--train_batch_size", "1",
            "--seed", "0",
            "--cache_latents", "--center_crop",
            "--checkpointing_steps", "10",
            "--gradient_accumulation_steps", str(ga),
        ]
        full = str(root / f"s2resume_full_ga{ga}")
        r = run_script(
            "scripts/stage2/train_gm_unet.py",
            base_args + ["--output_dir", full, "--max_train_steps", "20"],
        )
        assert r.returncode == 0, r.stderr[-3000:]
        part = str(root / f"s2resume_part_ga{ga}")
        r = run_script(
            "scripts/stage2/train_gm_unet.py",
            base_args + ["--output_dir", part, "--max_train_steps", "10"],
        )
        assert r.returncode == 0, r.stderr[-3000:]
        r = run_script(
            "scripts/stage2/train_gm_unet.py",
            base_args + ["--output_dir", part, "--max_train_steps", "20",
                         "--resume_from_checkpoint", "latest"],
        )
        assert r.returncode == 0, r.stderr[-3000:]
        lf, lp = losses(full), losses(part)
        after = [s for s in lp if s > 10]
        assert after, f"no post-resume steps logged: {sorted(lp)}"
        for s in after:
            assert s in lf
            assert lp[s] == pytest.approx(lf[s], rel=1e-5), (
                f"step {s}: resumed {lp[s]} vs uninterrupted {lf[s]}"
            )

    def test_cache_latents_requires_deterministic_preprocess(self, workdir):
        root, meta, _ = workdir
        r = run_script(
            "scripts/stage2/train_gm_unet.py",
            [
                "--pretrained_model_name_or_path", str(root / "pipe"),
                "--train_metadata", meta,
                "--cache_latents", "--random_flip", "--center_crop",
            ],
        )
        assert r.returncode != 0
        assert "cache_latents" in (r.stderr + r.stdout)


class TestControlNetCLI:
    def test_train_and_save(self, workdir):
        """ControlNet trainer end-to-end on the tiny pipeline: trains,
        checkpoints, saves a loadable controlnet component."""
        root, meta, _ = workdir
        out = str(root / "cn_out")
        r = run_script(
            "scripts/controlnet/train_controlnet.py",
            [
                "--pretrained_model_name_or_path", str(root / "pipe"),
                "--train_metadata", meta,
                "--output_dir", out,
                "--resolution", "64",
                "--train_batch_size", "1",
                "--max_train_steps", "2",
                "--checkpointing_steps", "2",
                "--seed", "0",
            ],
        )
        assert r.returncode == 0, r.stderr[-3000:]
        assert os.path.isdir(os.path.join(out, "checkpoint_2"))
        from gmdx.io.pipeline import load_component

        cnet, params = load_component(os.path.join(out, "controlnet"))
        assert type(cnet).__name__ == "ControlNetModel"
        lines = open(
            os.path.join(out, "logs", "metrics.jsonl")
        ).read().strip().splitlines()
        assert any("train_loss" in l for l in lines)
