"""Stage-2 e2e on-chip training proof with mid-run kill + resume (VERDICT r3 #2).

Stage-2 is proven step-equivalent to the reference (docs/TRAIN_PARITY.md,
~1e-6) and CLI-smoke-tested, but those cover <=4 steps. This harness drives
the real `train_gm_unet.py` CLI at full SD-1.5 UNet scale (inflated 8-ch)
three times:

  1. BASELINE — `--steps` uninterrupted steps, loss curve + validation
     images + checkpoints.
  2. KILLED — the same run in a fresh dir, SIGKILLed as soon as the logged
     step passes `--kill-at` (a real mid-run crash: no atexit, no final
     save).
  3. RESUMED — `--resume_from_checkpoint latest` in the killed dir, to
     `--steps`.

Then it checks CONTINUITY: the resumed run's logged losses at every step
after the restored checkpoint must match the uninterrupted baseline's at
the same steps. This is strict because resume is exact by construction:
orbax restores model+optimizer state, the dataloader fast-forwards
`global_step` batches (gmdx/data/parquet.py skip_batches), and per-step RNG
is fold_in(key, step) — so a resumed run re-enters the identical
trajectory, not merely a plausible one. (The reference only resumes its
epoch loop at first_epoch — train_gm_unet.py:1122-1129 — and re-consumes
the partial epoch.)

Usage: python scripts/tools/stage2_e2e_proof.py [--steps 300] [--doc]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)

from stage1_e2e_proof import make_dataset  # noqa: E402 (same synthetic pairs)


def _widths(width: float):
    full = (320, 640, 1280, 1280)
    return tuple(max(32, int(round(c * width / 32)) * 32) for c in full)


def ensure_pipe(root: str, width: float = 0.3) -> str:
    """Full-ARCHITECTURE SD-1.5 pipeline, random init: 4-ch UNet (the CLI
    inflates conv_in to 8) with every SD level/attention/cross-attn block
    but at 0.3× channel width, full SD VAE, full CLIP-ViT-L text encoder,
    tiny-vocab tokenizer (ids stay < 49408 so the embedding table serves
    them).

    Why not full width: this dev chip is tunneled and reads back at
    ~5 MB/s (measured) — one full-width orbax checkpoint (params + Adam
    moments ≈ 10 GB) would be >30 minutes of pure device→host transfer,
    and the proof saves six of them. Step math, remat, cadence, resume
    mechanics and shapes-per-level are width-independent; full-width step
    throughput is measured separately (BENCHNOTES.md stage-2 rows)."""
    pipe_dir = os.path.join(root, f"pipe_sd15_w{width:g}")
    if os.path.isdir(pipe_dir):
        return pipe_dir
    if os.environ.get("JAX_PLATFORMS", "").lower() != "cpu":
        # Build the random-init pipe ON HOST CPU in a subprocess: the save
        # path fetches params leaf by leaf, and through the 5 MB/s tunnel
        # each small fetch is a full round trip — a 310 MB tree took >30
        # minutes device-side. CPU init + save is pure host work.
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--makepipe",
             "--out", root, "--width", str(width)],
            env=env, timeout=3600,
        )
        if r.returncode != 0 or not os.path.isdir(pipe_dir):
            raise SystemExit("makepipe subprocess failed")
        return pipe_dir
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp

    from gmdx.io.pipeline import save_pipeline
    from gmdx.models import (
        AutoencoderKL,
        CLIPTextModel,
        CLIPTokenizer,
        SD15_UNET_CONFIG,
        SD15_VAE_CONFIG,
        UNet2DConditionModel,
    )
    from gmdx.models.clip_text import CLIP_VIT_L_CONFIG
    from gmdx.schedulers import DDPMScheduler

    unet = UNet2DConditionModel(
        _dc.replace(SD15_UNET_CONFIG, block_out_channels=_widths(width))
    )
    unet_params = jax.jit(unet.init)(
        jax.random.key(0), jnp.zeros((1, 4, 32, 32)), jnp.array(1.0),
        jnp.zeros((1, 77, 768)),
    )["params"]
    vae = AutoencoderKL(SD15_VAE_CONFIG)
    vae_params = jax.jit(vae.init)(
        jax.random.key(1), jnp.zeros((1, 3, 64, 64)), jax.random.key(2)
    )["params"]
    text = CLIPTextModel(CLIP_VIT_L_CONFIG)
    text_params = jax.jit(text.init)(
        jax.random.key(3), jnp.zeros((1, 77), jnp.int32)
    )["params"]
    save_pipeline(
        pipe_dir,
        components={
            "unet": (unet, unet_params),
            "vae": (vae, vae_params),
            "text_encoder": (text, text_params),
        },
        tokenizer=CLIPTokenizer.tiny(),
        scheduler=DDPMScheduler(),
    )
    return pipe_dir


def train_cmd(args, pipe_dir, meta, run_dir, max_steps, resume=False):
    cmd = [
        sys.executable, os.path.join(REPO, "scripts/stage2/train_gm_unet.py"),
        "--pretrained_model_name_or_path", pipe_dir,
        "--train_metadata", meta,
        "--output_dir", run_dir,
        "--resolution", str(args.resolution),
        "--center_crop",
        "--cache_latents",
        "--train_batch_size", str(args.batch),
        "--max_train_steps", str(max_steps),
        "--learning_rate", "1e-4",
        "--seed", "0",
        "--lr_warmup_steps", "0",
        "--checkpointing_steps", str(args.ckpt_every),
        "--mixed_precision", "bf16",
        "--validation_image_dir", os.path.join(args.out, "val"),
        "--validation_epochs", str(args.validation_epochs),
        "--dataloader_num_workers", "2",
    ]
    if getattr(args, "async_ckpt", False):
        cmd += ["--async_checkpointing"]
    if resume:
        cmd += ["--resume_from_checkpoint", "latest"]
    return cmd


def read_losses(run_dir: str) -> dict:
    jsonl = sorted(glob.glob(os.path.join(run_dir, "**", "metrics.jsonl"),
                             recursive=True))
    assert jsonl, f"no metrics.jsonl under {run_dir}"
    out = {}
    with open(jsonl[-1]) as f:
        for line in f:
            rec = json.loads(line)
            if "train_loss" in rec:
                out[rec["step"]] = rec["train_loss"]
    return out


def run_to_completion(cmd, env, timeout=14000):
    print(" ".join(cmd), flush=True)
    r = subprocess.run(cmd, cwd=REPO, timeout=timeout, env=env)
    if r.returncode != 0:
        raise SystemExit(f"trainer failed rc={r.returncode}")


def run_and_kill(cmd, env, run_dir, kill_at: int, timeout=14000):
    """Start the trainer, SIGKILL it once metrics.jsonl logs step >= kill_at."""
    print(" ".join(cmd), f"[kill at step >= {kill_at}]", flush=True)
    proc = subprocess.Popen(cmd, cwd=REPO, env=env)
    deadline = time.time() + timeout
    try:
        while time.time() < deadline:
            if proc.poll() is not None:
                raise SystemExit(
                    f"trainer exited (rc={proc.returncode}) before reaching "
                    f"kill step {kill_at} — nothing to kill"
                )
            try:
                losses = read_losses(run_dir)
            except AssertionError:
                losses = {}
            if losses and max(losses) >= kill_at:
                proc.send_signal(signal.SIGKILL)
                proc.wait(timeout=60)
                print(f"killed at logged step {max(losses)}", flush=True)
                return max(losses)
            time.sleep(2)
    finally:
        if proc.poll() is None:
            proc.kill()
    raise SystemExit("timed out waiting for the kill step")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--makepipe", action="store_true",
                    help="internal: build the random-init pipe (run under "
                    "JAX_PLATFORMS=cpu) and exit")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--width", type=float, default=0.3,
                    help="UNet channel-width multiplier vs SD-1.5 (0.3 -> "
                    "(96,192,384,384); 0.5 -> (160,320,640,640); 1.0 full). "
                    "Checkpoint transfer through the 5 MB/s tunnel scales "
                    "with width^2 — see ensure_pipe docstring.")
    ap.add_argument("--async_ckpt", action="store_true",
                    help="pass --async_checkpointing to the trainer")
    ap.add_argument("--kill-at", type=int, default=150, dest="kill_at")
    ap.add_argument("--ckpt-every", type=int, default=100, dest="ckpt_every")
    ap.add_argument("--out", default="/tmp/gmdx_stage2_e2e")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--validation_epochs", type=int, default=4)
    ap.add_argument("--doc", action="store_true",
                    help="write docs/STAGE2_E2E.md from the finished runs")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    if args.makepipe:
        ensure_pipe(args.out, width=args.width)
        return
    meta = make_dataset(args.out, n_pairs=256, size=args.resolution + 32)
    # validation images must match the training resolution budget
    pipe_dir = ensure_pipe(args.out, width=args.width)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    base_dir = os.path.join(args.out, "baseline")
    kill_dir = os.path.join(args.out, "killed")

    run_to_completion(
        train_cmd(args, pipe_dir, meta, base_dir, args.steps), env
    )
    base = read_losses(base_dir)

    killed_at = run_and_kill(
        train_cmd(args, pipe_dir, meta, kill_dir, args.steps), env,
        kill_dir, args.kill_at,
    )
    ckpts = sorted(
        int(d.rsplit("_", 1)[-1])
        for d in os.listdir(kill_dir) if d.startswith("checkpoint_")
    )
    assert ckpts, f"no checkpoint survived the kill in {kill_dir}"
    restored_step = ckpts[-1]
    print(f"resuming from checkpoint_{restored_step}", flush=True)

    run_to_completion(
        train_cmd(args, pipe_dir, meta, kill_dir, args.steps, resume=True),
        env,
    )
    resumed = read_losses(kill_dir)

    # Continuity: every post-restore logged step must match the baseline.
    steps_after = sorted(s for s in resumed if s > restored_step)
    assert steps_after and max(steps_after) >= args.steps - 10, (
        f"resumed run did not reach the end: {steps_after[-5:]}"
    )
    diffs = []
    for s in steps_after:
        assert s in base, f"baseline never logged step {s}"
        rel = abs(resumed[s] - base[s]) / max(abs(base[s]), 1e-12)
        diffs.append((s, base[s], resumed[s], rel))
    worst = max(d[3] for d in diffs)
    print(f"continuity: {len(diffs)} post-resume steps compared, "
          f"worst rel diff {worst:.3e}", flush=True)
    assert worst < 1e-3, (
        "resumed loss trajectory diverged from the uninterrupted baseline: "
        + str([d for d in diffs if d[3] >= 1e-3][:5])
    )
    finite = np.isfinite(np.asarray(list(base.values()), np.float64))
    assert finite.all(), "baseline loss went non-finite"

    grids = sorted(glob.glob(os.path.join(base_dir, "**", "*.png"),
                             recursive=True))
    print(f"baseline validation images: {len(grids)}")

    if args.doc:
        write_doc(args, base, resumed, restored_step, killed_at, worst,
                  len(grids), len(diffs))


def write_doc(args, base, resumed, restored_step, killed_at, worst,
              n_grids, n_compared):
    doc = os.path.join(REPO, "docs", "STAGE2_E2E.md")
    steps = sorted(base)
    idx = np.linspace(0, len(steps) - 1, min(10, len(steps))).astype(int)
    curve = ", ".join(f"{steps[i]}:{base[steps[i]]:.4f}" for i in idx)
    with open(doc, "w") as f:
        f.write(
            "# Stage-2 e2e on-chip training proof (with mid-run kill + "
            "resume)\n\n"
            f"`python scripts/tools/stage2_e2e_proof.py --steps {args.steps} "
            f"--doc` — three real `train_gm_unet.py` runs on the full SD-1.5 "
            f"UNet architecture at 0.3x width (inflated 8-ch, bf16 compute; "
            "width reduced because the tunneled dev chip reads back at "
            "~5 MB/s — a full-width orbax save is >30 min of transfer) at "
            f"{args.resolution}^2, batch {args.batch}, cached VAE latents, "
            "on one TPU chip; synthetic Text-SDR-GM parquet (smooth fields "
            "+ derived gain map).\n\n"
            "1. **baseline** — "
            f"{args.steps} uninterrupted steps;\n"
            f"2. **killed** — same run, SIGKILLed at logged step "
            f"{killed_at} (a real crash: no final save);\n"
            f"3. **resumed** — `--resume_from_checkpoint latest` restored "
            f"checkpoint_{restored_step} and ran to {args.steps}.\n\n"
            "## Baseline loss curve (sampled; full curves: metrics.jsonl)\n\n"
            f"`{curve}`\n\n"
            "All logged losses finite; validation images written: "
            f"{n_grids}.\n\n"
            "## Resume continuity\n\n"
            f"Every logged step after the restored checkpoint "
            f"({n_compared} steps, {restored_step + 1}..{max(resumed)}) was "
            "compared against the uninterrupted baseline at the same step: "
            f"worst relative difference **{worst:.3e}**.\n\n"
            "Resume is exact by construction: orbax restores model + "
            "optimizer state, the loader fast-forwards `global_step` "
            "batches without decoding them (`skip_batches`, "
            "gmdx/data/parquet.py), and per-step RNG is "
            "`fold_in(key, step)` — the resumed process re-enters the "
            "identical trajectory. The reference resumes only at epoch "
            "granularity (train_gm_unet.py:1122-1129).\n"
        )
    print(f"wrote {doc}")


if __name__ == "__main__":
    main()
