"""On-TPU PSNR coverage for every non-default kernel toggle.

bench.py's kernel_psnr gate covers the DEFAULT kernel stack vs the
GMDX_NO_PALLAS fallback. This harness additionally measures each kernel
toggle end-to-end (VERDICT.md round-2 item 2's toggle matrix): the 512^2
dual pipeline at batch 2 with identical injected inputs, decoded-image PSNR
vs the all-XLA fallback, plus a train-step gradient PSNR that exercises the
flash attention BACKWARD kernels. Results print as a markdown table for
BENCHNOTES.md.

Usage: python scripts/tools/kernel_parity_tpu.py [--skip-train]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)
os.chdir(REPO)  # bench.py expects repo-root relative caches

# (label, env overrides) — each traced fresh; cached_export keys include
# the GMDX_* env so artifacts never cross-contaminate.
VARIANTS = [
    ("default kernels (flash + KV-resident + Winograd + GN + GEGLU)", {}),
    ("half-parity Winograd I/O off", {"GMDX_WINOGRAD_HALFPARITY": "0"}),
    ("KV-resident attention off (flash online-softmax)", {"GMDX_ATTN_KVRES": "0"}),
    ("short-K cross-attention kernel on", {"GMDX_XATTN_KERNEL": "1"}),
]


def run_variant(env: dict):
    import bench

    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        fn, args = bench.build(
            key_suffix="-kp" + "".join(f"-{k}{v}" for k, v in sorted(env.items())),
            batch=2,
        )
        sdr, gm = fn(*args)
        from gmdx.utils import sync

        sync((sdr, gm))
        return sdr, gm
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def grad_psnr() -> float:
    """Flash attention BACKWARD kernels: grads of a stage-2-style loss on
    the 8-ch UNet at 256^2 (1024-token self-attention — the flash bwd
    dispatch floor), Pallas vs GMDX_NO_PALLAS, PSNR over the whole grad
    tree."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gmdx.models import SD15_GM_UNET_CONFIG, UNet2DConditionModel
    from gmdx.utils import cached_export, sync

    dtype = jnp.bfloat16
    unet = UNet2DConditionModel(SD15_GM_UNET_CONFIG, dtype=dtype)
    h = w = 32  # 256^2 pixels -> 1024 latent tokens
    params = cached_export(
        unet.init, jax.random.key(0), jnp.zeros((1, 8, h, w)),
        jnp.array(1.0), jnp.zeros((1, 77, 768)), key="kp-grad-init",
    )(jax.random.key(0), jnp.zeros((1, 8, h, w)), jnp.array(1.0),
      jnp.zeros((1, 77, 768)))["params"]

    x = jax.random.normal(jax.random.key(1), (1, 8, h, w))
    t = jnp.array(501.0)
    ctx = jax.random.normal(jax.random.key(2), (1, 77, 768), dtype)
    target = jax.random.normal(jax.random.key(3), (1, 4, h, w))

    def loss(params, x, t, ctx, target):
        eps = unet.apply({"params": params}, x, t, ctx)
        return jnp.mean((eps.astype(jnp.float32) - target) ** 2)

    def grads_with(env: dict, key_suffix: str):
        """Grad tree fetched to HOST immediately — two live 3.4 GB device
        grad trees next to the fp32 params exhaust a v5e's HBM."""
        old = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            g = cached_export(
                jax.grad(loss), params, x, t, ctx, target,
                key="kp-grad" + key_suffix,
            )(params, x, t, ctx, target)
            sync(g)
            host = jax.device_get(g)
            del g
            return host
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    g_kern = grads_with({}, "-kern")
    g_ref = grads_with({"GMDX_NO_PALLAS": "1"}, "-ref")
    # streaming PSNR over the tree (no giant concat copies)
    sse = 0.0
    n = 0
    peak = 0.0
    for a, b in zip(jax.tree.leaves(g_kern), jax.tree.leaves(g_ref)):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        sse += float(((a - b) ** 2).sum())
        n += a.size
        peak = max(peak, float(np.abs(a).max()), float(np.abs(b).max()))
    mse = sse / n
    return float(10.0 * np.log10(peak**2 / mse))


def vs_torch(steps: int = 10, scale: str = "small") -> float:
    """DIRECT on-chip kernels ↔ torch gate (VERDICT r3 weak #4): run the
    dual-pipeline parity harness's gmdx side ON THE TPU at fp32 with the
    production Pallas kernels enabled, against the reference pipeline
    executing the torch oracle on CPU — same injected latents/weights
    through the production converter. Removes the transitive link in the
    numerics chain (kernels↔fallback on-chip x fallback↔torch on-CPU).

    ``scale="small"``: tiny channel widths but 32x32 latents so the
    1024/256-token attentions actually dispatch the flash/KV-resident
    kernels (at the tiny scale's 64 tokens every kernel would be idle and
    the gate vacuous). ``scale="sd15"`` (VERDICT r4 weak #6): the FULL
    pinned SD-1.5 config — 860M-param UNets, 64x64 latents, the production
    shapes the headline bench runs — closing the last transitive link
    (previously the full config was tied to torch only via the CPU
    fallback chain). The CPU torch oracle at sd15 takes minutes/step;
    use --steps 5."""
    import numpy as np

    import jax

    assert jax.default_backend() == "tpu", (
        "vs_torch must run on the TPU — that is the point of the gate"
    )
    # fp32 matmul precision: on TPU fp32 dots default to bf16 passes; the
    # XLA side of this A/B must be genuinely fp32 to resolve >=60 dB.
    jax.config.update("jax_default_matmul_precision", "highest")

    from gmdx.refbridge import parity

    print(f"torch oracle (CPU, {scale} scale, {steps} steps)...", flush=True)
    stack = parity.make_torch_stack(0, scale=scale)
    inputs = parity.make_inputs(42, scale=scale)
    ref_sdr, ref_gm = parity.run_reference_dual(
        stack, inputs, num_inference_steps=steps
    )
    params = parity.gmdx_params_from_torch(stack)
    print("gmdx on TPU, fp32, production kernels...", flush=True)
    got_sdr, got_gm = parity.run_gmdx_dual(
        params, inputs, num_inference_steps=steps, scale=scale
    )
    val = min(
        parity.psnr(np.asarray(got_sdr), ref_sdr),
        parity.psnr(np.asarray(got_gm), ref_gm),
    )
    print(
        f"on-chip-kernels vs torch latents: {val:.2f} dB "
        f"(sdr {parity.psnr(np.asarray(got_sdr), ref_sdr):.2f}, "
        f"gm {parity.psnr(np.asarray(got_gm), ref_gm):.2f})",
        flush=True,
    )
    return val


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--grad-only", action="store_true",
                    help="run only the flash-bwd grad parity (own process: "
                    "the 860M-param grad tree next to five live pipeline "
                    "variants exhausts HBM)")
    ap.add_argument("--vs-torch", action="store_true",
                    help="direct on-chip fp32 kernels vs the CPU torch "
                    "oracle at --config scale")
    ap.add_argument("--config", choices=["small", "sd15"], default="small",
                    help="parity scale for --vs-torch: 'small' (tiny "
                    "widths, real attention seq lens) or 'sd15' (the full "
                    "pinned production config; slow CPU oracle — pair with "
                    "--steps 5)")
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    if args.vs_torch:
        vs_torch(args.steps, scale=args.config)
        return
    if args.grad_only:
        print(f"GRAD_PSNR {grad_psnr():.2f}", flush=True)
        return

    import bench

    print("reference run (GMDX_NO_PALLAS fallback)...", flush=True)
    ref_sdr, ref_gm = run_variant({"GMDX_NO_PALLAS": "1"})

    rows = []
    for label, env in VARIANTS:
        print(f"variant: {label} ...", flush=True)
        sdr, gm = run_variant(env)
        val = min(bench.psnr01(sdr, ref_sdr), bench.psnr01(gm, ref_gm))
        rows.append((label, f"{val:.2f}"))
        print(f"  -> {val:.2f} dB", flush=True)

    if not args.skip_train:
        print("flash bwd grad parity (256^2 train-style grads, subprocess)...",
              flush=True)
        import subprocess

        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--grad-only"],
            capture_output=True, text=True, timeout=3600,
        )
        line = [l for l in proc.stdout.splitlines()
                if l.startswith("GRAD_PSNR")]
        rows.append(("flash attention bwd (grad-tree PSNR, 256^2)",
                     line[-1].split()[1] if line else
                     f"FAILED rc={proc.returncode}"))

    print("\n| kernel configuration | PSNR vs all-XLA fallback (dB) |")
    print("|---|---|")
    for label, val in rows:
        print(f"| {label} | {val} |")


if __name__ == "__main__":
    main()
