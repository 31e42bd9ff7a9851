"""In-graph scan timing for gmdx hot paths on the real TPU.

Per-call wall timing through the axon tunnel is unreliable (BENCHNOTES.md
"Environment facts"); this harness times N sequential iterations INSIDE one
jitted ``lax.scan`` and divides. Workloads chain the model output back into
the carry so XLA cannot dead-code or parallelize the iterations.

Usage:
  python scripts/tools/scan_bench.py --workload unet_fwd --iters 20
  python scripts/tools/scan_bench.py --workload unet_fwd --channels-last
  GMDX_FUSED_QKV=0 python scripts/tools/scan_bench.py --workload unet_fwd
  python scripts/tools/scan_bench.py --workload vae_decode --batch 16
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def time_scan(body, carry, iters: int, repeats: int = 3) -> float:
    """Seconds per iteration of ``body`` (carry -> carry), scan-chained."""
    import jax

    @jax.jit
    def run(c):
        def step(c, _):
            return body(c), None

        out, _ = jax.lax.scan(step, c, None, length=iters)
        return out

    from gmdx.utils import sync

    sync(run(carry))  # compile + warm; scalar-readback barrier (axon tunnel)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        sync(run(carry))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def unet_fwd(args):
    import jax
    import jax.numpy as jnp

    from gmdx.models import SD15_GM_UNET_CONFIG, UNet2DConditionModel

    dtype = jnp.bfloat16
    unet = UNet2DConditionModel(SD15_GM_UNET_CONFIG, dtype=dtype)
    h = w = args.res // 8
    params = jax.jit(unet.init)(
        jax.random.key(0), jnp.zeros((1, 8, h, w)), jnp.array(1.0),
        jnp.zeros((1, 77, 768)),
    )["params"]
    cl = args.channels_last
    shape = (args.batch, h, w, 8) if cl else (args.batch, 8, h, w)
    x = jax.random.normal(jax.random.key(1), shape, jnp.float32)
    ctx = jax.random.normal(jax.random.key(2), (args.batch, 77, 768), dtype)
    t = jnp.array(501, jnp.int32)

    def body(x):
        eps = unet.apply({"params": params}, x, t, ctx, channels_last=cl)
        ch_ax = -1 if cl else 1
        return jnp.concatenate([eps, eps], axis=ch_ax) * 0.5 + x * 0.5

    return body, x


def vae_decode(args):
    import jax
    import jax.numpy as jnp

    from gmdx.models import AutoencoderKL, SD15_VAE_CONFIG

    dtype = jnp.bfloat16
    vae = AutoencoderKL(SD15_VAE_CONFIG, dtype=dtype)
    params = jax.jit(vae.init)(
        jax.random.key(0), jnp.zeros((1, 3, 64, 64)), jax.random.key(1)
    )["params"]
    h = w = args.res // 8
    z = jax.random.normal(jax.random.key(2), (args.batch, 4, h, w))

    def body(z):
        img = vae.apply({"params": params}, z, method=vae.decode)
        # chain: average-pool the image back to latent size
        pooled = img[:, :, ::8, ::8]
        return z * 0.9 + 0.1 * jnp.concatenate(
            [pooled, pooled[:, :1]], axis=1
        )

    return body, z


def conv3x3(args):
    """One 3x3 SAME conv at a chosen NHWC shape — for Winograd-vs-direct
    per-shape A/Bs (GMDX_WINOGRAD=0 forces direct; --weight-dtype controls
    the param dtype the dispatch sees)."""
    import jax
    import jax.numpy as jnp

    dtype = jnp.bfloat16
    h = w = args.res // 8
    c, o = args.in_ch, args.out_ch
    wdt = jnp.dtype(args.weight_dtype)
    kernel = jax.random.normal(jax.random.key(0), (3, 3, c, o), wdt) * 0.02
    bias = jnp.zeros((o,), wdt)
    x = jax.random.normal(jax.random.key(1), (args.batch, h, w, c), dtype)

    from gmdx.kernels.winograd import winograd_conv3x3

    def body(x):
        out = winograd_conv3x3(x, kernel, bias)
        if out is None:
            out = jax.lax.conv_general_dilated(
                x, kernel.astype(dtype), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bias.astype(dtype)
        reps = c // o
        chained = jnp.concatenate([out] * reps, axis=-1) if reps > 1 else out
        return x * 0.5 + 0.5 * chained[..., :c]

    return body, x


def attention(args):
    """Self-attention at a chosen (batch, heads, seq, head-dim) through the
    production attention_packed dispatch — for flash block-size sweeps via
    GMDX_FLASH_BLKQ/BLKK (the 1024^2 UNet level-0 shape is
    --batch 2 --heads 8 --seq 16384 --head-dim 40)."""
    import jax
    import jax.numpy as jnp

    from gmdx.kernels.attention import attention_packed

    dtype = jnp.bfloat16
    c = args.heads * args.head_dim
    q = jax.random.normal(jax.random.key(0), (args.batch, args.seq, c), dtype)
    k = jax.random.normal(jax.random.key(1), (args.batch, args.seq, c), dtype)
    v = jax.random.normal(jax.random.key(2), (args.batch, args.seq, c), dtype)

    def body(q):
        out = attention_packed(q, k, v, args.heads)
        return (q * 0.5 + 0.5 * out).astype(dtype)

    return body, q


WORKLOADS = {"unet_fwd": unet_fwd, "vae_decode": vae_decode,
             "conv3x3": conv3x3, "attention": attention}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", choices=sorted(WORKLOADS), default="unet_fwd")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--channels-last", action="store_true")
    ap.add_argument("--in-ch", type=int, default=320)
    ap.add_argument("--out-ch", type=int, default=320)
    ap.add_argument("--weight-dtype", default="float32")
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--seq", type=int, default=16384)
    ap.add_argument("--head-dim", type=int, default=40)
    args = ap.parse_args()

    from gmdx.utils import enable_compilation_cache

    enable_compilation_cache()
    body, carry = WORKLOADS[args.workload](args)
    per = time_scan(body, carry, args.iters)
    extra = (
        f" seq={args.seq} heads={args.heads} d={args.head_dim} "
        f"blkq={os.environ.get('GMDX_FLASH_BLKQ', '-')} "
        f"blkk={os.environ.get('GMDX_FLASH_BLKK', '-')}"
        if args.workload == "attention" else ""
    )
    print(
        f"{args.workload} batch={args.batch} res={args.res} "
        f"cl={args.channels_last} fused_qkv={os.environ.get('GMDX_FUSED_QKV', '1')}:"
        f"{extra} {per*1e3:.2f} ms/iter"
    )


if __name__ == "__main__":
    main()
