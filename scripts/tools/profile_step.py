"""Device-trace profiler for gmdx hot paths.

The reference has no profiler at all (SURVEY.md §5.1); gmdx's answer is
``gmdx.utils.profiling.trace`` around a jitted workload plus this CLI, which
captures an XPlane device trace on the real TPU and prints the HLO op-level
time breakdown (via xprof) — the data that drove the flash-v3 / fused-GN
kernel work in BENCHNOTES.md.

Usage:
  python scripts/tools/profile_step.py --workload gm_unet_fwd --iters 10
  python scripts/tools/profile_step.py --workload dual_step --top 30
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def build_gm_unet_fwd(batch: int, res: int, dtype):
    import jax
    import jax.numpy as jnp

    from gmdx.models import SD15_GM_UNET_CONFIG, UNet2DConditionModel

    unet = UNet2DConditionModel(SD15_GM_UNET_CONFIG, dtype=dtype)
    h = w = res // 8
    params = jax.jit(unet.init)(
        jax.random.key(0), jnp.zeros((1, 8, h, w)), jnp.array(1.0),
        jnp.zeros((1, 77, 768)),
    )["params"]
    x = jax.random.normal(jax.random.key(1), (batch, 8, h, w))
    ctx = jax.random.normal(jax.random.key(2), (batch, 77, 768))
    t = jnp.array(501, jnp.int32)

    def fn(params, x, t, ctx):
        return unet.apply({"params": params}, x, t, ctx)

    return fn, (params, x, t, ctx)


def build_dual_step(batch: int, res: int, dtype):
    import jax
    import jax.numpy as jnp

    import __graft_entry__  # noqa: F401  (reuse the entry-step algebra)
    from gmdx.models import (
        SD15_GM_UNET_CONFIG,
        SD15_UNET_CONFIG,
        UNet2DConditionModel,
    )
    from gmdx.schedulers import PNDMScheduler

    sdr_unet = UNet2DConditionModel(SD15_UNET_CONFIG, dtype=dtype)
    gm_unet = UNet2DConditionModel(SD15_GM_UNET_CONFIG, dtype=dtype)
    acp = PNDMScheduler().alphas_cumprod
    h = w = res // 8
    params = {
        "unet": jax.jit(sdr_unet.init)(
            jax.random.key(0), jnp.zeros((1, 4, h, w)), jnp.array(1.0),
            jnp.zeros((1, 77, 768)),
        )["params"],
        "gm_unet": jax.jit(gm_unet.init)(
            jax.random.key(0), jnp.zeros((1, 8, h, w)), jnp.array(1.0),
            jnp.zeros((1, 77, 768)),
        )["params"],
    }
    lat = jax.random.normal(jax.random.key(1), (batch, 4, h, w))
    ctx = jax.random.normal(jax.random.key(2), (2 * batch, 77, 768))
    t = jnp.array(501, jnp.int32)

    def fn(params, latents, gm_latents, context, t):
        gs = 7.5
        lat_in = jnp.concatenate([latents, latents], axis=0)
        ctx_sdr = context
        eps = sdr_unet.apply({"params": params["unet"]}, lat_in, t, ctx_sdr)
        eps_u, eps_t = jnp.split(eps, 2, axis=0)
        eps = eps_u + gs * (eps_t - eps_u)
        a_t = acp[t]
        x0 = (latents - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
        gm_in = jnp.concatenate([x0, gm_latents], axis=1)
        gm_eps = gm_unet.apply(
            {"params": params["gm_unet"]}, gm_in, t, context[batch:]
        )
        return eps, gm_eps

    return fn, (params, lat, lat, ctx, t)


def build_vae_decode(batch: int, res: int, dtype):
    import jax
    import jax.numpy as jnp

    from gmdx.models import SD15_VAE_CONFIG, AutoencoderKL

    vae = AutoencoderKL(SD15_VAE_CONFIG, dtype=dtype)
    h = w = res // 8
    params = jax.jit(vae.init)(
        jax.random.key(0), jnp.zeros((1, 3, 64, 64)), jax.random.key(1)
    )["params"]
    lat = jax.random.normal(jax.random.key(1), (batch, 4, h, w))

    def fn(params, lat):
        return vae.apply({"params": params}, lat, method=vae.decode)

    return fn, (params, lat)


def build_train_step(batch: int, res: int, dtype):
    import jax
    import jax.numpy as jnp

    from gmdx.models import (
        AutoencoderKL,
        CLIPTextModel,
        CLIP_VIT_L_CONFIG,
        SD15_GM_UNET_CONFIG,
        SD15_VAE_CONFIG,
        UNet2DConditionModel,
    )
    from gmdx.schedulers import DDPMScheduler
    from gmdx.train import (
        Stage2Config,
        init_state,
        make_optimizer,
        make_train_step,
    )

    unet = UNet2DConditionModel(SD15_GM_UNET_CONFIG, dtype=dtype)
    vae = AutoencoderKL(SD15_VAE_CONFIG, dtype=dtype)
    text = CLIPTextModel(CLIP_VIT_L_CONFIG, dtype=dtype)
    h = w = res // 8
    unet_params = jax.jit(unet.init)(
        jax.random.key(0), jnp.zeros((1, 8, h, w)), jnp.array(1.0),
        jnp.zeros((1, 77, 768)),
    )["params"]
    frozen = {
        "vae": jax.jit(vae.init)(
            jax.random.key(1), jnp.zeros((1, 3, 64, 64)), jax.random.key(2)
        )["params"],
        "text_encoder": jax.jit(text.init)(
            jax.random.key(3), jnp.zeros((1, 77), jnp.int32)
        )["params"],
    }
    cfg = Stage2Config(use_ema=False, use_8bit_adam=True)
    opt = make_optimizer(cfg)
    state = init_state(cfg, unet_params, opt)
    step = make_train_step(
        cfg, unet=unet, vae=vae, text_encoder=text,
        noise_scheduler=DDPMScheduler(), optimizer=opt, donate=False,
    )
    batch_data = {
        "sdr": jax.random.uniform(jax.random.key(4), (batch, 3, res, res))
        * 2 - 1,
        "gm": jax.random.uniform(jax.random.key(5), (batch, 3, res, res))
        * 2 - 1,
        "input_ids": jnp.ones((batch, 77), jnp.int32),
    }

    def fn(state, frozen, batch_data, key):
        # Return the updated state too — returning only the loss lets XLA
        # dead-code-eliminate the entire backward pass + optimizer update.
        new_state, metrics = step(state, frozen, batch_data, key)
        return metrics["loss"], new_state

    return fn, (state, frozen, batch_data, jax.random.key(6))


def _build_stage1(batch: int, res: int, dtype, kind: str):
    """Stage-1 GAN hot loop at production scale (VERDICT r4 weak #7 — the
    one hot loop never profiled): SD-1.5 VAE + LoRA r=64, Paella
    discriminator (depth 6, hidden 512), VGG19 perceptual, the same stack
    the 4.43 pairs/s/chip BENCHNOTES row measured. ``kind`` selects the
    generator or discriminator step."""
    import jax
    import jax.numpy as jnp

    from gmdx.models import (
        AutoencoderKL,
        Discriminator,
        SD15_VAE_CONFIG,
        VGG19Features,
    )
    from gmdx.ops import fix_mulog_tmo
    from gmdx.train import (
        Stage1Config,
        init_trainables,
        make_adamw,
        make_disc_step,
        make_gen_step,
        get_lr_schedule,
    )
    from gmdx.train.stage1 import Stage1State

    vae = AutoencoderKL(SD15_VAE_CONFIG, dtype=dtype)
    disc = Discriminator(dtype=dtype)
    vgg = VGG19Features(dtype=dtype)
    vae_params = jax.jit(vae.init)(
        jax.random.key(0), jnp.zeros((1, 3, 64, 64)), jax.random.key(1)
    )["params"]
    disc_vars = jax.jit(disc.init)(
        jax.random.key(2), jnp.zeros((1, 3, res, res))
    )
    vgg_params = jax.jit(vgg.init)(
        jax.random.key(3), jnp.zeros((1, 3, 224, 224))
    )["params"]
    cfg = Stage1Config()
    gen_opt = make_adamw(get_lr_schedule("constant", 1e-4))
    disc_opt = make_adamw(get_lr_schedule("constant", 1e-4))
    trainables = init_trainables(jax.random.key(4), vae_params, cfg)
    state = Stage1State(
        trainables=trainables,
        disc_params=disc_vars["params"],
        disc_vars={k: v for k, v in disc_vars.items() if k != "params"},
        opt_state=gen_opt.init(trainables),
        disc_opt_state=disc_opt.init(disc_vars["params"]),
        ema=None,
        step=jnp.zeros((), jnp.int32),
    )
    if kind == "gen":
        step = make_gen_step(
            cfg, vae=vae, discriminator=disc, vgg=vgg, tmo_fn=fix_mulog_tmo,
            optimizer=gen_opt, donate=False,
        )
    else:
        step = make_disc_step(
            cfg, vae=vae, discriminator=disc, tmo_fn=fix_mulog_tmo,
            optimizer=disc_opt, donate=False,
        )
    frozen = {"vae": vae_params, "vgg": vgg_params}
    batch_data = {
        "pixel_values": jax.random.uniform(
            jax.random.key(5), (batch, 3, res, res)) * 2 - 1,
        "miss_pixel_values": jax.random.uniform(
            jax.random.key(6), (batch, 3, res, res)) * 2 - 1,
    }

    def fn(state, frozen, batch_data, key):
        new_state, metrics = step(state, frozen, batch_data, key)
        first = metrics.get("gen_loss", metrics.get("disc_loss"))
        return first, new_state  # keep bwd+optimizer live (no DCE)

    return fn, (state, frozen, batch_data, jax.random.key(7))


def build_stage1_gen(batch: int, res: int, dtype):
    return _build_stage1(batch, res, dtype, "gen")


def build_stage1_disc(batch: int, res: int, dtype):
    return _build_stage1(batch, res, dtype, "disc")


def build_unet_grad(batch: int, res: int, dtype):
    """UNet fwd+bwd only (no optimizer state — fits without donation)."""
    import jax
    import jax.numpy as jnp

    from gmdx.models import SD15_GM_UNET_CONFIG, UNet2DConditionModel

    unet = UNet2DConditionModel(SD15_GM_UNET_CONFIG, dtype=dtype)
    h = w = res // 8
    params = jax.jit(unet.init)(
        jax.random.key(0), jnp.zeros((1, 8, h, w)), jnp.array(1.0),
        jnp.zeros((1, 77, 768)),
    )["params"]
    x = jax.random.normal(jax.random.key(1), (batch, 8, h, w))
    ctx = jax.random.normal(jax.random.key(2), (batch, 77, 768))
    tgt = jax.random.normal(jax.random.key(3), (batch, 4, h, w))
    t = jnp.array(501, jnp.int32)

    def fn(params, x, t, ctx, tgt):
        def loss(p):
            eps = unet.apply({"params": p}, x, t, ctx)
            return jnp.mean((eps.astype(jnp.float32) - tgt) ** 2)

        return jax.value_and_grad(loss)(params)

    return fn, (params, x, t, ctx, tgt)


def build_dual_scan(batch: int, res: int, dtype):
    """The exact driver benchmark graph (bench.py): 50-step NHWC dual-UNet
    scan + batched decode — the real scan-path op mix, unlike dual_step's
    single NCHW step."""
    os.environ["GMDX_BENCH_BATCH"] = str(batch)
    os.environ["GMDX_BENCH_RES"] = str(res)
    import bench

    return bench.build()


WORKLOADS = {
    "gm_unet_fwd": build_gm_unet_fwd,
    "dual_step": build_dual_step,
    "dual_scan": build_dual_scan,
    "vae_decode": build_vae_decode,
    "train_step": build_train_step,
    "unet_grad": build_unet_grad,
    "stage1_gen": build_stage1_gen,
    "stage1_disc": build_stage1_disc,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", choices=sorted(WORKLOADS), default="gm_unet_fwd")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--out", default=None, help="trace dir (default: tmp)")
    ap.add_argument(
        "--category", default=None,
        help="restrict the top-ops list to one HLO category "
             "(e.g. 'data formatting', 'loop fusion')",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    dtype = jnp.dtype(args.dtype)
    fn, fargs = WORKLOADS[args.workload](args.batch, args.res, dtype)
    from gmdx.utils import sync

    # dual_scan returns bench.build()'s cached_export product, which can be
    # an already-AOT-compiled executable — re-jitting that raises (and the
    # abandoned trace can wedge the tunneled backend), so detect instead of
    # try/except: anything that isn't a plain Python callable is used as-is.
    import jax.stages

    if isinstance(fn, jax.stages.Compiled) or hasattr(fn, "in_avals"):
        jfn = fn
    else:
        jfn = jax.jit(fn)
    sync(jfn(*fargs))  # compile outside trace; true barrier (axon tunnel)

    trace_dir = args.out or tempfile.mkdtemp(prefix="gmdx_trace_")
    with jax.profiler.trace(trace_dir):
        for _ in range(args.iters):
            out = jfn(*fargs)
        sync(out)

    xplanes = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not xplanes:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    print(f"trace: {xplanes[0]}")
    report(xplanes, args.top, args.iters, args.category)


def report(xplanes, top, iters, category=None):
    """Print per-HLO-category and per-op device time from the XPlane."""
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        xplanes, "hlo_stats", {}
    )
    if isinstance(data, bytes):
        data = data.decode()
    gviz = json.loads(data)  # google-viz table: {cols: [...], rows: [...]}
    hdr = [c["label"] for c in gviz["cols"]]
    table = [[c.get("v") for c in r["c"]] for r in gviz["rows"]]
    idx = {h: i for i, h in enumerate(hdr)}

    def col(r, name, default=0.0):
        i = idx.get(name)
        return r[i] if i is not None else default

    cats = {}
    ops = []
    for r in table:
        cat = col(r, "HLO op category", "?")
        t = float(col(r, "Total self time (us)", 0.0) or 0.0)
        fw = str(col(r, "Framework op name", "") or "")
        name = str(col(r, "HLO op name", "?"))
        bound = str(col(r, "Bound by", "") or "")
        cats[cat] = cats.get(cat, 0.0) + t
        ops.append((t, cat, name, fw[-90:], bound))

    total = sum(cats.values())
    print(f"\ndevice total: {total/1e3:.2f} ms over {iters} iters "
          f"({total/1e3/iters:.2f} ms/iter)")
    print("\n== by category ==")
    for cat, t in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"{t/total*100:5.1f}%  {t/1e3:8.2f} ms  {cat}")
    if category:
        ops = [o for o in ops if o[1] == category]
        print(f"\n== top {top} '{category}' ops ==")
    else:
        print(f"\n== top {top} ops ==")
    ops.sort(key=lambda o: -o[0])
    for t, cat, name, fw, bound in ops[:top]:
        print(
            f"{t/total*100:5.1f}%  {t/1e3:8.2f} ms  [{cat}]"
            f"[{bound}] {name}  {fw}"
        )


if __name__ == "__main__":
    main()
