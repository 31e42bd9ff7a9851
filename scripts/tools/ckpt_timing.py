"""Measure Stage-2 checkpoint save/restore wall times through the tunnel.

VERDICT r4 item 7 asks for full-SD-scale save/restore numbers. The binding
constraint is the dev tunnel's device->host bandwidth (BENCHNOTES r3:
~5 MB/s), so this harness (a) measures that rate directly, (b) times a
sync save, an async save (train-loop blocking portion vs total), and a
restore at ``--width`` (UNet params + Adam mu/nu + EMA, the Stage-2 state
shape — scripts/stage2/train_gm_unet.py state layout), and (c) prints the
width->bytes extrapolation so the full-width cost on real TPU-VM-local
disk (GB/s NVMe, no tunnel) can be read off the same table.

Usage: python scripts/tools/ckpt_timing.py [--width 0.3] [--res 64]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import shutil
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=float, default=0.3)
    ap.add_argument("--out", default="/tmp/gmdx_ckpt_timing")
    ap.add_argument("--steps-during-save", type=int, default=0,
                    help="dispatch N dummy device matmuls while the async "
                    "write streams, to show the loop keeps running")
    ap.add_argument("--with-ema", action="store_true",
                    help="include an EMA shadow in the state (a third "
                    "param-sized tree; at width 1.0 params+opt+EMA+save "
                    "machinery exceed 16 GB HBM — full-width runs offload "
                    "EMA to host, reference --offload_ema)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from gmdx.models import SD15_GM_UNET_CONFIG, UNet2DConditionModel
    from gmdx.train.checkpoint import make_manager, restore_state, save_state
    from gmdx.utils import enable_compilation_cache

    enable_compilation_cache()

    # Raw device->host rate: one 256 MB device buffer fetched to numpy.
    probe = jax.device_put(jnp.zeros((64, 1024, 1024), jnp.float32))
    jax.block_until_ready(probe)
    t0 = time.perf_counter()
    np.asarray(probe)
    d2h = 256 / (time.perf_counter() - t0)
    print(f"device->host: {d2h:.1f} MB/s (256 MB probe)", flush=True)

    full = (320, 640, 1280, 1280)
    widths = tuple(
        max(32, int(round(c * args.width / 32)) * 32) for c in full
    )
    cfg = dataclasses.replace(SD15_GM_UNET_CONFIG, block_out_channels=widths)
    unet = UNet2DConditionModel(cfg)
    params = jax.jit(unet.init)(
        jax.random.key(0), jnp.zeros((1, 8, 32, 32)), jnp.array(1.0),
        jnp.zeros((1, 77, 768)),
    )["params"]
    opt_state = optax.adamw(1e-4).init(params)
    state = {"params": params, "opt_state": opt_state}
    if args.with_ema:
        state["ema"] = jax.tree.map(jnp.copy, params)
    nbytes = sum(
        x.nbytes for x in jax.tree.leaves(state) if hasattr(x, "nbytes")
    )
    mb = nbytes / 2**20
    print(f"state at width {args.width:g}: {mb:.0f} MB "
          f"(full-width extrapolation: {mb / args.width**2 / 1024:.1f} GB; "
          f"~{mb / args.width**2 / d2h / 60:.1f} min through this tunnel, "
          f"disk-local TPU-VM hosts skip the tunnel entirely)", flush=True)

    for mode in ("sync", "async"):
        out = os.path.join(args.out, mode)
        shutil.rmtree(out, ignore_errors=True)
        mgr = make_manager(out, async_checkpointing=(mode == "async"))
        t0 = time.perf_counter()
        save_state(mgr, 1, state, wait=(mode == "sync"))
        t_block = time.perf_counter() - t0
        mgr.wait_until_finished()
        t_total = time.perf_counter() - t0
        print(f"{mode} save: blocks train loop {t_block:.1f} s, "
              f"durable at {t_total:.1f} s "
              f"({mb / t_total:.1f} MB/s effective)", flush=True)

    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state
    )
    # Free the live copy before restoring — at full width the state is
    # ~13 GB and two copies exceed HBM (measured OOM at device_put).
    ref = np.asarray(jax.tree.leaves(state)[0])
    jax.tree.map(
        lambda x: x.delete() if hasattr(x, "delete") else None, state
    )
    del state, params, opt_state
    t0 = time.perf_counter()
    restored = restore_state(mgr, 1, abstract)
    jax.block_until_ready(restored)
    t_restore = time.perf_counter() - t0
    print(f"restore: {t_restore:.1f} s ({mb / t_restore:.1f} MB/s)",
          flush=True)
    leaf = jax.tree.leaves(restored)[0]
    assert np.allclose(np.asarray(leaf), ref)
    print("restore round-trip verified", flush=True)


if __name__ == "__main__":
    main()
