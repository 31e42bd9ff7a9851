"""One Stage-2 train step on a REAL 2-process JAX cluster.

`tests/test_tp.py` / `__graft_entry__.dryrun_multichip` exercise sharding on
a spoofed single-process mesh, where XLA lowers the gradient psum to local
reductions. Here the psum actually crosses a process boundary (gloo over
localhost, 4 spoofed CPU devices per process = 8 global) with
process-sharded input rows — the closest available analog of the
reference's multi-node DDP (accelerate/NCCL,
/root/reference/scripts/stage2/train_gm_unet.py:1042-1044) — and the loss
must match the same step computed on a single-process 8-device mesh.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Shared by the in-process reference and the cluster children: tiny dual-GM
# train step on an 8-device data mesh, fixed keys, deterministic batch.
STEP_BODY = textwrap.dedent(
    """
    import dataclasses

    import jax
    import jax.numpy as jnp

    from gmdx.dist import make_mesh, replicate, shard_batch
    from gmdx.models import (
        AutoencoderKL, CLIPTextModel, TINY_CLIP_CONFIG, TINY_UNET_CONFIG,
        TINY_VAE_CONFIG, UNet2DConditionModel,
    )
    from gmdx.schedulers import DDPMScheduler
    from gmdx.train import Stage2Config, init_state, make_optimizer, make_train_step


    def one_step(process_local_rows=None):
        unet = UNet2DConditionModel(
            dataclasses.replace(TINY_UNET_CONFIG, in_channels=8)
        )
        vae = AutoencoderKL(TINY_VAE_CONFIG)
        text = CLIPTextModel(TINY_CLIP_CONFIG)
        unet_params = unet.init(
            jax.random.key(0), jnp.zeros((1, 8, 8, 8)), jnp.array(1.0),
            jnp.zeros((1, 77, 32)),
        )["params"]
        frozen = {
            "vae": vae.init(
                jax.random.key(1), jnp.zeros((1, 3, 16, 16)), jax.random.key(2)
            )["params"],
            "text_encoder": text.init(
                jax.random.key(3), jnp.zeros((1, 77), jnp.int32)
            )["params"],
        }
        cfg = Stage2Config(use_ema=True)
        opt = make_optimizer(cfg)
        state = init_state(cfg, unet_params, opt)
        step = make_train_step(
            cfg, unet=unet, vae=vae, text_encoder=text,
            noise_scheduler=DDPMScheduler(), optimizer=opt,
        )
        batch = {
            "sdr": jax.random.uniform(jax.random.key(4), (8, 3, 16, 16)) * 2 - 1,
            "gm": jax.random.uniform(jax.random.key(5), (8, 3, 16, 16)) * 2 - 1,
            "input_ids": jnp.ones((8, 77), jnp.int32),
        }
        batch = jax.device_get(batch)  # host rows, sliceable per process
        mesh = make_mesh(8)
        # Align BEFORE the first cross-process device_put: jax asserts
        # sharding consistency over gloo there, and gloo context init only
        # waits ~30 s for the peer — less than the skew two cold-compiling
        # children accumulate on a shared core (coordination_barrier no-ops
        # single-process).
        from gmdx.dist import coordination_barrier
        coordination_barrier("pre_collective")
        if process_local_rows is not None:
            lo, hi = process_local_rows
            local = {k: v[lo:hi] for k, v in batch.items()}
            dev_batch = shard_batch(mesh, local, process_local=True)
        else:
            dev_batch = shard_batch(mesh, batch)
        state = replicate(mesh, jax.device_get(state))
        _, metrics = step(
            state, replicate(mesh, frozen), dev_batch, jax.random.key(6)
        )
        return float(metrics["loss"])
    """
)

CHILD = (
    textwrap.dedent(
        """
    import os, sys
    proc_id = int(sys.argv[1]); port = sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=2, process_id=proc_id
    )
    assert jax.device_count() == 8
    from gmdx.utils import enable_compilation_cache
    enable_compilation_cache()
    """
    )
    + STEP_BODY
    + textwrap.dedent(
        """
    loss = one_step(process_local_rows=(4 * proc_id, 4 * proc_id + 4))
    print(f"proc {proc_id} loss {loss:.8f} OK", flush=True)
    """
    )
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_train_step_on_real_process_group(tmp_path):
    if len(__import__("jax").devices()) < 8:
        pytest.skip("needs the conftest's 8-device CPU mesh")

    # Reference loss on the single-process 8-device mesh (conftest env).
    ns: dict = {}
    exec(STEP_BODY, ns)  # noqa: S102 — our own literal above
    ref_loss = ns["one_step"]()

    script = tmp_path / "child.py"
    script.write_text(CHILD)
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")
    }
    env["PYTHONPATH"] = REPO
    # File-backed stdout, drained by the OS: with PIPE, the first
    # child to fill its 64 KB pipe buffer BLOCKS mid-collective while
    # the parent communicate()s with its sibling -> distributed
    # deadlock -> TimeoutExpired. Files make log volume irrelevant.
    logs = [open(script.parent / f"child{i}.log", "w+") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port)],
            env=env, stdout=logs[i], stderr=subprocess.STDOUT,
            text=True, cwd=REPO,
        )
        for i in range(2)
    ]
    for p in procs:
        p.wait(timeout=1200)
    outs = []
    for f in logs:
        f.seek(0)
        outs.append(f.read())
        f.close()
    losses = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        line = [l for l in out.splitlines() if f"proc {i} loss" in l]
        assert line, out[-2000:]
        losses.append(float(line[0].split("loss")[1].split("OK")[0]))
    # Both hosts see the identical (psum'd) loss, and it matches the
    # single-process mesh: the process boundary changes no math.
    assert losses[0] == losses[1], losses
    np.testing.assert_allclose(losses[0], ref_loss, rtol=2e-5)
