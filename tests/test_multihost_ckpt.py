"""Multi-host orbax checkpointing + cross-process spatial halos, on a REAL
2-process JAX cluster (gloo over localhost, 4 spoofed CPU devices each).

Two properties no single-process mesh can pin:
  * orbax save/restore of a zero1-SHARDED train state where each process
    owns disjoint shards — both hosts must coordinate one atomic
    checkpoint and restore bit-identical values (reference analog:
    accelerate save_state/load_state on every rank, SURVEY.md §5.4);
  * a spatially H-sharded UNet forward on a (1, 8) mesh whose ``model``
    axis SPANS the process boundary — the 3x3 conv halo exchanges cross
    DCN, and the result must equal the replicated forward.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = textwrap.dedent(
    """
    import os, sys
    proc_id = int(sys.argv[1]); port = sys.argv[2]; ckdir = sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=2, process_id=proc_id
    )
    assert jax.device_count() == 8
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gmdx.dist import make_mesh, replicate, spatial_sharding, zero1_shard
    from gmdx.models import TINY_UNET_CONFIG, UNet2DConditionModel
    from gmdx.train.checkpoint import make_manager, restore_state, save_state
    from gmdx.utils import enable_compilation_cache

    enable_compilation_cache()
    mesh = make_mesh(8)

    # --- 1. zero1-sharded orbax roundtrip across the process group ---
    state = {
        "mu": np.arange(64, dtype=np.float32).reshape(8, 8),
        "nu": np.arange(24, dtype=np.float32).reshape(8, 3) * 3.0,
        "step": np.int32(7),
    }
    sharded = zero1_shard(mesh, state)
    assert not sharded["mu"].sharding.is_fully_replicated
    mgr = make_manager(ckdir)
    save_state(mgr, 7, sharded)
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
        sharded,
    )
    back = restore_state(make_manager(ckdir), 7, abstract)
    pull = jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))
    for k in ("mu", "nu"):
        np.testing.assert_array_equal(np.asarray(pull(back[k])), state[k])
    assert int(back["step"]) == 7
    print(f"proc {proc_id} ckpt OK", flush=True)

    # --- 2. spatial halos across the process boundary ---
    unet = UNet2DConditionModel(TINY_UNET_CONFIG)
    params = unet.init(
        jax.random.key(0), jnp.zeros((1, 4, 8, 8)), jnp.array(1.0),
        jnp.zeros((1, 77, 32)),
    )["params"]
    x = jax.random.normal(jax.random.key(1), (1, 4, 8, 8), jnp.float32)
    ctx = jax.random.normal(jax.random.key(2), (1, 77, 32), jnp.float32)
    fwd = jax.jit(
        lambda p, a, c: unet.apply({"params": p}, a, jnp.array(5.0), c),
        out_shardings=NamedSharding(mesh, P()),
    )
    params = replicate(mesh, jax.device_get(params))
    ref = np.asarray(fwd(params, replicate(mesh, x), replicate(mesh, ctx)))
    # (1, 8) mesh: the model axis spans both processes; H=8 rows land one
    # per device, so every 3x3 conv halo crosses a device (and at row 3->4
    # a PROCESS) boundary.
    smesh = make_mesh(8, ("data", "model"), shape=(1, 8))
    xs = jax.device_put(x, spatial_sharding(smesh, 4))
    out = np.asarray(fwd(params, xs, replicate(mesh, ctx)))
    np.testing.assert_allclose(out, ref, rtol=3e-5, atol=3e-5)
    print(f"proc {proc_id} halo OK", flush=True)
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_multihost_ckpt_and_spatial_halos(tmp_path):
    script = tmp_path / "child.py"
    script.write_text(CHILD)
    ckdir = str(tmp_path / "ckpt")
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
            [sys.executable, str(script), str(i), str(port), ckdir],
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
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"proc {i} ckpt OK" in out
        assert f"proc {i} halo OK" in out
