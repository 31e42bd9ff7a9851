"""Multi-host input pipeline: process-sharded loading on a REAL 2-process
JAX cluster (gloo collectives over localhost), 4 spoofed CPU devices per
process = 8 global.

The reference's multi-GPU input path is accelerate's per-process
DataLoader split; gmdx's TPU-native equivalent is seed-derived global
order + per-host row slices (``make_dataloader(process_shard=True)``)
assembled zero-copy into the global array with
``jax.make_array_from_process_local_data``
(``shard_batch(process_local=True)``). This test pins that the assembled
global batch equals the single-process loader's batch, row for row.
"""

import io
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = textwrap.dedent(
    """
    import os, sys
    proc_id = int(sys.argv[1]); port = sys.argv[2]; meta = sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=2, process_id=proc_id
    )
    assert jax.process_count() == 2 and jax.device_count() == 8
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gmdx.data import make_dataloader
    from gmdx.data.parquet import ParquetImageDataset
    from gmdx.dist import make_mesh, shard_batch
    from gmdx.models import CLIPTokenizer

    ds = ParquetImageDataset(meta)
    tok = CLIPTokenizer.tiny()
    kw = dict(
        batch_size=8, resolution=32, center_crop=True, random_flip=False,
        seed=3, num_epochs=1, num_workers=2,
    )
    local = next(iter(make_dataloader(ds, tok, process_shard=True, **kw)))
    assert local["pixel_values"].shape[0] == 4, local["pixel_values"].shape

    mesh = make_mesh(8)
    dev = shard_batch(mesh, local, process_local=True)
    assert dev["pixel_values"].shape == (8, 3, 32, 32)

    # Gather the assembled global batch back and compare to the
    # single-process loader's batch (identical seed => identical order;
    # center_crop + no flip => no augmentation draws to diverge on).
    pull = jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))
    got = np.asarray(pull(dev["pixel_values"]))
    ref = next(iter(make_dataloader(ds, tok, **kw)))["pixel_values"]
    np.testing.assert_array_equal(got, ref)
    ids = np.asarray(pull(dev["input_ids"]))
    np.testing.assert_array_equal(
        ids, next(iter(make_dataloader(ds, tok, **kw)))["input_ids"]
    )
    print(f"proc {proc_id} OK", flush=True)
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def tiny_parquet(tmp_path_factory):
    from PIL import Image

    from gmdx.data.parquet import write_parquet_dataset

    root = tmp_path_factory.mktemp("mh")
    rng = np.random.default_rng(0)
    sdr_paths, gm_bytes, texts = [], [], []
    for i in range(16):
        img = Image.fromarray(
            rng.integers(0, 255, (32, 32, 3), dtype=np.uint8), "RGB"
        )
        p = str(root / f"sdr_{i}.png")
        img.save(p)
        buf = io.BytesIO()
        Image.fromarray(
            rng.integers(0, 255, (32, 32, 3), dtype=np.uint8), "RGB"
        ).save(buf, format="PNG")
        sdr_paths.append(p)
        gm_bytes.append(buf.getvalue())
        texts.append(f"caption {i}")
    meta = str(root / "train.parquet")
    write_parquet_dataset(meta, sdr_paths, gm_bytes, texts)
    return meta


def test_process_sharded_loader_matches_global(tiny_parquet, tmp_path):
    script = tmp_path / "child.py"
    script.write_text(CHILD)
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        # Drop ambient accelerator plugins (sitecustomize) — the children
        # must come up pure-CPU; they only need the repo on the path.
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
            [sys.executable, str(script), str(i), str(port), tiny_parquet],
            env=env,
            stdout=logs[i],
            stderr=subprocess.STDOUT,
            text=True,
            cwd=REPO,
        )
        for i in range(2)
    ]
    for p in procs:
        p.wait(timeout=600)
    outs = []
    for f in logs:
        f.seek(0)
        outs.append(f.read())
        f.close()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"proc {i} OK" in out


def test_process_shard_single_process_is_identity(tiny_parquet):
    """pc=1 (or explicit override) must yield the unsliced global batch."""
    from gmdx.data import make_dataloader
    from gmdx.data.parquet import ParquetImageDataset
    from gmdx.models import CLIPTokenizer

    ds = ParquetImageDataset(tiny_parquet)
    tok = CLIPTokenizer.tiny()
    kw = dict(
        batch_size=4, resolution=32, center_crop=True, random_flip=False,
        seed=1, num_epochs=1, num_workers=1,
    )
    ref = next(iter(make_dataloader(ds, tok, **kw)))
    # Explicit 2-way override: the two halves tile the global batch.
    lo = next(iter(make_dataloader(
        ds, tok, process_shard=True, process_index=0, process_count=2, **kw
    )))
    hi = next(iter(make_dataloader(
        ds, tok, process_shard=True, process_index=1, process_count=2, **kw
    )))
    np.testing.assert_array_equal(
        np.concatenate([lo["pixel_values"], hi["pixel_values"]]),
        ref["pixel_values"],
    )
    np.testing.assert_array_equal(
        np.concatenate([lo["input_ids"], hi["input_ids"]]), ref["input_ids"]
    )


def test_process_shard_rejects_indivisible(tiny_parquet):
    from gmdx.data import make_dataloader
    from gmdx.data.parquet import ParquetImageDataset
    from gmdx.models import CLIPTokenizer

    ds = ParquetImageDataset(tiny_parquet)
    with pytest.raises(ValueError, match="divide"):
        make_dataloader(
            ds, CLIPTokenizer.tiny(), batch_size=5, resolution=32,
            process_shard=True, process_index=0, process_count=2,
        )
