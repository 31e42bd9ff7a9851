"""Parquet dataset + threaded prefetching dataloader.

Schema parity with the reference's Stage-2 metadata (train_gm_unet.py:
917-982): columns ``sdr`` (image path on disk), ``gainmap`` (encoded image
bytes), ``text`` (caption). NOTE the reference README documents a column
named ``image`` but the code reads ``sdr`` — the code wins (SURVEY.md §7.3).

The loader is host-side numpy end to end: decode + paired transform + CLIP
tokenization per worker thread, stacked into device-ready batches sized for
the global (mesh-wide) batch so a sharded device_put needs no reshaping.
"""

from __future__ import annotations

import io
import os
import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np
import pyarrow.parquet as pq
from PIL import Image

from gmdx.data.transforms import preprocess_pair


class ParquetImageDataset:
    """Random-access view over one or more parquet files."""

    def __init__(self, data_files: str | Sequence[str]):
        if isinstance(data_files, str):
            data_files = [data_files]
        tables = [pq.read_table(f) for f in data_files]
        import pyarrow as pa

        self.table = pa.concat_tables(tables) if len(tables) > 1 else tables[0]
        cols = set(self.table.column_names)
        missing = {"sdr", "gainmap", "text"} - cols
        if missing:
            raise ValueError(
                f"parquet missing columns {sorted(missing)}; has {sorted(cols)}"
            )

    def __len__(self) -> int:
        return self.table.num_rows

    def __getitem__(self, idx: int) -> Dict:
        row = self.table.slice(idx, 1).to_pylist()[0]
        return row

    def load_pair(self, idx: int):
        row = self[idx]
        sdr = Image.open(row["sdr"])
        gm = Image.open(io.BytesIO(row["gainmap"]))
        return sdr, gm, row["text"]

    def load_pair_bytes(self, idx: int):
        """Raw encoded bytes (native decode path)."""
        row = self[idx]
        with open(row["sdr"], "rb") as f:
            sdr = f.read()
        return sdr, row["gainmap"], row["text"]


def make_dataloader(
    dataset: ParquetImageDataset,
    tokenizer,
    *,
    batch_size: int,
    resolution: int = 512,
    center_crop: bool = False,
    random_flip: bool = False,
    shuffle: bool = True,
    seed: int = 0,
    num_epochs: Optional[int] = None,
    num_workers: int = 4,
    max_samples: Optional[int] = None,
    use_native: bool = True,
    process_shard: bool = False,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
    skip_batches: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yields batches: pixel_values / gainmap_values (B, 3, R, R) float32 in
    [-1, 1], input_ids / attention_mask (B, 77) int32. Drops the last ragged
    batch (static shapes for jit).

    ``use_native`` routes decode+preprocess through the C++ thread pool
    (native/imagedec.cpp, ``num_workers`` threads); crop/flip draws use the
    same per-batch Generator calls in the same order as the PIL path, so the
    two paths produce the same batches (up to resize rounding).

    ``process_shard``: multi-host input sharding. ``batch_size`` stays the
    GLOBAL batch; each host decodes and yields only its own contiguous
    ``batch_size / process_count`` rows of it (the shuffled order is
    seed-derived, so all hosts agree on the global order without
    communicating). Feed the result through
    ``shard_batch(..., process_local=True)`` /
    ``device_prefetch(..., process_local=True)`` — this keeps per-host
    decode O(local batch) where the default path is O(global batch).
    ``process_index``/``process_count`` override jax's (for tests).
    Augmentation draws are seeded per (batch, process), so sharded runs are
    deterministic but not draw-for-draw identical to single-host runs.

    ``skip_batches``: deterministic resume fast-forward — skip the first N
    batches WITHOUT decoding them (the per-epoch shuffle order and the
    per-batch augmentation seeds are index-derived, so the stream after the
    skip is bit-identical to an uninterrupted run's). The trainers pass the
    number of batches a resumed checkpoint already consumed; the reference
    only resumes at epoch granularity (train_gm_unet.py:1122-1129) and
    re-consumes the partial epoch.
    """

    n = len(dataset) if max_samples is None else min(max_samples, len(dataset))
    if n < batch_size:
        raise ValueError(f"dataset ({n}) smaller than batch size ({batch_size})")

    pi, pc = 0, 1
    if process_shard:
        if process_index is None or process_count is None:
            import jax

            pi = jax.process_index() if process_index is None else process_index
            pc = jax.process_count() if process_count is None else process_count
        else:
            pi, pc = process_index, process_count
        if batch_size % pc:
            raise ValueError(
                f"process_shard needs process_count ({pc}) to divide the "
                f"global batch size ({batch_size})"
            )

    def sample(idx: int, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        sdr, gm, text = dataset.load_pair(idx)
        pv, gv = preprocess_pair(
            sdr, gm, resolution, center_crop=center_crop,
            random_flip=random_flip, rng=rng,
        )
        tok = tokenizer(text)
        return {
            "pixel_values": pv,
            "gainmap_values": gv,
            "input_ids": tok["input_ids"][0],
            "attention_mask": tok["attention_mask"][0],
        }

    def native_batch(idxs, rng: np.random.Generator) -> Optional[Dict[str, np.ndarray]]:
        """One C++ thread-pool call per image column; None -> PIL fallback."""
        from gmdx import native as gmdx_native
        from gmdx.data.transforms import resized_dims

        if gmdx_native.lib() is None:
            return None
        sdr_blobs, gm_blobs, texts = [], [], []
        tops, lefts, flips = [], [], []
        for i in idxs:
            sdr_b, gm_b, text = dataset.load_pair_bytes(int(i))
            sdr_dims = gmdx_native.probe_image_native(sdr_b)
            gm_dims = gmdx_native.probe_image_native(gm_b)
            if sdr_dims is None or gm_dims is None:
                return None  # unsupported codec: let PIL handle the batch
            rw, rh = resized_dims(*sdr_dims, resolution)
            if resized_dims(*gm_dims, resolution) != (rw, rh):
                raise ValueError(
                    f"paired images disagree on shape after resize: "
                    f"sdr {sdr_dims} vs gm {gm_dims}"
                )
            if rh < resolution or rw < resolution:
                raise ValueError(
                    f"image {rh}x{rw} smaller than crop {resolution}"
                )
            # Same draws in the same order as preprocess_pair for parity.
            if center_crop:
                top, left = -1, -1
            else:
                top = int(rng.integers(0, rh - resolution + 1))
                left = int(rng.integers(0, rw - resolution + 1))
            flip = bool(random_flip and rng.random() < 0.5)
            sdr_blobs.append(sdr_b)
            gm_blobs.append(gm_b)
            texts.append(text)
            tops.append(top)
            lefts.append(left)
            flips.append(flip)
        # One thread-pool invocation for both columns: crop/flip draws are
        # shared per pair, and a single 2n-item call avoids a second pool
        # spawn/join and lets the gm decodes overlap sdr stragglers.
        nt = min(num_workers, os.cpu_count() or 1)
        both = gmdx_native.preprocess_batch_native(
            sdr_blobs + gm_blobs, resolution,
            tops + tops, lefts + lefts, flips + flips, n_threads=nt,
        )
        if both is None:
            return None
        pv, gv = both[: len(idxs)], both[len(idxs):]
        toks = [tokenizer(t) for t in texts]
        return {
            "pixel_values": pv,
            "gainmap_values": gv,
            "input_ids": np.stack([t["input_ids"][0] for t in toks]),
            "attention_mask": np.stack([t["attention_mask"][0] for t in toks]),
        }

    def epochs() -> Iterator[np.ndarray]:
        epoch = 0
        while num_epochs is None or epoch < num_epochs:
            order = np.arange(n)
            if shuffle:
                np.random.default_rng(seed + epoch).shuffle(order)
            yield epoch, order
            epoch += 1

    def producer(out_q: "queue.Queue"):
        # A producer failure (missing file, corrupt image bytes) must reach
        # the training loop as an exception — a bare end-sentinel would make
        # a mid-run crash look like normal dataset completion.
        try:
            remaining_skip = skip_batches
            for epoch, order in epochs():
                for start in range(0, n - batch_size + 1, batch_size):
                    if remaining_skip > 0:
                        # Resume fast-forward: no decode, no augmentation
                        # draws — seeds are (seed, epoch, start)-derived, so
                        # skipping consumes nothing that later batches need.
                        remaining_skip -= 1
                        continue
                    idxs = order[start : start + batch_size]
                    seed_key = (
                        (seed, epoch, start, pi) if pc > 1
                        else (seed, epoch, start)
                    )
                    rng = np.random.default_rng(seed_key)
                    if pc > 1:
                        local = batch_size // pc
                        idxs = idxs[pi * local : (pi + 1) * local]
                    batch = None
                    if use_native and os.environ.get("GMDX_NO_NATIVE") != "1":
                        batch = native_batch(idxs, rng)
                        if batch is None:  # re-seed: draws must match fresh
                            rng = np.random.default_rng(seed_key)
                    if batch is None:
                        items = [sample(int(i), rng) for i in idxs]
                        batch = {
                            k: np.stack([it[k] for it in items])
                            for k in items[0]
                        }
                    out_q.put(batch)
        except BaseException as e:  # noqa: BLE001 — forwarded to consumer
            out_q.put(e)
        else:
            out_q.put(None)

    q: "queue.Queue" = queue.Queue(maxsize=max(2, num_workers))
    t = threading.Thread(target=producer, args=(q,), daemon=True)
    t.start()

    def gen():
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item

    return gen()


def write_parquet_dataset(
    path: str,
    sdr_paths: List[str],
    gainmap_bytes: List[bytes],
    texts: List[str],
) -> None:
    """Write a reference-schema parquet file (used by tests and data prep)."""
    import pyarrow as pa

    table = pa.table(
        {"sdr": sdr_paths, "gainmap": gainmap_bytes, "text": texts}
    )
    pq.write_table(table, path)


__all__ = ["ParquetImageDataset", "make_dataloader", "write_parquet_dataset"]
