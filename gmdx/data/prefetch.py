"""Device prefetch: overlap host->device transfer with the running step.

The training loops call ``shard_batch`` synchronously per step; on a real
pod the H2D copy of a 512² global batch sits on the critical path. This
wrapper device_puts ``depth`` batches ahead on a background thread — jax
transfers are async, so the copy of batch i+1 overlaps the compute of
batch i and the step dequeues an already-resident batch.

The reference has no analog (its DataLoader stops at host pinned memory and
torch moves tensors inside the step); this is the TPU-native equivalent of
an input pipeline's device-side double buffer.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

from gmdx.dist.mesh import shard_batch, shard_batch_spatial


def device_prefetch(
    loader,
    mesh,
    depth: int = 2,
    axis: str = "data",
    spatial: bool = False,
    process_local: bool = False,
) -> Iterator:
    """Wrap a host-batch iterator; yields device-sharded batches.

    ``depth`` bounds how many batches may be resident ahead of the consumer
    (device memory = depth x batch bytes). Exceptions from the underlying
    loader are re-raised at the consumer. ``spatial=True`` places image
    leaves batch+H sharded (``shard_batch_spatial``) for ``--shard_strategy
    sp`` instead of batch-only. ``process_local=True`` marks the loader as
    yielding only this host's rows (a ``process_shard`` dataloader) —
    assembled into the global array via
    ``jax.make_array_from_process_local_data`` instead of device_put.
    """
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()
    stop = threading.Event()

    def put(item) -> bool:
        """Blocking put that aborts when the consumer is gone — trainers
        always exit their loop via break (the loader cycles forever), and
        without this the producer would sit in q.put holding depth extra
        device batches in HBM for the rest of the process."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    place = (
        (lambda b: shard_batch_spatial(mesh, b)) if spatial
        else (lambda b: shard_batch(mesh, b, axis, process_local=process_local))
    )

    def producer():
        try:
            for batch in loader:
                if not put(place(batch)):
                    return
        except BaseException as e:  # noqa: BLE001 — forwarded to consumer
            put(e)
        else:
            put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()

    def gen():
        try:
            while True:
                item = q.get()
                if item is _END:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()  # unblock + terminate the producer on early exit
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass

    return gen()


__all__ = ["device_prefetch"]
