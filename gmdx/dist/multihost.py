"""Multi-host process-group utilities.

The reference's process model is HF Accelerate over torch.distributed/NCCL:
process-group init, ``main_process_first`` for dataset prep,
``wait_for_everyone`` barriers, gathered loss logging (SURVEY.md §5.8). The
TPU-native mapping: ``jax.distributed.initialize()`` joins the hosts of a
pod slice (ICI inside a slice, DCN across), the global mesh spans
``jax.devices()``, and the barrier/broadcast patterns come from
``jax.experimental.multihost_utils``. Gradient/loss reductions need nothing
here — they are psums XLA already inserts inside the jitted step.
"""

from __future__ import annotations

import contextlib
import logging
from typing import Optional

import jax

logger = logging.getLogger("gmdx.dist")


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Join the jax multi-host process group.

    No-ops (returns False) when single-process — safe to call
    unconditionally from the CLIs. TPU pod environments autodetect all
    arguments; explicit values are for DCN/GPU-style bring-up.
    """
    # NOTE: do NOT touch jax.process_count()/devices() before initialize() —
    # any backend-initializing call makes jax.distributed.initialize() raise
    # unconditionally and every host would silently run single-host.
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return True  # already joined (e.g. by the launcher)
    try:
        if coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        else:
            jax.distributed.initialize()
        logger.info(
            "jax.distributed: process %d/%d, %d local / %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )
    except Exception as e:
        # Single-host runs land here (no coordinator in the environment) —
        # that is normal. A backend-already-initialized error is NOT normal:
        # it means initialize() was called too late and a real multi-host
        # job would split into disjoint single-host jobs; surface it loudly.
        msg = str(e)
        if "initialise" in msg or "initialized" in msg:
            logger.warning(
                "jax.distributed.initialize failed because the XLA backend "
                "was already initialized — call gmdx.dist.initialize() "
                "before any other JAX use: %s", e,
            )
        else:
            logger.debug("jax.distributed.initialize skipped: %s", e)
        return False
    # Align hosts BEFORE anyone reaches a device collective: gloo/ICI
    # context init only tolerates ~30 s of peer skew, far less than a
    # cold-cache compile (see coordination_barrier). Deliberately OUTSIDE
    # the try above: distributed init has already succeeded at this point,
    # so a barrier failure must not be mislabeled "initialize skipped" —
    # that would hide the very DEADLINE_EXCEEDED this call exists to
    # prevent while the process IS joined to the group.
    try:
        coordination_barrier("gmdx_post_init")
    except Exception as e:
        logger.warning(
            "gmdx post-init coordination barrier failed (hosts may be "
            "desynchronized entering their first collective): %s", e,
        )
    return True


def is_main_process() -> bool:
    return jax.process_index() == 0


def barrier(name: str = "gmdx") -> None:
    """Block until every host arrives (accelerate wait_for_everyone)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def coordination_barrier(
    name: str = "gmdx_init", timeout_ms: int = 600_000
) -> None:
    """Barrier on the coordination service (NOT a device collective).

    The device-collective barrier above rides gloo/ICI, whose CONTEXT
    INITIALIZATION has a hard ~30 s peer-rendezvous window — a host that
    reaches its first collective while a peer is still compiling (minutes,
    cold cache, shared cores) gets `Gloo context initialization failed:
    DEADLINE_EXCEEDED`. Call this right after ``initialize()`` (and before
    the first cross-process device_put/psum): the coordination service
    tolerates ``timeout_ms`` of skew, so all hosts enter the gloo
    rendezvous together. No-op in single-process runs."""
    if jax.process_count() == 1:
        return
    from jax._src import distributed

    client = getattr(distributed.global_state, "client", None)
    if client is None:
        return
    client.wait_at_barrier(name, timeout_in_ms=timeout_ms)


@contextlib.contextmanager
def main_process_first(name: str = "gmdx_mpf"):
    """Main host runs the body before the others proceed (the reference's
    dataset-prep gate, train_gm_unet.py:988)."""
    if jax.process_count() == 1:
        yield
        return
    if is_main_process():
        yield
        barrier(name)
    else:
        barrier(name)
        yield


def broadcast_from_main(tree):
    """Replicate a host-local pytree from process 0 to all hosts."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)


__all__ = [
    "initialize",
    "is_main_process",
    "barrier",
    "coordination_barrier",
    "main_process_first",
    "broadcast_from_main",
]
