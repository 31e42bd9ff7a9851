"""Profiling + step timing.

The reference's only instrumentation is an ``AverageMeter`` wall-clock pair
(batch/data time) deriving samples/sec (train_vqgan_lora.py:71-87,
1231-1241 — SURVEY.md §5.1: "no torch profiler, no NVTX, no traces"). Here:

  * ``AverageMeter`` — same rolling-average surface for drop-in parity.
  * ``StepTimer`` — data/compute split + samples/sec in one object.
  * ``trace(log_dir)`` — context manager around ``jax.profiler`` producing
    XPlane traces viewable in TensorBoard/Perfetto (device + host timelines,
    XLA op breakdown — the TPU-native answer to nsys/NVTX).
  * ``annotate(name)`` — named host span nested inside the trace.
  * ``device_memory_stats()`` — live HBM usage per device.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


class AverageMeter:
    """Running average (reference train_vqgan_lora.py:71-87 surface)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class StepTimer:
    """Data-wait vs step-compute timing with samples/sec.

    Usage per iteration::

        timer.mark_data()    # after the batch is fetched
        ... run the step ...
        timer.mark_step(batch_size)
    """

    def __init__(self):
        self.data_time = AverageMeter()
        self.batch_time = AverageMeter()
        self._t = time.perf_counter()
        self._samples = 0
        self._t0 = self._t

    def mark_data(self):
        now = time.perf_counter()
        self.data_time.update(now - self._t)
        self._t = now

    def mark_step(self, batch_size: int):
        now = time.perf_counter()
        self.batch_time.update(now - self._t)
        self._t = now
        self._samples += batch_size

    @property
    def samples_per_sec(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._samples / dt if dt > 0 else 0.0

    def scalars(self) -> Dict[str, float]:
        return {
            "data_time": self.data_time.avg,
            "batch_time": self.batch_time.avg,
            "samples_per_sec": self.samples_per_sec,
        }


@contextlib.contextmanager
def trace(log_dir: str, *, host_tracer_level: int = 2):
    """Capture a jax.profiler trace (TensorBoard `profile` plugin /
    Perfetto). Wrap a handful of steady-state steps, not the compile."""
    import jax

    jax.profiler.start_trace(log_dir, create_perfetto_trace=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named host span nested in the active trace."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


def sync(tree):
    """True device barrier: block until every array in ``tree`` is computed.

    On some remote/tunneled backends (observed on the experimental ``axon``
    platform) ``jax.block_until_ready`` can return before the first dispatch
    of a freshly loaded executable has actually finished — which silently
    breaks wall-clock timing (bench.py once measured a 50-step 512² pipeline
    at 2 ms). A device→host read of a value *derived from* each output cannot
    complete before the producing computation does, so after the ordinary
    ``block_until_ready`` this fetches one element of every array leaf back
    to the host (a few bytes per leaf — negligible vs any workload worth
    timing). Returns ``tree`` unchanged so it can wrap a call inline.
    """
    import jax

    leaves = [l for l in jax.tree_util.tree_leaves(tree) if hasattr(l, "dtype")]
    jax.block_until_ready(leaves)
    for leaf in leaves:
        if leaf.size:
            jax.device_get(leaf.ravel()[:1])
    return tree


def device_memory_stats() -> List[Optional[Dict[str, int]]]:
    """Per-device live HBM stats (bytes_in_use / peak / limit) where the
    backend exposes them; None entries otherwise."""
    import jax

    out = []
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
            out.append(
                {
                    "bytes_in_use": s.get("bytes_in_use", 0),
                    "peak_bytes_in_use": s.get("peak_bytes_in_use", 0),
                    "bytes_limit": s.get("bytes_limit", 0),
                }
            )
        except Exception:
            out.append(None)
    return out


__all__ = [
    "AverageMeter",
    "StepTimer",
    "annotate",
    "device_memory_stats",
    "sync",
    "trace",
]


def _host_cpu_fingerprint() -> str:
    """Short stable hash of this host's CPU identity (model + ISA flags).

    The model name matters, not just the flags: XLA:CPU derives *tuning*
    pseudo-features (``+prefer-no-gather``/``-scatter``) from the CPU
    model, bakes them into AOT cache entries, and its loader logs
    SIGILL-risk mismatch errors when an entry from one host is loaded on
    another with identical flags but a different model (VERDICT r4 weak
    #2)."""
    import hashlib

    ident = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags", "Features")):
                    key, _, val = line.partition(":")
                    if key.strip() == "flags" or key.strip() == "Features":
                        val = " ".join(sorted(val.split()))
                    ident.append(f"{key.strip()}:{val.strip()}")
                    if len(ident) == 2:
                        break
    except OSError:
        pass
    if not ident:
        import platform

        ident = [platform.processor() or "", platform.machine() or "unknown"]
    return hashlib.sha1("|".join(ident).encode()).hexdigest()[:12]


def enable_compilation_cache(path: Optional[str] = None) -> Optional[str]:
    """Turn on jax's persistent compilation cache.

    Large gmdx graphs compile slowly (a 1024² 50-step pipeline takes tens of
    minutes cold — BENCHNOTES.md); the persistent cache makes that a
    one-time cost per (program, topology). Default-ON: ``path`` falls back to
    the ``GMDX_COMPILE_CACHE`` env var, then to ``.cache/xla_compile`` under
    the repo root (next to the ``gmdx`` package). Set
    ``GMDX_COMPILE_CACHE=0`` (or ``off`` / an empty string) to disable. Returns the directory in use, or None when
    disabled or the directory can't be created. Every gmdx CLI (and bench.py)
    calls this at startup.
    """
    import os

    import jax

    env = os.environ.get("GMDX_COMPILE_CACHE")
    if path is None:
        if env is not None and env.strip().lower() in ("", "0", "off", "false", "no"):
            return None
        repo_root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        path = env or os.path.join(repo_root, ".cache", "xla_compile")
        # XLA:CPU cache entries embed host-AOT machine code but the cache
        # key does NOT cover CPU features — reusing a dir across hosts of
        # different microarchitectures risks SIGILL (cpu_aot_loader warns).
        # Partition the CPU cache per host feature set; TPU executables
        # are device code and stay shared. Check the jax config as well as
        # the env var: CLI subprocesses select CPU via
        # jax.config.update('jax_platforms', 'cpu'), not the env, and were
        # landing in the UNPARTITIONED shared dir (observed cross-host
        # +prefer-no-gather loader errors in the round-5 verify drive).
        cfg_platforms = ""
        try:
            cfg_platforms = str(jax.config.jax_platforms or "")
        except Exception:
            pass
        platforms = (
            os.environ.get("JAX_PLATFORMS", "") + " " + cfg_platforms
        ).lower()
        if "cpu" in platforms:
            # Feature detection is PER-PROCESS, not per-host: AMX is only
            # visible to processes that requested it (torch/oneDNN does at
            # import), so a torch+jax process writes +amx AOT entries that
            # a pure-jax process then loads and dies on — observed as the
            # multihost children crashing/hanging at the shutdown barrier
            # after this round's sd15 parity runs populated the cache. Pin
            # XLA:CPU codegen below AMX so every process in the fleet
            # compiles and loads the same ISA (tests don't need AMX), and
            # bump the partition name so pre-pin poisoned dirs are never
            # read again.
            flags = os.environ.get("XLA_FLAGS", "")
            if "xla_cpu_max_isa" not in flags:
                os.environ["XLA_FLAGS"] = (
                    flags + " --xla_cpu_max_isa=AVX512"
                ).strip()
            # XLA reads XLA_FLAGS once, at backend init. If a caller already
            # touched jax (devices/arrays) the pin above silently does NOT
            # apply to this process — writing into the 'cpu-avx512' partition
            # anyway would let a +AMX process repopulate the supposedly
            # pinned dir and reintroduce the cross-process ISA poisoning.
            # Detect that case and fall back to an unpinned, per-fingerprint
            # partition instead (and say so).
            pinned = True
            try:
                from jax._src import xla_bridge as _xb

                if getattr(_xb, "_backends", None):
                    pinned = "xla_cpu_max_isa=AVX512" in flags
            except Exception:
                pass
            if pinned:
                path = os.path.join(
                    path, f"cpu-avx512-{_host_cpu_fingerprint()}"
                )
            else:
                import warnings

                warnings.warn(
                    "gmdx: enable_compilation_cache() called after the XLA "
                    "backend was initialized — the --xla_cpu_max_isa=AVX512 "
                    "pin cannot apply to this process; using an unpinned "
                    "cache partition. Call it before any other JAX use.",
                    stacklevel=2,
                )
                path = os.path.join(
                    path, f"cpu-unpinned-{_host_cpu_fingerprint()}"
                )
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return None
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache even fast-compiling programs: the bench's many scan lengths are
    # individually cheap but collectively dominate warmup (441 s cold,
    # BENCH_r01.json).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    # Forensics for cross-session misses (the round-2 driver recompiled
    # against a warm dir — the XLA key bakes in per-session compile
    # options): log WHY a lookup missed so the next occurrence is
    # attributable. OPT-IN (GMDX_EXPLAIN_CACHE=1; bench.py sets it): the
    # flag also explains every TRACING-cache miss, pages of text per
    # process — enough to fill a subprocess PIPE buffer and deadlock
    # multi-process children that aren't drained concurrently. The
    # executable tier in gmdx/utils/export_cache.py is the actual fix;
    # this is the tripwire.
    if os.environ.get("GMDX_EXPLAIN_CACHE", "0") == "1":
        try:
            jax.config.update("jax_explain_cache_misses", True)
        except Exception:
            pass
    return path
