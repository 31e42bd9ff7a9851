"""Cross-cutting utilities: profiling, timing."""

from gmdx.utils.profiling import (
    AverageMeter,
    StepTimer,
    annotate,
    device_memory_stats,
    enable_compilation_cache,
    sync,
    trace,
)

__all__ = [
    "AverageMeter",
    "StepTimer",
    "annotate",
    "device_memory_stats",
    "enable_compilation_cache",
    "sync",
    "trace",
]
