"""Cross-cutting utilities: profiling, timing, program caching."""

from gmdx.utils.export_cache import cached_export, export_cache_dir
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
    "cached_export",
    "device_memory_stats",
    "enable_compilation_cache",
    "export_cache_dir",
    "sync",
    "trace",
]
