"""ctypes bindings for the C++ native components (native/*.cpp).

``lib()`` returns the loaded shared library or None — callers keep their
pure-Python fallback. Build with ``make -C native`` (or let ``ensure_built``
invoke it when a toolchain is present); set ``GMDX_NO_NATIVE=1`` to force
the Python paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgmdx_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False
_warned = False


def ensure_built(quiet: bool = True) -> bool:
    """Build (or rebuild) the shared library; True if it exists afterwards.

    Always invokes make — it is a no-op when the .so is newer than the
    sources, and skipping it would keep serving a stale binary after a
    source change."""
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=quiet,
            timeout=120,
        )
    except Exception:
        pass  # no toolchain: fall through to the existence check
    ok = os.path.exists(_LIB_PATH)
    if not ok:
        global _warned
        if not _warned:
            _warned = True
            import warnings

            warnings.warn(
                "gmdx native library unavailable (run `make -C native` with "
                "a C++ toolchain to build it); using the Python fallbacks",
                stacklevel=2,
            )
    return ok


def lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried or os.environ.get("GMDX_NO_NATIVE") == "1":
        return _lib
    _tried = True
    if not ensure_built():
        return None
    try:
        l = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    l.gmdx_rgbe_write.restype = ctypes.c_int
    l.gmdx_rgbe_write.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
    ]
    l.gmdx_rgbe_read_header.restype = ctypes.c_int
    l.gmdx_rgbe_read_header.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_long),
    ]
    l.gmdx_rgbe_read.restype = ctypes.c_int
    l.gmdx_rgbe_read.argtypes = [
        ctypes.c_char_p,
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
    ]
    l.gmdx_rgbe_encode.restype = None
    l.gmdx_rgbe_encode.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_long,
    ]
    l.gmdx_rgbe_decode.restype = None
    l.gmdx_rgbe_decode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
    ]
    l.gmdx_image_probe.restype = ctypes.c_int
    l.gmdx_image_probe.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    l.gmdx_image_decode_rgb8.restype = ctypes.c_int
    l.gmdx_image_decode_rgb8.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
    ]
    l.gmdx_preprocess_batch.restype = ctypes.c_int
    l.gmdx_preprocess_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    _lib = l
    return _lib


def write_hdr_native(path: str, rgb: np.ndarray) -> bool:
    """Native .hdr writer; False means 'use the Python fallback'."""
    l = lib()
    if l is None:
        return False
    rgb = np.ascontiguousarray(rgb, dtype=np.float32)
    h, w = rgb.shape[:2]
    rc = l.gmdx_rgbe_write(
        path.encode(),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h,
        w,
    )
    return rc == 0


def read_hdr_native(path: str) -> Optional[np.ndarray]:
    """Native .hdr reader; None means 'use the Python fallback'."""
    l = lib()
    if l is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    pos = ctypes.c_long()
    if l.gmdx_rgbe_read_header(
        path.encode(), ctypes.byref(h), ctypes.byref(w), ctypes.byref(pos)
    ) != 0:
        return None
    out = np.empty((h.value, w.value, 3), dtype=np.float32)
    rc = l.gmdx_rgbe_read(
        path.encode(),
        pos.value,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h.value,
        w.value,
    )
    return out if rc == 0 else None


def probe_image_native(blob: bytes) -> Optional[tuple]:
    """(width, height) of encoded PNG/JPEG bytes; None = use PIL fallback."""
    l = lib()
    if l is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if l.gmdx_image_probe(blob, len(blob), ctypes.byref(w), ctypes.byref(h)):
        return None
    return (w.value, h.value)


def decode_image_native(blob: bytes) -> Optional[np.ndarray]:
    """Decode PNG/JPEG bytes to an (H, W, 3) uint8 array; None = fallback."""
    dims = probe_image_native(blob)
    if dims is None:
        return None
    l = lib()
    w, h = dims
    out = np.empty((h, w, 3), dtype=np.uint8)
    rc = l.gmdx_image_decode_rgb8(
        blob, len(blob),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.nbytes,
    )
    return out if rc == 0 else None


def preprocess_batch_native(
    blobs,
    resolution: int,
    tops=None,
    lefts=None,
    flips=None,
    n_threads: Optional[int] = None,
) -> Optional[np.ndarray]:
    """Thread-pooled decode -> shorter-side resize -> crop -> flip ->
    normalize for a batch of encoded images.

    ``tops``/``lefts`` are post-resize crop offsets (None or -1 entries =
    center crop); ``flips`` are per-item booleans. Returns (N, 3, R, R)
    float32 in [-1, 1], or None when the native library is unavailable or
    any item fails to decode (callers fall back to the PIL path).
    """
    l = lib()
    if l is None:
        return None
    n = len(blobs)
    if n_threads is None:
        # More threads than cores thrashes a small host (decode is
        # compute-bound); saturating the cores is the useful maximum.
        n_threads = min(n, os.cpu_count() or 1)
    blobs = [bytes(b) for b in blobs]  # keep referenced until the call ends
    datas = (ctypes.c_char_p * n)(*blobs)
    lens = (ctypes.c_int64 * n)(*[len(b) for b in blobs])

    def _i64(v):
        if v is None:
            return None
        return (ctypes.c_int64 * n)(*[int(x) for x in v])

    tops_arr = _i64(tops)
    lefts_arr = _i64(lefts)
    flips_arr = (
        (ctypes.c_uint8 * n)(*[1 if f else 0 for f in flips])
        if flips is not None
        else None
    )
    out = np.empty((n, 3, resolution, resolution), dtype=np.float32)
    rc = l.gmdx_preprocess_batch(
        datas,
        lens,
        n,
        resolution,
        tops_arr,
        lefts_arr,
        flips_arr,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads,
    )
    return out if rc == 0 else None


__all__ = [
    "lib",
    "ensure_built",
    "write_hdr_native",
    "read_hdr_native",
    "probe_image_native",
    "decode_image_native",
    "preprocess_batch_native",
]
