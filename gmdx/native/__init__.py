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
    return os.path.exists(_LIB_PATH)


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


__all__ = ["lib", "ensure_built", "write_hdr_native", "read_hdr_native"]
