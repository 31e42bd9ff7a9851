"""Radiance RGBE (.hdr) codec in pure numpy.

The reference exports HDR frames with ``cv2.imwrite(path, bgr_float32)`` on a
``.hdr`` extension (scripts/inference/generate_hdr.py:27-30), i.e. Radiance
RGBE with RLE scanlines. This module implements the format natively (writer
with adaptive-RLE scanlines, reader handling both RLE and flat encodings) so
the framework has no OpenCV dependency on the export path; outputs are
readable by cv2/imageio and byte-compatible in decoded float values.

Format: "#?RADIANCE" header, FORMAT=32-bit_rle_rgbe, ``-Y h +X w`` resolution
string, then per-pixel shared-exponent (r, g, b, e) bytes where
``component = mantissa_byte / 256 * 2**(e - 128)``.
"""

from __future__ import annotations

import numpy as np

_HEADER = b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n"


def rgbe_encode(rgb: np.ndarray) -> np.ndarray:
    """Encode float RGB (..., 3) -> uint8 RGBE (..., 4) with shared exponent."""
    rgb = np.maximum(np.asarray(rgb, dtype=np.float32), 0.0)
    maxc = rgb.max(axis=-1)
    rgbe = np.zeros(rgb.shape[:-1] + (4,), dtype=np.uint8)
    nz = maxc >= 1e-32
    # frexp: maxc = frac * 2**exp with frac in [0.5, 1)
    frac, exp = np.frexp(maxc[nz])
    scale = frac * 256.0 / maxc[nz]
    # Round-to-nearest mantissa (classic Radiance truncates; rounding halves
    # the quantization error and stays format-valid), capped at 255.
    mant = rgb[nz] * scale[..., None] + 0.5
    rgbe[nz, :3] = np.minimum(mant, 255.0).astype(np.uint8)
    rgbe[nz, 3] = (exp + 128).astype(np.uint8)
    return rgbe


def rgbe_decode(rgbe: np.ndarray) -> np.ndarray:
    """Decode uint8 RGBE (..., 4) -> float32 RGB (..., 3)."""
    rgbe = np.asarray(rgbe, dtype=np.uint8)
    exp = rgbe[..., 3].astype(np.int32)
    scale = np.where(exp == 0, 0.0, np.ldexp(1.0, exp - 136))  # /256 folded in
    return rgbe[..., :3].astype(np.float32) * scale[..., None].astype(np.float32)


def _rle_encode_channel(ch: np.ndarray) -> bytes:
    """Adaptive RLE for one channel of one scanline (Radiance 'new' RLE)."""
    out = bytearray()
    n = len(ch)
    i = 0
    while i < n:
        # Find run length at i.
        run_end = i + 1
        while run_end < n and run_end - i < 127 and ch[run_end] == ch[i]:
            run_end += 1
        run_len = run_end - i
        if run_len >= 4:
            out.append(128 + run_len)
            out.append(int(ch[i]))
            i = run_end
        else:
            # Literal segment: extend until a >=4 run starts or 128 cap.
            lit_end = i
            while lit_end < n and lit_end - i < 128:
                re = lit_end + 1
                while re < n and re - lit_end < 4 and ch[re] == ch[lit_end]:
                    re += 1
                if re - lit_end >= 4:
                    break
                lit_end += 1
            if lit_end == i:
                lit_end = min(i + 128, n)
            out.append(lit_end - i)
            out.extend(ch[i:lit_end].tobytes())
            i = lit_end
    return bytes(out)


def write_hdr(path: str, rgb: np.ndarray) -> None:
    """Write float RGB (H, W, 3) image to a Radiance .hdr file (RLE scanlines).

    Dispatches to the C++ codec (native/rgbe.cpp, byte-identical output)
    when built; this numpy implementation is the fallback."""
    rgb = np.asarray(rgb, dtype=np.float32)
    if rgb.ndim != 3 or rgb.shape[-1] != 3:
        raise ValueError(f"expected (H, W, 3) RGB image, got {rgb.shape}")
    from gmdx.native import write_hdr_native

    if write_hdr_native(path, rgb):
        return
    h, w = rgb.shape[:2]
    rgbe = rgbe_encode(rgb)
    use_rle = 8 <= w < 32768
    with open(path, "wb") as f:
        f.write(_HEADER)
        f.write(f"-Y {h} +X {w}\n".encode())
        if not use_rle:
            f.write(rgbe.tobytes())
            return
        for y in range(h):
            # RLE scanline marker: 0x02 0x02 then 16-bit width.
            f.write(bytes((2, 2, (w >> 8) & 0xFF, w & 0xFF)))
            line = rgbe[y]
            for c in range(4):
                f.write(_rle_encode_channel(np.ascontiguousarray(line[:, c])))


def _read_rle_scanline(buf: memoryview, pos: int, w: int) -> tuple[np.ndarray, int]:
    line = np.empty((w, 4), dtype=np.uint8)
    for c in range(4):
        x = 0
        while x < w:
            code = buf[pos]
            pos += 1
            if code > 128:  # run
                line[x : x + code - 128, c] = buf[pos]
                pos += 1
                x += code - 128
            else:  # literal
                line[x : x + code, c] = np.frombuffer(
                    buf[pos : pos + code], dtype=np.uint8
                )
                pos += code
                x += code
    return line, pos


def read_hdr(path: str) -> np.ndarray:
    """Read a Radiance .hdr file -> float32 RGB (H, W, 3). Native C++ fast
    path when built; numpy fallback below."""
    from gmdx.native import read_hdr_native

    native = read_hdr_native(path)
    if native is not None:
        return native
    with open(path, "rb") as f:
        data = f.read()
    if not data.startswith(b"#?"):
        raise ValueError(f"{path}: not a Radiance file")
    # Header ends at the first blank line; resolution string follows.
    hdr_end = data.index(b"\n\n") + 2
    res_end = data.index(b"\n", hdr_end)
    res = data[hdr_end:res_end].split()
    if len(res) != 4 or res[0] != b"-Y" or res[2] != b"+X":
        raise ValueError(f"{path}: unsupported orientation {res}")
    h, w = int(res[1]), int(res[3])
    buf = memoryview(data)
    pos = res_end + 1
    rgbe = np.empty((h, w, 4), dtype=np.uint8)
    for y in range(h):
        # New-RLE scanline header: (2, 2, hi, lo) where hi<0x80 and
        # (hi<<8)|lo == width. Checking only the leading (2, 2) would
        # misparse flat files whose first pixel is r=2, g=2.
        if (
            w >= 8
            and w < 32768
            and buf[pos] == 2
            and buf[pos + 1] == 2
            and buf[pos + 2] & 0x80 == 0
            and ((buf[pos + 2] << 8) | buf[pos + 3]) == w
        ):
            pos += 4
            rgbe[y], pos = _read_rle_scanline(buf, pos, w)
        else:
            flat = np.frombuffer(buf[pos : pos + 4 * w], dtype=np.uint8)
            rgbe[y] = flat.reshape(w, 4)
            pos += 4 * w
    return rgbe_decode(rgbe)


__all__ = ["rgbe_encode", "rgbe_decode", "write_hdr", "read_hdr"]
