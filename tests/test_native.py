"""Native C++ RGBE codec: byte-parity with the numpy reference + speed."""

import os
import time

import numpy as np
import pytest

from gmdx import native
from gmdx.io import rgbe

pytestmark = pytest.mark.slow  # excluded from the quick tier (pytest.ini)



@pytest.fixture(scope="module")
def built():
    if not native.ensure_built(quiet=False):
        pytest.skip("native toolchain unavailable")
    assert native.lib() is not None
    return True


def _py_write(path, rgb):
    """Force the numpy writer regardless of the native dispatch."""
    h, w = rgb.shape[:2]
    encoded = rgbe.rgbe_encode(rgb)
    with open(path, "wb") as f:
        f.write(rgbe._HEADER)
        f.write(f"-Y {h} +X {w}\n".encode())
        for y in range(h):
            f.write(bytes((2, 2, (w >> 8) & 0xFF, w & 0xFF)))
            for c in range(4):
                f.write(
                    rgbe._rle_encode_channel(
                        np.ascontiguousarray(encoded[y, :, c])
                    )
                )


class TestNativeRGBE:
    def test_write_byte_identical_to_python(self, built, tmp_path):
        rng = np.random.default_rng(0)
        img = (rng.uniform(0, 4, (37, 129, 3)) ** 2).astype(np.float32)
        img[5:9] = 0.25  # uniform rows exercise long RLE runs
        img[:, 40:44] = 0.0
        p_native = str(tmp_path / "n.hdr")
        p_python = str(tmp_path / "p.hdr")
        assert native.write_hdr_native(p_native, img)
        _py_write(p_python, img)
        assert open(p_native, "rb").read() == open(p_python, "rb").read()

    def test_read_matches_python(self, built, tmp_path):
        rng = np.random.default_rng(1)
        img = (rng.uniform(0, 10, (16, 64, 3))).astype(np.float32)
        p = str(tmp_path / "x.hdr")
        _py_write(p, img)
        got = native.read_hdr_native(p)
        # Compare against the numpy decode of the same file.
        os.environ["GMDX_NO_NATIVE"] = "1"
        try:
            import importlib

            importlib.reload(native)
            ref = rgbe.read_hdr(p)
        finally:
            del os.environ["GMDX_NO_NATIVE"]
            importlib.reload(native)
        np.testing.assert_array_equal(got, ref)

    def test_roundtrip_error_bound(self, built, tmp_path):
        rng = np.random.default_rng(2)
        img = (rng.uniform(0, 100, (32, 32, 3))).astype(np.float32)
        p = str(tmp_path / "r.hdr")
        rgbe.write_hdr(p, img)  # dispatches native
        back = rgbe.read_hdr(p)
        maxc = img.max(axis=-1, keepdims=True)
        assert (np.abs(back - img) <= maxc / 128.0 + 1e-6).all()

    def test_narrow_image_flat_encoding(self, built, tmp_path):
        img = np.random.default_rng(3).uniform(0, 1, (4, 4, 3)).astype(np.float32)
        p = str(tmp_path / "tiny.hdr")
        rgbe.write_hdr(p, img)
        back = rgbe.read_hdr(p)
        assert back.shape == (4, 4, 3)
        maxc = img.max(axis=-1, keepdims=True)
        assert (np.abs(back - img) <= maxc / 128.0 + 1e-6).all()

    def test_speedup(self, built, tmp_path):
        """Native write must beat the Python RLE loop comfortably on a
        production-sized frame."""
        rng = np.random.default_rng(4)
        img = rng.uniform(0, 50, (1024, 1024, 3)).astype(np.float32)
        p1, p2 = str(tmp_path / "a.hdr"), str(tmp_path / "b.hdr")

        t0 = time.perf_counter()
        assert native.write_hdr_native(p1, img)
        t_native = time.perf_counter() - t0

        t0 = time.perf_counter()
        _py_write(p2, img)
        t_python = time.perf_counter() - t0
        assert open(p1, "rb").read() == open(p2, "rb").read()
        assert t_native < t_python / 5, (t_native, t_python)


def _png_bytes(arr):
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _jpeg_bytes(arr, quality=92):
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


class TestNativeImageDecode:
    def test_probe(self, built):
        arr = np.zeros((40, 60, 3), np.uint8)
        assert native.probe_image_native(_png_bytes(arr)) == (60, 40)
        assert native.probe_image_native(_jpeg_bytes(arr)) == (60, 40)
        assert native.probe_image_native(b"not an image") is None

    def test_png_decode_exact(self, built):
        rng = np.random.default_rng(0)
        arr = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
        got = native.decode_image_native(_png_bytes(arr))
        np.testing.assert_array_equal(got, arr)

    def test_png_rgba_drops_alpha(self, built):
        """PIL convert("RGB") drops alpha without compositing; so do we."""
        rng = np.random.default_rng(1)
        rgba = rng.integers(0, 256, (16, 16, 4), dtype=np.uint8)
        got = native.decode_image_native(_png_bytes(rgba))
        np.testing.assert_array_equal(got, rgba[..., :3])

    def test_jpeg_decode_matches_pil(self, built):
        import io

        from PIL import Image

        rng = np.random.default_rng(2)
        # Smooth gradient: JPEG is lossy, but both sides use libjpeg so the
        # decode of the SAME bytes should agree to the last bit (same IDCT).
        y, x = np.mgrid[0:64, 0:64]
        arr = np.stack([y * 4, x * 4, (y + x) * 2], -1).astype(np.uint8)
        blob = _jpeg_bytes(arr)
        got = native.decode_image_native(blob)
        want = np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1

    def test_preprocess_matches_pil_center(self, built):
        """decode -> shorter-side resize -> center crop -> normalize parity
        with gmdx.data.transforms.preprocess_pair (<=1 uint8 LSB from the
        resize quantization)."""
        import io as _io

        from PIL import Image

        from gmdx.data.transforms import preprocess_pair

        rng = np.random.default_rng(3)
        arr = rng.integers(0, 256, (96, 130, 3), dtype=np.uint8)
        blob = _png_bytes(arr)
        res = 64
        got = native.preprocess_batch_native([blob], res)
        assert got is not None and got.shape == (1, 3, res, res)
        img = Image.open(_io.BytesIO(blob))
        want, _ = preprocess_pair(img, img, res, center_crop=True)
        assert np.abs(got[0] - want).max() <= (1.5 / 127.5)

    def test_preprocess_crop_flip(self, built):
        """Explicit crop offsets + flip match the numpy transform chain."""
        from gmdx.data.transforms import resize_shorter_side, to_model_range
        import io as _io

        from PIL import Image

        rng = np.random.default_rng(4)
        tall = rng.integers(0, 256, (160, 100, 3), dtype=np.uint8)  # top free
        wide = rng.integers(0, 256, (100, 160, 3), dtype=np.uint8)  # left free
        blobs = [_png_bytes(tall), _png_bytes(wide)]
        res = 48
        tops, lefts, flips = [7, 0], [0, 21], [True, False]
        got = native.preprocess_batch_native(
            blobs, res, tops=tops, lefts=lefts, flips=flips
        )
        assert got is not None
        for i, blob in enumerate(blobs):
            resized = np.asarray(
                resize_shorter_side(Image.open(_io.BytesIO(blob)), res)
            )
            window = resized[
                tops[i] : tops[i] + res, lefts[i] : lefts[i] + res
            ]
            if flips[i]:
                window = window[:, ::-1]
            want = to_model_range(window)
            assert np.abs(got[i] - want).max() <= (1.5 / 127.5)

    def test_bad_bytes_fail_batch(self, built):
        out = native.preprocess_batch_native([b"corrupt"], 32)
        assert out is None

    def test_16bit_png_rejected(self, built):
        """16-bit PNGs diverge between libpng's scaling and PIL's clipping
        conversion — the native path must refuse them so the PIL fallback
        keeps batch parity."""
        import io

        from PIL import Image

        arr16 = (np.arange(16 * 16, dtype=np.uint16).reshape(16, 16) * 257)
        buf = io.BytesIO()
        Image.fromarray(arr16, mode="I;16").save(buf, format="PNG")
        blob = buf.getvalue()
        assert native.probe_image_native(blob) is None
        assert native.decode_image_native(blob) is None
        assert native.preprocess_batch_native([blob], 8) is None
