"""Native C++ RGBE codec: byte-parity with the numpy reference + speed."""

import os
import time

import numpy as np
import pytest

from gmdx import native
from gmdx.io import rgbe


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
