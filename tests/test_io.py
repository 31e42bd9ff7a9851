"""RGBE codec and image helper tests, cross-checked against OpenCV."""

import numpy as np
import pytest

from gmdx.io import (
    from_model_output,
    read_hdr,
    rgbe_decode,
    rgbe_encode,
    save_hdr_image,
    save_image,
    load_image,
    to_model_input,
    write_hdr,
)

try:
    import cv2

    HAVE_CV2 = True
except Exception:
    HAVE_CV2 = False


@pytest.fixture
def hdr_img():
    rng = np.random.default_rng(0)
    img = rng.uniform(0.0, 8.0, size=(37, 65, 3)).astype(np.float32)
    img[0, 0] = 0.0  # zero pixel
    img[1, :16] = 2.5  # RLE-able run
    return img


class TestRGBE:
    def test_encode_decode_relative_error(self, hdr_img):
        dec = rgbe_decode(rgbe_encode(hdr_img))
        # Shared 8-bit mantissa: error bounded by ~1/256 of the max channel.
        maxc = hdr_img.max(axis=-1, keepdims=True)
        err = np.abs(dec - hdr_img)
        assert np.all(err <= maxc / 256.0 + 1e-6)

    def test_zero_pixels(self):
        z = np.zeros((4, 4, 3), np.float32)
        assert np.all(rgbe_decode(rgbe_encode(z)) == 0)

    def test_write_read_roundtrip(self, hdr_img, tmp_path):
        p = str(tmp_path / "x.hdr")
        write_hdr(p, hdr_img)
        back = read_hdr(p)
        assert back.shape == hdr_img.shape
        np.testing.assert_allclose(back, rgbe_decode(rgbe_encode(hdr_img)), atol=0)

    def test_narrow_image_flat_path(self, tmp_path):
        img = np.random.default_rng(1).uniform(0, 4, (5, 4, 3)).astype(np.float32)
        p = str(tmp_path / "n.hdr")
        write_hdr(p, img)
        back = read_hdr(p)
        np.testing.assert_allclose(back, rgbe_decode(rgbe_encode(img)), atol=0)

    @pytest.mark.skipif(not HAVE_CV2, reason="cv2 unavailable")
    def test_cv2_reads_our_files(self, hdr_img, tmp_path):
        p = str(tmp_path / "c.hdr")
        write_hdr(p, hdr_img)
        bgr = cv2.imread(p, cv2.IMREAD_ANYDEPTH | cv2.IMREAD_COLOR)
        assert bgr is not None
        rgb = bgr[..., ::-1]
        maxc = hdr_img.max(axis=-1, keepdims=True)
        assert np.all(np.abs(rgb - hdr_img) <= maxc / 128.0 + 1e-5)

    @pytest.mark.skipif(not HAVE_CV2, reason="cv2 unavailable")
    def test_we_read_cv2_files(self, hdr_img, tmp_path):
        p = str(tmp_path / "v.hdr")
        cv2.imwrite(p, hdr_img[..., ::-1].copy())
        back = read_hdr(p)
        maxc = hdr_img.max(axis=-1, keepdims=True)
        assert np.all(np.abs(back - hdr_img) <= maxc / 128.0 + 1e-5)


class TestImageHelpers:
    def test_png_roundtrip(self, tmp_path):
        img = np.random.default_rng(2).uniform(0, 1, (16, 16, 3)).astype(np.float32)
        p = str(tmp_path / "a.png")
        save_image(p, img)
        back = load_image(p)
        assert np.abs(back - img).max() <= 1.0 / 255.0 + 1e-6

    def test_model_range_roundtrip(self):
        img = np.random.default_rng(3).uniform(0, 1, (8, 8, 3)).astype(np.float32)
        x = to_model_input(img)
        assert x.shape == (1, 3, 8, 8)
        assert x.min() >= -1.0 and x.max() <= 1.0
        back = from_model_output(x)
        np.testing.assert_allclose(back[0], img, atol=1e-6)

    def test_save_hdr_qmax_normalization(self, tmp_path):
        hdr = np.full((8, 8, 3), 50.0, np.float32)
        p = str(tmp_path / "q.hdr")
        save_hdr_image(p, hdr, qmax=99.0)
        back = read_hdr(p)
        np.testing.assert_allclose(back, 0.5, rtol=1e-2)


class TestRGBEFlatAmbiguity:
    def test_flat_file_with_22_prefix_pixel(self, tmp_path):
        """A flat-encoded .hdr whose first pixel bytes start (2, 2) must not
        be misparsed as a new-RLE scanline (header requires hi<0x80 and
        (hi<<8)|lo == width)."""
        import numpy as np

        from gmdx.io.rgbe import _HEADER, read_hdr, rgbe_decode, rgbe_encode

        rng = np.random.default_rng(0)
        img = rng.uniform(0.001, 1, (4, 16, 3)).astype(np.float32)
        rgbe = rgbe_encode(img)
        rgbe[0, 0] = [2, 2, 50, 130]  # dim pixel with the ambiguous prefix
        p = str(tmp_path / "flat22.hdr")
        with open(p, "wb") as f:
            f.write(_HEADER)
            f.write(b"-Y 4 +X 16\n")
            f.write(rgbe.tobytes())
        np.testing.assert_allclose(read_hdr(p), rgbe_decode(rgbe))
