"""Codec tests: native C++ libpng backend vs Pillow fallback."""

import numpy as np
import pytest

from lfinterpolator_tpu.io import codec


def test_pil_roundtrip(tmp_path, rng):
    img = rng.integers(0, 256, (24, 32, 4), dtype=np.uint8)
    p = str(tmp_path / "a.png")
    codec._encode_pil(p, img)
    np.testing.assert_array_equal(codec._decode_pil(p), img)


def test_pil_encode_ignores_extension(tmp_path, rng):
    # Atomic writes stage through NAME.tmp; the Pillow fallback must force
    # PNG instead of inferring the format from the staging extension.
    img = rng.integers(0, 256, (8, 16, 4), dtype=np.uint8)
    p = str(tmp_path / "frame.png.tmp")
    codec._encode_pil(p, img)
    np.testing.assert_array_equal(codec._decode_pil(p), img)


def test_decode_missing_file():
    with pytest.raises(RuntimeError, match="Cannot load image"):
        codec._decode_pil("/nonexistent.png")


def test_encode_rejects_bad_shape(tmp_path):
    with pytest.raises(ValueError):
        codec.encode_png(str(tmp_path / "x.png"), np.zeros((4, 4), np.uint8))


@pytest.mark.skipif(not codec.native_available(), reason="native codec not built")
class TestNative:
    def test_roundtrip(self, tmp_path, rng):
        img = rng.integers(0, 256, (48, 64, 4), dtype=np.uint8)
        p = str(tmp_path / "n.png")
        codec.encode_png(p, img)
        np.testing.assert_array_equal(codec.decode(p), img)

    def test_cross_codec(self, tmp_path, rng):
        """Native-encoded files decode identically through Pillow and back."""
        img = rng.integers(0, 256, (16, 20, 4), dtype=np.uint8)
        p = str(tmp_path / "c.png")
        codec.encode_png(p, img)
        np.testing.assert_array_equal(codec._decode_pil(p), img)
        p2 = str(tmp_path / "c2.png")
        codec._encode_pil(p2, img)
        np.testing.assert_array_equal(codec.decode(p2), img)

    def test_rgb_normalized_to_rgba(self, tmp_path, rng):
        rgb = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
        p = str(tmp_path / "rgb.png")
        codec._encode_pil(p, rgb)
        out = codec.decode(p)
        assert out.shape == (8, 8, 4)
        assert (out[:, :, 3] == 255).all()
        np.testing.assert_array_equal(out[:, :, :3], rgb)

    def test_native_decode_failure_falls_back(self, tmp_path):
        bad = str(tmp_path / "bad.png")
        with open(bad, "wb") as f:
            f.write(b"not a png at all")
        with pytest.raises(RuntimeError, match="Cannot load image"):
            codec.decode(bad)

    def test_jpeg_decode_matches_pillow(self, tmp_path, rng):
        """Native libjpeg decode agrees with Pillow on the same file (both
        wrap libjpeg, so the DCT pipeline output is identical)."""
        from PIL import Image

        img = rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)
        p = str(tmp_path / "t.jpg")
        Image.fromarray(img).save(p, quality=92)
        nat = codec.decode(p)
        pil = np.asarray(Image.open(p).convert("RGBA"), dtype=np.uint8)
        assert nat.shape == pil.shape
        assert (nat[:, :, 3] == 255).all()
        np.testing.assert_array_equal(nat, pil)

    def test_jpeg_decode_failure_falls_back(self, tmp_path):
        bad = str(tmp_path / "bad.jpg")
        with open(bad, "wb") as f:
            f.write(b"definitely not a jpeg")
        with pytest.raises(RuntimeError, match="Cannot load image"):
            codec.decode(bad)
