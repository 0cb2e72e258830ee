"""Native C++ image loader: build, decode correctness, threading, fallback."""

import os

import numpy as np
import pytest

from splat_one_tpu.utils import native_loader


@pytest.fixture(scope="module")
def imgdir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    img = (rng.uniform(size=(96, 128, 3)) * 255).astype(np.uint8)
    Image.fromarray(img).save(d / "a.png")
    Image.fromarray(img).save(d / "a.jpg", quality=95)
    return d, img


@pytest.mark.skipif(
    not native_loader.available(), reason="no native toolchain"
)
class TestNativeLoader:
    def test_png_decode_exact(self, imgdir):
        d, img = imgdir
        ldr = native_loader.NativeImageLoader(2)
        out = ldr.wait(ldr.submit(str(d / "a.png"), 128, 96))
        ref = img.astype(np.float32) / 255.0
        # interior exact; borders clamp-to-edge (sub-LSB differences)
        np.testing.assert_allclose(
            out[1:-1, 1:-1], ref[1:-1, 1:-1], atol=1e-6
        )
        ldr.close()

    def test_jpeg_matches_pil_decode(self, imgdir):
        from PIL import Image

        d, img = imgdir
        ldr = native_loader.NativeImageLoader(2)
        out = ldr.wait(ldr.submit(str(d / "a.jpg"), 128, 96))
        pil = np.asarray(
            Image.open(d / "a.jpg").convert("RGB")
        ).astype(np.float32) / 255.0
        np.testing.assert_allclose(
            out[1:-1, 1:-1], pil[1:-1, 1:-1], atol=2e-2
        )
        ldr.close()

    def test_batch_and_resize(self, imgdir):
        d, img = imgdir
        ldr = native_loader.NativeImageLoader(4)
        batch = ldr.load_batch([str(d / "a.png")] * 8, 64, 48)
        assert batch.shape == (8, 48, 64, 3)
        assert np.isfinite(batch).all()
        # all identical inputs -> identical outputs
        np.testing.assert_array_equal(batch[0], batch[7])
        ldr.close()

    def test_undistort_changes_image(self, imgdir):
        d, img = imgdir
        K = np.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]])
        ldr = native_loader.NativeImageLoader(1)
        plain = ldr.wait(ldr.submit(str(d / "a.png"), 128, 96))
        und = ldr.wait(
            ldr.submit(
                str(d / "a.png"), 128, 96, K=K, dist=np.array([0.1, 0.0])
            )
        )
        assert not np.allclose(plain, und)
        assert np.isfinite(und).all()
        ldr.close()

    def test_missing_file_errors(self, imgdir):
        ldr = native_loader.NativeImageLoader(1)
        with pytest.raises(IOError):
            ldr.wait(ldr.submit("/nonexistent/img.png", 8, 8))
        ldr.close()
