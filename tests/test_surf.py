"""SURF classical feature tier (sfm.surf): integral-image fast-Hessian.

Completes the reference menu to 6/6 (app/feature_extractor.py:68;
config/config.yaml:20-24 params honored). Bars follow the other classical
tiers plus a box-filter correctness check against direct summation."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import scipy.ndimage as ndi  # noqa: E402

from splat_one_tpu.sfm import matching as M  # noqa: E402
from splat_one_tpu.sfm import surf as S  # noqa: E402


def _texture(seed=0, size=300):
    rng = np.random.default_rng(seed)
    base = ndi.gaussian_filter(rng.uniform(size=(size, size)), 3.0)
    base = (base > np.median(base)).astype(np.float32)
    return ndi.gaussian_filter(base, 1.0).astype(np.float32)


class TestBoxFilter:
    def test_box_matches_direct_sum(self):
        rng = np.random.default_rng(0)
        img = rng.uniform(size=(37, 53)).astype(np.float32)
        ii = S._integral(jnp.asarray(img))
        H, W = img.shape
        got = np.asarray(S._box(ii, H, W, -2, 3, -1, 4))
        for y, x in [(0, 0), (5, 7), (36, 52), (2, 50)]:
            y0, y1 = max(y - 2, 0), min(y + 3, H)
            x0, x1 = max(x - 1, 0), min(x + 4, W)
            ref = img[y0:y1, x0:x1].sum()
            assert abs(got[y, x] - ref) < 1e-3 * max(ref, 1), (y, x)


class TestDetector:
    def test_shift_repeatability_and_matching(self):
        base = _texture()
        img1 = base[20:276, 20:276]
        img2 = base[24:280, 16:272]
        f1 = S.extract_surf(jnp.asarray(img1), max_keypoints=512)
        f2 = S.extract_surf(jnp.asarray(img2), max_keypoints=512)
        assert int(np.asarray(f1.valid).sum()) > 100
        idx2, ok = M.match_descriptors(
            f1.descriptors, f2.descriptors, f1.valid, f2.valid)
        ok = np.asarray(ok)
        assert ok.sum() > 80
        sh = np.asarray(f2.xys)[np.asarray(idx2)[ok]] - np.asarray(
            f1.xys)[ok]
        med = np.median(sh, axis=0)
        np.testing.assert_allclose(med, [4.0, -4.0], atol=1.0)
        assert (np.abs(sh - med) < 2.0).all(axis=1).mean() > 0.85

    def test_rotation_invariance(self):
        base = _texture(1)
        img1 = base[20:276, 20:276]
        img3 = np.rot90(img1).copy()
        f1 = S.extract_surf(jnp.asarray(img1), max_keypoints=512)
        f3 = S.extract_surf(jnp.asarray(img3), max_keypoints=512)
        idx3, ok3 = M.match_descriptors(
            f1.descriptors, f3.descriptors, f1.valid, f3.valid)
        ok3 = np.asarray(ok3)
        assert ok3.sum() > 50
        xyA = np.asarray(f1.xys)[ok3]
        xyB = np.asarray(f3.xys)[np.asarray(idx3)[ok3]]
        pred = np.stack([xyA[:, 1], img1.shape[1] - 1 - xyA[:, 0]], -1)
        err = np.linalg.norm(pred - xyB, axis=1)
        assert (err < 2.5).mean() > 0.7, np.median(err)

    def test_threshold_and_upright(self):
        base = _texture(2)[:200, :200]
        f = S.extract_surf(jnp.asarray(base), max_keypoints=256)
        n_lo = int(np.asarray(f.valid).sum())
        f_hi = S.extract_surf(jnp.asarray(base), max_keypoints=256,
                              hessian_threshold=4e4)
        assert int(np.asarray(f_hi.valid).sum()) < n_lo
        fu = S.extract_surf(jnp.asarray(base), max_keypoints=256,
                            upright=True)
        v = np.asarray(fu.valid)
        assert (np.asarray(fu.orientations)[v] == 0).all()

    def test_small_image_padding(self):
        base = _texture(3)[:96, :96]
        f = S.extract_surf(jnp.asarray(base), max_keypoints=512)
        assert f.xys.shape == (512, 2)  # padded to K


class TestPipelineIntegration:
    def test_detect_features_surf(self, tmp_path):
        import os

        from PIL import Image

        from splat_one_tpu.app import pipeline as P

        wd = str(tmp_path)
        os.makedirs(wd + "/images")
        base = _texture(4)
        for i in range(2):
            crop = base[i * 4:i * 4 + 256, i * 4:i * 4 + 256]
            Image.fromarray((crop * 255).astype(np.uint8)).convert(
                "RGB").save(wd + f"/images/im{i}.jpg")
        P.extract_metadata(wd)
        P.detect_features(wd, max_keypoints=256,
                          feature_process_size=256, feature_type="SURF")
        z = np.load(wd + "/features/im0.jpg.features.npz")
        assert z["descriptors"].shape == (256, 64)
        assert z["valid"].sum() > 30
        assert P.match_features(wd) >= 1
