"""AKAZE classical feature tier (sfm.akaze).

Mirrors the reference's feature_type menu (app/feature_extractor.py:68,
config/config.yaml:26-33). Correctness bars follow the other classical
tiers: detections are repeatable across shifts, descriptors match and
survive in-plane rotation, the nonlinear diffusion actually preserves
edges (the property that distinguishes AKAZE from Gaussian scale space),
and all reference config params are honored."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import scipy.ndimage as ndi  # noqa: E402

from splat_one_tpu.sfm import akaze as A  # noqa: E402
from splat_one_tpu.sfm import matching as M  # noqa: E402


def _texture(seed=0, size=300):
    """High-contrast blob texture (full dynamic range)."""
    rng = np.random.default_rng(seed)
    base = ndi.gaussian_filter(rng.uniform(size=(size, size)), 3.0)
    base = (base > np.median(base)).astype(np.float32)
    return ndi.gaussian_filter(base, 1.0).astype(np.float32)


class TestDetector:
    def test_shift_repeatability_and_matching(self):
        base = _texture()
        img1 = base[20:276, 20:276]
        img2 = base[24:280, 16:272]  # shifted (+4, -4) in (x, y)
        f1 = A.extract_akaze(jnp.asarray(img1), max_keypoints=512)
        f2 = A.extract_akaze(jnp.asarray(img2), max_keypoints=512)
        assert int(np.asarray(f1.valid).sum()) > 80
        idx2, ok = M.match_descriptors(
            f1.descriptors, f2.descriptors, f1.valid, f2.valid)
        ok = np.asarray(ok)
        assert ok.sum() > 60
        xy1 = np.asarray(f1.xys)[ok]
        xy2 = np.asarray(f2.xys)[np.asarray(idx2)[ok]]
        shift = xy2 - xy1
        med = np.median(shift, axis=0)
        np.testing.assert_allclose(med, [4.0, -4.0], atol=1.0)
        assert (np.abs(shift - med) < 1.5).all(axis=1).mean() > 0.9

    def test_rotation_invariance(self):
        base = _texture(1)
        img1 = base[20:276, 20:276]
        img3 = np.rot90(img1).copy()
        f1 = A.extract_akaze(jnp.asarray(img1), max_keypoints=512)
        f3 = A.extract_akaze(jnp.asarray(img3), max_keypoints=512)
        idx3, ok3 = M.match_descriptors(
            f1.descriptors, f3.descriptors, f1.valid, f3.valid)
        ok3 = np.asarray(ok3)
        assert ok3.sum() > 50
        xyA = np.asarray(f1.xys)[ok3]
        xyB = np.asarray(f3.xys)[np.asarray(idx3)[ok3]]
        # np.rot90 (CCW): (x, y) -> (y, W-1-x)
        pred = np.stack([xyA[:, 1], img1.shape[1] - 1 - xyA[:, 0]], -1)
        err = np.linalg.norm(pred - xyB, axis=1)
        assert (err < 2.0).mean() > 0.8, np.median(err)

    def test_dthreshold_and_small_image_padding(self):
        base = _texture(2)[:96, :96]
        f = A.extract_akaze(jnp.asarray(base), max_keypoints=512)
        # small image stops octaves early: output still padded to K
        assert f.xys.shape == (512, 2)
        n_lo = int(np.asarray(f.valid).sum())
        f_hi = A.extract_akaze(jnp.asarray(base), max_keypoints=512,
                               dthreshold=0.05)
        assert int(np.asarray(f_hi.valid).sum()) < n_lo


class TestDiffusion:
    def test_nonlinear_preserves_edges(self):
        """Perona-Malik conductivity must slow diffusion across a strong
        edge: after evolving to the same scale, the step-edge gradient
        stays much sharper than under isotropic (Gaussian) evolution."""
        img = np.zeros((96, 96), np.float32)
        img[:, 48:] = 1.0
        j = jnp.asarray(img)

        def edge_grad(feats_isotropic: bool):
            # reach into the evolution by rebuilding it: level at
            # sigma=3.2 (octave 1 end) via the public extractor's
            # internals — evolve with the module's own pieces
            L = A._gaussian_blur(j, A._SIGMA0)
            kc = jnp.float32(0.03)  # contrast well below the edge's
            # gradient (a single-edge image puts the quantile ON the
            # edge; real scenes put it on background texture)
            t = 0.5 * A._SIGMA0**2
            t_end = 0.5 * 3.2**2
            taus = A._fed_taus(t_end - t)
            if feats_isotropic:
                g = jnp.ones_like(L)
            else:
                Ls = A._gaussian_blur(L, 1.0)
                gx = A._scharr(Ls, 1, 1)
                gy = A._scharr(Ls, 0, 1)
                g = 1.0 / (1.0 + (gx * gx + gy * gy) / (kc * kc))
            for tau in taus:
                L = A._diffusion_step(L, g, float(tau))
            return float(jnp.abs(L[48, 48] - L[48, 47]))

        g_nl = edge_grad(False)
        g_iso = edge_grad(True)
        assert g_nl > 2.0 * g_iso, (g_nl, g_iso)

    def test_fed_taus_cover_time(self):
        for T in (0.5, 2.0, 7.3):
            taus = A._fed_taus(T)
            assert abs(taus.sum() - T) < 1e-9
            assert (taus > 0).all()
        assert len(A._fed_taus(0.0)) == 0


class TestDescriptorVariants:
    def test_mldb_shapes_and_matching(self):
        base = _texture(3)
        img1 = base[20:276, 20:276]
        img2 = base[24:280, 16:272]
        f1 = A.extract_akaze(jnp.asarray(img1), max_keypoints=384,
                             descriptor="MLDB")
        f2 = A.extract_akaze(jnp.asarray(img2), max_keypoints=384,
                             descriptor="MLDB")
        assert f1.descriptors.shape == (384, 486)  # 162 pairs x 3 ch
        # unit-norm +/-1 bits
        n = np.linalg.norm(np.asarray(
            f1.descriptors)[np.asarray(f1.valid)], axis=1)
        np.testing.assert_allclose(n, 1.0, atol=1e-5)
        idx2, ok = M.match_descriptors(
            f1.descriptors, f2.descriptors, f1.valid, f2.valid)
        ok = np.asarray(ok)
        assert ok.sum() > 40
        xy1 = np.asarray(f1.xys)[ok]
        xy2 = np.asarray(f2.xys)[np.asarray(idx2)[ok]]
        med = np.median(xy2 - xy1, axis=0)
        np.testing.assert_allclose(med, [4.0, -4.0], atol=1.0)

    def test_descriptor_size_and_channels(self):
        base = _texture(4)[:160, :160]
        f = A.extract_akaze(jnp.asarray(base), max_keypoints=128,
                            descriptor="MLDB", descriptor_size=256,
                            descriptor_channels=1)
        assert f.descriptors.shape == (128, 162)  # ch1 full < 256 asked
        f2 = A.extract_akaze(jnp.asarray(base), max_keypoints=128,
                             descriptor="MLDB", descriptor_size=100,
                             descriptor_channels=3)
        assert f2.descriptors.shape == (128, 100)

    def test_upright_variant(self):
        base = _texture(5)[:160, :160]
        f = A.extract_akaze(jnp.asarray(base), max_keypoints=128,
                            descriptor="MSURF_UPRIGHT")
        v = np.asarray(f.valid)
        assert (np.asarray(f.orientations)[v] == 0).all()

    def test_isotropic_option_runs(self):
        base = _texture(6)[:160, :160]
        f = A.extract_akaze(jnp.asarray(base), max_keypoints=128,
                            isotropic=True)
        assert int(np.asarray(f.valid).sum()) > 10


class TestPipelineIntegration:
    def test_detect_features_akaze(self, tmp_path):
        from PIL import Image

        from splat_one_tpu.app import pipeline as P

        wd = str(tmp_path)
        import os
        os.makedirs(wd + "/images")
        base = _texture(7)
        for i in range(2):
            crop = base[i * 4:i * 4 + 256, i * 4:i * 4 + 256]
            Image.fromarray((crop * 255).astype(np.uint8)).convert(
                "RGB").save(wd + f"/images/im{i}.jpg")
        P.extract_metadata(wd)
        P.detect_features(wd, max_keypoints=256,
                          feature_process_size=256,
                          feature_type="AKAZE")
        z = np.load(wd + "/features/im0.jpg.features.npz")
        assert z["descriptors"].shape == (256, 64)
        assert z["valid"].sum() > 30
        n = P.match_features(wd)
        assert n >= 1
