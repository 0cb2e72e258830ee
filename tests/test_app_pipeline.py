"""End-to-end workdir pipeline test: images -> CLI stages -> reconstruction.

Drives the same stage runners the CLI exposes on ray-traced synthetic images
(textured sphere — 3D-consistent, richly textured), checks the workdir bus
artifacts at every stage, and verifies the final reconstruction registers
all cameras with bounded drift. (Accuracy tightening — 5-point init, local
BA — is tracked for round 2; this guards mechanics + sanity.)
"""

import json
import os

import numpy as np
import pytest


def textured_sphere_images(c2ws, Ks, W, H, R_s=5.0, seed=0):
    rng = np.random.default_rng(seed)
    n_wave = 300
    k = rng.normal(size=(n_wave, 3))
    k *= rng.uniform(2.0, 35.0, (n_wave, 1)) / np.linalg.norm(
        k, axis=1, keepdims=True
    )
    ph = rng.uniform(0, 2 * np.pi, n_wave)
    amp = rng.uniform(0.3, 1.0, n_wave) / np.sqrt(n_wave)
    out = []
    for c2w, K in zip(c2ws, Ks):
        u, v = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
        d = np.stack(
            [(u - K[0, 2]) / K[0, 0], (v - K[1, 2]) / K[1, 1],
             np.ones_like(u)], -1
        ) @ c2w[:3, :3].T
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o = c2w[:3, 3]
        b = d @ o
        t = -b + np.sqrt(np.maximum(b * b - (o @ o - R_s**2), 0))
        p = o + t[..., None] * d
        img = np.cos(p.reshape(-1, 3) @ k.T + ph) @ amp
        img = (img - img.min()) / (img.max() - img.min())
        out.append(img.reshape(H, W).astype(np.float32))
    return out


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    from PIL import Image

    from splat_one_tpu.data.synthetic import ring_cameras

    wd = str(tmp_path_factory.mktemp("pipeline"))
    os.makedirs(os.path.join(wd, "images"))
    W = H = 256
    c2ws, Ks = ring_cameras(12, 2.0, -0.3, 60.0, W, H)
    imgs = textured_sphere_images(c2ws, Ks, W, H)
    for i, im in enumerate(imgs):
        Image.fromarray((im * 255).astype(np.uint8)).convert("RGB").save(
            os.path.join(wd, "images", f"view_{i:02d}.png")
        )
    return wd, c2ws, Ks


class TestWorkdirPipeline:
    @pytest.mark.slow
    def test_full_pipeline(self, workdir):
        wd, c2ws, Ks = workdir
        from splat_one_tpu.app import pipeline
        from splat_one_tpu.app.camera_models import CameraModelManager

        n = pipeline.extract_metadata(wd)
        assert n == 12
        assert os.path.exists(os.path.join(wd, "camera_models.json"))
        exifs = os.listdir(os.path.join(wd, "exif"))
        assert len(exifs) == 12

        # override the focal with the true value (exercises the manager +
        # propagation path the reference GUI editor drives)
        mgr = CameraModelManager(wd)
        f_true = float(Ks[0][0, 0] / 256)
        for cam_id in list(mgr.models):
            mgr.set_override(cam_id, focal=f_true)
        mgr.save()
        assert mgr.propagate_to_exif() == 12
        with open(os.path.join(wd, "exif", exifs[0])) as f:
            assert abs(json.load(f)["focal_ratio"] - f_true) < 1e-6

        n = pipeline.detect_features(
            wd, max_keypoints=1500, feature_process_size=256
        )
        assert n == 12
        z = np.load(
            os.path.join(wd, "features", "view_00.png.features.npz")
        )
        assert z["valid"].sum() > 300

        n_pairs = pipeline.match_features(wd)
        assert n_pairs > 20

        n_tracks = pipeline.create_tracks(wd)
        assert n_tracks > 500

        report = pipeline.reconstruct(wd)
        assert report.get("n_images") == 12, report
        assert report.get("n_points", 0) > 800

        # parse the exported reconstruction back through the data layer
        from splat_one_tpu.data.opensfm import Parser

        p = Parser(wd, normalize=False)
        assert p.camtoworlds.shape == (12, 4, 4)

        # bounded drift vs GT after similarity alignment
        est = {
            nm: p.camtoworlds[i][:3, 3]
            for i, nm in enumerate(p.image_names)
        }
        A = np.stack([c2ws[i][:3, 3] for i in range(12)])
        B = np.stack([est[f"view_{i:02d}.png"] for i in range(12)])
        muA, muB = A.mean(0), B.mean(0)
        Hm = (A - muA).T @ (B - muB)
        U, s, Vt = np.linalg.svd(Hm)
        D = np.diag([1, 1, np.sign(np.linalg.det(U @ Vt))])
        R_al = U @ D @ Vt
        scale = np.trace(np.diag(s) @ D) / ((B - muB) ** 2).sum()
        err = np.linalg.norm(
            scale * (B - muB) @ R_al.T + muA - A, axis=-1
        )
        spread = np.linalg.norm(A - muA, axis=-1).mean()
        # r3 accuracy tier: the resolution-aware reprojection-outlier
        # threshold (~1.3 detection px of angle; pipeline.reconstruct)
        # cut this scene's errors from median 0.117 / max 0.325 of spread
        # to ~0.02 / ~0.05 (scripts/sfm_ring_repro.py at SFM_OUTLIER ~=
        # 0.005). Bars leave ~3x headroom. Do NOT loosen these bars.
        assert err.max() < 0.15 * spread, (err, spread)
        assert np.median(err) < 0.08 * spread, (err, spread)


class TestMaskStage:
    def test_masks_filter_features(self, tmp_path):
        import json

        from PIL import Image

        from splat_one_tpu.app import pipeline

        wd = str(tmp_path)
        os.makedirs(os.path.join(wd, "images"))
        rng = np.random.default_rng(0)
        # textured image so the detector fires everywhere
        img = (rng.uniform(size=(96, 128)) * 255).astype(np.uint8)
        import scipy.ndimage as ndi

        img = ndi.gaussian_filter(img.astype(np.float32), 1.5)
        img = (
            (img - img.min()) / (img.max() - img.min()) * 255
        ).astype(np.uint8)
        Image.fromarray(img).convert("RGB").save(
            os.path.join(wd, "images", "a.png")
        )
        pipeline.extract_metadata(wd)
        # clicks select the left half (classical predictor region-grows)
        json.dump(
            {"a.png": {"points": [[20, 48], [120, 48]], "labels": [1, 0]}},
            open(os.path.join(wd, "masks_clicks.json"), "w"),
        )
        n = pipeline.create_masks(wd)
        assert n == 1
        mask = np.asarray(
            Image.open(os.path.join(wd, "masks", "a.png.png"))
            if os.path.exists(os.path.join(wd, "masks", "a.png.png"))
            else Image.open(os.path.join(wd, "masks", "a.png"))
        )
        assert (mask == 0).any() and (mask == 255).any()

        pipeline.detect_features(wd, max_keypoints=512,
                                 feature_process_size=128)
        z = np.load(os.path.join(wd, "features", "a.png.features.npz"))
        xys = z["xys"][z["valid"]]
        # kept features avoid the masked (value 0) region
        m = mask if mask.ndim == 2 else mask[..., 0]
        xi = np.clip(xys[:, 0].astype(int), 0, m.shape[1] - 1)
        yi = np.clip(xys[:, 1].astype(int), 0, m.shape[0] - 1)
        assert (m[yi, xi] > 127).all()


class TestLiveReconViewer:
    def test_state_serving(self):
        import json
        import urllib.request

        import numpy as np

        from splat_one_tpu.app.recon_viewer import LiveReconViewer

        v = LiveReconViewer(port=18765)
        url = v.serve_background()
        try:
            poses = {0: np.zeros(6, np.float32),
                     1: np.array([0, 0, 0, 0.5, 0, 0], np.float32)}
            pts = {i: np.random.default_rng(i).normal(size=3)
                   for i in range(20)}
            v.update(poses, pts)
            with urllib.request.urlopen(url + "/state", timeout=5) as r:
                st = json.loads(r.read())
            assert len(st["cams"]) == 2 and len(st["points"]) == 20
            with urllib.request.urlopen(url, timeout=5) as r:
                page = r.read()
            assert b"canvas" in page
        finally:
            v.close()


class TestVisualizations:
    def test_feature_and_match_previews(self, tmp_path):
        """Keypoint overlays + side-by-side match view (reference
        feature_extractor.py:440-459, feature_matching.py:395-431)."""
        import json as _json

        from PIL import Image

        from splat_one_tpu.app import pipeline

        wd = tmp_path / "wd"
        (wd / "images").mkdir(parents=True)
        (wd / "features").mkdir()
        (wd / "matches").mkdir()
        rng = np.random.default_rng(0)
        for name in ("a.jpg", "b.jpg"):
            Image.fromarray(
                rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
            ).save(wd / "images" / name)
            np.savez(
                wd / "features" / (name + ".features.npz"),
                xys=rng.uniform(0, 48, (20, 2)).astype(np.float32),
                descriptors=np.zeros((20, 8), np.float32),
                scores=np.ones(20, np.float32),
                valid=np.ones(20, bool),
                bearings=np.zeros((20, 3), np.float32),
                width=64, height=48,
            )
        with open(wd / "matches" / "matches.json", "w") as f:
            _json.dump({"a.jpg|b.jpg": [[0, 1], [2, 3], [5, 5]]}, f)
        n = pipeline.visualize_features(str(wd))
        assert n == 2
        assert (wd / "previews" / "features" / "a.jpg.png").exists()
        p = pipeline.visualize_matches(str(wd), "a.jpg", "b.jpg")
        img = Image.open(p)
        assert img.size == (128, 48)
        # reversed order resolves through the stored key too
        pipeline.visualize_matches(str(wd), "b.jpg", "a.jpg")


class TestDepthStage:
    def test_estimate_depth_writes_outputs(self, tmp_path):
        from PIL import Image

        from splat_one_tpu.app import pipeline

        wd = tmp_path / "wd"
        (wd / "images").mkdir(parents=True)
        rng = np.random.default_rng(0)
        Image.fromarray(
            rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
        ).save(wd / "images" / "a.jpg")
        n = pipeline.estimate_depth(str(wd))
        assert n == 1
        dep = np.load(wd / "depth" / "a_depth.npy")
        assert dep.shape == (32, 48)
        assert (wd / "depth" / "a_depth.png").exists()


class TestMatchingTypes:
    def test_lightglue_and_flann_matcher_menu(self, workdir):
        """The reference's matcher menu (app/feature_matching.py:96:
        Brute-Force | FLANN | LIGHTGLUE) must be selectable. FLANN is an
        accepted alias of the exact batched path (approximate NN has no
        value on the MXU); LIGHTGLUE routes through
        models.lightglue_tpu (style tier without a checkpoint) and must
        produce a valid matches.json the tracker can consume."""
        wd, _, _ = workdir
        from splat_one_tpu.app import pipeline

        if not os.path.exists(os.path.join(wd, "features")):
            pipeline.extract_metadata(wd)
            pipeline.detect_features(
                wd, max_keypoints=500, feature_process_size=256)
        n_flann = pipeline.match_features(wd, matching_type="FLANN")
        assert n_flann > 5
        n_lg = pipeline.match_features(wd, matching_type="lightglue")
        with open(os.path.join(wd, "matches", "matches.json")) as f:
            matches = json.load(f)
        assert len(matches) == n_lg
        for fm in matches.values():
            fm = np.asarray(fm)
            assert fm.ndim == 2 and fm.shape[1] == 2
        with pytest.raises(ValueError):
            pipeline.match_features(wd, matching_type="kdtree")
