"""Model-family tests: segmentation, depth, LightGlue, ALIKED, video, LPIPS.

Learned weights are unavailable in this zero-egress environment, so tests
cover: classical promptable masking end-to-end, and for the neural nets —
forward shapes, finiteness, differentiability, and interface contracts.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestSegmentation:
    def test_classical_promptable_mask(self):
        from splat_one_tpu.models.segmentation import build_predictor

        # image: bright disk on dark background
        H = W = 96
        yy, xx = np.mgrid[0:H, 0:W]
        disk = ((yy - 48) ** 2 + (xx - 48) ** 2) < 20**2
        img = np.where(disk[..., None], 0.9, 0.1).astype(np.float32)
        img = np.repeat(img, 3, axis=-1)
        pred = build_predictor()  # classical fallback
        pred.set_image(img)
        masks, scores, _ = pred.predict(
            np.array([[48, 48], [5, 5]]), np.array([1, 0])
        )
        m = masks[0]
        # the disk is segmented, the corner is not
        assert m[48, 48] and not m[5, 5]
        iou = (m & disk).sum() / (m | disk).sum()
        assert iou > 0.7, iou

    def test_save_mask_inverted(self, tmp_path):
        from PIL import Image

        from splat_one_tpu.models.segmentation import save_mask

        m = np.zeros((8, 8), bool)
        m[2:4, 2:4] = True
        save_mask(m, str(tmp_path / "m" / "x.png"))
        arr = np.asarray(Image.open(tmp_path / "m" / "x.png"))
        assert arr[0, 0] == 255 and arr[2, 2] == 0  # inverted

    def test_hiera_forward_shapes(self):
        from splat_one_tpu.models import sam2_hiera as sam_tpu

        key = jax.random.PRNGKey(0)
        enc = sam_tpu.init_encoder(key)
        dec = sam_tpu.init_decoder(key)
        img = jnp.zeros((1, 256, 256, 3))
        emb = sam_tpu.encode_image(enc, img)
        assert emb.shape == (1, 8, 8, 256)
        logits, iou = sam_tpu.compact_decode_masks(
            enc, dec, emb, jnp.array([[[0.5, 0.5]]]), jnp.array([[1.0]])
        )
        assert logits.shape == (1, 32, 32)
        assert np.isfinite(np.asarray(logits)).all()


class TestDepth:
    def test_infer_image_contract(self):
        from splat_one_tpu.models.depth_tpu import DepthAnythingTPU

        model = DepthAnythingTPU("vits")
        bgr = (np.random.default_rng(0).uniform(size=(120, 160, 3)) * 255
               ).astype(np.uint8)
        d = model.infer_image(bgr)
        assert d.shape == (120, 160)
        assert np.isfinite(d).all()
        assert not model.has_weights  # zero-egress environment

    def test_depth_outputs(self, tmp_path):
        import os

        from splat_one_tpu.models.depth_tpu import save_depth_outputs

        d = np.random.default_rng(0).uniform(size=(32, 32)).astype(
            np.float32
        )
        save_depth_outputs(d, str(tmp_path), "img1")
        assert os.path.exists(tmp_path / "img1_depth.npy")
        assert os.path.exists(tmp_path / "img1_depth.png")

    def test_infer_fisheye_geometry_roundtrip(self):
        """The DAC-style fisheye path resamples fisheye -> ERP -> net ->
        fisheye. With the net stubbed to 'return the ERP red channel',
        the output must reproduce the INPUT's red channel inside the FOV
        — which validates the projection, the distortion-polynomial
        Newton inversion, and the bilinear maps end-to-end."""
        from splat_one_tpu.models.depth_tpu import DepthAnythingTPU

        model = DepthAnythingTPU("vits")
        model.infer_image = lambda bgr: (
            bgr[..., 2].astype(np.float32) / 255.0)  # red channel (bgr)

        H = W = 160
        f = W / np.pi  # ~180 deg equidistant
        K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
        dist = np.array([0.03, -0.01, 0.0, 0.0])
        # smooth pattern in the red channel
        yy, xx = np.mgrid[0:H, 0:W]
        red = (0.5 + 0.4 * np.sin(xx / 11.0) * np.cos(yy / 13.0))
        bgr = np.zeros((H, W, 3), np.uint8)
        bgr[..., 2] = (red * 255).astype(np.uint8)

        out = model.infer_fisheye(bgr, K, dist=dist, fov_deg=170.0,
                                  erp_size=256)
        assert out.shape == (H, W)
        # compare inside a conservative central disc (away from the FOV
        # boundary where the ERP patch edge clamps)
        r = np.hypot(xx - W / 2, yy - H / 2)
        sel = r < 0.32 * W
        err = np.abs(out[sel] - red[sel])
        assert np.median(err) < 0.02, np.median(err)
        assert err.mean() < 0.04, err.mean()
        # outside the FOV the output is masked to zero
        assert (out[r > 0.52 * W] == 0).all()

    def test_infer_fisheye_full_frame_no_warnings(self):
        """Full-frame fisheye (corners far outside the image circle): the
        guarded Newton inversion must stay finite — no overflow/invalid
        RuntimeWarnings — and still reproduce the pattern in-FOV while
        masking the out-of-circle corners to zero."""
        import warnings

        from splat_one_tpu.models.depth_tpu import DepthAnythingTPU

        model = DepthAnythingTPU("vits")
        model.infer_image = lambda bgr: (
            bgr[..., 2].astype(np.float32) / 255.0)

        H, W = 120, 240  # wide frame: corners at ~2.2x the FOV radius
        f = 50.0
        K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
        dist = np.array([0.05, -0.02, 0.01, 0.0])
        yy, xx = np.mgrid[0:H, 0:W]
        red = (0.5 + 0.4 * np.sin(xx / 9.0) * np.cos(yy / 12.0))
        bgr = np.zeros((H, W, 3), np.uint8)
        bgr[..., 2] = (red * 255).astype(np.uint8)

        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)
            out = model.infer_fisheye(bgr, K, dist=dist, fov_deg=170.0,
                                      erp_size=256)
        assert np.isfinite(out).all()
        r = np.hypot(xx - W / 2, yy - H / 2)
        sel = r < 0.5 * f  # well inside the image circle
        assert np.median(np.abs(out[sel] - red[sel])) < 0.02
        # corners are beyond the image circle -> masked to zero
        assert (out[r > 2.0 * f] == 0).all()


class TestLightGlue:
    def test_matcher_contract(self):
        from splat_one_tpu.models.lightglue_tpu import (
            load_lightglue, match_lightglue,
        )

        rng = np.random.default_rng(0)
        params = load_lightglue()
        K = 64
        d = rng.normal(size=(K, 128)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        xy = rng.uniform(0, 256, (K, 2)).astype(np.float32)
        idx, ok = match_lightglue(
            params, d, d, xy, xy, (256, 256), (256, 256),
            np.ones(K, bool), np.ones(K, bool), min_score=0.0,
        )
        assert idx.shape == (K,) and ok.shape == (K,)

        # learnability: a few gradient steps on an identity-matching loss
        # must improve the diagonal dominance (random init has none)
        from splat_one_tpu.models import lightglue_tpu as lg

        dj = jnp.asarray(d)
        xyn = jnp.asarray(xy / 256.0)
        v = jnp.ones(K, bool)

        def loss_fn(p):
            s, ma, mb = lg.lightglue_scores(p, dj, dj, xyn, xyn, v, v)
            return jnp.mean(
                -jax.nn.log_softmax(s, axis=1)[jnp.arange(K), jnp.arange(K)]
            )

        l0 = float(loss_fn(params))
        g_fn = jax.jit(jax.value_and_grad(loss_fn))
        p = params
        for _ in range(25):
            l, g = g_fn(p)
            gn = jnp.sqrt(
                jax.tree.reduce(lambda a, b: a + jnp.sum(b * b), g, 0.0)
            )
            scale = 0.5 / jnp.maximum(gn, 1.0)  # clipped step
            p = jax.tree.map(lambda a, b: a - scale * b, p, g)
        l1 = float(loss_fn(p))
        assert l1 < l0 * 0.7, (l0, l1)

    def test_differentiable(self):
        from splat_one_tpu.models import lightglue_tpu as lg

        params = lg.init_lightglue(jax.random.PRNGKey(0))
        K = 16
        d = jnp.ones((K, 128)) * 0.1

        def loss(p):
            s, ma, mb = lg.lightglue_scores(
                p, d, d, jnp.zeros((K, 2)), jnp.zeros((K, 2)),
                jnp.ones(K, bool), jnp.ones(K, bool),
            )
            return jnp.sum(s) + jnp.sum(ma)

        g = jax.grad(loss)(params)
        assert np.isfinite(float(jax.tree.reduce(
            lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0
        )))


class TestAliked:
    def test_detects_corners(self):
        from splat_one_tpu.models.aliked_tpu import (
            extract_aliked, load_aliked,
        )

        params = load_aliked()
        img = jnp.asarray(
            np.random.default_rng(0).uniform(size=(128, 128)).astype(
                np.float32
            )
        )
        feats = extract_aliked(params, img, max_keypoints=256)
        assert feats.xys.shape == (256, 2)
        assert np.isfinite(np.asarray(feats.descriptors)).all()
        norms = np.linalg.norm(
            np.asarray(feats.descriptors)[np.asarray(feats.valid)], axis=-1
        )
        if len(norms):
            np.testing.assert_allclose(norms, 1.0, atol=1e-4)


class TestVideo:
    def test_gpx_interpolation(self, tmp_path):
        from splat_one_tpu.data import video

        gpx = """<?xml version="1.0"?>
<gpx xmlns="http://www.topografix.com/GPX/1/1" version="1.1">
<trk><trkseg>
<trkpt lat="35.0" lon="139.0"><ele>10</ele><time>2024-01-01T00:00:00Z</time></trkpt>
<trkpt lat="35.001" lon="139.001"><ele>20</ele><time>2024-01-01T00:01:00Z</time></trkpt>
</trkseg></trk></gpx>"""
        p = tmp_path / "t.gpx"
        p.write_text(gpx)
        track = video.parse_gpx(str(p))
        assert len(track) == 2
        desc = video.interpolate_geotags(
            ["a.jpg"], [track[0]["time_s"] + 30.0], track
        )
        assert abs(desc[0]["MAPLatitude"] - 35.0005) < 1e-9
        assert abs(desc[0]["MAPAltitude"] - 15.0) < 1e-9

    def test_ffmpeg_gated(self):
        from splat_one_tpu.data import video

        if not video.ffmpeg_available():
            with pytest.raises(RuntimeError):
                video.extract_frames("/nonexistent.mp4", "/tmp/x")


class TestLpips:
    def test_gated_without_weights(self):
        from splat_one_tpu.models import lpips

        assert not lpips.lpips_available("/nonexistent.npz")
        assert lpips.load_weights("/nonexistent.npz") is None


class TestNMEA:
    def test_parse_nmea_rmc_gga(self, tmp_path):
        """NMEA geotag source (reference geotag_source nmea)."""
        from splat_one_tpu.data.video import parse_geotag_file

        p = tmp_path / "track.nmea"
        p.write_text(
            "$GPGGA,120001.00,4807.038,N,01131.000,E,1,08,0.9,545.4,M,"
            "46.9,M,,*47\n"
            "$GPRMC,120001.00,A,4807.038,N,01131.000,E,022.4,084.4,"
            "230324,003.1,W*6A\n"
            "$GPRMC,120003.00,A,4807.100,N,01131.100,E,022.4,084.4,"
            "230324,003.1,W*6A\n"
            "garbage line\n"
            "$GPRMC,120002.00,V,,,,,,,230324,,*00\n"  # void fix: skipped
        )
        track = parse_geotag_file(str(p))
        assert len(track) == 2
        assert abs(track[0]["lat"] - (48 + 7.038 / 60)) < 1e-6
        assert abs(track[0]["lon"] - (11 + 31.0 / 60)) < 1e-6
        assert abs(track[0]["alt"] - 545.4) < 1e-6
        assert track[1]["time_s"] - track[0]["time_s"] == 2.0
        assert track[1]["alt"] == 0.0  # no GGA for that time
