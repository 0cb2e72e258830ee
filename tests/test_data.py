"""Data-layer tests: normalization, OpenSfM/COLMAP parsers, trajectories."""

import json
import os

import numpy as np
import pytest

from splat_one_tpu.data import colmap, normalize as nrm, opensfm, traj
from splat_one_tpu.data.synthetic import ring_cameras


class TestNormalize:
    def test_similarity_identity_cameras(self):
        c2ws, _ = ring_cameras(8, 3.0, -0.5, 60.0, 64, 64)
        T, scale = nrm.similarity_from_cameras(c2ws)
        c2 = nrm.transform_cameras(T, c2ws)
        c2[:, :3, 3] *= scale
        # after normalization camera distances are ~1 (median)
        d = np.linalg.norm(c2[:, :3, 3], axis=-1)
        assert abs(np.median(d) - 1.0) < 0.3
        # rotations stay orthonormal
        R = c2[:, :3, :3]
        eye = np.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), R.shape), atol=1e-5)

    def test_align_principal_axes(self):
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(500, 3)) * np.array([5.0, 1.0, 0.2])
        R = nrm._rotation_aligning(
            np.array([0.0, 0, 1.0]), np.array([0.577, 0.577, 0.577])
        )
        pts_rot = pts @ R.T
        T = nrm.align_principal_axes(pts_rot)
        out = nrm.transform_points(T, pts_rot)
        var = out.var(axis=0)
        assert var[0] > var[1] > var[2]

    def test_normalize_scene_roundtrip_shape(self):
        c2ws, _ = ring_cameras(6, 4.0, -1.0, 60.0, 64, 64)
        pts = np.random.default_rng(1).normal(size=(100, 3))
        c2, p2, T = nrm.normalize_scene(c2ws.astype(np.float64), pts)
        assert c2.shape == c2ws.shape and p2.shape == pts.shape
        # transform maps original points to normalized ones
        p3 = nrm.transform_points(T, pts)
        np.testing.assert_allclose(p3, p2, atol=1e-5)


class TestOpenSfMParser:
    @pytest.fixture
    def workdir(self, tmp_path):
        rng = np.random.default_rng(0)
        recon = {
            "cameras": {
                "cam1": {
                    "projection_type": "perspective",
                    "width": 64, "height": 48,
                    "focal": 0.9, "k1": 0.01, "k2": -0.002,
                },
                "pano": {
                    "projection_type": "spherical",
                    "width": 128, "height": 64,
                },
            },
            "shots": {},
            "points": {},
            "reference_lla": {
                "latitude": 35.0, "longitude": 139.0, "altitude": 10.0
            },
        }
        for i in range(6):
            recon["shots"][f"img_{i:03d}.jpg"] = {
                "rotation": (rng.normal(size=3) * 0.3).tolist(),
                "translation": rng.normal(size=3).tolist(),
                "camera": "cam1" if i % 2 == 0 else "pano",
            }
        for i in range(50):
            recon["points"][str(i)] = {
                "coordinates": rng.normal(size=3).tolist(),
                "color": rng.integers(0, 255, 3).tolist(),
            }
        with open(tmp_path / "reconstruction.json", "w") as f:
            json.dump([recon], f)
        return tmp_path

    def test_parse(self, workdir):
        p = opensfm.Parser(str(workdir), normalize=True)
        assert p.camtoworlds.shape == (6, 4, 4)
        assert p.points.shape == (50, 3)
        assert p.scene_scale > 0
        assert "spherical" in p.camera_models
        assert "pinhole" in p.camera_models
        # rotations orthonormal after normalization
        R = p.camtoworlds[:, :3, :3]
        eye = np.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(
            eye, np.broadcast_to(np.eye(3), R.shape), atol=1e-4
        )

    def test_utm_merge_two_reconstructions(self, workdir):
        with open(workdir / "reconstruction.json") as f:
            recs = json.load(f)
        rec2 = json.loads(json.dumps(recs[0]))
        # second reconstruction ~111m north
        rec2["reference_lla"]["latitude"] += 0.001
        rec2["shots"] = {
            f"b_{k}": v for k, v in rec2["shots"].items()
        }
        with open(workdir / "reconstruction.json", "w") as f:
            json.dump([recs[0], rec2], f)
        p = opensfm.Parser(str(workdir), normalize=False)
        assert p.camtoworlds.shape == (12, 4, 4)
        # shots of rec2 shifted by ~111m in (easting, northing) frame
        a = p.camtoworlds[p.image_name_to_idx["img_000.jpg"]][:3, 3]
        b = p.camtoworlds[p.image_name_to_idx["b_img_000.jpg"]][:3, 3]
        shift = np.linalg.norm(b - a)
        assert 100 < shift < 130, shift

    def test_utm_conversion_sane(self):
        # equator/prime-meridian-ish sanity: 0.001 deg lat ~ 111 m
        e1, n1, _ = opensfm.latlon_to_utm(35.0, 139.0)
        e2, n2, _ = opensfm.latlon_to_utm(35.001, 139.0)
        assert abs((n2 - n1) - 111.0) < 1.0

    def test_undistort_identity(self):
        img = np.random.default_rng(0).uniform(
            size=(48, 64, 3)
        ).astype(np.float32)
        K = np.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]])
        out = opensfm.undistort_image(img, K, np.zeros(2))
        np.testing.assert_array_equal(out, img)
        # small distortion changes the image but stays finite
        out2 = opensfm.undistort_image(img, K, np.array([0.05, 0.0]))
        assert np.isfinite(out2).all() and not np.allclose(out2, img)


class TestColmap:
    @pytest.fixture
    def model_dir(self, tmp_path):
        d = tmp_path / "sparse" / "0"
        d.mkdir(parents=True)
        with open(d / "cameras.txt", "w") as f:
            f.write("# comment\n")
            f.write("1 PINHOLE 64 48 60.0 60.0 32.0 24.0\n")
            f.write("2 OPENCV_FISHEYE 64 48 30 30 32 24 0.01 0.0 0.0 0.0\n")
        rng = np.random.default_rng(0)
        with open(d / "images.txt", "w") as f:
            f.write("# comment\n")
            for i in range(4):
                q = rng.normal(size=4)
                q /= np.linalg.norm(q)
                t = rng.normal(size=3)
                f.write(
                    f"{i + 1} {q[0]} {q[1]} {q[2]} {q[3]} "
                    f"{t[0]} {t[1]} {t[2]} {1 + i % 2} im_{i}.png\n"
                )
                f.write("10.0 12.0 -1\n")
        with open(d / "points3D.txt", "w") as f:
            f.write("# comment\n")
            for i in range(20):
                x, y, z = rng.normal(size=3)
                f.write(f"{i} {x} {y} {z} 100 150 200 0.5 1 0\n")
        return tmp_path

    def test_parse_text(self, model_dir):
        p = colmap.Parser(str(model_dir), normalize=True)
        assert p.camtoworlds.shape == (4, 4, 4)
        assert p.points.shape == (20, 3)
        assert set(p.camera_models) == {"pinhole", "fisheye"}
        assert p.points_rgb.shape == (20, 3)

    def test_binary_roundtrip(self, model_dir, tmp_path):
        # write a binary model equivalent to the text one and re-read
        src = colmap.Parser(str(model_dir), normalize=False)
        d = tmp_path / "bin" / "sparse" / "0"
        d.mkdir(parents=True)
        import struct

        cams = colmap.read_cameras_txt(
            str(model_dir / "sparse" / "0" / "cameras.txt")
        )
        with open(d / "cameras.bin", "wb") as f:
            f.write(struct.pack("<Q", len(cams)))
            for cid, c in cams.items():
                f.write(
                    struct.pack(
                        "<iiQQ", cid, colmap._NAME_TO_ID[c.model],
                        c.width, c.height,
                    )
                )
                f.write(struct.pack(f"<{len(c.params)}d", *c.params))
        imgs = colmap.read_images_txt(
            str(model_dir / "sparse" / "0" / "images.txt")
        )
        with open(d / "images.bin", "wb") as f:
            f.write(struct.pack("<Q", len(imgs)))
            for iid, im in imgs.items():
                f.write(struct.pack("<i", iid))
                f.write(struct.pack("<4d", *im["qvec"]))
                f.write(struct.pack("<3d", *im["tvec"]))
                f.write(struct.pack("<i", im["camera_id"]))
                f.write(im["name"].encode() + b"\x00")
                n = len(im["point3D_ids"])
                f.write(struct.pack("<Q", n))
                for (x, y), pid in zip(im["xys"], im["point3D_ids"]):
                    f.write(struct.pack("<ddq", x, y, pid))
        xyz, rgb, err = colmap.read_points3d_txt(
            str(model_dir / "sparse" / "0" / "points3D.txt")
        )
        with open(d / "points3D.bin", "wb") as f:
            f.write(struct.pack("<Q", len(xyz)))
            for i in range(len(xyz)):
                f.write(struct.pack("<Q", i))
                f.write(struct.pack("<3d", *xyz[i]))
                f.write(struct.pack("<3B", *rgb[i]))
                f.write(struct.pack("<d", err[i]))
                f.write(struct.pack("<Q", 0))
        p2 = colmap.Parser(str(tmp_path / "bin"), normalize=False)
        np.testing.assert_allclose(
            p2.camtoworlds, src.camtoworlds, atol=1e-6
        )
        np.testing.assert_allclose(p2.points, src.points, atol=1e-6)


class TestTraj:
    def _check(self, c2ws):
        assert np.isfinite(c2ws).all()
        R = c2ws[:, :3, :3]
        eye = np.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(
            eye, np.broadcast_to(np.eye(3), R.shape), atol=1e-5
        )

    def test_all_paths(self):
        c2ws, _ = ring_cameras(8, 3.0, -0.5, 60.0, 64, 64)
        interp = traj.generate_interpolated_path(c2ws, n_interp=3)
        assert len(interp) == 3 * 7
        self._check(interp)
        for fn in (
            traj.generate_ellipse_path_z,
            traj.generate_ellipse_path_y,
            traj.generate_spiral_path,
        ):
            path = fn(c2ws, n_frames=24)
            assert len(path) == 24
            self._check(path)


class TestDepthSupervision:
    def test_sparse_depth_projection(self):
        from splat_one_tpu.data import depth_supervision as DS

        # point straight ahead of an identity camera at depth 3
        pts = np.array([[0.0, 0.0, 3.0], [0.5, 0.0, 3.0]])
        c2w = np.eye(4)
        K = np.array([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]])
        d = DS.sparse_depth_map(pts, c2w, K, 64, 64)
        assert d.shape == (64, 64, 1)
        assert abs(d[32, 32, 0] - 3.0) < 1e-6
        # second point at u = 60*0.5/3 + 32 = 42
        assert abs(d[32, 42, 0] - 3.0) < 1e-6
        assert (d > 0).sum() == 2

    def test_nearest_point_wins(self):
        from splat_one_tpu.data import depth_supervision as DS

        pts = np.array([[0.0, 0.0, 5.0], [0.0, 0.0, 2.0]])
        c2w = np.eye(4)
        K = np.array([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]])
        d = DS.sparse_depth_map(pts, c2w, K, 64, 64)
        assert abs(d[32, 32, 0] - 2.0) < 1e-6

    def test_maps_from_tracks(self):
        from splat_one_tpu.data import depth_supervision as DS

        tracks = [{0: 0, 1: 1}, {0: 2}]
        points = {0: np.array([0.0, 0, 3.0]), 1: np.array([0.1, 0, 4.0])}
        c2ws = np.tile(np.eye(4), (2, 1, 1))
        Ks = np.tile(
            np.array([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]]), (2, 1, 1)
        )
        maps = DS.depth_maps_from_tracks(tracks, points, c2ws, Ks, 64, 64)
        assert maps.shape == (2, 64, 64, 1)
        assert (maps[0] > 0).sum() == 2  # tracks 0 (pt 0) and 1 (pt 1 missing -> only pt0? track1 has pt id 1)


class TestFisheyeUndistort:
    def test_fisheye_maps_identity_at_center(self):
        import numpy as np

        from splat_one_tpu.data.opensfm import undistort_maps

        K = np.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]])
        xs, ys, valid = undistort_maps(
            K, np.array([0.05, -0.01, 0.0, 0.0]), 128, 96, "fisheye"
        )
        # principal point maps to itself
        assert abs(xs[48, 64] - 64) < 0.5 and abs(ys[48, 64] - 48) < 0.5
        # fisheye compresses the periphery: source radius < dest radius
        r_dst = np.hypot(120 - 64, 90 - 48)
        r_src = np.hypot(xs[90, 120] - 64, ys[90, 120] - 48)
        assert r_src < r_dst
        assert valid[48, 64] and valid.mean() > 0.5

    def test_fisheye_roundtrip_distort(self):
        """Remap of a synthetic distorted image restores straight-line
        structure: the undistorted image of a distorted vertical edge is
        (near) vertical again."""
        import numpy as np

        from splat_one_tpu.data.opensfm import undistort_image

        H, W = 96, 128
        K = np.array([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]])
        k = np.array([-0.08, 0.004, 0.0, 0.0])
        # build the distorted image by forward-sampling a vertical-stripe
        # pattern through the same model the undistorter inverts
        from splat_one_tpu.data.opensfm import undistort_maps

        xs, ys, valid = undistort_maps(K, k, W, H, "fisheye")
        pattern = np.zeros((H, W, 3), np.float32)
        pattern[:, (np.arange(W) // 8) % 2 == 0] = 1.0
        # distorted image: dist(x) holds pattern at undistorted coords
        # (xs, ys map undistorted -> distorted, so fill by scatter)
        dist_img = np.zeros((H, W, 3), np.float32)
        xi = np.clip(np.round(xs).astype(int), 0, W - 1)
        yi = np.clip(np.round(ys).astype(int), 0, H - 1)
        dist_img[yi, xi] = pattern
        und = undistort_image(dist_img, K, k, camera_type="fisheye")
        # stripes should re-align vertically: column-wise variance of the
        # recovered pattern is high where stripes exist, and rows agree
        mid = und[H // 2 - 10: H // 2 + 10, :, 0]
        agree = (np.abs(mid - mid.mean(axis=0, keepdims=True)) < 0.45).mean()
        assert agree > 0.7


class TestGpsAlignment:
    def test_umeyama_alignment(self, rng):
        import numpy as np

        from splat_one_tpu.sfm.ba import _rodrigues
        from splat_one_tpu.sfm.reconstruct import (
            Reconstruction, align_reconstruction_to_gps, _rvec_from_R,
        )
        import jax.numpy as jnp

        # ground-truth similarity
        s_gt = 2.5
        ang = 0.4
        R_gt = np.array([
            [np.cos(ang), -np.sin(ang), 0],
            [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
        t_gt = np.array([10.0, -4.0, 2.0])
        poses, gps = {}, {}
        pts = {}
        for i in range(6):
            c = rng.normal(size=3)
            Rc = np.eye(3)
            poses[i] = np.concatenate(
                [_rvec_from_R(Rc), -Rc @ c]).astype(np.float32)
            gps[i] = s_gt * R_gt @ c + t_gt + rng.normal(0, 1e-3, 3)
        for j in range(10):
            pts[j] = rng.normal(size=3).astype(np.float32)
        rec = Reconstruction(poses, pts, {})
        rec2, info = align_reconstruction_to_gps(rec, gps)
        assert info["aligned"] and info["rmse_m"] < 0.01
        assert abs(info["scale"] - s_gt) < 0.01
        # camera centers now match GPS
        for i in range(6):
            pose = rec2.poses[i]
            Rc = np.asarray(_rodrigues(jnp.asarray(pose[:3])))
            c = -Rc.T @ pose[3:]
            assert np.linalg.norm(c - gps[i]) < 0.02
        # points transformed consistently
        X0 = rec.points[0]
        np.testing.assert_allclose(
            rec2.points[0], s_gt * R_gt @ X0 + t_gt, rtol=1e-3, atol=2e-3
        )
