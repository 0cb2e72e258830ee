"""End-to-end SfM pipeline tests: detector, matcher, tracks, incremental
reconstruction — on synthetic scenes with known ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splat_one_tpu.sfm import features as F
from splat_one_tpu.sfm import matching as M
from splat_one_tpu.sfm import reconstruct as RC
from splat_one_tpu.sfm import tracks as T
from splat_one_tpu.sfm.ba import _rodrigues


class TestDetector:
    def test_detects_blobs(self):
        # image with gaussian blobs at known locations
        rng = np.random.default_rng(0)
        H = W = 128
        img = np.zeros((H, W), np.float32)
        centers = [(40, 40), (40, 90), (90, 40), (90, 90), (64, 64)]
        yy, xx = np.mgrid[0:H, 0:W]
        for cy, cx in centers:
            img += np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 3.0**2))
        img += rng.normal(0, 0.01, img.shape).astype(np.float32)
        feats = F.extract_features(jnp.asarray(img), max_keypoints=64)
        kp = np.asarray(feats.xys)[np.asarray(feats.valid)]
        assert len(kp) >= len(centers)
        # each blob must have a keypoint within a few pixels
        for cy, cx in centers:
            d = np.linalg.norm(kp - np.array([cx, cy]), axis=-1).min()
            assert d < 4.0, (cy, cx, d)

    def test_descriptor_shift_invariance(self):
        # same texture, translated image -> matched descriptors
        rng = np.random.default_rng(1)
        base = rng.uniform(size=(160, 160)).astype(np.float32)
        # smooth to make it band-limited
        import scipy.ndimage as ndi

        base = ndi.gaussian_filter(base, 2.0).astype(np.float32)
        img1 = base[16:144, 16:144]
        img2 = base[20:148, 12:140]  # shifted by (+4, -4)
        f1 = F.extract_features(jnp.asarray(img1), max_keypoints=256)
        f2 = F.extract_features(jnp.asarray(img2), max_keypoints=256)
        idx2, ok = M.match_descriptors(
            f1.descriptors, f2.descriptors, f1.valid, f2.valid
        )
        ok = np.asarray(ok)
        assert ok.sum() >= 20
        xy1 = np.asarray(f1.xys)[ok]
        xy2 = np.asarray(f2.xys)[np.asarray(idx2)[ok]]
        shift = xy2 - xy1  # expect (+4, -4) in (x, y)
        med = np.median(shift, axis=0)
        np.testing.assert_allclose(med, [4.0, -4.0], atol=1.0)


def synth_multiview(n_cams=8, n_pts=300, noise=5e-4, seed=0):
    """Cameras on an arc viewing a point cloud; per-point descriptors."""
    rng = np.random.default_rng(seed)
    X = rng.uniform(-1, 1, (n_pts, 3))
    X[:, 2] += 6
    desc = rng.normal(size=(n_pts, 128)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    poses, bearings, descs, valids = [], [], [], []
    for c in range(n_cams):
        rvec = np.array([0.0, -0.25 + 0.06 * c, 0.0])
        t = np.array([1.2 - 0.35 * c, 0.02 * c, 0.0])
        pose = np.concatenate([rvec, t]).astype(np.float32)
        R = np.asarray(_rodrigues(jnp.asarray(rvec)))
        p = X @ R.T + t
        b = p / np.linalg.norm(p, axis=-1, keepdims=True)
        b += rng.normal(0, noise, b.shape)
        b /= np.linalg.norm(b, axis=-1, keepdims=True)
        poses.append(pose)
        bearings.append(b.astype(np.float32))
        d = desc + rng.normal(0, 0.05, desc.shape).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        descs.append(d)
        valids.append(np.ones(n_pts, bool))
    return np.stack(poses), X, bearings, descs, valids


class TestPipeline:
    def test_matching_and_tracks(self):
        poses, X, bearings, descs, valids = synth_multiview(4, 100)
        pairs = M.pairs_to_match(4)
        matches = M.match_pairs_brute_force(descs, valids, pairs)
        # descriptors are per-point: match i->i dominates
        for (i, j), m in matches.items():
            correct = (m[:, 0] == m[:, 1]).mean()
            assert correct > 0.9
        tracks, track_of = T.build_tracks(
            matches, [100] * 4, min_track_length=2
        )
        assert len(tracks) > 80
        long = [t for t in tracks if len(t) == 4]
        assert len(long) > 50

    def test_batched_matching_equals_sequential(self):
        """match_pairs_batched must reproduce match_pairs_brute_force
        exactly (same math, batched dispatch), including ragged K."""
        poses, X, bearings, descs, valids = synth_multiview(5, 120)
        # make image 2 ragged: fewer features than the rest
        descs[2] = descs[2][:90]
        valids[2] = valids[2][:90]
        pairs = M.pairs_to_match(5)
        seq = M.match_pairs_brute_force(descs, valids, pairs)
        for bp in (3, 16):  # non-divisor and larger-than-set batch
            bat = M.match_pairs_batched(descs, valids, pairs,
                                        batch_pairs=bp)
            assert set(bat) == set(seq)
            for p in seq:
                assert np.array_equal(bat[p], seq[p]), p

    def test_batched_verification_filters_outliers(self):
        """Batched RANSAC verification keeps geometric inliers and drops
        planted outliers, with the same accept/reject rule as the
        sequential path."""
        poses, X, bearings, descs, valids = synth_multiview(4, 150)
        pairs = M.pairs_to_match(4)
        raw = M.match_pairs_batched(descs, valids, pairs)
        # plant gross outliers in one pair
        rng = np.random.default_rng(7)
        key_pair = (0, 1)
        m = raw[key_pair]
        bad = np.stack([rng.permutation(150)[:25],
                        rng.permutation(150)[:25]], axis=-1)
        raw[key_pair] = np.concatenate([m, bad])
        filt = M.robust_filter_matches_batched(
            jax.random.PRNGKey(0), raw, bearings, threshold=0.008)
        fm = filt[key_pair]
        assert len(fm) >= 0.8 * len(m)
        good = (fm[:, 0] == fm[:, 1]).mean()
        assert good > 0.95
        # tiny pairs are rejected outright (min_matches rule)
        raw2 = {(0, 1): raw[key_pair][:5]}
        filt2 = M.robust_filter_matches_batched(
            jax.random.PRNGKey(0), raw2, bearings)
        assert len(filt2[(0, 1)]) == 0

    @pytest.mark.slow
    def test_incremental_reconstruction(self):
        poses_gt, X, bearings, descs, valids = synth_multiview(8, 300)
        pairs = M.pairs_to_match(8)
        matches = M.match_pairs_brute_force(descs, valids, pairs)
        key = jax.random.PRNGKey(0)
        filtered, counts = {}, {}
        for (i, j), m in matches.items():
            key, k1 = jax.random.split(key)
            fm = M.robust_filter_matches(
                k1, m, bearings[i], bearings[j]
            )
            filtered[(i, j)] = fm
            counts[(i, j)] = len(fm)
        tracks, _ = T.build_tracks(filtered, [300] * 8, 2)
        rec = RC.incremental_reconstruct(
            bearings, tracks, counts,
            RC.ReconstructConfig(bundle_interval=3),
        )
        assert len(rec.poses) == 8, rec.report
        assert len(rec.points) > 200, rec.report

        # compare camera CENTERS up to a similarity transform (Umeyama)
        def centers(poses_dict_or_arr):
            out = []
            for c in range(8):
                p = (
                    poses_dict_or_arr[c]
                    if isinstance(poses_dict_or_arr, dict)
                    else poses_dict_or_arr[c]
                )
                R = np.asarray(_rodrigues(jnp.asarray(p[:3])))
                out.append(-R.T @ p[3:])
            return np.stack(out)

        c_gt = centers(poses_gt)
        c_est = centers(rec.poses)
        # Umeyama alignment
        mu_g, mu_e = c_gt.mean(0), c_est.mean(0)
        A = (c_gt - mu_g).T @ (c_est - mu_e)
        U, s, Vt = np.linalg.svd(A)
        D = np.diag([1, 1, np.sign(np.linalg.det(U @ Vt))])
        R_al = U @ D @ Vt
        scale = np.trace(np.diag(s) @ D) / ((c_est - mu_e) ** 2).sum()
        aligned = scale * (c_est - mu_e) @ R_al.T + mu_g
        err = np.linalg.norm(aligned - c_gt, axis=-1).max()
        spread = np.linalg.norm(c_gt - mu_g, axis=-1).mean()
        assert err < 0.05 * spread, (err, spread, rec.report)


class TestAttemptSelection:
    """The retry wrapper must reject self-consistent-but-wrong minima:
    pure-rotation collapse (degeneracy test) and warped minima that prune
    observations (retention test) — the r4 200-image spiral and the r5
    ring regressions respectively."""

    def _mk_rec(self, n_cams, centers, points, report=None):
        poses = {}
        for i, c in enumerate(centers[:n_cams]):
            # identity rotation, center c -> t = -c
            poses[i] = np.concatenate(
                [np.zeros(3), -np.asarray(c, np.float32)]).astype(
                np.float32)
        pts = {i: np.asarray(p, np.float32)
               for i, p in enumerate(points)}
        return RC.Reconstruction(poses, pts, report or {"steps": []})

    def test_selection_prefers_retention(self, monkeypatch):
        """Attempt 0: complete + tight residual but low retention (a
        warped minimum). Attempt 1: same completeness, higher retention.
        The wrapper must continue past attempt 0 and return attempt 1."""
        rng = np.random.default_rng(0)
        ring = [(np.cos(a), np.sin(a), 0.0)
                for a in np.linspace(0, 2 * np.pi, 6, endpoint=False)]
        pts_all = rng.uniform(-1, 1, (40, 3)) + [0, 0, 5]
        # tracks: every point seen by all 6 cameras
        tracks = [{img: 0 for img in range(6)} for _ in range(40)]
        bearings = [np.tile([[0, 0, 1.0]], (1, 1)).astype(np.float32)
                    for _ in range(6)]

        recs = [
            self._mk_rec(6, ring, pts_all[:24]),  # 60% of obs retained
            self._mk_rec(6, ring, pts_all[:38]),  # 95% retained
            self._mk_rec(6, ring, pts_all[:20]),
        ]
        calls = {"n": 0}

        def fake_attempt(bearings, tracks, pair_inliers, cfg, seed,
                         snapshot, gps_positions, init_skip=0):
            r = recs[min(init_skip, len(recs) - 1)]
            calls["n"] += 1
            return r

        monkeypatch.setattr(RC, "_reconstruct_attempt", fake_attempt)
        monkeypatch.setattr(RC, "_median_residual",
                            lambda rec, b, t: 1e-5)
        rec = RC.incremental_reconstruct(
            bearings, tracks, {}, RC.ReconstructConfig(init_retries=3))
        assert calls["n"] >= 2  # did NOT early-stop on the pruned attempt
        assert len(rec.points) == 38  # the high-retention attempt won
        assert rec.report["obs_retention"] == pytest.approx(
            38 * 6 / 240)

    def test_selection_rejects_pure_rotation_collapse(self, monkeypatch):
        """A collapsed solution (all centers coincident, points far) must
        lose to a healthy one even when it registers equal cameras and
        carries a smaller residual."""
        rng = np.random.default_rng(1)
        ring = [(np.cos(a), np.sin(a), 0.0)
                for a in np.linspace(0, 2 * np.pi, 6, endpoint=False)]
        collapsed_centers = [(1e-4 * rng.normal(), 1e-4 * rng.normal(),
                              0.0) for _ in range(6)]
        far_pts = rng.normal(size=(40, 3)) * 5 + [0, 0, 100]
        near_pts = rng.uniform(-1, 1, (40, 3)) + [0, 0, 5]
        tracks = [{img: 0 for img in range(6)} for _ in range(40)]
        bearings = [np.tile([[0, 0, 1.0]], (1, 1)).astype(np.float32)
                    for _ in range(6)]
        recs = [
            self._mk_rec(6, collapsed_centers, far_pts),  # degenerate
            self._mk_rec(6, ring, near_pts),
        ]

        def fake_attempt(bearings, tracks, pair_inliers, cfg, seed,
                         snapshot, gps_positions, init_skip=0):
            return recs[min(init_skip, len(recs) - 1)]

        monkeypatch.setattr(RC, "_reconstruct_attempt", fake_attempt)
        monkeypatch.setattr(RC, "_median_residual",
                            lambda rec, b, t: 1e-5)
        rec = RC.incremental_reconstruct(
            bearings, tracks, {}, RC.ReconstructConfig(init_retries=2))
        assert not rec.report["degenerate"]
        C = np.stack([-RC._R_of(p[:3]).T @ p[3:]
                      for p in rec.poses.values()])
        assert np.linalg.norm(C - C.mean(0), axis=1).mean() > 0.5


class TestVladPairs:
    def test_vlad_selects_similar_images(self, rng):
        import numpy as np

        from splat_one_tpu.sfm.matching import pairs_to_match

        # two visually distinct groups of images: descriptors drawn around
        # group-specific prototypes
        D, K = 32, 64
        protos = rng.normal(size=(2, 4, D))
        descs = []
        for i in range(8):
            g = i // 4
            base = protos[g][rng.integers(0, 4, K)]
            d = base + rng.normal(0, 0.1, (K, D))
            descs.append(
                (d / np.linalg.norm(d, axis=1, keepdims=True)
                 ).astype(np.float32)
            )
        pairs = pairs_to_match(
            8, descriptors=descs, vlad_neighbors=2
        )
        # neighbours should overwhelmingly come from the same group
        same = sum(1 for i, j in pairs if i // 4 == j // 4)
        assert same / len(pairs) > 0.7, pairs


class TestGPSBundle:
    @pytest.mark.slow
    def test_bundle_use_gps_lands_in_gps_frame(self):
        """cfg.bundle_use_gps: per-bundle alignment + center priors put
        the reconstruction directly in the GPS frame (reference
        config.yaml:132), no separate post-alignment needed."""
        poses_gt, X, bearings, descs, valids = synth_multiview(8, 300)
        pairs = M.pairs_to_match(8)
        matches = M.match_pairs_brute_force(descs, valids, pairs)
        key = jax.random.PRNGKey(0)
        filtered, counts = {}, {}
        for (i, j), m in matches.items():
            key, k1 = jax.random.split(key)
            fm = M.robust_filter_matches(k1, m, bearings[i], bearings[j])
            filtered[(i, j)] = fm
            counts[(i, j)] = len(fm)
        tracks, _ = T.build_tracks(filtered, [300] * 8, 2)

        def center(p):
            R = np.asarray(_rodrigues(jnp.asarray(p[:3])))
            return -R.T @ p[3:]

        # "GPS" = true centers in a shifted+scaled world frame, noisy
        rng = np.random.default_rng(3)
        gps = {
            c: 4.0 * center(poses_gt[c]) + np.array([100.0, 50.0, 7.0])
            + rng.normal(0, 0.02, 3)
            for c in range(8)
        }
        rec = RC.incremental_reconstruct(
            bearings, tracks, counts,
            RC.ReconstructConfig(bundle_interval=3, bundle_use_gps=True,
                                 gps_sd_m=0.05),
            gps_positions=gps,
        )
        assert len(rec.poses) == 8, rec.report
        errs = [np.linalg.norm(center(rec.poses[c]) - gps[c])
                for c in range(8)]
        # centers land in the absolute GPS frame (scene spread ~ 4x1.2 m)
        assert max(errs) < 0.25, (errs, rec.report)


class TestOrientationAlignment:
    def test_horizontal_prior_levels_the_world(self):
        """align_orientation_prior: horizontal (config.yaml:130-131) — a
        scene reconstructed in a tilted frame is rotated so the mean
        camera-down direction becomes -Z (Z-up world)."""
        from splat_one_tpu.sfm.rigs import _R_to_rvec, _rvec_to_R

        rng = np.random.default_rng(0)
        tilt = _rvec_to_R(np.array([np.deg2rad(25), 0, 0]))
        poses, pts = {}, {}
        for i in range(6):
            R_cam = _rvec_to_R(np.array([0, 0.3 * i, 0]))  # level, yawing
            R_w2c = R_cam @ tilt.T
            c = tilt @ np.array([np.sin(0.3 * i), 0, np.cos(0.3 * i)])
            poses[i] = np.concatenate(
                [_R_to_rvec(R_w2c), -R_w2c @ c]).astype(np.float32)
        for t in range(40):
            pts[t] = (tilt @ rng.uniform(-1, 1, 3)).astype(np.float32)
        rec = RC.Reconstruction(poses, pts, {})
        rec2, info = RC.align_reconstruction_orientation(rec, "horizontal")
        assert info["aligned"]
        downs = np.stack([
            np.asarray(_rvec_to_R(p[:3]))[1] for p in rec2.poses.values()
        ])
        g = downs.mean(0)
        g /= np.linalg.norm(g)
        assert np.allclose(g, [0, 0, -1], atol=1e-5)
        # rigid: pairwise camera distances preserved
        def centers(r):
            return np.stack([
                -_rvec_to_R(p[:3]).T @ p[3:] for p in r.poses.values()])
        d1 = np.linalg.norm(centers(rec)[0] - centers(rec)[3])
        d2 = np.linalg.norm(centers(rec2)[0] - centers(rec2)[3])
        assert abs(d1 - d2) < 1e-5
