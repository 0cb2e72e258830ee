"""SfM geometry + bundle adjustment tests on synthetic scenes with known GT."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splat_one_tpu.sfm import ba, geometry as geo


def synth_two_view(n=100, noise=0.0, outliers=0.0, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-1, 1, (n, 3))
    X[:, 2] += 4.0
    # camera 1 at origin; camera 2 rotated + translated
    aa = np.array([0.05, -0.1, 0.02])
    from splat_one_tpu.sfm.ba import _rodrigues

    R = np.asarray(_rodrigues(jnp.asarray(aa)))
    t = np.array([0.8, 0.1, -0.05])
    b1 = X / np.linalg.norm(X, axis=-1, keepdims=True)
    X2 = X @ R.T + t
    b2 = X2 / np.linalg.norm(X2, axis=-1, keepdims=True)
    if noise > 0:
        b1 = b1 + rng.normal(0, noise, b1.shape)
        b2 = b2 + rng.normal(0, noise, b2.shape)
        b1 /= np.linalg.norm(b1, axis=-1, keepdims=True)
        b2 /= np.linalg.norm(b2, axis=-1, keepdims=True)
    n_out = int(outliers * n)
    if n_out:
        d = rng.normal(size=(n_out, 3))
        b2[:n_out] = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return (
        jnp.asarray(b1, jnp.float32),
        jnp.asarray(b2, jnp.float32),
        R, t, X,
    )


class TestTwoView:
    def test_essential_exact(self):
        b1, b2, R, t, X = synth_two_view(100)
        res = geo.ransac_essential(
            jax.random.PRNGKey(0), b1, b2, jnp.ones(100, bool)
        )
        assert int(res.n_inliers) >= 95
        # E should satisfy the epipolar constraint for all inliers
        errs = np.asarray(geo._epipolar_angle_error(res.E, b1, b2))
        assert np.median(errs) < 1e-4

    def test_ransac_with_outliers(self):
        b1, b2, R, t, X = synth_two_view(200, noise=1e-3, outliers=0.3)
        # threshold ~4x the bearing noise (GT-E inlier p90 error is 2.3e-3)
        res = geo.ransac_essential(
            jax.random.PRNGKey(1), b1, b2, jnp.ones(200, bool),
            threshold=0.008,
        )
        inl = np.asarray(res.inliers)
        # outliers are the first 60 entries
        assert inl[:60].sum() < 10
        assert inl[60:].sum() > 110

    def test_decompose_recovers_pose(self):
        b1, b2, R, t, X = synth_two_view(100)
        res = geo.ransac_essential(
            jax.random.PRNGKey(0), b1, b2, jnp.ones(100, bool)
        )
        R_est, t_est, n_good = geo.decompose_essential(
            res.E, b1, b2, res.inliers
        )
        assert int(n_good) > 90
        np.testing.assert_allclose(np.asarray(R_est), R, atol=2e-3)
        t_dir = np.asarray(t_est) / np.linalg.norm(t_est)
        np.testing.assert_allclose(
            t_dir, t / np.linalg.norm(t), atol=2e-3
        )

    def test_triangulation(self):
        b1, b2, R, t, X = synth_two_view(50)
        eye = jnp.eye(3)
        zero = jnp.zeros(3)
        Xr = geo.triangulate(
            eye, zero, jnp.asarray(R, jnp.float32),
            jnp.asarray(t, jnp.float32), b1, b2,
        )
        np.testing.assert_allclose(np.asarray(Xr), X, atol=1e-3)

    def test_pnp(self):
        rng = np.random.default_rng(3)
        X = rng.uniform(-1, 1, (60, 3))
        X[:, 2] += 4
        from splat_one_tpu.sfm.ba import _rodrigues

        R = np.asarray(_rodrigues(jnp.asarray([0.2, -0.1, 0.3])))
        t = np.array([0.5, -0.2, 0.1])
        p = X @ R.T + t
        b = p / np.linalg.norm(p, axis=-1, keepdims=True)
        R_est, t_est, inl, n = geo.ransac_pnp(
            jax.random.PRNGKey(0),
            jnp.asarray(X, jnp.float32),
            jnp.asarray(b, jnp.float32),
            jnp.ones(60, bool),
        )
        assert int(n) >= 55
        np.testing.assert_allclose(np.asarray(R_est), R, atol=1e-3)
        np.testing.assert_allclose(np.asarray(t_est), t, atol=5e-3)


class TestBundleAdjust:
    def make_problem(self, n_cams=6, n_pts=200, noise=2e-3, seed=0):
        rng = np.random.default_rng(seed)
        X = rng.uniform(-1, 1, (n_pts, 3))
        X[:, 2] += 5
        cams_gt = []
        for i in range(n_cams):
            rvec = rng.normal(0, 0.1, 3)
            t = np.array([i * 0.4 - 1.0, 0, 0]) + rng.normal(0, 0.05, 3)
            cams_gt.append(np.concatenate([rvec, t]))
        cams_gt = np.stack(cams_gt).astype(np.float32)
        cam_idx, pt_idx, bearings = [], [], []
        from splat_one_tpu.sfm.ba import _rodrigues

        for c in range(n_cams):
            R = np.asarray(_rodrigues(jnp.asarray(cams_gt[c, :3])))
            p = X @ R.T + cams_gt[c, 3:]
            b = p / np.linalg.norm(p, axis=-1, keepdims=True)
            b = b + rng.normal(0, noise, b.shape)
            b /= np.linalg.norm(b, axis=-1, keepdims=True)
            cam_idx += [c] * n_pts
            pt_idx += list(range(n_pts))
            bearings.append(b)
        problem = ba.build_problem(
            np.array(cam_idx), np.array(pt_idx),
            np.concatenate(bearings), n_cams, n_pts,
        )
        return cams_gt, X.astype(np.float32), problem

    def test_ba_reduces_cost_and_recovers(self):
        cams_gt, X, problem = self.make_problem(noise=1e-3)
        rng = np.random.default_rng(1)
        cams0 = cams_gt + rng.normal(0, 0.02, cams_gt.shape).astype(
            np.float32
        )
        cams0[0] = cams_gt[0]  # gauge: first camera fixed at GT
        X0 = X + rng.normal(0, 0.05, X.shape).astype(np.float32)
        cams_opt, X_opt, info = ba.bundle_adjust(
            jnp.asarray(cams0), jnp.asarray(X0), problem,
            ba.BAConfig(max_iterations=15, cg_iterations=25),
        )
        # cost is the gauge-invariant convergence criterion (the scale
        # gauge is free with bearing-only residuals and one fixed camera)
        assert float(info["final_cost"]) < float(info["initial_cost"]) * 0.02
        err0 = np.abs(cams0 - cams_gt).max()
        err1 = np.abs(np.asarray(cams_opt) - cams_gt).max()
        assert err1 < err0 * 0.5, (err0, err1)

    def test_ba_robust_loss_with_outliers(self):
        cams_gt, X, problem = self.make_problem(noise=5e-4)
        # corrupt 5% of observations
        b = np.array(problem.bearings)  # writable copy
        rng = np.random.default_rng(2)
        n_out = int(0.05 * len(b))
        idx = rng.choice(len(b), n_out, replace=False)
        d = rng.normal(size=(n_out, 3))
        b[idx] = d / np.linalg.norm(d, axis=-1, keepdims=True)
        problem = problem._replace(bearings=jnp.asarray(b))
        cams0 = cams_gt + rng.normal(0, 0.01, cams_gt.shape).astype(
            np.float32
        )
        cams0[0] = cams_gt[0]
        X0 = X + rng.normal(0, 0.03, X.shape).astype(np.float32)
        cams_opt, X_opt, info = ba.bundle_adjust(
            jnp.asarray(cams0), jnp.asarray(X0), problem,
            ba.BAConfig(
                max_iterations=15, loss="soft_l1", loss_scale=0.002
            ),
        )
        err1 = np.abs(np.asarray(cams_opt)[1:] - cams_gt[1:]).max()
        assert err1 < 0.02, err1
        # and the robust kernel must beat a plain quadratic loss
        cams_lin, _, _ = ba.bundle_adjust(
            jnp.asarray(cams0), jnp.asarray(X0), problem,
            ba.BAConfig(max_iterations=15, loss="linear"),
        )
        err_lin = np.abs(np.asarray(cams_lin)[1:] - cams_gt[1:]).max()
        assert err1 < err_lin


class TestFivePoint:
    """Minimal 5-point solver: must recover relative pose where the linear
    8-point solver is degenerate (all points on one plane) and match it on
    general scenes (reference config surface config/config.yaml:79-90)."""

    def _two_view(self, rng, planar: bool, n=60, noise=0.0):
        import numpy as np

        if planar:
            pts = np.stack(
                [rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                 np.full(n, 4.0)], axis=1)
        else:
            pts = np.stack(
                [rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                 rng.uniform(3, 6, n)], axis=1)
        ang = 0.15
        R = np.array([
            [np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
            [-np.sin(ang), 0, np.cos(ang)]])
        t = np.array([0.6, 0.1, 0.05])
        p1 = pts
        p2 = pts @ R.T + t
        b1 = p1 / np.linalg.norm(p1, axis=1, keepdims=True)
        b2 = p2 / np.linalg.norm(p2, axis=1, keepdims=True)
        if noise:
            b1 = b1 + rng.normal(0, noise, b1.shape)
            b2 = b2 + rng.normal(0, noise, b2.shape)
            b1 /= np.linalg.norm(b1, axis=1, keepdims=True)
            b2 /= np.linalg.norm(b2, axis=1, keepdims=True)
        return b1.astype(np.float32), b2.astype(np.float32), R, t

    def _pose_err(self, E, b1, b2, R_gt, t_gt):
        import numpy as np

        R, t, _ = geo.decompose_essential(
            jnp.asarray(E), jnp.asarray(b1), jnp.asarray(b2),
            jnp.ones(len(b1), bool))
        R, t = np.asarray(R), np.asarray(t)
        ang = np.degrees(np.arccos(np.clip((np.trace(R @ R_gt.T) - 1) / 2,
                                           -1, 1)))
        tdir = t / np.linalg.norm(t)
        gdir = t_gt / np.linalg.norm(t_gt)
        terr = np.degrees(np.arccos(np.clip(abs(tdir @ gdir), -1, 1)))
        return ang, terr

    def test_planar_scene(self, rng):
        b1, b2, R_gt, t_gt = self._two_view(rng, planar=True)
        valid = jnp.ones(len(b1), bool)
        res = geo.ransac_essential(
            jax.random.PRNGKey(0), jnp.asarray(b1), jnp.asarray(b2),
            valid, solver="5pt", n_hyp=64)
        ang, terr = self._pose_err(res.E, b1, b2, R_gt, t_gt)
        assert ang < 2.0 and terr < 3.0, (ang, terr)

    def test_general_scene_with_noise(self, rng):
        b1, b2, R_gt, t_gt = self._two_view(rng, planar=False, noise=1e-4)
        valid = jnp.ones(len(b1), bool)
        res = geo.ransac_essential(
            jax.random.PRNGKey(0), jnp.asarray(b1), jnp.asarray(b2),
            valid, solver="5pt", n_hyp=64)
        assert int(res.n_inliers) > 50
        ang, terr = self._pose_err(res.E, b1, b2, R_gt, t_gt)
        assert ang < 1.0 and terr < 2.0, (ang, terr)


def rigs_R(rvec):
    from splat_one_tpu.sfm.rigs import _rvec_to_R
    return _rvec_to_R(np.asarray(rvec))


class TestBAPriors:
    """GCP point priors + GPS camera-center priors inside BA
    (reference config.yaml:132-133 bundle_use_gps / bundle_use_gcp)."""

    def _offset_problem(self):
        tb = TestBundleAdjust()
        cams_gt, X, problem = tb.make_problem(noise=1e-3)
        # offset the whole initialization by a rigid translation: plain BA
        # cannot recover the absolute frame (gauge freedom)
        off = np.array([0.3, -0.2, 0.4], np.float32)
        rng = np.random.default_rng(5)
        cams0 = cams_gt.copy()
        for c in range(len(cams0)):
            R = np.asarray(rigs_R(cams0[c, :3]))
            cams0[c, 3:] -= R @ off  # world shifted by +off
        X0 = (X + off + rng.normal(0, 0.01, X.shape)).astype(np.float32)
        return cams_gt, X, problem, cams0, X0, off

    def test_gcp_point_priors_pin_absolute_frame(self):
        cams_gt, X, problem, cams0, X0, off = self._offset_problem()
        cfg = ba.BAConfig(max_iterations=15, cg_iterations=25,
                          fix_first_camera=False)
        # no priors: stays (up to gauge) in the offset frame
        _, X_free, _ = ba.bundle_adjust(
            jnp.asarray(cams0), jnp.asarray(X0), problem, cfg)
        assert np.abs(np.asarray(X_free) - X).mean() > 0.1

        w = np.zeros(len(X), np.float32)
        w[:5] = 1e4  # 5 ground control points, strongly pinned
        pos = jnp.asarray(X.astype(np.float32))
        cams_p, X_p, info = ba.bundle_adjust(
            jnp.asarray(cams0), jnp.asarray(X0), problem, cfg,
            point_priors=(pos, jnp.asarray(w)))
        assert np.abs(np.asarray(X_p) - X).mean() < 0.01
        # cameras follow into the GT frame too
        err = np.abs(np.asarray(cams_p) - cams_gt).max()
        assert err < 0.02

    def test_gps_camera_priors_pin_absolute_frame(self):
        cams_gt, X, problem, cams0, X0, off = self._offset_problem()
        cfg = ba.BAConfig(max_iterations=15, cg_iterations=25,
                          fix_first_camera=False)
        centers_gt = np.stack([
            -rigs_R(c[:3]).T @ c[3:] for c in cams_gt
        ]).astype(np.float32)
        w = np.full(len(cams_gt), 1e3, np.float32)
        cams_p, X_p, info = ba.bundle_adjust(
            jnp.asarray(cams0), jnp.asarray(X0), problem, cfg,
            cam_pos_priors=(jnp.asarray(centers_gt), jnp.asarray(w)))
        centers = np.stack([
            -rigs_R(c[:3]).T @ c[3:] for c in np.asarray(cams_p)
        ])
        assert np.abs(centers - centers_gt).mean() < 0.01
        assert np.abs(np.asarray(X_p) - X).mean() < 0.02
