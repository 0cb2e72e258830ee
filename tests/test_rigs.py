"""Camera-rig calibration / enforcement / constrained BA (sfm.rigs).

Capability pinned: OpenSfM rig support used by the reference
(/root/reference/config/config.yaml:108-110, 137-140)."""

import numpy as np
import jax.numpy as jnp
import pytest

from splat_one_tpu.sfm import ba, rigs


def _rand_pose(rng, rot_scale=0.5, t_scale=1.0):
    return np.concatenate([
        rng.normal(0, rot_scale, 3), rng.normal(0, t_scale, 3)
    ])


class TestPoseOps:
    def test_compose_invert_roundtrip(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            a = _rand_pose(rng, rot_scale=1.2)
            b = _rand_pose(rng, rot_scale=1.2)
            ab = rigs.compose(a, b)
            b2 = rigs.compose(rigs.invert(a), ab)
            # rvec is not unique (theta vs 2pi-theta): compare the maps
            assert np.allclose(rigs._rvec_to_R(b2[:3]),
                               rigs._rvec_to_R(b[:3]), atol=1e-9)
            assert np.allclose(b2[3:], b[3:], atol=1e-9)

    def test_rvec_roundtrip_near_pi(self):
        for th in (1e-8, 0.3, np.pi - 1e-4, np.pi - 1e-7):
            r = np.array([0.6, -0.48, 0.64]) / 1.0
            r = r / np.linalg.norm(r) * th
            R = rigs._rvec_to_R(r)
            r2 = rigs._R_to_rvec(R)
            assert np.allclose(rigs._rvec_to_R(r2), R, atol=1e-6)

    def test_average_poses(self):
        rng = np.random.default_rng(1)
        base = _rand_pose(rng)
        noisy = [
            rigs.compose(
                np.concatenate([rng.normal(0, 0.01, 3),
                                rng.normal(0, 0.01, 3)]), base)
            for _ in range(40)
        ]
        avg = rigs.average_poses(noisy)
        assert np.allclose(rigs._rvec_to_R(avg[:3]),
                           rigs._rvec_to_R(base[:3]), atol=0.02)
        assert np.allclose(avg[3:], base[3:], atol=0.02)


def _make_rig_scene(n_inst=8, n_pts=60, noise=2e-3, seed=0):
    """Stereo rig orbiting a point cloud: returns GT poses/points, the
    BA problem, assignments, and GT relative."""
    rng = np.random.default_rng(seed)
    X = rng.uniform(-1, 1, (n_pts, 3)).astype(np.float32)
    rel = np.array([0.0, 0.05, 0.0, 0.2, 0.0, 0.01])  # right camera
    instances = {}
    poses = {}
    assignments = {}
    for i in range(n_inst):
        ang = 2 * np.pi * i / n_inst
        c = np.array([3 * np.sin(ang), 0.3 * np.sin(2 * ang),
                      3 * np.cos(ang)])
        # look at origin
        z = -c / np.linalg.norm(c)
        x = np.cross(np.array([0, 1.0, 0]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])  # world->cam rows
        inst = np.concatenate([rigs._R_to_rvec(R), -R @ c])
        instances[f"i{i}"] = inst
        poses[f"s{i}_L"] = inst
        poses[f"s{i}_R"] = rigs.compose(rel, inst)
        assignments[f"i{i}"] = [(f"s{i}_L", "camL"), (f"s{i}_R", "camR")]
    shot_ids = sorted(poses)
    cams_gt = np.stack([poses[s] for s in shot_ids]).astype(np.float32)
    cam_idx, pt_idx, bearings = [], [], []
    for ci, s in enumerate(shot_ids):
        R = rigs._rvec_to_R(cams_gt[ci, :3])
        p = X @ R.T + cams_gt[ci, 3:]
        b = p / np.linalg.norm(p, axis=-1, keepdims=True)
        b = b + rng.normal(0, noise, b.shape)
        b /= np.linalg.norm(b, axis=-1, keepdims=True)
        cam_idx += [ci] * n_pts
        pt_idx += list(range(n_pts))
        bearings.append(b)
    problem = ba.build_problem(
        np.array(cam_idx), np.array(pt_idx),
        np.concatenate(bearings).astype(np.float32),
        len(shot_ids), n_pts,
    )
    return (cams_gt, X, problem, shot_ids, assignments, rel, poses)


class TestRigCalibration:
    def test_calibrate_recovers_relative(self):
        _, _, _, _, assignments, rel, poses = _make_rig_scene()
        rng = np.random.default_rng(2)
        noisy = {
            s: rigs.compose(np.concatenate([
                rng.normal(0, 0.005, 3), rng.normal(0, 0.005, 3)]), p)
            for s, p in poses.items()
        }
        cal = rigs.calibrate_rigs(noisy, assignments)
        assert set(cal) == {"camL", "camR"}
        assert np.allclose(cal["camL"], 0.0)  # anchor
        assert np.allclose(cal["camR"][:3], rel[:3], atol=0.02)
        assert np.allclose(cal["camR"][3:], rel[3:], atol=0.02)

    def test_completeness_and_subset(self):
        _, _, _, _, assignments, _, poses = _make_rig_scene()
        partial = dict(poses)
        del partial["s0_R"]  # instance i0 incomplete
        cal = rigs.calibrate_rigs(partial, assignments, subset_size=3,
                                  completeness=1.0)
        assert "camR" in cal

    def test_enforce_projects_onto_manifold(self):
        _, _, _, _, assignments, rel, poses = _make_rig_scene()
        rng = np.random.default_rng(3)
        noisy = {
            s: rigs.compose(np.concatenate([
                rng.normal(0, 0.01, 3), rng.normal(0, 0.01, 3)]), p)
            for s, p in poses.items()
        }
        cal = {"camL": np.zeros(6), "camR": rel}
        proj = rigs.enforce_rigs(noisy, cal, assignments)
        # after enforcement every instance's L->R relative is exactly rel
        for i in range(8):
            got = rigs.compose(proj[f"s{i}_R"],
                               rigs.invert(proj[f"s{i}_L"]))
            assert np.allclose(got, rel, atol=1e-8)


class TestRigConstrainedBA:
    def test_alternating_ba_improves_rig_consistency(self):
        (cams_gt, X, problem, shot_ids, assignments, rel,
         _) = _make_rig_scene(noise=1e-3)
        rng = np.random.default_rng(4)
        cams0 = cams_gt + rng.normal(0, 0.01, cams_gt.shape).astype(
            np.float32)
        cams0[0] = cams_gt[0]
        X0 = (X + rng.normal(0, 0.03, X.shape)).astype(np.float32)
        cams, pts, cal, info = rigs.rig_constrained_adjust(
            problem, cams0, X0, shot_ids, assignments,
            cfg=ba.BAConfig(max_iterations=8, cg_iterations=20),
            rounds=2,
        )
        # calibrated relative close to truth
        assert np.allclose(cal["camR"][:3], rel[:3], atol=0.02)
        assert np.allclose(cal["camR"][3:], rel[3:], atol=0.03)
        # output poses are exactly rig-consistent
        poses = {s: cams[i] for i, s in enumerate(shot_ids)}
        for i in range(8):
            got = rigs.compose(poses[f"s{i}_R"],
                               rigs.invert(poses[f"s{i}_L"]))
            assert np.allclose(got, cal["camR"], atol=1e-8)
        # and reprojection cost stays near the bearing-noise floor
        # (manifold projection did not blow up the solution)
        assert float(info["final_cost"]) < 5e-3
        assert float(info["final_cost"]) <= float(info["initial_cost"])
