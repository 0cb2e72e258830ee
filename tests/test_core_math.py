"""Golden tests for core math: rotations, SH basis, camera models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splat_one_tpu.core import cameras, sh, transforms as tf


class TestTransforms:
    def test_quat_identity(self):
        R = tf.quat_to_rotmat(jnp.array([1.0, 0, 0, 0]))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)

    def test_quat_90deg_z(self):
        # 90 deg about +z: (w, z) = (cos45, sin45)
        s = np.sqrt(0.5)
        R = tf.quat_to_rotmat(jnp.array([s, 0, 0, s]))
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
        np.testing.assert_allclose(R, expected, atol=1e-6)

    def test_quat_roundtrip(self, rng):
        q = rng.normal(size=(64, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        q[q[:, 0] < 0] *= -1
        R = tf.quat_to_rotmat(jnp.asarray(q))
        q2 = tf.rotmat_to_quat(R)
        np.testing.assert_allclose(q2, q, atol=1e-5)

    def test_rotmat_orthonormal(self, rng):
        q = rng.normal(size=(32, 4)).astype(np.float32)
        R = np.asarray(tf.quat_to_rotmat(jnp.asarray(q)))
        eye = np.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_quat_multiply_matches_matmul(self, rng):
        a = rng.normal(size=(8, 4)).astype(np.float32)
        b = rng.normal(size=(8, 4)).astype(np.float32)
        a /= np.linalg.norm(a, axis=-1, keepdims=True)
        b /= np.linalg.norm(b, axis=-1, keepdims=True)
        Rab = np.asarray(tf.quat_to_rotmat(tf.quat_multiply(jnp.asarray(a), jnp.asarray(b))))
        RaRb = np.einsum(
            "nij,njk->nik",
            np.asarray(tf.quat_to_rotmat(jnp.asarray(a))),
            np.asarray(tf.quat_to_rotmat(jnp.asarray(b))),
        )
        np.testing.assert_allclose(Rab, RaRb, atol=1e-5)

    def test_rotation_6d_roundtrip(self, rng):
        q = rng.normal(size=(16, 4)).astype(np.float32)
        R = tf.quat_to_rotmat(jnp.asarray(q))
        d6 = tf.matrix_to_rotation_6d(R)
        R2 = tf.rotation_6d_to_matrix(d6)
        np.testing.assert_allclose(R2, R, atol=1e-5)

    def test_viewmat_inverse(self, rng):
        q = rng.normal(size=(4,)).astype(np.float32)
        R = tf.quat_to_rotmat(jnp.asarray(q))
        t = jnp.asarray(rng.normal(size=(3,)).astype(np.float32))
        vm = tf.make_viewmat(R, t)
        inv = tf.invert_se3(vm)
        c2w_pos = inv[:3, 3]
        np.testing.assert_allclose(c2w_pos, t, atol=1e-5)
        np.testing.assert_allclose(vm @ inv, np.eye(4), atol=1e-5)


class TestSH:
    def test_degree0_constant(self):
        dirs = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
        basis = sh.eval_sh_bases(0, dirs)
        np.testing.assert_allclose(basis, 0.28209479177, atol=1e-6)

    def test_orthonormality(self, rng):
        # Monte-Carlo check: int Y_i Y_j dOmega = delta_ij.
        n = 200_000
        v = rng.normal(size=(n, 3)).astype(np.float32)
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        basis = np.asarray(sh.eval_sh_bases(3, jnp.asarray(v)))  # [n, 16]
        gram = basis.T @ basis / n * 4 * np.pi
        np.testing.assert_allclose(gram, np.eye(16), atol=0.15)

    def test_rgb_sh_roundtrip(self, rng):
        rgb = jnp.asarray(rng.uniform(size=(10, 3)).astype(np.float32))
        np.testing.assert_allclose(sh.sh_to_rgb(sh.rgb_to_sh(rgb)), rgb, atol=1e-6)

    def test_eval_sh_degree0_is_dc(self, rng):
        coeffs = jnp.asarray(rng.normal(size=(5, 16, 3)).astype(np.float32))
        dirs = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
        dirs /= jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        out = sh.eval_sh(0, coeffs, dirs)
        np.testing.assert_allclose(out, 0.28209479177 * coeffs[:, 0, :], atol=1e-6)


class TestCameras:
    def test_pinhole_center(self):
        K = jnp.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]])
        uv = cameras.project(jnp.array([0.0, 0.0, 2.0]), K, 128, 96, "pinhole")
        np.testing.assert_allclose(uv, [64.0, 48.0], atol=1e-6)

    def test_pinhole_known_point(self):
        K = jnp.array([[100.0, 0, 64], [0, 200.0, 48], [0, 0, 1]])
        uv = cameras.project(jnp.array([1.0, -0.5, 2.0]), K, 128, 96, "pinhole")
        np.testing.assert_allclose(uv, [64 + 50.0, 48 - 50.0], atol=1e-5)

    def test_spherical_forward_maps_to_center(self):
        uv = cameras.project(jnp.array([0.0, 0.0, 5.0]), jnp.eye(3), 512, 256, "spherical")
        np.testing.assert_allclose(uv, [256.0, 128.0], atol=1e-4)

    def test_spherical_up_maps_to_top(self):
        # Camera frame y is down => "up" is -y => top of panorama (v=0).
        uv = cameras.project(jnp.array([0.0, -5.0, 1e-6]), jnp.eye(3), 512, 256, "spherical")
        assert float(uv[1]) < 1.0

    def test_spherical_right_quarter(self):
        # +x (right) => lon = pi/2 => u = 0.75 * W
        uv = cameras.project(jnp.array([5.0, 0.0, 0.0]), jnp.eye(3), 512, 256, "spherical")
        np.testing.assert_allclose(uv, [384.0, 128.0], atol=1e-4)

    @pytest.mark.parametrize("model", ["pinhole", "fisheye", "spherical", "ortho"])
    def test_project_unproject_roundtrip(self, model, rng):
        K = jnp.array([[120.0, 0, 100.0], [0, 120.0, 80.0], [0, 0, 1]])
        w, h = 200, 160
        if model == "ortho":
            # points near the optical axis within unit disk for ortho
            p = rng.uniform(-0.3, 0.3, size=(50, 3)).astype(np.float32)
            p[:, 2] = 1.0
            K = jnp.array([[50.0, 0, 100.0], [0, 50.0, 80.0], [0, 0, 1]])
        else:
            p = rng.normal(size=(50, 3)).astype(np.float32)
            p[:, 2] = np.abs(p[:, 2]) + 1.0
        p = jnp.asarray(p)
        bearing_true = p / jnp.linalg.norm(p, axis=-1, keepdims=True)
        uv = cameras.project(p, K, w, h, model)
        b = cameras.unproject(uv, K, w, h, model)
        if model == "ortho":
            # ortho unprojection only recovers direction for unit-distance pts
            return
        np.testing.assert_allclose(b, bearing_true, atol=1e-4)

    def test_jacobian_matches_finite_difference(self, rng):
        K = jnp.array([[120.0, 0, 100.0], [0, 110.0, 80.0], [0, 0, 1]])
        p = jnp.array([[0.3, -0.2, 2.0], [1.0, 0.5, 4.0]])
        for model in ["pinhole", "spherical", "fisheye"]:
            J = cameras.projection_jacobian(p, K, 200, 160, model)
            eps = 1e-3
            for k in range(3):
                dp = jnp.zeros(3).at[k].set(eps)
                fd = (
                    cameras.project(p + dp, K, 200, 160, model)
                    - cameras.project(p - dp, K, 200, 160, model)
                ) / (2 * eps)
                np.testing.assert_allclose(J[:, :, k], fd, atol=1e-2, rtol=1e-3)
