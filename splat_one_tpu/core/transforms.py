"""Rotation / rigid-transform utilities (pure JAX).

TPU-native re-implementation of the capability surface of the reference's
quaternion handling (reference: utils/datasets/opensfm.py:47-105 — qvec/rotmat
conversions) and 6D-rotation parameterization (reference:
utils/gsplat_utils/utils.py:117-138 — ``rotation_6d_to_matrix``).

Conventions
-----------
Quaternions are ``[w, x, y, z]`` (scalar-first), matching the splat parameter
layout used throughout this framework. All functions are batched over leading
axes and jit/vmap friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize(v: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """L2-normalize along ``axis``."""
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), eps)


def quat_to_rotmat(quat: jax.Array) -> jax.Array:
    """Convert quaternion(s) ``[..., 4]`` (wxyz) to rotation matrices ``[..., 3, 3]``.

    The quaternion is normalized internally (as the reference rasterizer does
    with raw, unconstrained quaternion parameters).
    """
    q = normalize(quat)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rotmat_to_quat(R: jax.Array) -> jax.Array:
    """Convert rotation matrices ``[..., 3, 3]`` to quaternions ``[..., 4]`` (wxyz).

    Branch-free Shepperd-style conversion: compute all four candidate
    quaternions and select the numerically best (largest pivot) with
    ``jnp.where`` so it is jit-safe.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # Candidate 0: pivot on trace.
    q0 = jnp.stack(
        [1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1
    )
    # Candidate 1: pivot on m00.
    q1 = jnp.stack(
        [m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1
    )
    # Candidate 2: pivot on m11.
    q2 = jnp.stack(
        [m02 - m20, m01 + m10, 1.0 + m11 - m00 - m22, m12 + m21], axis=-1
    )
    # Candidate 3: pivot on m22.
    q3 = jnp.stack(
        [m10 - m01, m02 + m20, m12 + m21, 1.0 + m22 - m00 - m11], axis=-1
    )
    pivots = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 + m11 - m00 - m22,
         1.0 + m22 - m00 - m11],
        axis=-1,
    )
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([q0, q1, q2, q3], axis=-2)  # [..., 4, 4]
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)
    q = q[..., 0, :]
    q = q / (2.0 * safe_sqrt(jnp.take_along_axis(pivots, best[..., None], -1)))
    # Canonicalize sign (w >= 0).
    q = jnp.where(q[..., :1] < 0, -q, q)
    return normalize(q)


def quat_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product of quaternions (wxyz), batched."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def rotation_6d_to_matrix(d6: jax.Array) -> jax.Array:
    """Continuous 6D rotation representation -> rotation matrix ``[..., 3, 3]``.

    Zhou et al. (CVPR 2019) Gram-Schmidt construction; capability parity with
    reference utils/gsplat_utils/utils.py:117-138 (used by the camera pose
    optimization module).
    """
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = normalize(a1)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = normalize(b2)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(R: jax.Array) -> jax.Array:
    """Inverse of :func:`rotation_6d_to_matrix` (first two rows, flattened)."""
    return jnp.concatenate([R[..., 0, :], R[..., 1, :]], axis=-1)


def se3_compose(R1, t1, R2, t2):
    """Compose two rigid transforms: (R1,t1) after (R2,t2): x -> R1(R2 x + t2) + t1."""
    return R1 @ R2, (R1 @ t2[..., None])[..., 0] + t1


def make_viewmat(R_c2w: jax.Array, t_c2w: jax.Array) -> jax.Array:
    """Build a 4x4 world->camera matrix from camera-to-world rotation/translation."""
    R_w2c = jnp.swapaxes(R_c2w, -1, -2)
    t_w2c = -(R_w2c @ t_c2w[..., None])[..., 0]
    top = jnp.concatenate([R_w2c, t_w2c[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype),
        top.shape[:-2] + (1, 4),
    )
    return jnp.concatenate([top, bottom], axis=-2)


def invert_se3(mat4: jax.Array) -> jax.Array:
    """Invert a batch of 4x4 rigid transforms."""
    R = mat4[..., :3, :3]
    t = mat4[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    t_new = -(Rt @ t[..., None])[..., 0]
    top = jnp.concatenate([Rt, t_new[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=mat4.dtype),
        top.shape[:-2] + (1, 4),
    )
    return jnp.concatenate([top, bottom], axis=-2)
