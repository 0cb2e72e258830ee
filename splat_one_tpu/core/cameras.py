"""Camera models: pinhole, ortho, fisheye, spherical (equirectangular).

TPU-native re-implementation of the reference's camera-model surface:
 - projection types ``perspective``/``spherical`` in camera metadata
   (reference app/camera_models.py:54),
 - the gsplat rasterizer's ``camera_model`` in {pinhole, ortho, fisheye,
   spherical} (reference utils/gsplat_utils/gsplat_trainer.py:489-493 and the
   ``spherical_render`` gsplat fork, .gitmodules:16),
 - OpenSfM bearing math used by the SfM backend.

Conventions: camera frame is OpenCV-style (+x right, +y down, +z forward).
Equirectangular mapping: ``u = (lon/2pi + 0.5) * W``, ``v = (0.5 - lat/pi) * H``
with ``lon = atan2(x, z)`` and ``lat = asin(-y/r)`` so the forward axis maps to
the image center and "up" maps to the top of the panorama.

All functions are jit/vmap friendly; Jacobians for EWA splatting are obtained
with ``jax.jacfwd`` through these exact projections (exact, fused by XLA — the
projection pass is negligible next to rasterization).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

CAMERA_MODELS = ("pinhole", "ortho", "fisheye", "spherical")


def _check_model(camera_model: str) -> None:
    if camera_model not in CAMERA_MODELS:
        raise ValueError(
            f"camera_model must be one of {CAMERA_MODELS}, got {camera_model!r}"
        )


def project(
    p_cam: jax.Array,
    K: jax.Array,
    width: int,
    height: int,
    camera_model: str = "pinhole",
    dist: Optional[jax.Array] = None,
    eps: float = 1e-8,
) -> jax.Array:
    """Project camera-frame points ``[..., 3]`` to pixel coords ``[..., 2]``.

    Args:
      p_cam: points in the camera frame.
      K: ``[3, 3]`` intrinsics (ignored for spherical).
      width, height: image size in pixels.
      camera_model: one of ``pinhole | ortho | fisheye | spherical``.
      dist: optional fisheye distortion ``[4]`` (k1..k4 theta-polynomial,
        OpenCV-fisheye-style); zeros => equidistant.
    """
    _check_model(camera_model)
    x, y, z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]

    if camera_model == "pinhole":
        zs = jnp.where(jnp.abs(z) < eps, eps, z)
        u = fx * x / zs + cx
        v = fy * y / zs + cy
    elif camera_model == "ortho":
        u = fx * x + cx
        v = fy * y + cy
    elif camera_model == "fisheye":
        r = jnp.sqrt(x * x + y * y)
        theta = jnp.arctan2(r, z)
        if dist is not None:
            t2 = theta * theta
            theta_d = theta * (
                1.0
                + dist[..., 0] * t2
                + dist[..., 1] * t2 * t2
                + dist[..., 2] * t2 * t2 * t2
                + dist[..., 3] * t2 * t2 * t2 * t2
            )
        else:
            theta_d = theta
        scale = theta_d / jnp.maximum(r, eps)
        u = fx * x * scale + cx
        v = fy * y * scale + cy
    else:  # spherical / equirectangular
        r = jnp.sqrt(x * x + y * y + z * z)
        lon = jnp.arctan2(x, z)
        lat = jnp.arcsin(jnp.clip(-y / jnp.maximum(r, eps), -1.0, 1.0))
        u = (lon / (2.0 * jnp.pi) + 0.5) * width
        v = (0.5 - lat / jnp.pi) * height
    return jnp.stack([u, v], axis=-1)


def projection_jacobian(
    p_cam: jax.Array,
    K: jax.Array,
    width: int,
    height: int,
    camera_model: str = "pinhole",
    dist: Optional[jax.Array] = None,
    eps: float = 1e-8,
) -> jax.Array:
    """Exact Jacobian d(uv)/d(p_cam): ``[..., 2, 3]`` (for EWA splatting).

    Analytic closed forms for pinhole/ortho/spherical/fisheye (the hot
    paths — a vmapped ``jacfwd`` costs 3x the projection and dominates the
    projection stage at millions of gaussians); only distorted fisheye
    (theta-polynomial ``dist``) falls back to ``jacfwd``.
    """
    x, y, z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    zero = jnp.zeros_like(x)
    if camera_model == "pinhole":
        zs = jnp.where(jnp.abs(z) < eps, eps, z)
        inv_z = 1.0 / zs
        row_u = jnp.stack(
            [fx * inv_z, zero, -fx * x * inv_z * inv_z], axis=-1
        )
        row_v = jnp.stack(
            [zero, fy * inv_z, -fy * y * inv_z * inv_z], axis=-1
        )
        return jnp.stack([row_u, row_v], axis=-2)
    if camera_model == "ortho":
        row_u = jnp.stack([fx * jnp.ones_like(x), zero, zero], axis=-1)
        row_v = jnp.stack([zero, fy * jnp.ones_like(x), zero], axis=-1)
        return jnp.stack([row_u, row_v], axis=-2)
    if camera_model == "spherical":
        # u = (lon/2pi + 0.5) W, lon = atan2(x, z)
        # v = (0.5 - lat/pi) H,  lat = asin(-y/r)
        rxz2 = jnp.maximum(x * x + z * z, eps)
        r2 = jnp.maximum(x * x + y * y + z * z, eps)
        cu = width / (2.0 * jnp.pi)
        du = jnp.stack(
            [cu * z / rxz2, zero, -cu * x / rxz2], axis=-1
        )
        # dlat/dp: lat = asin(-y/r); d = (-ey r + y p/r)/r^2 projected:
        rxz = jnp.sqrt(rxz2)
        dlat_dx = x * y / (r2 * rxz)
        dlat_dy = -rxz / r2
        dlat_dz = z * y / (r2 * rxz)
        cv = -height / jnp.pi
        dv = jnp.stack(
            [cv * dlat_dx, cv * dlat_dy, cv * dlat_dz], axis=-1
        )
        return jnp.stack([du, dv], axis=-2)
    if camera_model == "fisheye" and dist is None:
        # closed-form equidistant fisheye (same grouping as gsplat's CUDA
        # fisheye_proj; see ops.projection for the derivation): with
        # rho^2 = x^2+y^2, L^2 = rho^2+z^2, theta = atan2(rho, z),
        # a = z/(L^2 rho^2), b = theta/rho^3:
        #   du = fx [x^2 a + y^2 b, xy (a - b), -x/L^2]
        x2, y2, xy = x * x, y * y, x * y
        r2 = jnp.maximum(x2 + y2, 1e-7)
        L2 = r2 + z * z
        inv_L2 = 1.0 / jnp.maximum(L2, 1e-7)
        theta = jnp.arctan2(jnp.sqrt(r2), z)
        b_f = theta / (r2 * jnp.sqrt(r2))
        a_f = z * inv_L2 / r2
        du = jnp.stack(
            [fx * (x2 * a_f + y2 * b_f), fx * xy * (a_f - b_f),
             -fx * x * inv_L2], axis=-1
        )
        dv = jnp.stack(
            [fy * xy * (a_f - b_f), fy * (y2 * a_f + x2 * b_f),
             -fy * y * inv_L2], axis=-1
        )
        return jnp.stack([du, dv], axis=-2)

    def f(p):
        return project(p, K, width, height, camera_model, dist)

    flat = p_cam.reshape(-1, 3)
    J = jax.vmap(jax.jacfwd(f))(flat)
    return J.reshape(p_cam.shape[:-1] + (2, 3))


def unproject(
    uv: jax.Array,
    K: jax.Array,
    width: int,
    height: int,
    camera_model: str = "pinhole",
    eps: float = 1e-8,
) -> jax.Array:
    """Pixel coords ``[..., 2]`` -> unit bearing vectors ``[..., 3]``.

    (Fisheye unprojection here assumes the undistorted equidistant model;
    distortion inversion is handled in the SfM undistort path.)
    """
    _check_model(camera_model)
    u, v = uv[..., 0], uv[..., 1]
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    if camera_model == "pinhole":
        x = (u - cx) / fx
        y = (v - cy) / fy
        b = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    elif camera_model == "ortho":
        x = (u - cx) / fx
        y = (v - cy) / fy
        z = jnp.sqrt(jnp.maximum(1.0 - x * x - y * y, eps))
        b = jnp.stack([x, y, z], axis=-1)
    elif camera_model == "fisheye":
        mx = (u - cx) / fx
        my = (v - cy) / fy
        theta = jnp.sqrt(mx * mx + my * my)
        s = jnp.sin(theta) / jnp.maximum(theta, eps)
        b = jnp.stack([mx * s, my * s, jnp.cos(theta)], axis=-1)
    else:  # spherical
        lon = (u / width - 0.5) * 2.0 * jnp.pi
        lat = (0.5 - v / height) * jnp.pi
        x = jnp.cos(lat) * jnp.sin(lon)
        z = jnp.cos(lat) * jnp.cos(lon)
        y = -jnp.sin(lat)
        b = jnp.stack([x, y, z], axis=-1)
    return b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), eps)


def in_image(uv: jax.Array, width: int, height: int, margin: float = 0.0):
    """Boolean mask of pixels inside the image (with optional margin)."""
    u, v = uv[..., 0], uv[..., 1]
    return (
        (u >= -margin) & (u < width + margin) & (v >= -margin) & (v < height + margin)
    )


def visible_depth(p_cam: jax.Array, camera_model: str) -> jax.Array:
    """Per-point 'depth' used for sorting/culling.

    Pinhole/ortho/fisheye use z-depth; spherical uses radial distance (a
    panorama sees in all directions, so there is no plane-based near clip).
    """
    if camera_model == "spherical":
        return jnp.linalg.norm(p_cam, axis=-1)
    return p_cam[..., 2]
