"""EWA projection of 3D Gaussians to screen space (pure JAX, differentiable).

TPU-native equivalent of the projection stage inside the reference's gsplat
CUDA rasterizer (reference call surface:
utils/gsplat_utils/gsplat_trainer.py:477-494 — ``rasterization(...,
camera_model, rasterize_mode, near_plane, far_plane, radius_clip)``) including
the equirectangular "spherical" path that motivated the reference's gsplat
fork (.gitmodules:16, branch ``spherical_render``).

Design: this stage is elementwise per-(camera, gaussian) VPU work with small
(3x3 / 2x3) matrix algebra — XLA fuses it into a handful of kernels; no Pallas
needed. It is fully differentiable; the tile rasterizer's custom VJP composes
with JAX autodiff through this function.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from splat_one_tpu.core import cameras as cam
from splat_one_tpu.core import sh as shlib
from splat_one_tpu.core.transforms import quat_to_rotmat

EPS2D = 0.3  # standard 3DGS screen-space low-pass filter


class Projected(NamedTuple):
    """Per-(camera, gaussian) screen-space quantities. Leading dims [C, N]."""

    means2d: jax.Array  # [C, N, 2] pixel coords
    conics: jax.Array  # [C, N, 3] inverse 2D covariance (a, b, c)
    depths: jax.Array  # [C, N] sort/cull depth (z or radial for spherical)
    radii: jax.Array  # [C, N] float 3-sigma screen radius (0 => culled)
    colors: jax.Array  # [C, N, D] view-dependent colors (SH-evaluated)
    opacities: jax.Array  # [C, N] (after antialiasing compensation)
    valid: jax.Array  # [C, N] bool


def gaussian_covariance(quats: jax.Array, scales: jax.Array) -> jax.Array:
    """3D covariance from (unnormalized) quaternions and (positive) scales."""
    R = quat_to_rotmat(quats)  # [N, 3, 3]
    M = R * scales[..., None, :]
    return M @ jnp.swapaxes(M, -1, -2)


def _clamp_for_jacobian(p_cam, K, width, height, camera_model):
    """Clamp points to slightly beyond the frustum before evaluating the EWA
    Jacobian (pinhole only) to avoid unbounded Jacobians far outside the view.
    """
    if camera_model != "pinhole":
        return p_cam
    x, y, z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    zs = jnp.maximum(z, 1e-6)
    lim_x = 1.3 * 0.5 * width / fx
    lim_y = 1.3 * 0.5 * height / fy
    xc = zs * jnp.clip(x / zs, -lim_x, lim_x)
    yc = zs * jnp.clip(y / zs, -lim_y, lim_y)
    return jnp.stack([xc, yc, z], axis=-1)


def project_gaussians(
    means: jax.Array,  # [N, 3]
    quats: jax.Array,  # [N, 4] wxyz (unnormalized ok)
    scales: jax.Array,  # [N, 3] positive
    opacities: jax.Array,  # [N] in [0, 1]
    viewmats: jax.Array,  # [C, 4, 4] world->camera
    Ks: jax.Array,  # [C, 3, 3]
    width: int,
    height: int,
    *,
    sh_coeffs: Optional[jax.Array] = None,  # [N, K, 3]
    sh_degree: int = 0,
    colors: Optional[jax.Array] = None,  # [N, D] alternative to SH
    camera_model: str = "pinhole",
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    radius_clip: float = 0.0,
    eps2d: float = EPS2D,
    antialiased: bool = False,
    alive: Optional[jax.Array] = None,  # [N] bool mask (fixed-capacity buffers)
) -> Projected:
    """Project all gaussians into all cameras. Fully differentiable."""
    cov3d = gaussian_covariance(quats, scales)  # [N, 3, 3]

    def per_camera(viewmat, K):
        R = viewmat[:3, :3]
        t = viewmat[:3, 3]
        p_cam = means @ R.T + t  # [N, 3]
        depth = cam.visible_depth(p_cam, camera_model)  # [N]
        cov_cam = jnp.einsum("ij,njk,lk->nil", R, cov3d, R)  # [N, 3, 3]

        p_for_j = _clamp_for_jacobian(p_cam, K, width, height, camera_model)
        J = cam.projection_jacobian(
            p_for_j, K, width, height, camera_model
        )  # [N, 2, 3]
        cov2d = jnp.einsum("nij,njk,nlk->nil", J, cov_cam, J)  # [N, 2, 2]

        det_raw = (
            cov2d[:, 0, 0] * cov2d[:, 1, 1] - cov2d[:, 0, 1] * cov2d[:, 1, 0]
        )
        cov2d = cov2d + eps2d * jnp.eye(2, dtype=cov2d.dtype)
        a, b, c = cov2d[:, 0, 0], cov2d[:, 0, 1], cov2d[:, 1, 1]
        det = a * c - b * b
        det_safe = jnp.where(det <= 0, 1.0, det)
        conic = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], axis=-1)

        if antialiased:
            comp = jnp.sqrt(jnp.maximum(det_raw, 0.0) / det_safe)
        else:
            comp = jnp.ones_like(det)
        opac = opacities * comp

        # 3-sigma screen radius from the larger eigenvalue of cov2d.
        mid = 0.5 * (a + c)
        disc = jnp.sqrt(jnp.maximum(mid * mid - det, 0.01))
        lam_max = mid + disc
        radius = 3.0 * jnp.sqrt(jnp.maximum(lam_max, 0.0))

        uv = cam.project(p_cam, K, width, height, camera_model)  # [N, 2]

        ok = (depth > near_plane) & (depth < far_plane) & (det > 0)
        ok &= radius > radius_clip
        # Cull gaussians whose bbox misses the image entirely (spherical wraps
        # in azimuth, so only cull on v there).
        u, v = uv[:, 0], uv[:, 1]
        inside_v = (v + radius > 0) & (v - radius < height)
        if camera_model == "spherical":
            ok &= inside_v
        else:
            ok &= inside_v & (u + radius > 0) & (u - radius < width)
        if alive is not None:
            ok &= alive

        radius = jnp.where(ok, radius, 0.0)

        if sh_coeffs is not None:
            campos = -R.T @ t
            dirs = means - campos
            # sqrt(sum + eps) keeps the gradient finite at dirs == 0 (dead
            # fixed-capacity slots sit exactly at the camera origin);
            # jnp.linalg.norm's VJP is NaN there.
            dnorm = jnp.sqrt(
                jnp.sum(dirs * dirs, axis=-1, keepdims=True) + 1e-20
            )
            dirs = dirs / dnorm
            col = shlib.eval_sh(sh_degree, sh_coeffs, dirs) + 0.5
            col = jnp.maximum(col, 0.0)
        elif colors is not None:
            col = colors
        else:
            raise ValueError("either sh_coeffs or colors must be given")
        return Projected(uv, conic, depth, radius, col, opac, ok)

    proj = jax.vmap(per_camera)(viewmats, Ks)
    return proj
