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

# In-kernel contribution cutoff (gsplat's 1/255): must equal
# ops.reference.ALPHA_MIN — reference.py asserts the match at import.
ALPHA_CUT = 1.0 / 255.0


def opacity_extent(opacity: jax.Array) -> jax.Array:
    """Per-gaussian membership extent in SIGMAS: min(3, sqrt(2 ln(opa/A)))
    with A = ALPHA_CUT (1/255).

    Every compositing path kills contributions with
    ``alpha = opa * exp(-sigma) < ALPHA_CUT`` (the gsplat 1/255 cutoff), so
    a gaussian with opacity ``opa`` is invisible beyond
    ``sigma > ln(opa / A)`` — i.e. beyond ``sqrt(2 ln(255 opa))`` sigmas.
    Tightening tile membership to that level set (capped at the classic 3
    sigma) drops ONLY slots whose every pixel the kernels would kill
    anyway: renders and grads are bit-identical while the intersection
    row count — which every rate-bound glue stage (scatter, gathers,
    sorts, reduce) scales with — shrinks, dramatically so on trained
    scenes where densification/opacity-reset leave many low-opacity
    splats. The +1e-3 sigma margin absorbs float rounding between this
    expression and the kernels' per-pixel sigma evaluation."""
    s2 = 2.0 * jnp.log(jnp.maximum(opacity, 1e-12) * (1.0 / ALPHA_CUT))
    return jnp.minimum(3.0, jnp.sqrt(jnp.maximum(s2, 0.0)) + 1e-3)


def conic_ellipse_radii(a: jax.Array, b: jax.Array, c: jax.Array,
                        opacity: jax.Array | None = None):
    """Axis-aligned half-extents (rx, ry) of the membership-ellipse level
    set, from CONIC entries (a, b, c) = inverse 2D covariance.

    cov = inv([[a, b], [b, c]]) => cov_xx = c/det, cov_yy = a/det with
    det = a*c - b^2; the s-sigma set {q <= s^2/2} has extent s*sqrt(cov_xx)
    in x. Without ``opacity`` s = 3 (the classic 3-sigma bbox); with it
    s = ``opacity_extent(opacity)`` — the tighter of 3 sigma and the
    opacity's own 1/255-visibility radius (exact: see opacity_extent).
    This is the ONE membership-radius definition shared by the
    supertile-stream builder, the stream kernels' per-tile test, the gen-1
    tile-list builder and the oracle compositor — all must make identical
    in/out decisions on the same conic/opacity floats, so they all call
    this (and all pass ``opacity``)."""
    det = jnp.maximum(a * c - b * b, 1e-30)
    inv = 1.0 / det
    s = 3.0 if opacity is None else opacity_extent(opacity)
    rx = s * jnp.sqrt(jnp.maximum(c * inv, 0.0))
    ry = s * jnp.sqrt(jnp.maximum(a * inv, 0.0))
    return rx, ry


class Projected(NamedTuple):
    """Per-(camera, gaussian) screen-space quantities. Leading dims [C, N]."""

    means2d: jax.Array  # [C, N, 2] pixel coords
    conics: jax.Array  # [C, N, 3] inverse 2D covariance (a, b, c)
    depths: jax.Array  # [C, N] sort/cull depth (z or radial for spherical)
    radii: jax.Array  # [C, N] float 3-sigma screen radius (0 => culled)
    colors: jax.Array  # [C, N, D] view-dependent colors (SH-evaluated)
    opacities: jax.Array  # [C, N] (after antialiasing compensation)
    valid: jax.Array  # [C, N] bool


def _rotmat_soa(quats):
    """Quaternion -> rotation matrix as nine [N] component arrays
    (struct-of-arrays: [N,3,3] tensors get lane-padded ~40x on TPU)."""
    q = quats / jnp.sqrt(
        jnp.sum(quats * quats, axis=-1, keepdims=True) + 1e-24
    )
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return (
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    )


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
    colors: Optional[jax.Array] = None,  # [N, D] or [C, N, D] (per-camera)
    camera_model: str = "pinhole",
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    radius_clip: float = 0.0,
    eps2d: float = EPS2D,
    antialiased: bool = False,
    alive: Optional[jax.Array] = None,  # [N] bool mask (fixed-capacity buffers)
) -> Projected:
    """Project all gaussians into all cameras. Fully differentiable.

    Written struct-of-arrays: every intermediate is a flat [N] vector so XLA
    tiles them densely; [N, 3, 3] intermediates would be lane-padded ~40x
    and turn this elementwise pass HBM-bound (measured ~47 ms -> ~5 ms at
    1M gaussians).
    """
    # local gaussian frame: M = R_q * diag(scales), as components
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = _rotmat_soa(quats)
    sx, sy, sz = scales[..., 0], scales[..., 1], scales[..., 2]
    m00, m01, m02 = m00 * sx, m01 * sy, m02 * sz
    m10, m11, m12 = m10 * sx, m11 * sy, m12 * sz
    m20, m21, m22 = m20 * sx, m21 * sy, m22 * sz
    mx, my, mz = means[..., 0], means[..., 1], means[..., 2]

    def per_camera(viewmat, K):
        R = viewmat[:3, :3]
        t = viewmat[:3, 3]
        # camera-frame positions (SoA)
        px = R[0, 0] * mx + R[0, 1] * my + R[0, 2] * mz + t[0]
        py = R[1, 0] * mx + R[1, 1] * my + R[1, 2] * mz + t[1]
        pz = R[2, 0] * mx + R[2, 1] * my + R[2, 2] * mz + t[2]
        if camera_model == "spherical":
            depth = jnp.sqrt(px * px + py * py + pz * pz + 1e-24)
        else:
            depth = pz

        # B = R_w2c @ M (world gaussian frame in camera coords), SoA
        def rot_row(r0, r1, r2):
            return (
                r0 * m00 + r1 * m10 + r2 * m20,
                r0 * m01 + r1 * m11 + r2 * m21,
                r0 * m02 + r1 * m12 + r2 * m22,
            )

        b00, b01, b02 = rot_row(R[0, 0], R[0, 1], R[0, 2])
        b10, b11, b12 = rot_row(R[1, 0], R[1, 1], R[1, 2])
        b20, b21, b22 = rot_row(R[2, 0], R[2, 1], R[2, 2])

        # EWA Jacobian rows (analytic, SoA), at frustum-clamped positions
        fx, fy = K[0, 0], K[1, 1]
        eps = 1e-8
        if camera_model == "pinhole":
            zs = jnp.maximum(pz, 1e-6)
            lim_x = 1.3 * 0.5 * width / fx
            lim_y = 1.3 * 0.5 * height / fy
            xc = zs * jnp.clip(px / zs, -lim_x, lim_x)
            yc = zs * jnp.clip(py / zs, -lim_y, lim_y)
            inv_z = 1.0 / jnp.where(jnp.abs(pz) < eps, eps, pz)
            j00 = fx * inv_z
            j01 = jnp.zeros_like(px)
            j02 = -fx * xc * inv_z * inv_z
            j10 = jnp.zeros_like(px)
            j11 = fy * inv_z
            j12 = -fy * yc * inv_z * inv_z
        elif camera_model == "ortho":
            one = jnp.ones_like(px)
            j00, j01, j02 = fx * one, 0.0 * one, 0.0 * one
            j10, j11, j12 = 0.0 * one, fy * one, 0.0 * one
        elif camera_model == "spherical":
            rxz2 = jnp.maximum(px * px + pz * pz, eps)
            r2 = jnp.maximum(px * px + py * py + pz * pz, eps)
            rxz = jnp.sqrt(rxz2)
            cu = width / (2.0 * jnp.pi)
            cv = -height / jnp.pi
            j00 = cu * pz / rxz2
            j01 = jnp.zeros_like(px)
            j02 = -cu * px / rxz2
            j10 = cv * px * py / (r2 * rxz)
            j11 = cv * -rxz / r2
            j12 = cv * pz * py / (r2 * rxz)
        elif camera_model == "fisheye":
            # closed-form equidistant-fisheye Jacobian (SoA — replaces the
            # r2 jacfwd fallback, which paid vmapped dual numbers per
            # gaussian). With rho^2 = x^2+y^2, L^2 = rho^2+z^2,
            # theta = atan2(rho, z), a = z/(L^2 rho^2), b = theta/rho^3:
            #   du/dx = fx (x^2 a + y^2 b),  du/dy = fx xy (a - b),
            #   du/dz = -fx x / L^2          (and symmetrically for v) —
            # the same grouping as gsplat's CUDA fisheye_proj; the rho->0
            # pole is clamped like gsplat (rho^2 >= 1e-7).
            eps_f = 1e-7
            x2 = px * px
            y2 = py * py
            xy = px * py
            r2 = jnp.maximum(x2 + y2, eps_f)
            L2 = r2 + pz * pz
            inv_L2 = 1.0 / jnp.maximum(L2, eps_f)
            theta = jnp.arctan2(jnp.sqrt(r2), pz)
            b_f = theta / (r2 * jnp.sqrt(r2))
            a_f = pz * inv_L2 / r2
            j00 = fx * (x2 * a_f + y2 * b_f)
            j01 = fx * xy * (a_f - b_f)
            j02 = -fx * px * inv_L2
            j10 = fy * xy * (a_f - b_f)
            j11 = fy * (y2 * a_f + x2 * b_f)
            j12 = -fy * py * inv_L2
        else:
            raise ValueError(f"unknown camera_model {camera_model!r}")

        # A = J @ B  (2x3), then cov2d = A A^T
        a00 = j00 * b00 + j01 * b10 + j02 * b20
        a01 = j00 * b01 + j01 * b11 + j02 * b21
        a02 = j00 * b02 + j01 * b12 + j02 * b22
        a10 = j10 * b00 + j11 * b10 + j12 * b20
        a11 = j10 * b01 + j11 * b11 + j12 * b21
        a12 = j10 * b02 + j11 * b12 + j12 * b22
        ca = a00 * a00 + a01 * a01 + a02 * a02
        cb = a00 * a10 + a01 * a11 + a02 * a12
        cc = a10 * a10 + a11 * a11 + a12 * a12

        det_raw = ca * cc - cb * cb
        ca = ca + eps2d
        cc = cc + eps2d
        det = ca * cc - cb * cb
        det_safe = jnp.where(det <= 0, 1.0, det)
        inv_det = 1.0 / det_safe
        conic = jnp.stack(
            [cc * inv_det, -cb * inv_det, ca * inv_det], axis=-1
        )

        if antialiased:
            comp = jnp.sqrt(jnp.maximum(det_raw, 0.0) * inv_det)
        else:
            comp = jnp.ones_like(det)
        opac = opacities * comp

        # 3-sigma screen radius from the larger eigenvalue of cov2d.
        mid = 0.5 * (ca + cc)
        disc = jnp.sqrt(jnp.maximum(mid * mid - det, 0.01))
        radius = 3.0 * jnp.sqrt(jnp.maximum(mid + disc, 0.0))

        p_cam = jnp.stack([px, py, pz], axis=-1)
        uv = cam.project(p_cam, K, width, height, camera_model)  # [N, 2]

        ok = (depth > near_plane) & (depth < far_plane) & (det > 0)
        ok &= radius > radius_clip
        # Cull gaussians whose ellipse bbox misses the image entirely
        # (tighter than the circumscribed circle; spherical wraps in
        # azimuth, so only cull on v there). rx/ry here are the cov-diagonal
        # form of conic_ellipse_radii — same opacity-aware extents.
        ext = opacity_extent(opac)
        rx = ext * jnp.sqrt(jnp.maximum(ca, 0.0))
        ry = ext * jnp.sqrt(jnp.maximum(cc, 0.0))
        u, v = uv[:, 0], uv[:, 1]
        inside_v = (v + ry > 0) & (v - ry < height)
        if camera_model == "spherical":
            ok &= inside_v
        else:
            ok &= inside_v & (u + rx > 0) & (u - rx < width)
        if alive is not None:
            ok &= alive

        radius = jnp.where(ok, radius, 0.0)

        if sh_coeffs is not None:
            campos = -R.T @ t
            dx = mx - campos[0]
            dy = my - campos[1]
            dz = mz - campos[2]
            # sqrt(sum + eps) keeps the gradient finite at dirs == 0 (dead
            # fixed-capacity slots sit exactly at the camera origin).
            dn = jnp.sqrt(dx * dx + dy * dy + dz * dz + 1e-20)
            dirs = jnp.stack([dx / dn, dy / dn, dz / dn], axis=-1)
            col = shlib.eval_sh(sh_degree, sh_coeffs, dirs) + 0.5
            col = jnp.maximum(col, 0.0)
        elif colors is not None:
            col = colors if colors.ndim == 2 else None  # per-camera below
        else:
            raise ValueError("either sh_coeffs or colors must be given")
        return Projected(uv, conic, depth, radius, col, opac, ok)

    if colors is not None and colors.ndim == 3:
        # per-(camera, gaussian) colors (appearance-module path)
        def per_cam_col(viewmat, K, col_c):
            pr = per_camera(viewmat, K)
            return pr._replace(colors=col_c)

        return jax.vmap(per_cam_col)(viewmats, Ks, colors)
    proj = jax.vmap(per_camera)(viewmats, Ks)
    return proj
