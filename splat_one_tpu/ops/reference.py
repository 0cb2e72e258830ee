"""Naive reference compositor — the numerical oracle for the tile rasterizer.

Dense O(N_gauss x N_pix) front-to-back alpha compositing in pure JAX
(autodiff'd), chunked with ``lax.scan`` so memory stays bounded. Fine at
oracle scales (thousands of gaussians, <=512^2 pixels); the production path is
the Pallas tile rasterizer in ``ops.tile_raster``. Plays the role gsplat's
``_torch_impl`` plays upstream (SURVEY.md §4, §7.2).

Compositing semantics (shared with the tile rasterizer and checked by parity
tests):
  - gaussians composited strictly in increasing depth order,
  - ``alpha = min(opacity * exp(-sigma), ALPHA_MAX)`` with
    ``sigma = 0.5*(a*dx^2 + c*dy^2) + b*dx*dy``,
  - contributions with ``alpha < ALPHA_MIN`` are skipped,
  - no early termination (pure math; the Pallas kernel's chunk skipping is an
    optimization below the parity tolerance),
  - expected-depth channel accumulates ``w_i * depth_i`` (caller divides by
    alpha as the reference trainer does, gsplat_trainer.py:887-891).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from splat_one_tpu.ops.projection import (ALPHA_CUT, Projected,
                                          conic_ellipse_radii)

ALPHA_MIN = ALPHA_CUT  # 1/255 — also drives projection.opacity_extent
ALPHA_MAX = 0.999


def composite_reference(
    proj: Projected,
    width: int,
    height: int,
    chunk: int = 256,
    wrap_x: bool = False,
    tile_size: int = 16,
):
    """Composite projected gaussians over a full image, per camera.

    Returns:
      rgb ``[C, H, W, D]``, alpha ``[C, H, W, 1]``, depth ``[C, H, W, 1]``.
    """
    C, N = proj.depths.shape
    D = proj.colors.shape[-1]
    n_pad = (-N) % chunk
    P = width * height

    px = (jnp.arange(width, dtype=jnp.float32) + 0.5)[None, :].repeat(height, 0)
    py = (jnp.arange(height, dtype=jnp.float32) + 0.5)[:, None].repeat(width, 1)
    px = px.reshape(-1)  # [P]
    py = py.reshape(-1)

    # Tile membership mask: the tile path only composites a gaussian into
    # pixels whose tile lies in its bbox (3-sigma radius, tile-granular).
    # Replicate it exactly (same arithmetic as intersect.tile_spans).
    TW = -(-width // tile_size)
    TH = -(-height // tile_size)
    ptx = (px // tile_size).astype(jnp.int32)  # [P]
    pty = (py // tile_size).astype(jnp.int32)

    def per_camera(p: Projected):
        # Depth-sort; invalid gaussians to the back with zero opacity.
        order = jnp.argsort(jnp.where(p.valid, p.depths, jnp.inf))
        opac = jnp.where(p.valid, p.opacities, 0.0)[order]
        xy = p.means2d[order]
        con = p.conics[order]
        col = p.colors[order]
        dep = p.depths[order]
        rad = p.radii[order]

        def pad(x):
            w = [(0, n_pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, w)

        opac, xy, con, col, dep, rad = map(pad, (opac, xy, con, col, dep, rad))
        n_chunks = (N + n_pad) // chunk
        resh = lambda x: x.reshape((n_chunks, chunk) + x.shape[1:])
        opac, xy, con, col, dep, rad = map(
            resh, (opac, xy, con, col, dep, rad)
        )

        def body(carry, inp):
            T, rgb, dsum = carry
            o, xy_c, con_c, col_c, dep_c, rad_c = inp
            dx = xy_c[:, 0:1] - px[None, :]  # [G, P]
            if wrap_x:
                # spherical/equirect azimuth seam: shortest wrapped distance
                # (expression kept bit-identical to the tile kernel's)
                dx = dx - width * jnp.round(dx * (1.0 / width))
            dy = xy_c[:, 1:2] - py[None, :]
            a, b, c = con_c[:, 0:1], con_c[:, 1:2], con_c[:, 2:3]
            sigma = 0.5 * (a * dx * dx + c * dy * dy) + b * dx * dy
            alpha = o[:, None] * jnp.exp(-sigma)
            alpha = jnp.where(sigma < 0, 0.0, alpha)
            alpha = jnp.minimum(alpha, ALPHA_MAX)
            alpha = jnp.where(alpha < ALPHA_MIN, 0.0, alpha)
            # tile-bbox truncation: per-axis opacity-aware ellipse extents,
            # identical float math to the tile/supertile list builders and
            # the stream kernels (projection.conic_ellipse_radii)
            u, v = xy_c[:, 0:1], xy_c[:, 1:2]
            rx, ry = conic_ellipse_radii(a, b, c, o[:, None])
            ty0 = jnp.clip(jnp.floor((v - ry) / tile_size), 0, TH)
            ty1 = jnp.clip(jnp.ceil((v + ry) / tile_size), 0, TH)
            in_y = (pty[None, :] >= ty0) & (pty[None, :] < ty1)
            if wrap_x:
                tx0 = jnp.floor((u - rx) / tile_size)
                tx1 = jnp.ceil((u + rx) / tile_size)
                span = jnp.minimum(tx1 - tx0, TW)
                rel = jnp.mod(ptx[None, :] - tx0.astype(jnp.int32), TW)
                in_x = rel < span
            else:
                tx0 = jnp.clip(jnp.floor((u - rx) / tile_size), 0, TW)
                tx1 = jnp.clip(jnp.ceil((u + rx) / tile_size), 0, TW)
                in_x = (ptx[None, :] >= tx0) & (ptx[None, :] < tx1)
            alpha = jnp.where(in_x & in_y, alpha, 0.0)
            logt = jnp.log1p(-alpha)
            # exclusive prefix of log-transmittance within the chunk
            cum_excl = jnp.cumsum(logt, axis=0) - logt
            w = alpha * jnp.exp(cum_excl) * T[None, :]  # [G, P]
            rgb = rgb + w.T @ col_c  # [P, D]
            dsum = dsum + w.T @ dep_c[:, None]  # [P, 1]
            T = T * jnp.exp(jnp.sum(logt, axis=0))
            return (T, rgb, dsum), None

        init = (
            jnp.ones((P,), jnp.float32),
            jnp.zeros((P, D), jnp.float32),
            jnp.zeros((P, 1), jnp.float32),
        )
        (T, rgb, dsum), _ = jax.lax.scan(
            body, init, (opac, xy, con, col, dep, rad)
        )
        alpha_img = 1.0 - T
        return (
            rgb.reshape(height, width, D),
            alpha_img.reshape(height, width, 1),
            dsum.reshape(height, width, 1),
        )

    return jax.vmap(per_camera)(proj)
