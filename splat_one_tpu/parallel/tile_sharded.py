"""Tile-sharded multi-chip rasterization (BASELINE configs 4-5).

The structural "sequence-parallel" analog the survey identifies
(SURVEY.md §2c, §5.7): within a single camera, the (tiles x gaussians)
compositing is sharded by *supertiles* across the device mesh — each chip
builds the intersection stream for its own contiguous supertile slab (the
slab expansion enumerates exactly the in-slab intersections; shapes depend
only on the static per-device slab size) and runs the supertile-stream
Pallas kernels (``ops.stream_raster`` — the production rasterizer; the
gen-1 tiled kernels remain only as the parity oracle) on it, producing its
slab of the image. Gaussian-parameter gradients from the custom VJP are
partial per-chip and are summed by the shard_map transpose (`psum` over
the tile axis, riding ICI).

This divides the *entire* per-camera pipeline — intersection machinery,
packing, forward and backward kernels — across chips, not just the
compositing FLOPs. Projection is computed replicated here (cheap: ~3 ms at
1M gaussians); ``parallel.ring_sharded`` and the mesh Trainer's ring
exchange compose this slab sharding with gaussian-sharded projection.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as Pspec

from splat_one_tpu.ops import stream_isect as si_mod
from splat_one_tpu.ops import stream_raster
from splat_one_tpu.ops.projection import project_gaussians
from splat_one_tpu.ops.stream_isect import StreamCaps
from splat_one_tpu.ops.stream_raster import StreamCfg


def rasterization_tile_sharded(
    means: jax.Array,
    quats: jax.Array,
    scales: jax.Array,
    opacities: jax.Array,
    sh_coeffs: jax.Array,
    viewmats: jax.Array,  # [C, 4, 4]
    Ks: jax.Array,  # [C, 3, 3]
    width: int,
    height: int,
    mesh: Mesh,
    axis: str = "tiles",
    *,
    sh_degree: int = 3,
    tile_size: int = 16,
    camera_model: str = "pinhole",
    caps: Optional[StreamCaps] = None,  # LOCAL-slab intersection caps
):
    """Render with the (camera, supertile) grid sharded over ``mesh[axis]``.

    Returns (rgb [C,H,W,3], alpha [C,H,W,1], depth [C,H,W,1]); fully
    differentiable in the gaussian parameters (per-chip partial gradients
    are psum'd by the shard_map transpose).
    """
    n_dev = mesh.shape[axis]
    C = viewmats.shape[0]
    N = means.shape[0]
    tw, th, sw, sh = si_mod.supertile_grid(width, height, tile_size)
    cs_global = C * sw * sh
    # pad the (camera, supertile) grid to a device multiple: trailing
    # phantom supertiles get empty stream ranges, render as background on
    # the last devices, and are sliced off before image assembly — any
    # mesh size works
    cs_local = -(-cs_global // n_dev)
    if caps is None:
        # per-slab budget (exact in-slab counts; 4x slack for slab load
        # imbalance — central slabs see several times the mean)
        caps = StreamCaps.choose(
            N, C, cs_local,
            avg_supertiles_per_gaussian=max(12.0 / n_dev, 0.75),
        )
    cfg = StreamCfg(
        width=width, height=height, tile_size=tile_size,
        num_cameras=C, num_gaussians=N, chunk=caps.chunk,
        exp_cap=caps.exp_cap, n_supertiles=sw * sh,
        wrap_x=(camera_model == "spherical"), ss=caps.ss,
        cs_local=cs_local,
    )

    def shard_fn(means, quats, scales, opacities, sh_coeffs, viewmats, Ks):
        dev = jax.lax.axis_index(axis)
        st_lo = (dev * cs_local).astype(jnp.int32)
        proj = project_gaussians(
            means, quats, scales, opacities, viewmats, Ks, width, height,
            sh_coeffs=sh_coeffs, sh_degree=sh_degree,
            camera_model=camera_model,
        )
        isect = si_mod.build_stream_intersections(
            jax.lax.stop_gradient(proj), width, height, tile_size, caps,
            camera_model=camera_model,
            st_lo=st_lo, n_st_local=cs_local,
        )
        out = stream_raster.composite_stream(
            cfg, proj.means2d, proj.conics, proj.colors, proj.opacities,
            proj.depths, proj.radii, isect, tile_offset=st_lo[None],
        )
        return out  # [cs_local, NT, OUT_CH, P]

    sharded = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(Pspec(),) * 7,
        out_specs=Pspec(axis),
        check_vma=False,
    )
    out = sharded(
        means, quats, scales, opacities, sh_coeffs, viewmats, Ks
    )  # [cs_local * n_dev, NT, OUT_CH, P]
    full_cfg = StreamCfg(
        width=width, height=height, tile_size=tile_size,
        num_cameras=C, num_gaussians=N, chunk=caps.chunk,
        exp_cap=caps.exp_cap, n_supertiles=sw * sh,
        wrap_x=(camera_model == "spherical"), ss=caps.ss,
    )
    rgb, alpha, depth = stream_raster.stream_to_image(
        full_cfg, out[:cs_global]
    )
    # expected depth (gsplat ED semantics, matching render.rasterization)
    return rgb, alpha, depth / jnp.clip(alpha, 1e-10, None)
