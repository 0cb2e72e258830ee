"""Tile-sharded multi-chip rasterization (BASELINE configs 4-5).

The structural "sequence-parallel" analog the survey identifies
(SURVEY.md §2c, §5.7): within a single camera, the (tiles x gaussians)
compositing is sharded by *tiles* across the device mesh — each chip builds
the intersection layout for its own contiguous tile slab (the expansion
filters + re-bases tile ids; shapes depend only on the static per-device
tile count) and runs the Pallas compositing kernels on it, producing its
slab of the image. Gaussian-parameter gradients from the custom VJP are
partial per-chip and are summed by the shard_map transpose (`psum` over the
tile axis, riding ICI).

This divides the *entire* per-camera pipeline — intersection machinery,
packing, forward and backward kernels — across chips, not just the
compositing FLOPs. Projection is computed replicated here (cheap: ~3 ms at
1M gaussians); composing this with the gaussian-sharded projection of
``parallel.train_step`` is the planned full layout.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as Pspec

from splat_one_tpu.ops import intersect as isect_mod
from splat_one_tpu.ops import tile_raster
from splat_one_tpu.ops.intersect import IsectCaps
from splat_one_tpu.ops.projection import project_gaussians
from splat_one_tpu.ops.tile_raster import RasterCfg


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
    caps: Optional[IsectCaps] = None,
):
    """Render with the (camera, tile) grid sharded over ``mesh[axis]``.

    Returns (rgb [C,H,W,3], alpha [C,H,W,1], depth [C,H,W,1]); fully
    differentiable in the gaussian parameters (per-chip partial gradients
    are psum'd by the shard_map transpose).
    """
    n_dev = mesh.shape[axis]
    C = viewmats.shape[0]
    N = means.shape[0]
    tw = -(-width // tile_size)
    th = -(-height // tile_size)
    ct_global = C * tw * th
    # pad the (camera, tile) grid to a device multiple: trailing phantom
    # tiles get empty intersection ranges (no gaussian bbox maps to an
    # out-of-range tile id), render as background, and are sliced off
    # before image assembly — any mesh size works
    ct_local = -(-ct_global // n_dev)
    if caps is None:
        caps = IsectCaps.choose(
            N, C, ct_local, avg_tiles_per_gaussian=8.0
        )
    cfg = RasterCfg(
        width=width, height=height, tile_size=tile_size,
        num_cameras=C, num_gaussians=N, chunk=caps.chunk,
        align_cap=caps.align_cap, wrap_x=(camera_model == "spherical"),
    )
    # per-device tile count overrides the derived global count
    cfg = RasterCfg(
        **{**cfg.__dict__, "num_cameras": C},
    )

    def shard_fn(means, quats, scales, opacities, sh_coeffs, viewmats, Ks):
        dev = jax.lax.axis_index(axis)
        tile_lo = (dev * ct_local).astype(jnp.int32)
        proj = project_gaussians(
            means, quats, scales, opacities, viewmats, Ks, width, height,
            sh_coeffs=sh_coeffs, sh_degree=sh_degree,
            camera_model=camera_model,
        )
        isect = isect_mod.build_intersections(
            jax.lax.stop_gradient(proj), width, height, tile_size, caps,
            camera_model=camera_model,
            tile_lo=tile_lo, n_tiles_local=ct_local,
        )
        local_cfg = _local_cfg(cfg, ct_local)
        tile_out = tile_raster.composite_tiles(
            local_cfg, proj.means2d, proj.conics, proj.colors,
            proj.opacities, proj.depths, isect,
            tile_offset=tile_lo[None],
        )
        return tile_out  # [ct_local, OUT_CH, P]

    sharded = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(Pspec(),) * 7,
        out_specs=Pspec(axis),
        check_vma=False,
    )
    tile_out = sharded(
        means, quats, scales, opacities, sh_coeffs, viewmats, Ks
    )  # [ct_local * n_dev, OUT_CH, P]
    rgb, alpha, depth = tile_raster.tiles_to_image(
        cfg, tile_out[:ct_global]
    )
    # expected depth (gsplat ED semantics, matching render.rasterization)
    return rgb, alpha, depth / jnp.clip(alpha, 1e-10, None)


@functools.lru_cache(maxsize=16)
def _local_cfg_cached(cfg_tuple, ct_local):
    d = dict(cfg_tuple)
    return _LocalCfg(RasterCfg(**d), ct_local)


class _LocalCfg:
    """RasterCfg view whose grid spans only the local tile slab (``ct``)
    while pixel-coordinate math still uses the global tile geometry via the
    kernel's tile_offset."""

    def __init__(self, base: RasterCfg, ct_local: int):
        self._base = base
        self._ct = ct_local

    def __getattr__(self, k):
        return getattr(self._base, k)

    @property
    def ct(self):
        return self._ct

    def __hash__(self):
        return hash((self._base, self._ct))

    def __eq__(self, other):
        return (
            isinstance(other, _LocalCfg)
            and self._base == other._base
            and self._ct == other._ct
        )


def _local_cfg(cfg: RasterCfg, ct_local: int) -> "_LocalCfg":
    return _LocalCfg(cfg, ct_local)
