"""Public rasterization API — the TPU-native ``gsplat.rendering.rasterization``.

Mirrors the exact call surface the reference trainer uses
(utils/gsplat_utils/gsplat_trainer.py:477-494):

    rasterization(means, quats, scales, opacities, colors, viewmats, Ks,
                  width, height, sh_degree, render_mode in {RGB, RGB+ED, ED},
                  rasterize_mode in {classic, antialiased},
                  camera_model in {pinhole, ortho, fisheye, spherical},
                  near_plane, far_plane, radius_clip, absgrad)
      -> (render_colors [C,H,W,3|4], render_alphas [C,H,W,1], info)

``info`` exposes ``radii`` [C, N] and the densification gradient hooks
(``means2d_dummy`` / ``absgrad_dummy`` cotangent slots) that play the role of
gsplat's ``info["means2d"].grad`` / ``.absgrad`` consumed by the strategies
(gsplat_trainer.py:616-622, 744-761).

Pipeline: differentiable EWA projection (ops.projection, plain JAX autodiff)
-> stop-gradient intersection layout -> custom-VJP Pallas compositing ->
image assembly (pure reshapes). Two compositing backends exist:

  - ``impl="stream"`` (default): supertile-stream rasterizer
    (ops.stream_isect + ops.stream_raster) — one (supertile, depth) sort,
    ~2.2x fewer rows through the rate-bound gather/sort glue, per-tile
    early termination.
  - ``impl="tiled"``: first-generation per-tile-list rasterizer
    (ops.intersect + ops.tile_raster), kept as a cross-check oracle and
    for the tile-sharded multi-chip path until it migrates.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

from splat_one_tpu.ops import intersect as isect_mod
from splat_one_tpu.ops import stream_isect as si_mod
from splat_one_tpu.ops import stream_raster, tile_raster
from splat_one_tpu.ops.intersect import IsectCaps
from splat_one_tpu.ops.projection import project_gaussians
from splat_one_tpu.ops.stream_isect import StreamCaps
from splat_one_tpu.ops.stream_raster import StreamCfg
from splat_one_tpu.ops.tile_raster import RasterCfg


def rasterization(
    means: jax.Array,  # [N, 3]
    quats: jax.Array,  # [N, 4]
    scales: jax.Array,  # [N, 3]
    opacities: jax.Array,  # [N]
    colors: jax.Array,  # [N, K, 3] SH coeffs if sh_degree is not None else [N, 3]
    viewmats: jax.Array,  # [C, 4, 4]
    Ks: jax.Array,  # [C, 3, 3]
    width: int,
    height: int,
    *,
    sh_degree: Optional[int] = None,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    radius_clip: float = 0.0,
    tile_size: int = 16,
    camera_model: str = "pinhole",
    render_mode: str = "RGB",
    rasterize_mode: str = "classic",
    backgrounds: Optional[jax.Array] = None,  # [C, 3]
    caps: Optional[Union[IsectCaps, StreamCaps]] = None,
    alive: Optional[jax.Array] = None,  # [N] bool (fixed-capacity buffers)
    means2d_dummy: Optional[jax.Array] = None,  # [C, N, 2] grad hook
    absgrad_dummy: Optional[jax.Array] = None,  # [C, N, 2] absgrad hook
    impl: Optional[str] = None,  # "stream" | "tiled"; inferred from caps
    proj_transform=None,  # Projected -> Projected, applied after projection
    st_shard: Optional[tuple] = None,  # (axis_name, n_shards): under
    # shard_map, partition the (camera, supertile) grid over the named mesh
    # axis — each device builds intersections and composites only its slab
    # (caps are PER-SLAB), slabs are all_gather'd for image assembly. This
    # removes the n-fold compositing redundancy of gathering projections
    # onto every shard (stream impl only).
):
    """Render gaussians into C cameras. Fully differentiable.

    Returns ``(render_colors, render_alphas, info)``; ``info`` holds
    ``radii`` [C, N] (stop-gradient), the isect layout, and overflow flag.

    ``proj_transform`` is the multi-chip hook (SURVEY.md §2c): under
    ``shard_map`` the caller projects only its local gaussian shard and
    passes ``lambda p: tree all_gather(p, 'gauss')`` here; autodiff turns
    the gather into a psum_scatter of gradients back to the owning shard
    (gsplat's ``rasterization(distributed=True)`` analog,
    reference utils/gsplat_utils/gsplat_trainer.py:491). The means2d /
    absgrad dummies are added BEFORE the transform, so their cotangents
    stay local-shard-shaped for per-shard densification stats.
    ``info["radii_local"]`` is the pre-transform radii for the same reason.
    """
    if render_mode not in ("RGB", "RGB+ED", "RGB+D", "ED", "D"):
        raise ValueError(f"bad render_mode {render_mode!r}")
    if rasterize_mode not in ("classic", "antialiased"):
        raise ValueError(f"bad rasterize_mode {rasterize_mode!r}")
    N = means.shape[0]
    C = viewmats.shape[0]

    sh = colors if sh_degree is not None else None
    flat_colors = colors if sh_degree is None else None
    proj = project_gaussians(
        means, quats, scales, opacities, viewmats, Ks, width, height,
        sh_coeffs=sh, sh_degree=(sh_degree or 0), colors=flat_colors,
        camera_model=camera_model, near_plane=near_plane, far_plane=far_plane,
        radius_clip=radius_clip,
        antialiased=(rasterize_mode == "antialiased"), alive=alive,
    )
    if means2d_dummy is not None:
        # Zero-valued input whose cotangent equals d(loss)/d(means2d) — the
        # JAX analog of gsplat's retained means2d.grad for densification.
        proj = proj._replace(means2d=proj.means2d + means2d_dummy)
    radii_local = proj.radii
    if proj_transform is not None:
        proj = proj_transform(proj)
        N = proj.means2d.shape[1]  # post-gather (full) gaussian count
    means2d = proj.means2d

    if impl is None:
        impl = "tiled" if isinstance(caps, IsectCaps) else "stream"
    proj_sg = jax.lax.stop_gradient(proj)

    if impl == "stream":
        if not isinstance(caps, StreamCaps):
            _, _, sgw, sgh = si_mod.supertile_grid(
                width, height, tile_size
            )
            caps = StreamCaps.choose(N, C, C * sgw * sgh)
        # grid at the CAPS' supertile size (ss is a caps knob, and `sh`
        # must stay the SH-coefficients variable above)
        _, _, sgw, sgh = si_mod.supertile_grid(
            width, height, tile_size, caps.ss
        )
        full_cfg = StreamCfg.from_caps(
            caps, width, height, tile_size, C, N,
            wrap_x=(camera_model == "spherical"),
            absgrad=(absgrad_dummy is not None),
        )
        if st_shard is not None:
            # slab-shard the (camera, supertile) grid over the mesh axis:
            # ceil-padded slabs (phantom cells stay empty), per-slab isect
            # + compositing, one tiled all_gather of the slab outputs
            axis_name, n_sh = st_shard
            cs_global = C * sgw * sgh
            cs_local = -(-cs_global // n_sh)
            st_lo = (
                jax.lax.axis_index(axis_name) * cs_local
            ).astype(jnp.int32)
            cfg = StreamCfg(
                width=width, height=height, tile_size=tile_size,
                num_cameras=C, num_gaussians=N, chunk=caps.chunk,
                exp_cap=caps.exp_cap, n_supertiles=sgw * sgh,
                wrap_x=(camera_model == "spherical"),
                absgrad=(absgrad_dummy is not None), ss=caps.ss,
                cs_local=cs_local,
            )
            isect = si_mod.build_stream_intersections(
                proj_sg, width, height, tile_size, caps,
                camera_model=camera_model,
                st_lo=st_lo, n_st_local=cs_local,
            )
            out = stream_raster.composite_stream(
                cfg, means2d, proj.conics, proj.colors, proj.opacities,
                proj.depths, proj_sg.radii, isect,
                abs_dummy=absgrad_dummy, tile_offset=st_lo[None],
            )
            out = jax.lax.all_gather(
                out, axis_name, axis=0, tiled=True
            )[:cs_global]
            rgb, alpha, depth = stream_raster.stream_to_image(
                full_cfg, out
            )
        else:
            cfg = full_cfg
            isect = si_mod.build_stream_intersections(
                proj_sg, width, height, tile_size, caps,
                camera_model=camera_model,
            )
            out = stream_raster.composite_stream(
                cfg, means2d, proj.conics, proj.colors, proj.opacities,
                proj.depths, proj_sg.radii, isect, abs_dummy=absgrad_dummy,
            )
            rgb, alpha, depth = stream_raster.stream_to_image(cfg, out)
    else:
        if not isinstance(caps, IsectCaps):
            tw = -(-width // tile_size)
            th = -(-height // tile_size)
            caps = IsectCaps.choose(N, C, tw * th)
        cfg = RasterCfg(
            width=width, height=height, tile_size=tile_size,
            num_cameras=C, num_gaussians=N, chunk=caps.chunk,
            align_cap=caps.align_cap, wrap_x=(camera_model == "spherical"),
        )
        isect = isect_mod.build_intersections(
            proj_sg, width, height, tile_size, caps,
            camera_model=camera_model,
        )
        tile_out = tile_raster.composite_tiles(
            cfg, means2d, proj.conics, proj.colors, proj.opacities,
            proj.depths, isect, abs_dummy=absgrad_dummy,
        )
        rgb, alpha, depth = tile_raster.tiles_to_image(cfg, tile_out)

    if backgrounds is not None:
        rgb = rgb + (1.0 - alpha) * backgrounds[:, None, None, :]

    if "ED" in render_mode:
        # gsplat semantics: ED = EXPECTED depth (accumulated / alpha); the
        # raw accumulated value is the D modes (reference consumes RGB+ED
        # without re-normalizing, gsplat_trainer.py:595-599, 890-894)
        depth = depth / jnp.clip(alpha, 1e-10, None)
    if render_mode == "RGB":
        render = rgb
    elif render_mode in ("RGB+ED", "RGB+D"):
        render = jnp.concatenate([rgb, depth], axis=-1)
    else:  # ED / D
        render = depth

    n_isect = isect.n_isect
    overflow = isect.overflow
    if st_shard is not None:
        # per-slab caps: growth must track the max slab load; overflow
        # anywhere is overflow everywhere (all shards share static caps)
        n_isect = jax.lax.pmax(n_isect, st_shard[0])
        overflow = jax.lax.psum(
            overflow.astype(jnp.int32), st_shard[0]) > 0
    info = {
        "radii": proj.radii,
        "radii_local": radii_local,
        "depths": proj.depths,
        "valid": proj.valid,
        "n_isect": n_isect,
        "overflow": overflow,
        "width": width,
        "height": height,
        "n_cameras": C,
    }
    return render, alpha, info
