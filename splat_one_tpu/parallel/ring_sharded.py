"""Ring-exchanged gaussian-sharded x supertile-sharded rasterization.

The full multi-chip layout of BASELINE configs 4-5 (SURVEY.md §2c row 3,
§5.7-5.8), composing the two shardings that ``parallel.train_step`` and
``parallel.tile_sharded`` each demonstrate alone:

  - every device owns a GAUSSIAN shard (projection + SH eval run only on
    the local 1/n of the splats — the memory-heavy stage), and
  - every device owns a SUPERTILE SLAB of the image (the intersection
    machinery, packing, and Pallas compositing kernels each run only on
    the local 1/n of the (camera, supertile) grid).

Between the two, projected screen-space fields (a few floats per
gaussian — much smaller than the SH-laden parameters) move around a ring
of ``jax.lax.ppermute`` hops instead of one bulk ``all_gather``: at round
k device i holds shard (i - k) mod n, accumulates its slab intersections
for that shard, and forwards the fields to its ring neighbour. XLA splits
each hop into collective-permute-start/done, so the k-th hop's transfer
overlaps the (k-1)-th shard's binning compute on ICI — the TPU-native
replacement for the reference's NCCL all-to-all inside
``gsplat.rendering.rasterization(distributed=True)``
(utils/gsplat_utils/gsplat_trainer.py:491, 944-998).

The autodiff transpose reverses the ring: each slab's packed-field
gradients retrace the ppermute hops back to the owning shard, and
parameter gradients stay fully sharded end-to-end — no replicated
gradient buffer ever materializes.
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


def rasterization_ring_sharded(
    means: jax.Array,  # [N, 3] — sharded over mesh[axis] on axis 0
    quats: jax.Array,
    scales: jax.Array,
    opacities: jax.Array,
    sh_coeffs: jax.Array,
    viewmats: jax.Array,  # [C, 4, 4] replicated
    Ks: jax.Array,  # [C, 3, 3] replicated
    width: int,
    height: int,
    mesh: Mesh,
    axis: str = "shard",
    *,
    sh_degree: int = 3,
    tile_size: int = 16,
    camera_model: str = "pinhole",
    caps: Optional[StreamCaps] = None,  # LOCAL-slab intersection caps
    alive: Optional[jax.Array] = None,  # [N] bool, sharded like means
):
    """Render C cameras with gaussians AND supertiles sharded over
    ``mesh[axis]``; returns (rgb, alpha, depth) images, differentiable in
    all gaussian parameters (gradients land on the owning shard)."""
    n = mesh.shape[axis]
    C = viewmats.shape[0]
    N = means.shape[0]
    n_local = N // n
    tw, th, sw, sh = si_mod.supertile_grid(width, height, tile_size)
    cs_global = C * sw * sh
    # pad the (camera, supertile) grid to a device multiple: trailing
    # phantom supertiles get empty stream ranges (no gaussian maps to an
    # out-of-range supertile id), render as background on the last device,
    # and are sliced off before image assembly — any ring size works
    cs_local = -(-cs_global // n)
    if caps is None:
        # per-slab cap: the global intersection budget split over n slabs,
        # with 4x slack because supertile load is far from uniform (central
        # slabs see several times the mean). For pinhole, stream_isect
        # counts in-slab intersections EXACTLY (contiguous bbox subrange),
        # so this is a true per-device budget; overflow raises the flag.
        caps = StreamCaps.choose(
            N, C, cs_local, avg_supertiles_per_gaussian=12.0 / n
        )
    # slab cfg: kernel grid spans only the local supertiles; pixel coords
    # are recovered from the global supertile id via tile_offset
    cfg = StreamCfg(
        width=width, height=height, tile_size=tile_size,
        num_cameras=C, num_gaussians=N, chunk=caps.chunk,
        exp_cap=caps.exp_cap, n_supertiles=sw * sh,
        wrap_x=(camera_model == "spherical"), ss=caps.ss,
        cs_local=cs_local,
    )
    perm = [(j, (j + 1) % n) for j in range(n)]

    def shard_fn(means, quats, scales, opacities, sh_coeffs, alive_s,
                 viewmats, Ks):
        i = jax.lax.axis_index(axis)
        st_lo = (i * cs_local).astype(jnp.int32)
        proj = project_gaussians(
            means, quats, scales, opacities, viewmats, Ks, width, height,
            sh_coeffs=sh_coeffs, sh_degree=sh_degree,
            camera_model=camera_model,
            alive=None if alive is None else alive_s,
        )
        # ring: round k holds shard (i - k) mod n; keep every round's
        # projected fields (the concat is what the compositor consumes) and
        # pass them on. ppermute(start/done) overlaps the next hop's
        # transfer with this round's work.
        rounds = []
        cur = proj
        for k in range(n):
            rounds.append(cur)
            if k + 1 < n:
                cur = jax.tree.map(
                    lambda x: jax.lax.ppermute(x, axis, perm), cur
                )
        proj_cat = jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=1), *rounds
        )
        isect = si_mod.build_stream_intersections(
            jax.lax.stop_gradient(proj_cat), width, height, tile_size,
            caps, camera_model=camera_model,
            st_lo=st_lo, n_st_local=cs_local,
        )
        out = stream_raster.composite_stream(
            cfg, proj_cat.means2d, proj_cat.conics, proj_cat.colors,
            proj_cat.opacities, proj_cat.depths, proj_cat.radii, isect,
            tile_offset=st_lo[None],
        )
        return out  # [cs_local, NT, OUT_CH, P]

    g = Pspec(axis)
    sharded = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(g, g, g, g, g,
                  g if alive is not None else Pspec(),
                  Pspec(), Pspec()),
        out_specs=g,
        check_vma=False,
    )
    alive_in = alive if alive is not None else jnp.zeros((n,), jnp.bool_)
    out = sharded(means, quats, scales, opacities, sh_coeffs, alive_in,
                  viewmats, Ks)  # [cs_local * n, NT, OUT_CH, P]
    out = out[:cs_global]
    full_cfg = StreamCfg(
        width=width, height=height, tile_size=tile_size,
        num_cameras=C, num_gaussians=N, chunk=caps.chunk,
        exp_cap=caps.exp_cap, n_supertiles=sw * sh,
        wrap_x=(camera_model == "spherical"), ss=caps.ss,
    )
    rgb, alpha, depth = stream_raster.stream_to_image(full_cfg, out)
    # expected depth (gsplat ED semantics, matching render.rasterization)
    return rgb, alpha, depth / jnp.clip(alpha, 1e-10, None)
