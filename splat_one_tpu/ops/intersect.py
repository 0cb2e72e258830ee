"""Tile-intersection builder: gaussians -> sorted, G-aligned per-tile lists.

TPU-native replacement for the GPU gsplat ``isect_tiles`` + radix-sort stage
(reference surface: the internals of ``gsplat.rendering.rasterization``,
called from utils/gsplat_utils/gsplat_trainer.py:477-494). The GPU version
scatters (tile_id, depth)-keyed intersections with atomics and radix-sorts
them; on TPU we use a scatter-free, fixed-capacity design (SURVEY.md §7 "hard
parts" 2-3):

  1. per-camera depth argsort of gaussians (so any stable tile sort
     afterwards leaves every per-tile subsequence depth-ordered),
  2. per-gaussian tile-bbox spans -> counts -> exclusive cumsum offsets,
  3. *gather-based expansion* to a static-capacity slot array: the
     slot->gaussian map is recovered with a marker-scatter + cumsum (one
     unique-index scatter of N markers, then an int cumsum — no
     variable-length scatter anywhere),
  4. one stable ``lax.sort`` by (camera, tile) key carrying the gaussian
     index as payload (sorts are cheap on TPU; measured ~1 ms at 600k keys),
  5. per-tile ranges via searchsorted, then *G-aligned re-layout*: every
     tile's slot range is padded up to a multiple of the rasterizer chunk G,
     so the Pallas kernels process whole chunks with no masking and no
     cross-tile overlap between chunk DMAs.

Perf-critical TPU detail (measured on v5e): 1-D scalar gathers cost ~5 ms per
750k elements while multi-column *row* gathers of the same count cost ~2 ms —
so every per-gaussian lookup here is packed into a small row table and
gathered once, and sorts carry payloads instead of being followed by gathers.
The backward's per-gaussian gradient reduction uses a precomputed
by-gaussian permutation + cumsum + boundary-diff (see ``gather_reduction``)
— never ``jax.ops.segment_sum``, whose XLA scatter-add lowering is
pathologically slow on TPU.

Spherical (equirectangular) cameras wrap in azimuth: a gaussian whose bbox
crosses the seam gets an unwrapped tile span and each covered tile is mapped
with ``mod TW`` (SURVEY.md §7 hard part 6).

Everything here is non-differentiable integer machinery; callers wrap it in
``lax.stop_gradient`` territory.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from splat_one_tpu.ops.projection import Projected, conic_ellipse_radii


@dataclasses.dataclass(frozen=True)
class IsectCaps:
    """Static capacities for the intersection pipeline (recompile points)."""

    exp_cap: int  # max total (gaussian, tile) intersections
    align_cap: int  # max total after G-alignment padding (>= exp_cap)
    chunk: int = 128  # rasterizer chunk G (MXU-friendly)

    @staticmethod
    def choose(num_gaussians: int, num_cameras: int, num_tiles: int,
               chunk: int = 128, avg_tiles_per_gaussian: float = 8.0):
        exp_cap = int(num_cameras * num_gaussians * avg_tiles_per_gaussian)
        exp_cap = max(exp_cap, 1024)
        exp_cap = -(-exp_cap // chunk) * chunk
        align_cap = exp_cap + num_cameras * num_tiles * chunk
        return IsectCaps(exp_cap=exp_cap, align_cap=align_cap, chunk=chunk)


class IsectData(NamedTuple):
    """Sorted, aligned per-tile intersection layout.

    ``slot_rank[p]`` is the *depth-rank* index of the gaussian occupying
    aligned slot p — an index into the per-camera depth-sorted ordering
    (camera-major, ``[C * N]``); padding/invalid slots hold the sentinel
    ``C * N``. ``rank_src[r]`` maps a depth-rank back to the original
    flattened ``[C * N]`` gaussian index. ``tile_starts`` has length
    ``C*TH*TW + 1``; every entry is a multiple of ``chunk``.

    For the backward reduction: ``rank_perm`` sorts aligned slots by
    ``slot_rank``; ``rank_bounds[r]`` is the start of rank r's contiguous
    run in that order — it equals the exclusive cumsum of the per-gaussian
    tile counts (free in forward; a searchsorted here would cost ~140 ms at
    1M queries on TPU).
    """

    slot_rank: jax.Array  # [align_cap] int32
    rank_src: jax.Array  # [C * N] int32
    tile_starts: jax.Array  # [CT + 1] int32 (aligned)
    rank_perm: jax.Array  # [align_cap] int32
    rank_bounds: jax.Array  # [C * N + 1] int32
    n_isect: jax.Array  # [] int32 raw intersection count
    n_slots: jax.Array  # [] int32 total aligned slots in use
    overflow: jax.Array  # [] bool — capacities exceeded (results truncated)


def _index_of_slot(markers_at: jax.Array, capacity: int) -> jax.Array:
    """Given start offsets of segments (sorted, duplicates allowed for empty
    segments), return for each slot s in [0, capacity) the index of the
    segment containing s — i.e. ``searchsorted(offsets, s, 'right') - 1`` —
    via one unique-position scatter-add + int cumsum (both ~free on TPU)."""
    buckets = jnp.zeros((capacity,), jnp.int32)
    # skip segment 0 (its offset is 0; slot 0 belongs to it by construction)
    upd = jnp.ones_like(markers_at[1:], dtype=jnp.int32)
    buckets = buckets.at[jnp.clip(markers_at[1:], 0, capacity - 1)].add(
        jnp.where(markers_at[1:] < capacity, upd, 0)
    )
    return jnp.cumsum(buckets)


def tile_spans(
    uv: jax.Array,  # [M, 2]
    rx: jax.Array,  # [M] 3-sigma ellipse half-extent in x
    ry: jax.Array,  # [M] 3-sigma ellipse half-extent in y
    valid: jax.Array,  # [M]
    width: int,
    height: int,
    tile_size: int,
    spherical_wrap: bool,
):
    """Per-gaussian tile bbox: (tx0, ty0, span_x, span_y) from the per-axis
    3-sigma ellipse extents (projection.conic_ellipse_radii — shared with the
    stream builder/kernels and the oracle). tx0 may be negative for spherical
    wraparound; tile x is taken mod TW at expansion time."""
    TW = -(-width // tile_size)
    TH = -(-height // tile_size)
    u, v = uv[:, 0], uv[:, 1]
    ty0 = jnp.clip(jnp.floor((v - ry) / tile_size), 0, TH).astype(jnp.int32)
    ty1 = jnp.clip(jnp.ceil((v + ry) / tile_size), 0, TH).astype(jnp.int32)
    span_y = jnp.maximum(ty1 - ty0, 0)
    if spherical_wrap:
        tx0 = jnp.floor((u - rx) / tile_size).astype(jnp.int32)
        tx1 = jnp.ceil((u + rx) / tile_size).astype(jnp.int32)
        span_x = jnp.minimum(tx1 - tx0, TW)
        tx0 = jnp.mod(tx0, TW)
    else:
        tx0 = jnp.clip(jnp.floor((u - rx) / tile_size), 0, TW).astype(jnp.int32)
        tx1 = jnp.clip(jnp.ceil((u + rx) / tile_size), 0, TW).astype(jnp.int32)
        span_x = jnp.maximum(tx1 - tx0, 0)
    span_x = jnp.where(valid, span_x, 0)
    span_y = jnp.where(valid, span_y, 0)
    return tx0, ty0, span_x, span_y


def build_intersections(
    proj: Projected,
    width: int,
    height: int,
    tile_size: int,
    caps: IsectCaps,
    camera_model: str = "pinhole",
    tile_lo=None,
    n_tiles_local: int = 0,
) -> IsectData:
    """Build the sorted, aligned intersection layout from projected gaussians.

    With ``tile_lo``/``n_tiles_local`` set, only tiles in
    ``[tile_lo, tile_lo + n_tiles_local)`` of the flattened (camera, tile)
    grid are kept, with ids re-based to the local range — the per-device
    path of tile-sharded multi-chip rasterization (``tile_lo`` may be a
    traced value; shapes depend only on the static ``n_tiles_local``).
    """
    C, N = proj.depths.shape
    TW = -(-width // tile_size)
    TH = -(-height // tile_size)
    T = TH * TW
    CT = C * T
    if n_tiles_local:
        CT = n_tiles_local
    M0 = C * N
    G = caps.chunk
    EXP = caps.exp_cap
    AL = caps.align_cap

    # 1. per-camera depth sort (invalid to the back).
    sort_key = jnp.where(proj.valid, proj.depths, jnp.inf)
    order = jnp.argsort(sort_key, axis=1)  # [C, N]
    cam_offset = (jnp.arange(C, dtype=jnp.int32) * N)[:, None]
    rank_src = (order.astype(jnp.int32) + cam_offset).reshape(-1)  # [M0]

    # 2. tile spans + per-gaussian meta table (single row gather later).
    con0 = proj.conics.reshape(M0, 3)
    rx0, ry0 = conic_ellipse_radii(
        con0[:, 0], con0[:, 1], con0[:, 2], proj.opacities.reshape(M0))
    geo = jnp.concatenate(
        [
            proj.means2d.reshape(M0, 2),
            rx0.reshape(M0, 1),
            ry0.reshape(M0, 1),
            proj.valid.reshape(M0, 1).astype(jnp.float32),
        ],
        axis=1,
    )[rank_src]  # [M0, 5] in depth order
    uv, rx, ry, valid = geo[:, 0:2], geo[:, 2], geo[:, 3], geo[:, 4] > 0.5
    tx0, ty0, span_x, span_y = tile_spans(
        uv, rx, ry, valid, width, height, tile_size,
        spherical_wrap=(camera_model == "spherical"),
    )
    counts = (span_x * span_y).astype(jnp.int32)  # [M0]
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]]
    )
    n_isect = offsets[-1] + counts[-1]
    overflow = n_isect > EXP

    # 3. expansion: slot s -> depth-rank gaussian g(s); all per-gaussian
    # lookups through one [M0, 4] int32 row gather.
    g_of_s = _index_of_slot(offsets, EXP)  # [EXP]
    meta = jnp.stack([tx0, ty0, jnp.maximum(span_x, 1), offsets], axis=1)
    meta_s = meta[g_of_s]  # [EXP, 4] row gather
    slot_ids = jnp.arange(EXP, dtype=jnp.int32)
    slot_ok = slot_ids < jnp.minimum(n_isect, EXP)
    local = slot_ids - meta_s[:, 3]
    sx = meta_s[:, 2]
    lx = local % sx
    ly = local // sx
    tile_x = meta_s[:, 0] + lx
    if camera_model == "spherical":
        tile_x = jnp.mod(tile_x, TW)
    tile_y = meta_s[:, 1] + ly
    cam = g_of_s // N
    tile_id = cam * T + tile_y * TW + tile_x
    if n_tiles_local:
        tile_id = tile_id - tile_lo
        slot_ok &= (tile_id >= 0) & (tile_id < CT)
    tile_id = jnp.where(slot_ok, tile_id, CT).astype(jnp.int32)

    # 4. stable sort by (camera, tile), carrying the gaussian rank as payload;
    # depth order is preserved within tiles.
    sorted_tiles, sorted_g = jax.lax.sort(
        [tile_id, g_of_s], is_stable=True, num_keys=1
    )

    # 5. per-tile ranges + G-aligned re-layout.
    raw_starts = jnp.searchsorted(
        sorted_tiles, jnp.arange(CT + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    tile_counts = raw_starts[1:] - raw_starts[:-1]  # [CT]
    counts_al = -(-tile_counts // G) * G
    starts_al = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts_al)]
    )  # [CT + 1]
    n_slots = starts_al[-1]
    overflow |= n_slots > AL
    # SAFETY: on overflow the kernels would otherwise DMA past align_cap
    # (out-of-bounds HBM reads hang the chip). Clamp to the last whole-chunk
    # boundary; truncation is reported via the overflow flag.
    starts_al = jnp.minimum(starts_al, (AL // G) * G)
    n_slots = starts_al[-1]

    # Per-slot tile metadata WITHOUT a [AL]-row gather (gathers on TPU are
    # row-rate-bound at ~7ns/row — measured): every needed quantity is
    # piecewise-constant and monotonic over the aligned ranges, so scatter
    # the per-tile value at each range start and forward-fill with cummax.
    def ffill_monotonic(vals_at_tile):  # [CT] monotonic non-decreasing
        arr = jnp.zeros((AL,), jnp.int32).at[
            jnp.clip(starts_al[:-1], 0, AL - 1)
        ].max(vals_at_tile)
        return jax.lax.cummax(arr)

    start_fill = ffill_monotonic(starts_al[:-1])
    raw_fill = ffill_monotonic(raw_starts[:-1])
    raw_end_fill = ffill_monotonic(raw_starts[1:])
    p_ids = jnp.arange(AL, dtype=jnp.int32)
    local_p = p_ids - start_fill
    src_raw = raw_fill + local_p
    p_ok = (src_raw < raw_end_fill) & (p_ids < n_slots)
    src = jnp.clip(src_raw, 0, EXP - 1)
    slot_rank = jnp.where(p_ok, sorted_g[src], M0).astype(jnp.int32)

    # 6. by-gaussian permutation for the backward reduction (sorts are
    # cheap in forward; the backward then only gathers + cumsums). In
    # by-rank order, rank r occupies a contiguous run whose length is
    # exactly its tile count, so the run boundaries are the counts cumsum
    # (clipped under overflow truncation).
    _, rank_perm = jax.lax.sort(
        [slot_rank, p_ids], is_stable=True, num_keys=1
    )
    # rank r's run length in by-rank order = its number of KEPT expansion
    # slots (tile-range filtering and overflow truncation both drop slots);
    # each gaussian's expansion slots are contiguous at [offsets[r], ...),
    # so the exclusive cumsum of kept counts is one prefix-sum gather.
    fcum = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(slot_ok.astype(jnp.int32))]
    )  # [EXP + 1]
    pos = jnp.concatenate([offsets, offsets[-1:] + counts[-1:]])  # [M0 + 1]
    rank_bounds = fcum[jnp.clip(pos, 0, EXP)]

    return IsectData(
        slot_rank=slot_rank,
        rank_src=rank_src,
        tile_starts=starts_al,
        rank_perm=rank_perm,
        rank_bounds=rank_bounds,
        n_isect=n_isect,
        n_slots=n_slots,
        overflow=overflow,
    )


# Packed-column layout for the rasterizer (columns of [align_cap, NF] /
# rows of the kernel-side [NF, G] chunk).
ROW_X = 0
ROW_Y = 1
ROW_CA = 2
ROW_CB = 3
ROW_CC = 4
ROW_OPAC = 5
ROW_R = 6
ROW_G = 7
ROW_B = 8
ROW_DEPTH = 9
NF = 16  # padded field count (power-of-two lane-friendly)

# Backward packed-gradient layout (same [NF, align_cap] shape).
GROW_DX = 0
GROW_DY = 1
GROW_DCA = 2
GROW_DCB = 3
GROW_DCC = 4
GROW_DOPAC = 5
GROW_DR = 6
GROW_DG = 7
GROW_DB = 8
GROW_DDEPTH = 9
GROW_ABSDX = 10
GROW_ABSDY = 11


def pack_fields(
    means2d: jax.Array,  # [C, N, 2]
    conics: jax.Array,  # [C, N, 3]
    colors: jax.Array,  # [C, N, 3]
    opacities: jax.Array,  # [C, N]
    depths: jax.Array,  # [C, N]
    isect: IsectData,
) -> jax.Array:
    """Gather per-(camera, gaussian) fields into the packed [NF, align_cap]
    slot array consumed by the Pallas rasterizer: one [M0, NF] field matrix,
    one row gather into depth-rank order, one row gather into slot order.
    Differentiable in the field inputs via the composite custom-VJP (which
    reduces packed grads with :func:`gather_reduction`)."""
    C, N = opacities.shape
    M0 = C * N
    fields = jnp.concatenate(
        [
            means2d.reshape(M0, 2),
            conics.reshape(M0, 3),
            opacities.reshape(M0, 1),
            colors.reshape(M0, 3),
            depths.reshape(M0, 1),
        ],
        axis=1,
    )  # [M0, 10] (column order == ROW_* layout)
    fields = jnp.pad(fields, ((0, 0), (0, NF - fields.shape[1])))
    fields_rank = jnp.pad(fields[isect.rank_src], ((0, 1), (0, 0)))
    packed = fields_rank[isect.slot_rank]  # [AL, NF]; sentinel -> zero row
    return packed.T  # [NF, AL] kernel layout


def gather_reduction(
    pgrads: jax.Array,  # [NF, align_cap] per-slot gradients (kernel output)
    isect: IsectData,
    num_flat: int,  # M0 = C * N
) -> jax.Array:
    """Reduce per-slot gradients to per-(camera, gaussian) gradients without
    any scatter: permute slots into by-gaussian order (permutation precomputed
    in forward), then cumsum + segment-boundary differences, then un-permute
    through the depth-rank map.

    f32 note: the cumsum runs over the full slot axis; gradient channels are
    mixed-sign so the running sum random-walks and the boundary difference
    keeps ~1e-6 relative accuracy at production sizes (CPU tests cross-check
    against exact summation). An exact blocked Pallas reduction can replace
    this if profiling ever shows drift.
    """
    M0 = num_flat
    g_sorted = pgrads.T[isect.rank_perm]  # [AL, NF] row gather
    cs = jnp.cumsum(g_sorted.astype(jnp.float32), axis=0)
    cs = jnp.concatenate([jnp.zeros((1, cs.shape[1]), cs.dtype), cs], axis=0)
    # one gather at all bounds, then adjacent diffs (gathers are
    # row-rate-bound: one [M0+1] gather beats two [M0] gathers)
    cs_at = cs[isect.rank_bounds]  # [M0 + 1, NF]
    per_rank = cs_at[1:] - cs_at[:-1]  # [M0, NF] depth-rank space
    # un-permute: original flat index j sits at depth-rank inv[j]
    inv = jnp.zeros((M0,), jnp.int32).at[isect.rank_src].set(
        jnp.arange(M0, dtype=jnp.int32)
    )
    return per_rank[inv]  # [M0, NF] in original (camera-major) order
