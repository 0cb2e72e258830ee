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
  4. one stable sort by (camera, tile) key over the expansion slots,
  5. per-tile ranges via searchsorted, then *G-aligned re-layout*: every
     tile's slot range is padded up to a multiple of the rasterizer chunk G,
     so the Pallas kernels process whole chunks with no masking and no
     cross-tile overlap between chunk DMAs.

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

from splat_one_tpu.ops.projection import Projected


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
        align_cap = exp_cap + num_cameras * num_tiles * chunk
        return IsectCaps(exp_cap=exp_cap, align_cap=align_cap, chunk=chunk)


class IsectData(NamedTuple):
    """Sorted, aligned per-tile intersection layout.

    ``slot_src[p]`` indexes the flattened per-(camera, gaussian) projected
    arrays ``[C * N]`` (camera-major); invalid/padding slots hold the sentinel
    ``C * N``. ``tile_starts`` has length ``C*TH*TW + 1`` and every entry is a
    multiple of ``chunk``.
    """

    slot_src: jax.Array  # [align_cap] int32
    tile_starts: jax.Array  # [CT + 1] int32 (aligned)
    n_isect: jax.Array  # [] int32 raw intersection count
    n_slots: jax.Array  # [] int32 total aligned slots in use
    overflow: jax.Array  # [] bool — capacities exceeded (results truncated)


def _index_of_slot(markers_at: jax.Array, capacity: int) -> jax.Array:
    """Given start offsets of segments (sorted, with possible duplicates for
    empty segments), return for each slot s in [0, capacity) the index of the
    segment containing s — i.e. ``searchsorted(offsets, s, 'right') - 1`` —
    computed with one unique-position scatter-add + cumsum instead of a
    binary-search gather storm."""
    buckets = jnp.zeros((capacity,), jnp.int32)
    # skip segment 0 (its offset is 0; slot 0 belongs to it by construction)
    upd = jnp.ones_like(markers_at[1:], dtype=jnp.int32)
    buckets = buckets.at[jnp.clip(markers_at[1:], 0, capacity - 1)].add(
        jnp.where(markers_at[1:] < capacity, upd, 0)
    )
    return jnp.cumsum(buckets)


def tile_spans(
    uv: jax.Array,  # [M, 2]
    radius: jax.Array,  # [M]
    valid: jax.Array,  # [M]
    width: int,
    height: int,
    tile_size: int,
    spherical_wrap: bool,
):
    """Per-gaussian tile bbox: (tx0, ty0, span_x, span_y). tx0 may be negative
    for spherical wraparound; tile x is taken mod TW at expansion time."""
    TW = -(-width // tile_size)
    TH = -(-height // tile_size)
    u, v = uv[:, 0], uv[:, 1]
    ty0 = jnp.clip(jnp.floor((v - radius) / tile_size), 0, TH).astype(jnp.int32)
    ty1 = jnp.clip(jnp.ceil((v + radius) / tile_size), 0, TH).astype(jnp.int32)
    span_y = jnp.maximum(ty1 - ty0, 0)
    if spherical_wrap:
        tx0 = jnp.floor((u - radius) / tile_size).astype(jnp.int32)
        tx1 = jnp.ceil((u + radius) / tile_size).astype(jnp.int32)
        span_x = jnp.minimum(tx1 - tx0, TW)
        tx0 = jnp.mod(tx0, TW)
    else:
        tx0 = jnp.clip(jnp.floor((u - radius) / tile_size), 0, TW).astype(jnp.int32)
        tx1 = jnp.clip(jnp.ceil((u + radius) / tile_size), 0, TW).astype(jnp.int32)
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
) -> IsectData:
    """Build the sorted, aligned intersection layout from projected gaussians."""
    C, N = proj.depths.shape
    TW = -(-width // tile_size)
    TH = -(-height // tile_size)
    T = TH * TW
    CT = C * T
    M0 = C * N
    G = caps.chunk
    EXP = caps.exp_cap
    AL = caps.align_cap

    # 1. per-camera depth sort (invalid to the back).
    sort_key = jnp.where(proj.valid, proj.depths, jnp.inf)
    order = jnp.argsort(sort_key, axis=1)  # [C, N]
    cam_offset = (jnp.arange(C, dtype=jnp.int32) * N)[:, None]
    dsorted_src = (order.astype(jnp.int32) + cam_offset).reshape(-1)  # [M0]

    uv = proj.means2d.reshape(M0, 2)[dsorted_src]
    radius = proj.radii.reshape(M0)[dsorted_src]
    valid = proj.valid.reshape(M0)[dsorted_src]

    # 2. tile spans and counts.
    tx0, ty0, span_x, span_y = tile_spans(
        uv, radius, valid, width, height, tile_size,
        spherical_wrap=(camera_model == "spherical"),
    )
    counts = (span_x * span_y).astype(jnp.int32)  # [M0]
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]]
    )
    n_isect = offsets[-1] + counts[-1]
    overflow = n_isect > EXP

    # 3. expansion: slot s -> depth-rank gaussian index g(s).
    g_of_s = _index_of_slot(offsets, EXP)  # [EXP]
    slot_ids = jnp.arange(EXP, dtype=jnp.int32)
    slot_ok = slot_ids < jnp.minimum(n_isect, EXP)
    local = slot_ids - offsets[g_of_s]
    sx = jnp.maximum(span_x[g_of_s], 1)
    lx = local % sx
    ly = local // sx
    tile_x = tx0[g_of_s] + lx
    if camera_model == "spherical":
        tile_x = jnp.mod(tile_x, TW)
    tile_y = ty0[g_of_s] + ly
    cam = g_of_s // N
    tile_id = cam * T + tile_y * TW + tile_x
    tile_id = jnp.where(slot_ok, tile_id, CT).astype(jnp.int32)

    # 4. stable sort by (camera, tile); depth order is preserved within tiles.
    sort_perm = jnp.argsort(tile_id, stable=True)
    sorted_tiles = tile_id[sort_perm]
    sorted_g = g_of_s[sort_perm]  # depth-rank index per sorted slot

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

    t_of_p = _index_of_slot(starts_al[:-1], AL)  # [AL]
    p_ids = jnp.arange(AL, dtype=jnp.int32)
    local_p = p_ids - starts_al[t_of_p]
    p_ok = (local_p < tile_counts[t_of_p]) & (p_ids < n_slots)
    src = jnp.clip(raw_starts[t_of_p] + local_p, 0, EXP - 1)
    slot_g = jnp.where(p_ok, sorted_g[src], 0)
    slot_src = jnp.where(p_ok, dsorted_src[slot_g], M0).astype(jnp.int32)

    return IsectData(
        slot_src=slot_src,
        tile_starts=starts_al,
        n_isect=n_isect,
        n_slots=n_slots,
        overflow=overflow,
    )


# Packed-row layout for the rasterizer (rows of the [NF, align_cap] array).
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

# Backward packed-gradient row layout (same [NF, align_cap] shape).
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
    slot array consumed by the Pallas rasterizer. Differentiable in the field
    inputs via the composite custom-VJP (which reduces packed grads back with
    a segment-sum — never an XLA scatter-add over slots)."""
    C, N = opacities.shape
    M0 = C * N

    def flat(x, d):
        x = x.reshape(M0, d) if d > 1 else x.reshape(M0, 1)
        return jnp.concatenate([x, jnp.zeros((1, d), x.dtype)], axis=0)

    m2 = flat(means2d, 2)
    co = flat(conics, 3)
    cl = flat(colors, 3)
    op = flat(opacities, 1)
    dp = flat(depths, 1)
    s = isect.slot_src  # [AL] with sentinel M0 -> zero row
    packed = jnp.zeros((NF, s.shape[0]), jnp.float32)
    packed = packed.at[ROW_X].set(m2[s, 0])
    packed = packed.at[ROW_Y].set(m2[s, 1])
    packed = packed.at[ROW_CA].set(co[s, 0])
    packed = packed.at[ROW_CB].set(co[s, 1])
    packed = packed.at[ROW_CC].set(co[s, 2])
    packed = packed.at[ROW_OPAC].set(op[s, 0])
    packed = packed.at[ROW_R].set(cl[s, 0])
    packed = packed.at[ROW_G].set(cl[s, 1])
    packed = packed.at[ROW_B].set(cl[s, 2])
    packed = packed.at[ROW_DEPTH].set(dp[s, 0])
    return packed
