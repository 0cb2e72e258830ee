"""Supertile-stream intersection builder (v2 of the tile-intersection glue).

TPU-native replacement for gsplat's ``isect_tiles`` + radix sort (reference
surface: internals of ``gsplat.rendering.rasterization``, called at
utils/gsplat_utils/gsplat_trainer.py:477-494). This is the second-generation
design; ``ops.intersect`` (per-16px-tile lists) is the first.

Why supertiles: every XLA row-gather/scatter on this hardware is rate-bound
at ~6.4 ns/row regardless of row width (measured, v5e), and sorts cost
~16 ms per 6M keys + ~6 ms per extra payload word. The per-tile design moves
~5.4M intersection rows through two gathers and two sorts per step (~120 ms
of pure data movement at 1M gaussians / 720p). Binning at 32x32px supertiles
(2x2 tiles of 16px) instead cuts the row count to ~2.4M — the compositing
kernels stream each supertile's depth-sorted slot range once and composite
all four tiles with per-gaussian masking (ops.stream_raster), so no per-tile
lists are ever materialized.

Pipeline (all static shapes; everything jit-safe):
  1. per-(camera, gaussian) supertile bbox spans -> counts -> offsets cumsum,
  2. scatter-free expansion (marker scatter + cumsum) to supertile slots,
  3. ONE row gather of a packed [M0, 8] meta table (bbox + offset + depth),
  4. ONE stable two-key sort (supertile_id, depth) carrying the original
     gaussian index — replaces the old per-camera depth argsort + tile sort,
  5. searchsorted for per-supertile ranges; G-aligned starts (scalars only —
     no data relayout: the kernels DMA at arbitrary row offsets),
  6. backward-reduction layout: aligned grad-row position per slot (one
     scatter + cummax), by-gaussian permutation (one sort), run bounds from
     the counts cumsum. The reduction lands directly in original gaussian
     order (no inverse permute).

Spherical (equirectangular) cameras wrap in azimuth at supertile granularity
(SURVEY.md §7 hard part 6): unwrapped spans, ``mod SW`` at expansion.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from splat_one_tpu.ops.projection import Projected

# Supertile = ss x ss tiles of `tile_size` pixels each. ss trades glue rows
# (bigger supertiles -> fewer (gaussian, supertile) intersections through
# the rate-bound sort/gather/reduce glue) against kernel masked work (each
# slot is tested against ss^2 tiles). Default 2 (32x32 px at tile_size=16).
SS = 2

# Packed-field column layout of the [M0, NF] field table / [G, NF] chunks.
COL_X = 0
COL_Y = 1
COL_CA = 2
COL_CB = 3
COL_CC = 4
COL_OPAC = 5
COL_R = 6
COL_G = 7
COL_B = 8
COL_DEPTH = 9
COL_RADIUS = 10  # 3-sigma screen radius: exact per-TILE bbox membership
COL_GID = 11  # flat [C*N) gaussian id (exact f32; the reduce-by-key key)
# Per-axis membership-ellipse extents (projection.conic_ellipse_radii with
# the opacity-aware extent), precomputed ONCE per gaussian so the kernels'
# per-(chunk, tile) bbox gate is pure compares — the same floats the
# builder and the oracle test against.
COL_EXT_RX = 12
COL_EXT_RY = 13
NF = 16  # padded power-of-two width

# Backward gradient column layout (same [*, NF] shape).
GCOL_DX = 0
GCOL_DY = 1
GCOL_DCA = 2
GCOL_DCB = 3
GCOL_DCC = 4
GCOL_DOPAC = 5
GCOL_DR = 6
GCOL_DG = 7
GCOL_DB = 8
GCOL_DDEPTH = 9
GCOL_ABSDX = 10
GCOL_ABSDY = 11
GCOL_KEY = 12  # written by the bwd kernel: gid + 1 (f32), 0 = dead row
N_GCOLS = 12  # payload rows fed through the reduce-by-key sort

# Packed backward layout (the TPU hot path): consecutive GCOL pairs
# (2i, 2i+1) ride as two bf16 halves of one f32-bitcast u32 word, halving
# the reduce-by-key sort payload count — the sort is payload-COUNT bound
# (~2.3 ms per payload row at 3.2M slots, measured r3) so this is the
# single biggest reduce win. Per-slot grads round to bf16 (rel ~2^-9)
# BEFORE the per-gaussian sum; the compositing itself stays f32. CPU
# interpret mode keeps the unpacked f32 layout for exact-parity tests
# (same backend split as stream_raster._mm_split).
N_PAIRS = 6  # = N_GCOLS // 2; pair 5 = (ABSDX, ABSDY), droppable
PCOL_KEY = 6  # key row index in the packed layout


@dataclasses.dataclass(frozen=True)
class StreamCaps:
    """Static capacities (the only recompile points of the stream path)."""

    exp_cap: int  # max total (gaussian, supertile) intersections
    n_supertiles: int  # C * SH * SW
    chunk: int = 128  # kernel chunk G
    ss: int = SS  # tiles per supertile side
    sb_slab: int = 3072  # seg_broadcast parent-window width (see
    # seg_broadcast.required_slab; right-sized from a warm-up build like
    # exp_cap — the kernel's per-chunk cost scales with this width)

    @property
    def pad_cap(self) -> int:
        """Rows of the aligned pgrad buffer. The backward writes each
        supertile's gradient chunks from a 128-aligned base before its raw
        start, so a supertile needs ceil((start % G + count) / G) * G rows
        — up to 2G-1 more than its count. Rounded to a multiple of the
        reduce kernel's 1024-slot chunk so ops.seg_reduce can stream the
        sorted rows directly (no +CH pad copy; the over-read of the last
        block stays in bounds)."""
        raw = self.exp_cap + 2 * self.n_supertiles * self.chunk
        return -(-raw // 1024) * 1024

    @property
    def packed_rows(self) -> int:
        """Rows of the packed field table (+G over-read pad for the last
        partial chunk of the last supertile)."""
        return self.exp_cap + self.chunk

    @staticmethod
    def choose(num_gaussians: int, num_cameras: int, n_supertiles: int,
               chunk: int = 128, avg_supertiles_per_gaussian: float = 3.0,
               ss: int = SS):
        exp_cap = int(
            num_cameras * num_gaussians * avg_supertiles_per_gaussian
        )
        exp_cap = max(exp_cap, 1024)
        exp_cap = -(-exp_cap // chunk) * chunk
        assert exp_cap < 1 << 24, (
            "exp_cap must stay f32-exact (meta offsets ride as f32)"
        )
        return StreamCaps(exp_cap=exp_cap, n_supertiles=n_supertiles,
                          chunk=chunk, ss=ss)

    @staticmethod
    def choose_observed(n_isect: int, n_supertiles: int, chunk: int = 128,
                        slack: float = 1.08, ss: int = SS,
                        sb_slab: int = 3072):
        """Size caps from a MEASURED intersection count (one warm-up
        ``build_stream_intersections`` with generous caps, or the previous
        step's ``info["n_isect"]``). Every glue stage (expansion cumsums,
        the (supertile, depth) sort, the pack gather, the grad-reduction
        sort) is proportional to the STATIC ``exp_cap``, not the live
        count, so right-sizing is a direct throughput win; a scene drift
        past ``slack`` trips the overflow flag and the trainer's existing
        capacity-growth recompile path (train.trainer._grow_isect_caps)."""
        exp_cap = max(int(n_isect * slack), 1024)
        exp_cap = -(-exp_cap // chunk) * chunk
        assert exp_cap < 1 << 24, (
            "exp_cap must stay f32-exact (meta offsets ride as f32)"
        )
        return StreamCaps(exp_cap=exp_cap, n_supertiles=n_supertiles,
                          chunk=chunk, ss=ss, sb_slab=sb_slab)


class StreamIsect(NamedTuple):
    """Sorted supertile-stream layout.

    ``sorted_g[p]``: original flat ``[C * N]`` gaussian index of stream slot
    p (sentinel ``C * N`` for dropped/padding slots). ``st_starts``: raw slot
    range per (camera, supertile), length ``C*NS + 1``. ``st_starts_al``:
    G-aligned start of each supertile's rows in the backward gradient
    buffer. Per-gaussian gradient reduction needs no precomputed layout:
    the backward kernel emits a gid key row and ``reduce_stream_grads``
    sorts by it (see ops.seg_reduce).
    """

    sorted_g: jax.Array  # [exp_cap] int32
    st_starts: jax.Array  # [C*NS + 1] int32
    st_starts_al: jax.Array  # [C*NS + 1] int32
    n_isect: jax.Array  # [] int32
    n_slots: jax.Array  # [] int32 (== clamped n_isect)
    overflow: jax.Array  # [] bool


def supertile_grid(width: int, height: int, tile_size: int, ss: int = SS):
    tw = -(-width // tile_size)
    th = -(-height // tile_size)
    sw = -(-tw // ss)
    sh = -(-th // ss)
    return tw, th, sw, sh


def _expand_index(offsets: jax.Array, capacity: int) -> jax.Array:
    """slot -> parent index: marker scatter at run starts + cumsum.

    Measured r3: the 1M-element marker scatter is ~8-9 ms (XLA scatter
    costs ~8 ns/element) and dominates this stage; the 3M cumsum is ~1 ms
    (a Pallas single-pass scan kernel was tried and saved nothing)."""
    buckets = jnp.zeros((capacity,), jnp.int32)
    upd = jnp.ones_like(offsets[1:], dtype=jnp.int32)
    buckets = buckets.at[jnp.clip(offsets[1:], 0, capacity - 1)].add(
        jnp.where(offsets[1:] < capacity, upd, 0)
    )
    return jnp.cumsum(buckets)


def build_field_columns(means2d, conics, opacities, colors, depths,
                        radii) -> jax.Array:
    """[M0, NF] packed field table from raw [C, N, ...] arrays — the ONE
    definition of the COL_* column layout the kernels index. Pure
    elementwise; XLA fuses it into the projection epilogue."""
    from splat_one_tpu.ops.projection import conic_ellipse_radii

    C, N = opacities.shape
    M0 = C * N
    con = conics.reshape(M0, 3)
    ext_rx, ext_ry = conic_ellipse_radii(
        con[:, 0], con[:, 1], con[:, 2], opacities.reshape(M0))
    cols = jnp.concatenate(
        [
            means2d.reshape(M0, 2),
            con,
            opacities.reshape(M0, 1),
            colors.reshape(M0, 3),
            depths.reshape(M0, 1),
            radii.reshape(M0, 1),
            jnp.arange(M0, dtype=jnp.float32).reshape(M0, 1),  # COL_GID
            ext_rx.reshape(M0, 1),
            ext_ry.reshape(M0, 1),
        ],
        axis=1,
    )
    return jnp.pad(cols, ((0, 0), (0, NF - cols.shape[1])))


def build_fields(proj: Projected) -> jax.Array:
    """[M0, NF] packed per-(camera, gaussian) field table (see
    ``build_field_columns``)."""
    return build_field_columns(
        proj.means2d, proj.conics, proj.opacities, proj.colors,
        proj.depths, proj.radii,
    )


def pack_stream(fields: jax.Array, isect: StreamIsect,
                caps: StreamCaps) -> jax.Array:
    """[packed_rows, NF] stream table: one row gather by ``sorted_g``
    (sentinel rows -> zeros), padded with G zero rows for chunk over-read."""
    fp = jnp.concatenate(
        [fields, jnp.zeros((1, NF), fields.dtype)], axis=0
    )
    packed = fp[jnp.minimum(isect.sorted_g, fields.shape[0])]
    return jnp.concatenate(
        [packed, jnp.zeros((caps.chunk, NF), packed.dtype)], axis=0
    )


def parent_spans(proj: Projected, width: int, height: int, tile_size: int,
                 ss: int, camera_model: str = "pinhole"):
    """Per-(camera, gaussian) supertile bbox spans in original [C, N]
    order (no depth pre-sort): returns (sx0, span_x, sy0, span_y).

    Membership uses the per-axis opacity-aware ELLIPSE extents (rx, ry) —
    a strict subset of the circumscribed-circle 3-sigma bbox: the ellipse
    gate cuts ~25-40% of rows for anisotropic gaussians, and the opacity
    term (projection.opacity_extent) drops slots the kernels' 1/255 alpha
    cutoff would kill anyway (bit-identical output, large row cuts on
    low-opacity trained scenes). The kernels' per-tile test and the oracle
    share the same expression (projection.conic_ellipse_radii) on the same
    conic/opacity floats."""
    from splat_one_tpu.ops.projection import conic_ellipse_radii

    C, N = proj.depths.shape
    M0 = C * N
    tw, th, sw, sh = supertile_grid(width, height, tile_size, ss)
    sps = tile_size * ss
    u = proj.means2d[..., 0].reshape(M0)
    v = proj.means2d[..., 1].reshape(M0)
    con = proj.conics.reshape(M0, 3)
    rx, ry = conic_ellipse_radii(
        con[:, 0], con[:, 1], con[:, 2], proj.opacities.reshape(M0))
    valid = proj.valid.reshape(M0)
    sy0 = jnp.clip(jnp.floor((v - ry) / sps), 0, sh).astype(jnp.int32)
    sy1 = jnp.clip(jnp.ceil((v + ry) / sps), 0, sh).astype(jnp.int32)
    span_y = jnp.maximum(sy1 - sy0, 0)
    if camera_model == "spherical":
        sx0 = jnp.floor((u - rx) / sps).astype(jnp.int32)
        sx1 = jnp.ceil((u + rx) / sps).astype(jnp.int32)
        span_x = jnp.minimum(sx1 - sx0, sw)
        sx0 = jnp.mod(sx0, sw)
    else:
        sx0 = jnp.clip(jnp.floor((u - rx) / sps), 0, sw).astype(jnp.int32)
        sx1 = jnp.clip(jnp.ceil((u + rx) / sps), 0, sw).astype(jnp.int32)
        span_x = jnp.maximum(sx1 - sx0, 0)
    span_x = jnp.where(valid, span_x, 0)
    span_y = jnp.where(valid, span_y, 0)
    return sx0, span_x, sy0, span_y


def observed_sb_slab(proj: Projected, width: int, height: int,
                     tile_size: int, caps: StreamCaps,
                     camera_model: str = "pinhole") -> int:
    """Measure the seg_broadcast parent-window width this scene needs
    (seg_broadcast.required_slab) from a warm-up projection — callers
    fold it into StreamCaps.choose_observed(sb_slab=...) alongside the
    observed exp_cap."""
    from splat_one_tpu.ops import seg_broadcast

    sx0, span_x, sy0, span_y = parent_spans(
        proj, width, height, tile_size, caps.ss, camera_model)
    counts = np.asarray((span_x * span_y).astype(jnp.int32))
    offsets = np.concatenate(
        [[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    return seg_broadcast.required_slab(offsets, counts, caps.exp_cap)


def build_stream_intersections(
    proj: Projected,
    width: int,
    height: int,
    tile_size: int,
    caps: StreamCaps,
    camera_model: str = "pinhole",
    st_lo=None,
    n_st_local: int = 0,
) -> StreamIsect:
    """Build the sorted supertile stream from projected gaussians.

    With ``st_lo``/``n_st_local``, only supertiles in the flattened
    (camera, supertile) range ``[st_lo, st_lo + n_st_local)`` are kept with
    re-based ids — the per-device path of supertile-sharded multi-chip
    rasterization (``st_lo`` may be traced; shapes depend only on the static
    ``n_st_local``).
    """
    C, N = proj.depths.shape
    M0 = C * N
    if M0 >= 1 << 24:
        raise NotImplementedError(
            "C*N >= 2^24: the f32 gid column (COL_GID) and the backward "
            "reduce-by-key keys lose integer exactness — shard gaussians "
            "(parallel.ring_sharded / the mesh Trainer) before this scale"
        )
    tw, th, sw, sh = supertile_grid(width, height, tile_size, caps.ss)
    NS = sw * sh
    CS = C * NS
    if n_st_local:
        CS = n_st_local
    G = caps.chunk
    EXP = caps.exp_cap
    sps = tile_size * caps.ss  # supertile pixel size

    sx0, span_x, sy0, span_y = parent_spans(
        proj, width, height, tile_size, caps.ss, camera_model)

    # "Parents" of the expansion. Normally one per (camera, gaussian); in
    # the supertile-SHARDED spherical path each gaussian becomes TWO
    # unwrapped virtual segments (cols [sx0, sw) and [0, remainder)) so the
    # monotone-enumeration slab math below applies to panoramas too.
    seg_spherical = bool(n_st_local) and camera_model == "spherical"
    if seg_spherical:
        span_a = jnp.minimum(span_x, sw - sx0)
        span_b = span_x - span_a
        sx0_p = jnp.stack([sx0, jnp.zeros_like(sx0)], 1).reshape(2 * M0)
        span_xp = jnp.stack([span_a, span_b], 1).reshape(2 * M0)
        sy0_p = jnp.repeat(sy0, 2)
        span_yp = jnp.repeat(span_y, 2)
        depth_p = jnp.repeat(proj.depths.reshape(M0), 2)
        real_p = jnp.repeat(jnp.arange(M0, dtype=jnp.int32), 2)
        MP = 2 * M0
    else:
        sx0_p, span_xp, sy0_p, span_yp = sx0, span_x, sy0, span_y
        depth_p = proj.depths.reshape(M0)
        real_p = jnp.arange(M0, dtype=jnp.int32)
        MP = M0
    counts = (span_xp * span_yp).astype(jnp.int32)
    span_p = jnp.maximum(span_xp, 1)
    kA = jnp.zeros((MP,), jnp.int32)
    local_counts = bool(n_st_local) and (
        camera_model != "spherical" or seg_spherical
    )
    if local_counts:
        # Per-SLAB counts (the supertile-sharded path): a parent's flat
        # supertile ids are monotone along its row-major bbox enumeration
        # k, so the cells inside the slab [st_lo, st_lo + CS) form one
        # contiguous subrange [kA, kB) with closed-form bounds. Expansion
        # then enumerates ONLY local intersections, so exp_cap is a true
        # per-device budget (memory and glue scale with the slab, not the
        # global count).
        cam_p = real_p // N
        base = cam_p * NS + sy0_p * sw + sx0_p

        def k_bound(limit):
            q = limit - base
            r0 = jnp.floor_divide(q, sw)
            in_row = q - r0 * sw  # in [0, sw)
            k = jnp.where(
                in_row < span_p,
                r0 * span_p + in_row,  # limit inside row r0's cells
                (r0 + 1) * span_p,  # in the gap after row r0's cells
            )
            return jnp.clip(k, 0, counts)

        kA = k_bound(st_lo)
        counts = jnp.maximum(k_bound(st_lo + CS) - kA, 0)
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]]
    )
    n_isect = offsets[-1] + counts[-1]
    overflow = n_isect > EXP

    # 2.+3. expansion + per-slot meta: a Pallas segmented-broadcast kernel
    # (ops.seg_broadcast) replaces the marker scatter + cumsum + [EXP, 8]
    # row gather (~24 ms of rate-bound glue at 1M gaussians, the largest
    # single cost of the isect build) with one exact one-hot matmul per
    # slot chunk; it falls back to the scatter+gather path via lax.cond
    # when zero-count parent runs overflow its parent window.
    # (Measured r3 dead end kept for the record: per-slot meta via int32
    # DELTA rows scattered at run starts + a Pallas multi-row cumsum is
    # bit-exact but 2.6x SLOWER — XLA scatter costs ~8 ns/ELEMENT. Gathers
    # are per-ROW; scatters per-element: only scatter narrow data.)
    from splat_one_tpu.ops import seg_broadcast

    (sx0_s, sy0_s, span_s, kA_s, off_s, depth_s, g_of_s) = (
        seg_broadcast.expand_meta_streamed(
            sx0_p, sy0_p, span_p, kA, offsets, depth_p, counts, EXP,
            slab=caps.sb_slab,
        )
    )
    slot_ids = jnp.arange(EXP, dtype=jnp.int32)
    slot_ok = slot_ids < jnp.minimum(n_isect, EXP)
    # absolute bbox-enumeration index (slab path starts runs at kA)
    local = slot_ids - off_s + kA_s
    sxx = jnp.maximum(span_s, 1)
    lx = local % sxx
    ly = local // sxx
    st_x = sx0_s + lx
    if camera_model == "spherical" and not seg_spherical:
        st_x = jnp.mod(st_x, sw)  # segmented parents are pre-unwrapped
    st_y = sy0_s + ly
    # real flat (camera, gaussian) id of each slot (parents are interleaved
    # as 2*g + segment in the segmented-spherical path)
    g_real_s = g_of_s // 2 if seg_spherical else g_of_s
    cam = g_real_s // N
    st_id = cam * NS + st_y * sw + st_x
    if n_st_local:
        st_id = st_id - st_lo
        slot_ok &= (st_id >= 0) & (st_id < CS)
    st_id = jnp.where(slot_ok, st_id, CS).astype(jnp.int32)

    # 4. ONE sort grouping by supertile, depth-ordered within. Two
    # equivalent-cost regimes (measured r5, 2.57M slots, v5e):
    #  - fused single u32 key [st_id | depth-rank-bits] with the gaussian
    #    index as a deterministic second key (~3-4 ms): depth rides as
    #    its top (32 - st_bits) bitcast bits — positive f32s order like
    #    their bits — so ties beyond ~2^-13 relative depth resolve by
    #    original index (= expansion order, matching the stable sort's
    #    tie rule; sub-quantum swaps are the only divergence from the
    #    oracle's exact-depth order).
    #  - exact stable two-key (st, depth) sort (8.1 ms) when CS is too
    #    large for 10 supertile bits or SPLAT_FUSED_SORT=0.
    import os

    # default OFF: the ~2^-13 depth quantization swaps near-tie
    # composite order and breaks the 1e-5 oracle-parity bar (measured
    # rel 2.9e-3 on the parity scene); opt-in for throughput-over-parity
    # deployments only.
    fused_ok = (CS + 1) <= (1 << 10) and os.environ.get(
        "SPLAT_FUSED_SORT", "0") == "1"
    if fused_ok:
        db = jax.lax.bitcast_convert_type(depth_s, jnp.uint32) >> 10
        key = (st_id.astype(jnp.uint32) << 22) | db
        sorted_key, sorted_g = jax.lax.sort(
            [key, g_real_s], is_stable=False, num_keys=2
        )
        sorted_st = (sorted_key >> 22).astype(jnp.int32)
    else:
        sorted_st, _, sorted_g = jax.lax.sort(
            [st_id, depth_s, g_real_s], is_stable=True, num_keys=2
        )

    # 5. per-supertile ranges + G-aligned grad-row starts (scalars only).
    # The kernels chunk each supertile's stream from the 128-aligned base
    # ``base0 = floor(start/G)*G`` (lane-sliced DMA must be G-aligned) with
    # masked leading/trailing foreign slots; the backward therefore writes
    # ceil((start - base0 + count)/G) chunks for the supertile.
    st_starts = jnp.searchsorted(
        sorted_st, jnp.arange(CS + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    st_counts = st_starts[1:] - st_starts[:-1]
    lead = st_starts[:-1] % G  # start - base0
    counts_al = -(-(lead + st_counts) // G) * G
    st_starts_al = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts_al)]
    )

    # kept-slot count: dropped slots (beyond n_isect, or outside the local
    # supertile slab) carry sort key CS and land at the END of the sorted
    # stream, so the post-sort validity mask is positional — masking by the
    # PRE-sort slot_ok here would zero arbitrary interior slots.
    n_slots = jnp.sum(slot_ok.astype(jnp.int32))
    sorted_ok = slot_ids < n_slots
    return StreamIsect(
        sorted_g=jnp.where(sorted_ok, sorted_g, M0).astype(jnp.int32),
        st_starts=st_starts,
        st_starts_al=st_starts_al,
        n_isect=n_isect,
        n_slots=n_slots,
        overflow=overflow,
    )


def reduce_stream_grads(
    pgrads: jax.Array,  # [NF, pad_cap] per-slot grads (kernel-native)
    num_flat: int,  # M0
    n_payload: int = N_GCOLS,  # leading grad rows to reduce (10 w/o absgrad)
    packed: bool = False,  # pgrads rows are bf16x2-packed GCOL pairs
) -> jax.Array:
    """Per-slot -> per-gaussian gradient reduction, gather-free.

    The backward kernel writes ``gid + 1`` (f32) into every grad row it
    produces (at ``PCOL_KEY`` when packed, ``GCOL_KEY`` otherwise);
    unwritten rows (alignment padding, early-terminated chunks, dropped
    streams) stay zero and sort to the front. One single-key sort brings
    each gaussian's rows together, then a Pallas one-hot matmul reduces
    each block of R gaussians (ops.seg_reduce). Output ``[n_payload, M0]``
    in ORIGINAL (camera-major) order and GCOL row order (the packed path
    unpacks inside the kernel). The sort is payload-COUNT bound (~2.3 ms
    per payload row at 3.2M slots, measured), so callers drop rows they
    don't need (``n_payload=10`` skips ABSDX/ABSDY when absgrad isn't
    requested) and the TPU path rides the packed layout (half the rows)."""
    from splat_one_tpu.ops import seg_reduce

    if packed:
        assert n_payload % 2 == 0
        n_rows = n_payload // 2
        key_row = PCOL_KEY
    else:
        n_rows = n_payload
        key_row = GCOL_KEY
    parts = jax.lax.sort(
        [pgrads[key_row]] + [pgrads[i] for i in range(n_rows)],
        is_stable=False, num_keys=1,
    )
    nb = -(-num_flat // seg_reduce.R)
    queries = (jnp.arange(nb + 1, dtype=jnp.int32) * seg_reduce.R
               ).astype(jnp.float32) + 1.0
    bounds = jnp.searchsorted(parts[0], queries, side="left").astype(
        jnp.int32)
    # sort outputs feed the reduce kernel DIRECTLY (payloads..., key) —
    # pad_cap is a CH multiple, so no stack/pad copies (measured r5:
    # the stacked layout cost ~5.6 ms/step at bench scale)
    out = seg_reduce.segment_reduce_rows(
        list(parts[1:]) + [parts[0]], bounds, num_flat, unpack=packed)
    if packed:
        # kernel output row order is (hi0..hi_{p-1}, lo0..lo_{p-1}) with
        # pair i = (GCOL 2i, GCOL 2i+1); GCOL c therefore lives at kernel
        # row (c // 2) + (c % 2) * n_pairs — permute back to GCOL order
        inv = [(c // 2) + (c % 2) * n_rows for c in range(n_payload)]
        out = out[jnp.asarray(inv, dtype=jnp.int32)]
    return out[:, :num_flat]
