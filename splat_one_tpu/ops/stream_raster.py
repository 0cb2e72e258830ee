"""Pallas supertile-stream rasterizer: fwd + hand-written bwd compositing.

Second-generation TPU rasterizer core (first: ``ops.tile_raster``) —
replaces the gsplat CUDA ``rasterize_to_pixels`` fwd/bwd (reference surface:
``gsplat.rendering.rasterization`` at
utils/gsplat_utils/gsplat_trainer.py:477-494). Design:

  - One grid program per (camera, 32x32px supertile). The program streams
    its depth-sorted slot range (built by ``ops.stream_isect``) ONCE in
    chunks of G=128, double-buffered from HBM. The packed stream lives in
    the kernel-native [NF, rows] layout; chunk DMAs slice the lane axis at
    128-aligned offsets (``base0 = floor(start/G)*G``) and leading/trailing
    foreign slots are masked — so NO aligned relayout of the stream is ever
    materialized, and per-supertile starts can be arbitrary.
  - Each chunk is composited into the supertile's SSxSS=4 16px tiles. A
    slot whose per-TILE bbox misses a tile is masked there (exact gsplat
    tile-list semantics). This trades masked compute for moving ~2.2x fewer
    rows through the rate-bound sort/gather glue — the right trade on TPU,
    where gathers cost ~6.4 ns/row and VPU/MXU cycles are comparatively
    free.
  - Transmittance within a chunk: log-space strictly-lower-triangular
    matmul on the MXU (the idiomatic replacement for CUDA's warp-serial
    scan), per tile.
  - Per-tile EARLY TERMINATION: a tile stops once every pixel's
    transmittance is below ``term_thresh`` (the gsplat per-pixel T < 1e-4
    cutoff); the program stops when all four tiles are done and records
    each tile's processed-chunk count for the backward.
  - The backward streams the same chunks in forward order with prefix
    accumulators, sums the four tiles' per-slot gradients in VMEM, and
    writes [NF, G] gradient chunks at G-aligned per-supertile offsets;
    chunks it never reaches stay zero via input/output aliasing of a zero
    buffer. Per-gaussian reduction is one gather + cumsum
    (``stream_isect.reduce_stream_grads``).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from splat_one_tpu.ops import stream_isect as si
from splat_one_tpu.ops.reference import ALPHA_MAX, ALPHA_MIN
from splat_one_tpu.ops.stream_isect import NF, SS, StreamCaps, StreamIsect

OUT_CH = 8  # r, g, b, alpha, depth, n_chunks, pad, pad
CH_NCHUNKS = 5
NBUF = 4


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _use_packed_grads() -> bool:
    """bf16x2-packed backward payload rows (TPU only; see _pack2). Env
    SPLAT_GRAD_PACK=0 restores exact-f32 payloads for diagnosis."""
    import os

    return (not _use_interpret()) and os.environ.get(
        "SPLAT_GRAD_PACK", "1") == "1"


@dataclasses.dataclass(frozen=True)
class StreamCfg:
    """Static stream-rasterizer configuration (hashable kernel-cache key)."""

    width: int
    height: int
    tile_size: int
    num_cameras: int
    num_gaussians: int
    chunk: int
    exp_cap: int
    n_supertiles: int  # per camera (sw * sh)
    wrap_x: bool = False
    term_thresh: float = 1e-5
    absgrad: bool = False  # reduce ABSDX/ABSDY rows (sort payloads cost)
    ss: int = SS  # tiles per supertile side
    # override: local supertile-slab grid size for multi-chip supertile
    # sharding (kernel grid spans only this device's slab; pixel coords
    # come from the kernels' tile_offset)
    cs_local: int = 0

    @property
    def nt(self):
        return self.ss * self.ss

    @property
    def tw(self):
        return -(-self.width // self.tile_size)

    @property
    def th(self):
        return -(-self.height // self.tile_size)

    @property
    def sw(self):
        return -(-self.tw // self.ss)

    @property
    def sh(self):
        return -(-self.th // self.ss)

    @property
    def cs(self):
        return self.cs_local or self.num_cameras * self.sw * self.sh

    @property
    def npix(self):
        return self.tile_size * self.tile_size

    @property
    def pad_cap(self):
        # bwd rows per supertile: ceil((start % G + count) / G) * G, which
        # can exceed count by up to 2G-1 (cs = grid size = supertile
        # count); rounded to the reduce kernel's 1024 chunk (zero-copy
        # sort->segreduce handoff, see StreamCaps.pad_cap)
        raw = self.exp_cap + 2 * self.cs * self.chunk
        return -(-raw // 1024) * 1024

    @property
    def packed_rows(self):
        return self.exp_cap + self.chunk

    @staticmethod
    def from_caps(caps: StreamCaps, width, height, tile_size, num_cameras,
                  num_gaussians, wrap_x=False, term_thresh=1e-5,
                  absgrad=False):
        return StreamCfg(
            width=width, height=height, tile_size=tile_size,
            num_cameras=num_cameras, num_gaussians=num_gaussians,
            chunk=caps.chunk, exp_cap=caps.exp_cap,
            n_supertiles=caps.n_supertiles // num_cameras,
            wrap_x=wrap_x, term_thresh=term_thresh, absgrad=absgrad,
            ss=caps.ss,
        )


def _tile_pixel_coords(cfg: StreamCfg, s_global, j: int):
    """Pixel centers (and tile coords) of local tile j of supertile s."""
    ts = cfg.tile_size
    ns = cfg.sw * cfg.sh
    st = s_global % ns
    sy = st // cfg.sw
    sx = st % cfg.sw
    ty = sy * cfg.ss + (j // cfg.ss)
    tx = sx * cfg.ss + (j % cfg.ss)
    local = jax.lax.broadcasted_iota(jnp.int32, (1, cfg.npix), 1)
    px = (tx * ts + local % ts).astype(jnp.float32) + 0.5
    py = (ty * ts + local // ts).astype(jnp.float32) + 0.5
    return px, py, tx, ty


def _psum_incl(x, G):
    """Inclusive prefix sum along axis 0 of [G, P]: log2(G) shifted adds on
    the VPU — exact f32, replacing the [G,G]@[G,P] triangular MXU matmul
    (which needs 6 HIGHEST passes for f32 accuracy and dominated kernel
    time)."""
    s = 1
    while s < G:
        x = x + jnp.concatenate(
            [jnp.zeros((s,) + x.shape[1:], x.dtype), x[:-s]], axis=0
        )
        s *= 2
    return x


def _psum_excl(x, G):
    """Exclusive prefix sum along axis 0 of [G, P]."""
    x = jnp.concatenate(
        [jnp.zeros((1,) + x.shape[1:], x.dtype), x[:-1]], axis=0
    )
    return _psum_incl(x, G)


def _pprod_excl(x, G):
    """Exclusive prefix PRODUCT along axis 0 of [G, P]: same doubling
    network with multiplies — replaces log1p/cumsum/exp transmittance
    (3 transcendentals per element) with pure f32 products."""
    x = jnp.concatenate(
        [jnp.ones((1,) + x.shape[1:], x.dtype), x[:-1]], axis=0
    )
    s = 1
    while s < G:
        x = x * jnp.concatenate(
            [jnp.ones((s,) + x.shape[1:], x.dtype), x[:-s]], axis=0
        )
        s *= 2
    return x


def _mm_split(a, b, dims):
    """MXU matmul at ~2^-16 relative accuracy in 3 single-bf16 passes.

    Both operands split hi/lo into bf16 (each part exact to 8 mantissa
    bits; bf16 x bf16 products are exact in the f32 accumulator); the
    dropped lo*lo term and the 8-bit residual beyond the lo parts bound the
    error at ~1.5e-5 relative — half the passes of HIGHEST (6, the bf16_6x
    expansion) for error well under gsplat's own CUDA atomic-order noise.
    Positive-weight compositing sums keep the relative error from
    amplifying. On CPU (interpret mode) a plain f32 dot is used — exact,
    and bf16 emulation there would only slow the test suite."""
    if _use_interpret():
        return jax.lax.dot_general(a, b, (dims, ((), ())),
                                   preferred_element_type=jnp.float32)
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)

    def dot(x, y):
        return jax.lax.dot_general(x, y, (dims, ((), ())),
                                   preferred_element_type=jnp.float32)

    return dot(ah, bh) + (dot(ah, bl) + dot(al, bh))


def _chunk_bbox(cfg: StreamCfg, chunk, tx, ty, rowmask):
    """Cheap per-slot [G, 1] tile-membership mask for one chunk against one
    tile: per-TILE opacity-aware ELLIPSE bbox (conic_ellipse_radii on the chunk's
    own conic columns — identical float math to the supertile-list builder
    and the oracle) AND ``rowmask`` (slots outside the supertile's stream
    range from 128-aligned chunk-base over-read). Gates the heavy per-pixel
    work: a tile most chunks' slots miss is skipped entirely."""
    G = cfg.chunk
    ts = float(cfg.tile_size)
    x = chunk[si.COL_X, :].reshape(G, 1)
    y = chunk[si.COL_Y, :].reshape(G, 1)
    # extents precomputed once per gaussian at pack time (COL_EXT_*) — the
    # same conic_ellipse_radii floats the builder and the oracle use; the
    # per-(chunk, tile) gate here is pure compares.
    rx = chunk[si.COL_EXT_RX, :].reshape(G, 1)
    ry = chunk[si.COL_EXT_RY, :].reshape(G, 1)
    txf = tx.astype(jnp.float32) if hasattr(tx, "astype") else float(tx)
    tyf = ty.astype(jnp.float32) if hasattr(ty, "astype") else float(ty)
    in_y = (tyf >= jnp.floor((y - ry) / ts)) & (
        tyf < jnp.ceil((y + ry) / ts)
    )
    if cfg.wrap_x:
        tw = float(cfg.tw)
        tx0 = jnp.floor((x - rx) / ts)
        span = jnp.minimum(jnp.ceil((x + rx) / ts) - tx0, tw)
        in_x = jnp.mod(txf - tx0, tw) < span
    else:
        in_x = (txf >= jnp.floor((x - rx) / ts)) & (
            txf < jnp.ceil((x + rx) / ts)
        )
    return rowmask & in_x & in_y


def _chunk_q(cfg: StreamCfg, chunk, px, py, live):
    """Per-(slot, pixel) forward quantities for one chunk against one tile.

    ``chunk`` is [NF, G]; ``live`` [G, 1] is the _chunk_bbox mask — slots
    outside the stream range or whose per-tile bbox misses this tile
    contribute nothing (exact gsplat tile-list semantics: a gaussian
    outside a tile's list contributes nothing even if its alpha there is
    >= 1/255)."""
    G = cfg.chunk
    x = chunk[si.COL_X, :].reshape(G, 1)
    y = chunk[si.COL_Y, :].reshape(G, 1)
    ca = chunk[si.COL_CA, :].reshape(G, 1)
    cb = chunk[si.COL_CB, :].reshape(G, 1)
    cc = chunk[si.COL_CC, :].reshape(G, 1)
    op = chunk[si.COL_OPAC, :].reshape(G, 1)
    dx = x - px
    if cfg.wrap_x:
        dx = dx - cfg.width * jnp.round(dx * (1.0 / cfg.width))
    dy = y - py
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    expneg = jnp.exp(-sigma)
    alpha_raw = op * expneg
    killed = (sigma < 0.0) | (alpha_raw < ALPHA_MIN) | jnp.logical_not(live)
    clamped = alpha_raw > ALPHA_MAX
    alpha = jnp.where(killed, 0.0, jnp.minimum(alpha_raw, ALPHA_MAX))
    return dict(dx=dx, dy=dy, ca=ca, cb=cb, cc=cc, expneg=expneg,
                alpha=alpha, killed=killed, clamped=clamped)


def _row_iota(G):
    return jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0)


def _pack2(a, b):
    """Pack two f32 rows as bf16 halves of one f32-bitcast u32 word (hi =
    a, lo = b). Halves the grad rows moved through the reduce-by-key sort
    (payload-count bound, ~2.3 ms/row at 3.2M slots); per-slot grads round
    to bf16 before the per-gaussian sum (rel ~2^-9 — far below the train
    loop's per-step view-sampling noise). seg_reduce unpacks exactly."""
    au = jax.lax.bitcast_convert_type(
        a.astype(jnp.bfloat16).astype(jnp.float32), jnp.uint32)
    bu = jax.lax.bitcast_convert_type(
        b.astype(jnp.bfloat16).astype(jnp.float32), jnp.uint32)
    return jax.lax.bitcast_convert_type(au | (bu >> 16), jnp.float32)


def _stream_fwd_kernel(cfg: StreamCfg, starts_ref, off_ref, packed_ref,
                       out_ref, buf, sems, Tst, accst, nch_s):
    G, P, NT = cfg.chunk, cfg.npix, cfg.nt
    t = pl.program_id(0)
    s0 = starts_ref[t]
    s1 = starts_ref[t + 1]
    base0 = pl.multiple_of((s0 // G) * G, G)
    nchunks = pl.cdiv(s1 - base0, G)
    pxy = [_tile_pixel_coords(cfg, t + off_ref[0], j) for j in range(NT)]

    # reset persistent scratch (it survives across grid programs)
    for j in range(NT):
        Tst[j] = jnp.ones((1, P), jnp.float32)
        accst[j] = jnp.zeros((8, P), jnp.float32)
        nch_s[j] = 0

    def get_dma(slot, k):
        return pltpu.make_async_copy(
            packed_ref.at[:, pl.ds(pl.multiple_of(base0 + k * G, G), G)],
            buf.at[slot],
            sems.at[slot],
        )

    for w in range(NBUF - 1):
        @pl.when(w < nchunks)
        def _(w=w):
            get_dma(w, w).start()

    def body(carry):
        k, _ = carry

        @pl.when(k + NBUF - 1 < nchunks)
        def _():
            get_dma((k + NBUF - 1) % NBUF, k + NBUF - 1).start()

        get_dma(k % NBUF, k).wait()
        chunk = buf[k % NBUF]  # [NF, G]
        gidx = base0 + k * G + _row_iota(G)
        rowmask = (gidx >= s0) & (gidx < s1)

        for j in range(NT):
            alive = (jnp.max(Tst[j]) >= cfg.term_thresh) | (
                cfg.term_thresh <= 0.0
            )
            px, py, tx, ty = pxy[j]
            live = _chunk_bbox(cfg, chunk, tx, ty, rowmask)

            @pl.when(alive & jnp.any(live))
            def _(j=j, live=live, px=px, py=py):
                q = _chunk_q(cfg, chunk, px, py, live)
                alpha = q["alpha"]
                one_m = 1.0 - alpha
                Tins = _pprod_excl(one_m, G)  # [G, P] exclusive products
                T_row = Tst[j]
                w_ = alpha * Tins * T_row  # [G, P]
                cols = chunk[si.COL_R:si.COL_R + 8, :]  # [8, G]
                accst[j] = accst[j] + _mm_split(cols, w_, (((1,), (0,))))
                Tst[j] = T_row * (
                    Tins[G - 1:G, :] * one_m[G - 1:G, :]
                )
                nch_s[j] = k + 1

        alive_any = (cfg.term_thresh <= 0.0)
        for j in range(NT):
            alive_any |= jnp.max(Tst[j]) >= cfg.term_thresh
        return k + 1, alive_any

    def cond(carry):
        k, alive_any = carry
        return (k < nchunks) & alive_any

    k_end, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.bool_(True))
    )
    # Drain DMAs started by warm-up/prefetch but never waited on — an early
    # exit must not leak in-flight copies into the next program.
    started = jnp.minimum(k_end + NBUF - 1, nchunks)

    def drain(k, c):
        get_dma(k % NBUF, k).wait()
        return c

    jax.lax.fori_loop(k_end, started, drain, 0)

    for j in range(NT):
        acc = accst[j]
        out_ref[0, j, 0:3, :] = acc[0:3, :]
        out_ref[0, j, 3:4, :] = 1.0 - Tst[j]
        out_ref[0, j, 4:5, :] = acc[3:4, :]
        out_ref[0, j, 5:6, :] = jnp.zeros((1, P), jnp.float32) + (
            nch_s[j].astype(jnp.float32)
        )
        out_ref[0, j, 6:8, :] = jnp.zeros((2, P), jnp.float32)


def _stream_bwd_kernel(cfg: StreamCfg, starts_ref, al_ref, off_ref,
                       packed_ref, fwd_ref, gout_ref, pginit_ref, pgrad_ref,
                       buf, wbuf, sems, wsems, Tst, gPst, cgst):
    del pginit_ref  # aliased zero buffer; never read
    G, P, NT = cfg.chunk, cfg.npix, cfg.nt
    t = pl.program_id(0)
    s0 = starts_ref[t]
    s1 = starts_ref[t + 1]
    base0 = pl.multiple_of((s0 // G) * G, G)
    a0 = pl.multiple_of(al_ref[t], G)
    nchunks = pl.cdiv(s1 - base0, G)
    pxy = [_tile_pixel_coords(cfg, t + off_ref[0], j) for j in range(NT)]

    # per-tile constants from forward outputs
    nch = []
    consts = []
    for j in range(NT):
        out4 = jnp.concatenate(
            [fwd_ref[0, j, 0:3, :], fwd_ref[0, j, 4:5, :]], axis=0
        )
        T_final = 1.0 - fwd_ref[0, j, 3:4, :]
        g4 = jnp.concatenate(
            [gout_ref[0, j, 0:3, :], gout_ref[0, j, 4:5, :]], axis=0
        )
        gA = gout_ref[0, j, 3:4, :]
        godot = jnp.sum(g4 * out4, axis=0, keepdims=True)
        consts.append((g4, gA, godot, T_final))
        nch.append(fwd_ref[0, j, CH_NCHUNKS, 0].astype(jnp.int32))
        Tst[j] = jnp.ones((1, P), jnp.float32)
        gPst[j] = jnp.zeros((1, P), jnp.float32)
    nch_max = functools.reduce(jnp.maximum, nch)
    nchunks = jnp.minimum(nchunks, nch_max)

    def get_dma(slot, k):
        return pltpu.make_async_copy(
            packed_ref.at[:, pl.ds(pl.multiple_of(base0 + k * G, G), G)],
            buf.at[slot],
            sems.at[slot],
        )

    def put_dma(slot, k):
        return pltpu.make_async_copy(
            wbuf.at[slot],
            pgrad_ref.at[:, pl.ds(pl.multiple_of(a0 + k * G, G), G)],
            wsems.at[slot],
        )

    for w in range(NBUF - 1):
        @pl.when(w < nchunks)
        def _(w=w):
            get_dma(w, w).start()

    def body(k, _):
        slot = k % NBUF

        @pl.when(k + NBUF - 1 < nchunks)
        def _():
            get_dma((k + NBUF - 1) % NBUF, k + NBUF - 1).start()

        get_dma(slot, k).wait()

        @pl.when(k >= NBUF)
        def _():
            put_dma(slot, k - NBUF).wait()

        chunk = buf[slot]  # [NF, G]
        gidx = base0 + k * G + _row_iota(G)
        rowmask = (gidx >= s0) & (gidx < s1)
        cols4 = chunk[si.COL_R:si.COL_R + 4, :]  # [4, G]

        cgst[0] = jnp.zeros((NF, G), jnp.float32)
        # reduce-by-key row: gid + 1 for this supertile's own slots, 0 for
        # foreign/padding rows (their grads are written by their own
        # program; rows never written anywhere stay zero-key and sort to
        # the front, excluded by the reduction bounds).
        cgst[0, si.GCOL_KEY:si.GCOL_KEY + 1, :] = jnp.where(
            rowmask.reshape(1, G),
            chunk[si.COL_GID:si.COL_GID + 1, :] + 1.0,
            0.0,
        )
        for j in range(NT):
            g4, gA, godot, T_final = consts[j]
            px, py, tx, ty = pxy[j]
            live = _chunk_bbox(cfg, chunk, tx, ty, rowmask)

            @pl.when((k < nch[j]) & jnp.any(live))
            def _(j=j, g4=g4, gA=gA, godot=godot,
                  T_final=T_final, px=px, py=py, live=live):
                q = _chunk_q(cfg, chunk, px, py, live)
                alpha, expneg = q["alpha"], q["expneg"]
                dx, dy = q["dx"], q["dy"]
                one_m = 1.0 - alpha
                Texc = _pprod_excl(one_m, G)
                T_i = Texc * Tst[j]
                w_ = alpha * T_i
                # cg[g, p] = sum_c cols4[c, g] * g4[c, p]: K=4 is a waste of
                # an MXU pass per precision split — 4 VPU outer-product FMAs
                # are exact f32 and ~6x cheaper than the HIGHEST matmul.
                cg = functools.reduce(
                    lambda acc, c: acc + cols4[c].reshape(G, 1)
                    * g4[c].reshape(1, P),
                    range(4),
                    jnp.zeros((G, P), jnp.float32),
                )
                wcg = w_ * cg
                prefix_incl = _psum_incl(wcg, G)
                dalpha = (
                    T_i * cg
                    - (godot - gPst[j] - prefix_incl) / one_m
                    + gA * T_final / one_m
                )
                live = jnp.logical_not(q["killed"] | q["clamped"])
                dsigma = jnp.where(live, -dalpha * alpha, 0.0)
                dopac_pp = jnp.where(live, dalpha * expneg, 0.0)
                ddx_pp = dsigma * (q["ca"] * dx + q["cb"] * dy)
                ddy_pp = dsigma * (q["cc"] * dy + q["cb"] * dx)
                # dcols4[c, g] = sum_p g4[c, p] * w_[g, p]: 4 exact-f32 VPU
                # multiply+row-sums instead of a K=P HIGHEST MXU matmul.
                dcols4 = jnp.concatenate(
                    [
                        jnp.sum(w_ * g4[c].reshape(1, P), axis=1).reshape(
                            1, G)
                        for c in range(4)
                    ],
                    axis=0,
                )  # [4, G]
                grad_rows = jnp.concatenate(
                    [
                        jnp.sum(ddx_pp, axis=1).reshape(1, G),
                        jnp.sum(ddy_pp, axis=1).reshape(1, G),
                        jnp.sum(dsigma * 0.5 * dx * dx, axis=1).reshape(
                            1, G),
                        jnp.sum(dsigma * dx * dy, axis=1).reshape(1, G),
                        jnp.sum(dsigma * 0.5 * dy * dy, axis=1).reshape(
                            1, G),
                        jnp.sum(dopac_pp, axis=1).reshape(1, G),
                        dcols4,
                        jnp.sum(jnp.abs(ddx_pp), axis=1).reshape(1, G),
                        jnp.sum(jnp.abs(ddy_pp), axis=1).reshape(1, G),
                        jnp.zeros((NF - 12, G), jnp.float32),
                    ],
                    axis=0,
                )  # [NF, G]
                Tst[j] = Tst[j] * (
                    Texc[G - 1:G, :] * one_m[G - 1:G, :]
                )
                gPst[j] = gPst[j] + jnp.sum(wcg, axis=0, keepdims=True)
                cgst[0] = cgst[0] + grad_rows
        if not _use_packed_grads():
            wbuf[slot] = cgst[0]
        else:
            # TPU hot path: pack GCOL pairs bf16x2 AFTER the cross-tile sum
            # (see _pack2); key moves to si.PCOL_KEY. seg_reduce unpacks.
            rows = cgst[0]
            wbuf[slot] = jnp.concatenate(
                [_pack2(rows[2 * i:2 * i + 1, :],
                        rows[2 * i + 1:2 * i + 2, :])
                 for i in range(si.N_PAIRS)]
                + [rows[si.GCOL_KEY:si.GCOL_KEY + 1, :]]
                + [jnp.zeros((NF - si.PCOL_KEY - 1, G), jnp.float32)],
                axis=0,
            )
        put_dma(slot, k).start()
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)
    for tail in range(1, NBUF + 1):
        @pl.when(nchunks >= tail)
        def _(tail=tail):
            put_dma((nchunks - tail) % NBUF, nchunks - tail).wait()


def _fwd_call(cfg: StreamCfg, st_starts, packed, tile_offset=None):
    G, P, NT = cfg.chunk, cfg.npix, cfg.nt
    if tile_offset is None:
        tile_offset = jnp.zeros((1,), jnp.int32)
    kernel = functools.partial(_stream_fwd_kernel, cfg)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(cfg.cs,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(
                (1, NT, OUT_CH, P), lambda t, s, o: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((NBUF, NF, G), jnp.float32),
                pltpu.SemaphoreType.DMA((NBUF,)),
                pltpu.VMEM((NT, 1, P), jnp.float32),
                pltpu.VMEM((NT, 8, P), jnp.float32),
                pltpu.SMEM((NT,), jnp.int32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((cfg.cs, NT, OUT_CH, P), jnp.float32),
        interpret=_use_interpret(),
    )(st_starts, tile_offset, packed)


def _bwd_call(cfg: StreamCfg, st_starts, st_starts_al, packed, fwd_out,
              gout, tile_offset=None):
    G, P, NT = cfg.chunk, cfg.npix, cfg.nt
    if tile_offset is None:
        tile_offset = jnp.zeros((1,), jnp.int32)
    kernel = functools.partial(_stream_bwd_kernel, cfg)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(cfg.cs,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),  # packed
                pl.BlockSpec((1, NT, OUT_CH, P),
                             lambda t, s, a, o: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM),  # fwd_out
                pl.BlockSpec((1, NT, OUT_CH, P),
                             lambda t, s, a, o: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM),  # gout
                pl.BlockSpec(memory_space=pltpu.HBM),  # pgrad zero-init
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[
                pltpu.VMEM((NBUF, NF, G), jnp.float32),
                pltpu.VMEM((NBUF, NF, G), jnp.float32),
                pltpu.SemaphoreType.DMA((NBUF,)),
                pltpu.SemaphoreType.DMA((NBUF,)),
                pltpu.VMEM((NT, 1, P), jnp.float32),
                pltpu.VMEM((NT, 1, P), jnp.float32),
                pltpu.VMEM((1, NF, G), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((NF, cfg.pad_cap), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        # flattened input 6 = zero buffer -> output 0 (skipped chunks and
        # alignment padding stay zero for the reduction)
        input_output_aliases={6: 0},
        interpret=_use_interpret(),
    )(st_starts, st_starts_al, tile_offset, packed, fwd_out, gout,
      jnp.zeros((NF, cfg.pad_cap), jnp.float32))


@functools.lru_cache(maxsize=32)
def _make_composite_fn(cfg: StreamCfg):
    """Custom-VJP supertile compositor for a static config.

    Signature: (means2d, conics, colors, opacities, depths, radii,
    abs_dummy, tile_offset, *isect_arrays) -> out [CS, NT, OUT_CH, P]."""
    C, N = cfg.num_cameras, cfg.num_gaussians
    M0 = C * N
    caps = StreamCaps(exp_cap=cfg.exp_cap,
                      n_supertiles=cfg.num_cameras * cfg.n_supertiles,
                      chunk=cfg.chunk, ss=cfg.ss)

    def build_packed(means2d, conics, colors, opacities, depths, radii,
                     isect):
        fields = si.build_field_columns(
            means2d, conics, opacities, colors, depths, radii
        )
        # row gather, then transpose into the kernel-native [NF, rows]
        # layout (chunk DMAs slice the lane axis at G-aligned offsets)
        return si.pack_stream(fields, isect, caps).T

    def fwd_impl(means2d, conics, colors, opacities, depths, radii,
                 abs_dummy, tile_offset, *isect_arrays):
        isect = StreamIsect(*isect_arrays)
        packed = build_packed(means2d, conics, colors, opacities, depths,
                              radii, isect)
        out = _fwd_call(cfg, isect.st_starts, packed, tile_offset)
        return out, packed

    @jax.custom_vjp
    def composite(means2d, conics, colors, opacities, depths, radii,
                  abs_dummy, tile_offset, *isect_arrays):
        out, _ = fwd_impl(means2d, conics, colors, opacities, depths, radii,
                          abs_dummy, tile_offset, *isect_arrays)
        return out

    def composite_fwd(means2d, conics, colors, opacities, depths, radii,
                      abs_dummy, tile_offset, *isect_arrays):
        out, packed = fwd_impl(means2d, conics, colors, opacities, depths,
                               radii, abs_dummy, tile_offset, *isect_arrays)
        return out, (packed, tile_offset, isect_arrays, out)

    def composite_bwd(res, gout):
        packed, tile_offset, isect_arrays, fwd_out = res
        isect = StreamIsect(*isect_arrays)
        pgrads = _bwd_call(cfg, isect.st_starts, isect.st_starts_al, packed,
                           fwd_out, gout, tile_offset)
        n_payload = si.N_GCOLS if cfg.absgrad else si.GCOL_ABSDX
        seg = si.reduce_stream_grads(pgrads, M0, n_payload,
                                     packed=_use_packed_grads())
        g = lambda c: seg[c]
        dmeans2d = jnp.stack([g(si.GCOL_DX), g(si.GCOL_DY)],
                             axis=-1).reshape(C, N, 2)
        dconics = jnp.stack(
            [g(si.GCOL_DCA), g(si.GCOL_DCB), g(si.GCOL_DCC)], axis=-1
        ).reshape(C, N, 3)
        dcolors = jnp.stack(
            [g(si.GCOL_DR), g(si.GCOL_DG), g(si.GCOL_DB)], axis=-1
        ).reshape(C, N, 3)
        dopac = g(si.GCOL_DOPAC).reshape(C, N)
        ddepth = g(si.GCOL_DDEPTH).reshape(C, N)
        if cfg.absgrad:
            dabs = jnp.stack([g(si.GCOL_ABSDX), g(si.GCOL_ABSDY)],
                             axis=-1).reshape(C, N, 2)
        else:
            dabs = jnp.zeros((C, N, 2), seg.dtype)
        nones = (None,) * len(isect_arrays)
        return (dmeans2d, dconics, dcolors, dopac, ddepth, None, dabs,
                None) + nones

    composite.defvjp(composite_fwd, composite_bwd)
    return composite


def composite_stream(
    cfg: StreamCfg,
    means2d: jax.Array,  # [C, N, 2]
    conics: jax.Array,  # [C, N, 3]
    colors: jax.Array,  # [C, N, 3]
    opacities: jax.Array,  # [C, N]
    depths: jax.Array,  # [C, N]
    radii: jax.Array,  # [C, N] (non-differentiable tile-bbox metadata)
    isect: StreamIsect,
    abs_dummy: jax.Array | None = None,
    tile_offset: jax.Array | None = None,
):
    """Differentiable supertile compositing -> [CS, NT, OUT_CH, P]."""
    if abs_dummy is None:
        abs_dummy = jnp.zeros_like(means2d)
    if tile_offset is None:
        tile_offset = jnp.zeros((1,), jnp.int32)
    fn = _make_composite_fn(cfg)
    return fn(means2d, conics, colors, opacities, depths,
              jax.lax.stop_gradient(radii), abs_dummy, tile_offset, *isect)


def stream_to_image(cfg: StreamCfg, out: jax.Array):
    """[CS, NT, OUT_CH, P] -> (rgb [C,H,W,3], alpha, depth [C,H,W,1])."""
    C, ts, ss = cfg.num_cameras, cfg.tile_size, cfg.ss
    sh, sw = cfg.sh, cfg.sw
    x = out.reshape(C, sh, sw, ss, ss, OUT_CH, ts, ts)
    x = x.transpose(0, 5, 1, 3, 6, 2, 4, 7).reshape(
        C, OUT_CH, sh * ss * ts, sw * ss * ts
    )
    x = x[:, :, : cfg.height, : cfg.width]
    rgb = x[:, 0:3].transpose(0, 2, 3, 1)
    alpha = x[:, 3:4].transpose(0, 2, 3, 1)
    depth = x[:, 4:5].transpose(0, 2, 3, 1)
    return rgb, alpha, depth
