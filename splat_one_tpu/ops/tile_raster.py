"""Pallas tile rasterizer: per-tile front-to-back compositing, fwd + bwd.

The TPU-native core of the framework — replaces the gsplat CUDA
``rasterize_to_pixels`` forward/backward (reference surface:
``gsplat.rendering.rasterization`` called at
utils/gsplat_utils/gsplat_trainer.py:477-494). Design (SURVEY.md §7.3):

  - Grid is one program per (camera, tile); the TensorCore runs programs as a
    sequential pipeline, so ragged per-tile work needs no load balancing.
  - Each program walks its G-aligned slot range (see ``ops.intersect``) in
    chunks of G=128, double-buffering HBM->VMEM DMAs of the packed
    ``[NF, align_cap]`` intersection array.
  - Front-to-back compositing is vectorized over the chunk: the cumulative
    transmittance ``T_i = prod_{j<i}(1 - alpha_j)`` is computed in log space
    with a *strictly-lower-triangular matmul on the MXU*
    (``tri[G,G] @ log1p(-alpha)[G,P]``) instead of a sequential loop — the
    idiomatic TPU replacement for the CUDA warp-serial inner loop.
  - The hand-written backward runs in *forward* order using prefix
    accumulators (suffix sums rewritten as ``total - prefix``), so it streams
    the same packed array with the same access pattern and writes
    per-intersection gradients; per-gaussian reduction happens outside via a
    forward-precomputed permutation + cumsum + boundary diffs
    (``intersect.gather_reduction`` — XLA scatter/segment-sum is
    pathologically slow on TPU).
  - ``absgrad`` (sum of |per-pixel mean2d gradient| used by the reference's
    densification, gsplat_trainer.py:616-622 DefaultStrategy(absgrad)) is
    produced as two extra rows of the packed gradient array.

Compositing semantics match ``ops.reference.composite_reference`` exactly and
are checked by parity tests (fwd + grads).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from splat_one_tpu.ops import intersect as isect_mod
from splat_one_tpu.ops.intersect import NF, IsectData
from splat_one_tpu.ops.reference import ALPHA_MAX, ALPHA_MIN

# Output-channel rows in the per-tile [OUT_CH, P] block.
OUT_CH = 8  # r, g, b, alpha, depth, n_chunks, pad, pad
CH_NCHUNKS = 5  # forward records its early-termination chunk count here


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


@dataclasses.dataclass(frozen=True)
class RasterCfg:
    """Static rasterizer configuration (hashable; keys the kernel cache)."""

    width: int
    height: int
    tile_size: int
    num_cameras: int
    num_gaussians: int
    chunk: int  # G
    align_cap: int
    wrap_x: bool = False  # spherical/equirect azimuth seam wrapping
    # Early termination: stop compositing a tile once EVERY pixel's
    # transmittance is below this (the per-pixel T < 1e-4 cutoff of the
    # gsplat CUDA rasterizer; tail contributions are bounded by it).
    # The backward then only walks the chunks the forward processed.
    # 1e-5 keeps truncation an order of magnitude inside the 1e-4 oracle
    # parity tolerance at <~1 extra chunk of work vs gsplat's 1e-4.
    term_thresh: float = 1e-5

    @property
    def tw(self):
        return -(-self.width // self.tile_size)

    @property
    def th(self):
        return -(-self.height // self.tile_size)

    @property
    def ct(self):
        return self.num_cameras * self.tw * self.th

    @property
    def npix(self):
        return self.tile_size * self.tile_size


def _tile_pixel_coords(cfg: RasterCfg, t):
    """Pixel-center coordinates of tile t as [1, P] rows (px, py)."""
    ts = cfg.tile_size
    T = cfg.tw * cfg.th
    rem = t % T
    ty = rem // cfg.tw
    tx = rem % cfg.tw
    local = jax.lax.broadcasted_iota(jnp.int32, (1, cfg.npix), 1)
    px = (tx * ts + local % ts).astype(jnp.float32) + 0.5
    py = (ty * ts + local // ts).astype(jnp.float32) + 0.5
    return px, py


def _tri_matrices(G):
    rows = jax.lax.broadcasted_iota(jnp.int32, (G, G), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (G, G), 1)
    tri_strict = (rows > cols).astype(jnp.float32)
    tri_incl = (rows >= cols).astype(jnp.float32)
    return tri_strict, tri_incl


def _chunk_alpha(chunk, px, py, G, P, wrap_width: int = 0):
    """Shared forward math for one chunk: returns per-(gaussian, pixel)
    quantities used by both kernels."""
    x = chunk[isect_mod.ROW_X, :].reshape(G, 1)
    y = chunk[isect_mod.ROW_Y, :].reshape(G, 1)
    ca = chunk[isect_mod.ROW_CA, :].reshape(G, 1)
    cb = chunk[isect_mod.ROW_CB, :].reshape(G, 1)
    cc = chunk[isect_mod.ROW_CC, :].reshape(G, 1)
    op = chunk[isect_mod.ROW_OPAC, :].reshape(G, 1)
    dx = x - px  # [G, P]
    if wrap_width:
        dx = dx - wrap_width * jnp.round(dx * (1.0 / wrap_width))
    dy = y - py
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    expneg = jnp.exp(-sigma)
    alpha_raw = op * expneg
    killed = (sigma < 0.0) | (alpha_raw < ALPHA_MIN)
    clamped = alpha_raw > ALPHA_MAX
    alpha = jnp.where(killed, 0.0, jnp.minimum(alpha_raw, ALPHA_MAX))
    return dict(
        dx=dx, dy=dy, ca=ca, cb=cb, cc=cc, expneg=expneg, alpha=alpha,
        killed=killed, clamped=clamped,
    )


def _mm(a, b, dims):
    # HIGHEST = full-f32 multi-pass MXU; default bf16 rounding is visible
    # in rgb/depth. See ops/stream_raster.py.
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def _fwd_kernel(cfg: RasterCfg, starts_ref, off_ref, packed_ref, out_ref,
                buf, sems):
    G, P = cfg.chunk, cfg.npix
    t = pl.program_id(0)
    start = pl.multiple_of(starts_ref[t], G)
    nchunks = (starts_ref[t + 1] - start) // G
    px, py = _tile_pixel_coords(cfg, t + off_ref[0])
    tri_strict, _ = _tri_matrices(G)

    NBUF = 4  # deep buffering: per-chunk compute (~0.2 us of MXU work)
    # is far below DMA latency, so 2 buffers leave the pipeline stalled

    def get_dma(slot, k):
        return pltpu.make_async_copy(
            packed_ref.at[:, pl.ds(pl.multiple_of(start + k * G, G), G)],
            buf.at[slot],
            sems.at[slot],
        )

    for w in range(NBUF - 1):
        @pl.when(w < nchunks)
        def _(w=w):
            get_dma(w, w).start()

    def body(carry):
        k, T_row, acc = carry
        slot = k % NBUF

        @pl.when(k + NBUF - 1 < nchunks)
        def _():
            get_dma((k + NBUF - 1) % NBUF, k + NBUF - 1).start()

        get_dma(slot, k).wait()
        chunk = buf[slot]  # [NF, G]
        q = _chunk_alpha(chunk, px, py, G, P,
                        cfg.width if cfg.wrap_x else 0)
        alpha = q["alpha"]
        logt = jnp.log1p(-alpha)
        cum_excl = _mm(tri_strict, logt, (((1,), (0,))))
        w = alpha * jnp.exp(cum_excl) * T_row  # [G, P]
        cols = chunk[isect_mod.ROW_R:isect_mod.ROW_R + 8, :]  # [8, G]
        acc = acc + _mm(cols, w, (((1,), (0,))))
        T_row = T_row * jnp.exp(jnp.sum(logt, axis=0, keepdims=True))
        return k + 1, T_row, acc

    def cond(carry):
        k, T_row, _ = carry
        live = jnp.max(T_row) >= cfg.term_thresh
        return (k < nchunks) & (live | (cfg.term_thresh <= 0.0))

    k_end, T_row, acc = jax.lax.while_loop(
        cond,
        body,
        (jnp.int32(0), jnp.ones((1, P), jnp.float32),
         jnp.zeros((8, P), jnp.float32)),
    )
    # Drain DMAs that were started (by warm-up/prefetch) but never waited on
    # — an early exit must not leak in-flight copies into the next program.
    started = jnp.minimum(k_end + NBUF - 1, nchunks)

    def drain(k, c):
        get_dma(k % NBUF, k).wait()
        return c

    jax.lax.fori_loop(k_end, started, drain, 0)
    out_ref[0, 0:3, :] = acc[0:3, :]  # rgb
    out_ref[0, 3:4, :] = 1.0 - T_row  # alpha
    out_ref[0, 4:5, :] = acc[3:4, :]  # accumulated depth (row 3 of cols block)
    out_ref[0, 5:6, :] = jnp.full((1, P), 1.0, jnp.float32) * k_end.astype(
        jnp.float32
    )  # chunks processed (CH_NCHUNKS); backward stops here
    out_ref[0, 6:8, :] = jnp.zeros((2, P), jnp.float32)


def _bwd_kernel(cfg: RasterCfg, starts_ref, off_ref, packed_ref, fwd_ref,
                gout_ref, pginit_ref, pgrad_ref, buf, wbuf, sems, wsems):
    del pginit_ref  # zero buffer aliased into pgrad_ref; never read directly
    G, P = cfg.chunk, cfg.npix
    t = pl.program_id(0)
    start = pl.multiple_of(starts_ref[t], G)
    nchunks = (starts_ref[t + 1] - start) // G
    # Forward recorded how many chunks it processed before saturating; only
    # those can carry gradient (the pgrad buffer is zero-initialized by the
    # caller via input/output aliasing, so skipped chunks contribute zeros).
    nchunks = jnp.minimum(nchunks, fwd_ref[0, CH_NCHUNKS, 0].astype(jnp.int32))
    px, py = _tile_pixel_coords(cfg, t + off_ref[0])
    tri_strict, tri_incl = _tri_matrices(G)

    out4 = jnp.concatenate(
        [fwd_ref[0, 0:3, :], fwd_ref[0, 4:5, :]], axis=0
    )  # [4, P] rgb + depth
    T_final = 1.0 - fwd_ref[0, 3:4, :]  # [1, P]
    g4 = jnp.concatenate(
        [gout_ref[0, 0:3, :], gout_ref[0, 4:5, :]], axis=0
    )  # [4, P]
    gA = gout_ref[0, 3:4, :]  # [1, P]
    go_dot_out = jnp.sum(g4 * out4, axis=0, keepdims=True)  # [1, P]

    def get_dma(slot, k):
        return pltpu.make_async_copy(
            packed_ref.at[:, pl.ds(pl.multiple_of(start + k * G, G), G)],
            buf.at[slot],
            sems.at[slot],
        )

    def put_dma(slot, k):
        return pltpu.make_async_copy(
            wbuf.at[slot],
            pgrad_ref.at[:, pl.ds(pl.multiple_of(start + k * G, G), G)],
            wsems.at[slot],
        )

    # deep read/write buffering: per-chunk compute is tiny next to DMA
    # latency; with 2 buffers the read-wait and write-wait serialize
    NBUF = 4
    for warm in range(NBUF - 1):
        @pl.when(warm < nchunks)
        def _(warm=warm):
            get_dma(warm, warm).start()

    def body(k, carry):
        T_row, gPacc = carry
        slot = k % NBUF

        @pl.when(k + NBUF - 1 < nchunks)
        def _():
            get_dma((k + NBUF - 1) % NBUF, k + NBUF - 1).start()

        get_dma(slot, k).wait()
        # Wait for the write-DMA that last used this wbuf slot (k - NBUF).
        @pl.when(k >= NBUF)
        def _():
            put_dma(slot, k - NBUF).wait()

        chunk = buf[slot]
        q = _chunk_alpha(chunk, px, py, G, P,
                        cfg.width if cfg.wrap_x else 0)
        alpha, expneg = q["alpha"], q["expneg"]
        dx, dy = q["dx"], q["dy"]
        logt = jnp.log1p(-alpha)
        cum_excl = _mm(tri_strict, logt, (((1,), (0,))))
        T_i = jnp.exp(cum_excl) * T_row  # [G, P]
        w = alpha * T_i
        one_m = 1.0 - alpha  # >= 1 - ALPHA_MAX

        cols4 = chunk[isect_mod.ROW_R:isect_mod.ROW_R + 4, :]  # [4, G]
        cg = _mm(cols4, g4, (((0,), (0,))))  # [G, P]
        wcg = w * cg
        prefix_incl = _mm(tri_incl, wcg, (((1,), (0,))))  # [G, P]
        dalpha = (
            T_i * cg
            - (go_dot_out - gPacc - prefix_incl) / one_m
            + gA * T_final / one_m
        )
        # chain rule through alpha = min(opac * exp(-sigma), AMAX), masked.
        live = jnp.logical_not(q["killed"] | q["clamped"])
        dsigma = jnp.where(live, -dalpha * alpha, 0.0)
        dopac_pp = jnp.where(live, dalpha * expneg, 0.0)
        ddx_pp = dsigma * (q["ca"] * dx + q["cb"] * dy)
        ddy_pp = dsigma * (q["cc"] * dy + q["cb"] * dx)

        dcols4 = _mm(g4, w, (((1,), (1,))))  # [4, G]
        dmx = jnp.sum(ddx_pp, axis=1)  # [G]
        dmy = jnp.sum(ddy_pp, axis=1)
        dca = jnp.sum(dsigma * 0.5 * dx * dx, axis=1)
        dcb = jnp.sum(dsigma * dx * dy, axis=1)
        dcc = jnp.sum(dsigma * 0.5 * dy * dy, axis=1)
        dop = jnp.sum(dopac_pp, axis=1)
        absdx = jnp.sum(jnp.abs(ddx_pp), axis=1)
        absdy = jnp.sum(jnp.abs(ddy_pp), axis=1)

        grad_rows = jnp.concatenate(
            [
                dmx.reshape(1, G), dmy.reshape(1, G),
                dca.reshape(1, G), dcb.reshape(1, G), dcc.reshape(1, G),
                dop.reshape(1, G),
                dcols4,  # rows 6..9: dr, dg, db, ddepth
                absdx.reshape(1, G), absdy.reshape(1, G),
                jnp.zeros((NF - 12, G), jnp.float32),
            ],
            axis=0,
        )  # [NF, G]
        wbuf[slot] = grad_rows
        put_dma(slot, k).start()

        T_row = T_row * jnp.exp(jnp.sum(logt, axis=0, keepdims=True))
        gPacc = gPacc + jnp.sum(wcg, axis=0, keepdims=True)
        return T_row, gPacc

    jax.lax.fori_loop(
        0,
        nchunks,
        body,
        (jnp.ones((1, P), jnp.float32), jnp.zeros((1, P), jnp.float32)),
    )
    # Drain outstanding write DMAs before the program ends.
    for tail in range(1, NBUF + 1):
        @pl.when(nchunks >= tail)
        def _(tail=tail):
            put_dma((nchunks - tail) % NBUF, nchunks - tail).wait()


def _zeros_like_pgrads(cfg: RasterCfg):
    return jnp.zeros((NF, cfg.align_cap), jnp.float32)


def _fwd_call(cfg: RasterCfg, starts, packed, tile_offset=None):
    G, P = cfg.chunk, cfg.npix
    grid = (cfg.ct,)
    if tile_offset is None:
        tile_offset = jnp.zeros((1,), jnp.int32)
    kernel = functools.partial(_fwd_kernel, cfg)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, OUT_CH, P), lambda t, s, o: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((4, NF, G), jnp.float32),
                pltpu.SemaphoreType.DMA((4,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((cfg.ct, OUT_CH, P), jnp.float32),
        interpret=_use_interpret(),
    )(starts, tile_offset, packed)


def _bwd_call(cfg: RasterCfg, starts, packed, fwd_out, gout,
              tile_offset=None):
    G, P = cfg.chunk, cfg.npix
    grid = (cfg.ct,)
    if tile_offset is None:
        tile_offset = jnp.zeros((1,), jnp.int32)
    kernel = functools.partial(_bwd_kernel, cfg)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # packed
                pl.BlockSpec((1, OUT_CH, P), lambda t, s, o: (t, 0, 0),
                             memory_space=pltpu.VMEM),  # fwd_out
                pl.BlockSpec((1, OUT_CH, P), lambda t, s, o: (t, 0, 0),
                             memory_space=pltpu.VMEM),  # gout
                pl.BlockSpec(memory_space=pl.ANY),  # pgrad zero-init
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((4, NF, G), jnp.float32),
                pltpu.VMEM((4, NF, G), jnp.float32),
                pltpu.SemaphoreType.DMA((4,)),
                pltpu.SemaphoreType.DMA((4,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((NF, cfg.align_cap), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        # flattened input 5 = the zero buffer -> output 0 (early-terminated
        # chunks never get written; aliasing keeps them zero for the
        # per-gaussian reduction)
        input_output_aliases={5: 0},
        interpret=_use_interpret(),
    )(starts, tile_offset, packed, fwd_out, gout, _zeros_like_pgrads(cfg))


@functools.lru_cache(maxsize=32)
def _make_composite_fn(cfg: RasterCfg):
    """Build the custom-VJP tile compositor for a static config.

    Signature: (means2d, conics, colors, opacities, depths, abs_dummy,
    *isect_arrays) -> tile_out [CT, OUT_CH, P].

    ``abs_dummy`` is a zeros [C, N, 2] input whose cotangent carries the
    absgrad accumulation (the JAX equivalent of gsplat's means2d grad hook).
    The isect layout arrays are integer data; their cotangents are None.
    """
    C, N = cfg.num_cameras, cfg.num_gaussians
    M0 = C * N

    def fwd_impl(means2d, conics, colors, opacities, depths, abs_dummy,
                 tile_offset, *isect_arrays):
        isect = IsectData(*isect_arrays)
        packed = isect_mod.pack_fields(
            means2d, conics, colors, opacities, depths, isect
        )
        return _fwd_call(
            cfg, isect.tile_starts, packed, tile_offset
        ), packed

    @jax.custom_vjp
    def composite(means2d, conics, colors, opacities, depths, abs_dummy,
                  tile_offset, *isect_arrays):
        out, _ = fwd_impl(means2d, conics, colors, opacities, depths,
                          abs_dummy, tile_offset, *isect_arrays)
        return out

    def composite_fwd(means2d, conics, colors, opacities, depths, abs_dummy,
                      tile_offset, *isect_arrays):
        out, packed = fwd_impl(means2d, conics, colors, opacities, depths,
                               abs_dummy, tile_offset, *isect_arrays)
        return out, (packed, tile_offset, isect_arrays, out)

    def composite_bwd(res, gout):
        packed, tile_offset, isect_arrays, fwd_out = res
        isect = IsectData(*isect_arrays)
        pgrads = _bwd_call(
            cfg, isect.tile_starts, packed, fwd_out, gout, tile_offset
        )
        # Per-gaussian reduction: by-gaussian permute + cumsum + boundary
        # diffs (no scatter; see intersect.gather_reduction).
        seg = isect_mod.gather_reduction(pgrads, isect, M0)  # [M0, NF]
        g = lambda row: seg[:, row]
        dmeans2d = jnp.stack(
            [g(isect_mod.GROW_DX), g(isect_mod.GROW_DY)], axis=-1
        ).reshape(C, N, 2)
        dconics = jnp.stack(
            [g(isect_mod.GROW_DCA), g(isect_mod.GROW_DCB),
             g(isect_mod.GROW_DCC)], axis=-1
        ).reshape(C, N, 3)
        dcolors = jnp.stack(
            [g(isect_mod.GROW_DR), g(isect_mod.GROW_DG),
             g(isect_mod.GROW_DB)], axis=-1
        ).reshape(C, N, 3)
        dopac = g(isect_mod.GROW_DOPAC).reshape(C, N)
        ddepth = g(isect_mod.GROW_DDEPTH).reshape(C, N)
        dabs = jnp.stack(
            [g(isect_mod.GROW_ABSDX), g(isect_mod.GROW_ABSDY)], axis=-1
        ).reshape(C, N, 2)
        nones = (None,) * len(isect_arrays)
        return (
            dmeans2d, dconics, dcolors, dopac, ddepth, dabs, None,
        ) + nones

    composite.defvjp(composite_fwd, composite_bwd)
    return composite


def composite_tiles(
    cfg: RasterCfg,
    means2d: jax.Array,  # [C, N, 2]
    conics: jax.Array,  # [C, N, 3]
    colors: jax.Array,  # [C, N, 3]
    opacities: jax.Array,  # [C, N]
    depths: jax.Array,  # [C, N]
    isect: IsectData,
    abs_dummy: jax.Array | None = None,
    tile_offset: jax.Array | None = None,
):
    """Differentiable per-tile compositing. Returns [CT, OUT_CH, P]."""
    if abs_dummy is None:
        abs_dummy = jnp.zeros_like(means2d)
    if tile_offset is None:
        tile_offset = jnp.zeros((1,), jnp.int32)
    fn = _make_composite_fn(cfg)
    return fn(means2d, conics, colors, opacities, depths, abs_dummy,
              tile_offset, *isect)


def tiles_to_image(cfg: RasterCfg, tile_out: jax.Array):
    """[CT, OUT_CH, P] -> (rgb [C,H,W,3], alpha [C,H,W,1], depth [C,H,W,1])."""
    C, ts = cfg.num_cameras, cfg.tile_size
    th, tw = cfg.th, cfg.tw
    x = tile_out.reshape(C, th, tw, OUT_CH, ts, ts)
    x = x.transpose(0, 3, 1, 4, 2, 5).reshape(C, OUT_CH, th * ts, tw * ts)
    x = x[:, :, : cfg.height, : cfg.width]
    rgb = x[:, 0:3].transpose(0, 2, 3, 1)
    alpha = x[:, 3:4].transpose(0, 2, 3, 1)
    depth = x[:, 4:5].transpose(0, 2, 3, 1)
    return rgb, alpha, depth
