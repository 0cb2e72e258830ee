"""Pallas segmented broadcast: per-parent meta -> per-slot meta, gather-free.

Replaces the expansion stage of the stream-intersection builder
(ops.stream_isect): slot -> parent index via marker scatter + cumsum
(~9 ms at 1M parents; XLA scatter is ~8 ns/element) followed by one
[EXP, 8] row gather (~15 ms; row gathers are rate-bound at ~6.4 ns/row,
measured v5e) — together the single largest remaining glue cost of the
rasterization step.

Design (the inverse of ops.seg_reduce's one-hot reduction):

- Parents' slot runs are contiguous in expansion order with ascending
  start offsets, so for a chunk of CH consecutive slots the owning
  parents live in ONE contiguous parent window. The host precomputes the
  window base per chunk (one small searchsorted), and each grid program
  DMAs the parent-offset and parent-value slabs at a 128-aligned base.
- ``ge[i, p] = (slot_i >= off_p)`` is monotone along p; the owning parent
  of slot i is the last p with ``off_p <= slot_i``: its one-hot is
  ``ge[:, :-1] & ~ge[:, 1:]`` — pure VPU compares, no gather.
- Per-slot meta is ONE bf16 matmul on the MXU:
  ``meta[CH, NC] = onehot[CH, B] @ vals[B, NC]`` (one-hot on the LEFT so
  the MXU M dimension is the chunk). Every ``vals`` column is bf16-EXACT
  by construction (small ints, byte decompositions of wide ints — the
  parent INDEX itself rides as three byte columns — and 3-way bf16
  splits of f32 depth), and each output element has exactly one nonzero
  product, so the result is EXACT; byte/split columns recombine to the
  original values in fused XLA elementwise code outside the kernel.
- Correctness window: the aligned slab [base, base + B + 128) must cover
  every parent overlapping the chunk's slots. Zero-count parents can tie
  arbitrarily many offsets at one slot (alive-mask training buffers), so
  coverage is data-dependent: the caller checks coverage on device and
  falls back to the XLA scatter+gather path via ``lax.cond`` when any
  window overflows.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CH = 1024  # slots per grid program
B = 2048  # guaranteed parent window past the slab base (default slab)
SLAB = 3072  # default parents DMA'd per chunk when no observed window
OLEN = 4096  # offset entries DMA'd (need off[p+1] for the last parent)
ALIGN = 128  # slab-base alignment (lane width; DMA-friendly)

# vals column layout (every entry bf16-exact)
VC_SX0 = 0
VC_SY0 = 1
VC_SPAN = 2
VC_KA0 = 3  # kA bytes (kA < 2^16: bbox cells per parent < sw * sh * 2^?)
VC_KA1 = 4
VC_OFF0 = 5  # offset bytes (offsets < 2^24, ops.stream_isect caps)
VC_OFF1 = 6
VC_OFF2 = 7
VC_D0 = 8  # depth 3-way bf16 split (exact f32 reconstruction)
VC_D1 = 9
VC_D2 = 10
VC_P0 = 11  # parent-index bytes (p < 2^24)
VC_P1 = 12
VC_P2 = 13
NC = 16  # padded sublane width


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _kernel(bases_ref, offs2_ref, vals_ref, out_ref, obuf, vbuf, osems,
            vsems, *, slab):
    """One grid program = CH consecutive slots. Parent slabs are DMA'd
    double-buffered: program k starts program k+1's slab copies before
    computing, so slab-fetch latency (2 HBM->VMEM copies per chunk, the
    dominant cost of the original single-buffered kernel) hides behind
    the compare/matmul work of the previous chunk. ``offs2`` rides as a
    [2, L] table (row 0 = off[p], row 1 = off[p+1]) because Mosaic
    requires 1D dynamic slices to be 1024-element aligned while 2D
    slices only need lane (128) alignment — the same constraint shape as
    the vals slab."""
    k = pl.program_id(0)
    nb = pl.num_programs(0)

    def _start(j, slot):
        base = pl.multiple_of(bases_ref[j], ALIGN)
        pltpu.make_async_copy(
            offs2_ref.at[:, pl.ds(base, slab)], obuf.at[slot],
            osems.at[slot]).start()
        pltpu.make_async_copy(
            vals_ref.at[:, pl.ds(base, slab)], vbuf.at[slot],
            vsems.at[slot]).start()

    @pl.when(k == 0)
    def _():
        _start(0, 0)

    @pl.when(k + 1 < nb)
    def _():
        _start(k + 1, (k + 1) % 2)

    slot = k % 2
    base = pl.multiple_of(bases_ref[k], ALIGN)
    pltpu.make_async_copy(
        offs2_ref.at[:, pl.ds(base, slab)], obuf.at[slot],
        osems.at[slot]).wait()
    pltpu.make_async_copy(
        vals_ref.at[:, pl.ds(base, slab)], vbuf.at[slot],
        vsems.at[slot]).wait()

    slots = (k * CH + jax.lax.broadcasted_iota(
        jnp.int32, (CH, 1), 0)).astype(jnp.float32)
    offs0 = obuf[slot, 0, :].reshape(1, slab)  # off[p]
    offs1 = obuf[slot, 1, :].reshape(1, slab)  # off[p + 1]
    ge0 = slots >= offs0  # [CH, slab], monotone nonincreasing along p
    ge1 = slots >= offs1
    onehot = (ge0 & jnp.logical_not(ge1)).astype(jnp.bfloat16)

    # [CH, NC] = onehot[CH, slab] . vals[NC, slab]^T — one-hot on the
    # LEFT (M = CH fully tiles the MXU); exact: one nonzero product per
    # output
    out_ref[...] = jax.lax.dot_general(
        onehot, vbuf[slot].astype(jnp.bfloat16),
        ((((1,), (1,))), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _trunc_bf16(x):
    """f32 -> nearest-below bf16 value, AS f32, via mantissa masking.

    Deliberately NOT ``x.astype(bf16).astype(f32)``: XLA's algebraic
    simplifier folds f32->bf16->f32 convert chains to identity under jit
    (verified on TPU — the folded build reconstructed depth at bf16
    precision only), while a bitwise mask cannot be folded. Truncation
    (round-toward-zero) is as good as rounding for the 3-way split: each
    part stays bf16-representable and the residual shrinks by 2^-8."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return jax.lax.bitcast_convert_type(
        u & jnp.uint32(0xFFFF0000), jnp.float32)


def _split3(x):
    """f32 -> 3 bf16-exact f32 parts with (p0 + p1) + p2 == x exactly."""
    p0 = _trunc_bf16(x)
    r1 = x - p0  # exact: true difference has <= 17 significant bits
    p1 = _trunc_bf16(r1)
    p2 = r1 - p1  # <= 9 significant bits left: bf16-exact
    return p0, p1, p2


def _bytes3(x):
    """Exact-int f32 < 2^24 -> 3 bf16-exact byte columns."""
    b01 = x - 65536.0 * jnp.floor(x / 65536.0)
    return (
        b01 - 256.0 * jnp.floor(b01 / 256.0),
        jnp.floor(b01 / 256.0),
        jnp.floor(x / 65536.0),
    )


def build_vals(sx0, sy0, span, ka, offsets, depth, slab=SLAB):
    """[MP] parent columns -> [NC, MP_pad] bf16-exact value table
    (parents on lanes)."""
    MP = sx0.shape[0]
    off0, off1, off2 = _bytes3(offsets.astype(jnp.float32))
    p0, p1, p2 = _bytes3(jnp.arange(MP, dtype=jnp.float32))
    kaf = ka.astype(jnp.float32)
    d0, d1, d2 = _split3(depth)
    cols = [
        sx0.astype(jnp.float32),
        sy0.astype(jnp.float32),
        span.astype(jnp.float32),
        kaf - 256.0 * jnp.floor(kaf / 256.0),
        jnp.floor(kaf / 256.0),
        off0, off1, off2,
        d0, d1, d2,
        p0, p1, p2,
    ]
    vals = jnp.stack(cols + [jnp.zeros((MP,), jnp.float32)] * (
        NC - len(cols)), axis=0)
    pad = (-MP) % ALIGN + slab
    return jnp.pad(vals, ((0, 0), (0, pad)))


def expand_parent_meta(vals, offs_pad, pbases, exp_cap, slab=SLAB):
    """vals [NC, MP_pad] (build_vals), offs_pad f32 inclusive offset
    table padded with 2^24, pbases [nb] int32 ALIGN-aligned window bases
    -> [exp_cap, NC] per-slot meta (columns VC_*)."""
    import functools

    nb = -(-exp_cap // CH)
    offs2 = jnp.stack([offs_pad[:-1], offs_pad[1:]], axis=0)
    out = pl.pallas_call(
        functools.partial(_kernel, slab=slab),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # offs2
                pl.BlockSpec(memory_space=pl.ANY),  # vals
            ],
            out_specs=pl.BlockSpec((CH, NC), lambda k, b: (k, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, 2, slab), jnp.float32),
                pltpu.VMEM((2, NC, slab), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nb * CH, NC), jnp.float32),
        interpret=_use_interpret(),
    )(pbases, offs2, vals)
    return out[:exp_cap]


def coverage_windows(offsets, counts, exp_cap, slab=SLAB):
    """Per-chunk parent-window bases + coverage flags.

    Returns (okv [nb] bool, pbases [nb] int32, offs_pad f32). A chunk is
    covered when its aligned parent slab [base, base + slab) reaches past
    every LIVE parent whose run intersects the chunk's slots: required
    coverage is ``min(chunk_start + CH, total)`` — slots at/after
    ``total`` (= n_isect; the static-capacity tail that always exists)
    carry no live parent and are masked downstream, so they never
    constrain the window."""
    MP = offsets.shape[0]
    nb = -(-exp_cap // CH)
    olen = slab + ALIGN
    total = offsets[-1] + counts[-1]
    offs_incl = jnp.concatenate(
        [offsets.astype(jnp.float32),
         total.astype(jnp.float32).reshape(1)])
    pad = (-MP) % ALIGN + olen + 1024
    offs_pad = jnp.concatenate(
        [offs_incl, jnp.full((pad,), float(1 << 24), jnp.float32)])
    chunk_starts = (jnp.arange(nb, dtype=jnp.int32) * CH).astype(
        jnp.float32)
    pb = jnp.searchsorted(offs_incl, chunk_starts, side="right") - 1
    pb = jnp.maximum(pb, 0).astype(jnp.int32)
    pbases = (pb // ALIGN) * ALIGN
    slab_end = jnp.minimum(pbases + slab, MP)
    need = jnp.minimum(chunk_starts + CH, total.astype(jnp.float32))
    okv = offs_pad[slab_end] >= need
    return okv, pbases, offs_pad


def required_slab(offsets, counts, exp_cap, margin: int = 256) -> int:
    """Observed tight slab width: the max, over slot chunks, of the
    ALIGN-aligned parent window a chunk actually needs, + margin, rounded
    to ALIGN. Callers measure this ONCE on a warm-up problem (like
    StreamCaps.choose_observed right-sizes exp_cap) and pass it as
    ``slab=`` to expand_meta_streamed: the kernel's compare + one-hot
    matmul cost per chunk scales with the slab width, and the default
    3072 window is ~8x the live parents a 1024-slot chunk touches on
    bench-like densities. Drift past the observed width trips the
    coverage guard -> XLA fallback (correct, slower), mirroring the
    exp_cap overflow-regrow contract."""
    offsets = np.asarray(offsets)
    counts = np.asarray(counts)
    total = int(offsets[-1]) + int(counts[-1])
    nb = -(-exp_cap // CH)
    offs_incl = np.concatenate([offsets, [total]]).astype(np.int64)
    starts = np.arange(nb, dtype=np.int64) * CH
    pb = np.maximum(
        np.searchsorted(offs_incl, starts, side="right") - 1, 0)
    need = np.minimum(starts + CH, total)
    pe = np.searchsorted(offs_incl, need, side="left")
    width = int(np.max(pe - (pb // ALIGN) * ALIGN)) + margin
    return max(-(-width // ALIGN) * ALIGN, ALIGN)


def expand_meta_streamed(sx0, sy0, span, ka, offsets, depth, counts,
                         exp_cap, force_path=None, slab=SLAB):
    """Drop-in replacement for the XLA expansion + meta gather of
    ops.stream_isect: returns (sx0_s, sy0_s, span_s, ka_s, off_s,
    depth_s, g_of_s) per slot. Falls back to the scatter+gather path via
    ``lax.cond`` when a parent window overflows the kernel's slab (only
    possible with very long zero-count parent runs interleaved between
    live ones). Slots at/after n_isect may differ between the two paths
    (both are masked downstream via slot_ok/sorted_ok); span is clamped
    >= 1 so the modulo decode is always defined.

    ``force_path`` (static; None | 'kernel' | 'xla' | 'cond') bypasses
    the default — tests use 'kernel' to prove the Pallas path itself is
    exact. The DEFAULT is the XLA path: with the r4 coverage-guard bug
    fixed the kernel genuinely runs, but measured in situ on the v5e it
    is ~32 ms SLOWER than the fallback at bench scale (isect build 35.6
    -> 68.0 ms, scripts/stream_profile.py, r5) — the [CH, SLAB]
    one-hot/compare work per chunk scales with the 3072-wide aligned
    parent window, ~8x the live parents a 1024-slot chunk actually
    touches. SPLAT_SEG_BROADCAST=cond restores the guarded kernel for
    experiments."""
    if force_path is None:
        import os

        force_path = os.environ.get("SPLAT_SEG_BROADCAST", "xla")
        # Measured r5 (v5e, bench scale, observed caps): standalone the
        # tight-slab double-buffered kernel beats the XLA expansion
        # (38.7 vs 53.2 ms A/B) — but IN SITU the XLA scatter+gather
        # fuses with the span math and the st-id/sort-key epilogue
        # (isect build 31 ms) while the pallas call is a fusion barrier
        # that materializes [EXP, 16] and re-reads it (isect build
        # 38.9 ms). The XLA path stays the default; the kernel remains
        # force-selectable for tests and future Mosaic fusion work.
    if force_path == "cond":
        force_path = None
    MP = sx0.shape[0]
    okv, pbases, offs_pad = coverage_windows(offsets, counts, exp_cap,
                                             slab=slab)
    ok = jnp.all(okv)

    def kernel_path(_):
        vals = build_vals(sx0, sy0, span, ka, offsets, depth, slab=slab)
        m = expand_parent_meta(vals, offs_pad, pbases, exp_cap,
                               slab=slab)
        ka_s = m[:, VC_KA0] + 256.0 * m[:, VC_KA1]
        off_s = (m[:, VC_OFF0] + 256.0 * m[:, VC_OFF1]
                 + 65536.0 * m[:, VC_OFF2])
        depth_s = (m[:, VC_D0] + m[:, VC_D1]) + m[:, VC_D2]
        p_s = m[:, VC_P0] + 256.0 * m[:, VC_P1] + 65536.0 * m[:, VC_P2]
        return (m[:, VC_SX0].astype(jnp.int32),
                m[:, VC_SY0].astype(jnp.int32),
                jnp.maximum(m[:, VC_SPAN].astype(jnp.int32), 1),
                ka_s.astype(jnp.int32),
                off_s.astype(jnp.int32),
                depth_s,
                jnp.clip(p_s.astype(jnp.int32), 0, MP - 1))

    def xla_path(_):
        buckets = jnp.zeros((exp_cap,), jnp.int32)
        upd = jnp.ones_like(offsets[1:], dtype=jnp.int32)
        buckets = buckets.at[jnp.clip(offsets[1:], 0, exp_cap - 1)].add(
            jnp.where(offsets[1:] < exp_cap, upd, 0))
        g_of_s = jnp.cumsum(buckets)
        meta = jnp.stack(
            [
                sx0.astype(jnp.float32), sy0.astype(jnp.float32),
                span.astype(jnp.float32), ka.astype(jnp.float32),
                offsets.astype(jnp.float32), depth,
                jnp.zeros((MP,), jnp.float32),
                jnp.zeros((MP,), jnp.float32),
            ],
            axis=1,
        )
        m = meta[g_of_s]
        return (m[:, 0].astype(jnp.int32), m[:, 1].astype(jnp.int32),
                jnp.maximum(m[:, 2].astype(jnp.int32), 1),
                m[:, 3].astype(jnp.int32),
                m[:, 4].astype(jnp.int32), m[:, 5], g_of_s)

    if force_path == "kernel":
        return kernel_path(None)
    if force_path == "xla":
        return xla_path(None)
    return jax.lax.cond(ok, kernel_path, xla_path, operand=None)
