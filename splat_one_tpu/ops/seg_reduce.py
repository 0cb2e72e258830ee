"""Pallas segmented reduce-by-key: per-slot gradient rows -> per-gaussian.

TPU-native replacement for the per-gaussian gradient accumulation gsplat's
CUDA backward does with atomicAdd (reference surface: the backward of
``gsplat.rendering.rasterization``, gsplat_trainer.py:477-494). Scatter-add
is pathologically slow in XLA-TPU (measured ~235 ms at 2.7M rows) and even
the sort+cumsum+bounds-gather formulation pays ~60 ms in row-rate-bound
gathers (gather cost ~= 4.6 ns/output-row + 6.3 ns/SOURCE-row, measured);
this kernel reduces KEY-SORTED rows with zero gathers:

  - Input: ``rows [NR, cap]`` (row-major fields x slots) sorted by a key row
    holding ``gaussian_id + 1`` as f32 (0 = dead slot, sorted to the front).
  - Grid over blocks of R=512 output gaussians. Block k owns the slot range
    ``[bounds[k], bounds[k+1])`` (host-side searchsorted of the sorted key
    row), streamed in lane-aligned chunks of CH=1024.
  - Per chunk, a one-hot [R, CH] matrix (exact in bf16) maps slots to block
    rows: ``accT[R, nr] += onehot[R, CH] @ rows_chunk[nr, CH]^T`` on the
    MXU. The orientation matters an 8x: with the one-hot on the LEFT the
    MXU M dimension is R (fully tiled) and the streamed N dimension is the
    row count (~12-16); the naive ``rows @ onehot`` form instead pads M=12
    up to the 128-row array (~90% idle) while streaming N=R=2048 columns.
    The f32 chunk is split hi/lo bf16 operands (16 mantissa bits), so the
    products are exact and only the f32 accumulation rounds.
  - Slots outside the block's gaussian range have one-hot zero everywhere —
    chunk over-reads at 128-aligned bases need no explicit masking.
  - Output block k is the lane-aligned slab ``out[:, k*R:(k+1)*R]`` — no
    write races, no carry between programs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 2048  # output gaussians per block
CH = 1024  # slots per chunk
NBUF = 4
# bf16 mantissa splits of the data operand: 2 -> ~16-bit-exact products,
# 3 -> exact f32 products (the one-hot operand is exact in bf16 already).
# Measured on TPU (r2): NSPLIT=3 costs ~2% end-to-end and does NOT move
# the stream-vs-tiled grad parity residual (~7e-4 rel) — that error comes
# from suffix-cancellation of the forward kernel's split-bf16 color
# accumulations (see scripts/stream_parity.py), not from this reduction.
NSPLIT = 2


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _split(x, n=NSPLIT):
    """f32 -> n bf16 parts with x ~= sum(parts) to n*8 mantissa bits (each
    residual subtraction is exact, so 3 parts reproduce f32 exactly)."""
    parts = []
    for _ in range(n - 1):
        p = x.astype(jnp.bfloat16)
        parts.append(p)
        x = x - p.astype(jnp.float32)
    parts.append(x.astype(jnp.bfloat16))
    return parts


def _kernel(nrows: int, nrp: int, unpack: bool, bounds_ref, rows_ref,
            out_ref, buf, sems, acc):
    k = pl.program_id(0)
    b0 = bounds_ref[k]
    b1 = bounds_ref[k + 1]
    base = pl.multiple_of((b0 // CH) * CH, CH)
    nchunks = pl.cdiv(b1 - base, CH)
    n_out = 2 * nrows if unpack else nrows
    acc[...] = jnp.zeros((R, n_out), jnp.float32)

    def get_dma(slot, c):
        return pltpu.make_async_copy(
            rows_ref.at[:, pl.ds(pl.multiple_of(base + c * CH, CH), CH)],
            buf.at[slot],
            sems.at[slot],
        )

    for w in range(NBUF - 1):
        @pl.when(w < nchunks)
        def _(w=w):
            get_dma(w % NBUF, w).start()

    def body(c, _):
        @pl.when(c + NBUF - 1 < nchunks)
        def _():
            get_dma((c + NBUF - 1) % NBUF, c + NBUF - 1).start()

        get_dma(c % NBUF, c).wait()
        chunk = buf[c % NBUF]  # [nrp, CH]; row nrows = key
        keys = chunk[nrows:nrows + 1, :]  # [1, CH] f32 (gid + 1, exact int)
        local = keys.astype(jnp.int32) - (1 + k * R)  # [1, CH]
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (R, CH), 0)
        oh = (local == rows_i).astype(jnp.bfloat16)  # [R, CH], exact
        g = chunk[:nrows, :]
        if unpack:
            # rows are bf16x2-packed u32 words (hi = GCOL 2i, lo = 2i+1):
            # unpack to f32 — both halves are exactly bf16-representable,
            # so ONE bf16 matmul pass is exact (vs NSPLIT passes for f32)
            u = jax.lax.bitcast_convert_type(g, jnp.uint32)
            hi = jax.lax.bitcast_convert_type(
                u & jnp.uint32(0xFFFF0000), jnp.float32)
            lo = jax.lax.bitcast_convert_type(u << 16, jnp.float32)
            g2 = jnp.concatenate([hi, lo], axis=0)  # [2*nrows, CH]
            acc[...] += jax.lax.dot_general(
                oh, g2.astype(jnp.bfloat16), ((((1,), (1,))), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return 0
        for part in _split(g):
            # accT[R, nr] += oh[R, CH] . part[nr, CH]^T — one-hot on the
            # LEFT so the MXU M dim is R (see module docstring)
            acc[...] += jax.lax.dot_general(
                oh, part, ((((1,), (1,))), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)
    out_ref[...] = acc[...].T


def segment_reduce_rows(parts, bounds: jax.Array, num_out: int,
                        unpack: bool = False) -> jax.Array:
    """Reduce key-sorted rows to ``[NR, num_out_padded]`` per-gaussian
    sums. ``parts = (payload_0 .. payload_{NR-1}, key)`` — each a [cap]
    f32 array with cap a MULTIPLE OF CH (StreamCaps.pad_cap guarantees
    it; saves the +CH pad copy of the old stacked entry). The rows are
    stacked into the kernel's [nrp, cap] chunk-DMA layout here — one
    XLA concatenate; a variadic per-row-DMA kernel was tried and
    rejected (single-sublane VMEM DMA destinations don't tile on
    Mosaic). key = gid+1 f32, 0 = dead slot. ``bounds [NB+1]`` are the
    slot ranges per R-gaussian block; caller slices ``[:, :num_out]``.
    With ``unpack``, each payload row holds bf16x2-packed pairs and the
    output has ``2*NR`` rows ordered (hi0..hi_{NR-1}, lo0..lo_{NR-1})."""
    nr = len(parts) - 1
    assert parts[0].shape[0] % CH == 0, "cap must be a multiple of CH"
    nrp = -(-(nr + 1) // 8) * 8
    # ONE concatenate builds the sublane-aligned stack (stack-then-pad
    # would copy the 80 MB table twice)
    zeros = [jnp.zeros_like(parts[0])] * (nrp - nr - 1)
    rows = jnp.stack(list(parts) + zeros, axis=0)
    return _segment_reduce_stacked(rows, bounds, num_out, unpack=unpack,
                                   nr=nr)


def _segment_reduce_stacked(rows, bounds, num_out, unpack=False, nr=None):
    if nr is None:
        nr = rows.shape[0] - 1
    nrp = -(-(nr + 1) // 8) * 8  # sublane-aligned row count for chunk DMAs
    if rows.shape[0] < nrp:
        rows = jnp.pad(rows, ((0, nrp - rows.shape[0]), (0, 0)))
    nb = -(-num_out // R)
    n_out = 2 * nr if unpack else nr
    kernel = functools.partial(_kernel, nr, nrp, unpack)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((n_out, R), lambda k, b: (0, k),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((NBUF, nrp, CH), jnp.float32),
                pltpu.SemaphoreType.DMA((NBUF,)),
                pltpu.VMEM((R, n_out), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_out, nb * R), jnp.float32),
        interpret=_use_interpret(),
    )(bounds, rows)


def segment_reduce_sorted(rows: jax.Array, bounds: jax.Array,
                          num_out: int, unpack: bool = False) -> jax.Array:
    """Stacked-layout entry: rows [NR+1, cap] with the key LAST; cap is
    padded up to a CH multiple here (legacy A/B-script entry)."""
    cap = rows.shape[1]
    pad = (-cap) % CH
    if pad:
        rows = jnp.pad(rows, ((0, 0), (0, pad)))
    return _segment_reduce_stacked(rows, bounds, num_out, unpack=unpack)
