"""Fine-grained glue profile of the stream-isect build at bench shapes.

The r4/r5 stage profile shows the step is ~75% glue (isect build, pack,
grad reduce) and only ~25% Pallas kernels. This script times each glue
SUB-stage separately on the TPU, plus candidate replacements, so perf
work targets measured costs instead of estimates:

  isect build  = spans/counts/cumsum + expansion (scatter+cumsum) +
                 meta gather [EXP, 8] + st-id math + (st, depth) sort +
                 searchsorted/align
  pack         = row gather [EXP, NF] + transpose
  reduce glue  = slice/stack/pad around the reduce sort

Candidates timed alongside: fused single-key sort (st_id in the exponent
bits of a positive f32 + quantized depth), 2-array vs 3-array sorts, and
gather at observed-cap row counts.

Run: PYTHONPATH=.:/root/.axon_site python scripts/glue_profile.py
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from splat_one_tpu.ops import stream_isect as si_mod
from splat_one_tpu.ops.projection import project_gaussians, \
    conic_ellipse_radii
from splat_one_tpu.ops.stream_isect import StreamCaps

N_GAUSS = 1_000_000
W, H = 1280, 720
ITERS = 10
TS = 16


def timeit(name, fn, *args):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    t0 = time.time()
    jax.block_until_ready(f(*args))
    dt = (time.time() - t0 - 0.028) / ITERS * 1000
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return dt


def loop(body):
    def fn(*args):
        def step(i, c):
            return body(*args, c)
        return jax.lax.fori_loop(0, ITERS, step, jnp.float32(0))
    return fn


def main():
    rng = np.random.default_rng(0)
    means = rng.uniform(-1, 1, (N_GAUSS, 3)).astype(np.float32)
    means[:, 2] += 4
    quats = rng.normal(size=(N_GAUSS, 4)).astype(np.float32)
    scales = (np.exp(rng.uniform(-6.5, -5.0, (N_GAUSS, 3))) * 3).astype(
        np.float32)
    opac = rng.uniform(0.3, 1.0, N_GAUSS).astype(np.float32)
    viewmats = jnp.asarray(np.eye(4, dtype=np.float32)[None])
    Ks = jnp.asarray(np.array(
        [[[1000.0, 0, W / 2], [0, 1000.0, H / 2], [0, 0, 1]]], np.float32))
    colors = rng.uniform(size=(N_GAUSS, 3)).astype(np.float32)

    proj = jax.jit(lambda m, q, s, o, c: project_gaussians(
        m, q, s, o, viewmats, Ks, W, H, colors=c))(
        *(jnp.asarray(x) for x in (means, quats, scales, opac, colors)))
    jax.block_until_ready(proj)

    tw, th, sw, sh = si_mod.supertile_grid(W, H, TS, 2)
    NS = sw * sh
    caps0 = StreamCaps.choose(N_GAUSS, 1, NS,
                              avg_supertiles_per_gaussian=4.0)
    n0 = int(si_mod.build_stream_intersections(proj, W, H, TS, caps0)
             .n_isect)
    caps = StreamCaps.choose_observed(n0, NS)
    EXP = caps.exp_cap
    print(f"n_isect={n0} observed exp_cap={EXP} supertiles={NS}",
          flush=True)

    # ---- recompute the builder's intermediates once (host of the stages)
    sps = TS * 2
    M0 = N_GAUSS
    u = proj.means2d[..., 0].reshape(M0)
    v = proj.means2d[..., 1].reshape(M0)
    con = proj.conics.reshape(M0, 3)
    rx, ry = conic_ellipse_radii(con[:, 0], con[:, 1], con[:, 2])
    valid = proj.valid.reshape(M0)
    sy0 = jnp.clip(jnp.floor((v - ry) / sps), 0, sh).astype(jnp.int32)
    sy1 = jnp.clip(jnp.ceil((v + ry) / sps), 0, sh).astype(jnp.int32)
    sx0 = jnp.clip(jnp.floor((u - rx) / sps), 0, sw).astype(jnp.int32)
    sx1 = jnp.clip(jnp.ceil((u + rx) / sps), 0, sw).astype(jnp.int32)
    span_x = jnp.where(valid, jnp.maximum(sx1 - sx0, 0), 0)
    span_y = jnp.where(valid, jnp.maximum(sy1 - sy0, 0), 0)
    counts = (span_x * span_y).astype(jnp.int32)
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])
    depth_par = proj.depths.reshape(M0)
    span_c = jnp.maximum(span_x, 1)

    def spans_fn(proj, c):
        con = proj.conics.reshape(M0, 3) + c * 1e-30
        rx, ry = conic_ellipse_radii(con[:, 0], con[:, 1], con[:, 2])
        s0 = jnp.clip(jnp.floor((u - rx) / sps), 0, sw).astype(jnp.int32)
        s1 = jnp.clip(jnp.ceil((u + rx) / sps), 0, sw).astype(jnp.int32)
        t0_ = jnp.clip(jnp.floor((v - ry) / sps), 0, sh).astype(jnp.int32)
        t1 = jnp.clip(jnp.ceil((v + ry) / sps), 0, sh).astype(jnp.int32)
        cnt = (jnp.maximum(s1 - s0, 0) * jnp.maximum(t1 - t0_, 0))
        offs = jnp.cumsum(cnt)
        return c + offs[-1].astype(jnp.float32) * 1e-12

    timeit("spans+counts+cumsum [1M]", loop(spans_fn), proj)

    def expand_fn(offsets, c):
        offs = offsets + (c * 1e-30).astype(jnp.int32)
        g = si_mod._expand_index(offs, EXP)
        return c + g[-1].astype(jnp.float32) * 1e-12

    timeit("expansion scatter+cumsum -> g_of_s", loop(expand_fn), offsets)

    g_of_s = jax.jit(lambda o: si_mod._expand_index(o, EXP))(offsets)
    jax.block_until_ready(g_of_s)

    def meta_gather_fn(g_of_s, c):
        meta = jnp.stack(
            [sx0.astype(jnp.float32), sy0.astype(jnp.float32),
             span_c.astype(jnp.float32), offsets.astype(jnp.float32),
             depth_par, depth_par, depth_par, depth_par], axis=1)
        m = meta[jnp.minimum(g_of_s + (c * 1e-30).astype(jnp.int32),
                             M0 - 1)]
        return c + jnp.sum(m[:, 0]) * 1e-12

    timeit("meta gather [EXP, 8]", loop(meta_gather_fn), g_of_s)

    # per-slot meta (as the builder computes it)
    meta = jnp.stack(
        [sx0.astype(jnp.float32), sy0.astype(jnp.float32),
         span_c.astype(jnp.float32), offsets.astype(jnp.float32),
         depth_par], axis=1)
    m = meta[jnp.minimum(g_of_s, M0 - 1)]
    sx0_s = m[:, 0].astype(jnp.int32)
    sy0_s = m[:, 1].astype(jnp.int32)
    span_s = jnp.maximum(m[:, 2].astype(jnp.int32), 1)
    off_s = m[:, 3].astype(jnp.int32)
    depth_s = m[:, 4]
    slot_ids = jnp.arange(EXP, dtype=jnp.int32)
    n_isect = offsets[-1] + counts[-1]
    slot_ok = slot_ids < jnp.minimum(n_isect, EXP)
    local = slot_ids - off_s
    lx = local % span_s
    ly = local // span_s
    st_id0 = (sy0_s + ly) * sw + (sx0_s + lx)
    st_id = jnp.where(slot_ok, st_id0, NS).astype(jnp.int32)
    st_id, depth_s, g_of_s = jax.block_until_ready(
        (st_id, depth_s, g_of_s))

    def stmath_fn(depth_sx, c):
        d = depth_sx + c * 1e-30
        local = slot_ids - off_s
        lx = local % span_s
        ly = local // span_s
        sid = jnp.where(slot_ok, (sy0_s + ly) * sw + (sx0_s + lx), NS)
        return c + jnp.sum(sid).astype(jnp.float32) * 1e-12 + d[0] * 0

    timeit("st-id math (mod/div + where)", loop(stmath_fn), depth_s)

    def sort3_fn(st_id, depth_sx, g, c):
        s, d, gg = jax.lax.sort(
            [st_id + (c * 1e-30).astype(jnp.int32), depth_sx, g],
            is_stable=True, num_keys=2)
        return c + jnp.sum(gg).astype(jnp.float32) * 1e-12

    timeit("2-key stable sort [st,d,g] @EXP", loop(sort3_fn),
           st_id, depth_s, g_of_s)

    # fused single key: positive f32 depths order like their int bits;
    # pack st_id into the HIGH bits above a 22-bit depth rank
    def sortf_fn(st_id, depth_sx, g, c):
        d = depth_sx + c * 1e-30
        db = jax.lax.bitcast_convert_type(d, jnp.uint32) >> 10
        key = (st_id.astype(jnp.uint32) << 22 | db).astype(jnp.int32)
        k2, gg = jax.lax.sort([key, g], is_stable=True, num_keys=1)
        return c + jnp.sum(gg).astype(jnp.float32) * 1e-12

    timeit("fused 1-key stable sort [key,g] @EXP", loop(sortf_fn),
           st_id, depth_s, g_of_s)

    def sortf_unstable_fn(st_id, depth_sx, g, c):
        d = depth_sx + c * 1e-30
        db = jax.lax.bitcast_convert_type(d, jnp.uint32) >> 10
        key = (st_id.astype(jnp.uint32) << 22 | db).astype(jnp.int32)
        k2, gg = jax.lax.sort([key, g], is_stable=False, num_keys=1)
        return c + jnp.sum(gg).astype(jnp.float32) * 1e-12

    timeit("fused 1-key UNstable sort [key,g] @EXP", loop(sortf_unstable_fn),
           st_id, depth_s, g_of_s)

    # exact 2-pass radix equivalent of the stable 2-key sort (depth is
    # discarded after the sort, so pass 2 needs only [st, g])
    def sort2pass_fn(st_id, depth_sx, g, c):
        d = depth_sx + c * 1e-30
        _, s1, g1 = jax.lax.sort([d, st_id, g], is_stable=True,
                                 num_keys=1)
        s2, g2 = jax.lax.sort([s1, g1], is_stable=True, num_keys=1)
        return c + jnp.sum(g2).astype(jnp.float32) * 1e-12

    timeit("2-pass stable sorts (exact)", loop(sort2pass_fn),
           st_id, depth_s, g_of_s)

    def searchsorted_fn(st_sorted, c):
        s = st_sorted + (c * 1e-30).astype(jnp.int32)
        bounds = jnp.searchsorted(
            s, jnp.arange(NS + 1, dtype=jnp.int32), side="left")
        return c + jnp.sum(bounds).astype(jnp.float32) * 1e-12

    st_sorted = jnp.sort(st_id)
    timeit("searchsorted [NS+1] + align cumsum", loop(searchsorted_fn),
           st_sorted)

    # ---- pack: gather vs gather+transpose
    fields = si_mod.build_fields(proj)
    sorted_g = jnp.where(
        slot_ok, jnp.sort(g_of_s), M0).astype(jnp.int32)
    sorted_g = jax.block_until_ready(sorted_g)

    def pack_gather_fn(fields, c):
        fp = jnp.concatenate(
            [fields + c * 1e-30, jnp.zeros((1, si_mod.NF), fields.dtype)],
            axis=0)
        packed = fp[jnp.minimum(sorted_g, M0)]
        return c + jnp.sum(packed[:, 0]) * 1e-12

    timeit("pack row gather [EXP,16] (no T)", loop(pack_gather_fn), fields)

    def pack_gather_t_fn(fields, c):
        fp = jnp.concatenate(
            [fields + c * 1e-30, jnp.zeros((1, si_mod.NF), fields.dtype)],
            axis=0)
        packed = fp[jnp.minimum(sorted_g, M0)].T
        return c + jnp.sum(packed[0, :]) * 1e-12

    timeit("pack row gather + T", loop(pack_gather_t_fn), fields)

    def pack_pret_fn(fields_t, c):
        # gather along axis 1 from a pre-transposed [NF, M0] table
        ft = fields_t + c * 1e-30
        packed = ft[:, jnp.minimum(sorted_g, M0 - 1)]
        return c + jnp.sum(packed[0, :]) * 1e-12

    fields_t = jax.block_until_ready(fields.T.copy())
    timeit("pack axis-1 gather from [NF, M0]", loop(pack_pret_fn), fields_t)

    # ---- reduce glue: the stack/pad dance around the reduce sort
    rng2 = np.random.default_rng(1)
    PC = caps.pad_cap
    pg = jnp.asarray(rng2.normal(size=(si_mod.NF, PC)).astype(np.float32))
    pg = jax.block_until_ready(pg)

    def red_glue_fn(pg, c):
        p = pg + c * 1e-12
        parts = jax.lax.sort(
            [p[si_mod.PCOL_KEY]] + [p[i] for i in range(5)],
            is_stable=False, num_keys=1)
        rows = jnp.stack(list(parts[1:]) + [parts[0]], axis=0)
        rows = jnp.pad(rows, ((0, 0), (0, 512)))
        return c + jnp.sum(rows[0]) * 1e-12

    timeit("reduce sort + stack + pad @pad_cap", loop(red_glue_fn), pg)

    def red_sort_only_fn(pg, c):
        p = pg + c * 1e-12
        parts = jax.lax.sort(
            [p[si_mod.PCOL_KEY]] + [p[i] for i in range(5)],
            is_stable=False, num_keys=1)
        return c + jnp.sum(parts[1]) * 1e-12

    timeit("reduce sort only @pad_cap", loop(red_sort_only_fn), pg)


if __name__ == "__main__":
    main()
