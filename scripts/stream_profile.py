"""Stage-by-stage timing of the stream rasterizer at bench shapes (TPU).

Each stage is jit-looped ITERS times on device (one host sync per stage).
"""

import os
import time
SS_ENV = int(os.environ.get("SPLAT_SS", "2"))

import numpy as np
import jax
import jax.numpy as jnp

from splat_one_tpu.ops import stream_isect as si_mod
from splat_one_tpu.ops import stream_raster
from splat_one_tpu.ops.projection import project_gaussians
from splat_one_tpu.ops.stream_isect import StreamCaps
from splat_one_tpu.ops.stream_raster import StreamCfg

N_GAUSS = 1_000_000
W, H = 1280, 720
ITERS = 10


def timeit(name, fn, *args):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    t0 = time.time()
    jax.block_until_ready(f(*args))
    dt = (time.time() - t0 - 0.028) / ITERS * 1000
    print(f"{name:40s} {dt:8.2f} ms")
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
    sh = (rng.normal(size=(N_GAUSS, 16, 3)) * 0.3).astype(np.float32)
    viewmats = jnp.asarray(np.eye(4, dtype=np.float32)[None])
    Ks = jnp.asarray(np.array(
        [[[1000.0, 0, W / 2], [0, 1000.0, H / 2], [0, 0, 1]]], np.float32))
    args = tuple(jnp.asarray(x) for x in (means, quats, scales, opac, sh))

    _, _, sw, sh_ = si_mod.supertile_grid(W, H, 16, SS_ENV)
    caps = StreamCaps.choose(N_GAUSS, 1, sw * sh_,
                             avg_supertiles_per_gaussian=3.0, ss=SS_ENV)
    if os.environ.get("SPLAT_OBSERVED_CAPS", "1") == "1":
        # same warm-up right-sizing bench.py does (exp_cap + sb_slab)
        proj_w = jax.jit(lambda m, q, s, o: project_gaussians(
            m, q, s, o, viewmats, Ks, W, H,
            colors=jnp.zeros((N_GAUSS, 3), jnp.float32)))(*args[:4])
        n_w = int(si_mod.build_stream_intersections(
            proj_w, W, H, 16, caps).n_isect)
        sb = si_mod.observed_sb_slab(proj_w, W, H, 16, caps)
        caps = StreamCaps.choose_observed(n_w, sw * sh_, ss=SS_ENV,
                                          sb_slab=sb)
        print(f"observed caps: exp_cap={caps.exp_cap} sb_slab={sb}",
              flush=True)
    cfg = StreamCfg.from_caps(caps, W, H, 16, 1, N_GAUSS)

    def proj_fn(means, quats, scales, opac, sh, c):
        p = project_gaussians(
            means + c * 1e-30, quats, scales, opac, viewmats, Ks, W, H,
            sh_coeffs=sh, sh_degree=3)
        return c + jnp.sum(p.depths) * 1e-12

    timeit("projection fwd (sh3)", loop(proj_fn), *args)

    proj = jax.jit(lambda m, q, s, o, sh_c: project_gaussians(
        m, q, s, o, viewmats, Ks, W, H, sh_coeffs=sh_c, sh_degree=3))(*args)
    jax.block_until_ready(proj)
    n_isect = int(si_mod.build_stream_intersections(
        proj, W, H, 16, caps).n_isect)
    print(f"n_isect={n_isect} exp_cap={caps.exp_cap} "
          f"supertiles={caps.n_supertiles}")

    def isect_fn(proj, c):
        p = proj._replace(depths=proj.depths + c * 1e-30)
        i = si_mod.build_stream_intersections(p, W, H, 16, caps)
        return c + jnp.sum(i.sorted_g).astype(jnp.float32) * 1e-12

    timeit("stream isect build (sort etc)", loop(isect_fn), proj)

    isect = jax.jit(lambda p: si_mod.build_stream_intersections(
        p, W, H, 16, caps))(proj)
    jax.block_until_ready(isect)

    def pack_fn(proj, isect, c):
        fields = si_mod.build_fields(proj)
        packed = si_mod.pack_stream(
            fields + c * 1e-30, isect, caps).T
        return c + jnp.sum(packed[:, 0]) * 1e-12

    timeit("pack gather + T", loop(pack_fn), proj, isect)

    fields = si_mod.build_fields(proj)
    packed = jax.jit(lambda f: si_mod.pack_stream(f, isect, caps).T)(fields)
    jax.block_until_ready(packed)

    def fwd_fn(packed, c):
        out = stream_raster._fwd_call(cfg, isect.st_starts,
                                      packed + c * 1e-30)
        return c + jnp.sum(out[:, 0, 0, 0]) * 1e-12

    timeit("fwd kernel", loop(fwd_fn), packed)

    fwd_out = jax.jit(lambda p: stream_raster._fwd_call(
        cfg, isect.st_starts, p))(packed)
    jax.block_until_ready(fwd_out)
    gout = jnp.ones_like(fwd_out)

    def bwd_fn(packed, c):
        pg = stream_raster._bwd_call(cfg, isect.st_starts,
                                     isect.st_starts_al,
                                     packed + c * 1e-30, fwd_out, gout)
        return c + jnp.sum(pg[0]) * 1e-12

    timeit("bwd kernel", loop(bwd_fn), packed)

    pgrads = jax.jit(lambda p: stream_raster._bwd_call(
        cfg, isect.st_starts, isect.st_starts_al, p, fwd_out, gout))(packed)
    jax.block_until_ready(pgrads)

    def red_fn(pgrads, c):
        seg = si_mod.reduce_stream_grads(pgrads + c * 1e-12, N_GAUSS, packed=stream_raster._use_packed_grads())
        return c + jnp.sum(seg[0]) * 1e-12

    timeit("bwd reduction (sort+segreduce)", loop(red_fn), pgrads)

    def sort_fn(pgrads, c):
        pg = pgrads + c * 1e-12
        parts = jax.lax.sort(
            [pg[si_mod.PCOL_KEY]] + [pg[i] for i in range(5)],
            is_stable=False, num_keys=1)
        return c + jnp.sum(parts[1]) * 1e-12

    timeit("  sort only (packed: 5 payloads)", loop(sort_fn), pgrads)

    from splat_one_tpu.ops import seg_reduce
    n_pk = 5 if stream_raster._use_packed_grads() else 10
    key_row = (si_mod.PCOL_KEY if stream_raster._use_packed_grads()
               else si_mod.GCOL_KEY)
    parts = jax.lax.sort(
        [pgrads[key_row]] + [pgrads[i] for i in range(n_pk)],
        is_stable=False, num_keys=1)
    rows = jnp.stack(list(parts[1:]) + [parts[0]], axis=0)
    rows = jnp.pad(rows, ((0, 0), (0, seg_reduce.CH)))
    nb = -(-N_GAUSS // seg_reduce.R)
    queries = (jnp.arange(nb + 1, dtype=jnp.int32) * seg_reduce.R
               ).astype(jnp.float32) + 1.0
    bounds = jnp.searchsorted(parts[0], queries, side="left").astype(
        jnp.int32)
    rows, bounds = jax.block_until_ready((rows, bounds))

    def seg_fn(rows, bounds, c):
        out = seg_reduce.segment_reduce_sorted(
            rows + c * 1e-12, bounds, N_GAUSS,
            unpack=stream_raster._use_packed_grads())
        return c + jnp.sum(out[0]) * 1e-12

    timeit("  segreduce kernel only", loop(seg_fn), rows, bounds)


if __name__ == "__main__":
    main()
