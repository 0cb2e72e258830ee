"""Sub-step timing of the reduce path (sort / bounds / segreduce kernel) at
bench shapes, on TPU. Uses the same real pgrads tensor + scalar-carry loop
pattern as stream_profile.py (which is known to escape tunnel memoization)."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from splat_one_tpu.ops import seg_reduce
from splat_one_tpu.ops import stream_isect as si_mod
from splat_one_tpu.ops import stream_raster
from splat_one_tpu.ops.projection import project_gaussians
from splat_one_tpu.ops.stream_isect import GCOL_KEY, N_GCOLS, StreamCaps
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
    sh = (rng.normal(size=(N_GAUSS, 16, 3)) * 0.3).astype(np.float32)
    viewmats = jnp.asarray(np.eye(4, dtype=np.float32)[None])
    Ks = jnp.asarray(np.array(
        [[[1000.0, 0, W / 2], [0, 1000.0, H / 2], [0, 0, 1]]], np.float32))
    args = tuple(jnp.asarray(x) for x in (means, quats, scales, opac, sh))

    _, _, sw, sh_ = si_mod.supertile_grid(W, H, 16)
    caps = StreamCaps.choose(N_GAUSS, 1, sw * sh_,
                             avg_supertiles_per_gaussian=3.0)
    cfg = StreamCfg.from_caps(caps, W, H, 16, 1, N_GAUSS)

    proj = jax.jit(lambda m, q, s, o, sh_c: project_gaussians(
        m, q, s, o, viewmats, Ks, W, H, sh_coeffs=sh_c, sh_degree=3))(*args)
    isect = jax.jit(lambda p: si_mod.build_stream_intersections(
        p, W, H, 16, caps))(proj)
    fields = si_mod.build_fields(proj)
    packed = jax.jit(lambda f: si_mod.pack_stream(f, isect, caps).T)(fields)
    fwd_out = jax.jit(lambda p: stream_raster._fwd_call(
        cfg, isect.st_starts, p))(packed)
    gout = jnp.ones_like(fwd_out)
    pgrads = jax.jit(lambda p: stream_raster._bwd_call(
        cfg, isect.st_starts, isect.st_starts_al, p, fwd_out, gout))(packed)
    jax.block_until_ready(pgrads)
    print(f"pgrads {pgrads.shape}")

    import os
    full_prof = os.environ.get("RED_FULL", "0") == "1"

    def sort_fn(pg, c):
        parts = jax.lax.sort(
            [pg[GCOL_KEY] + c * 1e-30] + [pg[i] for i in range(N_GCOLS)],
            is_stable=False, num_keys=1)
        return c + parts[0][0] * 1e-30 + parts[5][1] * 1e-30

    if full_prof:
        timeit("sort 1 key + 12 payloads", loop(sort_fn), pgrads)

    def sortkey_fn(pg, c):
        parts = jax.lax.sort([pg[GCOL_KEY] + c * 1e-30], is_stable=False,
                             num_keys=1)
        return c + parts[0][0] * 1e-30

    if full_prof:
        timeit("sort key only", loop(sortkey_fn), pgrads)

    def bounds_fn(pg, c):
        parts = jax.lax.sort(
            [pg[GCOL_KEY] + c * 1e-30] + [pg[i] for i in range(N_GCOLS)],
            is_stable=False, num_keys=1)
        rows = jnp.stack(list(parts[1:]) + [parts[0]], axis=0)
        rows = jnp.pad(rows, ((0, 0), (0, seg_reduce.CH)))
        nb = -(-N_GAUSS // seg_reduce.R)
        q = (jnp.arange(nb + 1, dtype=jnp.int32) * seg_reduce.R
             ).astype(jnp.float32) + 1.0
        b = jnp.searchsorted(parts[0], q, side="left").astype(jnp.int32)
        return c + rows[0, 0] * 1e-30 + b[0].astype(jnp.float32) * 1e-30

    if full_prof:
        timeit("sort + stack + searchsorted", loop(bounds_fn), pgrads)

    def full_fn(pg, c):
        out = si_mod.reduce_stream_grads(pg + c * 1e-30, N_GAUSS)
        return c + out[0, 0] * 1e-30

    if full_prof:
        timeit("full reduce", loop(full_fn), pgrads)

    # kernel-only on the real sorted rows/bounds
    parts = jax.jit(lambda pg: jax.lax.sort(
        [pg[GCOL_KEY]] + [pg[i] for i in range(N_GCOLS)],
        is_stable=False, num_keys=1))(pgrads)
    rows = jnp.stack(list(parts[1:]) + [parts[0]], axis=0)
    rows = jnp.pad(rows, ((0, 0), (0, seg_reduce.CH)))
    nb = -(-N_GAUSS // seg_reduce.R)
    q = (jnp.arange(nb + 1, dtype=jnp.int32) * seg_reduce.R
         ).astype(jnp.float32) + 1.0
    bounds = jnp.searchsorted(parts[0], q, side="left").astype(jnp.int32)
    rows, bounds = jax.device_put(rows), jax.device_put(bounds)
    jax.block_until_ready((rows, bounds))
    spans = np.diff(np.asarray(bounds))
    print(f"blocks={nb} span avg={spans.mean():.0f} max={spans.max()} "
          f"chunks_total={int(np.ceil(spans / seg_reduce.CH).sum())}")

    def seg_fn(rows, bounds, c):
        out = seg_reduce.segment_reduce_sorted(
            rows + c * 1e-30, bounds, N_GAUSS)
        return c + out[0, 0] * 1e-30

    timeit("segreduce kernel only (real data)", loop(seg_fn), rows, bounds)

    def stack_sum_fn(*parts_c):
        *ps, c = parts_c
        rws = jnp.stack([p + c * 1e-30 for p in ps[1:]] + [ps[0]], axis=0)
        rws = jnp.pad(rws, ((0, 0), (0, seg_reduce.CH)))
        return c + jnp.sum(rws) * 1e-30

    timeit("stack+pad, fully consumed", loop(stack_sum_fn), *parts)

    def fromsorted_fn(*parts_c):
        *ps, c = parts_c
        rws = jnp.stack([p + c * 1e-30 for p in ps[1:]] + [ps[0]], axis=0)
        rws = jnp.pad(rws, ((0, 0), (0, seg_reduce.CH)))
        b = jnp.searchsorted(ps[0], q, side="left").astype(jnp.int32)
        out = seg_reduce.segment_reduce_sorted(rws, b, N_GAUSS)
        return c + out[0, 0] * 1e-30

    timeit("stack+ss+kernel (presorted)", loop(fromsorted_fn), *parts)

    def sortfull_fn(pg, c):
        ps = jax.lax.sort(
            [pg[GCOL_KEY] + c * 1e-30] + [pg[i] for i in range(N_GCOLS)],
            is_stable=False, num_keys=1)
        return c + sum(jnp.sum(p) for p in ps) * 1e-30

    timeit("sort, all outputs consumed", loop(sortfull_fn), pgrads)


if __name__ == "__main__":
    main()
