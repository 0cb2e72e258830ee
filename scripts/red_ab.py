"""A/B variants of the grad-reduce composition on TPU.

The r3 profile showed sort(5.1ms) + stack+searchsorted+kernel(7.7ms) but
40.5ms when composed in ONE jit — something pathological in how XLA
schedules/rematerializes the sort feeding the Pallas call. Try barriers and
alternative compositions.
"""

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
    print(f"pgrads {pgrads.shape} n_isect={int(isect.n_isect)}")

    nb = -(-N_GAUSS // seg_reduce.R)
    q = (jnp.arange(nb + 1, dtype=jnp.int32) * seg_reduce.R
         ).astype(jnp.float32) + 1.0

    def reduce_from_parts(parts):
        rows = jnp.stack(list(parts[1:]) + [parts[0]], axis=0)
        rows = jnp.pad(rows, ((0, 0), (0, seg_reduce.CH)))
        b = jnp.searchsorted(parts[0], q, side="left").astype(jnp.int32)
        return seg_reduce.segment_reduce_sorted(rows, b, N_GAUSS)

    def full_base(pg, c):
        parts = jax.lax.sort(
            [pg[GCOL_KEY] + c * 1e-30] + [pg[i] for i in range(N_GCOLS)],
            is_stable=False, num_keys=1)
        out = reduce_from_parts(parts)
        return c + out[0, 0] * 1e-30

    timeit("full (baseline)", loop(full_base), pgrads)

    def full_barrier(pg, c):
        parts = jax.lax.sort(
            [pg[GCOL_KEY] + c * 1e-30] + [pg[i] for i in range(N_GCOLS)],
            is_stable=False, num_keys=1)
        parts = jax.lax.optimization_barrier(tuple(parts))
        out = reduce_from_parts(parts)
        return c + out[0, 0] * 1e-30

    timeit("full (barrier after sort)", loop(full_barrier), pgrads)

    def full_barrier2(pg, c):
        parts = jax.lax.sort(
            [pg[GCOL_KEY] + c * 1e-30] + [pg[i] for i in range(N_GCOLS)],
            is_stable=False, num_keys=1)
        rows = jnp.stack(list(parts[1:]) + [parts[0]], axis=0)
        rows = jnp.pad(rows, ((0, 0), (0, seg_reduce.CH)))
        b = jnp.searchsorted(parts[0], q, side="left").astype(jnp.int32)
        rows, b = jax.lax.optimization_barrier((rows, b))
        out = seg_reduce.segment_reduce_sorted(rows, b, N_GAUSS)
        return c + out[0, 0] * 1e-30

    timeit("full (barrier after stack)", loop(full_barrier2), pgrads)

    def full_nopad(pg, c):
        parts = jax.lax.sort(
            [pg[GCOL_KEY] + c * 1e-30] + [pg[i] for i in range(N_GCOLS)],
            is_stable=False, num_keys=1)
        rows = jnp.stack(list(parts[1:]) + [parts[0]], axis=0)
        # no pad: pad_cap here is already CH-aligned? if not this is wrong,
        # just a timing probe
        b = jnp.searchsorted(parts[0], q, side="left").astype(jnp.int32)
        out = seg_reduce.segment_reduce_sorted(
            jnp.pad(rows, ((0, 0), (0, (-rows.shape[1]) % seg_reduce.CH))),
            b, N_GAUSS)
        return c + out[0, 0] * 1e-30

    timeit("full (pad to CH mult only)", loop(full_nopad), pgrads)


if __name__ == "__main__":
    main()
