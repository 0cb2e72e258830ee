"""Sub-stage timing of build_stream_intersections at bench shapes (TPU).

Stages are cumulative prefixes of the isect pipeline, each consuming its
outputs (the axon tunnel memoizes identical calls; the scalar carry with a
perturbed input escapes both memoization and XLA loop hoisting — same
pattern as stream_profile.py)."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from splat_one_tpu.ops import stream_isect as si_mod
from splat_one_tpu.ops.projection import conic_ellipse_radii, \
    project_gaussians
from splat_one_tpu.ops.stream_isect import StreamCaps

N_GAUSS = 1_000_000
W, H = 1280, 720
TS = 16
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

    tw, th, sw, sh_ = si_mod.supertile_grid(W, H, TS)
    caps = StreamCaps.choose(N_GAUSS, 1, sw * sh_,
                             avg_supertiles_per_gaussian=3.0)
    EXP = caps.exp_cap
    sps = TS * caps.ss
    proj = jax.jit(lambda m, q, s, o, c: project_gaussians(
        m, q, s, o, viewmats, Ks, W, H, sh_coeffs=c, sh_degree=3))(*args)
    jax.block_until_ready(proj)
    M0 = N_GAUSS

    def spans(p):
        u = p.means2d[..., 0].reshape(M0)
        v = p.means2d[..., 1].reshape(M0)
        con = p.conics.reshape(M0, 3)
        rx, ry = conic_ellipse_radii(con[:, 0], con[:, 1], con[:, 2])
        valid = p.valid.reshape(M0)
        sy0 = jnp.clip(jnp.floor((v - ry) / sps), 0, sh_).astype(jnp.int32)
        sy1 = jnp.clip(jnp.ceil((v + ry) / sps), 0, sh_).astype(jnp.int32)
        span_y = jnp.maximum(sy1 - sy0, 0)
        sx0 = jnp.clip(jnp.floor((u - rx) / sps), 0, sw).astype(jnp.int32)
        sx1 = jnp.clip(jnp.ceil((u + rx) / sps), 0, sw).astype(jnp.int32)
        span_x = jnp.maximum(sx1 - sx0, 0)
        span_x = jnp.where(valid, span_x, 0)
        span_y = jnp.where(valid, span_y, 0)
        counts = (span_x * span_y).astype(jnp.int32)
        offsets = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])
        return sx0, sy0, span_x, span_y, counts, offsets, p.depths.reshape(
            M0)

    def f_spans(p, c):
        pp = p._replace(depths=p.depths + c * 1e-30,
                        means2d=p.means2d + c * 1e-30)
        out = spans(pp)
        return c + out[5][-1].astype(jnp.float32) * 1e-30

    timeit("1 spans + counts + offsets cumsum (1M)", loop(f_spans), proj)

    def f_expand(p, c):
        pp = p._replace(depths=p.depths + c * 1e-30,
                        means2d=p.means2d + c * 1e-30)
        sx0, sy0, span_x, span_y, counts, offsets, dep = spans(pp)
        g_of_s = si_mod._expand_index(offsets, EXP)
        return c + g_of_s[-1].astype(jnp.float32) * 1e-30

    timeit("2 + expansion scatter + cumsum (3M)", loop(f_expand), proj)

    def f_meta(p, c):
        pp = p._replace(depths=p.depths + c * 1e-30,
                        means2d=p.means2d + c * 1e-30)
        sx0, sy0, span_x, span_y, counts, offsets, dep = spans(pp)
        g_of_s = si_mod._expand_index(offsets, EXP)
        meta = jnp.stack([
            sx0.astype(jnp.float32), sy0.astype(jnp.float32),
            jnp.maximum(span_x, 1).astype(jnp.float32),
            offsets.astype(jnp.float32), dep,
            jnp.zeros((M0,), jnp.float32), jnp.zeros((M0,), jnp.float32),
            jnp.zeros((M0,), jnp.float32)], axis=1)
        meta_s = meta[g_of_s]
        return c + meta_s[-1, 4] * 1e-30 + meta_s[0, 0] * 1e-30 + jnp.sum(
            meta_s[:, 3]) * 1e-30

    timeit("3 + meta gather [EXP, 8]", loop(f_meta), proj)

    # (removed: delta-row-scatter + Pallas-scan meta reconstruction probes —
    # measured 64 ms for the [MP, 8] row scatter alone; see stream_isect
    # docstring note. XLA scatter is ~8 ns/element.)

    def f_full(p, c):
        pp = p._replace(depths=p.depths + c * 1e-30,
                        means2d=p.means2d + c * 1e-30)
        isect = si_mod.build_stream_intersections(pp, W, H, TS, caps)
        return (c + isect.sorted_g[-1].astype(jnp.float32) * 1e-30
                + isect.st_starts_al[-1].astype(jnp.float32) * 1e-30
                + jnp.sum(isect.sorted_g).astype(jnp.float32) * 1e-30)

    timeit("4 full isect (+st math, 2-key sort, ranges)", loop(f_full),
           proj)


if __name__ == "__main__":
    main()
