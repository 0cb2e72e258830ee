"""A/B timing of the isect build + grad-reduction variants (TPU).

Methodology: each variant runs ITERS times inside one jitted fori_loop; the
carry folds in a full-array sum (not a single element — slicing lets XLA
flush-to-zero-fold the whole body). One host sync per variant.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from splat_one_tpu.ops import stream_isect as si
from splat_one_tpu.ops import stream_raster
from splat_one_tpu.ops.projection import project_gaussians
from splat_one_tpu.ops.stream_isect import StreamCaps
from splat_one_tpu.ops.stream_raster import StreamCfg

N_GAUSS = 1_000_000
W, H = 1280, 720
ITERS = 10


def timeit(name, fn, *args):
    def looped(*a):
        def step(i, c):
            return fn(*a, c)
        return jax.lax.fori_loop(0, ITERS, step, jnp.float32(0))

    f = jax.jit(looped)
    jax.block_until_ready(f(*args))
    t0 = time.time()
    jax.block_until_ready(f(*args))
    dt = (time.time() - t0 - 0.028) / ITERS * 1000
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return dt


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

    _, _, sw, sh_ = si.supertile_grid(W, H, 16)
    caps = StreamCaps.choose(N_GAUSS, 1, sw * sh_,
                             avg_supertiles_per_gaussian=3.0)
    cfg = StreamCfg.from_caps(caps, W, H, 16, 1, N_GAUSS)

    proj = jax.jit(lambda m, q, s, o, sh_c: project_gaussians(
        m, q, s, o, viewmats, Ks, W, H, sh_coeffs=sh_c, sh_degree=3))(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(sh))
    jax.block_until_ready(proj)

    def isect_fn(proj, c):
        p = proj._replace(depths=proj.depths + c * 1e-12)
        i = si.build_stream_intersections(p, W, H, 16, caps)
        return c + jnp.sum(i.sorted_g).astype(jnp.float32) * 1e-12

    timeit("isect build", isect_fn, proj)

    isect = jax.jit(lambda p: si.build_stream_intersections(
        p, W, H, 16, caps))(proj)
    jax.block_until_ready(isect)
    print(f"n_isect={int(isect.n_isect)}", flush=True)

    fields = si.build_fields(proj)
    packed = jax.jit(lambda f: si.pack_stream(f, isect, caps).T)(fields)
    fwd_out = jax.jit(lambda p: stream_raster._fwd_call(
        cfg, isect.st_starts, p))(packed)
    gout = jnp.ones_like(fwd_out)
    pgrads = jax.jit(lambda p: stream_raster._bwd_call(
        cfg, isect.st_starts, isect.st_starts_al, p, fwd_out, gout))(packed)
    jax.block_until_ready(pgrads)

    def pack_fn(fields, c):
        packed = si.pack_stream(fields + c * 1e-12, isect, caps)
        return c + jnp.sum(packed[:, 0]) * 1e-12

    timeit("pack gather (no kernel-layout T)", pack_fn, fields)

    def red_new(pgrads, c):
        seg = si.reduce_stream_grads(pgrads + c * 1e-12, N_GAUSS, 10)
        return c + jnp.sum(seg[0]) * 1e-12

    timeit("reduction (sort + segreduce)", red_new, pgrads)

    # old-style sort reduction for comparison
    def red_old(pgrads, c):
        pg = pgrads + c * 1e-12
        parts = jax.lax.sort(
            [pg[si.GCOL_KEY]] + [pg[i] for i in range(10)],
            is_stable=False, num_keys=1)
        return c + jnp.sum(parts[1]) * 1e-12

    timeit("reduction OLD sort part (10 payloads)", red_old, pgrads)


if __name__ == "__main__":
    main()
