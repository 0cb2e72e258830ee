"""Microbenchmarks of the TPU primitives the intersection glue depends on.

Run on the real chip: python -u scripts/micro_bench.py
Each measurement jit-loops the op ITERS times on device (one host sync).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 20


def timeit(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    r = f(*args)
    jax.block_until_ready(r)
    dt = (time.time() - t0 - 0.028) * 1000
    print(f"{name:55s} {dt:8.2f} ms")
    return dt


def loop(body, n=ITERS):
    def fn(*args):
        def step(i, c):
            out = body(*args, c)
            return out
        return jax.lax.fori_loop(0, n, step, jnp.float32(0))
    return fn


def main():
    rng = np.random.default_rng(0)
    M0 = 1_000_000
    AL = 6_912_000
    print(f"M0={M0} AL={AL} iters={ITERS} (times are per {ITERS} iters /{ITERS})")

    table = jnp.asarray(rng.normal(size=(M0 + 1, 16)).astype(np.float32))
    idx_rand = jnp.asarray(rng.integers(0, M0, AL).astype(np.int32))
    idx_mono = jnp.asarray(np.sort(rng.integers(0, M0, AL)).astype(np.int32))
    idx_piecewise = jnp.asarray(
        np.concatenate([np.sort(x) for x in np.split(rng.integers(0, M0, AL), 3600)]).astype(np.int32))

    def g(table, idx, c):
        out = table[idx + (c * 0).astype(jnp.int32)]
        return c + out[0, 0] * 1e-30

    d = timeit("gather [AL] rows from [M0,16] random", loop(g), table, idx_rand)
    print(f"   -> {d/ITERS/AL*1e6:.2f} ns/row")
    timeit("gather [AL] rows from [M0,16] monotonic", loop(g), table, idx_mono)
    timeit("gather [AL] rows from [M0,16] piecewise-mono", loop(g), table, idx_piecewise)

    table4 = jnp.asarray(rng.normal(size=(M0 + 1, 4)).astype(np.float32))
    timeit("gather [AL] rows from [M0,4] random", loop(g), table4, idx_rand)
    table64 = jnp.asarray(rng.normal(size=(M0 + 1, 64)).astype(np.float32))
    timeit("gather [AL] rows from [M0,64] random", loop(g), table64, idx_rand)

    # scatter rows (unique permutation)
    perm = jnp.asarray(rng.permutation(AL).astype(np.int32))
    rows = jnp.asarray(rng.normal(size=(AL, 16)).astype(np.float32))

    def sc(rows, perm, c):
        out = jnp.zeros((AL, 16), jnp.float32).at[perm + (c*0).astype(jnp.int32)].set(rows, unique_indices=True)
        return c + out[0, 0] * 1e-30

    timeit("scatter-set [AL,16] rows by unique perm", loop(sc, 5), rows, perm)

    # sorts with varying payload counts
    keys = jnp.asarray(rng.integers(0, 3600, AL).astype(np.int32))
    pay = [jnp.asarray(rng.integers(0, M0, AL).astype(np.int32)) for _ in range(8)]

    def mk_sort(np_):
        def s(keys, c, *pays):
            out = jax.lax.sort([keys + (c*0).astype(jnp.int32)] + list(pays),
                               is_stable=True, num_keys=1)
            return c + out[1][0].astype(jnp.float32) * 1e-30 if np_ else c + out[0][0].astype(jnp.float32)*1e-30
        return s

    for npay in (1, 2, 4, 8):
        def s(keys, c, pays=pay[:npay]):
            out = jax.lax.sort([keys + (c*0).astype(jnp.int32)] + pays,
                               is_stable=True, num_keys=1)
            return c + out[1][0].astype(jnp.float32) * 1e-30
        timeit(f"stable sort [AL] int keys + {npay} payloads", loop(s, 5), keys)

    # cumsums
    big = jnp.asarray(rng.normal(size=(AL, 16)).astype(np.float32))
    bigT = jnp.asarray(rng.normal(size=(16, AL)).astype(np.float32))

    def cs0(x, c):
        return c + jnp.cumsum(x + c * 0, axis=0)[0, 0] * 1e-30

    def cs1(x, c):
        return c + jnp.cumsum(x + c * 0, axis=1)[0, 0] * 1e-30

    timeit("cumsum [AL,16] axis0", loop(cs0, 5), big)
    timeit("cumsum [16,AL] axis1", loop(cs1, 5), bigT)

    vec = jnp.asarray(rng.normal(size=(AL,)).astype(np.float32))
    ivec = jnp.asarray(rng.integers(0, 2, AL).astype(np.int32))

    def cv(x, c):
        return c + jnp.cumsum(x + c * 0)[0] * 1e-30

    def cm(x, c):
        return c + jax.lax.cummax(x + (c*0).astype(jnp.int32))[0].astype(jnp.float32) * 1e-30

    timeit("cumsum [AL] f32 1-D", loop(cv, 5), vec)
    timeit("cumsum [AL] int32 1-D", loop(cv, 5), ivec)
    timeit("cummax [AL] int32 1-D", loop(cm, 5), ivec)

    # transpose
    def tr(x, c):
        return c + (x + c * 0).T[0, 0] * 1e-30

    timeit("transpose [AL,16]->[16,AL]", loop(tr, 5), big)

    # argsort / searchsorted at M0
    depth = jnp.asarray(rng.normal(size=(1, M0)).astype(np.float32))

    def asrt(x, c):
        return c + jnp.argsort(x + c * 0, axis=1)[0, 0].astype(jnp.float32) * 1e-30

    timeit("argsort [1,M0] f32", loop(asrt, 5), depth)

    sorted_tiles = jnp.sort(keys)

    def ss(x, c):
        q = jnp.searchsorted(x + (c*0).astype(jnp.int32), jnp.arange(3601, dtype=jnp.int32))
        return c + q[0].astype(jnp.float32) * 1e-30

    timeit("searchsorted 3601 queries into [AL]", loop(ss, 5), sorted_tiles)


if __name__ == "__main__":
    main()
