"""Correct TPU primitive microbenchmarks at stream-rasterizer sizes.

Two traps defeated here:
  1. XLA hoisting: `x + c*0` folds, `(t + c*eps)[idx]` distributes to
     `t[idx] + c*eps`, and consuming only out[1,1] slices the gather to one
     row. Fix: the measured op's FULL output (jnp.sum) is written back into
     its input each iteration — an unbreakable serial dependency.
  2. axon-tunnel result memoization: a repeat call with the SAME input
     buffers returns the cached result in ~0.1 ms. Fix: warm up on one
     uploaded copy of the inputs, time on a second fresh copy.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

EXP = 2_726_706  # measured n_isect at bench shapes
PAD = 3_235_328  # pad_cap
M0 = 1_000_000
ITERS = 10


def timeit(name, fn, carry0, *args, iters=ITERS):
    f = jax.jit(fn, static_argnums=0)
    import numpy as _np
    fresh = [jnp.asarray(_np.asarray(a)) for a in (carry0,) + args]
    jax.block_until_ready(f(iters, carry0, *args))  # compile + warm
    t0 = time.time()
    jax.block_until_ready(f(iters, *fresh))
    dt = (time.time() - t0 - 0.028) / iters * 1000
    print(f"{name:52s} {dt:8.2f} ms", flush=True)
    return dt


def loop(body):
    def fn(iters, carry0, *args):
        return jax.lax.fori_loop(
            0, iters, lambda i, c: body(c, *args), carry0)
    return fn


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(M0, 16)).astype(np.float32))
    big = jnp.asarray(rng.normal(size=(PAD, 16)).astype(np.float32))
    bigT = jnp.asarray(rng.normal(size=(16, PAD)).astype(np.float32))
    idx_m0 = jnp.asarray(rng.integers(0, M0, EXP).astype(np.int32))
    idx_pad = jnp.asarray(rng.integers(0, PAD, EXP).astype(np.int32))
    perm = jnp.asarray(rng.permutation(PAD)[:EXP].astype(np.int32))
    rows = jnp.asarray(rng.normal(size=(EXP, 16)).astype(np.float32))
    bounds = jnp.asarray(
        np.sort(rng.integers(0, EXP, M0 + 1)).astype(np.int32))

    def g(t, idx):
        out = t[idx]
        return t.at[0, 0].set(jnp.sum(out) * 1e-30)

    timeit("row gather [EXP] from [M0,16]", loop(g), table, idx_m0)
    timeit("row gather [EXP] from [PAD,16]", loop(g), big, idx_pad)

    def sc_unique(r, perm):
        out = jnp.zeros((PAD, 16), jnp.float32).at[perm].set(
            r, unique_indices=True, mode="drop")
        return r.at[0, 0].set(jnp.sum(out) * 1e-30)

    timeit("row scatter-SET [EXP,16] unique -> [PAD,16]",
           loop(sc_unique), rows, perm)

    def sc_add(r, idx):
        out = jnp.zeros((M0, 16), jnp.float32).at[idx].add(r, mode="drop")
        return r.at[0, 0].set(jnp.sum(out) * 1e-30)

    timeit("row scatter-ADD [EXP,16] dup -> [M0,16]",
           loop(sc_add), rows, idx_m0, iters=2)

    def cs0(x):
        out = jnp.cumsum(x, axis=0)
        return x.at[0, 0].set(jnp.sum(out) * 1e-30)

    def cs1(x):
        out = jnp.cumsum(x, axis=1)
        return x.at[0, 0].set(jnp.sum(out) * 1e-30)

    timeit("cumsum [PAD,16] axis0", loop(cs0), big)
    timeit("cumsum [16,PAD] axis1", loop(cs1), bigT)

    def tr0(x):
        out = x.T
        return x.at[0, 0].set(jnp.sum(out) * 1e-30)

    timeit("transpose [PAD,16]->[16,PAD]", loop(tr0), big)
    timeit("transpose [16,PAD]->[PAD,16]", loop(tr0), bigT)

    keys_st = jnp.asarray(rng.integers(0, 920, EXP).astype(np.int32))
    depth = jnp.asarray(rng.normal(size=EXP).astype(np.float32))
    payload = jnp.asarray(rng.integers(0, M0, EXP).astype(np.int32))

    def sort2k(d, ks, p):
        out = jax.lax.sort([ks, d, p], is_stable=True, num_keys=2)
        return d.at[0].set(jnp.sum(out[1]) * 1e-30 + jnp.sum(out[2]).astype(jnp.float32) * 1e-30)

    timeit("sort [EXP] 2 keys (int,f32) + 1 payload",
           loop(sort2k), depth, keys_st, payload)

    def sort1k(d, p):
        out = jax.lax.sort([d.view(jnp.int32), p], is_stable=True,
                           num_keys=1)
        return d.at[0].set(jnp.sum(out[1]).astype(jnp.float32) * 1e-30)

    timeit("sort [EXP] 1 key u32 + 1 payload", loop(sort1k), depth, payload)

    cs_big = jnp.asarray(rng.normal(size=(EXP + 1, 16)).astype(np.float32))

    def bg(cs, b):
        out = cs[b]
        return cs.at[0, 0].set(jnp.sum(out) * 1e-30)

    timeit("bounds row gather [M0+1] from [EXP+1,16]", loop(bg), cs_big,
           bounds)

    # 1-D variants (for scalar metadata movement)
    vec = jnp.asarray(rng.normal(size=EXP).astype(np.float32))

    def g1(v, idx):
        out = v[idx]
        return v.at[0].set(jnp.sum(out) * 1e-30)

    idx_exp = jnp.asarray(rng.integers(0, EXP, EXP).astype(np.int32))
    timeit("1-D gather [EXP] from [EXP]", loop(g1), vec, idx_exp)

    def csv(v):
        out = jnp.cumsum(v)
        return v.at[0].set(jnp.sum(out) * 1e-30)

    timeit("cumsum [EXP] f32 1-D", loop(csv), vec)


if __name__ == "__main__":
    main()
