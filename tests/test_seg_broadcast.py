"""ops.seg_broadcast: segmented parent->slot broadcast kernel.

The kernel path must be bit-exact vs the XLA scatter+cumsum+gather path
(the lax.cond fallback) on ragged random runs, including zero-count
parents and slots beyond n_isect; the overflow guard must reroute to the
fallback when zero-count runs exceed the parent window."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from splat_one_tpu.ops import seg_broadcast as SB  # noqa: E402


def _random_problem(rng, mp, zero_frac=0.3, max_count=9):
    counts = rng.integers(1, max_count, size=mp).astype(np.int32)
    counts[rng.uniform(size=mp) < zero_frac] = 0
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
    sx0 = rng.integers(0, 40, mp).astype(np.int32)
    sy0 = rng.integers(0, 23, mp).astype(np.int32)
    span = np.maximum(rng.integers(1, 6, mp), 1).astype(np.int32)
    ka = rng.integers(0, 1000, mp).astype(np.int32)
    depth = rng.normal(size=mp).astype(np.float32) * 37.3 + 5
    return sx0, sy0, span, ka, offsets, depth, counts


def _xla_reference(sx0, sy0, span, ka, offsets, depth, counts, exp_cap):
    mp = len(sx0)
    buckets = np.zeros(exp_cap, np.int64)
    for off in offsets[1:]:
        if off < exp_cap:
            buckets[off] += 1
    g = np.cumsum(buckets)
    return (sx0[g], sy0[g], span[g], ka[g], offsets[g], depth[g], g)


@pytest.mark.parametrize("zero_frac", [0.0, 0.35])
def test_kernel_matches_reference(zero_frac):
    rng = np.random.default_rng(3)
    mp = 3000
    prob = _random_problem(rng, mp, zero_frac=zero_frac)
    n_isect = int(prob[4][-1] + prob[6][-1])
    exp_cap = -(-int(n_isect * 1.1) // 128) * 128
    jprob = [jnp.asarray(a) for a in prob]
    # the guard MUST resolve True on this headroom-sized problem (the
    # production shape: exp_cap > n_isect) — tail chunks past n_isect are
    # covered by definition. This is what round 4 got wrong: the guard
    # failed on every tail chunk and the cond silently took the fallback,
    # so "kernel parity" compared the fallback against itself.
    okv, _, _ = SB.coverage_windows(jprob[4], jprob[6], exp_cap)
    assert bool(np.asarray(okv).all()), np.flatnonzero(~np.asarray(okv))
    # force the Pallas path (no cond) so kernel bugs cannot hide
    got = jax.jit(SB.expand_meta_streamed, static_argnums=(7, 8))(
        *jprob, exp_cap, "kernel")
    ref = _xla_reference(*[np.asarray(a) for a in prob], exp_cap)
    got = [np.asarray(g) for g in got]
    # compare only live slots (dead slots are masked downstream; the two
    # paths differ there by design)
    for gi, ri, name in zip(
            got, ref,
            ["sx0", "sy0", "span", "ka", "off", "depth", "parent"]):
        g_live = gi[:n_isect]
        r_live = ri[:n_isect]
        assert np.array_equal(g_live, r_live), (
            name, np.flatnonzero(g_live != r_live)[:5])
    # the guarded-cond entry must agree with the forced path
    prod = jax.jit(SB.expand_meta_streamed, static_argnums=(7, 8))(
        *jprob, exp_cap, "cond")
    for gi, pi in zip(got, prod):
        assert np.array_equal(gi[:n_isect], np.asarray(pi)[:n_isect])


def test_tail_chunks_count_as_covered():
    """exp_cap >> n_isect (the normal StreamCaps headroom case) must NOT
    fail coverage: chunks whose slots lie entirely past n_isect have no
    live parents."""
    rng = np.random.default_rng(11)
    prob = _random_problem(rng, 2000, zero_frac=0.2)
    n_isect = int(prob[4][-1] + prob[6][-1])
    exp_cap = -(-int(n_isect * 3.0) // 1024) * 1024  # huge tail
    okv, _, _ = SB.coverage_windows(
        jnp.asarray(prob[4]), jnp.asarray(prob[6]), exp_cap)
    assert bool(np.asarray(okv).all())
    got = SB.expand_meta_streamed(
        *[jnp.asarray(a) for a in prob], exp_cap)
    ref = _xla_reference(*[np.asarray(a) for a in prob], exp_cap)
    for gi, ri in zip(got, ref):
        assert np.array_equal(np.asarray(gi)[:n_isect], ri[:n_isect])


def test_overflow_falls_back():
    """A zero-count run longer than the parent window must reroute to the
    XLA path (the cond guard) and still produce exact results."""
    rng = np.random.default_rng(4)
    mp = 8000
    sx0, sy0, span, ka, offsets, depth, counts = _random_problem(
        rng, mp, zero_frac=0.0, max_count=4)
    # carve a zero-run longer than the slab right in the middle
    counts[1000:1000 + SB.B + 512] = 0
    offsets = np.concatenate(
        [[0], np.cumsum(counts)[:-1]]).astype(np.int32)
    n_isect = int(offsets[-1] + counts[-1])
    exp_cap = -(-int(n_isect * 1.1) // 128) * 128
    okv, _, _ = SB.coverage_windows(
        jnp.asarray(offsets), jnp.asarray(counts), exp_cap)
    assert not bool(np.asarray(okv).all())  # guard must trip
    got = SB.expand_meta_streamed(
        *[jnp.asarray(a) for a in
          (sx0, sy0, span, ka, offsets, depth, counts)], exp_cap, "cond")
    ref = _xla_reference(sx0, sy0, span, ka, offsets, depth, counts,
                         exp_cap)
    for gi, ri in zip(got, ref):
        assert np.array_equal(np.asarray(gi)[:n_isect], ri[:n_isect])


def test_tight_slab_kernel_parity():
    """required_slab must produce a window the coverage guard accepts,
    and the kernel must stay exact at that (much narrower) slab — the
    production configuration after StreamCaps right-sizing."""
    rng = np.random.default_rng(9)
    mp = 2500
    prob = _random_problem(rng, mp, zero_frac=0.15, max_count=6)
    n_isect = int(prob[4][-1] + prob[6][-1])
    exp_cap = -(-int(n_isect + 2048) // 1024) * 1024
    slab = SB.required_slab(prob[4], prob[6], exp_cap)
    assert slab < SB.SLAB  # the observed window must actually shrink
    jprob = [jnp.asarray(a) for a in prob]
    okv, _, _ = SB.coverage_windows(jprob[4], jprob[6], exp_cap,
                                    slab=slab)
    assert bool(np.asarray(okv).all())
    got = jax.jit(SB.expand_meta_streamed, static_argnums=(7, 8, 9))(
        *jprob, exp_cap, "kernel", slab)
    ref = _xla_reference(*[np.asarray(a) for a in prob], exp_cap)
    for gi, ri, name in zip(
            got, ref,
            ["sx0", "sy0", "span", "ka", "off", "depth", "parent"]):
        assert np.array_equal(np.asarray(gi)[:n_isect], ri[:n_isect]), name


def test_depth_bit_exact():
    """The 3-way bf16 split must reconstruct f32 depth EXACTLY (it is a
    sort key; any rounding would reorder near-ties vs the oracle) — ON
    THE KERNEL PATH and UNDER JIT. Both qualifiers are load-bearing:
    XLA's algebraic simplifier folds f32->bf16->f32 convert chains to
    identity under jit (caught live on the TPU, r5 — eager was exact,
    jitted reconstructed only the leading bf16 part), which is why
    _split3 truncates via bitwise mantissa masking instead of converts."""
    rng = np.random.default_rng(5)
    mp = 2000
    prob = list(_random_problem(rng, mp, zero_frac=0.1))
    # adversarial depths: full f32 mantissas, wide exponent range
    prob[5] = (rng.normal(size=mp).astype(np.float32)
               * np.exp2(rng.integers(-20, 20, mp)).astype(np.float32))
    n_isect = int(prob[4][-1] + prob[6][-1])
    exp_cap = -(-int(n_isect * 1.1) // 128) * 128
    got = jax.jit(SB.expand_meta_streamed, static_argnums=(7, 8))(
        *[jnp.asarray(a) for a in prob], exp_cap, "kernel")
    ref = _xla_reference(*[np.asarray(a) for a in prob], exp_cap)
    assert np.array_equal(np.asarray(got[5])[:n_isect], ref[5][:n_isect])
