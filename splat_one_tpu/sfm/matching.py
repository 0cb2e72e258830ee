"""Feature matching: pair selection + batched descriptor matching.

TPU-native replacement for OpenSfM's ``match_features`` action (reference
surface: app/feature_matching.py:68-118 — Brute-Force/FLANN/LIGHTGLUE
matchers, pair selection by GPS distance / time / order / exhaustive,
``lowes_ratio`` and symmetric matching from config/config.yaml:62-90).

Brute-force matching is a single descriptor matmul on the MXU per pair
(128-D descriptors, [K, K] score matrix) with Lowe ratio + mutual-nearest
tests — batched over pairs with vmap. A LightGlue-style attention matcher
plugs in behind the same interface (models.lightglue_tpu).
"""

from __future__ import annotations

from functools import partial
from itertools import combinations
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def vlad_signatures(
    descriptors: Sequence[np.ndarray],  # per image [K, D] L2-normalized
    n_words: int = 16,
    iters: int = 8,
    seed: int = 0,
    valids: Optional[Sequence[np.ndarray]] = None,  # per image [K] bool:
    # the pipeline's fixed-K padded feature arrays carry zeroed invalid
    # rows which would otherwise pollute the vocabulary and the word-0
    # residual/histogram
) -> np.ndarray:
    """Per-image VLAD signature over a k-means vocabulary trained on the
    scene's own descriptors — the appearance-similarity pair preselection
    the reference configures (config.yaml:68-76 matching_vlad_*; OpenSfM's
    vlad_histograms). One matmul assigns descriptors to words; residuals
    are aggregated, power-normalized and L2-normalized. Returns
    [M, n_words * D]."""
    rng = np.random.default_rng(seed)
    if valids is None:
        valids = [np.ones(len(d), bool) for d in descriptors]
    alld = np.concatenate(
        [d[np.asarray(v, bool)] for d, v in zip(descriptors, valids)
         if len(d)], axis=0,
    )
    if len(alld) == 0:
        return np.zeros((len(descriptors), 0), np.float32)
    # texture-poor scenes: never ask for more words than descriptors
    n_words = max(1, min(n_words, len(alld)))
    sub = alld[rng.choice(len(alld), min(len(alld), 20_000), replace=False)]
    centers = sub[rng.choice(len(sub), n_words, replace=False)].copy()
    centers_j = jnp.asarray(centers)
    sub_j = jnp.asarray(sub)

    @jax.jit
    def kmeans_step(centers):
        # cosine assignment (descriptors are unit length)
        a = jnp.argmax(sub_j @ centers.T, axis=1)  # [S]
        oh = jax.nn.one_hot(a, n_words, dtype=jnp.float32)  # [S, W]
        sums = oh.T @ sub_j  # [W, D]
        cnt = oh.sum(axis=0)[:, None]
        new = jnp.where(cnt > 0, sums / jnp.maximum(cnt, 1), centers)
        return new / jnp.maximum(
            jnp.linalg.norm(new, axis=1, keepdims=True), 1e-9
        )

    for _ in range(iters):
        centers_j = kmeans_step(centers_j)

    @jax.jit
    def signature(d, mask):
        a = jnp.argmax(d @ centers_j.T, axis=1)
        oh = jax.nn.one_hot(a, n_words, dtype=jnp.float32) * mask[:, None]
        resid = oh.T @ d - oh.sum(0)[:, None] * centers_j  # [W, D]
        v = resid.reshape(-1)
        v = jnp.sign(v) * jnp.sqrt(jnp.abs(v))  # power normalization
        v = v / jnp.maximum(jnp.linalg.norm(v), 1e-9)
        # BoW component: the word-usage histogram separates scenes even
        # when residuals are noise-dominated (tight clusters)
        h = jnp.sqrt(oh.sum(0) / jnp.maximum(oh.sum(), 1))
        h = h / jnp.maximum(jnp.linalg.norm(h), 1e-9)
        return jnp.concatenate([v, h]) / jnp.sqrt(2.0)

    D = alld.shape[1]
    out = np.zeros((len(descriptors), n_words * D + n_words), np.float32)
    for i, (d, v) in enumerate(zip(descriptors, valids)):
        if len(d) and np.any(v):
            out[i] = np.asarray(signature(
                jnp.asarray(d), jnp.asarray(v, jnp.float32)
            ))
    return out


def pairs_to_match(
    n_images: int,
    *,
    order_neighbors: int = 0,
    gps_positions: Optional[np.ndarray] = None,
    gps_neighbors: int = 0,
    descriptors: Optional[Sequence[np.ndarray]] = None,
    desc_valids: Optional[Sequence[np.ndarray]] = None,
    vlad_neighbors: int = 0,
    max_pairs: Optional[int] = None,
) -> List[Tuple[int, int]]:
    """Candidate pair selection (reference matching_* config keys,
    config.yaml:62-76): exhaustive by default, optionally restricted to
    sequence-order neighbors, GPS nearest neighbors, and/or VLAD
    appearance nearest neighbors."""
    pairs = set()
    if order_neighbors <= 0 and gps_neighbors <= 0 and vlad_neighbors <= 0:
        pairs = set(combinations(range(n_images), 2))
    if order_neighbors > 0:
        for i in range(n_images):
            for j in range(i + 1, min(i + 1 + order_neighbors, n_images)):
                pairs.add((i, j))
    if gps_neighbors > 0 and gps_positions is not None:
        d = np.linalg.norm(
            gps_positions[:, None] - gps_positions[None], axis=-1
        )
        for i in range(n_images):
            if not np.isfinite(gps_positions[i]).all():
                continue  # no fix: excluded from the GPS criterion
            taken = 0
            for j in np.argsort(d[i]):
                j = int(j)
                if j == i or not np.isfinite(d[i, j]):
                    continue
                pairs.add((min(i, j), max(i, j)))
                taken += 1
                if taken >= gps_neighbors:
                    break
    if vlad_neighbors > 0 and descriptors is not None:
        sig = vlad_signatures(descriptors, valids=desc_valids)
        sim = sig @ sig.T
        for i in range(n_images):
            taken = 0
            for j in np.argsort(-sim[i]):
                j = int(j)
                if j == i:  # zero/tied signatures need not rank self first
                    continue
                pairs.add((min(i, j), max(i, j)))
                taken += 1
                if taken >= vlad_neighbors:
                    break
    out = sorted(pairs)
    if max_pairs is not None and len(out) > max_pairs:
        # evenly-spaced subsample: a head-truncation would drop EVERY pair
        # touching high-index images
        keep = np.linspace(0, len(out) - 1, max_pairs).astype(int)
        out = [out[k] for k in keep]
    return out


@partial(jax.jit, static_argnames=())
def match_descriptors(
    d1: jax.Array,  # [K, D] L2-normalized
    d2: jax.Array,  # [K, D]
    valid1: jax.Array,  # [K]
    valid2: jax.Array,  # [K]
    ratio: float = 0.8,  # lowes_ratio (config.yaml:80)
):
    """Mutual-nearest + Lowe-ratio matching. Returns (idx2 [K], ok [K]):
    for each feature in image 1, its match in image 2 (or invalid)."""
    sim = d1 @ d2.T  # cosine similarity, MXU
    neg = -1e9
    sim = jnp.where(valid1[:, None] & valid2[None, :], sim, neg)
    # distances: for rootSIFT descriptors, d^2 = 2 - 2 sim
    best2 = jnp.argmax(sim, axis=1)  # [K]
    s_sorted = jax.lax.top_k(sim, 2)[0]  # [K, 2]
    d_first = jnp.sqrt(jnp.maximum(2.0 - 2.0 * s_sorted[:, 0], 0.0))
    d_second = jnp.sqrt(jnp.maximum(2.0 - 2.0 * s_sorted[:, 1], 1e-12))
    pass_ratio = d_first < ratio * d_second
    # mutual check
    best1_of2 = jnp.argmax(sim, axis=0)  # [K] for image-2 features
    mutual = best1_of2[best2] == jnp.arange(d1.shape[0])
    ok = pass_ratio & mutual & valid1 & (s_sorted[:, 0] > neg / 2)
    return best2, ok


def match_pairs_brute_force(
    descriptors: Sequence[np.ndarray],  # per-image [K, D]
    valids: Sequence[np.ndarray],
    pairs: Sequence[Tuple[int, int]],
    ratio: float = 0.8,
    progress_callback=None,
):
    """Match a list of image pairs; returns {pair: [M, 2] index arrays}.
    (The reference exposes a progress counter for the GUI,
    app/feature_matching.py:57-63 — ``progress_callback(i, total)`` plays
    that role.)"""
    out = {}
    for n, (i, j) in enumerate(pairs):
        idx2, ok = match_descriptors(
            jnp.asarray(descriptors[i]), jnp.asarray(descriptors[j]),
            jnp.asarray(valids[i]), jnp.asarray(valids[j]), ratio=ratio,
        )
        ok = np.asarray(ok)
        idx2 = np.asarray(idx2)
        m1 = np.nonzero(ok)[0]
        out[(i, j)] = np.stack([m1, idx2[m1]], axis=-1)
        if progress_callback is not None:
            progress_callback(n + 1, len(pairs))
    return out


def match_pairs_batched(
    descriptors: Sequence[np.ndarray],  # per-image [K, D]
    valids: Sequence[np.ndarray],
    pairs: Sequence[Tuple[int, int]],
    ratio: float = 0.8,
    batch_pairs: int = 16,
    progress_callback=None,
):
    """Batched brute-force matching: P pairs per device call.

    ``match_pairs_brute_force`` dispatches ONE small jitted call per pair;
    through the axon tunnel each host->device round-trip costs ~28 ms, so
    at 60 images (~1,770 pairs) dispatch alone is ~50 s and the matching
    stage measured 1,073 s (BASELINE.md round 4). Stacking P pairs into
    fixed [P, K, D] tensors and vmapping the mutual-NN + ratio test
    amortizes the dispatch ~P-fold and feeds the MXU one large batched
    matmul instead of many small ones (reference analog: OpenSfM's
    process-parallel match_arguments, app/feature_matching.py:68-77).

    Semantics are identical to match_pairs_brute_force (same
    match_descriptors math, same output dict)."""
    if not len(pairs):
        return {}
    M_img = len(descriptors)
    K = max(d.shape[0] for d in descriptors)
    D = max((d.shape[1] for d in descriptors if d.ndim == 2), default=128)
    desc_all = np.zeros((M_img, K, D), np.float32)
    val_all = np.zeros((M_img, K), bool)
    for i, (d, v) in enumerate(zip(descriptors, valids)):
        if len(d):
            desc_all[i, : d.shape[0], : d.shape[1]] = d
            val_all[i, : len(v)] = v
    desc_all = jnp.asarray(desc_all)
    val_all = jnp.asarray(val_all)

    @partial(jax.jit, static_argnames=("ratio",))
    def batch_match(i_idx, j_idx, ratio):
        d1 = desc_all[i_idx]
        d2 = desc_all[j_idx]
        v1 = val_all[i_idx]
        v2 = val_all[j_idx]
        return jax.vmap(
            lambda a, b, va, vb: match_descriptors(a, b, va, vb,
                                                   ratio=ratio)
        )(d1, d2, v1, v2)

    out = {}
    P = max(1, int(batch_pairs))
    for s in range(0, len(pairs), P):
        chunk = list(pairs[s: s + P])
        npad = P - len(chunk)
        padded = chunk + [chunk[-1]] * npad  # fixed shape: repeat last
        i_idx = jnp.asarray([p[0] for p in padded], jnp.int32)
        j_idx = jnp.asarray([p[1] for p in padded], jnp.int32)
        idx2_b, ok_b = batch_match(i_idx, j_idx, ratio)
        idx2_b = np.asarray(idx2_b)
        ok_b = np.asarray(ok_b)
        for n, (i, j) in enumerate(chunk):
            m1 = np.nonzero(ok_b[n])[0]
            out[(i, j)] = np.stack([m1, idx2_b[n][m1]], axis=-1)
        if progress_callback is not None:
            progress_callback(min(s + P, len(pairs)), len(pairs))
    return out


def robust_filter_matches_batched(
    key,
    matches: dict,  # {(i, j): [M, 2]}
    bearings: Sequence[np.ndarray],  # per image [K, 3]
    threshold: float = 0.008,
    min_matches: int = 16,
    min_inliers: int = 20,
    target_err_elems: int = 1 << 26,
):
    """Batched two-view geometric verification: P pairs per device call.

    Same decision rule as ``robust_filter_matches`` (5-pt RANSAC, n_hyp
    1024, reject pairs with < min_inliers consensus), but pairs are
    bucketed by padded match count and vmapped so one device call verifies
    a whole batch. Per-pair PRNG keys are split from ``key`` in pair-sorted
    order, so results are deterministic for a given pair set (they differ
    from the sequential path's draws, which is fine — both are valid RANSAC
    runs). ``target_err_elems`` caps the batched [P, n_hyp*10, cap]
    residual tensor to bound memory."""
    from splat_one_tpu.sfm.geometry import ransac_essential

    N_HYP = 1024
    # 8pt for the pair FILTER (init-pair geometry in sfm.reconstruct stays
    # 5pt for planar safety): identical inlier sets on the bench scenes
    # and ~40x cheaper after the eigh-refit + prefix-sampling fixes
    # (0.05 vs 2.0 s/call at cap=1024 on CPU) — the filter was the
    # dominant cost of the matching stage at 200 images
    SOLVER = "8pt"
    items = sorted(matches.items())
    keys = jax.random.split(key, len(items) + 1)[1:]
    out = {}
    # bucket by power-of-2 padded count (caps recompiles like the
    # sequential path) and batch within each bucket
    buckets = {}
    for n, ((i, j), m) in enumerate(items):
        if len(m) < min_matches:
            out[(i, j)] = m[:0]
            continue
        cap = max(64, 1 << (len(m) - 1).bit_length())
        buckets.setdefault(cap, []).append((n, (i, j), m))

    @partial(jax.jit, static_argnames=("thr",))
    def batch_verify(ks, b1, b2, valid, thr):
        res = jax.vmap(
            lambda k, a, b, v: ransac_essential(
                k, a, b, v, threshold=thr, solver=SOLVER, n_hyp=N_HYP)
        )(ks, b1, b2, valid)
        return res.n_inliers, res.inliers

    for cap, entries in sorted(buckets.items()):
        # ~10 candidate Es per 5-pt hypothesis drive the residual tensor
        P = max(1, min(64, target_err_elems // (N_HYP * 10 * cap)))
        for s in range(0, len(entries), P):
            chunk = entries[s: s + P]
            npad = P - len(chunk)
            chunk_p = chunk + [chunk[-1]] * npad
            b1 = np.tile(np.array([0.0, 0.0, 1.0], np.float32),
                         (len(chunk_p), cap, 1))
            b2 = b1.copy()
            valid = np.zeros((len(chunk_p), cap), bool)
            for n, (_, (i, j), m) in enumerate(chunk_p):
                b1[n, : len(m)] = bearings[i][m[:, 0]]
                b2[n, : len(m)] = bearings[j][m[:, 1]]
                valid[n, : len(m)] = True
            ks = jnp.stack([keys[e[0]] for e in chunk_p])
            n_inl, inl = batch_verify(
                ks, jnp.asarray(b1), jnp.asarray(b2),
                jnp.asarray(valid), float(threshold))
            n_inl = np.asarray(n_inl)
            inl = np.asarray(inl)
            for n, (_, pair, m) in enumerate(chunk):
                if int(n_inl[n]) < min_inliers:
                    out[pair] = m[:0]
                else:
                    out[pair] = m[inl[n][: len(m)]]
    return out


def robust_filter_matches(
    key,
    matches: np.ndarray,  # [M, 2]
    bearings1: np.ndarray,  # [K, 3]
    bearings2: np.ndarray,
    threshold: float = 0.008,
    min_matches: int = 16,
    min_inliers: int = 20,
):
    """Two-view geometric verification of putative matches (the reference's
    robust matching step inside match_features). Returns filtered matches.

    ``min_inliers`` rejects the whole pair when RANSAC's consensus set is
    small (reference config/config.yaml robust_matching_min_match: 20):
    between views with NO true overlap, an essential model can always
    collect a spurious 10-16 "inlier" consensus from false putative
    matches — measured on the 12-view ring e2e scene, geometrically
    disjoint pairs produced 12-16 inliers vs >=121 for true pairs, and
    those spurious pairs chained into false long-range tracks that bent
    the ring (the r2 warped-BA-minimum regression)."""
    from splat_one_tpu.sfm.geometry import ransac_essential

    if len(matches) < min_matches:
        return matches[:0]
    M = len(matches)
    # pad to power-of-2 buckets with a validity mask: a raw [M, 3] input
    # re-compiles RANSAC for every distinct match count — at hundreds of
    # pairs that is hundreds of XLA CPU executables (measured: ~4.7 s/pair
    # nearly all compile, and enough JIT code memory to abort a 200-image
    # run with LLVM allocation failures). Buckets cap it at ~6 compiles.
    cap = max(64, 1 << (M - 1).bit_length())
    b1 = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (cap, 1))
    b2 = b1.copy()
    b1[:M] = bearings1[matches[:, 0]]
    b2[:M] = bearings2[matches[:, 1]]
    valid = np.arange(cap) < M
    # n_hyp=512: verification must be robust to sampling luck — at the
    # default 256 the surviving inlier sets vary enough run-to-run to
    # swing the downstream ring-scene bundle minimum 10x (measured r4
    # when bucketing changed the PRNG draws)
    res = ransac_essential(
        key, jnp.asarray(b1), jnp.asarray(b2), jnp.asarray(valid),
        threshold=threshold, solver="8pt", n_hyp=1024,
    )
    if int(res.n_inliers) < min_inliers:
        return matches[:0]
    inl = np.asarray(res.inliers)[:M]
    return matches[inl]
