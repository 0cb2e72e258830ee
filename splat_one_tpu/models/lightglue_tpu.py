"""LightGlue-style attention matcher in pure XLA (SURVEY.md N11).

Architecture replacement for the reference's LightGlue
(``matching_type: LIGHTGLUE``, app/feature_matching.py:96): alternating
self-/cross-attention over the two keypoint sets with rotary positional
encoding of normalized keypoint locations, followed by a dual-softmax
assignment with learned matchability (the LightGlue head). Everything is
batched matmuls — the layer maps straight onto the MXU; no flash-attention
extension needed at keypoint counts (K <= 4096).

Weights load from a converted ``.npz``; random-init passes serve shape and
gradient tests and from-scratch training. The matcher exposes the same
interface as ``sfm.matching.match_descriptors`` so the pipeline can switch
matcher types the way the reference's config does.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from splat_one_tpu.models.sam_tpu import (
    _init_linear, _init_ln, _layernorm, _linear,
)

DIM = 128
N_LAYERS = 4
N_HEADS = 4


def init_lightglue(key, desc_dim: int = 128) -> Dict:
    params: Dict = {}
    ks = jax.random.split(key, 4 + N_LAYERS * 10)
    _init_linear(ks[0], "in_proj", desc_dim, DIM, params)
    ki = 1
    for layer in range(N_LAYERS):
        for kind in ("self", "cross"):
            for name in ("q", "k", "v", "o"):
                _init_linear(
                    ks[ki], f"l{layer}_{kind}_{name}", DIM, DIM, params
                )
                ki += 1
        _init_linear(ks[ki], f"l{layer}_ffn1", DIM * 2, DIM * 2, params)
        ki += 1
        _init_linear(ks[ki], f"l{layer}_ffn2", DIM * 2, DIM, params)
        ki += 1
        _init_ln(f"l{layer}_ln_s", DIM, params)
        _init_ln(f"l{layer}_ln_c", DIM, params)
        _init_ln(f"l{layer}_ln_f", DIM * 2, params)
    _init_linear(ks[ki], "final", DIM, DIM, params)
    _init_linear(ks[ki + 1], "matchability", DIM, 1, params)
    return params


def _rotary(x: jax.Array, xy01: jax.Array) -> jax.Array:
    """Rotary positional encoding by normalized keypoint coordinates.

    x and y get SEPARATE frequency halves (real LightGlue's 2-D RoPE):
    summing them onto one bank collapses position to x+y, making keypoints
    along an anti-diagonal positionally indistinguishable."""
    d4 = x.shape[-1] // 4
    dh = d4 // 2
    freqs = jnp.exp(jnp.linspace(0.0, 5.0, dh))  # log-spaced frequencies
    ang = jnp.concatenate(
        [
            xy01[..., 0:1] * freqs[None, None],
            xy01[..., 1:2] * freqs[None, None],
        ],
        axis=-1,
    )  # [B, K, 2*dh]
    ang = jnp.pad(ang, ((0, 0), (0, 0), (0, d4 - 2 * dh)))
    c, s = jnp.cos(ang), jnp.sin(ang)
    x1, x2, rest = x[..., :d4], x[..., d4:2 * d4], x[..., 2 * d4:]
    return jnp.concatenate(
        [x1 * c - x2 * s, x1 * s + x2 * c, rest], axis=-1
    )


def _mha(p, prefix, q_in, kv_in, q_xy, kv_xy, mask_kv):
    B, Nq, C = q_in.shape
    q = _rotary(_linear(p, f"{prefix}_q", q_in), q_xy)
    k = _rotary(_linear(p, f"{prefix}_k", kv_in), kv_xy)
    v = _linear(p, f"{prefix}_v", kv_in)
    q = q.reshape(B, Nq, N_HEADS, -1)
    k = k.reshape(B, kv_in.shape[1], N_HEADS, -1)
    v = v.reshape(B, kv_in.shape[1], N_HEADS, -1)
    att = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(q.shape[-1])
    att = jnp.where(mask_kv[:, None, None, :], att, -1e9)
    att = jax.nn.softmax(att, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(B, Nq, C)
    return _linear(p, f"{prefix}_o", out)


def _layer(p, i, xa, xb, xy_a, xy_b, va, vb):
    # pre-normed self attention within each image, then cross between them,
    # with LightGlue's concat-FFN update (norms keep 4 residual layers from
    # collapsing the feature distribution)
    def upd(x, msg):
        h = _layernorm(
            p, f"l{i}_ln_f", jnp.concatenate([x, msg], axis=-1)
        )
        return x + _linear(
            p, f"l{i}_ffn2", jax.nn.gelu(_linear(p, f"l{i}_ffn1", h))
        )

    def s_in(x):
        return _layernorm(p, f"l{i}_ln_s", x)

    def c_in(x):
        return _layernorm(p, f"l{i}_ln_c", x)

    xa = upd(xa, _mha(p, f"l{i}_self", s_in(xa), s_in(xa), xy_a, xy_a, va))
    xb = upd(xb, _mha(p, f"l{i}_self", s_in(xb), s_in(xb), xy_b, xy_b, vb))
    xa = upd(xa, _mha(p, f"l{i}_cross", c_in(xa), c_in(xb), xy_a, xy_b, vb))
    xb = upd(xb, _mha(p, f"l{i}_cross", c_in(xb), c_in(xa), xy_b, xy_a, va))
    return xa, xb


@partial(jax.jit, static_argnames=())
def lightglue_scores(
    params: Dict,
    desc_a: jax.Array,  # [K, D]
    desc_b: jax.Array,
    xy_a: jax.Array,  # [K, 2] normalized in [0, 1]
    xy_b: jax.Array,
    valid_a: jax.Array,
    valid_b: jax.Array,
):
    """Returns (scores [K, K], matchability_a [K], matchability_b [K])."""
    xa = _linear(params, "in_proj", desc_a)[None]
    xb = _linear(params, "in_proj", desc_b)[None]
    va, vb = valid_a[None], valid_b[None]
    pa, pb = xy_a[None], xy_b[None]
    for i in range(N_LAYERS):
        xa, xb = _layer(params, i, xa, xb, pa, pb, va, vb)
    fa = _linear(params, "final", xa)[0]
    fb = _linear(params, "final", xb)[0]
    fa = fa / jnp.maximum(jnp.linalg.norm(fa, axis=-1, keepdims=True), 1e-8)
    fb = fb / jnp.maximum(jnp.linalg.norm(fb, axis=-1, keepdims=True), 1e-8)
    sim = fa @ fb.T * 10.0
    ma = jax.nn.sigmoid(_linear(params, "matchability", xa)[0, :, 0])
    mb = jax.nn.sigmoid(_linear(params, "matchability", xb)[0, :, 0])
    return sim, ma, mb


def match_lightglue(
    params: Dict,
    desc_a: np.ndarray,
    desc_b: np.ndarray,
    xy_a: np.ndarray,  # pixel coords
    xy_b: np.ndarray,
    size_a: Tuple[int, int],  # (W, H)
    size_b: Tuple[int, int],
    valid_a: np.ndarray,
    valid_b: np.ndarray,
    min_score: float = 0.2,
):
    """Same contract as matching.match_descriptors: (idx_b [K], ok [K])
    via dual-softmax assignment weighted by matchability."""
    na = np.asarray(xy_a, np.float32) / np.asarray(size_a, np.float32)
    nb = np.asarray(xy_b, np.float32) / np.asarray(size_b, np.float32)
    sim, ma, mb = lightglue_scores(
        params, jnp.asarray(desc_a), jnp.asarray(desc_b),
        jnp.asarray(na), jnp.asarray(nb),
        jnp.asarray(valid_a), jnp.asarray(valid_b),
    )
    sim = jnp.where(valid_a[:, None] & valid_b[None, :], sim, -1e9)
    p_ab = jax.nn.softmax(sim, axis=1)
    p_ba = jax.nn.softmax(sim, axis=0)
    p = p_ab * p_ba * ma[:, None] * mb[None, :]
    idx_b = jnp.argmax(p, axis=1)
    best = jnp.max(p, axis=1)
    mutual = jnp.argmax(p, axis=0)[idx_b] == jnp.arange(p.shape[0])
    ok = (best > min_score) & mutual & valid_a
    return np.asarray(idx_b), np.asarray(ok)


def load_lightglue(checkpoint: Optional[str] = None, desc_dim: int = 128):
    params = init_lightglue(jax.random.PRNGKey(0), desc_dim)
    if checkpoint:
        import os

        if os.path.exists(checkpoint):
            z = np.load(checkpoint)
            params.update({k: jnp.asarray(z[k]) for k in z.files})
    return params
