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

from splat_one_tpu.models.transformer import (
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


# ---------------------------------------------------------------------------
# checkpoint-faithful forward (official cvg/LightGlue numerics)
# ---------------------------------------------------------------------------
# The path above is a LightGlue-STYLE matcher for from-scratch training.
# This one consumes a converted official checkpoint verbatim (raw key names
# from scripts/convert_weights.py convert_lightglue) and reproduces the
# published forward: learnable-Fourier rotary encoding, SelfBlock with a
# fused Wqkv whose output interleaves as (heads, head_dim, 3), CrossBlock
# with shared qk projection and bidirectional softmax, concat-FFN with
# LayerNorm, and the sigmoid-log-double-softmax assignment head. Verified
# against a torch mirror in tests/test_weight_converters.py.


def _lg_lin(sd, name, x):
    w = sd[f"{name}.weight"]
    b = sd.get(f"{name}.bias")
    y = x @ w.T
    return y + b if b is not None else y


def _lg_ln(sd, name, x, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * sd[f"{name}.weight"] + sd[
        f"{name}.bias"]


def _lg_gelu(x):
    return 0.5 * x * (1.0 + jax.lax.erf(x / np.sqrt(2.0).astype(np.float32)))


def _rotate_half(x):
    x = x.reshape(x.shape[:-1] + (-1, 2))
    x1, x2 = x[..., 0], x[..., 1]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape[:-2] + (-1,))


def _lg_rotary_emb(sd, kpts, head_dim):
    """LearnableFourierPositionalEncoding: (cos, sin) [B, 1, N, head_dim],
    frequencies repeat-interleaved by 2."""
    proj = kpts @ sd["posenc.Wr.weight"].T  # [B, N, head_dim // 2]
    c = jnp.repeat(jnp.cos(proj), 2, axis=-1)[:, None]
    s = jnp.repeat(jnp.sin(proj), 2, axis=-1)[:, None]
    return c, s


def _lg_self_block(sd, p, x, emb, n_heads):
    B, N, d = x.shape
    hd = d // n_heads
    qkv = _lg_lin(sd, f"{p}.Wqkv", x)  # [B, N, 3d]
    # official unflatten(-1, (-1, head_dim, 3)).transpose(1, 2):
    # unit u = h * (hd * 3) + i * 3 + j  (j in {q, k, v})
    qkv = qkv.reshape(B, N, n_heads, hd, 3).transpose(0, 2, 1, 3, 4)
    q, k, v = qkv[..., 0], qkv[..., 1], qkv[..., 2]  # [B, h, N, hd]
    c, s = emb
    q = q * c + _rotate_half(q) * s
    k = k * c + _rotate_half(k) * s
    att = (q @ k.transpose(0, 1, 3, 2)) / np.sqrt(hd)
    att = jax.nn.softmax(att, axis=-1)
    ctx = att @ v  # [B, h, N, hd]
    msg = _lg_lin(sd, f"{p}.out_proj",
                  ctx.transpose(0, 2, 1, 3).reshape(B, N, d))
    h = jnp.concatenate([x, msg], axis=-1)
    h = _lg_lin(sd, f"{p}.ffn.0", h)
    h = _lg_ln(sd, f"{p}.ffn.1", h)
    h = _lg_gelu(h)
    return x + _lg_lin(sd, f"{p}.ffn.3", h)


def _lg_cross_block(sd, p, x0, x1, n_heads):
    B, _, d = x0.shape
    hd = d // n_heads

    def split(t):
        return t.reshape(B, -1, n_heads, hd).transpose(0, 2, 1, 3)

    qk0 = split(_lg_lin(sd, f"{p}.to_qk", x0))
    qk1 = split(_lg_lin(sd, f"{p}.to_qk", x1))
    v0 = split(_lg_lin(sd, f"{p}.to_v", x0))
    v1 = split(_lg_lin(sd, f"{p}.to_v", x1))
    scale = hd ** -0.5
    qk0 = qk0 * scale ** 0.5
    qk1 = qk1 * scale ** 0.5
    sim = qk0 @ qk1.transpose(0, 1, 3, 2)  # [B, h, N0, N1]
    m0 = jax.nn.softmax(sim, axis=-1) @ v1
    m1 = jax.nn.softmax(
        sim.transpose(0, 1, 3, 2), axis=-1) @ v0

    def out(x, m):
        msg = _lg_lin(sd, f"{p}.to_out",
                      m.transpose(0, 2, 1, 3).reshape(B, -1, d))
        h = jnp.concatenate([x, msg], axis=-1)
        h = _lg_lin(sd, f"{p}.ffn.0", h)
        h = _lg_ln(sd, f"{p}.ffn.1", h)
        h = _lg_gelu(h)
        return x + _lg_lin(sd, f"{p}.ffn.3", h)

    return out(x0, m0), out(x1, m1)


def _lg_assignment(sd, p, desc0, desc1):
    """MatchAssignment + sigmoid_log_double_softmax -> [B, m+1, n+1]."""
    m0 = _lg_lin(sd, f"{p}.final_proj", desc0)
    m1 = _lg_lin(sd, f"{p}.final_proj", desc1)
    d = m0.shape[-1]
    m0 = m0 / d ** 0.25
    m1 = m1 / d ** 0.25
    sim = jnp.einsum("bmd,bnd->bmn", m0, m1)
    z0 = _lg_lin(sd, f"{p}.matchability", desc0)  # [B, m, 1]
    z1 = _lg_lin(sd, f"{p}.matchability", desc1)  # [B, n, 1]
    ls = jax.nn.log_sigmoid
    cert = ls(z0) + ls(z1).transpose(0, 2, 1)  # [B, m, n]
    s0 = jax.nn.log_softmax(sim, axis=2)
    s1 = jax.nn.log_softmax(sim, axis=1)
    B, m, n = sim.shape
    scores = jnp.full((B, m + 1, n + 1), 0.0, sim.dtype)
    scores = scores.at[:, :m, :n].set(s0 + s1 + cert)
    scores = scores.at[:, :m, n].set(ls(-z0)[..., 0])
    scores = scores.at[:, m, :n].set(ls(-z1)[..., 0])
    return scores


def lightglue_forward_ckpt(sd: Dict, kpts0, kpts1, desc0, desc1,
                           size0, size1, n_heads: int = 4):
    """Official-LightGlue forward from a converted checkpoint.

    kpts [m, 2] pixel coords, desc [m, D]; size (W, H). Returns the final
    log-assignment matrix [m+1, n+1] (reference surface: LightGlue inside
    OpenSfM matching, app/feature_matching.py:96)."""
    def norm_kpts(k, size):
        size = jnp.asarray(size, jnp.float32)
        shift = size / 2.0
        scale = jnp.max(size) / 2.0
        return (k - shift) / scale

    k0 = norm_kpts(jnp.asarray(kpts0, jnp.float32), size0)[None]
    k1 = norm_kpts(jnp.asarray(kpts1, jnp.float32), size1)[None]
    x0 = _lg_lin(sd, "input_proj", jnp.asarray(desc0)[None])
    x1 = _lg_lin(sd, "input_proj", jnp.asarray(desc1)[None])
    d = x0.shape[-1]
    emb0 = _lg_rotary_emb(sd, k0, d // n_heads)
    emb1 = _lg_rotary_emb(sd, k1, d // n_heads)
    i = 0
    while f"transformers.{i}.self_attn.Wqkv.weight" in sd:
        p = f"transformers.{i}"
        x0 = _lg_self_block(sd, f"{p}.self_attn", x0, emb0, n_heads)
        x1 = _lg_self_block(sd, f"{p}.self_attn", x1, emb1, n_heads)
        x0, x1 = _lg_cross_block(sd, f"{p}.cross_attn", x0, x1, n_heads)
        i += 1
    return _lg_assignment(sd, f"log_assignment.{i - 1}", x0, x1)[0]


def filter_matches_ckpt(scores, threshold: float = 0.1):
    """Official filter_matches on a log-assignment matrix [m+1, n+1]:
    mutual argmax over the non-dustbin block, exp(max) > threshold."""
    inner = scores[:-1, :-1]
    m0 = jnp.argmax(inner, axis=1)
    m1 = jnp.argmax(inner, axis=0)
    mscores0 = jnp.exp(jnp.max(inner, axis=1))
    mutual = m1[m0] == jnp.arange(inner.shape[0])
    ok = mutual & (mscores0 > threshold)
    return np.asarray(m0), np.asarray(ok)


def load_lightglue(checkpoint: Optional[str] = None, desc_dim: int = 128):
    params = init_lightglue(jax.random.PRNGKey(0), desc_dim)
    if checkpoint:
        import os

        if os.path.exists(checkpoint):
            z = np.load(checkpoint)
            params.update({k: jnp.asarray(z[k]) for k in z.files})
    return params
