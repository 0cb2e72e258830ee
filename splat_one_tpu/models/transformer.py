"""Shared transformer primitives (flat-dict params, pure JAX).

The building blocks common to the learned-model family (LightGlue
attention matcher, DA-V2 ViT, the compact trainable SAM tier): linear /
layernorm / multi-head attention / MLP / pre-norm block plus their
initializers. Attention is batched MXU matmuls -- no custom kernel needed
at these sizes (SURVEY.md L2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

def _linear(p, prefix, x):
    return x @ p[f"{prefix}_w"] + p[f"{prefix}_b"]


def _layernorm(p, prefix, x, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * p[f"{prefix}_g"] + p[f"{prefix}_b"]


def _attention(p, prefix, q_in, kv_in, n_heads):
    B, Nq, C = q_in.shape
    Nk = kv_in.shape[1]
    q = _linear(p, f"{prefix}_q", q_in).reshape(B, Nq, n_heads, -1)
    k = _linear(p, f"{prefix}_k", kv_in).reshape(B, Nk, n_heads, -1)
    v = _linear(p, f"{prefix}_v", kv_in).reshape(B, Nk, n_heads, -1)
    scale = 1.0 / jnp.sqrt(q.shape[-1])
    att = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    att = jax.nn.softmax(att, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(B, Nq, C)
    return _linear(p, f"{prefix}_o", out)


def _mlp(p, prefix, x):
    h = jax.nn.gelu(_linear(p, f"{prefix}_1", x))
    return _linear(p, f"{prefix}_2", h)


def _block(p, prefix, x, n_heads):
    x = x + _attention(
        p, f"{prefix}_attn", _layernorm(p, f"{prefix}_ln1", x),
        _layernorm(p, f"{prefix}_ln1", x), n_heads,
    )
    return x + _mlp(p, f"{prefix}_mlp", _layernorm(p, f"{prefix}_ln2", x))


def _init_linear(key, prefix, cin, cout, params):
    k1, _ = jax.random.split(key)
    params[f"{prefix}_w"] = (
        jax.random.normal(k1, (cin, cout)) * jnp.sqrt(2.0 / cin)
    )
    params[f"{prefix}_b"] = jnp.zeros((cout,))


def _init_ln(prefix, c, params):
    params[f"{prefix}_g"] = jnp.ones((c,))
    params[f"{prefix}_b"] = jnp.zeros((c,))


def _init_block(key, prefix, c, params, mlp_ratio=4):
    ks = jax.random.split(key, 6)
    for i, name in enumerate(("q", "k", "v", "o")):
        _init_linear(ks[i], f"{prefix}_attn_{name}", c, c, params)
    _init_linear(ks[4], f"{prefix}_mlp_1", c, c * mlp_ratio, params)
    _init_linear(ks[5], f"{prefix}_mlp_2", c * mlp_ratio, c, params)
    _init_ln(f"{prefix}_ln1", c, params)
    _init_ln(f"{prefix}_ln2", c, params)


