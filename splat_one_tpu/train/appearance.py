"""Per-image appearance optimization: embedding + SH-basis MLP color head.

TPU-native equivalent of the reference ``AppearanceOptModule``
(utils/gsplat_utils/utils.py:51-114): per-image appearance embeddings
concatenated with per-gaussian features and the SH basis of the view
direction, passed through a small MLP that predicts a color adjustment.
Used when ``app_opt=True`` (reference gsplat_trainer.py:393-411, 599-610).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from splat_one_tpu.core.sh import eval_sh_bases, num_sh_bases

Params = Dict[str, jax.Array]


def init_appearance_params(
    key: jax.Array,
    n_images: int,
    feature_dim: int = 32,
    embed_dim: int = 16,
    sh_degree: int = 3,
    mlp_width: int = 64,
    mlp_depth: int = 2,
) -> Params:
    n_basis = num_sh_bases(sh_degree)
    in_dim = embed_dim + feature_dim + n_basis
    keys = jax.random.split(key, mlp_depth + 1)
    params: Params = {"embeds": jnp.zeros((n_images, embed_dim), jnp.float32)}
    dims = [in_dim] + [mlp_width] * (mlp_depth - 1) + [3]
    for i, (di, do) in enumerate(zip(dims[:-1], dims[1:])):
        params[f"w{i}"] = jax.random.normal(keys[i], (di, do)) * jnp.sqrt(
            2.0 / di
        )
        params[f"b{i}"] = jnp.zeros((do,), jnp.float32)
    return params


def appearance_color(
    params: Params,
    features: jax.Array,  # [N, feature_dim] per-gaussian
    image_ids: jax.Array,  # [C] int
    dirs: jax.Array,  # [C, N, 3] view directions (unnormalized ok)
    sh_degree: int = 3,
) -> jax.Array:
    """Color logits per (camera, gaussian): ``[C, N, 3]`` (caller applies
    sigmoid, reference gsplat_trainer.py:607-609)."""
    C = image_ids.shape[0]
    N = features.shape[0]
    d = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
    basis = eval_sh_bases(sh_degree, d)  # [C, N, B]
    emb = params["embeds"][image_ids]  # [C, E]
    emb = jnp.broadcast_to(emb[:, None, :], (C, N, emb.shape[-1]))
    feat = jnp.broadcast_to(features[None], (C, N, features.shape[-1]))
    h = jnp.concatenate([emb, feat, basis], axis=-1)
    i = 0
    while f"w{i}" in params:
        h = h @ params[f"w{i}"] + params[f"b{i}"]
        if f"w{i+1}" in params:
            h = jax.nn.relu(h)
        i += 1
    return h  # [C, N, 3]
