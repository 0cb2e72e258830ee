"""Learned keypoint detector/descriptor (ALIKED) in JAX.

Replacement for the reference's ALIKED feature extractor (SURVEY.md N10;
selected via ``feature_type: ALIKED``, config/config.yaml:7 +
app/feature_extractor.py:68 — the reference imports it from the LightGlue
package, an empty submodule here).

Two tiers share the ``sfm.features.Features`` contract:

1. **Checkpoint-faithful ALIKED** (``aliked_encoder`` + ``sddh_descriptors``
   + ``extract_aliked_ckpt``): the published architecture (Zhao et al.,
   "ALIKED: A Lighter Keypoint and Descriptor Extraction Network via
   Deformable Transformation", IEEE TIM 2023) — ConvBlock/ResBlock encoder
   over 1, 1/2, 1/8, 1/32 resolutions with SELU gates and BatchNorm,
   1x1-conv multi-scale aggregation concatenated to ``dim`` channels,
   sigmoid score-map head (SMH), and the SDDH deformable descriptor head
   (per-keypoint KxK patch -> offset conv -> M sampled positions ->
   bilinear feature sampling -> 1x1 sf_conv -> [M, C, C] aggregation).
   Parameters use the official state-dict key names verbatim, so
   ``scripts/convert_weights.py aliked`` output loads directly;
   ``tests/test_weight_converters.py`` asserts activation parity against a
   torch mirror of the same architecture. The keypoint detection itself
   (DKD) is parameter-free (NMS + sub-pixel soft-argmax) so it carries no
   conversion risk. NOTE (zero-egress caveat, documented not hidden): the
   SDDH offset-channel ordering ``[M, 2]`` and the absence of an offset
   clamp follow the paper's description; they are asserted only against
   the torch mirror here, not the unavailable official code.

2. **Trainable compact variant** (``init_aliked`` / ``aliked_forward`` /
   ``extract_aliked``): a small conv backbone with the same dense
   score+descriptor interface, used for from-scratch synthetic training
   (tests/test_models_trainability.py) where no checkpoint exists.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from splat_one_tpu.sfm.features import Features

# Official model configurations (c1..c4 block widths, aggregated dim,
# SDDH patch size K and sample count M).
ALIKED_CFGS = {
    "aliked-t16": dict(c1=8, c2=16, c3=32, c4=64, dim=64, K=3, M=16),
    "aliked-n16": dict(c1=16, c2=32, c3=64, c4=128, dim=128, K=3, M=16),
    "aliked-n16rot": dict(c1=16, c2=32, c3=64, c4=128, dim=128, K=3, M=16),
    "aliked-n32": dict(c1=16, c2=32, c3=64, c4=128, dim=128, K=3, M=32),
}


# --------------------------------------------------------------------------
# checkpoint-faithful tier
# --------------------------------------------------------------------------
def _conv2d(x, w, b=None, stride=1, padding="SAME"):
    """NHWC conv with HWIO weights (converter transposes torch OIHW)."""
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y if b is None else y + b


def _bn(p, name, x, eps=1e-5):
    """BatchNorm2d in eval mode (folded running stats). Checkpoints that
    ship without norm parameters (Identity norm) simply skip."""
    if f"{name}.running_mean" not in p:
        return x
    mean = p[f"{name}.running_mean"]
    var = p[f"{name}.running_var"]
    w = p.get(f"{name}.weight", jnp.ones_like(mean))
    b = p.get(f"{name}.bias", jnp.zeros_like(mean))
    return (x - mean) * (w * jax.lax.rsqrt(var + eps)) + b


def _conv_block(p, name, x):
    """conv3x3 -> BN -> SELU, twice."""
    x = jax.nn.selu(_bn(p, f"{name}.bn1", _conv2d(
        x, p[f"{name}.conv1.weight"])))
    x = jax.nn.selu(_bn(p, f"{name}.bn2", _conv2d(
        x, p[f"{name}.conv2.weight"])))
    return x


def _res_block(p, name, x):
    """Basic residual block with a plain 1x1-conv shortcut (the official
    blocks pass ``downsample=nn.Conv2d(cin, cout, 1)``, no norm on it)."""
    idn = x
    if f"{name}.downsample.weight" in p:
        idn = _conv2d(x, p[f"{name}.downsample.weight"],
                      p.get(f"{name}.downsample.bias"))
    out = jax.nn.selu(_bn(p, f"{name}.bn1", _conv2d(
        x, p[f"{name}.conv1.weight"])))
    out = _bn(p, f"{name}.bn2", _conv2d(out, p[f"{name}.conv2.weight"]))
    return jax.nn.selu(out + idn)


def _avg_pool(x, k):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
    ) / float(k * k)


def _upsample_bilinear(x, scale, out_hw):
    """Bilinear resize, align_corners=True (matches nn.Upsample(...,
    align_corners=True)): src = dst * (in - 1) / (out - 1)."""
    B, H, W, C = x.shape
    oh, ow = out_hw

    def axis_idx(n_in, n_out):
        if n_out == 1 or n_in == 1:
            return (jnp.zeros((n_out,), jnp.float32),) * 2 + (
                jnp.zeros((n_out,), jnp.float32),
            )
        src = jnp.arange(n_out, dtype=jnp.float32) * (
            (n_in - 1) / (n_out - 1)
        )
        i0 = jnp.clip(jnp.floor(src), 0, n_in - 1)
        i1 = jnp.clip(i0 + 1, 0, n_in - 1)
        return i0, i1, src - i0

    y0, y1, fy = axis_idx(H, oh)
    x0, x1, fx = axis_idx(W, ow)
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)
    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
    top = x[:, y0i][:, :, x0i] * (1 - fx)[None, None, :, None] + (
        x[:, y0i][:, :, x1i] * fx[None, None, :, None]
    )
    bot = x[:, y1i][:, :, x0i] * (1 - fx)[None, None, :, None] + (
        x[:, y1i][:, :, x1i] * fx[None, None, :, None]
    )
    return top * (1 - fy)[None, :, None, None] + (
        bot * fy[None, :, None, None]
    )


def aliked_encoder(params: Dict, image: jax.Array) -> Tuple[jax.Array,
                                                            jax.Array]:
    """image [B, H, W, 3] in [0, 1] -> (score_map [B, H, W],
    feature_map [B, H, W, dim] L2-normalized). H, W must be multiples of
    32 (the official extractor pads to that)."""
    p = params
    x1 = _conv_block(p, "block1", image)
    x2 = _res_block(p, "block2", _avg_pool(x1, 2))
    x3 = _res_block(p, "block3", _avg_pool(x2, 4))
    x4 = _res_block(p, "block4", _avg_pool(x3, 4))
    x1 = jax.nn.selu(_conv2d(x1, p["conv1.weight"], p.get("conv1.bias")))
    x2 = jax.nn.selu(_conv2d(x2, p["conv2.weight"], p.get("conv2.bias")))
    x3 = jax.nn.selu(_conv2d(x3, p["conv3.weight"], p.get("conv3.bias")))
    x4 = jax.nn.selu(_conv2d(x4, p["conv4.weight"], p.get("conv4.bias")))
    hw = image.shape[1:3]
    x1234 = jnp.concatenate(
        [
            x1,
            _upsample_bilinear(x2, 2, hw),
            _upsample_bilinear(x3, 8, hw),
            _upsample_bilinear(x4, 32, hw),
        ],
        axis=-1,
    )
    s = jax.nn.selu(_conv2d(x1234, p["score_head.0.weight"],
                            p.get("score_head.0.bias")))
    s = jax.nn.selu(_conv2d(s, p["score_head.2.weight"],
                            p.get("score_head.2.bias")))
    s = jax.nn.selu(_conv2d(s, p["score_head.4.weight"],
                            p.get("score_head.4.bias")))
    s = _conv2d(s, p["score_head.6.weight"], p.get("score_head.6.bias"))
    score = jax.nn.sigmoid(s)[..., 0]
    feat = x1234 / jnp.maximum(
        jnp.linalg.norm(x1234, axis=-1, keepdims=True), 1e-12
    )
    return score, feat


def _bilinear_sample(feat: jax.Array, pos: jax.Array) -> jax.Array:
    """grid_sample(bilinear, align_corners=True, zeros padding) at pixel
    positions. feat [H, W, C]; pos [..., 2] (x, y) -> [..., C]."""
    H, W, C = feat.shape
    x, y = pos[..., 0], pos[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    def tap(yi, xi):
        inb = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        v = feat[jnp.clip(yi, 0, H - 1).astype(jnp.int32),
                 jnp.clip(xi, 0, W - 1).astype(jnp.int32)]
        return jnp.where(inb[..., None], v, 0.0)

    return (
        tap(y0, x0) * ((1 - fx) * (1 - fy))[..., None]
        + tap(y0, x0 + 1) * (fx * (1 - fy))[..., None]
        + tap(y0 + 1, x0) * ((1 - fx) * fy)[..., None]
        + tap(y0 + 1, x0 + 1) * (fx * fy)[..., None]
    )


def sddh_descriptors(params: Dict, feat: jax.Array, kpts: jax.Array,
                     K: int = 3, M: int = 16) -> jax.Array:
    """SDDH deformable descriptor head at pixel keypoints.

    feat [H, W, dim] (the L2-normalized aggregate map); kpts [N, 2] (x, y)
    pixel coords -> desc [N, dim] L2-normalized. Per keypoint: the KxK
    patch at the rounded-down center runs through offset_conv (KxK valid
    conv -> SELU -> 1x1 conv) giving M (dx, dy) sample offsets; features
    are bilinearly sampled at center+offsets, mapped by the 1x1 sf_conv
    (+SELU), and aggregated with the learned [M, dim, dim] ``agg_weights``
    einsum."""
    p = params
    H, W, C = feat.shape
    N = kpts.shape[0]
    r = K // 2
    # KxK patches at integer centers, zero padding at borders
    cx = kpts[:, 0].astype(jnp.int32)
    cy = kpts[:, 1].astype(jnp.int32)
    fpad = jnp.pad(feat, ((r, r), (r, r), (0, 0)))
    offs = jnp.arange(K) - r
    py = cy[:, None, None] + offs[None, :, None] + r
    px = cx[:, None, None] + offs[None, None, :] + r
    patches = fpad[py, px]  # [N, K, K, C]
    # offset_conv: KxK VALID conv -> [N, 1, 1, 2M]
    o = jax.lax.conv_general_dilated(
        patches, p["desc_head.offset_conv.0.weight"], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["desc_head.offset_conv.0.bias"]
    o = jax.nn.selu(o)
    o = jnp.einsum("nc,cd->nd", o.reshape(N, -1),
                   p["desc_head.offset_conv.2.weight"].reshape(-1, 2 * M))
    o = o + p["desc_head.offset_conv.2.bias"]
    offsets = o.reshape(N, M, 2)  # (dx, dy) per sample position
    pos = kpts[:, None, :].astype(jnp.float32) + offsets  # [N, M, 2]
    sampled = _bilinear_sample(feat, pos)  # [N, M, C]
    sf_w = p["desc_head.sf_conv.weight"].reshape(C, C)  # 1x1 HWIO -> IO
    sampled = jax.nn.selu(jnp.einsum("nmc,cd->nmd", sampled, sf_w))
    agg = p["desc_head.agg_weights"]  # [M, C, C]
    desc = jnp.einsum("nmc,mcd->nd", sampled, agg)
    return desc / jnp.maximum(
        jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12
    )


def extract_aliked_ckpt(
    params: Dict,
    image: jax.Array,  # [H, W] grayscale or [H, W, 3] RGB in [0, 1]
    max_keypoints: int = 2048,
    score_threshold: float = 0.2,
    K: int | None = None,
    M: int | None = None,
) -> Features:
    """Checkpoint-faithful extraction: encoder -> DKD (parameter-free NMS +
    soft-argmax refinement) -> SDDH descriptors at refined keypoints.

    K (SDDH patch size) and M (sample positions) default to the loaded
    checkpoint's shapes — aliked-n32 ships M=32 while n16/t16 use M=16, so
    hardcoded defaults would crash the n32 offset_conv reshape."""
    if K is None:
        K = params["desc_head.offset_conv.0.weight"].shape[0]
    if M is None:
        M = params["desc_head.agg_weights"].shape[0]
    return _extract_aliked_ckpt(params, image, max_keypoints,
                                score_threshold, int(K), int(M))


@partial(jax.jit, static_argnames=("max_keypoints", "K", "M"))
def _extract_aliked_ckpt(
    params: Dict,
    image: jax.Array,
    max_keypoints: int = 2048,
    score_threshold: float = 0.2,
    K: int = 3,
    M: int = 16,
) -> Features:
    if image.ndim == 2:
        image = jnp.broadcast_to(image[..., None], image.shape + (3,))
    H, W = image.shape[:2]
    ph = (-H) % 32
    pw = (-W) % 32
    padded = jnp.pad(image, ((0, ph), (0, pw), (0, 0)))
    score, feat = aliked_encoder(params, padded[None])
    score, feat = score[0, :H, :W], feat[0, :H, :W]
    xy, scores, valid = _dkd_keypoints(score, max_keypoints,
                                       score_threshold)
    descs = sddh_descriptors(params, feat, xy, K=K, M=M)
    k = xy.shape[0]
    return Features(
        xys=xy,
        scales=jnp.full((k,), 2.0),
        orientations=jnp.zeros((k,)),
        descriptors=jnp.where(valid[:, None], descs, 0.0),
        scores=scores,
        valid=valid,
    )


def _dkd_keypoints(score: jax.Array, max_keypoints: int,
                   score_threshold: float):
    """Parameter-free keypoint decode: 3x3 NMS, top-K, soft-argmax
    sub-pixel refinement in the 3x3 window."""
    H, W = score.shape
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
    offs = jnp.array([-1, 0, 1])
    ny = jnp.clip(yi[:, None, None] + offs[None, :, None], 0, H - 1)
    nx = jnp.clip(xi[:, None, None] + offs[None, None, :], 0, W - 1)
    w = score[ny, nx]
    w = w / jnp.maximum(jnp.sum(w, axis=(1, 2), keepdims=True), 1e-8)
    dy = jnp.sum(w * offs[None, :, None], axis=(1, 2))
    dx = jnp.sum(w * offs[None, None, :], axis=(1, 2))
    xy = jnp.stack(
        [xi.astype(jnp.float32) + dx, yi.astype(jnp.float32) + dy], axis=-1
    )
    return xy, top, valid


def init_aliked_ckpt(key, cfg: str = "aliked-n16") -> Dict:
    """Random parameters in the official state-dict schema (HWIO convs) —
    for tests and synthetic-weight pipelines; real weights come from
    ``scripts/convert_weights.py aliked``."""
    c = ALIKED_CFGS[cfg]
    c1, c2, c3, c4, dim, K, M = (c["c1"], c["c2"], c["c3"], c["c4"],
                                 c["dim"], c["K"], c["M"])
    p: Dict = {}
    ks = iter(jax.random.split(key, 64))

    def conv(name, kk, cin, cout, bias=True):
        p[f"{name}.weight"] = jax.random.normal(
            next(ks), (kk, kk, cin, cout)) * np.sqrt(2.0 / (kk * kk * cin))
        if bias:
            p[f"{name}.bias"] = jnp.zeros((cout,))

    def bn(name, ch):
        p[f"{name}.weight"] = jnp.ones((ch,)) + 0.1 * jax.random.normal(
            next(ks), (ch,))
        p[f"{name}.bias"] = 0.1 * jax.random.normal(next(ks), (ch,))
        p[f"{name}.running_mean"] = 0.1 * jax.random.normal(next(ks), (ch,))
        p[f"{name}.running_var"] = jnp.ones((ch,)) + 0.1 * jnp.abs(
            jax.random.normal(next(ks), (ch,)))

    conv("block1.conv1", 3, 3, c1, bias=False)
    bn("block1.bn1", c1)
    conv("block1.conv2", 3, c1, c1, bias=False)
    bn("block1.bn2", c1)
    for name, cin, cout in (("block2", c1, c2), ("block3", c2, c3),
                            ("block4", c3, c4)):
        conv(f"{name}.conv1", 3, cin, cout, bias=False)
        bn(f"{name}.bn1", cout)
        conv(f"{name}.conv2", 3, cout, cout, bias=False)
        bn(f"{name}.bn2", cout)
        conv(f"{name}.downsample", 1, cin, cout)
    for i, ch in enumerate((c1, c2, c3, c4), start=1):
        conv(f"conv{i}", 1, ch, dim // 4)
    conv("score_head.0", 1, dim, 8)
    conv("score_head.2", 3, 8, 4)
    conv("score_head.4", 3, 4, 4)
    conv("score_head.6", 3, 4, 1)
    conv("desc_head.offset_conv.0", K, dim, 2 * M)
    conv("desc_head.offset_conv.2", 1, 2 * M, 2 * M)
    conv("desc_head.sf_conv", 1, dim, dim, bias=False)
    p["desc_head.agg_weights"] = jax.random.normal(
        next(ks), (M, dim, dim)) * 0.1
    return p


# --------------------------------------------------------------------------
# trainable compact tier (from-scratch synthetic training; no checkpoint)
# --------------------------------------------------------------------------
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
    returned in the shared Features layout (compact trainable tier; the
    checkpoint tier is ``extract_aliked_ckpt``)."""
    H, W = image.shape
    score, desc = aliked_forward(params, image[None, ..., None])
    score, desc = score[0], desc[0]
    xy, top, valid = _dkd_keypoints(score, max_keypoints, score_threshold)
    yi = jnp.clip(xy[:, 1].astype(jnp.int32), 0, H - 1)
    xi = jnp.clip(xy[:, 0].astype(jnp.int32), 0, W - 1)
    descs = desc[yi, xi]
    k = xy.shape[0]
    return Features(
        xys=xy,
        scales=jnp.full((k,), 2.0),
        orientations=jnp.zeros((k,)),
        descriptors=jnp.where(valid[:, None], descs, 0.0),
        scores=top,
        valid=valid,
    )


def load_aliked(checkpoint: Optional[str] = None, desc_dim: int = 128):
    """Load converted ALIKED weights. A checkpoint in the official
    state-dict schema (``block1.conv1.weight`` present) selects the
    faithful tier; otherwise the compact trainable tier is initialized
    (and optionally overlaid from a matching npz)."""
    if checkpoint:
        import os

        if os.path.exists(checkpoint):
            z = np.load(checkpoint)
            if "block1.conv1.weight" in z.files:
                return {k: jnp.asarray(z[k]) for k in z.files}
            params = init_aliked(jax.random.PRNGKey(0), desc_dim)
            params.update({k: jnp.asarray(z[k]) for k in z.files})
            return params
    return init_aliked(jax.random.PRNGKey(0), desc_dim)
