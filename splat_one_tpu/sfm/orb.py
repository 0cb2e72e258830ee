"""TPU-native ORB features: FAST corners + rotated (r)BRIEF descriptors.

Fills the reference's classical ``feature_type`` menu beyond SIFT
(reference surface: app/feature_extractor.py:68 offers AKAZE/SURF/SIFT/
HAHOG/ORB/ALIKED; OpenSfM's detect via config.yaml:7). Design is
vector-first rather than a translation of OpenCV's scalar scanning:

- FAST-9 corner test over the whole image at once: the 16 Bresenham-circle
  taps are 16 shifted copies of the image (pure VPU adds), the
  brighter/darker states pack into 16-bit masks, and "9 contiguous on a
  circle" is 8 successive ANDs of circularly-shifted masks on int32 —
  no per-pixel loops, no data-dependent branches.
- Harris corner response ranks candidates (the "ORB = oFAST + rBRIEF"
  paper's ranking), computed with separable box sums of the gradient
  products.
- Orientation by the intensity-centroid moments in a radius-8 disc
  (shifted-add moment accumulation, one pass).
- rBRIEF: 256 fixed coordinate pairs in a 31x31 patch, rotated by the
  keypoint orientation and sampled bilinearly (two [K, 256] gathers).
  Bits are emitted as +/-1/sqrt(256) float descriptors so the shared
  mutual-NN + Lowe-ratio matcher (dot-product similarity) is monotone in
  Hamming distance — no separate binary matcher needed.
- Scale: a static pyramid (factor 1.2) re-runs detection per level with a
  per-level keypoint budget; coordinates map back to level 0.

Multi-level detection runs per static level under one jit; everything is
fixed-shape (top_k per level).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from splat_one_tpu.sfm.features import Features

# 16 Bresenham circle offsets (radius 3), OpenCV tap order.
_CIRCLE = np.array(
    [
        (0, 3), (1, 3), (2, 2), (3, 1), (3, 0), (3, -1), (2, -2), (1, -3),
        (0, -3), (-1, -3), (-2, -2), (-3, -1), (-3, 0), (-3, 1), (-2, 2),
        (-1, 3),
    ],
    np.int32,
)  # (dy, dx)

N_BITS = 256
_PATCH = 15  # half-size of the BRIEF patch (31x31)


def _brief_pairs(seed: int = 7) -> np.ndarray:
    """[N_BITS, 4] (y1, x1, y2, x2) test pairs, i.i.d. gaussian sigma =
    patch/5 clipped to the patch (the BRIEF paper's G-II layout; the
    learned-pair table of ORB is proprietary-ish — a fixed seeded layout
    keeps descriptors deterministic across runs/platforms)."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(0.0, _PATCH / 5.0, size=(N_BITS, 4))
    return np.clip(pts, -_PATCH + 1, _PATCH - 1).astype(np.float32)


_PAIRS = _brief_pairs()


def _shift2(x, dy, dx):
    return jnp.roll(jnp.roll(x, dy, axis=0), dx, axis=1)


def _box_sum(x, r):
    """(2r+1)^2 box sum via two separable shifted-add passes."""
    for axis in (0, 1):
        acc = x
        for d in range(1, r + 1):
            acc = acc + jnp.roll(x, d, axis=axis) + jnp.roll(
                x, -d, axis=axis)
        x = acc
    return x


def _fast_score(image: jax.Array, thresh: float):
    """FAST-9 corner mask + Harris response for ranking."""
    H, W = image.shape
    taps = jnp.stack(
        [_shift2(image, -int(dy), -int(dx)) for dy, dx in _CIRCLE]
    )  # [16, H, W]; tap k = image[y + dy_k, x + dx_k]
    brighter = taps > image[None] + thresh
    darker = taps < image[None] - thresh

    def arc9(bits):
        # bits [16, H, W] bool -> any 9 circularly-contiguous all-true:
        # pack to one int32 plane and AND 8 shifted copies.
        m = jnp.zeros((H, W), jnp.int32)
        for k in range(16):
            m = m | (bits[k].astype(jnp.int32) << k)
        m = m | (m << 16)  # duplicate for circular runs
        acc = m
        for s in range(1, 9):
            acc = acc & (m >> s)
        return (acc & 0xFFFF) != 0

    corner = arc9(brighter) | arc9(darker)
    # Harris response (k = 0.04) on Sobel-ish central differences
    gx = 0.5 * (_shift2(image, 0, -1) - _shift2(image, 0, 1))
    gy = 0.5 * (_shift2(image, -1, 0) - _shift2(image, 1, 0))
    sxx = _box_sum(gx * gx, 2)
    syy = _box_sum(gy * gy, 2)
    sxy = _box_sum(gx * gy, 2)
    harris = sxx * syy - sxy * sxy - 0.04 * (sxx + syy) ** 2
    # exclude borders (circle radius + BRIEF patch + rotation margin)
    b = _PATCH + 7
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inb = (yy >= b) & (yy < H - b) & (xx >= b) & (xx < W - b)
    return corner & inb, harris


def _orientation(image: jax.Array, ys, xs):
    """Intensity-centroid orientation in a radius-8 disc at (ys, xs)."""
    r = 8
    dy, dx = np.mgrid[-r:r + 1, -r:r + 1]
    disc = (dy * dy + dx * dx) <= r * r
    dyf = dy[disc].astype(np.float32)
    dxf = dx[disc].astype(np.float32)
    py = ys[:, None] + jnp.asarray(dy[disc], jnp.int32)[None, :]
    px = xs[:, None] + jnp.asarray(dx[disc], jnp.int32)[None, :]
    vals = image[py, px]  # [K, n_disc]
    m10 = jnp.sum(vals * jnp.asarray(dxf)[None], axis=1)
    m01 = jnp.sum(vals * jnp.asarray(dyf)[None], axis=1)
    return jnp.arctan2(m01, m10)


def _brief_bits(image: jax.Array, ys, xs, theta):
    """Rotated-BRIEF bits at integer keypoints -> [K, N_BITS] in {0, 1}."""
    pairs = jnp.asarray(_PAIRS)  # [N, 4] (y1, x1, y2, x2)
    c, s = jnp.cos(theta), jnp.sin(theta)  # [K]

    def sample(py, px):
        # bilinear at offsets rotated by +theta (pattern follows the
        # centroid direction: sampling then commutes with image rotation)
        fx = xs[:, None] + px[None, :] * c[:, None] - py[None, :] * (
            s[:, None])
        fy = ys[:, None] + px[None, :] * s[:, None] + py[None, :] * (
            c[:, None])
        y0 = jnp.floor(fy)
        x0 = jnp.floor(fx)
        wy = fy - y0
        wx = fx - x0
        y0i = y0.astype(jnp.int32)
        x0i = x0.astype(jnp.int32)
        v00 = image[y0i, x0i]
        v01 = image[y0i, x0i + 1]
        v10 = image[y0i + 1, x0i]
        v11 = image[y0i + 1, x0i + 1]
        return (
            v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx
            + v10 * wy * (1 - wx) + v11 * wy * wx
        )

    a = sample(pairs[:, 0], pairs[:, 1])
    b = sample(pairs[:, 2], pairs[:, 3])
    return (a < b).astype(jnp.float32)


def _resize_half_steps(image: jax.Array, scale: float):
    """Bilinear resize by 1/scale (static output shape)."""
    H, W = image.shape
    oh, ow = int(round(H / scale)), int(round(W / scale))
    sy = (jnp.arange(oh, dtype=jnp.float32) + 0.5) * (H / oh) - 0.5
    sx = (jnp.arange(ow, dtype=jnp.float32) + 0.5) * (W / ow) - 0.5
    y0 = jnp.clip(jnp.floor(sy), 0, H - 2).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(sx), 0, W - 2).astype(jnp.int32)
    fy = jnp.clip(sy - y0, 0.0, 1.0)[:, None]
    fx = jnp.clip(sx - x0, 0.0, 1.0)[None, :]
    g = image[y0][:, x0]
    gr = image[y0][:, x0 + 1]
    gd = image[y0 + 1][:, x0]
    gdr = image[y0 + 1][:, x0 + 1]
    return (
        g * (1 - fy) * (1 - fx) + gr * (1 - fy) * fx
        + gd * fy * (1 - fx) + gdr * fy * fx
    )


@partial(jax.jit, static_argnames=("max_keypoints", "n_levels"))
def extract_orb(
    image: jax.Array,  # [H, W] grayscale in [0, 1]
    max_keypoints: int = 2048,
    fast_threshold: float = 0.06,
    n_levels: int = 4,
    scale_factor: float = 1.2,
) -> Features:
    """ORB features in the shared ``Features`` layout. Descriptors are
    +/-1/sqrt(256) floats (unit L2), so dot-product similarity equals
    1 - 2*hamming/256 and the standard matcher applies unchanged."""
    per_level = -(-max_keypoints // n_levels)
    all_xy, all_scale, all_theta, all_desc, all_score = [], [], [], [], []
    img_l = image
    for lvl in range(n_levels):
        lscale = scale_factor ** lvl
        if lvl > 0:
            img_l = _resize_half_steps(image, lscale)
        corner, harris = _fast_score(img_l, fast_threshold)
        resp = jnp.where(corner, harris, -jnp.inf)
        # 3x3 NMS on the response
        mx = jax.lax.reduce_window(
            resp, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
        )
        flat = jnp.where((resp >= mx) & corner, resp, -jnp.inf).reshape(-1)
        top, idx = jax.lax.top_k(flat, per_level)
        ok = jnp.isfinite(top)
        Wl = img_l.shape[1]
        ys = jnp.clip(idx // Wl, _PATCH + 7,
                      img_l.shape[0] - _PATCH - 8)
        xs = jnp.clip(idx % Wl, _PATCH + 7, Wl - _PATCH - 8)
        theta = _orientation(img_l, ys, xs)
        bits = _brief_bits(img_l, ys, xs, theta)
        desc = (bits * 2.0 - 1.0) / np.sqrt(float(N_BITS))
        all_xy.append(
            jnp.stack([xs.astype(jnp.float32), ys.astype(jnp.float32)],
                      axis=-1) * lscale)
        all_scale.append(jnp.full((per_level,), lscale))
        all_theta.append(theta)
        all_desc.append(jnp.where(ok[:, None], desc, 0.0))
        all_score.append(jnp.where(ok, top, 0.0))
    xys = jnp.concatenate(all_xy)
    scores = jnp.concatenate(all_score)
    valid = scores > 0
    # keep the global top max_keypoints by response
    sel_score, sel = jax.lax.top_k(
        jnp.where(valid, scores, -jnp.inf), max_keypoints)
    return Features(
        xys=xys[sel],
        scales=jnp.concatenate(all_scale)[sel],
        orientations=jnp.concatenate(all_theta)[sel],
        descriptors=jnp.concatenate(all_desc)[sel],
        scores=jnp.where(jnp.isfinite(sel_score), sel_score, 0.0),
        valid=jnp.isfinite(sel_score) & (sel_score > 0),
    )


@partial(jax.jit, static_argnames=("max_keypoints",))
def extract_harris(
    image: jax.Array,
    max_keypoints: int = 2048,
    corner_threshold: float = 1e-6,
) -> Features:
    """HAHOG-style features: Harris corners + the rotated-BRIEF sampler's
    gradient-orientation + oriented binary descriptor (OpenSfM's HAHOG is
    Harris-affine + HOG; here the shared oriented-patch descriptor keeps
    the Features contract and Hamming-compatible matching)."""
    corner, harris = _fast_score(image, 1e9)  # corner mask unused (thresh
    # kills FAST); rank purely by Harris response over the valid interior
    del corner
    H, W = image.shape
    b = _PATCH + 7
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inb = (yy >= b) & (yy < H - b) & (xx >= b) & (xx < W - b)
    resp = jnp.where(inb & (harris > corner_threshold), harris, -jnp.inf)
    mx = jax.lax.reduce_window(
        resp, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    flat = jnp.where(resp >= mx, resp, -jnp.inf).reshape(-1)
    top, idx = jax.lax.top_k(flat, max_keypoints)
    ok = jnp.isfinite(top)
    ys = jnp.clip(idx // W, b, H - b - 1)
    xs = jnp.clip(idx % W, b, W - b - 1)
    theta = _orientation(image, ys, xs)
    bits = _brief_bits(image, ys, xs, theta)
    desc = (bits * 2.0 - 1.0) / np.sqrt(float(N_BITS))
    return Features(
        xys=jnp.stack([xs.astype(jnp.float32), ys.astype(jnp.float32)],
                      axis=-1),
        scales=jnp.full((max_keypoints,), 1.0),
        orientations=theta,
        descriptors=jnp.where(ok[:, None], desc, 0.0),
        scores=jnp.where(ok, top, 0.0),
        valid=ok & (top > 0),
    )
