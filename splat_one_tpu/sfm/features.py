"""Feature detection + description in pure JAX (batched, static shapes).

TPU-native replacement for OpenSfM's feature extraction backends
(reference capability surface: ``detect_features`` action with
AKAZE/SIFT/SURF/HAHOG/ORB/ALIKED types and ``feature_process_size`` /
``feature_min_frames`` config, app/feature_extractor.py:68,274-287 +
config/config.yaml:4-20). This implements a DoG (SIFT-style) detector with
gradient-orientation-histogram descriptors:

  - Gaussian scale pyramid -> DoG extrema (3x3x3 non-max, contrast + edge
    rejection), fixed top-K keypoints per image (static shapes — the TPU
    analog of ``feature_min_frames``),
  - per-keypoint dominant orientation (36-bin histogram),
  - 4x4x8 gradient-histogram descriptor over an oriented patch, L2 + root
    normalization.

Everything vmaps over keypoints and jits per image size; the per-image
entry point is ``extract_features``. Keypoint coordinates are returned in
*normalized image coordinates* (OpenSfM convention: centered, scaled by the
larger dimension) plus pixel coordinates.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Features(NamedTuple):
    xys: jax.Array  # [K, 2] pixel coords (x, y)
    scales: jax.Array  # [K] detection scale (pixels)
    orientations: jax.Array  # [K] radians
    descriptors: jax.Array  # [K, 128] L2-normalized
    scores: jax.Array  # [K] detection response
    valid: jax.Array  # [K] bool


def _gaussian_blur(img: jax.Array, sigma: float) -> jax.Array:
    radius = max(1, int(3.0 * sigma + 0.5))
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)
    img4 = img[None, :, :, None]
    h = jax.lax.conv_general_dilated(
        img4, k.reshape(1, -1, 1, 1), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    v = jax.lax.conv_general_dilated(
        h, k.reshape(-1, 1, 1, 1), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return v[0, :, :, 0]


@partial(jax.jit, static_argnames=("max_keypoints", "n_scales"))
def extract_features(
    image: jax.Array,  # [H, W] grayscale float in [0, 1]
    max_keypoints: int = 2048,
    n_scales: int = 5,
    contrast_threshold: float = 0.015,
    edge_ratio: float = 10.0,
) -> Features:
    H, W = image.shape
    # n_scales USABLE levels: build two extra DoG levels so every usable
    # level has a full 3x3x3 scale neighborhood (SIFT computes s+3
    # gaussians for s usable octave levels)
    n_dog = n_scales + 2
    # shifted one step finer so interior level 1 keeps the previous
    # finest usable scale (sigma 1.2)
    sigmas = [1.2 * (1.6 ** (i - 1)) for i in range(n_dog + 1)]
    blurred = [ _gaussian_blur(image, s) for s in sigmas ]
    dogs = jnp.stack(
        [blurred[i + 1] - blurred[i] for i in range(n_dog)]
    )  # [n_dog, H, W]

    # 3x3x3 local extrema over the INTERIOR levels only: a plain roll
    # would WRAP level 0 against the coarsest level and accept/reject
    # extrema based on an unrelated scale (sfm review r2); the two extra
    # DoG levels above keep the usable-scale coverage unchanged
    def shift2(x, dy, dx):
        return jnp.roll(jnp.roll(x, dy, axis=-2), dx, axis=-1)

    neighborhood = jnp.stack(
        [
            shift2(jnp.roll(dogs, ds, axis=0), dy, dx)
            for ds in (-1, 0, 1)
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
            if not (ds == 0 and dy == 0 and dx == 0)
        ]
    )
    is_max = jnp.all(dogs[None] > neighborhood, axis=0)
    is_min = jnp.all(dogs[None] < neighborhood, axis=0)
    resp = jnp.abs(dogs)
    cand = (is_max | is_min) & (resp > contrast_threshold)
    s_grid = jax.lax.broadcasted_iota(jnp.int32, dogs.shape, 0)
    cand &= (s_grid > 0) & (s_grid < n_dog - 1)
    # edge rejection via Hessian trace/det ratio on the DoG
    dxx = shift2(dogs, 0, 1) + shift2(dogs, 0, -1) - 2 * dogs
    dyy = shift2(dogs, 1, 0) + shift2(dogs, -1, 0) - 2 * dogs
    dxy = 0.25 * (
        shift2(dogs, 1, 1) + shift2(dogs, -1, -1)
        - shift2(dogs, 1, -1) - shift2(dogs, -1, 1)
    )
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    r = edge_ratio
    edge_ok = (det > 0) & (tr * tr * r < (r + 1) ** 2 * det)
    cand &= edge_ok
    # keep away from borders: the 16x16 descriptor grid samples out to
    # ~8.5*scale px, so the exclusion must grow with the level's sigma or
    # coarse-scale keypoints near edges build descriptors from clamped
    # repeated pixels (unstable matching)
    borders = jnp.asarray(
        [max(20, int(np.ceil(4.5 * s_))) for s_ in sigmas[:n_dog]],
        jnp.int32,
    )[:, None, None]
    ys = jax.lax.broadcasted_iota(jnp.int32, dogs.shape, 1)
    xs = jax.lax.broadcasted_iota(jnp.int32, dogs.shape, 2)
    cand &= (ys >= borders) & (ys < H - borders)
    cand &= (xs >= borders) & (xs < W - borders)

    score = jnp.where(cand, resp, 0.0).reshape(-1)
    k = min(max_keypoints, score.shape[0])
    top_scores, top_idx = jax.lax.top_k(score, k)
    valid = top_scores > 0
    s_idx = top_idx // (H * W)
    rem = top_idx % (H * W)
    yi = rem // W
    xi = rem % W
    # subpixel refinement: 2D quadratic fit on the DoG (SIFT-style —
    # integer localization alone costs ~0.5 px of matching accuracy)
    gx_d = 0.5 * (shift2(dogs, 0, -1) - shift2(dogs, 0, 1))
    gy_d = 0.5 * (shift2(dogs, -1, 0) - shift2(dogs, 1, 0))
    g1 = gx_d[s_idx, yi, xi]
    g2 = gy_d[s_idx, yi, xi]
    h11 = dxx[s_idx, yi, xi]
    h22 = dyy[s_idx, yi, xi]
    h12 = dxy[s_idx, yi, xi]
    det_h = h11 * h22 - h12 * h12
    det_h = jnp.where(jnp.abs(det_h) < 1e-12, 1e-12, det_h)
    off_x = -(h22 * g1 - h12 * g2) / det_h
    off_y = -(h11 * g2 - h12 * g1) / det_h
    off_x = jnp.clip(off_x, -0.5, 0.5)
    off_y = jnp.clip(off_y, -0.5, 0.5)
    y = yi.astype(jnp.float32) + off_y
    x = xi.astype(jnp.float32) + off_x
    scale = jnp.asarray(sigmas[:-1], jnp.float32)[s_idx]

    # gradients of the matching blurred level
    grad_x = jnp.stack(
        [0.5 * (shift2(b, 0, -1) - shift2(b, 0, 1)) for b in blurred[:-1]]
    )
    grad_y = jnp.stack(
        [0.5 * (shift2(b, -1, 0) - shift2(b, 1, 0)) for b in blurred[:-1]]
    )

    def bilinear(level_maps, s_i, yy, xx):
        m = level_maps[s_i]
        x0 = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, W - 2)
        y0 = jnp.clip(jnp.floor(yy).astype(jnp.int32), 0, H - 2)
        fx = xx - x0
        fy = yy - y0
        return (
            m[y0, x0] * (1 - fx) * (1 - fy)
            + m[y0, x0 + 1] * fx * (1 - fy)
            + m[y0 + 1, x0] * (1 - fx) * fy
            + m[y0 + 1, x0 + 1] * fx * fy
        )

    def orientation(s_i, yy, xx, sc):
        # 36-bin orientation histogram over a scale-proportional window
        rr = jnp.arange(-8, 9, dtype=jnp.float32)
        dy, dx = jnp.meshgrid(rr, rr, indexing="ij")
        rad = sc * 0.75
        py = yy + dy * rad / 4.0
        px = xx + dx * rad / 4.0
        gx = bilinear(grad_x, s_i, py, px)
        gy = bilinear(grad_y, s_i, py, px)
        mag = jnp.sqrt(gx * gx + gy * gy + 1e-12)
        ang = jnp.arctan2(gy, gx)
        w = jnp.exp(-(dx * dx + dy * dy) / (2 * 6.0 ** 2))
        bins = jnp.floor((ang + jnp.pi) / (2 * jnp.pi) * 36).astype(
            jnp.int32
        ) % 36
        hist = jnp.zeros(36).at[bins.reshape(-1)].add(
            (mag * w).reshape(-1)
        )
        b = jnp.argmax(hist)
        return (b.astype(jnp.float32) + 0.5) / 36.0 * 2 * jnp.pi - jnp.pi

    def descriptor(s_i, yy, xx, sc, theta):
        # 16x16 samples -> 4x4 spatial x 8 orientation bins
        rr = jnp.arange(-7.5, 8.5, dtype=jnp.float32)
        v, u = jnp.meshgrid(rr, rr, indexing="ij")
        ct, st = jnp.cos(theta), jnp.sin(theta)
        step = sc * 0.8
        px = xx + (u * ct - v * st) * step
        py = yy + (u * st + v * ct) * step
        gx = bilinear(grad_x, s_i, py, px)
        gy = bilinear(grad_y, s_i, py, px)
        mag = jnp.sqrt(gx * gx + gy * gy + 1e-12)
        ang = jnp.arctan2(gy, gx) - theta
        w = jnp.exp(-(u * u + v * v) / (2 * 8.0 ** 2))
        obin = jnp.floor((ang + 3 * jnp.pi) / (2 * jnp.pi) * 8).astype(
            jnp.int32
        ) % 8
        sx = jnp.clip(((u + 8.0) / 4.0).astype(jnp.int32), 0, 3)
        sy = jnp.clip(((v + 8.0) / 4.0).astype(jnp.int32), 0, 3)
        flat_bin = (sy * 4 + sx) * 8 + obin
        desc = jnp.zeros(128).at[flat_bin.reshape(-1)].add(
            (mag * w).reshape(-1)
        )
        # SIFT-style normalize -> clip 0.2 -> renormalize, then rootSIFT
        desc = desc / jnp.maximum(jnp.linalg.norm(desc), 1e-8)
        desc = jnp.minimum(desc, 0.2)
        desc = desc / jnp.maximum(jnp.linalg.norm(desc), 1e-8)
        desc = jnp.sqrt(desc)
        return desc

    thetas = jax.vmap(orientation)(s_idx, y, x, scale)
    descs = jax.vmap(descriptor)(s_idx, y, x, scale, thetas)
    return Features(
        xys=jnp.stack([x, y], axis=-1),
        scales=scale,
        orientations=thetas,
        descriptors=jnp.where(valid[:, None], descs, 0.0),
        scores=top_scores,
        valid=valid,
    )


def _hog_machinery(grad_x, grad_y, H, W):
    """Orientation + 128-D HOG descriptor closures over per-level gradient
    stacks [L, H, W] — shared by the SIFT (DoG) and HAHOG (Hessian)
    tiers."""

    def bilinear(level_maps, s_i, yy, xx):
        m = level_maps[s_i]
        x0 = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, W - 2)
        y0 = jnp.clip(jnp.floor(yy).astype(jnp.int32), 0, H - 2)
        fx = xx - x0
        fy = yy - y0
        return (
            m[y0, x0] * (1 - fx) * (1 - fy)
            + m[y0, x0 + 1] * fx * (1 - fy)
            + m[y0 + 1, x0] * (1 - fx) * fy
            + m[y0 + 1, x0 + 1] * fx * fy
        )

    def orientation(s_i, yy, xx, sc):
        rr = jnp.arange(-8, 9, dtype=jnp.float32)
        dy, dx = jnp.meshgrid(rr, rr, indexing="ij")
        rad = sc * 0.75
        py = yy + dy * rad / 4.0
        px = xx + dx * rad / 4.0
        gx = bilinear(grad_x, s_i, py, px)
        gy = bilinear(grad_y, s_i, py, px)
        mag = jnp.sqrt(gx * gx + gy * gy + 1e-12)
        ang = jnp.arctan2(gy, gx)
        w = jnp.exp(-(dx * dx + dy * dy) / (2 * 6.0 ** 2))
        bins = jnp.floor((ang + jnp.pi) / (2 * jnp.pi) * 36).astype(
            jnp.int32
        ) % 36
        hist = jnp.zeros(36).at[bins.reshape(-1)].add(
            (mag * w).reshape(-1)
        )
        b = jnp.argmax(hist)
        return (b.astype(jnp.float32) + 0.5) / 36.0 * 2 * jnp.pi - jnp.pi

    def descriptor(s_i, yy, xx, sc, theta):
        rr = jnp.arange(-7.5, 8.5, dtype=jnp.float32)
        v, u = jnp.meshgrid(rr, rr, indexing="ij")
        ct, st = jnp.cos(theta), jnp.sin(theta)
        step = sc * 0.8
        px = xx + (u * ct - v * st) * step
        py = yy + (u * st + v * ct) * step
        gx = bilinear(grad_x, s_i, py, px)
        gy = bilinear(grad_y, s_i, py, px)
        mag = jnp.sqrt(gx * gx + gy * gy + 1e-12)
        ang = jnp.arctan2(gy, gx) - theta
        w = jnp.exp(-(u * u + v * v) / (2 * 8.0 ** 2))
        obin = jnp.floor((ang + 3 * jnp.pi) / (2 * jnp.pi) * 8).astype(
            jnp.int32
        ) % 8
        sx = jnp.clip(((u + 8.0) / 4.0).astype(jnp.int32), 0, 3)
        sy = jnp.clip(((v + 8.0) / 4.0).astype(jnp.int32), 0, 3)
        flat_bin = (sy * 4 + sx) * 8 + obin
        desc = jnp.zeros(128).at[flat_bin.reshape(-1)].add(
            (mag * w).reshape(-1)
        )
        desc = desc / jnp.maximum(jnp.linalg.norm(desc), 1e-8)
        desc = jnp.minimum(desc, 0.2)
        desc = desc / jnp.maximum(jnp.linalg.norm(desc), 1e-8)
        return jnp.sqrt(desc)

    return orientation, descriptor


@partial(jax.jit, static_argnames=("max_keypoints", "n_scales"))
def extract_hahog(
    image: jax.Array,  # [H, W] grayscale float in [0, 1]
    max_keypoints: int = 2048,
    n_scales: int = 5,
    peak_threshold: float = 1e-5,  # hahog_peak_threshold (config.yaml:36)
    edge_threshold: float = 10.0,  # hahog_edge_threshold (config.yaml:37)
) -> Features:
    """HAHOG tier: Hessian detector + 128-D gradient-histogram (HOG)
    descriptor — the reference's OpenSfM HAHOG backend
    (feature_extractor.py:68; config.yaml:35-38 params honored).

    Detection is the scale-normalized determinant of the image Hessian
    (sigma^4 * det H) over a Gaussian pyramid with 3x3x3 scale-space NMS,
    edge rejection by the trace^2/det ratio, and subpixel quadratic
    refinement; description is the same rootSIFT-normalized 4x4x8
    gradient-orientation histogram the SIFT tier uses (HAHOG = Hessian
    Affine + HOG; the affine shape adaptation iteration is not
    implemented — keypoints use circular regions, documented honestly)."""
    H, W = image.shape
    sigmas = [1.2 * (1.6 ** i) for i in range(n_scales + 2)]
    blurred = [_gaussian_blur(image, s) for s in sigmas]

    def shift2(x, dy, dx):
        return jnp.roll(jnp.roll(x, dy, axis=-2), dx, axis=-1)

    responses = []
    for i, b in enumerate(blurred):
        dxx = shift2(b, 0, 1) + shift2(b, 0, -1) - 2 * b
        dyy = shift2(b, 1, 0) + shift2(b, -1, 0) - 2 * b
        dxy = 0.25 * (shift2(b, 1, 1) + shift2(b, -1, -1)
                      - shift2(b, 1, -1) - shift2(b, -1, 1))
        det = dxx * dyy - dxy * dxy
        tr = dxx + dyy
        r = edge_threshold
        edge_ok = (det > 0) & (tr * tr * r < (r + 1) ** 2 * det)
        responses.append(jnp.where(edge_ok, det * sigmas[i] ** 4, 0.0))
    resp = jnp.stack(responses)  # [L, H, W]

    neighborhood = jnp.stack([
        shift2(jnp.roll(resp, ds, axis=0), dy, dx)
        for ds in (-1, 0, 1) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
        if not (ds == 0 and dy == 0 and dx == 0)
    ])
    cand = jnp.all(resp[None] > neighborhood, axis=0) & (
        resp > peak_threshold)
    s_grid = jax.lax.broadcasted_iota(jnp.int32, resp.shape, 0)
    cand &= (s_grid > 0) & (s_grid < len(blurred) - 1)
    borders = jnp.asarray(
        [max(20, int(np.ceil(4.5 * s_))) for s_ in sigmas], jnp.int32
    )[:, None, None]
    ys_g = jax.lax.broadcasted_iota(jnp.int32, resp.shape, 1)
    xs_g = jax.lax.broadcasted_iota(jnp.int32, resp.shape, 2)
    cand &= (ys_g >= borders) & (ys_g < H - borders)
    cand &= (xs_g >= borders) & (xs_g < W - borders)

    score = jnp.where(cand, resp, 0.0).reshape(-1)
    k = min(max_keypoints, score.shape[0])
    top_scores, top_idx = jax.lax.top_k(score, k)
    valid = top_scores > 0
    s_idx = top_idx // (H * W)
    rem = top_idx % (H * W)
    yi = rem // W
    xi = rem % W
    # subpixel: 1D quadratic per axis on the response
    gx_r = 0.5 * (shift2(resp, 0, -1) - shift2(resp, 0, 1))
    gy_r = 0.5 * (shift2(resp, -1, 0) - shift2(resp, 1, 0))
    hxx = shift2(resp, 0, 1) + shift2(resp, 0, -1) - 2 * resp
    hyy = shift2(resp, 1, 0) + shift2(resp, -1, 0) - 2 * resp
    off_x = jnp.clip(gx_r[s_idx, yi, xi] / jnp.where(
        jnp.abs(hxx[s_idx, yi, xi]) > 1e-12, -hxx[s_idx, yi, xi],
        1e-12), -0.5, 0.5)
    off_y = jnp.clip(gy_r[s_idx, yi, xi] / jnp.where(
        jnp.abs(hyy[s_idx, yi, xi]) > 1e-12, -hyy[s_idx, yi, xi],
        1e-12), -0.5, 0.5)
    y = yi.astype(jnp.float32) + off_y
    x = xi.astype(jnp.float32) + off_x
    scale = jnp.asarray(sigmas, jnp.float32)[s_idx]

    grad_x = jnp.stack(
        [0.5 * (shift2(b, 0, -1) - shift2(b, 0, 1)) for b in blurred])
    grad_y = jnp.stack(
        [0.5 * (shift2(b, -1, 0) - shift2(b, 1, 0)) for b in blurred])
    orientation, descriptor = _hog_machinery(grad_x, grad_y, H, W)
    thetas = jax.vmap(orientation)(s_idx, y, x, scale)
    descs = jax.vmap(descriptor)(s_idx, y, x, scale, thetas)
    pad = max_keypoints - k

    def padk(a):
        return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))

    return Features(
        xys=padk(jnp.stack([x, y], axis=-1)),
        scales=padk(scale),
        orientations=padk(thetas),
        descriptors=padk(jnp.where(valid[:, None], descs, 0.0)),
        scores=padk(top_scores),
        valid=padk(valid),
    )


def normalized_image_coordinates(
    xys: jax.Array, width: int, height: int
) -> jax.Array:
    """OpenSfM normalized coords: centered, divided by max(w, h)
    (reference surface features.denormalized_image_coordinates,
    app/feature_extractor.py:450)."""
    size = max(width, height)
    return jnp.stack(
        [
            (xys[..., 0] + 0.5 - width / 2.0) / size,
            (xys[..., 1] + 0.5 - height / 2.0) / size,
        ],
        axis=-1,
    )


def denormalized_image_coordinates(
    norm_xys: np.ndarray, width: int, height: int
) -> np.ndarray:
    size = max(width, height)
    return np.stack(
        [
            norm_xys[..., 0] * size - 0.5 + width / 2.0,
            norm_xys[..., 1] * size - 0.5 + height / 2.0,
        ],
        axis=-1,
    )


def to_grayscale(img: np.ndarray) -> np.ndarray:
    if img.ndim == 2:
        return img.astype(np.float32)
    w = np.array([0.299, 0.587, 0.114], np.float32)
    out = (img.astype(np.float32) @ w)
    if img.dtype == np.uint8:
        out = out / 255.0
    return out
