"""TPU-native SURF features: integral-image box-filter Hessian detector.

Completes the reference's classical feature menu to 6/6
(app/feature_extractor.py:68: AKAZE/SURF/SIFT/HAHOG/ORB/ALIKED; SURF
params at config/config.yaml:20-24 — surf_hessian_threshold,
surf_n_octaves, surf_n_octavelayers, surf_upright — honored here).

Vector-first design (whole-image filter responses; fixed top-K shapes):

- One integral image (two cumsums); every box-filter response is 4
  shifted reads of it — the whole Dxx/Dyy/Dxy response stack for every
  scale is a handful of vectorized adds per pixel (no per-pixel loops,
  no OpenCV-style scanning).
- Fast-Hessian pyramid (Bay et al., SURF, ECCV 2006): lobe filters of
  size L = 3 * (2^octave * (layer + 1) + 1); response
  det(H) = Dxx*Dyy - (0.9*Dxy)^2 normalized by filter area^2; responses
  are computed at every pixel (OpenCV samples every 2^octave-th pixel;
  dense evaluation is the vector-friendly equivalent and strictly a
  superset).
- 3x3x3 non-max suppression over (x, y, layer) inside each octave,
  threshold ``surf_hessian_threshold`` on the OpenCV scale (images in
  [0, 255]; inputs here are [0, 1] so responses are rescaled by 255^2).
- Orientation + descriptor are shared with the AKAZE tier: SURF-style
  sliding-sector dominant orientation and the M-SURF 64-D descriptor
  over scale-normalized gradients (sfm.akaze), which is precisely the
  descriptor family the reference's AKAZE config names (``MSURF``) and a
  faithful match for SURF's 4x4 subregion dx/dy/|dx|/|dy| layout.
  ``surf_upright: 1`` (U-SURF) skips orientation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from splat_one_tpu.sfm.akaze import (
    _gaussian_blur, _msurf_desc, _orientation, _scharr,
)
from splat_one_tpu.sfm.features import Features


def _integral(img: jax.Array) -> jax.Array:
    """Zero-padded integral image: ii[y, x] = sum img[:y, :x]."""
    ii = jnp.cumsum(jnp.cumsum(img, axis=0), axis=1)
    return jnp.pad(ii, ((1, 0), (1, 0)))


def _box(ii: jax.Array, H: int, W: int, y0: int, y1: int, x0: int,
         x1: int) -> jax.Array:
    """Per-pixel sum of img[y+y0 : y+y1, x+x0 : x+x1] (half-open, clamped
    at the borders) for every pixel — 4 shifted reads of the integral
    image."""

    def at(dy, dx):
        ys = jnp.clip(jnp.arange(H) + dy, 0, H)
        xs = jnp.clip(jnp.arange(W) + dx, 0, W)
        return ii[ys][:, xs]

    return at(y1, x1) - at(y0, x1) - at(y1, x0) + at(y0, x0)


def _hessian_response(ii, H, W, L):
    """Fast-Hessian response for lobe size L (filter size 3L)."""
    l2 = L // 2
    # Dyy: three stacked (L x 2L-1) lobes, middle weighted -2 (via -3
    # on top of the +1 whole-filter sum)
    whole_yy = _box(ii, H, W, -(L + l2), L + l2 + 1, -(L - 1), L)
    mid_yy = _box(ii, H, W, -l2, l2 + 1, -(L - 1), L)
    dyy = whole_yy - 3.0 * mid_yy
    whole_xx = _box(ii, H, W, -(L - 1), L, -(L + l2), L + l2 + 1)
    mid_xx = _box(ii, H, W, -(L - 1), L, -l2, l2 + 1)
    dxx = whole_xx - 3.0 * mid_xx
    # Dxy: four LxL lobes at the quadrant corners (+1 ur/ll, -1 ul/lr)
    ur = _box(ii, H, W, -L, 0, 1, L + 1)
    ll = _box(ii, H, W, 1, L + 1, -L, 0)
    ul = _box(ii, H, W, -L, 0, -L, 0)
    lr = _box(ii, H, W, 1, L + 1, 1, L + 1)
    dxy = ur + ll - ul - lr
    area = float(3 * L * (2 * L - 1))  # Dxx/Dyy filter area
    dxx = dxx / area
    dyy = dyy / area
    dxy = dxy / area
    return dxx * dyy - (0.9 * dxy) ** 2


@partial(jax.jit, static_argnames=(
    "max_keypoints", "n_octaves", "n_layers", "upright"))
def extract_surf(
    image: jax.Array,  # [H, W] grayscale float in [0, 1]
    max_keypoints: int = 2048,
    hessian_threshold: float = 3000.0,  # surf_hessian_threshold
    n_octaves: int = 4,  # surf_n_octaves
    n_layers: int = 2,  # surf_n_octavelayers
    upright: bool = False,  # surf_upright
) -> Features:
    """SURF features in the shared ``Features`` layout."""
    H, W = image.shape
    # OpenCV's threshold is calibrated for [0, 255] images
    ii = _integral(image * 255.0)
    thr = hessian_threshold

    all_xy, all_scale, all_theta, all_desc, all_score = [], [], [], [], []
    per_oct = -(-max_keypoints // n_octaves)
    # n_layers usable layers need n_layers + 2 filter sizes per octave
    for o in range(n_octaves):
        step = 2**o
        Ls = [step * (k + 1) + 1 for k in range(n_layers + 2)]
        # Ls are LOBE sizes; the filter size is 3L and the equivalent
        # Gaussian scale is 1.2 * (3L) / 9 (Bay et al. calibration)
        resp = jnp.stack([_hessian_response(ii, H, W, L) for L in Ls])
        sigmas = [1.2 * (3 * L) / 9.0 for L in Ls]
        per_lvl = -(-per_oct // n_layers)
        for j in range(1, n_layers + 1):
            r = resp[j]
            mx = jax.lax.reduce_window(
                r, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")
            peak = (r >= mx) & (r > thr)
            peak &= (r >= resp[j - 1]) & (r >= resp[j + 1])
            b = int(np.ceil(12 * sigmas[j])) + 2
            yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
            xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
            peak &= (yy >= b) & (yy < H - b) & (xx >= b) & (xx < W - b)
            flat = jnp.where(peak, r, -jnp.inf).reshape(-1)
            top, idx = jax.lax.top_k(flat, per_lvl)
            ok = jnp.isfinite(top) & (top > 0)
            ys = jnp.clip(idx // W, 1, H - 2).astype(jnp.float32)
            xs = jnp.clip(idx % W, 1, W - 2).astype(jnp.float32)
            s = sigmas[j]
            s_arr = jnp.full((per_lvl,), s, jnp.float32)
            # gradients at the detection scale for orientation/descriptor
            d = max(1, int(round(s)))
            Lsm = _gaussian_blur(image, s)
            Lx = _scharr(Lsm, 1, d)
            Ly = _scharr(Lsm, 0, d)
            if upright:
                theta = jnp.zeros((per_lvl,), jnp.float32)
            else:
                theta = _orientation(Lx, Ly, ys, xs, s_arr)
            desc = _msurf_desc(Lx, Ly, ys, xs, s_arr, theta)
            all_xy.append(jnp.stack([xs, ys], -1))
            all_scale.append(s_arr)
            all_theta.append(theta)
            all_desc.append(jnp.where(ok[:, None], desc, 0.0))
            all_score.append(jnp.where(ok, top, 0.0))

    scores = jnp.concatenate(all_score)
    k = min(max_keypoints, scores.shape[0])
    sel_score, sel = jax.lax.top_k(
        jnp.where(scores > 0, scores, -jnp.inf), k)
    ok = jnp.isfinite(sel_score) & (sel_score > 0)
    pad = max_keypoints - k

    def padk(x):
        width = ((0, pad),) + ((0, 0),) * (x.ndim - 1)
        return jnp.pad(x, width)

    return Features(
        xys=padk(jnp.concatenate(all_xy)[sel]),
        scales=padk(jnp.concatenate(all_scale)[sel]),
        orientations=padk(jnp.concatenate(all_theta)[sel]),
        descriptors=padk(jnp.concatenate(all_desc)[sel]),
        scores=padk(jnp.where(ok, sel_score, 0.0)),
        valid=padk(ok),
    )
