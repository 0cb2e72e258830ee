"""Monocular depth estimation: ViT + DPT head in JAX (Depth-Anything-V2
equivalent).

Architecture replacement for the reference's Depth-Anything-V2 / DAC stack
(SURVEY.md N13; call surface app/tabs/depth_tab.py:92-123, 173 —
``DepthAnythingV2(**{encoder, features, out_channels}).infer_image(bgr) ->
HxW depth``; encoder sizes vits/vitb/vitl/vitg :97-102). DINOv2-style plain
ViT backbone with four tapped stages feeding a DPT fusion head; pure
JAX/XLA. Weights load from a converted ``.npz``; without weights
``infer_image`` mirrors the reference's graceful-fallback behavior
(depth_tab.py:178-186 returns a dummy map on error) while keeping the full
architecture trainable/testable.

The camera-aware equirectangular variant (DAC analog) resamples a panorama
into overlapping perspective crops, infers each, and stitches — handled in
``infer_equirectangular``.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from splat_one_tpu.models.sam_tpu import (
    _block, _init_block, _init_linear, _init_ln, _layernorm, _linear,
)

CONFIGS = {  # reference depth_tab.py:97-102 encoder table
    "vits": dict(width=384, depth=12, heads=6, features=64),
    "vitb": dict(width=768, depth=12, heads=12, features=128),
    "vitl": dict(width=1024, depth=24, heads=16, features=256),
    "vitg": dict(width=1536, depth=40, heads=24, features=384),
}
PATCH = 14
IMG = 518  # 37 x 37 patches (DINOv2 convention)


def init_depth_model(key, encoder: str = "vits") -> Dict:
    cfg = CONFIGS[encoder]
    C, D, F = cfg["width"], cfg["depth"], cfg["features"]
    params: Dict = {"_encoder": encoder}
    ks = jax.random.split(key, D + 16)
    _init_linear(ks[0], "patch", PATCH * PATCH * 3, C, params)
    n = IMG // PATCH
    params["pos"] = jax.random.normal(ks[1], (1, n * n, C)) * 0.02
    for d in range(D):
        _init_block(ks[2 + d], f"b{d}", C, params)
    _init_ln("ln_f", C, params)
    # DPT: project 4 tapped stages to F, fuse coarse-to-fine
    for i in range(4):
        _init_linear(ks[D + 2 + i], f"tap{i}", C, F, params)
        _init_linear(ks[D + 6 + i], f"fuse{i}", F, F, params)
    _init_linear(ks[D + 10], "head_1", F, F // 2, params)
    _init_linear(ks[D + 11], "head_2", F // 2, 1, params)
    return params


def depth_forward(params: Dict, image: jax.Array) -> jax.Array:
    """image [B, IMG, IMG, 3] in [0,1] -> relative inverse depth [B, S, S]
    at patch resolution upsampled 4x."""
    enc = params["_encoder"]
    cfg = CONFIGS[enc]
    C, D = cfg["width"], cfg["depth"]
    B, H, W, _ = image.shape
    x = image.reshape(
        B, H // PATCH, PATCH, W // PATCH, PATCH, 3
    ).transpose(0, 1, 3, 2, 4, 5).reshape(
        B, (H // PATCH) * (W // PATCH), PATCH * PATCH * 3
    )
    x = _linear(params, "patch", x) + params["pos"]
    taps = []
    tap_at = {D // 4 - 1, D // 2 - 1, 3 * D // 4 - 1, D - 1}
    n_heads = cfg["heads"]
    for d in range(D):
        x = _block(params, f"b{d}", x, n_heads)
        if d in tap_at:
            taps.append(x)
    side = H // PATCH
    feats = [
        _linear(params, f"tap{i}", t).reshape(B, side, side, -1)
        for i, t in enumerate(taps)
    ]
    # coarse-to-fine fusion (residual refinement, DPT-style)
    fused = feats[-1]
    for i in range(2, -1, -1):
        fused = jax.nn.relu(
            _linear(params, f"fuse{i}", fused + feats[i])
        )
    up = jnp.repeat(jnp.repeat(fused, 2, 1), 2, 2)
    h = jax.nn.relu(_linear(params, "head_1", up))
    return jax.nn.relu(_linear(params, "head_2", h))[..., 0]


class DepthAnythingTPU:
    """``infer_image`` surface of the reference's DepthAnythingV2."""

    def __init__(self, encoder: str = "vits",
                 checkpoint: Optional[str] = None, seed: int = 0):
        self.params = init_depth_model(jax.random.PRNGKey(seed), encoder)
        self.has_weights = False
        if checkpoint:
            import os

            if os.path.exists(checkpoint):
                z = np.load(checkpoint)
                self.params.update(
                    {k: jnp.asarray(z[k]) for k in z.files}
                )
                self.has_weights = True
        self._fwd = jax.jit(partial(depth_forward, self.params))

    def infer_image(self, bgr: np.ndarray) -> np.ndarray:
        """bgr uint8 [H, W, 3] -> depth float32 [H, W] (relative).

        Without converted weights this mirrors the reference's fallback
        (dummy map rather than hard failure, depth_tab.py:178-186) while
        still exercising the full network."""
        from PIL import Image as PILImage

        H, W = bgr.shape[:2]
        rgb = bgr[..., ::-1].astype(np.float32) / 255.0
        im = PILImage.fromarray(
            (rgb * 255).astype(np.uint8)
        ).resize((IMG, IMG))
        arr = np.asarray(im).astype(np.float32) / 255.0
        out = np.asarray(self._fwd(jnp.asarray(arr[None]))[0])
        out = np.asarray(
            PILImage.fromarray(out.astype(np.float32), mode="F").resize(
                (W, H), PILImage.BILINEAR
            )
        )
        if not self.has_weights:
            # honest fallback: normalized but meaningless without weights
            out = out - out.min()
            rng = out.max()
            return out / rng if rng > 0 else np.zeros((H, W), np.float32)
        return out

    def infer_equirectangular(
        self, bgr: np.ndarray, n_views: int = 4, fov_deg: float = 100.0
    ) -> np.ndarray:
        """DAC-analog panorama depth: perspective crops around the azimuth,
        inferred independently and stitched with cosine feathering."""
        from splat_one_tpu.core import cameras as cam

        H, W = bgr.shape[:2]
        out = np.zeros((H, W), np.float32)
        wsum = np.zeros((H, W), np.float32)
        size = 384
        f = 0.5 * size / np.tan(np.radians(fov_deg / 2))
        K = np.array(
            [[f, 0, size / 2], [0, f, size / 2], [0, 0, 1]], np.float32
        )
        # panorama pixel directions (computed once): every output pixel
        # GATHERS from each crop it falls into — the previous scatter (crop
        # samples -> nearest pano pixel) left >90% of a real-size panorama
        # untouched (review r2)
        uu, vv = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
        lon_p = (uu / W - 0.5) * 2 * np.pi
        lat_p = (0.5 - vv / H) * np.pi
        dirs = np.stack(
            [
                np.cos(lat_p) * np.sin(lon_p),
                -np.sin(lat_p),
                np.cos(lat_p) * np.cos(lon_p),
            ],
            -1,
        )  # [H, W, 3] world directions
        Rs = []
        for k in range(n_views):
            yaw = 2 * np.pi * k / n_views
            cy, sy = np.cos(yaw), np.sin(yaw)
            Rs.append(np.array(
                [[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], np.float32
            ))
        # two polar views: azimuthal crops can never cover the poles
        for sgn in (1.0, -1.0):
            Rs.append(np.array(
                [[1, 0, 0], [0, 0, -sgn], [0, sgn, 0]], np.float32
            ))
        for R in Rs:
            # sample the perspective crop from the panorama
            u, v = np.meshgrid(np.arange(size) + 0.5, np.arange(size) + 0.5)
            d = np.stack(
                [(u - K[0, 2]) / f, (v - K[1, 2]) / f, np.ones_like(u)], -1
            )
            d = d @ R.T
            d /= np.linalg.norm(d, axis=-1, keepdims=True)
            lon = np.arctan2(d[..., 0], d[..., 2])
            lat = np.arcsin(np.clip(-d[..., 1], -1, 1))
            px = (lon / (2 * np.pi) + 0.5) * W
            py = (0.5 - lat / np.pi) * H
            xi = np.clip(px.astype(int), 0, W - 1)
            yi = np.clip(py.astype(int), 0, H - 1)
            crop = bgr[yi, xi]
            dep = self.infer_image(crop)
            # normalize the crop's relative inverse depth so crops agree
            # in scale before blending
            med = np.median(dep)
            dep = dep / max(med, 1e-6)
            # gather: project every pano direction into this crop
            dc = dirs @ R  # crop-frame directions
            zc = dc[..., 2]
            in_front = zc > 1e-6
            xc = np.where(in_front, dc[..., 0] / np.maximum(zc, 1e-6), 0.0)
            yc = np.where(in_front, dc[..., 1] / np.maximum(zc, 1e-6), 0.0)
            cu = xc * f + K[0, 2]
            cv = yc * f + K[1, 2]
            inside = (
                in_front & (cu >= 0) & (cu < size - 1)
                & (cv >= 0) & (cv < size - 1)
            )
            x0 = np.clip(cu.astype(int), 0, size - 2)
            y0 = np.clip(cv.astype(int), 0, size - 2)
            fx_ = np.clip(cu - x0, 0, 1)
            fy_ = np.clip(cv - y0, 0, 1)
            samp = (
                dep[y0, x0] * (1 - fx_) * (1 - fy_)
                + dep[y0, x0 + 1] * fx_ * (1 - fy_)
                + dep[y0 + 1, x0] * (1 - fx_) * fy_
                + dep[y0 + 1, x0 + 1] * fx_ * fy_
            )
            wgt = np.where(
                inside,
                np.cos((cu / size - 0.5) * np.pi)
                * np.cos((cv / size - 0.5) * np.pi),
                0.0,
            )
            out += samp * wgt
            wsum += wgt
        return out / np.maximum(wsum, 1e-6)


def save_depth_outputs(depth: np.ndarray, out_dir: str, name: str):
    """Write <img>_depth.npy + turbo-colorized PNG (reference
    depth_tab.py:70-76, 188-204)."""
    import os

    from PIL import Image as PILImage

    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, f"{name}_depth.npy"), depth)
    d = depth - depth.min()
    d = d / max(d.max(), 1e-9)
    # compact turbo-like colormap
    r = np.clip(1.5 - np.abs(2.5 * d - 1.8), 0, 1)
    g = np.clip(1.5 - np.abs(2.5 * d - 1.25), 0, 1)
    b = np.clip(1.5 - np.abs(2.5 * d - 0.6), 0, 1)
    rgb = (np.stack([r, g, b], -1) * 255).astype(np.uint8)
    PILImage.fromarray(rgb).save(
        os.path.join(out_dir, f"{name}_depth.png")
    )
