"""Promptable image segmentation for mask creation (SAM2-equivalent surface).

TPU-native replacement for the reference's SAM2 masking stack (SURVEY.md
N12; call surface app/mask_manager.py:11-12, 89-90, 235-248 —
``SAM2ImagePredictor.set_image`` then ``predict(point_coords, point_labels,
multimask_output=False)``; alternating positive/negative clicks; the
*inverted* mask is written to ``masks/<img>.png``).

Two backends behind one predictor interface:
  - ``HieraPredictor`` — a JAX Hiera-style ViT encoder + two-way mask
    decoder (models.sam2_hiera compact tier). Faithful *weights* cannot be downloaded in
    this zero-egress build, so it activates only when a converted ``.npz``
    checkpoint is supplied.
  - ``ClassicalPredictor`` (default fallback) — promptable region growing:
    color+spatial geodesic affinity from the positive clicks, cut by the
    negative clicks. Fully functional for the GUI/CLI masking workflow
    today; not a learned model.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


class ClassicalPredictor:
    """Promptable segmentation via seeded geodesic region growing."""

    def __init__(self, sigma_color: float = 0.12, n_iters: int = 256):
        self.sigma_color = sigma_color
        self.n_iters = n_iters
        self._image: Optional[np.ndarray] = None

    def set_image(self, image: np.ndarray):
        """image: [H, W, 3] uint8 or float in [0, 1]."""
        img = image.astype(np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        self._image = img

    def predict(
        self,
        point_coords: np.ndarray,  # [N, 2] (x, y) pixels
        point_labels: np.ndarray,  # [N] 1 = foreground, 0 = background
        multimask_output: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray, None]:
        """Returns (masks [1, H, W] bool, scores [1], logits None) —
        the SAM2ImagePredictor return shape the reference consumes."""
        assert self._image is not None, "call set_image first"
        img = self._image
        H, W, _ = img.shape
        pos = point_coords[point_labels > 0].astype(int)
        neg = point_coords[point_labels == 0].astype(int)

        # smoothed image for color affinity
        sm = img
        for ax in (0, 1):
            k = np.array([0.25, 0.5, 0.25])
            sm = (
                np.apply_along_axis(
                    lambda m: np.convolve(m, k, mode="same"), ax, sm
                )
            )
        INF = 1e9
        cost = np.full((H, W), INF, np.float32)
        for x, y in pos:
            if 0 <= y < H and 0 <= x < W:
                cost[y, x] = 0.0
        neg_cost = np.full((H, W), INF, np.float32)
        for x, y in neg:
            if 0 <= y < H and 0 <= x < W:
                neg_cost[y, x] = 0.0

        def sweep(c):
            # iterative geodesic distance transform (4-neighborhood,
            # color-gradient edge weights), alternating sweeps
            for _ in range(self.n_iters):
                before = c.copy()
                for dy, dx, sl_a, sl_b in (
                    (1, 0, np.s_[1:, :], np.s_[:-1, :]),
                    (-1, 0, np.s_[:-1, :], np.s_[1:, :]),
                    (0, 1, np.s_[:, 1:], np.s_[:, :-1]),
                    (0, -1, np.s_[:, :-1], np.s_[:, 1:]),
                ):
                    w = (
                        np.linalg.norm(
                            sm[sl_a] - sm[sl_b], axis=-1
                        )
                        / self.sigma_color
                        + 1e-3
                    )
                    c[sl_a] = np.minimum(c[sl_a], c[sl_b] + w)
                if np.allclose(before, c, atol=1e-4):
                    break
            return c

        cost = sweep(cost)
        if len(neg):
            neg_cost = sweep(neg_cost)
            mask = cost < neg_cost
        else:
            thr = np.percentile(cost[np.isfinite(cost)], 60)
            mask = cost < max(thr, 1.0)
        score = float(mask.mean())
        return mask[None], np.array([score]), None


def build_predictor(checkpoint: Optional[str] = None,
                    config: str = "hiera_l"):
    """Factory mirroring the reference's ``build_sam2(cfg, ckpt)`` +
    predictor construction (mask_manager.py:89-90).

    A converted SAM 2.1 checkpoint (original key names — see
    scripts/convert_weights.py sam2) selects the faithful
    ``models.sam2_hiera.SAM2Predictor``; a legacy ``enc_*``/``dec_*`` npz
    selects the simplified from-scratch net; else the classical
    promptable region-grower."""
    if checkpoint and os.path.exists(checkpoint):
        import numpy as np

        keys = np.load(checkpoint).files
        if any(k.startswith("image_encoder.trunk.") for k in keys):
            from splat_one_tpu.models.sam2_hiera import SAM2Predictor

            return SAM2Predictor(checkpoint, config=config)
        from splat_one_tpu.models.sam2_hiera import HieraPredictor

        return HieraPredictor(checkpoint)
    return ClassicalPredictor()


def save_mask(mask: np.ndarray, path: str, invert: bool = True):
    """Write the (inverted, as the reference does,
    mask_manager.py:245-248) mask PNG used by the SfM/splat stages."""
    from PIL import Image

    m = (~mask if invert else mask).astype(np.uint8) * 255
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(m).save(path)
