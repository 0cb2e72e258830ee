"""SSIM with an 11x11 Gaussian window (fused by XLA; differentiable).

TPU-native replacement for the reference's ``fused-ssim`` CUDA extension
(reference: utils/gsplat_utils/gsplat_trainer.py:30,625-627 —
``fused_ssim(pred_BCHW, gt_BCHW, padding="valid")`` in the training loss).

On TPU the five window convolutions are depthwise convs that XLA lowers to
the MXU/VPU and fuses with the elementwise SSIM map — there is no separate
"fused" kernel to write; autodiff provides the backward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=4)
def _gaussian_window(size: int = 11, sigma: float = 1.5):
    # numpy on purpose: a cached jnp array traced under jit would leak tracers
    import numpy as np

    x = np.arange(size, dtype=np.float32) - (size - 1) / 2.0
    g = np.exp(-0.5 * (x / sigma) ** 2)
    g = g / g.sum()
    return np.outer(g, g)  # [size, size]


def _blur(x: jax.Array, window: jax.Array) -> jax.Array:
    """Depthwise 'valid' convolution of NHWC input with a single 2D window."""
    n, h, w, c = x.shape
    k = window.shape[0]
    kern = jnp.tile(jnp.asarray(window)[:, :, None, None], (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x,
        kern,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def ssim(
    pred: jax.Array,  # [N, H, W, C] in [0, 1]
    gt: jax.Array,  # [N, H, W, C]
    window_size: int = 11,
    sigma: float = 1.5,
    c1: float = 0.01 ** 2,
    c2: float = 0.03 ** 2,
) -> jax.Array:
    """Mean SSIM over the batch (``padding='valid'`` like fused-ssim)."""
    win = _gaussian_window(window_size, sigma)
    mu_p = _blur(pred, win)
    mu_g = _blur(gt, win)
    mu_pp = mu_p * mu_p
    mu_gg = mu_g * mu_g
    mu_pg = mu_p * mu_g
    sig_p = _blur(pred * pred, win) - mu_pp
    sig_g = _blur(gt * gt, win) - mu_gg
    sig_pg = _blur(pred * gt, win) - mu_pg
    ssim_map = ((2 * mu_pg + c1) * (2 * sig_pg + c2)) / (
        (mu_pp + mu_gg + c1) * (sig_p + sig_g + c2)
    )
    return jnp.mean(ssim_map)


def d_ssim_loss(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """``1 - SSIM`` (the form used in the reference loss,
    gsplat_trainer.py:624-627)."""
    return 1.0 - ssim(pred, gt)
