"""Training losses (reference: utils/gsplat_utils/gsplat_trainer.py:624-653).

loss = (1 - ssim_lambda) * L1 + ssim_lambda * (1 - SSIM)
       [+ depth_lambda * projected-depth L1]
       [+ opacity_reg * mean|sigmoid(opacity)|, + scale_reg * mean|exp(scale)|]
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from splat_one_tpu.ops.ssim import ssim


def image_loss(
    pred: jax.Array,  # [B, H, W, 3]
    gt: jax.Array,  # [B, H, W, 3]
    ssim_lambda: float = 0.2,
) -> Dict[str, jax.Array]:
    l1 = jnp.mean(jnp.abs(pred - gt))
    s = ssim(pred, gt)
    loss = (1.0 - ssim_lambda) * l1 + ssim_lambda * (1.0 - s)
    return {"loss": loss, "l1": l1, "ssim": s}


def depth_loss(
    render_depth: jax.Array,  # [B, H, W, 1] EXPECTED depth (the ED output)
    gt_depth: jax.Array,  # [B, H, W, 1] metric depth (0 = missing)
    scene_scale: float = 1.0,
) -> jax.Array:
    """Disparity L1 against supervision depth (reference depth_loss path,
    gsplat_trainer.py:630-645 projects tracked points; here dense maps).

    The reference scales the disparity L1 by ``scene_scale`` before the
    ``depth_lambda`` weighting so supervision strength is invariant to the
    world-normalization scale."""
    d = render_depth
    valid = gt_depth > 1e-6
    disp = jnp.where(valid, 1.0 / jnp.clip(d, 1e-6, None), 0.0)
    disp_gt = jnp.where(valid, 1.0 / jnp.clip(gt_depth, 1e-6, None), 0.0)
    n = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(jnp.abs(disp - disp_gt)) / n * scene_scale


def regularizers(
    params,
    alive: jax.Array,
    opacity_reg: float = 0.0,
    scale_reg: float = 0.0,
    n_alive: jax.Array = None,  # GLOBAL alive count: under a gauss-sharded
    # mesh the local count would make the per-gaussian penalty n_shards
    # stronger (and shard-dependent)
) -> jax.Array:
    out = 0.0
    n = (
        jnp.maximum(n_alive.astype(jnp.float32), 1.0)
        if n_alive is not None
        else jnp.maximum(jnp.sum(alive.astype(jnp.float32)), 1.0)
    )
    if opacity_reg > 0:
        o = jax.nn.sigmoid(params["opacities"])
        out = out + opacity_reg * jnp.sum(jnp.where(alive, o, 0.0)) / n
    if scale_reg > 0:
        s = jnp.exp(params["scales"])
        out = out + scale_reg * jnp.sum(
            jnp.where(alive[:, None], s, 0.0)
        ) / (3.0 * n)
    return out


def psnr(pred: jax.Array, gt: jax.Array, max_val: float = 1.0) -> jax.Array:
    mse = jnp.mean((pred - gt) ** 2)
    return 10.0 * jnp.log10(max_val ** 2 / jnp.maximum(mse, 1e-12))
