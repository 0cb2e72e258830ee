"""LPIPS perceptual metric (AlexNet backbone) in JAX.

TPU-native replacement for the reference's
``LearnedPerceptualImagePatchSimilarity`` (torchmetrics) eval metric
(gsplat_trainer.py:29-31, 421-433, lpips_net in {alex, vgg}).

The network architecture is implemented here; the *pretrained weights*
cannot be downloaded in this environment (zero egress), so construction is
gated: pass a ``.npz`` weight file (converted offline from the standard
LPIPS release) to get faithful scores, else ``lpips_available() == False``
and the trainer reports PSNR/SSIM only — stated in eval stats rather than
silently substituting random-weight scores.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# AlexNet feature extractor config: (out_channels, kernel, stride, padding)
_ALEX_LAYERS = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_POOL_AFTER = {0, 1}  # maxpool after these layers
# ImageNet normalization used by LPIPS' scaling layer
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

DEFAULT_WEIGHTS = os.environ.get(
    "SPLAT_ONE_TPU_LPIPS_WEIGHTS", "/root/repo/weights/lpips_alex.npz"
)


def lpips_available(path: Optional[str] = None) -> bool:
    return os.path.exists(path or DEFAULT_WEIGHTS)


def load_weights(path: Optional[str] = None) -> Optional[Dict]:
    """Expected npz keys: conv{i}_w [kh,kw,cin,cout], conv{i}_b [cout],
    lin{i}_w [1,1,c,1] (LPIPS linear heads); produced by
    ``scripts/convert_weights.py lpips`` (activation-parity-tested against
    the torch formulation in tests/test_weight_converters.py)."""
    path = path or DEFAULT_WEIGHTS
    if not os.path.exists(path):
        return None
    z = np.load(path)
    return {k: jnp.asarray(z[k]) for k in z.files}


def _alex_features(params: Dict, x: jax.Array):
    """x: [N,H,W,3] in [-1,1] -> list of 5 feature maps."""
    h = (x - _SHIFT) / _SCALE
    feats = []
    for i, (cout, k, s, p) in enumerate(_ALEX_LAYERS):
        h = jax.lax.conv_general_dilated(
            h, params[f"conv{i}_w"], (s, s), [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + params[f"conv{i}_b"]
        h = jax.nn.relu(h)
        feats.append(h)
        if i in _POOL_AFTER:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                "VALID",
            )
    return feats


def lpips(
    params: Dict,
    pred: jax.Array,  # [N,H,W,3] in [0,1]
    gt: jax.Array,
) -> jax.Array:
    """LPIPS distance (mean over batch)."""
    fa = _alex_features(params, pred * 2.0 - 1.0)
    fb = _alex_features(params, gt * 2.0 - 1.0)
    total = 0.0
    for i, (a, b) in enumerate(zip(fa, fb)):
        a = a / jnp.maximum(
            jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10
        )
        b = b / jnp.maximum(
            jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10
        )
        d = (a - b) ** 2
        w = params[f"lin{i}_w"]  # [1,1,c,1]
        total = total + jnp.mean(
            jax.lax.conv_general_dilated(
                d, w, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        )
    return total
