"""Fixed-capacity Gaussian-splat parameter container (pytree-friendly).

TPU-native replacement for the reference's ``torch.nn.ParameterDict`` splat
storage (reference: utils/gsplat_utils/gsplat_trainer.py:204-281,
``create_splats_with_optimizers``). Densification on GPU resizes parameter
tensors every refine step; on TPU that would recompile everything, so splats
live in capacity-``CAP`` buffers with an ``alive`` mask (SURVEY.md §7 hard
part 3). Growing capacity (``grow_capacity``) is the only recompile point.

Parameter storage conventions (identical activation conventions to the
reference):
  - ``means``      [CAP, 3]   world positions
  - ``scales``     [CAP, 3]   log-scales (``exp`` at render)
  - ``quats``      [CAP, 4]   unnormalized wxyz
  - ``opacities``  [CAP]      logits (``sigmoid`` at render)
  - ``sh0``        [CAP, 1, 3]  DC SH coefficients
  - ``shN``        [CAP, K-1, 3] higher-order SH coefficients
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from splat_one_tpu.core.sh import num_sh_bases, rgb_to_sh

Params = Dict[str, jax.Array]


def init_splats_from_points(
    points: np.ndarray,  # [N, 3]
    rgbs: np.ndarray,  # [N, 3] in [0, 1]
    capacity: int,
    sh_degree: int = 3,
    init_opacity: float = 0.1,
    init_scale: float = 1.0,
    seed: int = 0,
    feature_dim: int = 0,
) -> Tuple[Params, jax.Array]:
    """SfM-point initialization (reference gsplat_trainer.py:222-243):
    scales from mean 3-NN distance, random quats, logit opacity.

    Returns (params, alive) with capacity-padded buffers.
    """
    n = points.shape[0]
    if n > capacity:
        raise ValueError(f"capacity {capacity} < number of points {n}")
    rng = np.random.default_rng(seed)

    d_avg = _knn_mean_dist(points, k=3)
    scales = np.log(np.clip(d_avg * init_scale, 1e-7, None))[:, None].repeat(3, 1)

    K = num_sh_bases(sh_degree)
    sh0 = np.asarray(rgb_to_sh(jnp.asarray(rgbs)))[:, None, :]  # [N, 1, 3]
    shN = np.zeros((n, K - 1, 3), np.float32)
    quats = rng.uniform(size=(n, 4)).astype(np.float32)
    opac = np.full((n,), _logit(init_opacity), np.float32)

    def padded(x, cap_val=0.0):
        out = np.full((capacity,) + x.shape[1:], cap_val, np.float32)
        out[:n] = x
        return jnp.asarray(out)

    params = {
        "means": padded(points.astype(np.float32)),
        "scales": padded(scales.astype(np.float32), cap_val=-10.0),
        "quats": padded(quats, cap_val=1.0),
        "opacities": padded(opac, cap_val=-10.0),
    }
    if feature_dim > 0:
        # appearance-feature path (reference feature_dim branch,
        # gsplat_trainer.py:259-263): per-gaussian features + logit colors
        feats = rng.uniform(size=(n, feature_dim)).astype(np.float32)
        rgbc = np.clip(rgbs.astype(np.float32), 1e-3, 1 - 1e-3)
        params["features"] = padded(feats)
        params["colors"] = padded(np.log(rgbc / (1 - rgbc)))
    else:
        params["sh0"] = padded(sh0.astype(np.float32))
        params["shN"] = padded(shN)
    alive = jnp.arange(capacity) < n
    return params, alive


def init_splats_random(
    capacity: int,
    n: int,
    extent: float,
    sh_degree: int = 3,
    init_opacity: float = 0.1,
    init_scale: float = 1.0,
    seed: int = 0,
    feature_dim: int = 0,
) -> Tuple[Params, jax.Array]:
    """Random-init variant (reference init_type='random',
    gsplat_trainer.py:226-228)."""
    rng = np.random.default_rng(seed)
    points = (rng.uniform(size=(n, 3)) * 2 - 1) * extent
    rgbs = rng.uniform(size=(n, 3))
    return init_splats_from_points(
        points, rgbs, capacity, sh_degree, init_opacity, init_scale, seed,
        feature_dim=feature_dim,
    )


def activated(params: Params, alive: Optional[jax.Array] = None):
    """Render-ready values: (means, quats, scales, opacities, sh_coeffs)."""
    scales = jnp.exp(params["scales"])
    opac = jax.nn.sigmoid(params["opacities"])
    sh = jnp.concatenate([params["sh0"], params["shN"]], axis=1)
    return params["means"], params["quats"], scales, opac, sh


def n_alive(alive: jax.Array) -> jax.Array:
    return jnp.sum(alive.astype(jnp.int32))


def grow_capacity(params: Params, alive: jax.Array, new_capacity: int):
    """Capacity doubling — the single deliberate recompile point."""
    cap = alive.shape[0]
    if new_capacity <= cap:
        return params, alive
    pad = new_capacity - cap

    def padf(x):
        w = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, w)

    return jax.tree.map(padf, params), jnp.pad(alive, (0, pad))


def _logit(p: float) -> float:
    return float(np.log(p / (1.0 - p)))


def _knn_mean_dist(points: np.ndarray, k: int = 3) -> np.ndarray:
    """Mean distance to the k nearest neighbors (host-side init path).

    Uses scipy's cKDTree when available, else a chunked brute-force fallback.
    """
    try:
        from scipy.spatial import cKDTree

        tree = cKDTree(points)
        d, _ = tree.query(points, k=k + 1)
        return np.sqrt((d[:, 1:] ** 2).mean(axis=1)).astype(np.float32)
    except ImportError:
        n = points.shape[0]
        out = np.empty(n, np.float32)
        chunk = 2048
        for i in range(0, n, chunk):
            d2 = ((points[i:i + chunk, None] - points[None]) ** 2).sum(-1)
            d2.sort(axis=1)
            out[i:i + chunk] = np.sqrt(d2[:, 1:k + 1].mean(axis=1))
        return out
