"""Learnable per-view bilateral grids for exposure/color correction.

TPU-native re-implementation of the capability of the reference's
``lib_bilagrid.py`` (utils/gsplat_utils/lib_bilagrid.py:247-365 ``slice``,
:161-177 ``total_variation_loss``, :56-126 ``color_correct``): each training
view owns a low-resolution 3D grid (x, y, guidance-gray) of 3x4 color affine
matrices; rendered pixels are transformed by trilinearly-sliced affines.
Slicing is pure gather+lerp arithmetic — XLA fuses it; no kernel needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# fixed RGB->gray guidance weights (ITU-R 601, as the reference uses)
_GRAY = jnp.array([0.299, 0.587, 0.114], jnp.float32)


def init_bilateral_grids(
    n_images: int, shape=(16, 16, 8)
) -> jax.Array:
    """[n_images, gz, gy, gx, 12]; initialized to the identity affine."""
    gx, gy, gz = shape
    ident = jnp.array(
        [1.0, 0, 0, 0, 0, 1.0, 0, 0, 0, 0, 1.0, 0], jnp.float32
    )
    return jnp.tile(ident, (n_images, gz, gy, gx, 1))


def slice_grid(
    grids: jax.Array,  # [B, gz, gy, gx, 12] (batch = the views rendered)
    rgb: jax.Array,  # [B, H, W, 3] rendered colors in [0, 1]
) -> jax.Array:
    """Apply per-pixel affines sliced at (x, y, gray(rgb)). Differentiable."""
    B, gz, gy, gx, _ = grids.shape
    _, H, W, _ = rgb.shape
    gray = jnp.clip(jnp.einsum("bhwc,c->bhw", rgb, _GRAY), 0.0, 1.0)
    xs = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W * gx - 0.5
    ys = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H * gy - 0.5
    zs = gray * gz - 0.5

    x0 = jnp.clip(jnp.floor(xs), 0, gx - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(ys), 0, gy - 1).astype(jnp.int32)
    z0 = jnp.clip(jnp.floor(zs), 0, gz - 1).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, gx - 1)
    y1 = jnp.minimum(y0 + 1, gy - 1)
    z1 = jnp.minimum(z0 + 1, gz - 1)
    fx = jnp.clip(xs - x0, 0.0, 1.0)[None, None, :]  # [1,1,W]
    fy = jnp.clip(ys - y0, 0.0, 1.0)[None, :, None]  # [1,H,1]
    fz = jnp.clip(zs - z0, 0.0, 1.0)  # [B,H,W]

    def take(zi, yi, xi):
        # zi: [B,H,W]; yi: [H]; xi: [W] -> [B,H,W,12]
        g = grids[:, :, yi][:, :, :, xi]  # [B, gz, H, W, 12]
        return jnp.take_along_axis(
            g, zi[:, None, :, :, None], axis=1
        )[:, 0]

    c000 = take(z0, y0, x0)
    c001 = take(z0, y0, x1)
    c010 = take(z0, y1, x0)
    c011 = take(z0, y1, x1)
    c100 = take(z1, y0, x0)
    c101 = take(z1, y0, x1)
    c110 = take(z1, y1, x0)
    c111 = take(z1, y1, x1)
    fx_ = fx[..., None]
    fy_ = fy[..., None]
    fz_ = fz[..., None]
    c00 = c000 * (1 - fx_) + c001 * fx_
    c01 = c010 * (1 - fx_) + c011 * fx_
    c10 = c100 * (1 - fx_) + c101 * fx_
    c11 = c110 * (1 - fx_) + c111 * fx_
    c0 = c00 * (1 - fy_) + c01 * fy_
    c1 = c10 * (1 - fy_) + c11 * fy_
    aff = (c0 * (1 - fz_) + c1 * fz_).reshape(B, H, W, 3, 4)
    rgb1 = jnp.concatenate([rgb, jnp.ones_like(rgb[..., :1])], axis=-1)
    return jnp.einsum("bhwij,bhwj->bhwi", aff, rgb1)


def total_variation_loss(grids: jax.Array) -> jax.Array:
    """Mean squared difference between neighboring grid cells (reference
    lib_bilagrid.py:161-177)."""
    d = 0.0
    for ax in (1, 2, 3):
        diff = jnp.diff(grids, axis=ax)
        d = d + jnp.mean(diff * diff)
    return d / 3.0


def init_cp4d(
    key: jax.Array,
    grid_x: int = 16,
    grid_y: int = 16,
    grid_z: int = 16,
    grid_w: int = 8,
    rank: int = 5,
    learn_gray: bool = True,
    gray_mlp_width: int = 8,
    gray_mlp_depth: int = 2,
    init_noise_scale: float = 1e-6,
    bound: float = 2.0,
) -> dict:
    """Low-rank (CP-factored) 4D bilateral grid over (x, y, z, guidance).

    Capability parity with the reference's ``BilateralGridCP4D``
    (utils/gsplat_utils/lib_bilagrid.py:401-573): a rank-R CP decomposition
    of a 4D grid of 3x4 color affines, sliced by WORLD xyz (scaled by
    ``bound``) plus a per-pixel guidance value (fixed BT.601 gray or a tiny
    learned MLP). The identity-affine grid is EXACTLY rank-1 in CP form
    (constant 12-vector x ones x ones x ones x ones), so instead of the
    reference's tensorly ``parafac`` bootstrap we initialize factor 0's
    first column to the identity affine, the first spatial row of each
    factor to ones, and fill the remaining ranks with
    ``init_noise_scale``-scaled noise — the same function family, no
    tensor-decomposition dependency."""
    ks = jax.random.split(key, 6)
    ident = jnp.array(
        [1.0, 0, 0, 0, 0, 1.0, 0, 0, 0, 0, 1.0, 0], jnp.float32
    )
    mix = jax.random.normal(ks[0], (rank, 12)) * init_noise_scale
    mix = mix.at[0].add(ident)  # [rank, 12]; coef row 0 carries identity
    facs = {}
    for name, size, k in (
        ("fx", grid_x, ks[1]), ("fy", grid_y, ks[2]),
        ("fz", grid_z, ks[3]), ("fw", grid_w, ks[4]),
    ):
        f = jax.random.normal(k, (rank, size)) * init_noise_scale
        facs[name] = f.at[0].add(1.0)  # rank-0 row = ones -> identity
    params = {"mix": mix, **facs, "bound": jnp.float32(bound)}
    if learn_gray:
        widths = [3] + [gray_mlp_width] * (gray_mlp_depth - 1) + [1]
        mlp = []
        for i, (a, b) in enumerate(zip(widths[:-1], widths[1:])):
            wk, ks5 = jax.random.split(ks[5] if i == 0 else ks5)
            mlp.append({
                "w": jax.random.normal(wk, (a, b)) * (1.0 / jnp.sqrt(a)),
                "b": jnp.zeros((b,)),
            })
        params["gray_mlp"] = mlp
    return params


def _interp_factor(fac: jax.Array, coord: jax.Array) -> jax.Array:
    """Linearly interpolate a [rank, S] factor at normalized coords in
    [-1, 1] (align-corners, border-clamped) -> [rank, N]."""
    S = fac.shape[1]
    t = jnp.clip((coord + 1.0) * 0.5, 0.0, 1.0) * (S - 1)
    i0 = jnp.clip(jnp.floor(t), 0, S - 1).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, S - 1)
    f = t - i0
    return fac[:, i0] * (1.0 - f) + fac[:, i1] * f


def slice_cp4d(params: dict, xyz: jax.Array, rgb: jax.Array) -> jax.Array:
    """Slice per-point 3x4 affines from the low-rank 4D grid.

    ``xyz [..., 3]`` world coordinates, ``rgb [..., 3]`` colors ->
    ``[..., 3, 4]`` affines (apply to homogeneous rgb as the caller sees
    fit, matching the reference forward contract)."""
    shp = xyz.shape[:-1]
    p = xyz.reshape(-1, 3) / params["bound"]
    c = rgb.reshape(-1, 3)
    if "gray_mlp" in params:
        h = c
        for i, layer in enumerate(params["gray_mlp"]):
            h = h @ layer["w"] + layer["b"]
            if i < len(params["gray_mlp"]) - 1:
                h = jax.nn.relu(h)
        gray = 2.0 * jnp.tanh(h[:, 0] / 2.0)  # scaled tanh into [-2, 2]
    else:
        gray = (c @ _GRAY) * 2.0 - 1.0
    coef = (
        _interp_factor(params["fx"], p[:, 0])
        * _interp_factor(params["fy"], p[:, 1])
        * _interp_factor(params["fz"], p[:, 2])
        * _interp_factor(params["fw"], gray)
    )  # [rank, N]
    mat = coef.T @ params["mix"]  # [N, 12]
    return mat.reshape(*shp, 3, 4)


def apply_cp4d(params: dict, xyz: jax.Array, rgb: jax.Array) -> jax.Array:
    """Slice + apply: color-corrected rgb with the same shape as ``rgb``."""
    aff = slice_cp4d(params, xyz, rgb)
    rgb1 = jnp.concatenate([rgb, jnp.ones_like(rgb[..., :1])], axis=-1)
    return jnp.einsum("...ij,...j->...i", aff, rgb1)


def total_variation_loss_cp4d(params: dict) -> jax.Array:
    """TV over the 1-D spatial/guidance factors (the reference penalizes
    the learnable factor residuals; factors ARE the learnables here)."""
    d = 0.0
    for name in ("fx", "fy", "fz", "fw"):
        diff = jnp.diff(params[name], axis=1)
        d = d + jnp.mean(diff * diff)
    return d / 4.0


def color_correct(
    pred: jax.Array,  # [H, W, 3]
    gt: jax.Array,  # [H, W, 3]
    num_iters: int = 5,
    eps: float = 0.5 / 255.0,
) -> jax.Array:
    """Per-channel quadratic color correction fitted to GT (reference
    lib_bilagrid.py:56-126): used at eval time so appearance-corrected
    metrics are comparable. Solves a small least-squares per channel."""
    H, W, _ = pred.shape
    p = pred.reshape(-1, 3)
    g = gt.reshape(-1, 3)
    # features: 1, rgb, rgb^2, cross terms (10-dim quadratic basis)
    feats = jnp.concatenate(
        [
            jnp.ones((p.shape[0], 1)),
            p,
            p * p,
            p[:, :1] * p[:, 1:2],
            p[:, :1] * p[:, 2:3],
            p[:, 1:2] * p[:, 2:3],
        ],
        axis=1,
    )  # [P, 10]
    A = feats.T @ feats + eps * jnp.eye(feats.shape[1])
    out = []
    for c in range(3):
        b = feats.T @ g[:, c]
        w = jnp.linalg.solve(A, b)
        out.append(feats @ w)
    return jnp.clip(jnp.stack(out, axis=-1).reshape(H, W, 3), 0.0, 1.0)
