"""Real spherical-harmonics basis evaluation (degrees 0..4), pure JAX.

TPU-native equivalent of the SH evaluation the reference performs inside the
gsplat CUDA rasterizer (reference call surface:
utils/gsplat_utils/gsplat_trainer.py:493 ``sh_degree`` argument;
utils/gsplat_utils/utils.py:91,107 ``_eval_sh_bases_fast``).

Everything here is elementwise VPU work that XLA fuses into the projection
pass; no kernel needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Hard-coded real SH constants (standard normalization, as used by 3DGS).
_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396)
_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
       0.3731763325901154, -0.4570457994644658, 1.445305721320277,
       -0.5900435899266435)
_C4 = (2.5033429417967046, -1.7701307697799304, 0.9461746957575601,
       -0.6690465435572892, 0.10578554691520431, -0.6690465435572892,
       0.47308734787878004, -1.7701307697799304, 0.6258357354491761)

MAX_SH_DEGREE = 4


def num_sh_bases(degree: int) -> int:
    return (degree + 1) ** 2


def eval_sh_bases(degree: int, dirs: jax.Array) -> jax.Array:
    """Evaluate SH basis functions at unit directions.

    Args:
      degree: SH degree in [0, 4] (static).
      dirs: ``[..., 3]`` unit direction vectors.

    Returns:
      ``[..., (degree+1)**2]`` basis values.
    """
    if not 0 <= degree <= MAX_SH_DEGREE:
        raise ValueError(f"SH degree must be in [0,{MAX_SH_DEGREE}], got {degree}")
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    out = [jnp.full(dirs.shape[:-1], _C0, dtype=dirs.dtype)]
    if degree >= 1:
        out += [-_C1 * y, _C1 * z, -_C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            _C2[0] * xy,
            _C2[1] * yz,
            _C2[2] * (2.0 * zz - xx - yy),
            _C2[3] * xz,
            _C2[4] * (xx - yy),
        ]
    if degree >= 3:
        out += [
            _C3[0] * y * (3.0 * xx - yy),
            _C3[1] * xy * z,
            _C3[2] * y * (4.0 * zz - xx - yy),
            _C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            _C3[4] * x * (4.0 * zz - xx - yy),
            _C3[5] * z * (xx - yy),
            _C3[6] * x * (xx - 3.0 * yy),
        ]
    if degree >= 4:
        out += [
            _C4[0] * xy * (xx - yy),
            _C4[1] * yz * (3.0 * xx - yy),
            _C4[2] * xy * (7.0 * zz - 1.0),
            _C4[3] * yz * (7.0 * zz - 3.0),
            _C4[4] * (zz * (35.0 * zz - 30.0) + 3.0),
            _C4[5] * xz * (7.0 * zz - 3.0),
            _C4[6] * (xx - yy) * (7.0 * zz - 1.0),
            _C4[7] * xz * (xx - 3.0 * yy),
            _C4[8] * (xx * (xx - 3.0 * yy) - yy * (3.0 * xx - yy)),
        ]
    return jnp.stack(out, axis=-1)


def eval_sh(degree: int, coeffs: jax.Array, dirs: jax.Array) -> jax.Array:
    """Evaluate SH color: sum_k basis_k(dir) * coeffs[..., k, :].

    Args:
      degree: active SH degree (static; coeffs beyond it are ignored).
      coeffs: ``[..., K, D]`` coefficients with K >= (degree+1)**2.
      dirs: ``[..., 3]`` unit view directions.

    Returns:
      ``[..., D]`` raw SH colors (caller adds 0.5 offset / clamping as in 3DGS).
    """
    n = num_sh_bases(degree)
    basis = eval_sh_bases(degree, dirs)  # [..., n]
    return jnp.einsum("...k,...kd->...d", basis, coeffs[..., :n, :])


def rgb_to_sh(rgb: jax.Array) -> jax.Array:
    """Convert RGB in [0,1] to degree-0 SH coefficients (reference
    utils/gsplat_utils/utils.py:148-150)."""
    return (rgb - 0.5) / _C0


def sh_to_rgb(sh0: jax.Array) -> jax.Array:
    """Inverse of :func:`rgb_to_sh`."""
    return sh0 * _C0 + 0.5
