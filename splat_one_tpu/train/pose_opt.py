"""Camera pose optimization: per-image SE(3) deltas via 9-D embedding.

TPU-native equivalent of the reference ``CameraOptModule``
(utils/gsplat_utils/utils.py:12-48): a per-image embedding of 3 translation +
6D rotation parameters, applied as a *right* multiplication on the
camera-to-world transform, initialized to identity (zeros).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from splat_one_tpu.core.transforms import rotation_6d_to_matrix


def init_pose_params(n_images: int) -> jax.Array:
    """[n_images, 9]: (dx, dy, dz, 6d-rot) all zeros = identity."""
    return jnp.zeros((n_images, 9), jnp.float32)


def apply_pose_adjust(
    camtoworlds: jax.Array,  # [B, 4, 4]
    embeds: jax.Array,  # [B, 9] pose deltas for this batch
) -> jax.Array:
    """Adjust c2w by the learned local transform (identity at zero embeds).

    The 6D rotation is offset so zeros decode to the identity rotation
    (reference utils.py:36-44 adds (1,0,0, 0,1,0) before decoding).
    """
    dx = embeds[:, :3]
    drot = embeds[:, 3:] + jnp.array([1.0, 0, 0, 0, 1.0, 0], jnp.float32)
    R = rotation_6d_to_matrix(drot)  # [B, 3, 3]
    top = jnp.concatenate([R, dx[..., None]], axis=-1)  # [B, 3, 4]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0, 0, 1.0], jnp.float32), (embeds.shape[0], 1, 4)
    )
    delta = jnp.concatenate([top, bottom], axis=-2)  # [B, 4, 4]
    return camtoworlds @ delta


def perturb_poses(
    key: jax.Array, camtoworlds: jax.Array, std: float
) -> jax.Array:
    """Test-time pose noise (reference pose_noise path,
    gsplat_trainer.py:370-372): random embedding perturbation."""
    e = jax.random.normal(key, (camtoworlds.shape[0], 9)) * std
    return apply_pose_adjust(camtoworlds, e)
