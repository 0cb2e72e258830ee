"""splat_one_tpu: TPU-native images -> SfM -> 3D Gaussian Splatting framework.

Brand-new JAX/XLA/Pallas implementation with the capability surface of the
reference ``inuex35/splat_one`` (see SURVEY.md): differentiable tile-based
Gaussian rasterization (pinhole / ortho / fisheye / spherical cameras),
densification strategies, pose/appearance optimization, SfM backend
(features, matching, incremental reconstruction, TPU bundle adjustment), and
pod-slice scaling via jax.sharding.
"""

__version__ = "0.1.0"
