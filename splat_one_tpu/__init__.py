"""splat_one_tpu: TPU-native images -> SfM -> 3D Gaussian Splatting framework.

Brand-new JAX/XLA/Pallas implementation with the capability surface of the
reference ``inuex35/splat_one`` (see SURVEY.md / COMPONENTS.md):
differentiable tile-based Gaussian rasterization (pinhole / ortho / fisheye /
spherical cameras), densification strategies, pose/appearance/bilateral
optimization, an SfM backend (features, matching, incremental reconstruction,
TPU bundle adjustment), model families (promptable masking, monocular depth,
learned matching), and pod-slice scaling via jax.sharding.

Convenience imports (submodules stay lazily importable on their own)::

    from splat_one_tpu import rasterization          # gsplat-style renderer
    from splat_one_tpu.train.trainer import Trainer  # the Runner equivalent
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level conveniences without forcing heavy imports at package load
    if name == "rasterization":
        from splat_one_tpu.render.rasterization import rasterization

        return rasterization
    if name == "Trainer":
        from splat_one_tpu.train.trainer import Trainer

        return Trainer
    if name == "Config":
        from splat_one_tpu.train.config import Config

        return Config
    raise AttributeError(f"module 'splat_one_tpu' has no attribute {name!r}")
