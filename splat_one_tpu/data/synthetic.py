"""Synthetic scene generation for tests and benchmarks.

Generates a ground-truth gaussian scene, renders it from a ring of cameras
with the oracle-consistent rasterizer, and returns a :class:`SceneData` —
the test-harness role BASELINE.json config 1 assigns to the "synthetic
5k-gaussian sphere scene".
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from splat_one_tpu.core.transforms import make_viewmat
from splat_one_tpu.render.rasterization import rasterization
from splat_one_tpu.ops.intersect import IsectCaps


def look_at(eye: np.ndarray, target: np.ndarray, up=(0.0, -1.0, 0.0)):
    """c2w with +z forward (OpenCV convention, y down)."""
    f = target - eye
    f = f / np.linalg.norm(f)
    up = np.asarray(up, np.float64)
    r = np.cross(f, up)
    r = r / (np.linalg.norm(r) + 1e-12)
    d = np.cross(f, r)
    R = np.stack([r, d, f], axis=1)  # columns: right, down, forward
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = R
    c2w[:3, 3] = eye
    return c2w


def ring_cameras(n: int, radius: float, height: float, fov_deg: float,
                 width: int, height_px: int):
    c2ws, Ks = [], []
    f = 0.5 * width / np.tan(np.radians(fov_deg) / 2)
    for i in range(n):
        a = 2 * np.pi * i / n
        eye = np.array(
            [radius * np.cos(a), height, radius * np.sin(a)], np.float64
        )
        c2ws.append(look_at(eye, np.zeros(3)))
        Ks.append(
            np.array(
                [[f, 0, width / 2], [0, f, height_px / 2], [0, 0, 1]],
                np.float32,
            )
        )
    return np.stack(c2ws), np.stack(Ks)


def make_gt_gaussians(n: int, seed: int = 0, extent: float = 1.0,
                      surface: bool = False):
    """Random GT gaussians. Two regimes:

    - volumetric (default): semi-transparent blobs filling a sphere
      volume. Good for stressing the rasterizer, but NOT identifiable
      from a few dozen views — many volumetric configurations reproduce
      the training images exactly (measured r5: a 12k-step fit reached
      train-view PSNR 31 while held-out views rendered fog at 10.6), so
      held-out PSNR does not measure trainer quality on it.
    - surface: near-opaque splats on a bumpy sphere SHELL with smooth
      position-dependent color — the opaque-surface regime real scenes
      (and the reference's Mip-NeRF-style evals) live in, where
      multi-view photometric consistency pins the geometry and held-out
      views are predictive."""
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    if surface:
        # bumpy shell: radius field varies smoothly with direction
        bump = (0.12 * np.sin(3.0 * d[:, 0:1] * np.pi)
                * np.cos(2.0 * d[:, 1:2] * np.pi)
                + 0.08 * np.sin(4.0 * d[:, 2:3] * np.pi))
        r = extent * (0.8 + bump + rng.normal(0, 0.004, (n, 1)))
        means = (d * r).astype(np.float32)
        quats = rng.normal(size=(n, 4)).astype(np.float32)
        scales = np.exp(rng.uniform(-4.6, -3.9, (n, 3))).astype(
            np.float32) * extent
        opac = rng.uniform(0.85, 0.99, n).astype(np.float32)
        # smooth color field + texture noise: neighboring views see
        # consistent, interpolatable appearance
        rgb = np.stack(
            [
                0.5 + 0.35 * np.sin(2.5 * np.pi * means[:, 0] / extent),
                0.5 + 0.35 * np.cos(2.0 * np.pi * means[:, 1] / extent),
                0.5 + 0.35 * np.sin(1.5 * np.pi * means[:, 2] / extent
                                    + 1.0),
            ],
            axis=1,
        ) + rng.normal(0, 0.05, (n, 3))
        rgb = np.clip(rgb, 0.05, 0.95).astype(np.float32)
        return means, quats, scales, opac, rgb
    # clustered blobs on a sphere surface + volume fill
    r = extent * np.abs(rng.normal(0.7, 0.25, (n, 1)))
    means = (d * r).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    scales = np.exp(rng.uniform(-4.2, -3.0, (n, 3))).astype(np.float32) * extent
    opac = rng.uniform(0.4, 0.95, n).astype(np.float32)
    rgb = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
    return means, quats, scales, opac, rgb


def make_synthetic_scene(
    n_gaussians: int = 2000,
    n_cameras: int = 12,
    width: int = 128,
    height: int = 128,
    n_points: int = 500,
    seed: int = 0,
    camera_model: str = "pinhole",
    surface: bool = False,
):
    """Returns (SceneData, gt_params). GT images rendered by our rasterizer
    from a known gaussian scene, so a trainer fitting them has an achievable
    optimum (``surface=True`` for the identifiable opaque-shell variant —
    see make_gt_gaussians)."""
    from splat_one_tpu.core.sh import rgb_to_sh
    from splat_one_tpu.core.transforms import invert_se3
    from splat_one_tpu.train.trainer import SceneData

    means, quats, scales, opac, rgb = make_gt_gaussians(
        n_gaussians, seed, surface=surface)
    if camera_model == "spherical":
        c2ws = np.tile(np.eye(4, dtype=np.float32), (n_cameras, 1, 1))
        rng = np.random.default_rng(seed + 1)
        c2ws[:, :3, 3] = rng.uniform(-0.3, 0.3, (n_cameras, 3))
        Ks = np.tile(np.eye(3, dtype=np.float32), (n_cameras, 1, 1))
    elif surface:
        # THREE interleaved rings at different heights/radii: on a single
        # ring, the volume just in front of each camera lies OUTSIDE
        # every other camera's frustum, so training can park floaters
        # there that only held-out views see (measured r5: train PSNR
        # 28.5 / val 10.3 on the single-ring surface scene, with the fog
        # visible in val renders). Multi-ring coverage closes that
        # blind region the way real multi-height captures do.
        rings = [(3.0, -0.8), (2.4, -2.1), (2.7, 0.9)]
        c2w_l, K_l = [], []
        for j, (rad, hgt) in enumerate(rings):
            nj = n_cameras // len(rings) + (
                1 if j < n_cameras % len(rings) else 0)
            c2, K2 = ring_cameras(nj, rad, hgt, 60.0, width, height)
            c2w_l.append(c2)
            K_l.append(K2)
        # interleave rings so every-nth val splits span all rings
        order = np.argsort(
            np.concatenate([np.arange(len(c)) * len(rings) + j
                            for j, c in enumerate(c2w_l)]))
        c2ws = np.concatenate(c2w_l)[order]
        Ks = np.concatenate(K_l)[order]
        # per-camera radius/height jitter (re-aimed at the origin), like
        # a real handheld orbit: with all cameras at ring-exact radii,
        # the volume just in front of each camera lies outside every
        # other frustum — a blind region where training parks floaters
        # that only held-out views see. Radius diversity puts other
        # cameras' frusta THROUGH each camera's near field.
        rngc = np.random.default_rng(seed + 7)
        eyes = c2ws[:, :3, 3]
        radial = eyes * np.array([1.0, 0.0, 1.0])
        rn = np.linalg.norm(radial, axis=1, keepdims=True)
        jit_r = rngc.uniform(0.75, 1.25, (len(eyes), 1))
        eyes = (radial / rn) * (rn * jit_r) + np.array(
            [0.0, 1.0, 0.0]) * (eyes[:, 1:2]
                                + rngc.uniform(-0.35, 0.35,
                                               (len(eyes), 1)))
        c2ws = np.stack([look_at(e, np.zeros(3)) for e in eyes])
    else:
        c2ws, Ks = ring_cameras(n_cameras, 3.0, -0.8, 60.0, width, height)
    sh0 = np.asarray(rgb_to_sh(jnp.asarray(rgb)))[:, None, :]

    import jax

    viewmats = np.asarray(invert_se3(jnp.asarray(c2ws)))
    # jit and render per-camera: eager dispatch is pathological over the
    # TPU tunnel, and one-camera compiles are reused across the ring
    caps = IsectCaps.choose(
        n_gaussians, 1,
        (-(-width // 16)) * (-(-height // 16)),
    )

    @jax.jit
    def _render_one(vm, K):
        render, _, _ = rasterization(
            jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
            jnp.asarray(opac), jnp.asarray(sh0), vm[None], K[None],
            width, height, sh_degree=0,
            camera_model=camera_model, caps=caps,
        )
        return jnp.clip(render[0], 0.0, 1.0)

    images = np.stack(
        [
            np.asarray(_render_one(jnp.asarray(viewmats[i]),
                                   jnp.asarray(Ks[i])))
            for i in range(n_cameras)
        ]
    )

    # SfM-like init points: subsample GT means with color noise
    rng = np.random.default_rng(seed + 2)
    sel = rng.choice(n_gaussians, size=min(n_points, n_gaussians),
                     replace=False)
    points = means[sel] + rng.normal(0, 0.01, (len(sel), 3)).astype(np.float32)
    points_rgb = np.clip(
        rgb[sel] + rng.normal(0, 0.05, (len(sel), 3)), 0, 1
    ).astype(np.float32)

    scene = SceneData(
        camtoworlds=c2ws, Ks=Ks, images=images.astype(np.float32),
        # scene_scale convention shared with the COLMAP/OpenSfM parsers
        # (max camera distance from the camera centroid x 1.1, reference
        # gsplat_trainer.py:330-333). The old hardcoded 1.0 made the
        # DefaultStrategy big-splat prune (0.1 * scene_scale) fire on
        # legitimate splats once step > reset_every — the r3 quality-bench
        # run collapsed to zero splats through exactly that.
        points=points, points_rgb=points_rgb,
        scene_scale=float(
            np.linalg.norm(
                c2ws[:, :3, 3] - c2ws[:, :3, 3].mean(0), axis=-1
            ).max() * 1.1
        ),
        camera_model=camera_model,
    )
    gt = dict(means=means, quats=quats, scales=scales, opacities=opac,
              rgb=rgb)
    return scene, gt
