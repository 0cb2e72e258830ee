"""Isolate TPU mismatch: stream/tiled with termination on/off."""

import os
import numpy as np
import jax
import jax.numpy as jnp

if os.environ.get("STREAM_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")

from splat_one_tpu.ops import intersect as isect_mod
from splat_one_tpu.ops import stream_isect as si_mod
from splat_one_tpu.ops import stream_raster, tile_raster
from splat_one_tpu.ops.intersect import IsectCaps
from splat_one_tpu.ops.projection import project_gaussians
from splat_one_tpu.ops.stream_isect import StreamCaps
from splat_one_tpu.ops.stream_raster import StreamCfg
from splat_one_tpu.ops.tile_raster import RasterCfg


def make_scene(n=2000, c=2, seed=0):
    rng = np.random.default_rng(seed)
    means = rng.normal(scale=1.2, size=(n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    scales = np.exp(rng.normal(loc=-3.2, scale=0.5, size=(n, 3))).astype(
        np.float32)
    opac = (1.0 / (1.0 + np.exp(-rng.normal(size=(n,))))).astype(np.float32)
    colors = rng.uniform(size=(n, 3)).astype(np.float32)
    viewmats = np.tile(np.eye(4, dtype=np.float32), (c, 1, 1))
    viewmats[:, 2, 3] = 6.0
    viewmats[1:, 0, 3] = 0.3
    Ks = np.zeros((c, 3, 3), np.float32)
    w, h = 128, 96
    Ks[:, 0, 0] = Ks[:, 1, 1] = 110.0
    Ks[:, 0, 2] = w / 2
    Ks[:, 1, 2] = h / 2
    Ks[:, 2, 2] = 1.0
    return (jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
            jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(viewmats),
            jnp.asarray(Ks), w, h)


def setup():
    means, quats, scales, opac, colors, viewmats, Ks, w, h = make_scene()
    proj = project_gaussians(means, quats, scales, opac, viewmats, Ks, w, h,
                             colors=colors)
    return proj, w, h


def run_tiled(proj, w, h, term):
    C, N = proj.opacities.shape
    tw = -(-w // 16)
    th = -(-h // 16)
    caps = IsectCaps.choose(N, C, tw * th)
    cfg = RasterCfg(width=w, height=h, tile_size=16, num_cameras=C,
                    num_gaussians=N, chunk=caps.chunk,
                    align_cap=caps.align_cap, term_thresh=term)
    isect = isect_mod.build_intersections(proj, w, h, 16, caps)
    out = tile_raster.composite_tiles(
        cfg, proj.means2d, proj.conics, proj.colors, proj.opacities,
        proj.depths, isect)
    return tile_raster.tiles_to_image(cfg, out)


def run_stream(proj, w, h, term):
    C, N = proj.opacities.shape
    _, _, sw, sh = si_mod.supertile_grid(w, h, 16)
    caps = StreamCaps.choose(N, C, C * sw * sh)
    cfg = StreamCfg.from_caps(caps, w, h, 16, C, N, term_thresh=term)
    isect = si_mod.build_stream_intersections(proj, w, h, 16, caps)
    out = stream_raster.composite_stream(
        cfg, proj.means2d, proj.conics, proj.colors, proj.opacities,
        proj.depths, proj.radii, isect)
    return stream_raster.stream_to_image(cfg, out)


def cmp(name, a, b):
    for ch, x, y in zip(("rgb", "alpha", "depth"), a, b):
        x, y = np.asarray(x), np.asarray(y)
        d = np.abs(x - y).max()
        print(f"  {name:28s} {ch:6s} absmax={d:.3e}")


def main():
    print("backend:", jax.default_backend())
    proj, w, h = setup()
    f = jax.jit(lambda p, t: run_tiled(p, w, h, t), static_argnums=1)
    g = jax.jit(lambda p, t: run_stream(p, w, h, t), static_argnums=1)
    t_off = f(proj, 0.0)
    t_on = f(proj, 1e-5)
    s_off = g(proj, 0.0)
    s_on = g(proj, 1e-5)
    cmp("tiled(on) vs tiled(off)", t_on, t_off)
    cmp("stream(off) vs tiled(off)", s_off, t_off)
    cmp("stream(on) vs stream(off)", s_on, s_off)
    cmp("stream(on) vs tiled(on)", s_on, t_on)


if __name__ == "__main__":
    main()
