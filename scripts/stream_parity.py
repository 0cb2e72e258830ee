"""Parity check: stream rasterizer vs tiled (oracle-verified) rasterizer.

Usage:
  JAX_PLATFORMS=cpu python scripts/stream_parity.py   # interpret mode
  python scripts/stream_parity.py                     # real TPU
"""

import os
flags = os.environ.get("XLA_FLAGS", "")
SS_ENV = int(os.environ.get("SPLAT_SS", "2"))
if os.environ.get("STREAM_CPU", "1") == "1":
    import jax
    jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax
import jax.numpy as jnp

from splat_one_tpu.render.rasterization import rasterization
from splat_one_tpu.ops.intersect import IsectCaps


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


def run(impl, term_thresh=None):
    means, quats, scales, opac, colors, viewmats, Ks, w, h = make_scene()
    caps = None
    if impl == "stream" and SS_ENV != 2:
        from splat_one_tpu.ops.stream_isect import StreamCaps, supertile_grid
        _, _, sw_, sh_ = supertile_grid(w, h, 16, SS_ENV)
        caps = StreamCaps.choose(means.shape[0], viewmats.shape[0],
                                 viewmats.shape[0] * sw_ * sh_, ss=SS_ENV)

    def loss_fn(m, q, s, o, c):
        render, alpha, info = rasterization(
            m, q, s, o, c, viewmats, Ks, w, h, render_mode="RGB+ED",
            impl=impl, caps=caps)
        rgb, depth = render[..., :3], render[..., 3:]
        # weighted sums so grads are nontrivial
        wts = jnp.linspace(0.5, 1.5, rgb.size).reshape(rgb.shape)
        wd = jnp.linspace(0.2, 0.9, depth.size).reshape(depth.shape)
        return (jnp.sum(rgb * wts) + jnp.sum(depth * wd)
                + 0.3 * jnp.sum(alpha)), (rgb, alpha, depth)

    g = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4),
                                   has_aux=True))
    (loss, (rgb, alpha, depth)), grads = g(means, quats, scales, opac, colors)
    jax.block_until_ready(grads)
    return loss, rgb, alpha, depth, grads


def rel(a, b):
    a, b = np.asarray(a), np.asarray(b)
    d = np.abs(a - b).max()
    s = np.abs(b).max() + 1e-8
    return d, d / s


def main():
    print("backend:", jax.default_backend())
    l1, rgb1, a1, d1, g1 = run("tiled")
    l2, rgb2, a2, d2, g2 = run("stream")
    print(f"loss tiled={l1:.6f} stream={l2:.6f} "
          f"rel={abs(l1 - l2) / (abs(l1) + 1e-8):.2e}")
    for name, x, y in [("rgb", rgb1, rgb2), ("alpha", a1, a2),
                       ("depth", d1, d2)]:
        d, r = rel(y, x)
        print(f"  {name:8s} absmax={d:.3e} rel={r:.3e}")
    names = ["means", "quats", "scales", "opac", "colors"]
    # Grad bar on real TPU: 1e-3 relative. The stream kernel accumulates
    # forward colors with 3-pass split-bf16 matmuls (~1.5e-5 product
    # error); the backward's dalpha suffix term (godot - prefix)/(1-a)
    # subtracts nearly-equal quantities for late gaussians, amplifying
    # that to ~7e-4 rel on means/quats/opac (measured r2; NSPLIT=3 in the
    # reduction does NOT move it — the source is the fwd accumulation).
    # This is bounded-absolute noise of the same order as gsplat's CUDA
    # atomic-ordering nondeterminism; exact-f32 interpret-mode tests
    # remain the correctness oracle (tests/test_stream_raster.py).
    # TPU grad bar 1e-2: the packed-payload reduce path rounds per-slot
    # grads to bf16 (rel ~2^-9) before the per-gaussian sum (see
    # stream_raster._pack2); SPLAT_GRAD_PACK=0 restores the ~1e-3 f32 path.
    import os
    if jax.default_backend() == "cpu":
        bar = 5e-4
    elif os.environ.get("SPLAT_GRAD_PACK", "1") == "1":
        bar = 1e-2
    else:
        bar = 1e-3
    ok = True
    for n, x, y in zip(names, g1, g2):
        d, r = rel(y, x)
        flag = "" if r < bar else "  <-- MISMATCH"
        if r >= bar:
            ok = False
        print(f"  grad {n:8s} absmax={d:.3e} rel={r:.3e}{flag}")
    print("PARITY OK" if ok else "PARITY FAIL")


if __name__ == "__main__":
    main()
