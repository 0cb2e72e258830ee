"""Stream (supertile) rasterizer parity vs the oracle-verified tiled path.

The tiled rasterizer is itself parity-tested against the naive autodiff
oracle (test_rasterizer.py); these tests pin the second-generation stream
backend to it: forward images, full input gradients, spherical seam
wrapping, and the early-termination bookkeeping.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from splat_one_tpu.render.rasterization import rasterization


def _scene(n=600, c=2, seed=0, w=64, h=48, spherical=False):
    rng = np.random.default_rng(seed)
    means = rng.normal(scale=1.2, size=(n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    scales = np.exp(rng.normal(loc=-2.8, scale=0.5, size=(n, 3))).astype(
        np.float32)
    opac = (1.0 / (1.0 + np.exp(-rng.normal(size=(n,))))).astype(np.float32)
    colors = rng.uniform(size=(n, 3)).astype(np.float32)
    viewmats = np.tile(np.eye(4, dtype=np.float32), (c, 1, 1))
    viewmats[:, 2, 3] = 6.0
    if c > 1:
        viewmats[1:, 0, 3] = 0.3
    Ks = np.zeros((c, 3, 3), np.float32)
    Ks[:, 0, 0] = Ks[:, 1, 1] = (w / (2 * np.pi)) if spherical else 60.0
    Ks[:, 0, 2] = w / 2
    Ks[:, 1, 2] = h / 2
    Ks[:, 2, 2] = 1.0
    return (jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
            jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(viewmats),
            jnp.asarray(Ks), w, h)


def _run(impl, camera_model="pinhole", **scene_kw):
    means, quats, scales, opac, colors, viewmats, Ks, w, h = _scene(
        spherical=(camera_model == "spherical"), **scene_kw)

    def loss_fn(m, q, s, o, c):
        render, alpha, info = rasterization(
            m, q, s, o, c, viewmats, Ks, w, h, render_mode="RGB+ED",
            camera_model=camera_model, impl=impl)
        wts = jnp.linspace(0.5, 1.5, render.size).reshape(render.shape)
        return (jnp.sum(render * wts) + 0.3 * jnp.sum(alpha)), (render, alpha)

    vg = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4),
                                    has_aux=True))
    (loss, (render, alpha)), grads = vg(means, quats, scales, opac, colors)
    return np.asarray(loss), np.asarray(render), np.asarray(alpha), [
        np.asarray(g) for g in grads]


def _assert_close(name, a, b, tol):
    scale = np.abs(b).max() + 1e-8
    rel = np.abs(a - b).max() / scale
    assert rel < tol, f"{name}: rel={rel:.3e} (tol {tol})"


@pytest.mark.parametrize("camera_model", ["pinhole", "spherical"])
def test_stream_matches_tiled(camera_model):
    l_t, r_t, a_t, g_t = _run("tiled", camera_model)
    l_s, r_s, a_s, g_s = _run("stream", camera_model)
    assert abs(l_s - l_t) / (abs(l_t) + 1e-8) < 1e-5
    _assert_close("render", r_s, r_t, 1e-5)
    _assert_close("alpha", a_s, a_t, 1e-5)
    for n, (x, y) in zip(["means", "quats", "scales", "opac", "colors"],
                         zip(g_s, g_t)):
        _assert_close(f"grad {n}", x, y, 5e-4)


def test_stream_single_camera_small():
    # exercises partial supertiles at the image edge (w,h not /32)
    l_t, r_t, a_t, g_t = _run("tiled", n=200, c=1, w=40, h=24)
    l_s, r_s, a_s, g_s = _run("stream", n=200, c=1, w=40, h=24)
    _assert_close("render", r_s, r_t, 1e-5)
    for x, y in zip(g_s, g_t):
        _assert_close("grad", x, y, 5e-4)


def test_stream_empty_scene():
    # no visible gaussians: all-background output, zero grads, no NaNs
    means = jnp.full((8, 3), 100.0)  # far behind the camera
    quats = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (8, 1))
    scales = jnp.full((8, 3), 0.01)
    opac = jnp.full((8,), 0.9)
    colors = jnp.ones((8, 3)) * 0.5
    viewmats = jnp.eye(4)[None]
    Ks = jnp.asarray([[[60.0, 0, 16], [0, 60.0, 12], [0, 0, 1.0]]])

    def loss_fn(m):
        render, alpha, info = rasterization(
            m, quats, scales, opac, colors, viewmats, Ks, 32, 24,
            impl="stream")
        return jnp.sum(render) + jnp.sum(alpha)

    loss, g = jax.jit(jax.value_and_grad(loss_fn))(means)
    assert np.asarray(loss) == 0.0
    assert np.all(np.isfinite(np.asarray(g)))


def test_opacity_extent_drops_only_invisible():
    """The opacity-aware membership extent (projection.opacity_extent) is
    exact: alpha at and beyond the extent is below the 1/255 kill
    threshold for every opacity, so slots it drops contributed exactly
    zero. Also pins the analytic properties: capped at 3 sigma, monotone
    in opacity, and == 3.0 for opacities above e^{-4.5}*255... (i.e. the
    classic bbox is unchanged for high-opacity gaussians)."""
    from splat_one_tpu.ops.projection import ALPHA_CUT, opacity_extent
    from splat_one_tpu.ops.reference import ALPHA_MIN

    assert ALPHA_CUT == ALPHA_MIN
    op = jnp.asarray(
        np.r_[np.geomspace(1e-6, 1.0, 64), 1.0 / 255.0, 0.3527, 1.0],
        dtype=jnp.float32)
    s = np.asarray(opacity_extent(op))
    assert (s <= 3.0 + 1e-6).all()
    assert (np.diff(s[np.argsort(np.asarray(op))]) >= -1e-6).all()
    # alpha AT the extent boundary never exceeds the kill threshold
    # (up to the 1e-3-sigma safety margin's worth of slack)
    alpha_at = np.asarray(op) * np.exp(-0.5 * np.minimum(s, 2.999) ** 2)
    visible = np.asarray(op) > ALPHA_MIN
    capped = s >= 3.0 - 1e-6
    assert (alpha_at[visible & ~capped] <= ALPHA_MIN + 1e-7).all()
    # high opacities keep the full classic 3-sigma bbox
    assert s[-1] == 3.0 and np.asarray(opacity_extent(0.5)) == 3.0


def test_stream_low_opacity_parity():
    """Parity vs the tiled/oracle-verified path on a scene dominated by
    near-cutoff opacities — the regime where opacity-aware extents drop
    the most intersection rows; any over-tight extent shows up here."""
    means, quats, scales, opac, colors, viewmats, Ks, w, h = _scene(
        n=500, c=1, seed=11)
    rng = np.random.default_rng(12)
    opac = jnp.asarray(
        rng.uniform(0.002, 0.08, opac.shape).astype(np.float32))

    def loss_fn(impl, m, q, s, o, c):
        render, alpha, info = rasterization(
            m, q, s, o, c, viewmats, Ks, w, h, render_mode="RGB",
            impl=impl)
        wts = jnp.linspace(0.5, 1.5, render.size).reshape(render.shape)
        return jnp.sum(render * wts), render

    outs = {}
    for impl in ("stream", "tiled"):
        f = jax.jit(jax.value_and_grad(
            lambda *a: loss_fn(impl, *a), argnums=(0, 2, 3), has_aux=True))
        (loss, render), grads = f(means, quats, scales, opac, colors)
        outs[impl] = (np.asarray(render), [np.asarray(g) for g in grads])
    r_s, g_s = outs["stream"]
    r_t, g_t = outs["tiled"]
    assert np.abs(r_s - r_t).max() < 1e-5
    for name, a, b in zip(("means", "scales", "opac"), g_s, g_t):
        _assert_close(f"grad[{name}]", a, b, 1e-4)
