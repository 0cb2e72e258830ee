"""Ring-exchanged gaussian x supertile sharded rasterization parity.

The composed multi-chip layout (BASELINE configs 4-5): gaussians sharded
for projection, supertile slabs sharded for compositing, projected fields
moved by a ppermute ring. Must match the single-device stream renderer
exactly in both outputs and parameter gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from splat_one_tpu.parallel.ring_sharded import rasterization_ring_sharded
from splat_one_tpu.render.rasterization import rasterization


def make_scene(n=512, c=2, w=64, h=64, seed=0):
    rng = np.random.default_rng(seed)
    means = rng.normal(scale=1.0, size=(n, 3)).astype(np.float32)
    means[:, 2] += 3
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    scales = np.exp(
        rng.normal(loc=-2.8, scale=0.4, size=(n, 3))
    ).astype(np.float32)
    opac = (1 / (1 + np.exp(-rng.normal(size=n)))).astype(np.float32)
    sh = (rng.normal(size=(n, 4, 3)) * 0.3).astype(np.float32)
    c2w = np.tile(np.eye(4, dtype=np.float32), (c, 1, 1))
    c2w[1, 0, 3] = 0.2
    vm = np.linalg.inv(c2w).astype(np.float32)
    Ks = np.tile(
        np.array([[60.0, 0, w / 2], [0, 60.0, h / 2], [0, 0, 1]],
                 np.float32),
        (c, 1, 1),
    )
    return tuple(
        jnp.asarray(x) for x in (means, quats, scales, opac, sh, vm, Ks)
    )


@pytest.mark.parametrize("n_dev", [8])
def test_ring_matches_single(n_dev):
    if len(jax.devices()) < n_dev:
        pytest.skip("needs virtual devices")
    W = H = 64
    args = make_scene()
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("shard",))

    def loss_ring(means, quats, scales, opac, sh):
        rgb, a, d = rasterization_ring_sharded(
            means, quats, scales, opac, sh, args[5], args[6], W, H, mesh,
            sh_degree=1,
        )
        wts = jnp.linspace(0.5, 1.5, rgb.size).reshape(rgb.shape)
        return jnp.sum(rgb * wts) + 0.3 * jnp.sum(a) + jnp.sum(d)

    def loss_single(means, quats, scales, opac, sh):
        render, a, _ = rasterization(
            means, quats, scales, opac, sh, args[5], args[6], W, H,
            sh_degree=1, render_mode="RGB+ED", impl="stream",
        )
        rgb, d = render[..., :3], render[..., 3:]
        wts = jnp.linspace(0.5, 1.5, rgb.size).reshape(rgb.shape)
        return jnp.sum(rgb * wts) + 0.3 * jnp.sum(a) + jnp.sum(d)

    l1, g1 = jax.jit(jax.value_and_grad(loss_ring, argnums=(0, 1, 2, 3, 4))
                     )(*args[:5])
    l2, g2 = jax.jit(jax.value_and_grad(loss_single,
                                        argnums=(0, 1, 2, 3, 4)))(*args[:5])
    assert np.isfinite(float(l1))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a_, b_ in zip(g1, g2):
        d = np.abs(np.asarray(a_) - np.asarray(b_)).max()
        s = np.abs(np.asarray(b_)).max() + 1e-8
        assert d / s < 5e-4, (d, s)


@pytest.mark.parametrize("n_dev", [8])
def test_ring_nondivisible_grid(n_dev):
    """96x64 @ 2 cams -> 12 (camera, supertile) cells over 8 devices:
    the padded-slab path (phantom supertiles) must match single-device."""
    if len(jax.devices()) < n_dev:
        pytest.skip("needs virtual devices")
    W, H = 96, 64
    args = make_scene(w=W, h=H)
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("shard",))

    def loss_ring(means):
        rgb, a, d = rasterization_ring_sharded(
            means, *args[1:5], args[5], args[6], W, H, mesh, sh_degree=1,
        )
        wts = jnp.linspace(0.5, 1.5, rgb.size).reshape(rgb.shape)
        return jnp.sum(rgb * wts) + 0.3 * jnp.sum(a) + jnp.sum(d)

    def loss_single(means):
        render, a, _ = rasterization(
            means, *args[1:5], args[5], args[6], W, H,
            sh_degree=1, render_mode="RGB+ED", impl="stream",
        )
        rgb, d = render[..., :3], render[..., 3:]
        wts = jnp.linspace(0.5, 1.5, rgb.size).reshape(rgb.shape)
        return jnp.sum(rgb * wts) + 0.3 * jnp.sum(a) + jnp.sum(d)

    l1, g1 = jax.jit(jax.value_and_grad(loss_ring))(args[0])
    l2, g2 = jax.jit(jax.value_and_grad(loss_single))(args[0])
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    d = np.abs(np.asarray(g1) - np.asarray(g2)).max()
    s = np.abs(np.asarray(g2)).max() + 1e-8
    assert d / s < 5e-4, (d, s)


@pytest.mark.parametrize("n_dev", [8])
def test_ring_spherical_segmented_slabs(n_dev):
    """Spherical (equirect) ring sharding: wrapped gaussians are split
    into two unwrapped virtual segments so per-slab intersection counts
    are exact; must match the single-device spherical stream renderer."""
    if len(jax.devices()) < n_dev:
        pytest.skip("needs virtual devices")
    W, H = 128, 64
    rng = np.random.default_rng(7)
    n, c = 512, 1
    means = rng.normal(scale=2.0, size=(n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    scales = np.exp(rng.normal(-2.2, 0.4, (n, 3))).astype(np.float32)
    opac = (1 / (1 + np.exp(-rng.normal(size=n)))).astype(np.float32)
    sh = (rng.normal(size=(n, 4, 3)) * 0.3).astype(np.float32)
    vm = np.eye(4, dtype=np.float32)[None]
    Ks = np.array([[[W / (2 * np.pi), 0, W / 2],
                    [0, W / (2 * np.pi), H / 2], [0, 0, 1]]], np.float32)
    args = tuple(jnp.asarray(x)
                 for x in (means, quats, scales, opac, sh, vm, Ks))
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("shard",))

    def loss_ring(means):
        rgb, a, d = rasterization_ring_sharded(
            means, *args[1:5], args[5], args[6], W, H, mesh,
            sh_degree=1, camera_model="spherical",
        )
        wts = jnp.linspace(0.5, 1.5, rgb.size).reshape(rgb.shape)
        return jnp.sum(rgb * wts) + 0.3 * jnp.sum(a) + jnp.sum(d)

    def loss_single(means):
        render, a, _ = rasterization(
            means, *args[1:5], args[5], args[6], W, H,
            sh_degree=1, render_mode="RGB+ED", impl="stream",
            camera_model="spherical",
        )
        rgb, d = render[..., :3], render[..., 3:]
        wts = jnp.linspace(0.5, 1.5, rgb.size).reshape(rgb.shape)
        return jnp.sum(rgb * wts) + 0.3 * jnp.sum(a) + jnp.sum(d)

    l1, g1 = jax.jit(jax.value_and_grad(loss_ring))(args[0])
    l2, g2 = jax.jit(jax.value_and_grad(loss_single))(args[0])
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    d = np.abs(np.asarray(g1) - np.asarray(g2)).max()
    s = np.abs(np.asarray(g2)).max() + 1e-8
    assert d / s < 5e-4, (d, s)
