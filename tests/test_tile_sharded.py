"""Tile-sharded multi-chip rasterization: exact parity with single-device.

Runs on the 8-virtual-CPU-device mesh (conftest). The sharded render must
reproduce the single-device render bit-for-bit (same kernels, same math —
only the tile grid is partitioned), and gradients must psum back correctly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from splat_one_tpu.ops.intersect import IsectCaps
from splat_one_tpu.parallel.tile_sharded import rasterization_tile_sharded
from splat_one_tpu.render.rasterization import rasterization
from test_rasterizer import make_scene

W = H = 64
TS = 16


def _mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("tiles",))


class TestTileSharded:
    @pytest.mark.slow
    def test_forward_parity(self):
        means, quats, scales, opac, sh, viewmats, Ks = make_scene(200)
        mesh = _mesh(4)  # 16 tiles / 4 devices
        rgb_s, a_s, d_s = rasterization_tile_sharded(
            means, quats, scales, opac, sh, viewmats, Ks, W, H, mesh,
            sh_degree=1,
        )
        caps = IsectCaps.choose(200, 1, 16)
        render, alpha, _ = rasterization(
            means, quats, scales, opac, sh, viewmats, Ks, W, H,
            sh_degree=1, render_mode="RGB+ED", caps=caps,
        )
        np.testing.assert_allclose(rgb_s, render[..., 0:3], atol=1e-5)
        np.testing.assert_allclose(a_s, alpha, atol=1e-5)
        np.testing.assert_allclose(d_s, render[..., 3:4], atol=1e-4)

    @pytest.mark.slow
    def test_grad_parity(self, rng):
        means, quats, scales, opac, sh, viewmats, Ks = make_scene(120, seed=5)
        mesh = _mesh(4)
        wr = jnp.asarray(rng.normal(size=(1, H, W, 3)).astype(np.float32))

        def loss_sharded(m, s):
            rgb, a, d = rasterization_tile_sharded(
                m, quats, s, opac, sh, viewmats, Ks, W, H, mesh,
                sh_degree=1,
            )
            return jnp.sum(rgb * wr) + jnp.sum(a)

        caps = IsectCaps.choose(120, 1, 16)

        def loss_single(m, s):
            render, alpha, _ = rasterization(
                m, quats, s, opac, sh, viewmats, Ks, W, H,
                sh_degree=1, caps=caps,
            )
            return jnp.sum(render * wr) + jnp.sum(alpha)

        gs = jax.grad(loss_sharded, argnums=(0, 1))(means, scales)
        g1 = jax.grad(loss_single, argnums=(0, 1))(means, scales)
        for a, b, name in zip(gs, g1, ("means", "scales")):
            sc = np.abs(np.asarray(b)).max() + 1e-8
            np.testing.assert_allclose(
                np.asarray(a) / sc, np.asarray(b) / sc, atol=2e-4,
                err_msg=name,
            )

    @pytest.mark.slow
    def test_spherical_sharded(self):
        means, quats, scales, opac, sh, viewmats, Ks = make_scene(
            150, spherical=True
        )
        Wp, Hp = 128, 64
        mesh = _mesh(8)  # 32 tiles / 8 devices
        rgb_s, a_s, _ = rasterization_tile_sharded(
            means, quats, scales, opac, sh, viewmats, Ks, Wp, Hp, mesh,
            sh_degree=1, camera_model="spherical",
        )
        caps = IsectCaps.choose(150, 1, 32)
        render, alpha, _ = rasterization(
            means, quats, scales, opac, sh, viewmats, Ks, Wp, Hp,
            sh_degree=1, camera_model="spherical", caps=caps,
        )
        np.testing.assert_allclose(rgb_s, render, atol=1e-5)
        np.testing.assert_allclose(a_s, alpha, atol=1e-5)


class TestNonDivisibleTiles:
    def test_forward_parity_padded_grid(self):
        """64x48 -> 4x3 = 12 tiles over 8 devices (non-divisible): the
        padded phantom-tile path must reproduce single-device exactly."""
        w, h = 64, 48
        means, quats, scales, opac, sh, viewmats, Ks = make_scene(200)
        mesh = _mesh(8)
        rgb_s, a_s, d_s = rasterization_tile_sharded(
            means, quats, scales, opac, sh, viewmats, Ks, w, h, mesh,
            sh_degree=1,
        )
        caps = IsectCaps.choose(200, 1, 12)
        render, alpha, _ = rasterization(
            means, quats, scales, opac, sh, viewmats, Ks, w, h,
            sh_degree=1, render_mode="RGB+ED", caps=caps,
        )
        np.testing.assert_allclose(rgb_s, render[..., 0:3], atol=1e-5)
        np.testing.assert_allclose(a_s, alpha, atol=1e-5)
