"""Parity tests: Pallas tile rasterizer vs the naive autodiff oracle.

This is the numerical harness the reference lacks (SURVEY.md §4): the tile
path (intersection layout + Pallas compositing + hand-written VJP) must match
the dense reference compositor to tight tolerances on renders AND gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splat_one_tpu.ops import intersect as im
from splat_one_tpu.ops.intersect import IsectCaps
from splat_one_tpu.ops.projection import project_gaussians
from splat_one_tpu.ops.reference import composite_reference
from splat_one_tpu.render.rasterization import rasterization


def make_scene(n=300, seed=0, spherical=False):
    rng = np.random.default_rng(seed)
    if spherical:
        # shell of gaussians surrounding a camera at the origin
        d = rng.normal(size=(n, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        r = rng.uniform(2.0, 4.0, (n, 1))
        means = (d * r).astype(np.float32)
    else:
        means = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        means[:, 2] += 4
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    scales = (np.exp(rng.uniform(-3.5, -2.0, (n, 3))) * 3).astype(np.float32)
    opac = rng.uniform(0.3, 1.0, n).astype(np.float32)
    sh = (rng.normal(size=(n, 4, 3)) * 0.3).astype(np.float32)
    viewmats = np.eye(4, dtype=np.float32)[None]
    Ks = np.array([[[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]]], np.float32)
    return tuple(
        jnp.asarray(x) for x in (means, quats, scales, opac, sh, viewmats, Ks)
    )


W = H = 64
TS = 16


class TestIntersect:
    def test_single_gaussian_tiles(self):
        """One gaussian with a known bbox must land in exactly its tiles."""
        from splat_one_tpu.ops.projection import Projected

        # gaussian at pixel (24, 24); conic 0.09*I -> ellipse half-extents
        # rx = ry = 3/sqrt(0.09) = 10 -> tiles (0..2, 0..2)
        proj = Projected(
            means2d=jnp.array([[[24.0, 24.0]]]),
            conics=jnp.array([[[0.09, 0.0, 0.09]]]),
            depths=jnp.array([[1.0]]),
            radii=jnp.array([[10.0]]),
            colors=jnp.ones((1, 1, 3)),
            opacities=jnp.array([[0.5]]),
            valid=jnp.array([[True]]),
        )
        caps = IsectCaps(exp_cap=64, align_cap=64 + 16 * 8, chunk=8)
        isect = im.build_intersections(proj, W, H, TS, caps)
        assert int(isect.n_isect) == 9  # 3x3 tiles
        starts = np.asarray(isect.tile_starts)
        counts = starts[1:] - starts[:-1]
        # 4x4 tile grid; gaussian covers tiles {0,1,2} x {0,1,2}
        expected = np.zeros(16, np.int64)
        for ty in range(3):
            for tx in range(3):
                expected[ty * 4 + tx] = 8  # aligned to chunk=8
        np.testing.assert_array_equal(counts, expected)

    def test_depth_order_within_tiles(self):
        scene = make_scene(200, seed=3)
        means, quats, scales, opac, sh, viewmats, Ks = scene
        proj = project_gaussians(
            means, quats, scales, opac, viewmats, Ks, W, H,
            sh_coeffs=sh, sh_degree=1,
        )
        caps = IsectCaps.choose(200, 1, 16)
        isect = im.build_intersections(proj, W, H, TS, caps)
        slot_src = np.append(np.asarray(isect.rank_src), 200)[
            np.asarray(isect.slot_rank)
        ]
        depths = np.append(np.asarray(proj.depths).ravel(), np.inf)
        slot_d = depths[slot_src]
        starts = np.asarray(isect.tile_starts)
        for t in range(len(starts) - 1):
            seg = slot_d[starts[t]:starts[t + 1]]
            seg = seg[np.isfinite(seg)]
            assert np.all(np.diff(seg) >= 0), f"tile {t} not depth sorted"

    def test_membership_matches_bbox(self):
        scene = make_scene(100, seed=4)
        means, quats, scales, opac, sh, viewmats, Ks = scene
        proj = project_gaussians(
            means, quats, scales, opac, viewmats, Ks, W, H,
            sh_coeffs=sh, sh_degree=1,
        )
        caps = IsectCaps.choose(100, 1, 16)
        isect = im.build_intersections(proj, W, H, TS, caps)
        starts = np.asarray(isect.tile_starts)
        slot_src = np.append(np.asarray(isect.rank_src), 100)[
            np.asarray(isect.slot_rank)
        ]
        from splat_one_tpu.ops.projection import conic_ellipse_radii

        uv = np.asarray(proj.means2d)[0]
        con = np.asarray(proj.conics)[0]
        rx_a, ry_a = conic_ellipse_radii(
            jnp.asarray(con[:, 0]), jnp.asarray(con[:, 1]),
            jnp.asarray(con[:, 2]),
            jnp.asarray(np.asarray(proj.opacities)[0]))
        rx_a, ry_a = np.asarray(rx_a), np.asarray(ry_a)
        valid = np.asarray(proj.valid)[0]
        TW = W // TS
        for t in range(len(starts) - 1):
            got = set(slot_src[starts[t]:starts[t + 1]])
            got.discard(100)  # sentinel
            ty, tx = divmod(t, TW)
            x0, x1 = tx * TS, (tx + 1) * TS
            y0, y1 = ty * TS, (ty + 1) * TS
            expect = set()
            for g in range(100):
                if not valid[g]:
                    continue
                u, v = uv[g]
                rx, ry = rx_a[g], ry_a[g]
                gx0 = np.clip(np.floor((u - rx) / TS), 0, TW) * TS
                gx1 = np.clip(np.ceil((u + rx) / TS), 0, TW) * TS
                gy0 = np.clip(np.floor((v - ry) / TS), 0, TW) * TS
                gy1 = np.clip(np.ceil((v + ry) / TS), 0, TW) * TS
                if gx0 < x1 and gx1 > x0 and gy0 < y1 and gy1 > y0:
                    expect.add(g)
            assert got == expect, f"tile {t}: {got ^ expect}"

    def test_overflow_flag(self):
        scene = make_scene(200, seed=5)
        means, quats, scales, opac, sh, viewmats, Ks = scene
        proj = project_gaussians(
            means, quats, scales, opac, viewmats, Ks, W, H,
            sh_coeffs=sh, sh_degree=1,
        )
        caps = IsectCaps(exp_cap=16, align_cap=64, chunk=8)
        isect = im.build_intersections(proj, W, H, TS, caps)
        assert bool(isect.overflow)


class TestForwardParity:
    @pytest.mark.parametrize("mode", ["classic", "antialiased"])
    def test_pinhole(self, mode):
        means, quats, scales, opac, sh, viewmats, Ks = make_scene(300)
        proj = project_gaussians(
            means, quats, scales, opac, viewmats, Ks, W, H,
            sh_coeffs=sh, sh_degree=1, antialiased=(mode == "antialiased"),
        )
        rgb_o, a_o, d_o = composite_reference(proj, W, H)
        caps = IsectCaps.choose(300, 1, 16)
        render, alpha, info = rasterization(
            means, quats, scales, opac, sh, viewmats, Ks, W, H,
            sh_degree=1, render_mode="RGB+ED", rasterize_mode=mode, caps=caps,
        )
        assert not bool(info["overflow"])
        np.testing.assert_allclose(render[..., 0:3], rgb_o, atol=1e-4)
        np.testing.assert_allclose(alpha, a_o, atol=1e-4)
        # API returns EXPECTED depth (gsplat ED); oracle is raw accumulated
        d_exp = d_o / np.clip(np.asarray(a_o), 1e-10, None)
        np.testing.assert_allclose(render[..., 3:4], d_exp, atol=5e-4)

    def test_spherical(self):
        means, quats, scales, opac, sh, viewmats, Ks = make_scene(
            300, spherical=True
        )
        Wp, Hp = 128, 64
        proj = project_gaussians(
            means, quats, scales, opac, viewmats, Ks, Wp, Hp,
            sh_coeffs=sh, sh_degree=1, camera_model="spherical",
        )
        rgb_o, a_o, _ = composite_reference(proj, Wp, Hp, wrap_x=True)
        caps = IsectCaps.choose(300, 1, (Wp // TS) * (Hp // TS))
        render, alpha, info = rasterization(
            means, quats, scales, opac, sh, viewmats, Ks, Wp, Hp,
            sh_degree=1, camera_model="spherical", caps=caps,
        )
        assert not bool(info["overflow"])
        # most pixels covered — a real panorama scene
        assert float(a_o.mean()) > 0.3
        np.testing.assert_allclose(render, rgb_o, atol=1e-4)
        np.testing.assert_allclose(alpha, a_o, atol=1e-4)

    def test_background(self):
        means, quats, scales, opac, sh, viewmats, Ks = make_scene(50)
        bg = jnp.array([[0.2, 0.4, 0.6]])
        caps = IsectCaps.choose(50, 1, 16)
        render, alpha, _ = rasterization(
            means, quats, scales, opac, sh, viewmats, Ks, W, H,
            sh_degree=1, backgrounds=bg, caps=caps,
        )
        # empty corners show pure background
        corner = np.asarray(render)[0, 0, 0]
        a = float(alpha[0, 0, 0, 0])
        if a < 1e-6:
            np.testing.assert_allclose(corner, [0.2, 0.4, 0.6], atol=1e-5)


class TestGradParity:
    def _loss_tile(self, params, statics, wr, wa, wd):
        means, quats, scales, opac, sh = params
        viewmats, Ks, caps = statics
        render, alpha, _ = rasterization(
            means, quats, scales, opac, sh, viewmats, Ks, W, H,
            sh_degree=1, render_mode="RGB+ED", caps=caps,
        )
        return (
            jnp.sum(render[..., 0:3] * wr)
            + jnp.sum(alpha * wa)
            + jnp.sum(render[..., 3:4] * wd)
        )

    def _loss_oracle(self, params, statics, wr, wa, wd):
        means, quats, scales, opac, sh = params
        viewmats, Ks, _ = statics
        proj = project_gaussians(
            means, quats, scales, opac, viewmats, Ks, W, H,
            sh_coeffs=sh, sh_degree=1,
        )
        rgb, a, d = composite_reference(proj, W, H)
        d_exp = d / jnp.clip(a, 1e-10, None)  # gsplat ED semantics
        return jnp.sum(rgb * wr) + jnp.sum(a * wa) + jnp.sum(d_exp * wd)

    def test_grads_match_oracle(self, rng):
        means, quats, scales, opac, sh, viewmats, Ks = make_scene(150, seed=7)
        caps = IsectCaps.choose(150, 1, 16)
        params = (means, quats, scales, opac, sh)
        statics = (viewmats, Ks, caps)
        wr = jnp.asarray(rng.normal(size=(1, H, W, 3)).astype(np.float32))
        wa = jnp.asarray(rng.normal(size=(1, H, W, 1)).astype(np.float32))
        wd = jnp.asarray(rng.normal(size=(1, H, W, 1)).astype(np.float32))

        g_tile = jax.grad(self._loss_tile)(params, statics, wr, wa, wd)
        g_oracle = jax.grad(self._loss_oracle)(params, statics, wr, wa, wd)
        names = ["means", "quats", "scales", "opacities", "sh"]
        for name, gt, go in zip(names, g_tile, g_oracle):
            gt, go = np.asarray(gt), np.asarray(go)
            scale = np.abs(go).max() + 1e-8
            np.testing.assert_allclose(
                gt / scale, go / scale, atol=5e-4,
                err_msg=f"grad mismatch for {name}",
            )

    def test_absgrad_bounds_grad(self, rng):
        means, quats, scales, opac, sh, viewmats, Ks = make_scene(100, seed=9)
        caps = IsectCaps.choose(100, 1, 16)
        wr = jnp.asarray(rng.normal(size=(1, H, W, 3)).astype(np.float32))
        dummy = jnp.zeros((1, 100, 2))

        def loss(m2d_dummy, abs_dummy):
            render, _, _ = rasterization(
                means, quats, scales, opac, sh, viewmats, Ks, W, H,
                sh_degree=1, caps=caps,
                means2d_dummy=m2d_dummy, absgrad_dummy=abs_dummy,
            )
            return jnp.sum(render * wr)

        gm, ga = jax.grad(loss, argnums=(0, 1))(dummy, dummy)
        gm, ga = np.asarray(gm), np.asarray(ga)
        assert np.all(np.isfinite(gm)) and np.all(np.isfinite(ga))
        assert ga.max() > 0
        # absgrad sums |per-pixel contributions| >= |their sum|
        assert np.all(ga + 1e-6 >= np.abs(gm))


def test_fisheye_parity():
    """Closed-form fisheye EWA Jacobian end-to-end: render parity vs the
    oracle (stream backend), and grads finite."""
    means, quats, scales, opac, sh, viewmats, Ks = make_scene(250, seed=9)
    proj = project_gaussians(
        means, quats, scales, opac, viewmats, Ks, W, H,
        sh_coeffs=sh, sh_degree=1, camera_model="fisheye",
    )
    rgb_o, a_o, _ = composite_reference(proj, W, H)

    def loss_fn(m):
        render, alpha, info = rasterization(
            m, quats, scales, opac, sh, viewmats, Ks, W, H,
            sh_degree=1, camera_model="fisheye", impl="stream",
        )
        return jnp.sum(render), (render, alpha)

    (_, (render, alpha)), g = jax.value_and_grad(
        loss_fn, has_aux=True)(means)
    np.testing.assert_allclose(render[..., 0:3], rgb_o, atol=1e-4)
    np.testing.assert_allclose(alpha, a_o, atol=1e-4)
    assert np.all(np.isfinite(np.asarray(g)))
