"""Property test: exact per-slab intersection enumeration (stream_isect).

The supertile-sharded path claims each parent's in-slab cells form one
contiguous subrange [kA, kB) of its row-major bbox enumeration, computed
closed-form. Verify against brute-force enumeration over random bboxes,
slabs, and camera counts — including wrap-segmented spherical parents."""

import numpy as np
import jax.numpy as jnp
import pytest

from splat_one_tpu.ops import stream_isect as si
from splat_one_tpu.ops.projection import Projected


def _proj_from_boxes(ctrs, rads, depths, C, N, W, H, valid=None):
    """Build a minimal Projected with given screen centers/radii."""
    # opacity 1 => opacity_extent == 3.0 exactly, so the isotropic-conic
    # radius calibration below stays exact under opacity-aware extents
    z = np.ones((C, N), np.float32)
    if valid is None:
        valid = np.ones((C, N), bool)
    # membership radii now derive from the conic (3-sigma ellipse): an
    # isotropic conic a = c = (3/r)^2, b = 0 gives rx = ry = r exactly
    a = (3.0 / np.maximum(rads.reshape(C, N), 1e-6)) ** 2
    conics = np.stack([a, np.zeros_like(a), a], axis=-1).astype(np.float32)
    return Projected(
        means2d=jnp.asarray(ctrs.reshape(C, N, 2)),
        conics=jnp.asarray(conics),
        depths=jnp.asarray(depths.reshape(C, N)),
        radii=jnp.asarray(rads.reshape(C, N)),
        opacities=jnp.asarray(z),
        colors=jnp.asarray(np.zeros((C, N, 3), np.float32)),
        valid=jnp.asarray(valid.reshape(C, N)),
    )


def _effective_radii(conics, opacities=None):
    """The exact f32 radii the builder derives from the conic/opacity."""
    from splat_one_tpu.ops.projection import conic_ellipse_radii

    if opacities is None:
        opacities = np.ones(conics.shape[:-1], np.float32)
    rx, ry = conic_ellipse_radii(
        jnp.asarray(conics[..., 0]), jnp.asarray(conics[..., 1]),
        jnp.asarray(conics[..., 2]), jnp.asarray(opacities))
    return np.asarray(rx), np.asarray(ry)


def _brute_cells(u, v, rad, sw, sh, sps, spherical):
    """All (sy, sx) supertile cells of one gaussian's bbox, enumeration
    order identical to the builder's."""
    sy0 = int(np.clip(np.floor((v - rad) / sps), 0, sh))
    sy1 = int(np.clip(np.ceil((v + rad) / sps), 0, sh))
    if spherical:
        sx0u = int(np.floor((u - rad) / sps))
        span = min(int(np.ceil((u + rad) / sps)) - sx0u, sw)
        sx0 = sx0u % sw
        xs = [(sx0 + lx) % sw for lx in range(max(span, 0))]
    else:
        sx0 = int(np.clip(np.floor((u - rad) / sps), 0, sw))
        sx1 = int(np.clip(np.ceil((u + rad) / sps), 0, sw))
        xs = list(range(sx0, sx1))
    return [(sy, sx) for sy in range(sy0, sy1) for sx in xs]


@pytest.mark.parametrize("spherical", [False, True])
def test_slab_enumeration_matches_bruteforce(spherical):
    rng = np.random.default_rng(0 if spherical else 1)
    W, H, ts = 160, 96, 16
    tw, th, sw, sh = si.supertile_grid(W, H, ts)
    sps = ts * si.SS
    C, N = 2, 40
    NS = sw * sh
    cam_model = "spherical" if spherical else "pinhole"
    for trial in range(12):
        ctrs = rng.uniform(-30, max(W, H) + 30, (C, N, 2)).astype(
            np.float32)
        rads = rng.uniform(0, 60, (C, N)).astype(np.float32)
        depths = rng.uniform(1, 9, (C, N)).astype(np.float32)
        valid = rng.uniform(size=(C, N)) > 0.1
        proj = _proj_from_boxes(ctrs, rads, depths, C, N, W, H, valid)
        rx_eff, _ = _effective_radii(np.asarray(proj.conics))
        rads = rx_eff.reshape(C, N)
        # random slab
        cs_global = C * NS
        cs_local = int(rng.integers(1, cs_global + 1))
        st_lo = int(rng.integers(0, cs_global - cs_local + 1))
        caps = si.StreamCaps.choose(
            N, C, cs_local, avg_supertiles_per_gaussian=60.0)
        isect = si.build_stream_intersections(
            proj, W, H, ts, caps, camera_model=cam_model,
            st_lo=jnp.int32(st_lo), n_st_local=cs_local,
        )
        # brute force: per supertile (local id), the depth-sorted gaussian
        # list restricted to the slab
        expect = {s: [] for s in range(cs_local)}
        for c in range(C):
            order = np.argsort(depths[c], kind="stable")
            for g in order:
                if not valid[c, g]:
                    continue
                for sy, sx in _brute_cells(
                        ctrs[c, g, 0], ctrs[c, g, 1], rads[c, g],
                        sw, sh, sps, spherical):
                    flat = c * NS + sy * sw + sx
                    if st_lo <= flat < st_lo + cs_local:
                        expect[flat - st_lo].append(c * N + g)
        starts = np.asarray(isect.st_starts)
        sorted_g = np.asarray(isect.sorted_g)
        n_slots = int(isect.n_slots)
        assert not bool(isect.overflow)
        assert n_slots == sum(len(v) for v in expect.values())
        for s in range(cs_local):
            got = list(sorted_g[starts[s]:starts[s + 1]])
            want = sorted(expect[s], key=lambda g: (
                depths[g // N, g % N],))
            # same multiset per supertile; order equal up to depth ties
            assert sorted(got) == sorted(expect[s]), (trial, s)
            got_depths = [depths[g // N, g % N] for g in got]
            assert got_depths == sorted(got_depths), (trial, s)
