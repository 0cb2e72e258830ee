"""Two-view geometry: essential matrix, RANSAC, pose recovery, triangulation.

TPU-native replacement for the two-view estimation inside OpenSfM's C++ core
(reference capability surface: robust matching thresholds and five-point /
RANSAC config in config/config.yaml:79-90, consumed by
``match_features``/``reconstruct`` actions). Design: the 8-point algorithm on
*bearing vectors* (camera-model agnostic — works for pinhole, fisheye and
spherical alike, which is how OpenSfM handles panoramas) inside a fully
vmapped RANSAC: all hypotheses are evaluated in one batched SVD + one
[hyp, n] angular-error matrix — no data-dependent loops.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


def _essential_8pt(b1: jax.Array, b2: jax.Array) -> jax.Array:
    """Essential matrix from >= 8 bearing correspondences ([n,3] each) via
    the linear (8-point) algorithm + rank-2 projection. Returns [3,3]."""
    # rows: kron(b2, b1) so that b2^T E b1 = 0
    A = jnp.einsum("ni,nj->nij", b2, b1).reshape(-1, 9)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    E = vt[-1].reshape(3, 3)
    u, s, vt2 = jnp.linalg.svd(E)
    s_fix = jnp.array([1.0, 1.0, 0.0], E.dtype) * (s[0] + s[1]) / 2.0
    return u @ jnp.diag(s_fix) @ vt2


def _essential_5pt_candidates(b1: jax.Array, b2: jax.Array,
                              n_starts: int = 16) -> jax.Array:
    """Minimal 5-point essential solver, TPU-shaped: [n_starts, 3, 3]
    candidate matrices (the RANSAC scores them all, as it scores Nister's
    <= 10 polynomial roots).

    Classic Nister reduces the problem to a degree-10 polynomial whose
    roots come from an eigendecomposition — unsupported on TPU. Here the
    4-dim nullspace E(a) = a @ basis (from the 5x9 SVD) is searched by
    multistart RIEMANNIAN Gauss-Newton on the Demazure constraints
    (det(E) = 0 and 2 E E^T E - tr(E E^T) E = 0, 10 cubic residuals) over
    the unit 3-sphere of coefficients: the constraints are homogeneous, so
    the step is solved in the tangent space of the sphere (a plain GN step
    mostly shrinks the scale and stalls). Every converged start is
    projected to the essential manifold and returned. Unlike the linear
    8-point estimate, the minimal solver stays well-posed for planar
    scenes (config.yaml:79-90 five-point analog)."""
    A = jnp.einsum("ni,nj->nij", b2, b1).reshape(-1, 9)  # [5, 9]
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    basis = vt[5:9]  # [4, 9] nullspace

    def constraints(a):
        E = (a @ basis).reshape(3, 3)
        EEt = E @ E.T
        M = 2.0 * EEt @ E - jnp.trace(EEt) * E
        return jnp.concatenate(
            [M.reshape(9), jnp.linalg.det(E)[None]]
        )  # [10]

    def gn(a0):
        def body(_, a):
            r = constraints(a)
            J = jax.jacfwd(constraints)(a)  # [10, 4]
            # tangent basis of S^3 at a (right-singular vectors 2..4 of a^T)
            _, _, vt_a = jnp.linalg.svd(a[None, :], full_matrices=True)
            T = vt_a[1:4].T  # [4, 3] orthonormal, perpendicular to a
            Jt = J @ T  # [10, 3]
            step = jnp.linalg.solve(
                Jt.T @ Jt + 1e-10 * jnp.eye(3), Jt.T @ r
            )
            a = a - T @ step
            return a / jnp.maximum(jnp.linalg.norm(a), 1e-12)
        return jax.lax.fori_loop(0, 20, body, a0)

    # deterministic quasi-uniform starts on S^3 (no RNG plumbing needed)
    i = jnp.arange(n_starts, dtype=jnp.float32)[:, None]
    seeds = jnp.sin(
        (i + 1.0) * jnp.array([[1.0, 2.1, 3.3, 4.7]]) * 1.6180339
    )
    seeds = seeds / jnp.linalg.norm(seeds, axis=-1, keepdims=True)
    sols = jax.vmap(gn)(seeds)  # [S, 4]
    Es = (sols @ basis).reshape(-1, 3, 3)  # [S, 3, 3]

    def project(E):
        u, s, vt2 = jnp.linalg.svd(E)
        s_fix = jnp.array([1.0, 1.0, 0.0], E.dtype) * (s[0] + s[1]) / 2.0
        return u @ jnp.diag(s_fix) @ vt2

    return jax.vmap(project)(Es)


def _epipolar_angle_error(E: jax.Array, b1: jax.Array, b2: jax.Array):
    """Angular epipolar error (OpenSfM-style): sine of the angle between b2
    and the epipolar plane of b1 (symmetric)."""
    Eb1 = b1 @ E.T  # [n,3] epipolar plane normals in cam2
    Etb2 = b2 @ E  # normals in cam1
    num = jnp.abs(jnp.sum(b2 * Eb1, axis=-1))
    d1 = num / jnp.maximum(jnp.linalg.norm(Eb1, axis=-1), 1e-12)
    d2 = num / jnp.maximum(jnp.linalg.norm(Etb2, axis=-1), 1e-12)
    return jnp.maximum(d1, d2)


class RansacResult(NamedTuple):
    E: jax.Array  # [3, 3]
    inliers: jax.Array  # [n] bool
    n_inliers: jax.Array  # []


@partial(jax.jit, static_argnames=("n_hyp", "solver"))
def ransac_essential(
    key: jax.Array,
    b1: jax.Array,  # [n, 3] unit bearings in camera 1
    b2: jax.Array,  # [n, 3]
    valid: jax.Array,  # [n] bool (padding mask)
    threshold: float = 0.004,  # sine-angle threshold (config.yaml
    # robust_matching_threshold analog)
    n_hyp: int = 256,
    solver: str = "5pt",  # "5pt" (minimal, planar-safe) | "8pt" (linear)
) -> RansacResult:
    """Fully-batched RANSAC: n_hyp minimal/linear hypotheses at once."""
    n = b1.shape[0]
    n_sample = 5 if solver == "5pt" else 8
    # sample correspondences per hypothesis among the valid PREFIX: every
    # caller pads with a suffix mask (valid = arange(cap) < m), so uniform
    # ints modulo the live count sample exactly the valid rows.
    # (jax.random.categorical over the mask logits draws a [hyp, sample,
    # cap] gumbel field — measured 0.24 s/call at cap=1024 on CPU.)
    n_valid = jnp.maximum(jnp.sum(valid.astype(jnp.int32)), 1)
    u = jax.random.randint(key, (n_hyp, n_sample), 0, 1 << 30)
    idx = u % n_valid
    s1 = b1[idx]  # [hyp, n_sample, 3]
    s2 = b2[idx]
    if solver == "5pt":
        # every converged start is a candidate (the analog of scoring all
        # of Nister's polynomial roots); flatten into the hypothesis axis
        Es = jax.vmap(_essential_5pt_candidates)(s1, s2).reshape(-1, 3, 3)
    else:
        Es = jax.vmap(_essential_8pt)(s1, s2)  # [hyp, 3, 3]
    errs = jax.vmap(lambda E: _epipolar_angle_error(E, b1, b2))(Es)
    inl = (errs < threshold) & valid[None, :]
    scores = jnp.sum(inl, axis=-1)
    best = jnp.argmax(scores)
    E_out = Es[best]
    inl_out = inl[best]
    best_score = scores[best]
    # iterative refit on inliers (weighted 8-point, IRLS-style): each round
    # re-estimates E from the current inlier set and re-classifies.
    rows = jnp.einsum("ni,nj->nij", b2, b1).reshape(-1, 9)
    for _ in range(3):
        w = inl_out.astype(b1.dtype)
        A = rows * w[:, None]
        # null vector via the 9x9 normal matrix: svd(A, full_matrices)
        # materializes a [n, n] U (measured 0.8 s/call at n=1024 on CPU
        # — it dominated the whole RANSAC); A^T A is 9x9 regardless of n
        _, evecs = jnp.linalg.eigh(A.T @ A)
        E_ref = evecs[:, 0].reshape(3, 3)  # smallest eigenvalue first
        u, s, vt2 = jnp.linalg.svd(E_ref)
        E_ref = (
            u @ jnp.diag(jnp.array([1.0, 1.0, 0.0]) * (s[0] + s[1]) / 2) @ vt2
        )
        errs_ref = _epipolar_angle_error(E_ref, b1, b2)
        inl_ref = (errs_ref < threshold) & valid
        better = jnp.sum(inl_ref) >= best_score
        E_out = jnp.where(better, E_ref, E_out)
        inl_out = jnp.where(better, inl_ref, inl_out)
        best_score = jnp.maximum(best_score, jnp.sum(inl_ref))
    return RansacResult(E_out, inl_out, jnp.sum(inl_out))


def triangulate(
    R1, t1, R2, t2, b1: jax.Array, b2: jax.Array
) -> jax.Array:
    """Midpoint-free linear (DLT-style) triangulation from bearings.

    (R, t) are world->camera. Returns world points [n, 3]. Camera-model
    agnostic: rows constrain the point to each bearing's ray."""

    def rows(R, t, b):
        # two independent constraints orthogonal to the bearing
        e = jnp.where(
            jnp.abs(b[..., 2:3]) < 0.9,
            jnp.array([0.0, 0.0, 1.0]),
            jnp.array([1.0, 0.0, 0.0]),
        )
        u = jnp.cross(b, e)
        u = u / jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), 1e-12)
        v = jnp.cross(b, u)
        # u . (R X + t) = 0 and v . (R X + t) = 0
        A1 = u @ R
        c1 = -jnp.sum(u * t, axis=-1)
        A2 = v @ R
        c2 = -jnp.sum(v * t, axis=-1)
        return jnp.stack([A1, A2], -2), jnp.stack([c1, c2], -1)

    A1, c1 = rows(R1, t1, b1)
    A2, c2 = rows(R2, t2, b2)
    A = jnp.concatenate([A1, A2], axis=-2)  # [n, 4, 3]
    c = jnp.concatenate([c1, c2], axis=-1)  # [n, 4]
    AtA = jnp.einsum("nij,nik->njk", A, A)
    Atc = jnp.einsum("nij,ni->nj", A, c)
    return jnp.linalg.solve(
        AtA + 1e-9 * jnp.eye(3), Atc[..., None]
    )[..., 0]


def decompose_essential(
    E: jax.Array, b1: jax.Array, b2: jax.Array, valid: jax.Array
):
    """E -> (R, t) world(cam1)->cam2 with cheirality check over the four
    candidate decompositions. Returns (R [3,3], t [3], n_good)."""
    u, _, vt = jnp.linalg.svd(E)
    # enforce proper rotations
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))
    W = jnp.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]])
    R_cands = jnp.stack([u @ W @ vt, u @ W.T @ vt])
    t_cands = jnp.stack([u[:, 2], -u[:, 2]])

    eye = jnp.eye(3)
    zero = jnp.zeros(3)

    def count_front(R, t):
        X = triangulate(eye, zero, R, t, b1, b2)
        d1 = jnp.sum(X * b1, axis=-1)  # depth along ray 1
        Xc2 = X @ R.T + t
        d2 = jnp.sum(Xc2 * b2, axis=-1)
        return jnp.sum((d1 > 0) & (d2 > 0) & valid)

    counts = jnp.stack(
        [
            count_front(R_cands[i], t_cands[j])
            for i in range(2)
            for j in range(2)
        ]
    )
    k = jnp.argmax(counts)
    R = R_cands[k // 2]
    t = t_cands[k % 2]
    return R, t, counts[k]


def _tangent_basis(b):
    """Orthonormal (u, v) spanning the plane perpendicular to bearing b."""
    e = jnp.where(
        jnp.abs(b[..., 2:3]) < 0.9,
        jnp.array([0.0, 0.0, 1.0]),
        jnp.array([1.0, 0.0, 0.0]),
    )
    u = jnp.cross(b, e)
    u = u / jnp.maximum(
        jnp.linalg.norm(u, axis=-1, keepdims=True), 1e-12
    )
    v = jnp.cross(b, u)
    return u, v


def _procrustes(A, B, w):
    """Weighted rigid alignment: R, t with B ~ R A + t (rows are points)."""
    ws = w / jnp.maximum(jnp.sum(w), 1e-12)
    muA = jnp.sum(A * ws[:, None], axis=0)
    muB = jnp.sum(B * ws[:, None], axis=0)
    H = (A - muA).T @ ((B - muB) * ws[:, None])
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.linalg.det(Vt.T @ U.T)
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0]) * jnp.array([1.0, 1.0, d]))
    R = Vt.T @ D @ U.T
    t = muB - R @ muA
    return R, t


def rvec_from_rotmat(Rm: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> angle-axis, branchless and stable at theta ~ pi.

    Shepperd's quaternion extraction: build all four candidates (trace and
    each dominant diagonal), pick the best-conditioned by argmax — the
    skew-part-only formula loses the axis as theta -> pi (sfm review r2)."""
    t = jnp.trace(Rm)
    d0, d1, d2 = Rm[0, 0], Rm[1, 1], Rm[2, 2]
    cw = jnp.array([1 + t, Rm[2, 1] - Rm[1, 2], Rm[0, 2] - Rm[2, 0],
                    Rm[1, 0] - Rm[0, 1]])
    cx = jnp.array([Rm[2, 1] - Rm[1, 2], 1 + d0 - d1 - d2,
                    Rm[1, 0] + Rm[0, 1], Rm[0, 2] + Rm[2, 0]])
    cy = jnp.array([Rm[0, 2] - Rm[2, 0], Rm[1, 0] + Rm[0, 1],
                    1 - d0 + d1 - d2, Rm[2, 1] + Rm[1, 2]])
    cz = jnp.array([Rm[1, 0] - Rm[0, 1], Rm[0, 2] + Rm[2, 0],
                    Rm[2, 1] + Rm[1, 2], 1 - d0 - d1 + d2])
    cands = jnp.stack([cw, cx, cy, cz])  # [4, 4]
    mags = jnp.array([1 + t, 1 + d0 - d1 - d2, 1 - d0 + d1 - d2,
                      1 - d0 - d1 + d2])
    q = cands[jnp.argmax(mags)]
    q = q / jnp.maximum(jnp.linalg.norm(q), 1e-12)
    q = q * jnp.where(q[0] < 0, -1.0, 1.0)
    nv = jnp.linalg.norm(q[1:])
    theta = 2.0 * jnp.arctan2(nv, q[0])
    axis = q[1:] / jnp.maximum(nv, 1e-12)
    return jnp.where(nv < 1e-12, jnp.zeros(3), axis * theta)


def pnp_dlt(
    points: jax.Array,  # [n, 3] world points
    bearings: jax.Array,  # [n, 3] unit bearings
    valid: jax.Array,  # [n]
    gn_iters: int = 5,
):
    """Calibrated resection via EPnP (control-point kernel + Procrustes)
    with Gauss-Newton refinement on the tangent-plane residuals.

    A plain projective DLT is degenerate under noise for narrow fields of
    view (the 11-dof fit beats the rigid one with a rank-deficient rotation
    block); EPnP's rigid parametrization avoids that. Works from >= 6
    correspondences (RANSAC minimal samples included).
    """
    w = valid.astype(points.dtype)
    ws = w / jnp.maximum(jnp.sum(w), 1e-12)

    # world control points: centroid + principal axes
    mu = jnp.sum(points * ws[:, None], axis=0)
    cen = points - mu
    cov = (cen * ws[:, None]).T @ cen
    evals, evecs = jnp.linalg.eigh(cov)
    sc = jnp.sqrt(jnp.maximum(evals, 1e-12))
    C = jnp.concatenate(
        [mu[None], mu[None] + evecs.T * sc[:, None]], axis=0
    )  # [4, 3]
    # barycentric coordinates: [C^T; 1] alpha = [X; 1]
    T = jnp.concatenate([C.T, jnp.ones((1, 4))], axis=0)  # [4, 4]
    Xh = jnp.concatenate(
        [points, jnp.ones((points.shape[0], 1))], axis=1
    )  # [n, 4]
    alpha = jnp.linalg.solve(T, Xh.T).T  # [n, 4]

    u, v = _tangent_basis(bearings)  # [n, 3] each
    # rows: sum_j alpha_j * (u . c_j) = 0  -> [n, 12]
    Mu = (alpha[:, :, None] * u[:, None, :]).reshape(-1, 12)
    Mv = (alpha[:, :, None] * v[:, None, :]).reshape(-1, 12)
    M = jnp.concatenate([Mu * w[:, None], Mv * w[:, None]], axis=0)
    _, _, vt = jnp.linalg.svd(M, full_matrices=True)
    ck = vt[-1].reshape(4, 3)  # camera-frame control points (up to scale)

    # scale from control-point pairwise distances (least squares)
    dC = C[:, None] - C[None]  # [4,4,3]
    dk = ck[:, None] - ck[None]
    num = jnp.sum(
        jnp.linalg.norm(dC, axis=-1) * jnp.linalg.norm(dk, axis=-1)
    )
    den = jnp.sum(jnp.sum(dk * dk, axis=-1))
    beta = num / jnp.maximum(den, 1e-12)
    c_cam = ck * beta
    # sign: majority of points in front of the camera
    x_cam = alpha @ c_cam  # [n, 3]
    sgn = jnp.sign(
        jnp.sum(jnp.where(valid, jnp.sum(x_cam * bearings, -1), 0.0))
    )
    sgn = jnp.where(sgn == 0, 1.0, sgn)
    c_cam = c_cam * sgn

    R, t = _procrustes(C, c_cam, jnp.ones(4))

    # Gauss-Newton refinement on (rvec, t)
    from splat_one_tpu.sfm.ba import _residual, _rodrigues

    cam = jnp.concatenate([rvec_from_rotmat(R), t])

    def gn_step(cam, _):
        def all_res(c):
            return jax.vmap(lambda X, b: _residual(c, X, b))(
                points, bearings
            ) * w[:, None]

        r = all_res(cam)
        J = jax.jacfwd(all_res)(cam).reshape(-1, 6)
        g = J.T @ r.reshape(-1)
        H = J.T @ J + 1e-8 * jnp.eye(6)
        return cam - jnp.linalg.solve(H, g), None

    cam, _ = jax.lax.scan(gn_step, cam, None, length=gn_iters)
    return _rodrigues(cam[:3]), cam[3:]


@partial(jax.jit, static_argnames=("n_hyp",))
def ransac_pnp(
    key: jax.Array,
    points: jax.Array,  # [n, 3]
    bearings: jax.Array,  # [n, 3]
    valid: jax.Array,
    threshold: float = 0.01,  # angular (sine) reprojection threshold
    n_hyp: int = 128,
):
    """Batched RANSAC resection: n_hyp DLT hypotheses from 6-point samples."""
    # prefix-valid sampling (see ransac_essential): callers pad with
    # suffix masks, so ints modulo the live count hit only valid rows
    n_valid = jnp.maximum(jnp.sum(valid.astype(jnp.int32)), 1)
    idx = jax.random.randint(key, (n_hyp, 6), 0, 1 << 30) % n_valid
    Rs, ts = jax.vmap(
        lambda i: pnp_dlt(points[i], bearings[i], jnp.ones(6, bool))
    )(idx)

    def err(R, t):
        p = points @ R.T + t
        p = p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-12)
        e = jnp.linalg.norm(jnp.cross(p, bearings), axis=-1)
        # cheirality: |cross| = |sin| is also ~0 at 180 deg — a point
        # BEHIND its bearing must never count as an inlier
        return jnp.where(jnp.sum(p * bearings, axis=-1) > 0, e, 2.0)

    errs = jax.vmap(err)(Rs, ts)
    inl = (errs < threshold) & valid[None]
    scores = jnp.sum(inl, axis=-1)
    best = jnp.argmax(scores)
    # refit on inliers
    R_ref, t_ref = pnp_dlt(points, bearings, inl[best])
    e_ref = err(R_ref, t_ref)
    inl_ref = (e_ref < threshold) & valid
    better = jnp.sum(inl_ref) >= scores[best]
    R = jnp.where(better, R_ref, Rs[best])
    t = jnp.where(better, t_ref, ts[best])
    inliers = jnp.where(better, inl_ref, inl[best])
    return R, t, inliers, jnp.sum(inliers)
