"""Batched Levenberg-Marquardt bundle adjustment on TPU.

TPU-native replacement for the Ceres solver the reference uses inside
OpenSfM (SURVEY.md N9; config surface config/config.yaml:95-124 —
SoftLOneLoss robust kernel, ``bundle_max_iterations``, analytic derivatives).

Design (SURVEY.md §7 hard part 5), built for XLA rather than translated from
Ceres:
  - residuals are *bearing* reprojection errors in each observation's tangent
    plane (camera-model agnostic: pinhole, fisheye and spherical shots all
    reduce to unit bearings — how OpenSfM supports panoramas);
  - per-edge Jacobians come from one vmapped ``jax.jacfwd`` over the exact
    residual (analytic-quality, zero hand-derivation);
  - the reduced camera system is solved with *iterative Schur*: block-Jacobi
    preconditioned CG where each matvec is two edge-parallel products plus
    two segment reductions (the Ceres ITERATIVE_SCHUR strategy, mapped to
    TPU: every reduction is a static-permutation gather + cumsum + boundary
    diff — no scatters, see ops.intersect for the measured rationale);
  - soft-L1 IRLS reweighting, LM trust-region damping with accept/reject.

Edge layout is static: edges pre-sorted by camera; the point-sorted
permutation is precomputed host-side. Everything jits with fixed shapes.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class BAConfig:
    max_iterations: int = 20  # LM outer iterations (config.yaml:115 scale)
    cg_iterations: int = 20
    loss: str = "soft_l1"  # or "linear" (config.yaml loss function)
    loss_scale: float = 0.006  # radians (~ robust_matching_threshold scale)
    init_lambda: float = 1e-3
    fix_first_camera: bool = True


class BAProblem(NamedTuple):
    """Static-shape BA problem. Edges MUST be sorted by cam_idx."""

    cam_idx: jax.Array  # [E] int32, sorted ascending
    pt_idx: jax.Array  # [E] int32
    bearings: jax.Array  # [E, 3] unit observation bearings
    valid: jax.Array  # [E] bool
    cam_bounds: jax.Array  # [C+1] edge ranges per camera
    pt_perm: jax.Array  # [E] permutation sorting edges by point
    pt_sorted: jax.Array  # [E] pt_idx[pt_perm]
    pt_bounds: jax.Array  # [P+1] ranges in point-sorted order


def build_problem(
    cam_idx: np.ndarray, pt_idx: np.ndarray, bearings: np.ndarray,
    n_cams: int, n_points: int, valid: np.ndarray = None,
) -> BAProblem:
    """Host-side: sort edges by camera, precompute reduction layouts."""
    order = np.argsort(cam_idx, kind="stable")
    cam_idx = np.asarray(cam_idx, np.int32)[order]
    pt_idx = np.asarray(pt_idx, np.int32)[order]
    bearings = np.asarray(bearings, np.float32)[order]
    valid = (
        np.ones(len(cam_idx), bool) if valid is None else valid[order]
    )
    cam_bounds = np.searchsorted(cam_idx, np.arange(n_cams + 1)).astype(
        np.int32
    )
    pt_perm = np.argsort(pt_idx, kind="stable").astype(np.int32)
    pt_sorted = pt_idx[pt_perm]
    pt_bounds = np.searchsorted(pt_sorted, np.arange(n_points + 1)).astype(
        np.int32
    )
    return BAProblem(
        *(jnp.asarray(x) for x in (
            cam_idx, pt_idx, bearings, valid, cam_bounds, pt_perm,
            pt_sorted, pt_bounds,
        ))
    )


def _segsum_sorted(vals: jax.Array, bounds: jax.Array) -> jax.Array:
    """Segment sums of pre-sorted rows via cumsum + boundary diffs.
    vals [E, D] (already in segment-sorted order) -> [S, D]."""
    cs = jnp.cumsum(vals.astype(jnp.float32), axis=0)
    cs = jnp.concatenate([jnp.zeros((1, vals.shape[1]), cs.dtype), cs])
    return cs[bounds[1:]] - cs[bounds[:-1]]


def _rodrigues(rvec: jax.Array) -> jax.Array:
    """Angle-axis -> rotation matrix, jit/vmap-safe at zero."""
    theta2 = jnp.sum(rvec * rvec, axis=-1, keepdims=True)
    theta = jnp.sqrt(theta2 + 1e-24)
    k = rvec / theta
    K = jnp.zeros(rvec.shape[:-1] + (3, 3))
    kx, ky, kz = k[..., 0], k[..., 1], k[..., 2]
    K = jnp.stack(
        [
            jnp.stack([jnp.zeros_like(kx), -kz, ky], -1),
            jnp.stack([kz, jnp.zeros_like(kx), -kx], -1),
            jnp.stack([-ky, kx, jnp.zeros_like(kx)], -1),
        ],
        -2,
    )
    s = jnp.sin(theta)[..., None]
    c = jnp.cos(theta)[..., None]
    eye = jnp.eye(3)
    return eye + s * K + (1 - c) * (K @ K)


def _residual(cam: jax.Array, point: jax.Array, bearing: jax.Array):
    """2-D tangent-plane bearing residual. cam = [rvec(3), t(3)]."""
    R = _rodrigues(cam[:3])
    p = R @ point + cam[3:]
    p = p / jnp.sqrt(jnp.sum(p * p) + 1e-24)
    # orthonormal tangent basis at the observed bearing
    e = jnp.where(
        jnp.abs(bearing[2]) < 0.9,
        jnp.array([0.0, 0.0, 1.0]),
        jnp.array([1.0, 0.0, 0.0]),
    )
    u = jnp.cross(bearing, e)
    u = u / jnp.sqrt(jnp.sum(u * u) + 1e-24)
    v = jnp.cross(bearing, u)
    return jnp.array([u @ p, v @ p])


_res_jac = jax.vmap(
    lambda c, x, b: (
        _residual(c, x, b),
        jax.jacfwd(_residual, argnums=0)(c, x, b),
        jax.jacfwd(_residual, argnums=1)(c, x, b),
    )
)


def _robust_weights(r: jax.Array, cfg: BAConfig) -> jax.Array:
    """IRLS sqrt-weights for the robust kernel (soft-L1 == Ceres
    SoftLOneLoss, config.yaml:96-99)."""
    if cfg.loss == "linear":
        return jnp.ones(r.shape[0])
    s2 = jnp.sum(r * r, axis=-1) / (cfg.loss_scale**2)
    return (1.0 + s2) ** -0.25  # sqrt of rho'(s) for soft-L1


def _cost(r, w, valid):
    return jnp.sum(
        jnp.where(valid, jnp.sum((r * w[:, None]) ** 2, -1), 0.0)
    )


def camera_center(cam: jax.Array) -> jax.Array:
    """World-space camera center of a [6] (rvec, t) world->camera pose."""
    R = _rodrigues(cam[:3])
    return -R.T @ cam[3:]


@partial(jax.jit, static_argnames=("cfg",))
def bundle_adjust(
    cams: jax.Array,  # [C, 6] (rvec, t) world->camera
    points: jax.Array,  # [P, 3]
    problem: BAProblem,
    cfg: BAConfig = BAConfig(),
    fixed_cams: jax.Array = None,  # [C] bool: frozen cameras (their
    # observations still constrain points — the windowed local-BA
    # boundary condition, reference config.yaml:117-124)
    point_priors=None,  # ([P, 3] positions, [P] weights; 0 = no prior):
    # ground-control-point position priors (config.yaml:133
    # ``bundle_use_gcp``) — quadratic pulls on selected track points
    cam_pos_priors=None,  # ([C, 3] centers, [C] weights; 0 = no prior):
    # GPS camera-center priors inside BA (config.yaml:132
    # ``bundle_use_gps``); weights ~ 1/sd^2
):
    """Run LM; returns (cams, points, info dict)."""
    C = cams.shape[0]
    P = points.shape[0]
    E = problem.cam_idx.shape[0]
    fix_mask = jnp.ones((C, 1))
    if cfg.fix_first_camera:
        fix_mask = fix_mask.at[0].set(0.0)
    if fixed_cams is not None:
        fix_mask = fix_mask * (1.0 - fixed_cams.astype(jnp.float32)[:, None])

    pp_pos, pp_w = (None, None) if point_priors is None else point_priors
    cp_pos, cp_w = (None, None) if cam_pos_priors is None else cam_pos_priors

    def _prior_cost(cams, points):
        # same convention as _cost: sum of squared (sqrt-weighted) residuals
        c = 0.0
        if point_priors is not None:
            c = c + jnp.sum(pp_w[:, None] * (points - pp_pos) ** 2)
        if cam_pos_priors is not None:
            centers = jax.vmap(camera_center)(cams)
            c = c + jnp.sum(cp_w[:, None] * (centers - cp_pos) ** 2)
        return c

    def linearize(cams, points):
        ce = cams[problem.cam_idx]  # [E, 6]
        pe = points[problem.pt_idx]  # [E, 3]
        r, Jc, Jp = _res_jac(ce, pe, problem.bearings)
        w = _robust_weights(r, cfg) * problem.valid
        r = r * w[:, None]
        Jc = Jc * w[:, None, None]
        Jp = Jp * w[:, None, None]
        return r, Jc, Jp

    def seg_cam(x):  # [E, D] edge rows (cam-sorted already) -> [C, D]
        return _segsum_sorted(x, problem.cam_bounds)

    def seg_pt(x):  # [E, D] -> [P, D] via point permutation
        return _segsum_sorted(x[problem.pt_perm], problem.pt_bounds)

    def lm_step(state):
        cams, points, lam, cost, it, _ = state
        r, Jc, Jp = linearize(cams, points)
        # normal-equation blocks
        U = seg_cam(
            jnp.einsum("eri,erj->eij", Jc, Jc).reshape(E, 36)
        ).reshape(C, 6, 6)
        V = seg_pt(
            jnp.einsum("eri,erj->eij", Jp, Jp).reshape(E, 9)
        ).reshape(P, 3, 3)
        gc = seg_cam(jnp.einsum("eri,er->ei", Jc, r))  # [C, 6]
        gp = seg_pt(jnp.einsum("eri,er->ei", Jp, r))  # [P, 3]
        if point_priors is not None:
            # GCP pulls: residual sqrt(w)(p - g) with J = sqrt(w) I adds
            # w I to the point block and w (p - g) to its gradient
            V = V + pp_w[:, None, None] * jnp.eye(3)
            gp = gp + pp_w[:, None] * (points - pp_pos)
        if cam_pos_priors is not None:
            # GPS center priors: residual sqrt(w)(center(cam) - gps);
            # exact per-camera Jacobian via jacfwd (6 params, 3 residuals)
            def _cres(cam, pos, w):
                return jnp.sqrt(w) * (camera_center(cam) - pos)

            rc = jax.vmap(_cres)(cams, cp_pos, cp_w)  # [C, 3]
            Jcp = jax.vmap(jax.jacfwd(_cres))(cams, cp_pos, cp_w)  # [C,3,6]
            U = U + jnp.einsum("cri,crj->cij", Jcp, Jcp)
            gc = gc + jnp.einsum("cri,cr->ci", Jcp, rc)
        U = U + lam * jnp.eye(6)
        V = V + lam * jnp.eye(3)
        V_inv = jnp.linalg.inv(V)  # [P, 3, 3]
        U_inv = jnp.linalg.inv(U)  # block-Jacobi preconditioner

        W_e = jnp.einsum("eri,erj->eij", Jc, Jp)  # [E, 6, 3]

        def S_matvec(x):  # x [C, 6]
            # W^T x per edge -> per-point sum -> V^-1 -> back to cams
            wx = jnp.einsum(
                "eij,ei->ej", W_e, x[problem.cam_idx]
            )  # [E, 3]
            wtxp = seg_pt(wx)  # [P, 3]
            y = jnp.einsum("pij,pj->pi", V_inv, wtxp)  # [P, 3]
            wy = jnp.einsum("eij,ej->ei", W_e, y[problem.pt_idx])
            return (
                jnp.einsum("cij,cj->ci", U, x) - seg_cam(wy)
            ) * fix_mask

        # rhs: b = -gc + W V^-1 gp
        y0 = jnp.einsum("pij,pj->pi", V_inv, gp)
        b = (
            -gc + seg_cam(
                jnp.einsum("eij,ej->ei", W_e, y0[problem.pt_idx])
            )
        ) * fix_mask

        def precond(x):
            return jnp.einsum("cij,cj->ci", U_inv, x) * fix_mask

        # preconditioned CG on the Schur system
        def cg_body(i, cgs):
            x, rr, p, rz = cgs
            Ap = S_matvec(p)
            denom = jnp.sum(p * Ap)
            alpha = rz / jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
            x = x + alpha * p
            rr = rr - alpha * Ap
            z = precond(rr)
            rz_new = jnp.sum(rr * z)
            beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
            p = z + beta * p
            return x, rr, p, rz_new

        x0 = jnp.zeros_like(b)
        z0 = precond(b)
        dx_c, *_ = jax.lax.fori_loop(
            0, cfg.cg_iterations, cg_body, (x0, b, z0, jnp.sum(b * z0))
        )
        # back-substitute points: dx_p = -V^-1 (gp + W^T dx_c)
        wdx = jnp.einsum("eij,ei->ej", W_e, dx_c[problem.cam_idx])
        dx_p = -jnp.einsum(
            "pij,pj->pi", V_inv, gp + seg_pt(wdx)
        )

        cams_new = cams + dx_c * fix_mask
        points_new = points + dx_p
        r_new, _, _ = linearize(cams_new, points_new)
        cost_new = _cost(
            r_new, jnp.ones(E), problem.valid
        ) + _prior_cost(cams_new, points_new)
        accept = cost_new < cost
        cams = jnp.where(accept, cams_new, cams)
        points = jnp.where(accept, points_new, points)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        lam = jnp.clip(lam, 1e-9, 1e6)
        cost = jnp.where(accept, cost_new, cost)
        return cams, points, lam, cost, it + 1, accept

    r0, _, _ = linearize(cams, points)
    cost0 = _cost(r0, jnp.ones(E), problem.valid) + _prior_cost(
        cams, points)
    state = (cams, points, cfg.init_lambda, cost0, 0, True)
    state = jax.lax.fori_loop(
        0, cfg.max_iterations, lambda i, s: lm_step(s), state
    )
    cams, points, lam, cost, it, _ = state
    info = {"initial_cost": cost0, "final_cost": cost, "lambda": lam}
    return cams, points, info
