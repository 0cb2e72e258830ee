"""Densification strategies over fixed-capacity buffers (pure functions).

TPU-native re-implementation of gsplat's ``DefaultStrategy`` and
``MCMCStrategy`` protocol used by the reference trainer
(gsplat_trainer.py:123-135 strategy config; :345-354 check_sanity /
initialize_state; :616-622 step_pre_backward; :744-763 step_post_backward).

The GPU strategies resize parameter/optimizer tensors; here every transform
is a masked update on capacity-``CAP`` buffers with an ``alive`` mask, so the
train step never recompiles (SURVEY.md §7 hard part 3):

  - *duplicate*: child copies parent into a free slot,
  - *split*: parent slot is overwritten by child 1 in place; child 2 goes to
    a free slot; both sample positions from the parent gaussian and shrink
    scales by 1.6 (3DGS semantics),
  - *prune*: clears the alive bit,
  - free slots are ranked with a cumsum and matched to children through an
    argsort-based free list — no dynamic shapes anywhere,
  - Adam moments of touched slots are zeroed via
    ``optimizers.surgery_zero_moments``.

Gradient statistics come from the rasterizer's ``means2d_dummy`` /
``absgrad_dummy`` cotangents (the JAX analog of gsplat's means2d grad hook),
normalized to [-1, 1] NDC-style units as gsplat does (grad * size / 2).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from splat_one_tpu.core.transforms import quat_to_rotmat
from splat_one_tpu.train.optimizers import AdamState, surgery_zero_moments

Params = Dict[str, jax.Array]


@dataclasses.dataclass(frozen=True)
class DefaultStrategyCfg:
    """Mirrors gsplat DefaultStrategy knobs (reference gsplat_trainer.py:127)."""

    prune_opa: float = 0.005
    grow_grad2d: float = 0.0002
    grow_scale3d: float = 0.01
    prune_scale3d: float = 0.1
    refine_start_iter: int = 500
    refine_stop_iter: int = 15_000
    reset_every: int = 3000
    refine_every: int = 100
    absgrad: bool = False
    revised_opacity: bool = False


@dataclasses.dataclass(frozen=True)
class MCMCStrategyCfg:
    """Mirrors gsplat MCMCStrategy knobs (reference gsplat_trainer.py mcmc
    preset; strategy choice at :123-135)."""

    cap_max: int = 1_000_000
    noise_lr: float = 5e5
    refine_start_iter: int = 500
    refine_stop_iter: int = 25_000
    refine_every: int = 100
    min_opacity: float = 0.005


class StrategyState(NamedTuple):
    grad2d: jax.Array  # [CAP] accumulated ||d(loss)/d(means2d)|| (NDC units)
    count: jax.Array  # [CAP] number of steps the gaussian was visible


def strategy_init(capacity: int) -> StrategyState:
    return StrategyState(
        grad2d=jnp.zeros((capacity,), jnp.float32),
        count=jnp.zeros((capacity,), jnp.float32),
    )


def strategy_update(
    state: StrategyState,
    means2d_grad: jax.Array,  # [C, N, 2] cotangent of means2d_dummy (or abs)
    radii: jax.Array,  # [C, N]
    width: int,
    height: int,
) -> StrategyState:
    """Accumulate per-step densification statistics (gsplat update_state)."""
    # NDC-style normalization: pixel grad * size / 2 (gsplat semantics).
    g = means2d_grad * jnp.array([width / 2.0, height / 2.0])
    norm = jnp.linalg.norm(g, axis=-1)  # [C, N]
    visible = radii > 0
    grad2d = state.grad2d + jnp.sum(jnp.where(visible, norm, 0.0), axis=0)
    count = state.count + jnp.sum(visible.astype(jnp.float32), axis=0)
    return StrategyState(grad2d=grad2d, count=count)


def _free_slot_targets(free: jax.Array, need: jax.Array):
    """Match each needing slot (in index order) to a free slot.

    Returns (targets [CAP] int32 into padded CAP+1 space, granted [CAP] bool).
    Children that don't fit (no free slot left) are dropped; their target is
    the sacrificial row CAP.
    """
    cap = free.shape[0]
    n_free = jnp.sum(free.astype(jnp.int32))
    # free slots first, in index order
    free_pos = jnp.argsort(~free, stable=True).astype(jnp.int32)  # [CAP]
    child_rank = jnp.cumsum(need.astype(jnp.int32)) - 1  # inclusive rank
    granted = need & (child_rank < n_free)
    targets = jnp.where(
        granted, free_pos[jnp.clip(child_rank, 0, cap - 1)], cap
    ).astype(jnp.int32)
    return targets, granted


def _scatter_rows(params: Params, targets: jax.Array, child: Params) -> Params:
    """Scatter child rows into padded params (row CAP is sacrificial)."""
    out = {}
    for k, x in params.items():
        pad = jnp.zeros((1,) + x.shape[1:], x.dtype)
        xp = jnp.concatenate([x, pad], axis=0)
        xp = xp.at[targets].set(
            jnp.where(
                (targets < x.shape[0]).reshape((-1,) + (1,) * (x.ndim - 1)),
                child[k],
                xp[targets],
            )
        )
        out[k] = xp[:-1]
    return out


def _sample_from_gaussian(key, params: Params, shrink: float = 1.6):
    """Sample child means from parent gaussians; shrink scales (3DGS split)."""
    cap = params["opacities"].shape[0]
    R = quat_to_rotmat(params["quats"])  # [CAP, 3, 3]
    noise = jax.random.normal(key, (cap, 3)) * jnp.exp(params["scales"])
    new_means = params["means"] + jnp.einsum("nij,nj->ni", R, noise)
    new_scales = params["scales"] - jnp.log(shrink)
    child = dict(params)
    child["means"] = new_means
    child["scales"] = new_scales
    return child


def default_refine(
    key: jax.Array,
    params: Params,
    opt_state: AdamState,
    alive: jax.Array,
    state: StrategyState,
    step: jax.Array,
    cfg: DefaultStrategyCfg,
    scene_scale: float,
) -> Tuple[Params, AdamState, jax.Array, StrategyState, Dict[str, jax.Array]]:
    """Grow (duplicate/split) + prune, in fixed capacity. Jittable."""
    cap = alive.shape[0]
    grads = state.grad2d / jnp.maximum(state.count, 1.0)
    max_scale = jnp.exp(params["scales"]).max(axis=-1)
    opa = jax.nn.sigmoid(params["opacities"])

    is_grad_high = (grads > cfg.grow_grad2d) & alive
    is_small = max_scale <= cfg.grow_scale3d * scene_scale
    is_dupli = is_grad_high & is_small
    is_split = is_grad_high & ~is_small

    # prune first — frees slots for growth
    is_prune = (opa < cfg.prune_opa) & alive
    is_prune |= (step > cfg.reset_every) & (
        max_scale > cfg.prune_scale3d * scene_scale
    ) & alive
    alive = alive & ~is_prune
    is_dupli &= ~is_prune
    is_split &= ~is_prune

    # each grower needs one free slot (dup child / split child 2)
    need = is_dupli | is_split
    free = ~alive
    targets, granted = _free_slot_targets(free, need)

    k1, k2 = jax.random.split(key)
    # children for the free slots: dup -> copy of parent; split -> sample 2
    child2 = _sample_from_gaussian(k1, params)
    child = {
        k: jnp.where(
            is_dupli.reshape((-1,) + (1,) * (params[k].ndim - 1)),
            params[k],
            child2[k],
        )
        for k in params
    }
    if cfg.revised_opacity:
        new_opa = 1.0 - jnp.sqrt(jnp.clip(1.0 - opa, 1e-7, 1.0))
        rev = jnp.log(new_opa / (1.0 - new_opa))
        child["opacities"] = jnp.where(is_split, rev, child["opacities"])

    params = _scatter_rows(params, targets, child)
    # split parents are re-sampled in place (child 1)
    child1 = _sample_from_gaussian(k2, params)
    split_here = is_split & granted
    for k in params:
        m = split_here.reshape((-1,) + (1,) * (params[k].ndim - 1))
        params[k] = jnp.where(m, child1[k], params[k])

    # raw targets: non-granted children carry target==cap, which mode="drop"
    # discards (clipping them to cap-1 would race the legitimate write there)
    alive = alive | jnp.zeros((cap,), bool).at[targets].set(
        granted, mode="drop"
    )
    # zero Adam moments for touched slots: new children + re-sampled parents
    touched = split_here
    touched = touched | (
        jnp.zeros((cap,), bool).at[targets].set(granted, mode="drop")
    )
    touched = touched | is_prune
    opt_state = surgery_zero_moments(opt_state, touched)

    info = {
        "n_dupli": jnp.sum(is_dupli.astype(jnp.int32)),
        "n_split": jnp.sum(is_split.astype(jnp.int32)),
        "n_prune": jnp.sum(is_prune.astype(jnp.int32)),
        "n_granted": jnp.sum(granted.astype(jnp.int32)),
    }
    return params, opt_state, alive, strategy_init(cap), info


def reset_opacity(
    params: Params, opt_state: AdamState, alive: jax.Array,
    prune_opa: float = 0.005,
) -> Tuple[Params, AdamState]:
    """Opacity reset (gsplat DefaultStrategy reset_every): clamp opacities to
    at most 2 * prune_opa and zero their Adam moments."""
    limit = jnp.log(2 * prune_opa / (1 - 2 * prune_opa))
    new_o = jnp.minimum(params["opacities"], limit)
    params = dict(params)
    params["opacities"] = jnp.where(alive, new_o, params["opacities"])
    z = jnp.zeros_like(opt_state.m["opacities"])
    m = dict(opt_state.m)
    v = dict(opt_state.v)
    m["opacities"] = z
    v["opacities"] = z
    return params, AdamState(m=m, v=v, count=opt_state.count)


# ---------------------------------------------------------------------------
# MCMC strategy (3DGS-as-MCMC: stochastic relocation + noise injection)
# ---------------------------------------------------------------------------


def _relocation_opacity_scale(opa, scales, n_split):
    """MCMC relocation update: splitting a gaussian into n pieces preserves
    the rendered distribution: o_new = 1 - (1-o)^(1/n); scales shrink by a
    binomial-derived factor (simplified first-order form)."""
    n = jnp.maximum(n_split.astype(jnp.float32), 1.0)
    new_opa = 1.0 - jnp.power(1.0 - opa, 1.0 / n)
    ratio = new_opa * jnp.sqrt(n) / jnp.maximum(opa, 1e-7)
    new_scales = scales - 0.5 * jnp.log(jnp.maximum(ratio, 1e-7))[..., None]
    return new_opa, new_scales


def mcmc_refine(
    key: jax.Array,
    params: Params,
    opt_state: AdamState,
    alive: jax.Array,
    cfg: MCMCStrategyCfg,
) -> Tuple[Params, AdamState, jax.Array, Dict[str, jax.Array]]:
    """Relocate dead (low-opacity) gaussians to samples of live ones, then
    grow the population 5% toward cap_max (gsplat MCMCStrategy semantics)."""
    cap = alive.shape[0]
    opa = jax.nn.sigmoid(params["opacities"])
    dead = alive & (opa < cfg.min_opacity)
    live = alive & ~dead

    k1, k2 = jax.random.split(key)
    # sample targets proportional to opacity among live gaussians
    logits = jnp.where(live, jnp.log(jnp.maximum(opa, 1e-8)), -jnp.inf)
    n_sample = cap  # sample a target for every slot; use where dead/new
    tgt = jax.random.categorical(k1, logits, shape=(n_sample,))

    # count how many times each target is chosen by a dead slot (+ itself)
    picks = jnp.zeros((cap,), jnp.int32).at[tgt].add(dead.astype(jnp.int32))
    n_split = picks + 1

    new_opa_t, new_scales_t = _relocation_opacity_scale(
        jax.nn.sigmoid(params["opacities"]), params["scales"], n_split
    )

    def reloc(x, tgt_vals):
        m = dead.reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.where(m, tgt_vals, x)

    params = dict(params)
    new_opa_logit = jnp.log(
        jnp.clip(new_opa_t, 1e-7, 1 - 1e-7)
        / (1 - jnp.clip(new_opa_t, 1e-7, 1 - 1e-7))
    )
    for k in params:
        # every per-gaussian array follows the relocation (incl. the
        # appearance-path features/colors — hardcoding sh0/shN crashed
        # app_opt MCMC runs); scales/opacities take the reduced values
        if k in ("scales", "opacities"):
            continue
        params[k] = reloc(params[k], params[k][tgt])
    params["scales"] = reloc(params["scales"], new_scales_t[tgt])
    params["opacities"] = reloc(params["opacities"], new_opa_logit[tgt])
    # targets that were split also take the reduced opacity/scale
    was_split = picks > 0
    params["opacities"] = jnp.where(
        was_split & live, new_opa_logit, params["opacities"]
    )
    params["scales"] = jnp.where(
        (was_split & live)[:, None], new_scales_t, params["scales"]
    )

    # grow population 5% toward cap_max into free slots (sampled like reloc)
    n_live = jnp.sum(alive.astype(jnp.int32))
    budget = jnp.minimum(
        (n_live.astype(jnp.float32) * 0.05).astype(jnp.int32),
        jnp.maximum(min(cfg.cap_max, cap) - n_live, 0),
    )
    free = ~alive
    rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    grow_here = free & (rank < budget)
    tgt2 = jax.random.categorical(k2, logits, shape=(cap,))
    # gsplat add_new_gs applies the relocation opacity/scale reduction to
    # BOTH the sampled source and its new copy (splitting mass, not
    # duplicating it): n = 1 + times-sampled-by-a-grown-slot
    picks2 = jnp.zeros((cap,), jnp.int32).at[tgt2].add(
        grow_here.astype(jnp.int32))
    opa2_t, scales2_t = _relocation_opacity_scale(
        jax.nn.sigmoid(params["opacities"]), params["scales"], picks2 + 1
    )
    opa2_logit = jnp.log(
        jnp.clip(opa2_t, 1e-7, 1 - 1e-7)
        / (1 - jnp.clip(opa2_t, 1e-7, 1 - 1e-7))
    )
    for k in params:
        if k in ("scales", "opacities"):
            continue
        m = grow_here.reshape((-1,) + (1,) * (params[k].ndim - 1))
        params[k] = jnp.where(m, params[k][tgt2], params[k])
    params["opacities"] = jnp.where(
        grow_here, opa2_logit[tgt2], params["opacities"]
    )
    params["scales"] = jnp.where(
        grow_here[:, None], scales2_t[tgt2], params["scales"]
    )
    was_sampled = (picks2 > 0) & live
    params["opacities"] = jnp.where(
        was_sampled, opa2_logit, params["opacities"]
    )
    params["scales"] = jnp.where(
        was_sampled[:, None], scales2_t, params["scales"]
    )
    alive = alive | grow_here

    touched = dead | grow_here
    opt_state = surgery_zero_moments(opt_state, touched)
    info = {
        "n_relocated": jnp.sum(dead.astype(jnp.int32)),
        "n_grown": jnp.sum(grow_here.astype(jnp.int32)),
    }
    return params, opt_state, alive, info


def mcmc_noise(
    key: jax.Array,
    params: Params,
    alive: jax.Array,
    lr_means: jax.Array,
    noise_lr: float = 5e5,
) -> Params:
    """Per-step SGLD-style noise injection on means, scaled by the gaussian's
    covariance and gated by opacity (gsplat MCMC _add_noise_to_splats).

    gsplat: noise = randn * op_sigmoid(1 - opa; k=100, x0=0.995) * lr * noise_lr
    then noise <- (R diag(S^2) R^T) @ noise — i.e. only near-dead gaussians
    (opacity < ~0.005) receive noise, transformed by the full covariance."""
    cap = alive.shape[0]
    opa = jax.nn.sigmoid(params["opacities"])
    gate = jax.nn.sigmoid(100.0 * ((1.0 - opa) - 0.995))  # ~1 only for opa<0.005
    R = quat_to_rotmat(params["quats"])
    eps = jax.random.normal(key, (cap, 3)) * (gate * lr_means * noise_lr)[:, None]
    # covariance transform: R diag(S^2) R^T @ eps
    s2 = jnp.exp(2.0 * params["scales"])
    tmp = jnp.einsum("nji,nj->ni", R, eps) * s2
    noise_w = jnp.einsum("nij,nj->ni", R, tmp)
    out = dict(params)
    out["means"] = jnp.where(alive[:, None], params["means"] + noise_w,
                             params["means"])
    return out
