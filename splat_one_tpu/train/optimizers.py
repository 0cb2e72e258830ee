"""Per-parameter Adam for splat training (pure functions over pytrees).

TPU-native equivalent of the reference's per-parameter ``torch.optim.Adam``
dict (one optimizer per splat tensor with its own LR, reference
gsplat_trainer.py:273-281) plus gsplat's ``SelectiveAdam`` (visibility-masked
updates, reference surface ``visible_adam`` config flag,
gsplat_trainer.py:137,727-728).

A hand-rolled Adam (rather than optax) keeps the optimizer state a plain
pytree of per-slot moments, which makes densification's optimizer-state
surgery (zeroing moments of re-allocated slots) a trivial masked update —
the TPU analog of gsplat's optimizer-state resize
(SURVEY.md §2b N2/N4).

Learning-rate conventions follow the reference exactly: base LRs
{means 1.6e-4 * scene_scale (exp-decayed to 1% over max_steps), scales 5e-3,
quats 1e-3, opacities 5e-2, sh0 2.5e-3, shN 2.5e-3/20}, all scaled by
``sqrt(batch_size * world_size)``; betas/eps adjusted for world batch
(gsplat_trainer.py:258-281).
"""

from __future__ import annotations

import math
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, jax.Array]


class AdamState(NamedTuple):
    m: Params
    v: Params
    count: jax.Array  # [] int32


def base_lrs(scene_scale: float = 1.0) -> Dict[str, float]:
    return {
        "means": 1.6e-4 * scene_scale,
        "scales": 5e-3,
        "quats": 1e-3,
        "opacities": 5e-2,
        "sh0": 2.5e-3,
        "shN": 2.5e-3 / 20.0,
    }


def adam_hparams(world_batch: int = 1):
    """Reference LR/eps/beta scaling with the world batch size
    (gsplat_trainer.py:275-280)."""
    bs = world_batch
    return dict(
        lr_scale=math.sqrt(bs),
        eps=1e-15 / math.sqrt(bs),
        b1=1.0 - bs * (1.0 - 0.9),
        b2=1.0 - bs * (1.0 - 0.999),
    )


def means_lr_decay(step, max_steps: int):
    """Exponential decay of the means LR to 1% over training (reference
    torch ExponentialLR with gamma=0.01^(1/max_steps),
    gsplat_trainer.py:285-291)."""
    return jnp.power(0.01, step / max_steps)


def adam_init(params: Params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(m=zeros, v=jax.tree.map(jnp.zeros_like, params),
                     count=jnp.zeros((), jnp.int32))


def adam_update(
    grads: Params,
    state: AdamState,
    params: Params,
    lrs: Dict[str, jax.Array],
    *,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
    visible_mask: Optional[jax.Array] = None,  # [CAP] — SelectiveAdam
):
    """One Adam step. ``lrs`` maps param name -> (possibly traced) LR.

    With ``visible_mask`` set, moments and values update only for visible
    slots (gsplat SelectiveAdam: ``optimizer.step(visibility_mask)``).
    """
    count = state.count + 1
    c1 = 1.0 - b1 ** count.astype(jnp.float32)
    c2 = 1.0 - b2 ** count.astype(jnp.float32)

    def upd(name):
        g = grads[name]
        m = state.m[name] * b1 + g * (1.0 - b1)
        v = state.v[name] * b2 + g * g * (1.0 - b2)
        step_val = lrs[name] * (m / c1) / (jnp.sqrt(v / c2) + eps)
        p_new = params[name] - step_val
        if visible_mask is not None:
            vis = visible_mask.reshape((-1,) + (1,) * (g.ndim - 1))
            m = jnp.where(vis, m, state.m[name])
            v = jnp.where(vis, v, state.v[name])
            p_new = jnp.where(vis, p_new, params[name])
        return p_new, m, v

    new_p, new_m, new_v = {}, {}, {}
    for name in params:
        new_p[name], new_m[name], new_v[name] = upd(name)
    return new_p, AdamState(m=new_m, v=new_v, count=count)


def surgery_zero_moments(state: AdamState, touched: jax.Array) -> AdamState:
    """Zero Adam moments for re-allocated slots (densification surgery;
    gsplat zeroes exp_avg/exp_avg_sq of new gaussians on grow/prune)."""

    def z(x):
        mask = touched.reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.where(mask, 0.0, x)

    return AdamState(
        m=jax.tree.map(z, state.m), v=jax.tree.map(z, state.v),
        count=state.count,
    )
