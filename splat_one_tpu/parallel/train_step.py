"""Multi-chip sharded training step (SPMD over a jax.sharding.Mesh).

TPU-native replacement for the reference's distribution stack (SURVEY.md §2c,
§5.8): torch.distributed/NCCL via ``gsplat.distributed.cli`` with
round-robin-sharded gaussians + DDP'd camera batches
(gsplat_trainer.py:236-238, 374-375, 491, 944-998). Here the same two axes
are a 2-D device mesh:

  - ``data`` axis: camera batches are sharded (the DDP analog); parameter
    gradients are ``psum``'d across it over ICI.
  - ``gauss`` axis: splat parameter buffers (and Adam moments, strategy
    state, alive mask) are sharded along the capacity dimension (the analog
    of gsplat's ``points[rank::world_size]`` model sharding). Each device
    projects only its local gaussian shard; the projected screen-space
    fields (a few floats per gaussian — much smaller than full params with
    SH) are ``all_gather``'d along ``gauss`` for rasterization, and JAX
    autodiff transposes that gather into a ``psum_scatter`` of gradients
    back to the owning shard — the collective pattern XLA would insert by
    hand in the scaling-book recipe.

Per-device rasterization uses the same Pallas tile kernels as single-chip
(each device composites the full tile grid of its own cameras; tile/pixel
ring-sharding within one camera is the round-2+ BASELINE configs 4-5 target).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as Pspec

from splat_one_tpu.core.transforms import invert_se3
from splat_one_tpu.ops import intersect as isect_mod
from splat_one_tpu.ops import tile_raster
from splat_one_tpu.ops.intersect import IsectCaps
from splat_one_tpu.ops.projection import Projected, project_gaussians
from splat_one_tpu.ops.tile_raster import RasterCfg
from splat_one_tpu.train import losses as L
from splat_one_tpu.train import optimizers as opt
from splat_one_tpu.train import strategy as S


def make_mesh(n_data: int, n_gauss: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_data * n_gauss, (
        f"need {n_data * n_gauss} devices, have {len(devices)}"
    )
    import numpy as np

    dev = np.asarray(devices[: n_data * n_gauss]).reshape(n_data, n_gauss)
    return Mesh(dev, ("data", "gauss"))


def shard_state_specs():
    """PartitionSpecs: splat buffers sharded over 'gauss' on the capacity
    axis, replicated over 'data'."""
    p = Pspec("gauss")
    param_spec = {
        "means": p, "scales": p, "quats": p, "opacities": p,
        "sh0": p, "shN": p,
    }
    return param_spec


def make_sharded_train_step(
    mesh: Mesh,
    width: int,
    height: int,
    caps: IsectCaps,
    capacity: int,  # global capacity (divisible by gauss axis size)
    sh_degree: int = 3,
    tile_size: int = 16,
    camera_model: str = "pinhole",
    ssim_lambda: float = 0.2,
    max_steps: int = 30_000,
    scene_scale: float = 1.0,
):
    """Build a jitted SPMD train step over (params, opt, alive, strat, batch).

    Batch: camtoworld [B,4,4], K [B,3,3], image [B,H,W,3] with B divisible
    by the data-axis size; params are capacity-sharded over 'gauss'.
    """
    n_gauss = mesh.shape["gauss"]
    n_data = mesh.shape["data"]
    cap_local = capacity // n_gauss
    hp = opt.adam_hparams(n_data)
    lrs_base = opt.base_lrs(scene_scale)

    pspec = shard_state_specs()
    opt_spec = opt.AdamState(m=pspec, v=pspec, count=Pspec())
    strat_spec = S.StrategyState(grad2d=Pspec("gauss"), count=Pspec("gauss"))
    batch_spec = {
        "camtoworld": Pspec("data"), "K": Pspec("data"),
        "image": Pspec("data"),
    }
    cfg = None  # RasterCfg built per local shapes below

    def local_step(params, opt_state, alive, strat, batch, step, key):
        # params: local shard [cap_local, ...]; batch: local cameras
        B = batch["camtoworld"].shape[0]
        N_full = cap_local * n_gauss
        rcfg = RasterCfg(
            width=width, height=height, tile_size=tile_size,
            num_cameras=B, num_gaussians=N_full, chunk=caps.chunk,
            align_cap=caps.align_cap,
            wrap_x=(camera_model == "spherical"),
        )
        viewmats = invert_se3(batch["camtoworld"])

        def loss_fn(params, dummies):
            means = params["means"]
            quats = params["quats"]
            scales = jnp.exp(params["scales"])
            opac = jax.nn.sigmoid(params["opacities"])
            sh = jnp.concatenate([params["sh0"], params["shN"]], axis=1)
            # local projection of the gaussian shard for all local cameras
            proj = project_gaussians(
                means, quats, scales, opac, viewmats, batch["K"],
                width, height, sh_coeffs=sh, sh_degree=sh_degree,
                camera_model=camera_model, alive=alive,
            )
            proj = proj._replace(
                means2d=proj.means2d + dummies["m2d"],
            )
            # gather projected fields along the gaussian axis; autodiff
            # turns this into psum_scatter of gradients over ICI.
            proj_full = jax.tree.map(
                lambda x: jax.lax.all_gather(
                    x, "gauss", axis=1, tiled=True
                ),
                proj,
            )
            isect = isect_mod.build_intersections(
                jax.lax.stop_gradient(proj_full), width, height, tile_size,
                caps, camera_model=camera_model,
            )
            tile_out = tile_raster.composite_tiles(
                rcfg, proj_full.means2d, proj_full.conics, proj_full.colors,
                proj_full.opacities, proj_full.depths, isect,
            )
            rgb, alpha, _ = tile_raster.tiles_to_image(rcfg, tile_out)
            m = L.image_loss(rgb, batch["image"], ssim_lambda)
            # mean over the data axis so the psum'd grad is the global mean
            loss = m["loss"] / n_data
            return loss, (m, proj.radii)

        dummies = {"m2d": jnp.zeros((B, cap_local, 2))}
        (loss, (m, radii)), (gp, gdum) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, dummies)
        # data-parallel gradient reduction over ICI
        gp = jax.lax.psum(gp, "data")

        # Densification stats: take per-camera grad norms and visibility
        # counts over LOCAL cameras first, then psum the per-gaussian scalars
        # over 'data' (psum of the raw 2-vectors would sum different cameras'
        # gradient directions before the norm — wrong statistic).
        delta = S.strategy_update(
            S.strategy_init(cap_local), gdum["m2d"], radii, width, height
        )
        strat = S.StrategyState(
            grad2d=strat.grad2d + jax.lax.psum(delta.grad2d, "data"),
            count=strat.count + jax.lax.psum(delta.count, "data"),
        )

        lrs = {k: v * hp["lr_scale"] for k, v in lrs_base.items()}
        lrs["means"] = lrs["means"] * opt.means_lr_decay(step, max_steps)
        params, opt_state = opt.adam_update(
            gp, opt_state, params, lrs,
            b1=hp["b1"], b2=hp["b2"], eps=hp["eps"],
        )
        metrics = {
            "loss": jax.lax.psum(loss, "data"),
            "l1": jax.lax.pmean(m["l1"], "data"),
            "ssim": jax.lax.pmean(m["ssim"], "data"),
        }
        return params, opt_state, strat, metrics

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            pspec, opt_spec, Pspec("gauss"), strat_spec, batch_spec,
            Pspec(), Pspec(),
        ),
        out_specs=(pspec, opt_spec, strat_spec, Pspec()),
        check_vma=False,
    )
    return jax.jit(sharded)


def shard_arrays(mesh: Mesh, params, opt_state, alive, strat):
    """Place host arrays onto the mesh with the training shardings."""
    pspec = shard_state_specs()

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    params = {k: put(v, pspec[k]) for k, v in params.items()}
    opt_state = opt.AdamState(
        m={k: put(v, pspec[k]) for k, v in opt_state.m.items()},
        v={k: put(v, pspec[k]) for k, v in opt_state.v.items()},
        count=put(opt_state.count, Pspec()),
    )
    alive = put(alive, Pspec("gauss"))
    strat = S.StrategyState(
        grad2d=put(strat.grad2d, Pspec("gauss")),
        count=put(strat.count, Pspec("gauss")),
    )
    return params, opt_state, alive, strat
