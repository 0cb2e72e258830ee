"""Training engine — the TPU-native ``Runner`` (reference
utils/gsplat_utils/gsplat_trainer.py:287-940).

Host loop + jitted pure train/refine/eval steps over fixed-capacity splat
buffers. Differences from the reference by design (SURVEY.md §7.4):
  - densification never resizes tensors (capacity buffers + alive mask);
  - SH degree ramps by *masking* coefficient bands with a traced step (the
    reference passes a changing ``sh_degree`` int, which would recompile);
  - optimizer is the per-param Adam in ``train.optimizers`` with optional
    visibility-masked (SelectiveAdam) updates;
  - checkpoints carry optimizer + strategy state (the reference saves only
    splats, gsplat_trainer.py:682-703) so training resume is lossless.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from splat_one_tpu.core import gaussians as G
from splat_one_tpu.core.sh import num_sh_bases
from splat_one_tpu.core.transforms import invert_se3
from splat_one_tpu.ops.intersect import IsectCaps
from splat_one_tpu.render.rasterization import rasterization
from splat_one_tpu.train import losses as L
from splat_one_tpu.train import optimizers as opt
from splat_one_tpu.train import pose_opt as P
from splat_one_tpu.train import strategy as S
from splat_one_tpu.train.config import Config
from splat_one_tpu.train.strategy import DefaultStrategyCfg, MCMCStrategyCfg


class SceneData(NamedTuple):
    """Host-side training data (produced by the data layer parsers)."""

    camtoworlds: np.ndarray  # [M, 4, 4]
    Ks: np.ndarray  # [M, 3, 3]
    images: np.ndarray  # [M, H, W, 3] float32 in [0, 1] (or uint8)
    points: np.ndarray  # [Npts, 3] SfM points
    points_rgb: np.ndarray  # [Npts, 3] in [0, 1]
    scene_scale: float
    camera_model: str = "pinhole"
    depths: Optional[np.ndarray] = None  # [M, H, W, 1] optional supervision
    image_names: Optional[list] = None


class TrainState(NamedTuple):
    params: Dict[str, jax.Array]
    opt_state: opt.AdamState
    alive: jax.Array
    strat: S.StrategyState
    step: jax.Array
    pose_params: Optional[jax.Array] = None
    pose_opt_state: Optional[opt.AdamState] = None
    bil_grids: Optional[jax.Array] = None
    bil_opt_state: Optional[opt.AdamState] = None
    app_params: Optional[Dict[str, jax.Array]] = None
    app_opt_state: Optional[opt.AdamState] = None


def _sh_band_degrees(sh_degree: int) -> np.ndarray:
    """Degree of each non-DC SH coefficient row (rows 1..K-1)."""
    K = num_sh_bases(sh_degree)
    return np.array([int(np.floor(np.sqrt(i))) for i in range(1, K)], np.int32)


class Trainer:
    """Train/eval/render driver over one scene.

    With ``mesh`` (a 2-D ``jax.sharding.Mesh`` with axes ``("data",
    "gauss")``) the SAME full-featured step — densification, pose/
    appearance/bilateral optimization, SH ramp, visible-adam, depth loss —
    runs SPMD: camera batches sharded over ``data`` (DDP analog,
    reference gsplat_trainer.py:944-998), splat buffers sharded over
    ``gauss`` with projected fields all_gather'd for rasterization and
    gradients psum_scatter'd back (gsplat ``rasterization(distributed=
    True)`` analog, :491). ``mesh=None`` is the single-chip path with the
    identical code, no collectives."""

    def __init__(self, cfg: Config, scene: SceneData, result_dir: str = None,
                 mesh=None):
        self.cfg = cfg.adjust_steps()
        cfg = self.cfg
        self.mesh = mesh
        self.scene = scene
        if scene.camera_model and scene.camera_model != cfg.camera_model:
            # The DATA's camera model is authoritative: rendering through
            # a mismatched projection can still fit the training views
            # (the optimizer memorizes each view through the wrong
            # mapping) while held-out views collapse to fog. Diagnosed
            # r5: three rounds of quality-bench val PSNR stuck at 10-16
            # because Config's reference-parity default ("spherical",
            # the reference is a 360-first app) silently overrode
            # pinhole synthetic scenes.
            import logging

            logging.getLogger("splat_one_tpu").warning(
                "camera_model mismatch: scene=%s cfg=%s — using the "
                "scene's model", scene.camera_model, cfg.camera_model,
            )
            cfg.camera_model = scene.camera_model
        self.result_dir = result_dir or cfg.result_dir
        os.makedirs(self.result_dir, exist_ok=True)
        for sub in ("ckpts", "stats", "renders", "videos"):
            os.makedirs(os.path.join(self.result_dir, sub), exist_ok=True)

        M, H, W = scene.images.shape[:3]
        self.height, self.width = H, W
        self.n_images = M
        idx = np.arange(M)
        self.val_idx = idx[idx % cfg.test_every == 0]
        self.train_idx = idx[idx % cfg.test_every != 0]

        # splat init (reference create_splats_with_optimizers, :204-281)
        n0 = (
            scene.points.shape[0]
            if cfg.init_type == "sfm"
            else cfg.init_num_pts
        )
        capacity = cfg.capacity or _next_pow2(
            int(n0 * cfg.capacity_headroom)
        )
        if isinstance(cfg.strategy, MCMCStrategyCfg):
            capacity = max(capacity, _next_pow2(cfg.strategy.cap_max))
        if mesh is not None:
            if cfg.raster_impl != "stream":
                # the tiled backend has no supertile-slab sharding: every
                # gauss shard would composite the full gathered set and
                # the all_gather transpose would sum n_gauss IDENTICAL
                # cotangents (n-fold gradients) — refuse loudly
                raise ValueError(
                    "mesh training requires raster_impl='stream'"
                )
            n_g = mesh.shape["gauss"]
            capacity = -(-capacity // n_g) * n_g
            assert cfg.batch_size % mesh.shape["data"] == 0, (
                "batch_size must divide the data axis"
            )
        feat_dim = 32 if cfg.app_opt else 0  # reference :367-369
        if cfg.init_type == "sfm":
            params, alive = G.init_splats_from_points(
                scene.points, scene.points_rgb, capacity,
                sh_degree=cfg.sh_degree, init_opacity=cfg.init_opa,
                init_scale=cfg.init_scale, seed=cfg.seed,
                feature_dim=feat_dim,
            )
        else:
            params, alive = G.init_splats_random(
                capacity, cfg.init_num_pts,
                cfg.init_extent * scene.scene_scale,
                sh_degree=cfg.sh_degree, init_opacity=cfg.init_opa,
                init_scale=cfg.init_scale, seed=cfg.seed,
                feature_dim=feat_dim,
            )
        self.capacity = capacity
        opt_state = opt.adam_init(params)

        pose_params = pose_opt_state = None
        if cfg.pose_opt:
            pose_params = P.init_pose_params(M)
            pose_opt_state = opt.adam_init({"pose": pose_params})

        bil_grids = bil_opt_state = None
        if cfg.use_bilateral_grid:
            from splat_one_tpu.train import bilateral_grid as BG

            bil_grids = BG.init_bilateral_grids(
                M, cfg.bilateral_grid_shape
            )
            bil_opt_state = opt.adam_init({"bil": bil_grids})

        app_params = app_opt_state = None
        if cfg.app_opt:
            from splat_one_tpu.train import appearance as APP

            app_params = APP.init_appearance_params(
                jax.random.PRNGKey(cfg.seed + 1), M,
                feature_dim=32, embed_dim=cfg.app_embed_dim,
                sh_degree=cfg.sh_degree,
            )
            app_opt_state = opt.adam_init(app_params)

        self.state = TrainState(
            params=params, opt_state=opt_state, alive=alive,
            strat=S.strategy_init(capacity), step=jnp.zeros((), jnp.int32),
            pose_params=pose_params, pose_opt_state=pose_opt_state,
            bil_grids=bil_grids, bil_opt_state=bil_opt_state,
            app_params=app_params, app_opt_state=app_opt_state,
        )
        self._isect_mult = (
            cfg.avg_supertiles_per_gaussian
            if cfg.raster_impl == "stream"
            else cfg.avg_tiles_per_gaussian
        )
        self.caps = self._choose_caps(capacity)
        self.key = jax.random.PRNGKey(cfg.seed)
        self._band_deg = jnp.asarray(_sh_band_degrees(cfg.sh_degree))
        self._hp = opt.adam_hparams(cfg.batch_size)
        self._lrs_base = opt.base_lrs(scene.scene_scale * cfg.global_scale)
        # appearance-path params (reference lrs, gsplat_trainer.py:259-263)
        self._lrs_base.setdefault("features", 2.5e-3)
        self._lrs_base.setdefault("colors", 2.5e-3)
        if mesh is not None:
            self._shard_state()
        self._build_steps()

    # ------------------------------------------------------------------
    def _state_specs(self):
        """PartitionSpecs for TrainState on the (data, gauss) mesh: splat
        buffers + Adam moments + alive/strategy sharded over 'gauss' on the
        capacity axis; pose/bilateral/appearance modules replicated (they
        are small and their grads are identical across the gauss axis)."""
        from jax.sharding import PartitionSpec as P

        g = P("gauss")
        r = P()
        pspec = {k: g for k in self.state.params}
        rep_opt = lambda s: (
            None if s is None
            else opt.AdamState(
                m=jax.tree.map(lambda _: r, s.m),
                v=jax.tree.map(lambda _: r, s.v), count=r,
            )
        )
        return TrainState(
            params=pspec,
            opt_state=opt.AdamState(m=dict(pspec), v=dict(pspec), count=r),
            alive=g,
            strat=S.StrategyState(grad2d=g, count=g),
            step=r,
            pose_params=None if self.state.pose_params is None else r,
            pose_opt_state=rep_opt(self.state.pose_opt_state),
            bil_grids=None if self.state.bil_grids is None else r,
            bil_opt_state=rep_opt(self.state.bil_opt_state),
            app_params=(
                None if self.state.app_params is None
                else jax.tree.map(lambda _: r, self.state.app_params)
            ),
            app_opt_state=rep_opt(self.state.app_opt_state),
        )

    def _shard_state(self):
        from jax.sharding import NamedSharding

        specs = self._state_specs()
        self.state = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(self.mesh, s)),
            self.state, specs,
        )

    # ------------------------------------------------------------------
    def _choose_caps(self, capacity: int, mult: float = None):
        """Intersection capacities for the configured rasterizer backend
        (stream supertile caps by default; gen-1 per-tile caps when
        ``cfg.raster_impl == "tiled"``)."""
        cfg = self.cfg
        mult = mult if mult is not None else self._isect_mult
        if cfg.raster_impl == "stream":
            from splat_one_tpu.ops.stream_isect import (
                StreamCaps, supertile_grid,
            )

            _, _, sw, sh = supertile_grid(
                self.width, self.height, cfg.tile_size
            )
            if self.mesh is not None:
                # supertile-slab sharding over the gauss axis: exact
                # per-slab intersection counts (ops.stream_isect; spherical
                # bboxes are segmented into unwrapped halves), so the cap
                # is a per-device budget — mean/n with 4x slack for slab
                # load imbalance (center slabs see several times the
                # mean); overflow triggers the usual growth recompile
                n_g = self.mesh.shape["gauss"]
                mult = max(mult * 4.0 / n_g, 0.75)
            return StreamCaps.choose(
                capacity, cfg.batch_size, cfg.batch_size * sw * sh,
                avg_supertiles_per_gaussian=mult,
            )
        return IsectCaps.choose(
            capacity, cfg.batch_size,
            _n_tiles(self.width, self.height, cfg.tile_size),
            avg_tiles_per_gaussian=mult,
        )

    def _grow_isect_caps(self, n_isect: float = None):
        """React to intersection-capacity overflow: raise the per-gaussian
        intersection budget and rebuild the jitted steps. Without this an
        overflowing scene silently truncates intersections (wrong
        gradients) for the rest of the run. When the measured ``n_isect``
        is known, size the budget directly from it (one recompile instead
        of a geometric-growth recompile ladder)."""
        need = 1.5 * self._isect_mult
        if n_isect:
            # under a mesh, n_isect is the PER-SLAB max and _choose_caps
            # re-applies the 4/n_gauss slab factor — divide it back out so
            # the resulting local cap covers 1.3x the measured slab load
            factor = 1.0
            if self.mesh is not None and self.cfg.raster_impl == "stream":
                factor = max(4.0 / self.mesh.shape["gauss"], 1e-6)
            need = max(
                need,
                1.3 * float(n_isect)
                / (self.cfg.batch_size * self.capacity) / factor,
            )
        self._isect_mult = need
        self.caps = self._choose_caps(self.capacity)
        self._build_steps()

    # ------------------------------------------------------------------
    def _build_steps(self):
        cfg = self.cfg
        W, H = self.width, self.height
        caps = self.caps
        hp = self._hp
        band_deg = self._band_deg
        is_mcmc = isinstance(cfg.strategy, MCMCStrategyCfg)
        use_abs = (not is_mcmc) and getattr(cfg.strategy, "absgrad", False)

        # ---- mesh axis helpers: no-ops single-chip, collectives under
        # shard_map over the ("data", "gauss") mesh ----
        mesh = self.mesh
        sharded = mesh is not None
        n_gauss = mesh.shape["gauss"] if sharded else 1

        def pmean_data(x):
            return jax.lax.pmean(x, "data") if sharded else x

        def psum_data(x):
            return jax.lax.psum(x, "data") if sharded else x

        def psum_gauss(x):
            return jax.lax.psum(x, "gauss") if sharded else x

        def gather_gauss(proj):
            if not sharded:
                return proj
            if cfg.gauss_exchange == "ring":
                # ring exchange (BASELINE configs 4-5 layout; the gsplat
                # distributed all-to-all analog, gsplat_trainer.py:491):
                # round k holds shard (i - k) mod n; each hop is a
                # collective-permute whose transfer XLA can overlap with
                # the neighbouring rounds' compute, and whose autodiff
                # transpose routes that round's field gradients back to
                # the owning shard — gradients stay sharded end-to-end.
                perm = [(j, (j + 1) % n_gauss) for j in range(n_gauss)]
                rounds = []
                cur = proj
                for k in range(n_gauss):
                    rounds.append(cur)
                    if k + 1 < n_gauss:
                        cur = jax.tree.map(
                            lambda x: jax.lax.ppermute(x, "gauss", perm),
                            cur,
                        )
                # order rounds by ORIGIN shard so every device concatenates
                # the same global order (round k on device i holds shard
                # (i - k) mod n): roll by the device index
                i = jax.lax.axis_index("gauss")

                def reorder(*xs):
                    stacked = jnp.stack(xs, axis=0)  # [n, B, local, ...]
                    # round holding shard s is (i - s) mod n
                    inv = jnp.mod(i - jnp.arange(n_gauss), n_gauss)
                    stacked = jnp.take(stacked, inv, axis=0)
                    return jnp.concatenate(list(stacked), axis=1)

                return jax.tree.map(reorder, *rounds)
            return jax.tree.map(
                lambda x: jax.lax.all_gather(x, "gauss", axis=1, tiled=True),
                proj,
            )

        def fold_gauss(key):
            if not sharded:
                return key
            return jax.random.fold_in(key, jax.lax.axis_index("gauss"))

        # supertile-slab sharding over the gauss axis (stream impl): each
        # device composites only its slab of the (camera, supertile) grid
        # instead of redundantly compositing every camera n_gauss times
        st_shard = (
            ("gauss", n_gauss)
            if sharded and cfg.raster_impl == "stream" else None
        )

        strat_cfg = cfg.strategy
        if sharded and is_mcmc:
            # per-shard splat budget: each gauss shard runs MCMC relocation
            # against its slice of the global cap
            strat_cfg = dataclasses.replace(
                strat_cfg, cap_max=strat_cfg.cap_max // n_gauss
            )

        def color_input(params, app_params, camtoworlds, image_ids, step):
            """(colors, sh_degree) for rasterization: SH coefficients with
            degree-ramp band masking, or the appearance-MLP path
            (reference gsplat_trainer.py:599-610)."""
            if cfg.app_opt:
                from splat_one_tpu.train import appearance as APP

                campos = camtoworlds[:, :3, 3]  # [B, 3]
                dirs = params["means"][None] - campos[:, None]  # [B, CAP, 3]
                logits = APP.appearance_color(
                    app_params, params["features"], image_ids, dirs,
                    cfg.sh_degree,
                )
                return jax.nn.sigmoid(
                    logits + params["colors"][None]
                ), None
            active = jnp.minimum(
                step // cfg.sh_degree_interval, cfg.sh_degree
            )
            mask = (band_deg <= active).astype(jnp.float32)[None, :, None]
            sh = jnp.concatenate(
                [params["sh0"], params["shN"] * mask], axis=1
            )
            return sh, cfg.sh_degree

        def render_batch(params, alive, camtoworlds, Ks, step,
                         image_ids=None, app_params=None):
            means = params["means"]
            quats = params["quats"]
            scales = jnp.exp(params["scales"])
            opac = jax.nn.sigmoid(params["opacities"])
            sh, sh_deg = color_input(
                params, app_params, camtoworlds, image_ids, step
            )
            viewmats = invert_se3(camtoworlds)
            B = camtoworlds.shape[0]
            dummy = jnp.zeros((B, means.shape[0], 2))
            render, alpha, info = rasterization(
                means, quats, scales, opac, sh, viewmats, Ks, W, H,
                sh_degree=sh_deg,
                near_plane=cfg.near_plane, far_plane=cfg.far_plane,
                tile_size=cfg.tile_size, camera_model=cfg.camera_model,
                render_mode="RGB+ED",
                rasterize_mode=(
                    "antialiased" if cfg.antialiased else "classic"
                ),
                caps=caps, alive=alive,
                means2d_dummy=dummy,
                proj_transform=(gather_gauss if sharded else None),
                st_shard=st_shard,
            )
            return render, alpha, info

        def loss_fn(params, pose_params, bil_grids, app_params, dummies,
                    batch, alive, step, key):
            camtoworlds = batch["camtoworld"]
            if cfg.pose_opt:
                embeds = pose_params[batch["image_id"]]
                camtoworlds = P.apply_pose_adjust(camtoworlds, embeds)
            means = params["means"]
            quats = params["quats"]
            scales = jnp.exp(params["scales"])
            opac = jax.nn.sigmoid(params["opacities"])
            sh, sh_deg = color_input(
                params, app_params, camtoworlds, batch["image_id"], step
            )
            viewmats = invert_se3(camtoworlds)
            render, alpha, info = rasterization(
                means, quats, scales, opac, sh, viewmats, batch["K"], W, H,
                sh_degree=sh_deg,
                near_plane=cfg.near_plane, far_plane=cfg.far_plane,
                tile_size=cfg.tile_size, camera_model=cfg.camera_model,
                render_mode="RGB+ED",
                rasterize_mode=(
                    "antialiased" if cfg.antialiased else "classic"
                ),
                caps=caps, alive=alive,
                means2d_dummy=dummies["m2d"],
                absgrad_dummy=(dummies["abs"] if use_abs else None),
                proj_transform=(gather_gauss if sharded else None),
                st_shard=st_shard,
            )
            rgb = render[..., 0:3]
            depth_r = render[..., 3:4]
            if cfg.random_bkgd:
                bkgd = jax.random.uniform(key, (1, 1, 1, 3))
                rgb = rgb + bkgd * (1.0 - alpha)
            if cfg.use_bilateral_grid:
                from splat_one_tpu.train import bilateral_grid as BG

                rgb = BG.slice_grid(
                    bil_grids[batch["image_id"]], rgb
                )
            m = L.image_loss(rgb, batch["image"], cfg.ssim_lambda)
            loss = m["loss"]
            if cfg.use_bilateral_grid:
                from splat_one_tpu.train import bilateral_grid as BG

                # TV regularization weight 10 (reference
                # gsplat_trainer.py:649-651)
                loss = loss + 10.0 * BG.total_variation_loss(
                    bil_grids[batch["image_id"]]
                )
            if cfg.depth_loss and "depth" in batch:
                dl = L.depth_loss(
                    depth_r, batch["depth"],
                    scene_scale=self.scene.scene_scale,
                )
                loss = loss + cfg.depth_lambda * dl
                m["depthloss"] = dl
            reg = L.regularizers(
                params, alive, cfg.opacity_reg, cfg.scale_reg,
                n_alive=psum_gauss(jnp.sum(alive.astype(jnp.int32))),
            )
            loss = loss + reg
            m["loss"] = loss
            aux = dict(
                metrics=m, radii=info["radii_local"], reg=reg,
                n_isect=info["n_isect"], overflow=info["overflow"],
            )
            return loss, aux

        def train_step(state: TrainState, batch, key):
            step = state.step
            B = batch["camtoworld"].shape[0]
            cap_local = state.params["means"].shape[0]
            # m2d dummy is LOCAL-shard shaped (added before the gauss
            # gather, so its cotangent is the shard's own means2d grads);
            # abs dummy rides the composite and is full-capacity
            dummies = {
                "m2d": jnp.zeros((B, cap_local, 2)),
                "abs": jnp.zeros((B, cap_local * n_gauss, 2)),
            }
            # zero placeholders keep value_and_grad happy when a module is
            # off (grads of None primals are not allowed)
            pose_in = (
                state.pose_params if cfg.pose_opt else jnp.zeros((0, 9))
            )
            bil_in = (
                state.bil_grids
                if cfg.use_bilateral_grid
                else jnp.zeros((1, 1, 1, 1, 12))
            )
            app_in = (
                state.app_params if cfg.app_opt else {"_": jnp.zeros(())}
            )
            grad_fn = jax.value_and_grad(
                loss_fn, argnums=(0, 1, 2, 3, 4), has_aux=True
            )
            (loss, aux), (gp, gpose, gbil, gapp, gdum) = grad_fn(
                state.params, pose_in, bil_in, app_in, dummies, batch,
                state.alive, step, key,
            )
            # data-parallel gradient averaging (grad of the global camera
            # mean; the gauss-axis psum_scatter already happened inside the
            # all_gather transpose). Pose/bilateral/appearance params are
            # REPLICATED over 'gauss', but each gauss shard's backward only
            # carries its own gaussians' (and its own supertile slab's)
            # contributions — they must be psum'd over 'gauss' or the
            # replicated optimizer states silently diverge per device.
            gp = pmean_data(gp)
            gpose = pmean_data(psum_gauss(gpose))
            gbil = pmean_data(psum_gauss(gbil))
            gapp = jax.tree.map(
                lambda x: pmean_data(psum_gauss(x)), gapp
            )
            # densification statistics (absgrad or plain grad per strategy):
            # per-camera norms taken LOCALLY, then the per-gaussian scalars
            # summed over the data axis (summing raw 2-vectors across
            # cameras before the norm would be the wrong statistic)
            stat_grad = gdum["abs"] if use_abs else gdum["m2d"]
            if use_abs and sharded:
                # the abs dummy rides the composite: each device's rows
                # hold only its own supertile slab's |grad| sums — combine
                # slabs BEFORE slicing out this shard's gaussians
                stat_grad = psum_gauss(stat_grad)
                stat_grad = jax.lax.dynamic_slice_in_dim(
                    stat_grad,
                    jax.lax.axis_index("gauss") * cap_local,
                    cap_local, axis=1,
                )
            delta = S.strategy_update(
                S.strategy_init(cap_local), stat_grad, aux["radii"], W, H
            )
            strat = S.StrategyState(
                grad2d=state.strat.grad2d + psum_data(delta.grad2d),
                count=state.strat.count + psum_data(delta.count),
            )

            lrs = {
                k: v * hp["lr_scale"] for k, v in self._lrs_base.items()
            }
            lrs["means"] = lrs["means"] * opt.means_lr_decay(
                step, cfg.max_steps
            )
            visible = None
            if cfg.visible_adam:
                vis_local = jnp.any(aux["radii"] > 0, axis=0)
                visible = psum_data(vis_local.astype(jnp.int32)) > 0
            params, opt_state = opt.adam_update(
                gp, state.opt_state, state.params, lrs,
                b1=hp["b1"], b2=hp["b2"], eps=hp["eps"],
                visible_mask=visible,
            )
            app_params, app_opt_state = state.app_params, state.app_opt_state
            if cfg.app_opt:
                gapp_wd = jax.tree.map(
                    lambda g, w: g + cfg.app_opt_reg * w, gapp,
                    state.app_params,
                )
                app_params, app_opt_state = opt.adam_update(
                    gapp_wd, state.app_opt_state, state.app_params,
                    {k: jnp.asarray(cfg.app_opt_lr) for k in state.app_params},
                )
            bil_grids, bil_opt_state = state.bil_grids, state.bil_opt_state
            if cfg.use_bilateral_grid:
                bg, bil_opt_state = opt.adam_update(
                    {"bil": gbil}, state.bil_opt_state,
                    {"bil": state.bil_grids},
                    {"bil": jnp.asarray(2e-3)},
                )
                bil_grids = bg["bil"]
            pose_params, pose_opt_state = state.pose_params, state.pose_opt_state
            if cfg.pose_opt:
                gpose_wd = gpose + cfg.pose_opt_reg * state.pose_params
                pp, pose_opt_state = opt.adam_update(
                    {"pose": gpose_wd}, state.pose_opt_state,
                    {"pose": state.pose_params},
                    {"pose": jnp.asarray(cfg.pose_opt_lr)},
                )
                pose_params = pp["pose"]
            if is_mcmc:
                # SGLD noise injection every step (MCMC strategy); per-shard
                # key so shards draw independent noise
                params = S.mcmc_noise(
                    fold_gauss(key), params, state.alive, lrs["means"],
                    strat_cfg.noise_lr,
                )
            new_state = TrainState(
                params=params, opt_state=opt_state, alive=state.alive,
                strat=strat, step=step + 1,
                pose_params=pose_params, pose_opt_state=pose_opt_state,
                bil_grids=bil_grids, bil_opt_state=bil_opt_state,
                app_params=app_params,
                app_opt_state=app_opt_state,
            )
            metrics = dict(aux["metrics"])
            # image terms are means over cameras (replicated along gauss);
            # the regularizer is per-gauss-shard and sums across shards
            metrics["loss"] = (
                pmean_data(metrics["loss"] - aux["reg"])
                + psum_gauss(aux["reg"])
            )
            for k in ("l1", "ssim", "depthloss"):
                if k in metrics:
                    metrics[k] = pmean_data(metrics[k])
            metrics["n_isect"] = psum_data(aux["n_isect"])
            metrics["overflow"] = (
                psum_data(aux["overflow"].astype(jnp.int32)) > 0
            )
            return new_state, metrics

        def refine_step(state: TrainState, key):
            key = fold_gauss(key)  # per-shard densification choices
            cap_local = state.alive.shape[0]
            if is_mcmc:
                params, opt_state, alive, info = S.mcmc_refine(
                    key, state.params, state.opt_state, state.alive,
                    strat_cfg,
                )
                info = {k: psum_gauss(v) for k, v in info.items()}
                return state._replace(
                    params=params, opt_state=opt_state, alive=alive,
                    strat=S.strategy_init(cap_local),
                ), info
            params, opt_state, alive, strat, info = S.default_refine(
                key, state.params, state.opt_state, state.alive,
                state.strat, state.step, strat_cfg,
                self.scene.scene_scale,
            )
            info = {k: psum_gauss(v) for k, v in info.items()}
            return state._replace(
                params=params, opt_state=opt_state, alive=alive, strat=strat
            ), info

        def reset_step(state: TrainState):
            params, opt_state = S.reset_opacity(
                state.params, state.opt_state, state.alive,
                cfg.strategy.prune_opa,
            )
            return state._replace(params=params, opt_state=opt_state)

        def eval_render(state: TrainState, camtoworld, K, image_id):
            render, alpha, _ = render_batch(
                state.params, state.alive, camtoworld, K,
                jnp.asarray(cfg.max_steps),
                image_ids=image_id, app_params=state.app_params,
            )
            rgb = jnp.clip(render[..., 0:3], 0.0, 1.0)
            depth = render[..., 3:4]  # ED: already expected depth
            return rgb, alpha, depth

        if not sharded:
            self._train_step = jax.jit(train_step, donate_argnums=(0,))
            self._refine_step = jax.jit(refine_step, donate_argnums=(0,))
            self._reset_step = jax.jit(reset_step, donate_argnums=(0,))
            self._eval_render = jax.jit(eval_render)
            return

        # ---- SPMD wrapping: the identical step functions under shard_map
        # over the (data, gauss) mesh ----
        from jax import shard_map
        from jax.sharding import PartitionSpec as PSpec

        state_spec = self._state_specs()
        rep = PSpec()
        _train_cache = {}

        def train_dispatch(state, batch, key):
            bkey = tuple(sorted(batch.keys()))
            if bkey not in _train_cache:
                bspec = {k: PSpec("data") for k in batch}
                sm = shard_map(
                    train_step, mesh=mesh,
                    in_specs=(state_spec, bspec, rep),
                    out_specs=(state_spec, rep), check_vma=False,
                )
                _train_cache[bkey] = jax.jit(sm, donate_argnums=(0,))
            return _train_cache[bkey](state, batch, key)

        self._train_step = train_dispatch
        self._refine_step = jax.jit(
            shard_map(refine_step, mesh=mesh, in_specs=(state_spec, rep),
                      out_specs=(state_spec, rep), check_vma=False),
            donate_argnums=(0,),
        )
        self._reset_step = jax.jit(
            shard_map(reset_step, mesh=mesh, in_specs=(state_spec,),
                      out_specs=state_spec, check_vma=False),
            donate_argnums=(0,),
        )
        self._eval_render = jax.jit(
            shard_map(eval_render, mesh=mesh,
                      in_specs=(state_spec, rep, rep, rep),
                      out_specs=(rep, rep, rep), check_vma=False)
        )

    # ------------------------------------------------------------------
    _DEVICE_IMAGE_BUDGET = 2 << 30  # keep images on device under 2 GiB

    def _batch(self, idx: np.ndarray) -> Dict[str, jax.Array]:
        # small in-RAM scenes live on the DEVICE once (indexing is an
        # on-device gather) — re-uploading each batch over the host link
        # dominated step time at production resolutions; streaming scenes
        # keep the host decode + prefetch path
        imgs_src = self.scene.images
        if (
            isinstance(imgs_src, np.ndarray)
            and imgs_src.nbytes * (4 if imgs_src.dtype == np.uint8 else 1)
            < self._DEVICE_IMAGE_BUDGET
        ):
            if not hasattr(self, "_dev_images"):
                f = imgs_src.astype(np.float32)
                if imgs_src.dtype == np.uint8:
                    f = f / 255.0
                self._dev_images = jax.device_put(f)
            imgs = self._dev_images[jnp.asarray(idx)]
        else:
            imgs = imgs_src[idx]
            if hasattr(imgs, "dtype") and imgs.dtype == np.uint8:
                imgs = imgs.astype(np.float32) / 255.0
            imgs = jnp.asarray(imgs)
        b = {
            "camtoworld": jnp.asarray(self.scene.camtoworlds[idx]),
            "K": jnp.asarray(self.scene.Ks[idx]),
            "image": imgs,
            "image_id": jnp.asarray(idx.astype(np.int32)),
        }
        if self.cfg.depth_loss and self.scene.depths is not None:
            b["depth"] = jnp.asarray(self.scene.depths[idx])
        return b

    def train(self, log_every: int = 100, stop_flag=None):
        """Run the training loop (reference Runner.train, :499-777)."""
        cfg = self.cfg
        rng = np.random.default_rng(cfg.seed)
        strat_cfg = cfg.strategy
        is_mcmc = isinstance(strat_cfg, MCMCStrategyCfg)
        t_start = time.time()
        perm = rng.permutation(self.train_idx)
        pos = 0
        history = []
        from splat_one_tpu.utils.tensorboard import SummaryWriter

        tb = SummaryWriter(os.path.join(self.result_dir, "tb"))
        prev_overflow = None  # one-step-delayed so the check overlaps compute

        def draw_idx():
            nonlocal perm, pos
            if pos + cfg.batch_size > len(perm):
                perm = rng.permutation(self.train_idx)
                pos = 0
            out = perm[pos:pos + cfg.batch_size]
            pos += cfg.batch_size
            return out

        streaming = hasattr(self.scene.images, "prefetch")
        # resume fidelity: the batch-permutation and RNG-key streams depend
        # only on cfg.seed and the number of consumed steps — re-derive and
        # fast-forward both so a killed run resumed from a checkpoint
        # replays the exact schedule an uninterrupted run would have used
        self.key = jax.random.PRNGKey(cfg.seed)
        for _ in range(int(self.state.step)):
            draw_idx()
            self.key, _, _ = jax.random.split(self.key, 3)
        idx = draw_idx()
        for step in range(int(self.state.step), cfg.max_steps):
            if stop_flag is not None and stop_flag():
                break
            self.key, k1, k2 = jax.random.split(self.key, 3)
            self.state, metrics = self._train_step(
                self.state, self._batch(idx), k1
            )
            # double-buffering: decode the NEXT batch on host threads while
            # this step runs on device (reference DataLoader semantics,
            # gsplat_trainer.py:562-572)
            idx = draw_idx()
            if streaming:
                self.scene.images.prefetch(idx)
            # intersection-capacity overflow -> grow caps + rebuild steps
            # (same designed-recompile treatment as splat-capacity growth);
            # sampled every 10 steps so the scalar fetch doesn't serialize
            # the dispatch pipeline (staleness is bounded and growth sizes
            # itself from the measured n_isect)
            if prev_overflow is not None and bool(prev_overflow[0]):
                self._grow_isect_caps(float(prev_overflow[1]))
                prev_overflow = None
            elif step % 10 == 9:
                prev_overflow = (
                    metrics.get("overflow"), metrics.get("n_isect", 0)
                )
            else:
                prev_overflow = None
            # densification schedule (gsplat step_post_backward semantics)
            if (
                strat_cfg.refine_start_iter
                <= step
                < strat_cfg.refine_stop_iter
                and (step + 1) % strat_cfg.refine_every == 0
            ):
                self.state, rinfo = self._refine_step(self.state, k2)
                # capacity pressure: grow the buffers (the single designed
                # recompile point, SURVEY.md §7 hard part 3) when nearly full
                frac = int(G.n_alive(self.state.alive)) / self.capacity
                if frac > 0.9 and not isinstance(
                    strat_cfg, MCMCStrategyCfg
                ):
                    self._grow_capacity(self.capacity * 2)
            if (
                not is_mcmc
                and (step + 1) % strat_cfg.reset_every == 0
                and step < strat_cfg.refine_stop_iter
            ):
                self.state = self._reset_step(self.state)

            if (step + 1) % log_every == 0 or step == cfg.max_steps - 1:
                m = {
                    k: float(v)
                    for k, v in metrics.items()
                    if hasattr(v, "item") or np.isscalar(v)
                }
                m["step"] = step + 1
                m["num_GS"] = int(G.n_alive(self.state.alive))
                m["time_s"] = time.time() - t_start
                history.append(m)
            if (step + 1) % cfg.tb_every == 0:
                # TensorBoard scalars (reference gsplat_trainer.py:665-680)
                for k in ("loss", "l1", "ssim"):
                    if k in metrics:
                        tb.add_scalar(f"train/{k}", float(metrics[k]),
                                      step + 1)
                tb.add_scalar(
                    "train/num_GS", int(G.n_alive(self.state.alive)),
                    step + 1,
                )
                tb.flush()
            if (step + 1) in cfg.save_steps:
                self.save_checkpoint(step + 1)
                # train stats JSON (reference :682-691)
                stats = {
                    "step": step + 1,
                    "ellipse_time": time.time() - t_start,
                    "num_GS": int(G.n_alive(self.state.alive)),
                }
                with open(
                    os.path.join(
                        self.result_dir, "stats",
                        f"train_step{step + 1:04d}.json",
                    ),
                    "w",
                ) as f:
                    json.dump(stats, f)
            if (step + 1) in cfg.eval_steps:
                self.eval(step + 1)
        tb.close()
        return history

    # ------------------------------------------------------------------
    def _grow_capacity(self, new_capacity: int):
        """Double the splat buffers + optimizer/strategy state and rebuild
        the jitted steps (deliberate recompile; everything else stays
        recompile-free)."""
        from splat_one_tpu.ops.intersect import IsectCaps

        params, alive = G.grow_capacity(
            self.state.params, self.state.alive, new_capacity
        )
        m, _ = G.grow_capacity(self.state.opt_state.m, self.state.alive,
                               new_capacity)
        v, _ = G.grow_capacity(self.state.opt_state.v, self.state.alive,
                               new_capacity)
        self.state = self.state._replace(
            params=params, alive=alive,
            opt_state=opt.AdamState(m=m, v=v,
                                    count=self.state.opt_state.count),
            strat=S.strategy_init(new_capacity),
        )
        self.capacity = new_capacity
        self.caps = self._choose_caps(new_capacity)
        if self.mesh is not None:
            self._shard_state()
        self._build_steps()

    def eval(self, step: int, stage: str = "val") -> Dict[str, float]:
        """PSNR/SSIM/LPIPS over the validation split (reference Runner.eval,
        :779-841, which reports psnr/ssim/lpips + bilateral-corrected PSNR
        :824-830); stats JSON under results/stats/.

        LPIPS is weight-gated (``models.lpips``): without a converted
        checkpoint on disk the stat is reported as ``lpips: null`` rather
        than silently substituting random-weight scores. With a bilateral
        grid (or always, matching the reference's cc_psnr under
        use_bilateral_grid), ``cc_psnr`` applies the per-channel quadratic
        ``color_correct`` fit before PSNR."""
        from splat_one_tpu.ops.ssim import ssim as ssim_fn
        from splat_one_tpu.models import lpips as lpips_mod

        lpips_params = lpips_mod.load_weights()
        lpips_fn = (
            jax.jit(lambda p, g: lpips_mod.lpips(lpips_params, p, g))
            if lpips_params is not None else None
        )
        cc = self.cfg.use_bilateral_grid
        if cc:
            from splat_one_tpu.train import bilateral_grid as BG

            cc_fn = jax.jit(lambda p, g: L.psnr(BG.color_correct(p, g), g))

        psnrs, ssims, lpipss, cc_psnrs, times = [], [], [], [], []
        for i in self.val_idx:
            b = self._batch(np.array([i]))
            t0 = time.time()
            rgb, alpha, depth = self._eval_render(
                self.state, b["camtoworld"], b["K"], b["image_id"]
            )
            rgb = jax.block_until_ready(rgb)
            times.append(time.time() - t0)
            psnrs.append(float(L.psnr(rgb, b["image"])))
            ssims.append(float(ssim_fn(rgb, b["image"])))
            if lpips_fn is not None:
                lpipss.append(float(lpips_fn(rgb, b["image"])))
            if cc:
                cc_psnrs.append(float(cc_fn(rgb[0], b["image"][0])))
        stats = {
            "psnr": float(np.mean(psnrs)) if psnrs else 0.0,
            "ssim": float(np.mean(ssims)) if ssims else 0.0,
            "lpips": float(np.mean(lpipss)) if lpipss else None,
            "ellipse_time": float(np.mean(times[1:])) if len(times) > 1 else 0.0,
            "num_GS": int(G.n_alive(self.state.alive)),
        }
        if cc:
            stats["cc_psnr"] = float(np.mean(cc_psnrs)) if cc_psnrs else 0.0
        try:
            from splat_one_tpu.utils.profiling import memory_stats

            mem = memory_stats()
            peaks = [v for k, v in mem.items() if k.endswith("peak_gib")]
            if peaks:
                # reference reports cuda max_memory_allocated in GB (:835)
                stats["mem"] = max(peaks)
        except Exception:
            pass
        path = os.path.join(
            self.result_dir, "stats", f"{stage}_step{step:04d}.json"
        )
        with open(path, "w") as f:
            json.dump(stats, f)
        return stats

    # ------------------------------------------------------------------
    def save_checkpoint(self, step: int):
        """Orbax-free simple checkpoint: params + optimizer + strategy state
        (richer than the reference's splats-only ckpt, :682-703)."""
        path = os.path.join(self.result_dir, "ckpts", f"ckpt_{step}.npz")
        flat = {}

        def add(prefix, tree):
            leaves, _ = jax.tree_util.tree_flatten_with_path(tree)
            for kp, v in leaves:
                flat[prefix + jax.tree_util.keystr(kp)] = np.asarray(v)

        add("params", self.state.params)
        add("opt_m", self.state.opt_state.m)
        add("opt_v", self.state.opt_state.v)
        flat["opt_count"] = np.asarray(self.state.opt_state.count)
        flat["alive"] = np.asarray(self.state.alive)
        flat["step"] = np.asarray(self.state.step)
        flat["strat_grad2d"] = np.asarray(self.state.strat.grad2d)
        flat["strat_count"] = np.asarray(self.state.strat.count)
        if self.state.pose_params is not None:
            flat["pose_params"] = np.asarray(self.state.pose_params)
            add("pose_m", self.state.pose_opt_state.m)
            add("pose_v", self.state.pose_opt_state.v)
            flat["pose_count"] = np.asarray(self.state.pose_opt_state.count)
        if self.state.bil_grids is not None:
            flat["bil_grids"] = np.asarray(self.state.bil_grids)
            add("bil_m", self.state.bil_opt_state.m)
            add("bil_v", self.state.bil_opt_state.v)
            flat["bil_count"] = np.asarray(self.state.bil_opt_state.count)
        if self.state.app_params is not None:
            add("app", self.state.app_params)
            add("app_m", self.state.app_opt_state.m)
            add("app_v", self.state.app_opt_state.v)
            flat["app_count"] = np.asarray(self.state.app_opt_state.count)
        np.savez(path, **flat)
        return path

    def save_checkpoint_sharded(self, step: int) -> str:
        """Orbax checkpoint of the (possibly mesh-sharded) TrainState: on a
        multi-host mesh every process writes only its own shards — the
        multi-host story the flat-npz path (which gathers to one host)
        cannot cover. Restore with ``load_checkpoint_sharded``."""
        import orbax.checkpoint as ocp

        path = os.path.abspath(
            os.path.join(self.result_dir, "ckpts", f"ocp_{step}")
        )
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(
                path, {"state": self._state_dictish(), "step": step},
                force=True,
            )
        return path

    def load_checkpoint_sharded(self, path: str):
        """Restore an Orbax checkpoint with this Trainer's shardings (the
        template carries the mesh placement, so shards land directly on
        their owning devices)."""
        import orbax.checkpoint as ocp

        # template shapes must come from the CHECKPOINT (a run that grew
        # capacity saves bigger buffers than a fresh Trainer holds);
        # shardings come from the current state/mesh — grown capacities
        # stay divisible by the gauss axis, so the specs still apply
        with ocp.StandardCheckpointer() as ckptr:
            try:
                meta = ckptr.metadata(os.path.abspath(path))
                if isinstance(meta, dict):
                    meta_state = meta["state"]
                else:
                    im = meta.item_metadata
                    meta_state = (
                        im.tree if hasattr(im, "tree") else im
                    )["state"]

                # the state tree holds NamedTuples (AdamState etc.) while
                # orbax metadata is plain dicts — match leaves by PATH
                def _meta_at(path):
                    node = meta_state
                    for p in path:
                        if hasattr(p, "key"):
                            node = node[p.key]
                        elif hasattr(p, "name"):
                            node = node[p.name]
                        else:
                            node = node[p.idx]
                    return node

                def to_struct(path, cur):
                    m = _meta_at(path)
                    return jax.ShapeDtypeStruct(
                        tuple(m.shape), np.dtype(m.dtype),
                        sharding=getattr(cur, "sharding", None),
                    )

                template = jax.tree_util.tree_map_with_path(
                    to_struct, self._state_dictish()
                )
            except Exception:
                # metadata unavailable (older orbax): current shapes
                template = jax.tree.map(
                    lambda x: jax.ShapeDtypeStruct(
                        x.shape, x.dtype,
                        sharding=getattr(x, "sharding", None),
                    ),
                    self._state_dictish(),
                )
            out = ckptr.restore(
                os.path.abspath(path), {"state": template, "step": 0}
            )
        st = out["state"]
        self.state = self.state._replace(**st)
        self.state = self.state._replace(
            step=jnp.asarray(out["step"], jnp.int32)
        )
        ckpt_capacity = int(self.state.alive.shape[0])
        if ckpt_capacity != self.capacity:
            self.capacity = ckpt_capacity
            self.caps = self._choose_caps(ckpt_capacity)
            self._build_steps()

    def _state_dictish(self):
        """TrainState as a plain nested dict (orbax-friendly: no Nones)."""
        d = {}
        for k, v in self.state._asdict().items():
            if v is None or k == "step":
                continue
            d[k] = v
        return d

    def load_checkpoint(self, path: str):
        z = np.load(path)

        def tree(prefix):
            out = {
                k.split("['")[1].rstrip("']"): jnp.asarray(z[k])
                for k in z.files
                if k.startswith(prefix + "[")
            }
            return out or None

        def opt_tree(prefix):
            m = tree(prefix + "_m")
            if m is None:
                return None
            return opt.AdamState(
                m=m, v=tree(prefix + "_v"),
                count=jnp.asarray(z[prefix + "_count"]),
            )

        params = tree("params")
        alive = jnp.asarray(z["alive"])
        strat = (
            S.StrategyState(
                grad2d=jnp.asarray(z["strat_grad2d"]),
                count=jnp.asarray(z["strat_count"]),
            )
            if "strat_grad2d" in z.files
            else S.strategy_init(alive.shape[0])
        )
        self.state = self.state._replace(
            params=params,
            opt_state=opt.AdamState(
                m=tree("opt_m"), v=tree("opt_v"),
                count=jnp.asarray(z["opt_count"]),
            ),
            alive=alive,
            strat=strat,
            step=jnp.asarray(z["step"]),
            pose_params=(
                jnp.asarray(z["pose_params"])
                if "pose_params" in z.files
                else self.state.pose_params
            ),
            pose_opt_state=opt_tree("pose") or self.state.pose_opt_state,
            bil_grids=(
                jnp.asarray(z["bil_grids"])
                if "bil_grids" in z.files
                else self.state.bil_grids
            ),
            bil_opt_state=opt_tree("bil") or self.state.bil_opt_state,
            app_params=tree("app") or self.state.app_params,
            app_opt_state=opt_tree("app") or self.state.app_opt_state,
        )
        # the checkpoint's capacity may differ from the constructor's (e.g.
        # it was saved after _grow_capacity): resize IsectCaps and rebuild
        # the jitted steps so eval/traj renders don't silently truncate.
        ckpt_capacity = int(alive.shape[0])
        if ckpt_capacity != self.capacity:
            self.capacity = ckpt_capacity
            self.caps = self._choose_caps(ckpt_capacity)
            self._build_steps()

    # ------------------------------------------------------------------
    def run(self):
        """Reference entry semantics (gsplat_trainer.py:950-961): with
        ``cfg.ckpt`` set, load and run eval / trajectory render /
        compression only; otherwise train."""
        if self.cfg.ckpt:
            for path in (
                self.cfg.ckpt
                if isinstance(self.cfg.ckpt, (list, tuple))
                else [self.cfg.ckpt]
            ):
                self.load_checkpoint(path)
            step = int(self.state.step)
            stats = self.eval(step)
            self.render_traj(step)
            if self.cfg.compression == "png":
                self.run_compression(step)
            return stats
        return self.train()

    def render_traj(self, step: int, n_frames: int = 60) -> str:
        """Render an interpolated/ellipse/spiral trajectory video
        (reference Runner.render_traj, :843-900): RGB | normalized-depth
        side-by-side frames under results/videos/traj_<step>/ (plus .mp4 if
        an ffmpeg binary is available)."""
        import shutil
        import subprocess

        from splat_one_tpu.data import traj as traj_mod

        c2ws = self.scene.camtoworlds
        if len(c2ws) > 10:
            c2ws = c2ws[5:-5]  # reference trims the ends (:850)
        kind = self.cfg.render_traj_path
        if kind == "interp":
            path = traj_mod.generate_interpolated_path(
                c2ws, max(1, n_frames // max(len(c2ws) - 1, 1))
            )
        elif kind == "ellipse_z":
            path = traj_mod.generate_ellipse_path_z(c2ws, n_frames=n_frames)
        elif kind == "ellipse_y":
            path = traj_mod.generate_ellipse_path_y(c2ws, n_frames=n_frames)
        elif kind == "spiral":
            path = traj_mod.generate_spiral_path(c2ws, n_frames=n_frames)
        else:
            raise ValueError(f"unknown render_traj_path {kind!r}")
        out_dir = os.path.join(
            self.result_dir, "videos", f"traj_{step}"
        )
        os.makedirs(out_dir, exist_ok=True)
        from PIL import Image

        K = self.scene.Ks[len(self.scene.Ks) // 2]
        for fi, c2w in enumerate(path):
            rgb, alpha, depth = self._eval_render(
                self.state, jnp.asarray(c2w[None]), jnp.asarray(K[None]),
                jnp.zeros((1,), jnp.int32),
            )
            rgb = np.asarray(jnp.clip(rgb[0], 0, 1))
            d = np.asarray(depth[0, ..., 0])
            lo, hi = np.percentile(d, 1), np.percentile(d, 99)
            dn = np.clip((d - lo) / max(hi - lo, 1e-6), 0, 1)
            frame = np.concatenate(
                [rgb, np.repeat(dn[..., None], 3, axis=-1)], axis=1
            )
            Image.fromarray((frame * 255).astype(np.uint8)).save(
                os.path.join(out_dir, f"{fi:04d}.png")
            )
        if shutil.which("ffmpeg"):
            mp4 = os.path.join(
                self.result_dir, "videos", f"traj_{step}.mp4"
            )
            subprocess.run(
                ["ffmpeg", "-y", "-framerate", "30", "-i",
                 os.path.join(out_dir, "%04d.png"), "-pix_fmt", "yuv420p",
                 mp4],
                check=False, capture_output=True,
            )
        return out_dir

    def run_compression(self, step: int) -> Dict[str, float]:
        """PNG compression round-trip + compressed eval (reference
        Runner.run_compression, :902-914)."""
        from splat_one_tpu.train import compression as comp

        out_dir = os.path.join(self.result_dir, "compression")
        comp.compress(
            out_dir,
            {k: np.asarray(v) for k, v in self.state.params.items()},
            np.asarray(self.state.alive),
        )
        params_np, alive_np = comp.decompress(out_dir)
        # load the round-tripped splats into the capacity buffers and eval
        n = params_np["opacities"].shape[0]
        saved = self.state
        new_params = {}
        for k, v in self.state.params.items():
            buf = np.array(np.asarray(v))
            buf[:n] = params_np[k]
            new_params[k] = jnp.asarray(buf)
        alive = jnp.asarray(
            np.arange(self.capacity) < n
        )
        self.state = self.state._replace(params=new_params, alive=alive)
        stats = self.eval(step, stage="compress")
        self.state = saved
        return stats

    # ------------------------------------------------------------------
    def render_view(self, camtoworld: np.ndarray, K: np.ndarray,
                    camera_model: str = None):
        """Interactive single-view render (reference _viewer_render_fn,
        :916-940). ``camera_model`` overrides the training model — the
        reference viewer's pinhole<->spherical toggle
        (app/gsplat_manager.py:105-118)."""
        if camera_model and camera_model != self.cfg.camera_model:
            return self._render_view_alt(camtoworld, K, camera_model)
        rgb, alpha, depth = self._eval_render(
            self.state,
            jnp.asarray(camtoworld[None]),
            jnp.asarray(K[None]),
            jnp.zeros((1,), jnp.int32),
        )
        return np.asarray(rgb[0]), np.asarray(depth[0])

    def _render_view_alt(self, camtoworld, K, camera_model: str):
        """Render with a non-training camera model (viewer toggle)."""
        fn = getattr(self, "_alt_render_cache", None)
        if fn is None or self._alt_render_model != camera_model:
            cfg = self.cfg
            caps = self._choose_caps(self.capacity)

            def render(params, alive, c2w, Kk):
                means = params["means"]
                sh = jnp.concatenate(
                    [params["sh0"], params["shN"]], axis=1
                ) if "sh0" in params else None
                colors = (
                    sh if sh is not None
                    else jax.nn.sigmoid(params["colors"])
                )
                render_out, alpha, _ = rasterization(
                    means, params["quats"], jnp.exp(params["scales"]),
                    jnp.where(
                        alive, jax.nn.sigmoid(params["opacities"]), 0.0
                    ),
                    colors, invert_se3(c2w[None]), Kk[None],
                    self.width, self.height,
                    sh_degree=(cfg.sh_degree if sh is not None else None),
                    camera_model=camera_model, render_mode="RGB+ED",
                    tile_size=cfg.tile_size, caps=caps,
                )
                return render_out[0, ..., :3], render_out[0, ..., 3:]

            fn = jax.jit(render)
            self._alt_render_cache = fn
            self._alt_render_model = camera_model
        rgb, depth = fn(
            self.state.params, self.state.alive,
            jnp.asarray(camtoworld), jnp.asarray(K)
        )
        return np.asarray(rgb), np.asarray(depth)


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _n_tiles(width: int, height: int, ts: int) -> int:
    return (-(-width // ts)) * (-(-height // ts))
