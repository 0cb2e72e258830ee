"""Training-engine smoke tests on a synthetic scene (CPU).

The reference has no trainer tests at all (SURVEY.md §4); these check the
full jitted train step, densification refine, opacity reset, checkpointing
round-trip, and that optimization actually reduces the loss.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splat_one_tpu.data.synthetic import make_synthetic_scene
from splat_one_tpu.train.config import Config
from splat_one_tpu.train.strategy import DefaultStrategyCfg, MCMCStrategyCfg
from splat_one_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def scene():
    s, _ = make_synthetic_scene(
        n_gaussians=400, n_cameras=6, width=64, height=64, n_points=200
    )
    return s


def small_cfg(tmp_path, **kw):
    base = dict(
        max_steps=40,
        eval_steps=[40],
        save_steps=[40],
        sh_degree=1,
        sh_degree_interval=10,
        capacity=512,
        result_dir=str(tmp_path),
        camera_model="pinhole",
        test_every=6,
        strategy=DefaultStrategyCfg(
            refine_start_iter=10, refine_stop_iter=35, refine_every=15,
            reset_every=10_000,
        ),
        batch_size=1,
        avg_tiles_per_gaussian=10.0,
    )
    base.update(kw)
    return Config(**base)


class TestTrainer:
    def test_loss_decreases(self, scene, tmp_path):
        tr = Trainer(small_cfg(tmp_path), scene)
        hist = tr.train(log_every=10)
        losses = [h["loss"] for h in hist]
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.9, losses
        # eval runs and produces sane metrics
        stats = tr.eval(40)
        assert stats["psnr"] > 10.0
        assert 0 <= stats["ssim"] <= 1

    def test_fisheye_training_loop(self, tmp_path):
        # closed-form fisheye EWA Jacobian drives a real training loop
        # (r3: replaced the jacfwd fallback; gsplat camera_model="fisheye"
        # surface, reference gsplat_trainer.py:477-494)
        s, _ = make_synthetic_scene(
            n_gaussians=300, n_cameras=4, width=64, height=64,
            n_points=150, camera_model="fisheye",
        )
        tr = Trainer(
            small_cfg(tmp_path, camera_model="fisheye", max_steps=30,
                      eval_steps=[30], save_steps=[30]), s,
        )
        hist = tr.train(log_every=10)
        losses = [h["loss"] for h in hist]
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.9, losses

    def test_densification_grows(self, scene, tmp_path):
        cfg = small_cfg(
            tmp_path,
            strategy=DefaultStrategyCfg(
                refine_start_iter=2, refine_stop_iter=100, refine_every=5,
                reset_every=10_000, grow_grad2d=1e-8,  # force growth
            ),
            max_steps=12,
            eval_steps=[],
            save_steps=[],
        )
        tr = Trainer(cfg, scene)
        n0 = int(jnp.sum(tr.state.alive))
        tr.train(log_every=5)
        n1 = int(jnp.sum(tr.state.alive))
        assert n1 > n0

    def test_mcmc_strategy_runs(self, scene, tmp_path):
        cfg = small_cfg(
            tmp_path,
            strategy=MCMCStrategyCfg(
                cap_max=512, refine_start_iter=2, refine_stop_iter=100,
                refine_every=5,
            ),
            max_steps=12,
            eval_steps=[],
            save_steps=[],
        )
        tr = Trainer(cfg, scene)
        hist = tr.train(log_every=5)
        assert np.isfinite([h["loss"] for h in hist]).all()

    def test_checkpoint_roundtrip(self, scene, tmp_path):
        cfg = small_cfg(tmp_path, max_steps=5, eval_steps=[], save_steps=[5])
        tr = Trainer(cfg, scene)
        tr.train(log_every=5)
        path = tr.save_checkpoint(5)
        means_before = np.asarray(tr.state.params["means"])
        tr2 = Trainer(cfg, scene)
        tr2.load_checkpoint(path)
        np.testing.assert_array_equal(
            np.asarray(tr2.state.params["means"]), means_before
        )
        assert int(tr2.state.step) == int(tr.state.step)

    def test_pose_opt_runs(self, scene, tmp_path):
        cfg = small_cfg(
            tmp_path, pose_opt=True, max_steps=6, eval_steps=[],
            save_steps=[],
        )
        tr = Trainer(cfg, scene)
        tr.train(log_every=5)
        assert float(jnp.abs(tr.state.pose_params).max()) > 0  # updated

    def test_render_view(self, scene, tmp_path):
        cfg = small_cfg(tmp_path, max_steps=2, eval_steps=[], save_steps=[])
        tr = Trainer(cfg, scene)
        tr.train(log_every=2)
        rgb, depth = tr.render_view(scene.camtoworlds[0], scene.Ks[0])
        assert rgb.shape == (64, 64, 3)
        assert np.isfinite(rgb).all()


class TestTrainerExtras:
    def test_compression_roundtrip(self, scene, tmp_path):
        from splat_one_tpu.train import compression as comp

        cfg = small_cfg(tmp_path, max_steps=3, eval_steps=[], save_steps=[])
        tr = Trainer(cfg, scene)
        tr.train(log_every=3)
        stats = tr.run_compression(3)
        assert stats["psnr"] > 5.0  # round-trip renders something sane
        # direct codec roundtrip accuracy on the raw params
        params = {k: np.asarray(v) for k, v in tr.state.params.items()}
        alive = np.asarray(tr.state.alive)
        comp.compress(str(tmp_path / "c2"), params, alive)
        back, _ = comp.decompress(str(tmp_path / "c2"))
        n = back["opacities"].shape[0]
        assert n == alive.sum()
        # means quantized to 16 bits of the bbox: tight
        idx = np.nonzero(alive)[0]
        span = params["means"][idx].max() - params["means"][idx].min()
        err = np.abs(
            np.sort(back["means"], axis=0)
            - np.sort(params["means"][idx], axis=0)
        ).max()
        assert err < span / 1000

    def test_render_traj_writes_frames(self, scene, tmp_path):
        import os

        cfg = small_cfg(tmp_path, max_steps=2, eval_steps=[], save_steps=[])
        tr = Trainer(cfg, scene)
        tr.train(log_every=2)
        out = tr.render_traj(2, n_frames=4)
        frames = [f for f in os.listdir(out) if f.endswith(".png")]
        assert len(frames) >= 4

    def test_bilateral_grid_training(self, scene, tmp_path):
        cfg = small_cfg(
            tmp_path, use_bilateral_grid=True, max_steps=6, eval_steps=[],
            save_steps=[],
        )
        tr = Trainer(cfg, scene)
        g0 = np.array(tr.state.bil_grids)
        hist = tr.train(log_every=3)
        assert np.isfinite([h["loss"] for h in hist]).all()
        # grids actually learn (move away from identity init)
        assert float(np.abs(np.array(tr.state.bil_grids) - g0).max()) > 0

    def test_app_opt_training(self, scene, tmp_path):
        cfg = small_cfg(
            tmp_path, app_opt=True, max_steps=8, eval_steps=[], save_steps=[],
        )
        tr = Trainer(cfg, scene)
        assert "features" in tr.state.params
        assert "sh0" not in tr.state.params
        e0 = np.array(tr.state.app_params["embeds"])
        hist = tr.train(log_every=4)
        assert np.isfinite([h["loss"] for h in hist]).all()
        # appearance params learn
        assert float(np.abs(np.array(tr.state.app_params["embeds"]) - e0).max()) > 0
        # eval works through the appearance path
        stats = tr.eval(8)
        assert np.isfinite(stats["psnr"])

    def test_tensorboard_and_stats_outputs(self, scene, tmp_path):
        import os

        cfg = small_cfg(
            tmp_path, max_steps=4, eval_steps=[], save_steps=[4], tb_every=2,
        )
        tr = Trainer(cfg, scene)
        tr.train(log_every=2)
        tb_files = os.listdir(os.path.join(str(tmp_path), "tb"))
        assert any(f.startswith("events.out.tfevents") for f in tb_files)
        # event file is non-trivial and TFRecord-framed
        p = os.path.join(str(tmp_path), "tb", tb_files[0])
        data = open(p, "rb").read()
        assert len(data) > 100
        import struct

        ln = struct.unpack("<Q", data[:8])[0]
        assert 0 < ln < 1000  # first record: file-version event
        assert os.path.exists(
            os.path.join(str(tmp_path), "stats", "train_step0004.json")
        )

    def test_ckpt_eval_only(self, scene, tmp_path):
        import dataclasses

        cfg = small_cfg(tmp_path, max_steps=3, eval_steps=[], save_steps=[3])
        tr = Trainer(cfg, scene)
        tr.train(log_every=3)
        ckpt = tr.save_checkpoint(3)
        cfg2 = small_cfg(tmp_path, max_steps=3, eval_steps=[], save_steps=[])
        cfg2.ckpt = [ckpt]
        tr2 = Trainer(cfg2, scene)
        stats = tr2.run()  # must NOT train: runs eval + traj instead
        assert "psnr" in stats
        assert int(tr2.state.step) == 3

    @pytest.mark.slow
    def test_capacity_growth(self, scene, tmp_path):
        # tiny capacity + aggressive growth forces the recompile point
        cfg = small_cfg(
            tmp_path,
            capacity=256,
            max_steps=30,
            eval_steps=[],
            save_steps=[],
            strategy=DefaultStrategyCfg(
                refine_start_iter=2, refine_stop_iter=100, refine_every=4,
                reset_every=10_000, grow_grad2d=1e-9,
            ),
        )
        tr = Trainer(cfg, scene)
        assert tr.capacity == 256
        hist = tr.train(log_every=10)
        assert tr.capacity >= 512  # grew at least once
        assert np.isfinite([h["loss"] for h in hist]).all()
        assert int(tr.state.alive.sum()) > 256  # uses the new space


class TestShardedTrainer:
    """The SAME Trainer step under shard_map over a (data x gauss) mesh
    must track the single-device loss trajectory (VERDICT round-1 item 2:
    multi-chip training with the full feature surface, densification
    included — reference gsplat_trainer.py:499-777 under world_size>1)."""

    def _mesh(self, n_data, n_gauss):
        import numpy as np
        from jax.sharding import Mesh

        dev = np.asarray(jax.devices()[: n_data * n_gauss]).reshape(
            n_data, n_gauss
        )
        return Mesh(dev, ("data", "gauss"))

    @pytest.mark.slow
    def test_sharded_matches_single(self, tmp_path):
        scene, _ = make_synthetic_scene(
            n_gaussians=300, n_cameras=8, width=48, height=48, n_points=150
        )
        kw = dict(
            max_steps=12, eval_steps=[], save_steps=[], batch_size=2,
            strategy=DefaultStrategyCfg(
                refine_start_iter=10_000, refine_stop_iter=10_001,
                refine_every=10_000, reset_every=10_000,
            ),
            test_every=8,
        )
        tr1 = Trainer(small_cfg(tmp_path / "a", **kw), scene)
        h1 = tr1.train(log_every=4)
        tr2 = Trainer(small_cfg(tmp_path / "b", **kw), scene,
                      mesh=self._mesh(2, 4))
        h2 = tr2.train(log_every=4)
        l1 = np.array([h["loss"] for h in h1])
        l2 = np.array([h["loss"] for h in h2])
        assert np.isfinite(l2).all()
        # identical data order + replicated math => near-identical losses
        np.testing.assert_allclose(l2, l1, rtol=2e-2, atol=2e-3)

    def test_pose_and_app_grads_replicated(self, tmp_path):
        """Regression (r2 review): pose/appearance gradients must be
        psum'd over the gauss axis — each shard's backward only carries
        its own gaussians' contributions, and without the reduction the
        'replicated' module params silently diverge per device."""
        scene, _ = make_synthetic_scene(
            n_gaussians=250, n_cameras=8, width=48, height=48,
            n_points=120
        )
        kw = dict(
            max_steps=6, eval_steps=[], save_steps=[], batch_size=2,
            pose_opt=True, pose_opt_lr=1e-3,
            strategy=DefaultStrategyCfg(
                refine_start_iter=10_000, refine_stop_iter=10_001,
                refine_every=10_000, reset_every=10_000,
            ),
            test_every=8,
        )
        tr1 = Trainer(small_cfg(tmp_path / "a", **kw), scene)
        tr1.train(log_every=100)
        tr2 = Trainer(small_cfg(tmp_path / "b", **kw), scene,
                      mesh=self._mesh(2, 4))
        tr2.train(log_every=100)
        p1 = np.asarray(tr1.state.pose_params)
        p2 = np.asarray(tr2.state.pose_params)
        scale = np.abs(p1).max() + 1e-12
        assert np.abs(p2 - p1).max() / scale < 1e-2, (
            np.abs(p2 - p1).max(), scale
        )

    def test_sharded_densification_and_eval(self, tmp_path):
        scene, _ = make_synthetic_scene(
            n_gaussians=300, n_cameras=8, width=48, height=48, n_points=150
        )
        kw = dict(
            max_steps=30, eval_steps=[30], save_steps=[], batch_size=2,
            strategy=DefaultStrategyCfg(
                refine_start_iter=5, refine_stop_iter=28, refine_every=10,
                reset_every=10_000, grow_grad2d=1e-8,
            ),
            test_every=8,
        )
        tr = Trainer(small_cfg(tmp_path, **kw), scene,
                     mesh=self._mesh(2, 4))
        n0 = int(jnp.sum(tr.state.alive))
        hist = tr.train(log_every=10)
        assert np.isfinite([h["loss"] for h in hist]).all()
        n1 = int(jnp.sum(tr.state.alive))
        assert n1 > n0, (n0, n1)  # densification ran on the sharded buffers
        stats = tr.eval(30)
        assert stats["psnr"] > 8.0


class TestPreemptionResume:
    """Kill/resume losslessness (VERDICT round-1 weak #3): a run saved at
    step k and resumed in a FRESH Trainer must produce bit-identical state
    to an uninterrupted run — including appearance/bilateral/pose module
    state (the reference saves splats only, gsplat_trainer.py:682-703)."""

    def test_resume_lossless_with_app_and_pose(self, tmp_path):
        scene, _ = make_synthetic_scene(
            n_gaussians=250, n_cameras=6, width=48, height=48, n_points=120
        )
        kw = dict(
            max_steps=6, eval_steps=[], save_steps=[3],
            batch_size=1, test_every=6, app_opt=True, pose_opt=True,
            use_bilateral_grid=True,
            strategy=DefaultStrategyCfg(
                refine_start_iter=10_000, refine_stop_iter=10_001,
                refine_every=10_000, reset_every=10_000,
            ),
        )
        # uninterrupted run
        tr_full = Trainer(small_cfg(tmp_path / "full", **kw), scene)
        tr_full.train(log_every=10)

        # interrupted at 3 (save_steps) then resumed in a fresh Trainer
        tr_a = Trainer(small_cfg(tmp_path / "ab", **kw), scene)
        stop = {"n": 0}

        def stop_flag():
            stop["n"] += 1
            return stop["n"] > 3  # after 3 steps

        tr_a.train(log_every=10, stop_flag=stop_flag)
        ckpt = tr_a.save_checkpoint(int(tr_a.state.step))
        tr_b = Trainer(small_cfg(tmp_path / "ab2", **kw), scene)
        tr_b.load_checkpoint(ckpt)
        tr_b.train(log_every=10)

        for k in tr_full.state.params:
            np.testing.assert_allclose(
                np.asarray(tr_b.state.params[k]),
                np.asarray(tr_full.state.params[k]),
                rtol=1e-5, atol=1e-6, err_msg=k,
            )
        np.testing.assert_allclose(
            np.asarray(tr_b.state.app_params["embeds"]),
            np.asarray(tr_full.state.app_params["embeds"]),
            rtol=1e-5, atol=1e-7,
        )
        np.testing.assert_allclose(
            np.asarray(tr_b.state.bil_grids),
            np.asarray(tr_full.state.bil_grids), rtol=1e-5, atol=1e-7,
        )
        np.testing.assert_allclose(
            np.asarray(tr_b.state.pose_params),
            np.asarray(tr_full.state.pose_params), rtol=1e-5, atol=1e-7,
        )


class TestOrbaxShardedCheckpoint:
    def test_sharded_save_restore(self, tmp_path):
        import numpy as np
        from jax.sharding import Mesh

        scene, _ = make_synthetic_scene(
            n_gaussians=250, n_cameras=4, width=48, height=48, n_points=120
        )
        kw = dict(
            max_steps=3, eval_steps=[], save_steps=[], batch_size=2,
            test_every=4,
            strategy=DefaultStrategyCfg(
                refine_start_iter=10_000, refine_stop_iter=10_001,
                refine_every=10_000, reset_every=10_000,
            ),
        )
        dev = np.asarray(jax.devices()[:8]).reshape(2, 4)
        mesh = Mesh(dev, ("data", "gauss"))
        tr = Trainer(small_cfg(tmp_path / "a", **kw), scene, mesh=mesh)
        tr.train(log_every=10)
        path = tr.save_checkpoint_sharded(3)

        tr2 = Trainer(small_cfg(tmp_path / "b", **kw), scene, mesh=mesh)
        tr2.load_checkpoint_sharded(path)
        for k in tr.state.params:
            np.testing.assert_array_equal(
                np.asarray(tr2.state.params[k]),
                np.asarray(tr.state.params[k]), err_msg=k,
            )
        # shardings survive the round trip (shards land on their devices)
        s1 = tr.state.params["means"].sharding
        s2 = tr2.state.params["means"].sharding
        assert s1.is_equivalent_to(s2, tr.state.params["means"].ndim)
        assert int(tr2.state.step) == 3
        # training continues from the restored sharded state
        h = tr2.train(log_every=1)
        assert np.isfinite([x["loss"] for x in h]).all()

    def test_restore_after_capacity_growth(self, tmp_path):
        """A checkpoint saved after _grow_capacity must restore into a
        FRESH Trainer whose initial capacity is smaller (the template
        shapes must come from the checkpoint, not the current state)."""
        import numpy as np
        from jax.sharding import Mesh

        scene, _ = make_synthetic_scene(
            n_gaussians=250, n_cameras=4, width=48, height=48,
            n_points=120
        )
        kw = dict(
            max_steps=2, eval_steps=[], save_steps=[], batch_size=2,
            test_every=4,
            strategy=DefaultStrategyCfg(
                refine_start_iter=10_000, refine_stop_iter=10_001,
                refine_every=10_000, reset_every=10_000,
            ),
        )
        dev = np.asarray(jax.devices()[:8]).reshape(2, 4)
        mesh = Mesh(dev, ("data", "gauss"))
        tr = Trainer(small_cfg(tmp_path / "a", **kw), scene, mesh=mesh)
        tr.train(log_every=10)
        tr._grow_capacity(tr.capacity * 2)  # the designed recompile point
        grown = tr.capacity
        path = tr.save_checkpoint_sharded(2)

        tr2 = Trainer(small_cfg(tmp_path / "b", **kw), scene, mesh=mesh)
        assert tr2.capacity < grown
        tr2.load_checkpoint_sharded(path)
        assert tr2.capacity == grown
        np.testing.assert_array_equal(
            np.asarray(tr2.state.params["means"]),
            np.asarray(tr.state.params["means"]),
        )
        h = tr2.train(log_every=1)
        assert np.isfinite([x["loss"] for x in h]).all()


class TestBilateralCP4D:
    """Low-rank 4D bilateral grid (reference lib_bilagrid.py:401-573)."""

    def test_identity_init_and_trainability(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        import optax

        from splat_one_tpu.train import bilateral_grid as BG

        key = jax.random.PRNGKey(0)
        params = BG.init_cp4d(key, rank=4, learn_gray=False,
                              init_noise_scale=1e-6)
        xyz = jax.random.uniform(key, (64, 3), minval=-1.5, maxval=1.5)
        rgb = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
        out = BG.apply_cp4d(params, xyz, rgb)
        # identity init: corrected colors ~= input colors
        assert float(jnp.abs(out - rgb).max()) < 1e-3
        assert np.isfinite(float(BG.total_variation_loss_cp4d(params)))

        # fit a global color tint: loss must drop by >10x
        tint = jnp.asarray([1.3, 0.8, 1.1])
        target = jnp.clip(rgb * tint, 0, 1)

        def loss_fn(p):
            return jnp.mean((BG.apply_cp4d(p, xyz, rgb) - target) ** 2)

        opt = optax.adam(3e-2)
        state = opt.init(params)
        l0 = float(loss_fn(params))

        @jax.jit
        def step(p, s):
            l, g = jax.value_and_grad(loss_fn)(p)
            u, s = opt.update(g, s)
            return optax.apply_updates(p, u), s, l

        for _ in range(120):
            params, state, l = step(params, state)
        assert float(l) < l0 / 10

    def test_learned_gray_shapes(self):
        import jax
        import jax.numpy as jnp

        from splat_one_tpu.train import bilateral_grid as BG

        params = BG.init_cp4d(jax.random.PRNGKey(2), rank=3,
                              learn_gray=True)
        aff = BG.slice_cp4d(params, jnp.zeros((4, 5, 3)),
                            jnp.full((4, 5, 3), 0.5))
        assert aff.shape == (4, 5, 3, 4)


class TestCameraModelResolution:
    def test_scene_camera_model_overrides_config_default(self, tmp_path):
        """Regression (r5): Config.camera_model defaults to "spherical"
        (reference parity — the reference is a 360-first app), and a
        DEFAULT config silently rendered pinhole scenes through the
        equirect projection. Training still fit the train views (the
        optimizer memorizes each view through the wrong mapping) while
        held-out views collapsed to fog — three rounds of quality-bench
        val PSNR stuck at 10-16. The scene's camera model is
        authoritative: injecting the exact GT params must reproduce the
        GT images through the trainer's own eval path."""
        from splat_one_tpu.core.sh import rgb_to_sh
        from splat_one_tpu.train import losses as L

        scene, gt = make_synthetic_scene(
            n_gaussians=800, n_cameras=6, width=96, height=96,
            n_points=100, seed=0, surface=True,
        )
        cfg = Config(  # NOTE: camera_model deliberately NOT set
            max_steps=1, capacity=1024, test_every=6,
            result_dir=str(tmp_path), sh_degree=0,
        )
        tr = Trainer(cfg, scene)
        assert tr.cfg.camera_model == "pinhole"

        p = {k: v for k, v in tr.state.params.items()}
        n, cap = 800, 1024
        pad = cap - n

        def padv(x, fill):
            x = np.asarray(x, np.float32)
            return jnp.asarray(np.concatenate(
                [x, np.full((pad,) + x.shape[1:], fill, np.float32)]))

        op = np.clip(gt["opacities"], 1e-4, 1 - 1e-4)
        p["means"] = padv(gt["means"], 0.0)
        p["quats"] = padv(gt["quats"], 1.0)
        p["scales"] = padv(np.log(gt["scales"]), -15.0)
        p["opacities"] = padv(np.log(op / (1 - op)), -15.0)
        p["sh0"] = padv(
            np.asarray(rgb_to_sh(jnp.asarray(gt["rgb"])))[:, None, :], 0.0)
        state = tr.state._replace(
            params=p, alive=jnp.asarray(np.arange(cap) < n))
        for idx in (int(tr.train_idx[0]), int(tr.val_idx[0])):
            b = tr._batch(np.array([idx]))
            rgb, _, _ = tr._eval_render(
                state, b["camtoworld"], b["K"], b["image_id"])
            psnr = float(L.psnr(rgb, b["image"]))
            assert psnr > 40.0, (idx, psnr)
