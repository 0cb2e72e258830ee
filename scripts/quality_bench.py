"""Quality benchmark: fit a garden-scale synthetic scene on the TPU.

No real dataset ships in this environment (zero egress), so the benchmark
trains against GT images rendered from a known gaussian scene — the
optimum is achievable, making PSNR/SSIM a sharp measure of the
trainer/rasterizer stack (densification, SH ramp, Adam schedules), and
step throughput a real training-speed number at production-like shapes.

Writes results JSON to results/quality_bench/stats/ and prints a summary
line; BASELINE.md's "established" table records the outcome.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    width = int(os.environ.get("QB_W", 1280))
    height = int(os.environ.get("QB_H", 720))
    n_gauss = int(os.environ.get("QB_GT_GAUSS", 40_000))
    steps = int(os.environ.get("QB_STEPS", 4000))
    n_cams = int(os.environ.get("QB_CAMS", 48))
    # "surface" (default): near-opaque bumpy-shell GT — the identifiable
    # opaque-surface regime real benchmark scenes live in. "volumetric":
    # the r2-r4 semi-transparent cloud; measured r5, it is NOT
    # identifiable from a few dozen views (train PSNR 31 / val 10.6 fog)
    # so val PSNR on it measures the scene, not the trainer.
    scene_kind = os.environ.get("QB_SCENE", "surface")
    # "pinhole" (default) or "spherical": the reference is a 360-first
    # app, so the equirect path gets its own quality row — cameras sit
    # INSIDE the surface shell looking out (a painted panorama sphere),
    # which is identifiable from few views since each pano sees
    # everything.
    cam_model = os.environ.get("QB_CAM", "pinhole")

    from splat_one_tpu.data.synthetic import make_synthetic_scene
    from splat_one_tpu.train.config import Config
    from splat_one_tpu.train.strategy import DefaultStrategyCfg
    from splat_one_tpu.train.trainer import Trainer

    t0 = time.time()
    scene, _ = make_synthetic_scene(
        n_gaussians=n_gauss, n_cameras=n_cams, width=width, height=height,
        n_points=4000, seed=0, surface=(scene_kind == "surface"),
        camera_model=cam_model,
    )
    print(f"scene built in {time.time() - t0:.1f}s "
          f"({n_cams} cams @ {width}x{height})", flush=True)
    cfg = Config(
        max_steps=steps,
        opacity_reg=float(os.environ.get("QB_OPA_REG", 0.0)),
        scale_reg=float(os.environ.get("QB_SCALE_REG", 0.0)),
        # normalized scene: cameras ~1 from origin, object surface ~0.67
        # away — 0.2 culls the near-field floater zone without touching
        # real content (the r5 floater investigation)
        near_plane=float(os.environ.get("QB_NEAR", 0.2)),
        eval_steps=[steps // 2, steps],
        save_steps=[steps],
        sh_degree=3,
        sh_degree_interval=max(steps // 8, 1),
        batch_size=1,
        test_every=8,
        # auto capacity = 4x the 4k seed points = 16k, which CAPS
        # densification below the GT splat count — a structural underfit
        # (r2's PSNR 15.6 row); give growth real headroom by default
        capacity=int(os.environ.get("QB_CAP", 65536)),
        result_dir="results/quality_bench",
        # CPU A/B (r2): 4x more splats at the same step budget did NOT move
        # PSNR — quality here is STEP-bound, not splat-bound; run with
        # QB_STEPS>=12000 for a quality-tier number
        strategy=DefaultStrategyCfg(
            refine_start_iter=steps // 10,
            refine_stop_iter=(3 * steps) // 4,
            # r4 A/B: steps//40 (=300 at 12k) starved growth — 12k steps
            # ended at 5.7k splats vs 40k GT (val PSNR 16.3, UNDERFIT);
            # gsplat's default cadence is 100
            refine_every=int(os.environ.get("QB_REFINE_EVERY", 100)),
            grow_grad2d=float(os.environ.get("QB_GROW_GRAD", 0.0002)),
            # opacity reset ON (gsplat default cadence): with it off, the
            # r3 12k-step run fit train views to PSNR 28.8 but collapsed
            # to 10.8 on held-out views — unpruned floaters overfit the
            # training rays
            reset_every=int(os.environ.get("QB_RESET", 3000)),
        ),
    )
    tr = Trainer(cfg, scene)
    t1 = time.time()
    hist = tr.train(log_every=max(steps // 20, 1))
    dt = time.time() - t1
    for h in hist:
        print("  ", h, flush=True)
    stats = tr.eval(steps, stage="final")

    # train-view fit quality (the achievable-optimum measure: GT images
    # came from a known gaussian scene) vs the held-out novel-view stats
    import jax
    import jax.numpy as jnp

    from splat_one_tpu.train import losses as L

    tpsnrs = []
    for i in tr.train_idx[:4]:
        b = tr._batch(np.array([i]))
        rgb, _, _ = tr._eval_render(
            tr.state, b["camtoworld"], b["K"], b["image_id"]
        )
        tpsnrs.append(float(L.psnr(rgb, b["image"])))
    out = {
        "width": width, "height": height, "gt_gaussians": n_gauss,
        "scene": scene_kind, "n_cams": n_cams, "camera_model": cam_model,
        "steps": steps, "train_s": round(dt, 1),
        "steps_per_s": round(steps / dt, 2),
        "final_loss": hist[-1]["loss"] if hist else None,
        "num_GS": stats["num_GS"],
        "psnr": stats["psnr"], "ssim": stats["ssim"],
        "train_view_psnr": round(float(np.mean(tpsnrs)), 2),
    }
    with open("results/quality_bench/stats/summary.json", "w") as f:
        json.dump(out, f, indent=1)
    print("QUALITY_BENCH " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
