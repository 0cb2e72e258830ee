"""BASELINE config 3: SfM at scale + BA iterations/s.

Stage "recon" (CPU backend — the incremental driver is a host loop of many
small jitted calls; the tunneled TPU pays ~28 ms per round trip):
  build an N-image synthetic spiral scene (textured-sphere ray tracer),
  run features -> pair selection -> matching -> tracks -> incremental
  reconstruction through the SAME app.pipeline stages the CLI uses, time
  each stage, report registration count + aligned camera-center error vs
  ground truth, and export the FINAL global bundle problem to npz.

Stage "ba" (default backend = the real TPU): load the exported problem and
time LM bundle-adjust iterations/s — the one long-running jitted while
loop the reference hands to Ceres (config.yaml:96-124).

  PYTHONPATH=... SFM_N=200 python scripts/sfm_scale_bench.py recon
  PYTHONPATH=... python scripts/sfm_scale_bench.py ba

Env: SFM_N (images), SFM_RES (px), SFM_WD (workdir), BA_ITERS.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

WD = os.environ.get("SFM_WD", "/tmp/sfm_scale")


def look_at_spiral(n, radius=2.0, fov_deg=60.0, W=256, H=256, turns=2.0,
                   z0=-0.6, z1=0.6):
    from splat_one_tpu.data.synthetic import look_at

    f = 0.5 * W / np.tan(np.radians(fov_deg) / 2)
    c2ws, Ks = [], []
    for i in range(n):
        a = 2 * np.pi * turns * i / n
        h = z0 + (z1 - z0) * i / max(n - 1, 1)
        eye = np.array(
            [radius * np.cos(a), h, radius * np.sin(a)], np.float64
        )
        c2ws.append(look_at(eye, np.zeros(3)))
        Ks.append(np.array(
            [[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32
        ))
    return np.stack(c2ws), np.stack(Ks)


def stage_recon():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from PIL import Image

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from test_app_pipeline import textured_sphere_images

    from splat_one_tpu.app import pipeline
    from splat_one_tpu.app.camera_models import CameraModelManager
    from splat_one_tpu.app.image_processing import ImageProcessor
    from splat_one_tpu.sfm import reconstruct as RC
    from splat_one_tpu.sfm.ba import _rodrigues

    n = int(os.environ.get("SFM_N", "200"))
    res = int(os.environ.get("SFM_RES", "256"))
    os.makedirs(os.path.join(WD, "images"), exist_ok=True)
    c2ws, Ks = look_at_spiral(n, W=res, H=res)
    np.save(os.path.join(WD, "gt_c2ws.npy"), c2ws)
    t = {}
    t0 = time.time()
    imgs = textured_sphere_images(c2ws, Ks, res, res)
    for i, im in enumerate(imgs):
        Image.fromarray((im * 255).astype(np.uint8)).convert("RGB").save(
            os.path.join(WD, "images", f"view_{i:03d}.png"))
    t["render_scene"] = time.time() - t0

    t0 = time.time()
    pipeline.extract_metadata(WD)
    mgr = CameraModelManager(WD)
    f_true = float(Ks[0][0, 0] / res)
    for cam_id in list(mgr.models):
        mgr.set_override(cam_id, focal=f_true)
    mgr.save()
    mgr.propagate_to_exif()
    t["metadata"] = time.time() - t0

    t0 = time.time()
    pipeline.detect_features(WD, max_keypoints=1500,
                             feature_process_size=res)
    t["features"] = time.time() - t0

    t0 = time.time()
    n_pairs = pipeline.match_features(
        WD, order_neighbors=8, vlad_neighbors=6)
    t["matching"] = time.time() - t0

    t0 = time.time()
    n_tracks = pipeline.create_tracks(WD)
    t["tracks"] = time.time() - t0

    t0 = time.time()
    stats = pipeline.reconstruct(WD)
    t["reconstruct"] = time.time() - t0

    # aligned camera-center error vs GT (similarity alignment)
    proc = ImageProcessor(WD)
    images = proc.list_images()
    import re

    with open(os.path.join(WD, "reconstruction.json")) as fjs:
        recons = json.load(fjs)
    rec = max(recons, key=lambda r: len(r["shots"]))
    centers, gts = [], []
    for name, shot in rec["shots"].items():
        i = int(re.findall(r"\d+", name)[0])
        rvec = np.asarray(shot["rotation"], np.float64)
        tvec = np.asarray(shot["translation"], np.float64)
        R = np.asarray(_rodrigues(jnp.asarray(rvec, jnp.float32)))
        centers.append(-R.T @ tvec)
        gts.append(c2ws[i][:3, 3])
    A = np.stack(centers)
    B = np.stack(gts)
    muA, muB = A.mean(0), B.mean(0)
    Hm = (A - muA).T @ (B - muB)
    U, S, Vt = np.linalg.svd(Hm)
    D = np.diag([1, 1, np.sign(np.linalg.det(Vt.T @ U.T))])
    R_al = Vt.T @ D @ U.T
    scale = np.trace(np.diag(S) @ D) / np.sum((A - muA) ** 2)
    err = np.linalg.norm(
        scale * (A - muA) @ R_al.T + muB - B, axis=-1)
    spread = np.linalg.norm(B - muB, axis=-1).mean()

    out = {
        "n_images": n, "res": res, "n_pairs": n_pairs,
        "n_tracks": n_tracks,
        "registered": len(rec["shots"]),
        "points": len(rec["points"]),
        "err_median_over_spread": float(np.median(err) / spread),
        "err_max_over_spread": float(err.max() / spread),
        "stage_seconds": {k: round(v, 1) for k, v in t.items()},
        # attempt-quality evidence (degeneracy / retention selection)
        "recon_report": {
            k: v for k, v in stats.items() if k != "steps"
        },
    }
    with open(os.path.join(WD, "recon_bench.json"), "w") as fjs:
        json.dump(out, fjs, indent=1)
    print("SFM_SCALE_RECON " + json.dumps(out), flush=True)

    # export the final global bundle problem for the TPU BA stage
    with open(os.path.join(WD, "tracks.json")) as fjs:
        tracks = [
            {int(k): int(v) for k, v in tr.items()} for tr in json.load(fjs)
        ]
    name_of = {int(re.findall(r"\d+", nm)[0]): nm
               for nm in rec["shots"]}
    bearings = {}
    for i, nm in enumerate(images):
        z = np.load(os.path.join(WD, "features", nm + ".features.npz"))
        bearings[i] = z["bearings"].astype(np.float32)
    cam_of_img = {}
    cams = []
    for name, shot in rec["shots"].items():
        i = int(re.findall(r"\d+", name)[0])
        cam_of_img[i] = len(cams)
        cams.append(np.concatenate([
            np.asarray(shot["rotation"], np.float32),
            np.asarray(shot["translation"], np.float32)]))
    pt_of_track = {}
    pts = []
    for tid_s, p in rec["points"].items():
        pt_of_track[int(tid_s)] = len(pts)
        pts.append(np.asarray(p["coordinates"], np.float32))
    cam_idx, pt_idx, brs = [], [], []
    for tid, tr in enumerate(tracks):
        if tid not in pt_of_track:
            continue
        for img, feat in tr.items():
            if img in cam_of_img:
                cam_idx.append(cam_of_img[img])
                pt_idx.append(pt_of_track[tid])
                brs.append(bearings[img][feat])
    np.savez(
        os.path.join(WD, "ba_problem.npz"),
        cams=np.stack(cams), points=np.stack(pts),
        cam_idx=np.asarray(cam_idx, np.int32),
        pt_idx=np.asarray(pt_idx, np.int32),
        bearings=np.stack(brs),
    )
    print(f"BA problem: {len(cams)} cams, {len(pts)} points, "
          f"{len(cam_idx)} edges -> {WD}/ba_problem.npz", flush=True)


def stage_ba():
    import jax
    import jax.numpy as jnp

    from splat_one_tpu.sfm.ba import BAConfig, build_problem, bundle_adjust

    z = np.load(os.path.join(WD, "ba_problem.npz"))
    cams = jnp.asarray(z["cams"])
    points = jnp.asarray(z["points"])
    C, P, E = cams.shape[0], points.shape[0], z["cam_idx"].shape[0]
    problem = build_problem(z["cam_idx"], z["pt_idx"], z["bearings"], C, P)
    iters = int(os.environ.get("BA_ITERS", "50"))
    cfg = BAConfig(max_iterations=iters)

    fn = jax.jit(lambda c, p: bundle_adjust(c, p, problem, cfg))
    c1, p1, info = fn(cams, points)
    jax.block_until_ready((c1, p1))  # compile + first run
    t0 = time.time()
    c1, p1, info = fn(cams + 1e-6, points)
    jax.block_until_ready((c1, p1))
    dt = time.time() - t0
    out = {
        "backend": jax.default_backend(),
        "cams": C, "points": P, "edges": E,
        "ba_iters": iters, "seconds": round(dt, 3),
        "ba_iters_per_s": round(iters / dt, 2),
        "initial_cost": float(info["initial_cost"]),
        "final_cost": float(info["final_cost"]),
    }
    print("SFM_SCALE_BA " + json.dumps(out), flush=True)
    with open(os.path.join(WD, "ba_bench.json"), "w") as fjs:
        json.dump(out, fjs, indent=1)


if __name__ == "__main__":
    stage = sys.argv[1] if len(sys.argv) > 1 else "recon"
    if stage == "recon":
        stage_recon()
    else:
        stage_ba()
