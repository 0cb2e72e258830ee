"""Repro/A-B harness for the 12-view-ring SfM accuracy regression.

Builds (once, cached in /tmp/sfm_scene) the same ray-traced textured-sphere
scene as tests/test_app_pipeline.py, runs the feature->match->tracks stages,
then re-runs ONLY incremental_reconstruct with env-tweakable config and
prints median/max aligned camera-center error as a fraction of ring spread.

Usage:  JAX_PLATFORMS=cpu python scripts/sfm_ring_repro.py
Env knobs: SFM_ANNEAL=1, SFM_FINAL_ITERS, SFM_OUTLIER, SFM_SEED ...
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# sitecustomize force-sets JAX_PLATFORMS=axon (the tunneled TPU) — an env
# var does NOT stick; config.update wins (same pattern as tests/conftest.py)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

WD = os.environ.get("SFM_WD", "/tmp/sfm_scene")


def build_scene():
    from PIL import Image

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tests"))
    from test_app_pipeline import textured_sphere_images

    from splat_one_tpu.app import pipeline
    from splat_one_tpu.app.camera_models import CameraModelManager
    from splat_one_tpu.data.synthetic import ring_cameras

    W = H = 256
    c2ws, Ks = ring_cameras(12, 2.0, -0.3, 60.0, W, H)
    np.save(os.path.join(WD, "gt_c2ws.npy"), np.stack(c2ws))
    # Cache stamp: scene params + feature/match/tracks source mtimes. A
    # mismatch rebuilds the cache so code changes can't silently reuse
    # stale features/matches (ADVICE r2).
    import hashlib
    sfm_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "splat_one_tpu", "sfm")
    h = hashlib.sha256(f"ring12 r2.0 z-0.3 fov60 {W}x{H} kp1500".encode())
    for fn in ("features.py", "matching.py", "tracks.py"):
        p = os.path.join(sfm_dir, fn)
        if os.path.exists(p):
            h.update(open(p, "rb").read())
    stamp = h.hexdigest()[:16]
    stamp_path = os.path.join(WD, "cache_stamp.txt")
    cached = os.path.exists(os.path.join(WD, "tracks.json"))
    if cached and (not os.path.exists(stamp_path)
                   or open(stamp_path).read().strip() != stamp):
        print(f"cache stamp mismatch — rebuilding scene in {WD}")
        os.remove(os.path.join(WD, "tracks.json"))
        cached = False
    if cached:
        print(f"using cached scene: {WD}")
    if not os.path.exists(os.path.join(WD, "tracks.json")):
        os.makedirs(os.path.join(WD, "images"), exist_ok=True)
        imgs = textured_sphere_images(c2ws, Ks, W, H)
        for i, im in enumerate(imgs):
            Image.fromarray((im * 255).astype(np.uint8)).convert("RGB").save(
                os.path.join(WD, "images", f"view_{i:02d}.png"))
        pipeline.extract_metadata(WD)
        mgr = CameraModelManager(WD)
        f_true = float(Ks[0][0, 0] / 256)
        for cam_id in list(mgr.models):
            mgr.set_override(cam_id, focal=f_true)
        mgr.save()
        mgr.propagate_to_exif()
        pipeline.detect_features(WD, max_keypoints=1500,
                                 feature_process_size=256)
        pipeline.match_features(WD)
        pipeline.create_tracks(WD)
        with open(stamp_path, "w") as f:
            f.write(stamp)
    return np.stack(c2ws)


def main():
    t0 = time.time()
    os.makedirs(WD, exist_ok=True)
    gt = build_scene()
    print(f"scene ready ({time.time()-t0:.1f}s)")

    from splat_one_tpu.app.image_processing import ImageProcessor
    from splat_one_tpu.sfm import reconstruct as RC
    from splat_one_tpu.sfm.rigs import _rvec_to_R

    proc = ImageProcessor(WD)
    images = proc.list_images()
    tracks = [
        {int(k): int(v) for k, v in tr.items()}
        for tr in json.load(open(os.path.join(WD, "tracks.json")))
    ]
    bearings = [
        np.load(os.path.join(WD, "features", n + ".features.npz"))
        ["bearings"].astype(np.float32)
        for n in images
    ]
    raw = json.load(open(os.path.join(WD, "matches", "matches.json")))
    idx_of = {n: i for i, n in enumerate(images)}
    counts = {}
    for k, m in raw.items():
        a, b = k.split("|")
        counts[(idx_of[a], idx_of[b])] = len(m)

    # default to the pipeline's resolution-aware threshold (what the e2e
    # test exercises); SFM_OUTLIER still overrides for A/Bs
    ang_res = [
        float(np.load(os.path.join(WD, "features", n + ".features.npz"))
              ["angular_res"])
        for n in images
    ]
    thr = 1.3 * float(np.median(ang_res))
    cfg = RC.ReconstructConfig(
        outlier_threshold=thr, ransac_threshold=min(1.3 * thr, 0.006)
    )
    for name, env, cast in [
        ("outlier_threshold", "SFM_OUTLIER", float),
        ("final_bundle_max_iterations", "SFM_FINAL_ITERS", int),
        ("bundle_interval", "SFM_BINTERVAL", int),
        ("local_bundle_enabled", "SFM_LOCAL_BA", lambda s: bool(int(s))),
        ("final_anneal", "SFM_ANNEAL", lambda s: bool(int(s))),
    ]:
        if env in os.environ and hasattr(cfg, name):
            setattr(cfg, name, cast(os.environ[env]))
    seed = int(os.environ.get("SFM_SEED", "0"))
    t0 = time.time()
    rec = RC.incremental_reconstruct(bearings, tracks, counts, cfg, seed=seed)
    print(f"reconstruct: {time.time()-t0:.1f}s  "
          f"registered {len(rec.poses)}/12  points {len(rec.points)}")

    # aligned center error vs GT (same math as the e2e test)
    A, B = [], []
    for i in range(12):
        if i not in rec.poses:
            continue
        pose = rec.poses[i]
        R = _rvec_to_R(pose[:3])
        B.append(-R.T @ pose[3:])
        A.append(gt[i][:3, 3])
    A, B = np.stack(A), np.stack(B)
    muA, muB = A.mean(0), B.mean(0)
    Hm = (A - muA).T @ (B - muB)
    U, s, Vt = np.linalg.svd(Hm)
    D = np.diag([1, 1, np.sign(np.linalg.det(U @ Vt))])
    R_al = U @ D @ Vt
    scale = np.trace(np.diag(s) @ D) / ((B - muB) ** 2).sum()
    err = np.linalg.norm(scale * (B - muB) @ R_al.T + muA - A, axis=-1)
    spread = np.linalg.norm(A - muA, axis=-1).mean()
    print(f"err/spread: median={np.median(err)/spread:.3f} "
          f"max={err.max()/spread:.3f}  (spread={spread:.3f})")
    print("per-cam:", np.round(err / spread, 3).tolist())
    final = [st for st in rec.report["steps"] if "bundle" in st]
    if final:
        print("final bundle cost:", final[-1].get("cost"))
    print("init_attempts:", rec.report.get("init_attempts"),
          " median_residual:", rec.report.get("median_residual"))
    loose = [st for st in rec.report["steps"] if st.get("loose")]
    deferred = [st for st in rec.report["steps"] if "deferred" in st]
    print(f"loose resections: {[st['resection'] for st in loose]}  "
          f"deferred: {[st['deferred'] for st in deferred]}")


if __name__ == "__main__":
    main()
