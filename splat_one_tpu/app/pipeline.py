"""Workdir pipeline stages: images -> SfM -> reconstruction.json -> splats.

The framework's replacement for the reference's OpenSfM *actions* over the
filesystem workdir bus (SURVEY.md §1 L1, §2 N8):
``extract_metadata`` (main_app.py:335), ``detect_features``
(feature_extractor.py:284), ``match_features`` (feature_matching.py:76),
``create_tracks`` + ``reconstruct`` (point_cloud_visualizer.py:44-50).

Workdir layout (identical bus contract):
  images/            input images
  exif/<img>.exif    per-image metadata JSON
  camera_models.json (+ camera_models_overrides.json)
  features/<img>.features.npz
  matches/matches.json
  reconstruction.json  (OpenSfM-compatible: cameras/shots/points)
Progress is reported through callbacks instead of the reference's
file-count polling (SURVEY.md §7 "what NOT to rebuild as-is").
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Optional

import numpy as np

ProgressFn = Optional[Callable[[int, int], None]]


def _exif_dir(workdir):
    d = os.path.join(workdir, "exif")
    os.makedirs(d, exist_ok=True)
    return d


def extract_metadata(workdir: str, progress: ProgressFn = None) -> int:
    """images/ -> exif/*.exif + camera_models.json."""
    from splat_one_tpu.app import exif as exif_mod
    from splat_one_tpu.app.image_processing import ImageProcessor

    proc = ImageProcessor(workdir)
    images = proc.list_images()
    models: Dict[str, Dict] = {}
    mp = os.path.join(workdir, "camera_models.json")
    if os.path.exists(mp):
        with open(mp) as f:
            models = json.load(f)
    for i, name in enumerate(images):
        e = exif_mod.extract_exif(os.path.join(workdir, "images", name))
        cam_id = exif_mod.camera_id_from_exif(e)
        e["camera_id"] = cam_id
        if cam_id not in models:
            models[cam_id] = exif_mod.default_camera_model(e)
        with open(os.path.join(_exif_dir(workdir), name + ".exif"), "w") as f:
            json.dump(e, f, indent=2)
        if progress:
            progress(i + 1, len(images))
    with open(mp, "w") as f:
        json.dump(models, f, indent=2)
    return len(images)


def _load_exif(workdir, name):
    with open(os.path.join(workdir, "exif", name + ".exif")) as f:
        return json.load(f)


def _camera_for(workdir, exif):
    with open(os.path.join(workdir, "camera_models.json")) as f:
        models = json.load(f)
    ovp = os.path.join(workdir, "camera_models_overrides.json")
    if os.path.exists(ovp):
        with open(ovp) as f:
            for k, v in json.load(f).items():
                if k in models:
                    models[k].update(v)
    return models[exif["camera_id"]]


def detect_features(
    workdir: str,
    max_keypoints: int = 2048,
    feature_process_size: int = 1024,
    contrast_threshold: float = 0.01,
    feature_type: str = "SIFT",
    aliked_checkpoint: str | None = None,
    akaze_omax: int = 4,
    akaze_dthreshold: float = 0.001,
    akaze_descriptor: str = "MSURF",
    akaze_descriptor_size: int = 0,
    akaze_descriptor_channels: int = 3,
    akaze_kcontrast_percentile: float = 0.7,
    akaze_use_isotropic_diffusion: bool = False,
    surf_hessian_threshold: float = 3000.0,
    surf_n_octaves: int = 4,
    surf_n_octavelayers: int = 2,
    surf_upright: bool = False,
    hahog_peak_threshold: float = 1e-5,
    hahog_edge_threshold: float = 10.0,
    progress: ProgressFn = None,
) -> int:
    """images/ -> features/<img>.features.npz (xys in original pixels +
    normalized coords, descriptors, bearings from the camera model).

    ``feature_type`` mirrors the reference's classical menu
    (app/feature_extractor.py:68 / OpenSfM config.yaml:7): SIFT (the DoG
    detector, default), AKAZE (FED nonlinear diffusion scale space +
    Hessian detector + M-SURF/M-LDB, sfm.akaze — the akaze_* kwargs are
    the reference's config.yaml:26-33 params), ORB (FAST + rotated
    BRIEF, sfm.orb), HAHOG (Hessian detector + 128-D HOG descriptor,
    sfm.features.extract_hahog — hahog_* params are config.yaml:35-38;
    affine adaptation not implemented), ALIKED (learned;
    checkpoint-faithful when
    ``aliked_checkpoint`` is a converted npz), SURF (integral-image
    fast-Hessian + the shared M-SURF descriptor, sfm.surf — the surf_*
    kwargs are config.yaml:20-24). Full 6/6 classical menu parity."""
    import jax.numpy as jnp

    from splat_one_tpu.app.image_processing import ImageProcessor
    from splat_one_tpu.core import cameras as cam_mod
    from splat_one_tpu.sfm import features as F

    ft = feature_type.upper()
    if ft == "ALIKED":
        from splat_one_tpu.models import aliked_tpu

        aliked_params = aliked_tpu.load_aliked(aliked_checkpoint)
        aliked_faithful = "block1.conv1.weight" in aliked_params

    proc = ImageProcessor(workdir)
    images = proc.list_images()
    fdir = os.path.join(workdir, "features")
    os.makedirs(fdir, exist_ok=True)
    from PIL import Image

    for i, name in enumerate(images):
        exif = _load_exif(workdir, name)
        cam = _camera_for(workdir, exif)
        img = Image.open(os.path.join(workdir, "images", name)).convert("L")
        W0, H0 = img.size
        scale = 1.0
        if max(W0, H0) > feature_process_size:
            scale = feature_process_size / max(W0, H0)
            img = img.resize((int(W0 * scale), int(H0 * scale)))
        arr = np.asarray(img).astype(np.float32) / 255.0
        if ft == "SURF":
            from splat_one_tpu.sfm.surf import extract_surf

            feats = extract_surf(
                jnp.asarray(arr), max_keypoints=max_keypoints,
                hessian_threshold=surf_hessian_threshold,
                n_octaves=surf_n_octaves,
                n_layers=surf_n_octavelayers,
                upright=surf_upright)
        elif ft == "AKAZE":
            from splat_one_tpu.sfm.akaze import extract_akaze

            feats = extract_akaze(
                jnp.asarray(arr), max_keypoints=max_keypoints,
                omax=akaze_omax, dthreshold=akaze_dthreshold,
                descriptor=akaze_descriptor,
                descriptor_size=akaze_descriptor_size,
                descriptor_channels=akaze_descriptor_channels,
                kcontrast_percentile=akaze_kcontrast_percentile,
                isotropic=akaze_use_isotropic_diffusion)
        elif ft == "ORB":
            from splat_one_tpu.sfm.orb import extract_orb

            feats = extract_orb(jnp.asarray(arr),
                                max_keypoints=max_keypoints)
        elif ft == "HAHOG":
            from splat_one_tpu.sfm.features import extract_hahog

            feats = extract_hahog(
                jnp.asarray(arr), max_keypoints=max_keypoints,
                peak_threshold=hahog_peak_threshold,
                edge_threshold=hahog_edge_threshold)
        elif ft == "ALIKED":
            if aliked_faithful:
                feats = aliked_tpu.extract_aliked_ckpt(
                    aliked_params, jnp.asarray(arr),
                    max_keypoints=max_keypoints)
            else:
                feats = aliked_tpu.extract_aliked(
                    aliked_params, jnp.asarray(arr),
                    max_keypoints=max_keypoints)
        else:
            feats = F.extract_features(
                jnp.asarray(arr), max_keypoints=max_keypoints,
                contrast_threshold=contrast_threshold,
            )
        valid = np.asarray(feats.valid)
        xys = np.asarray(feats.xys) / scale  # original pixel coords
        # masks/<img>.png (value 0 = masked out, the OpenSfM convention the
        # reference's SAM2 stage writes, mask_manager.py:245-248): drop
        # keypoints inside masked regions so moving objects don't anchor SfM
        mask_path = os.path.join(workdir, "masks", name + ".png")
        if os.path.exists(mask_path):
            m = np.asarray(Image.open(mask_path).convert("L"))
            xi = np.clip(xys[:, 0].astype(int), 0, m.shape[1] - 1)
            yi = np.clip(xys[:, 1].astype(int), 0, m.shape[0] - 1)
            valid = valid & (m[yi, xi] > 127)
        # bearings from the camera model
        if cam["projection_type"] == "spherical":
            K = np.eye(3, dtype=np.float32)
            model = "spherical"
        else:
            f_norm = cam.get("focal")
            if f_norm is None:
                f_norm = exif.get("focal_ratio", 0.85)
            f = f_norm * max(W0, H0)
            K = np.array(
                [[f, 0, W0 / 2], [0, f, H0 / 2], [0, 0, 1]], np.float32
            )
            model = "pinhole"
        bearings = np.asarray(
            cam_mod.unproject(jnp.asarray(xys), jnp.asarray(K), W0, H0, model)
        )
        # angular size of one DETECTION pixel (keypoint localization is
        # ~1 detection px): spherical panoramas span 2pi over the processed
        # width; perspective uses the normalized focal. Drives the auto
        # reprojection-outlier threshold in reconstruct().
        proc_size = max(W0, H0) * scale
        if cam["projection_type"] == "spherical":
            ang_res = 2.0 * np.pi / max(W0 * scale, 1.0)
        else:
            f_norm = cam.get("focal")
            if f_norm is None:
                f_norm = exif.get("focal_ratio", 0.85)
            ang_res = 1.0 / max(f_norm * proc_size, 1.0)
        np.savez(
            os.path.join(fdir, name + ".features.npz"),
            xys=xys,
            descriptors=np.asarray(feats.descriptors),
            scores=np.asarray(feats.scores),
            valid=valid,
            bearings=bearings,
            width=W0,
            height=H0,
            angular_res=np.float32(ang_res),
        )
        if progress:
            progress(i + 1, len(images))
    return len(images)


def match_features(
    workdir: str,
    lowes_ratio: float = 0.8,
    order_neighbors: int = 0,
    gps_neighbors: int = 0,
    vlad_neighbors: int = 0,
    matching_type: str = "bruteforce",
    lightglue_checkpoint: str = None,
    progress: ProgressFn = None,
) -> int:
    """features/ -> matches/matches.json (robust-filtered pairs).

    ``matching_type`` mirrors the reference's matcher menu
    (app/feature_matching.py:96 — Brute-Force / FLANN / LIGHTGLUE):

    - "bruteforce" (default): batched mutual-NN + Lowe ratio, one
      descriptor matmul per pair on the MXU, vmapped over pairs.
    - "flann": accepted alias of the same exact path. FLANN exists to
      approximate NN search cheaply on CPUs; on the MXU the EXACT
      all-pairs matmul is already faster than approximate indexing, so
      the approximation would only lose matches.
    - "lightglue": learned attention matcher (models.lightglue_tpu) —
      the checkpoint-faithful official forward when a converted
      checkpoint is supplied (``lightglue_checkpoint`` or
      $SPLAT_LIGHTGLUE_CKPT), else the trainable LightGlue-style tier.
    """
    import jax

    from splat_one_tpu.app.image_processing import ImageProcessor
    from splat_one_tpu.sfm import matching as M

    proc = ImageProcessor(workdir)
    images = proc.list_images()
    feats = {}
    for name in images:
        z = np.load(
            os.path.join(workdir, "features", name + ".features.npz")
        )
        feats[name] = {k: z[k] for k in z.files}
    gps = None
    if gps_neighbors > 0:
        from splat_one_tpu.data.opensfm import latlon_to_utm

        pos = []
        zone = None  # one zone for the whole set (zone-boundary safety)
        has_gps = []
        for name in images:
            g = _load_exif(workdir, name).get("gps", {})
            if "latitude" in g:
                e, n, zone = latlon_to_utm(
                    g["latitude"], g["longitude"], zone
                )
                pos.append([e, n, g.get("altitude", 0.0)])
                has_gps.append(True)
            else:
                # no fix: exclude from the GPS criterion (a shared [0,0,0]
                # placeholder would cluster all no-GPS images together and
                # can even produce self-pairs under distance ties)
                pos.append([np.inf, np.inf, np.inf])
                has_gps.append(False)
        gps = np.asarray(pos)
        if not any(has_gps):
            gps = None
    pairs = M.pairs_to_match(
        len(images), order_neighbors=order_neighbors,
        gps_positions=gps, gps_neighbors=gps_neighbors,
        descriptors=(
            [feats[n]["descriptors"] for n in images]
            if vlad_neighbors > 0 else None
        ),
        desc_valids=(
            [feats[n]["valid"] for n in images]
            if vlad_neighbors > 0 else None
        ),
        vlad_neighbors=vlad_neighbors,
    )
    descs = [feats[n]["descriptors"] for n in images]
    valids = [feats[n]["valid"] for n in images]
    mt = matching_type.replace("-", "").replace("_", "").lower()
    if mt == "lightglue":
        from splat_one_tpu.models import lightglue_tpu as LG

        ckpt = lightglue_checkpoint or os.environ.get(
            "SPLAT_LIGHTGLUE_CKPT")
        params = LG.load_lightglue(
            ckpt, desc_dim=descs[0].shape[1])
        faithful = "input_proj.weight" in params
        raw = {}
        for npair, (i, j) in enumerate(pairs):
            fi, fj = feats[images[i]], feats[images[j]]
            size_i = (int(fi["width"]), int(fi["height"]))
            size_j = (int(fj["width"]), int(fj["height"]))
            if faithful:
                scores = LG.lightglue_forward_ckpt(
                    params, fi["xys"], fj["xys"],
                    fi["descriptors"], fj["descriptors"],
                    size_i, size_j)
                idx_b, ok = LG.filter_matches_ckpt(scores)
                ok = ok & fi["valid"] & fj["valid"][idx_b]
            else:
                idx_b, ok = LG.match_lightglue(
                    params, fi["descriptors"], fj["descriptors"],
                    fi["xys"], fj["xys"], size_i, size_j,
                    fi["valid"], fj["valid"])
            fm = np.stack(
                [np.flatnonzero(ok), np.asarray(idx_b)[ok]], axis=1)
            raw[(i, j)] = fm
            if progress:
                progress(npair + 1, len(pairs))
    else:
        if mt not in ("bruteforce", "flann"):
            raise ValueError(
                f"matching_type {matching_type!r}: expected "
                "Brute-Force | FLANN | LIGHTGLUE")
        raw = M.match_pairs_batched(
            descs, valids, pairs, ratio=lowes_ratio,
            progress_callback=progress
        )
    # resolution-aware verification threshold (same cure as reconstruct's
    # outlier_threshold, r3): the fixed 0.008 rad default is ~2 detection
    # pixels at 256 px / 60 deg — loose enough that contaminated matches
    # survive verification and warp the downstream bundle minimum
    ang = [float(feats[n]["angular_res"]) for n in images
           if "angular_res" in feats[n]]
    thr_match = min(1.6 * float(np.median(ang)), 0.008) if ang else 0.008
    bearings = [feats[n]["bearings"] for n in images]
    filtered = M.robust_filter_matches_batched(
        jax.random.PRNGKey(0), raw, bearings, threshold=thr_match,
    )
    out = {}
    for (i, j), fm in filtered.items():
        if len(fm):
            out[f"{images[i]}|{images[j]}"] = fm.tolist()
    os.makedirs(os.path.join(workdir, "matches"), exist_ok=True)
    with open(os.path.join(workdir, "matches", "matches.json"), "w") as f:
        json.dump(out, f)
    return len(out)


def create_tracks(workdir: str, min_track_length: int = 2) -> int:
    """matches/ -> tracks.json."""
    from splat_one_tpu.app.image_processing import ImageProcessor
    from splat_one_tpu.sfm import tracks as T

    proc = ImageProcessor(workdir)
    images = proc.list_images()
    idx_of = {n: i for i, n in enumerate(images)}
    with open(os.path.join(workdir, "matches", "matches.json")) as f:
        raw = json.load(f)
    matches = {}
    for k, m in raw.items():
        a, b = k.split("|")
        matches[(idx_of[a], idx_of[b])] = np.asarray(m, np.int64)
    n_feats = []
    for n in images:
        z = np.load(
            os.path.join(workdir, "features", n + ".features.npz")
        )
        n_feats.append(len(z["valid"]))
    tracks, _ = T.build_tracks(matches, n_feats, min_track_length)
    with open(os.path.join(workdir, "tracks.json"), "w") as f:
        json.dump(
            [{str(img): int(ft) for img, ft in tr.items()} for tr in tracks],
            f,
        )
    return len(tracks)


def reconstruct(workdir: str, progress: ProgressFn = None,
                live_viewer_port: int = 0,
                bundle_use_gps: bool = False,
                gps_sd_m: float = 5.0) -> Dict:
    """tracks + features -> incremental SfM -> reconstruction.json
    (OpenSfM-compatible so data.opensfm.Parser reads it directly).

    ``live_viewer_port`` > 0 serves the live point-cloud/camera view while
    reconstruction runs (reference app/point_cloud_visualizer.py live
    window). ``bundle_use_gps`` reads per-image EXIF GPS, converts to a
    local topocentric frame (UTM east/north + altitude, recentered) and
    enforces it inside every global bundle (config.yaml:132)."""
    import jax.numpy as jnp

    from splat_one_tpu.app.image_processing import ImageProcessor
    from splat_one_tpu.sfm import reconstruct as RC
    from splat_one_tpu.sfm.ba import _rodrigues

    proc = ImageProcessor(workdir)
    images = proc.list_images()
    with open(os.path.join(workdir, "tracks.json")) as f:
        tracks = [
            {int(k): int(v) for k, v in tr.items()} for tr in json.load(f)
        ]
    bearings = []
    ang_res = []
    for n in images:
        z = np.load(
            os.path.join(workdir, "features", n + ".features.npz")
        )
        bearings.append(z["bearings"].astype(np.float32))
        if "angular_res" in z.files:
            ang_res.append(float(z["angular_res"]))
    with open(os.path.join(workdir, "matches", "matches.json")) as f:
        raw = json.load(f)
    idx_of = {n: i for i, n in enumerate(images)}
    counts = {}
    for k, m in raw.items():
        a, b = k.split("|")
        counts[(idx_of[a], idx_of[b])] = len(m)
    viewer = None
    snapshot = None
    if live_viewer_port:
        from splat_one_tpu.app.recon_viewer import LiveReconViewer

        viewer = LiveReconViewer(port=live_viewer_port)
        url = viewer.serve_background()
        print(f"live reconstruction view: {url}")
        snapshot = viewer.update
    gps_positions = None
    cfg = RC.ReconstructConfig()
    if ang_res:
        # resolution-aware reprojection-outlier threshold: ~1.3 detection
        # pixels of angle. The old fixed 0.01 rad is ~2.5 px at 256 px /
        # 60 deg fov — loose enough that contaminated tracks warp the BA
        # minimum (r3 A/B: spiral median center error 0.47 -> 0.016 of
        # spread, ring 0.117 -> 0.018, both 100% registered).
        thr = 1.3 * float(np.median(ang_res))
        cfg = RC.ReconstructConfig(
            outlier_threshold=thr,
            ransac_threshold=min(1.3 * thr, 0.006),
        )
    if bundle_use_gps:
        from splat_one_tpu.data.opensfm import latlon_to_utm

        gps_positions = {}
        zone = None  # one zone for the whole set (zone-boundary safety)
        for i, name in enumerate(images):
            g = _load_exif(workdir, name).get("gps", {})
            if "latitude" in g:
                e, n, zone = latlon_to_utm(
                    g["latitude"], g["longitude"], zone
                )
                gps_positions[i] = np.asarray(
                    [e, n, g.get("altitude", 0.0)], np.float64
                )
        if len(gps_positions) >= 3:
            origin = np.mean(list(gps_positions.values()), axis=0)
            gps_positions = {
                i: (p - origin).astype(np.float32)
                for i, p in gps_positions.items()
            }
            cfg = RC.ReconstructConfig(bundle_use_gps=True,
                                       gps_sd_m=gps_sd_m)
        else:
            gps_positions = None
    rec = RC.incremental_reconstruct(
        bearings, tracks, counts, cfg=cfg, snapshot=snapshot,
        gps_positions=gps_positions,
    )

    # export OpenSfM-compatible reconstruction.json
    cameras = {}
    shots = {}
    for img_idx, pose in rec.poses.items():
        name = images[img_idx]
        exif = _load_exif(workdir, name)
        cam = _camera_for(workdir, exif)
        cam_key = exif["camera_id"]
        cameras[cam_key] = cam
        shots[name] = {
            "rotation": np.asarray(pose[:3]).tolist(),
            "translation": np.asarray(pose[3:]).tolist(),
            "camera": cam_key,
        }
    points = {
        str(tid): {
            "coordinates": np.asarray(xyz).tolist(),
            "color": [180, 180, 180],
        }
        for tid, xyz in rec.points.items()
    }
    recon = [{
        "cameras": cameras,
        "shots": shots,
        "points": points,
    }]
    with open(os.path.join(workdir, "reconstruction.json"), "w") as f:
        json.dump(recon, f)
    return rec.report


def train_splats(workdir: str, cfg=None, max_images: Optional[int] = None):
    """reconstruction.json + images -> 3DGS training (results/ under the
    workdir), completing the end-to-end reference workflow."""
    from splat_one_tpu.data.opensfm import Parser, to_scene_data
    from splat_one_tpu.train.config import Config
    from splat_one_tpu.train.trainer import Trainer

    parser = Parser(workdir)
    scene = to_scene_data(parser, max_images=max_images)
    cfg = cfg or Config()
    cfg.result_dir = os.path.join(workdir, "results")
    cfg.camera_model = scene.camera_model
    trainer = Trainer(cfg, scene)
    history = trainer.run()  # trains, or eval-only when cfg.ckpt is set
    return trainer, history


def create_masks(
    workdir: str,
    clicks_path: Optional[str] = None,
    checkpoint: Optional[str] = None,
    progress: ProgressFn = None,
) -> int:
    """Promptable masking stage (the reference's SAM2 masks tab,
    app/mask_manager.py): reads ``masks_clicks.json`` —
    ``{image_name: {"points": [[x, y], ...], "labels": [1, 0, ...]}}`` —
    runs the predictor, writes inverted masks to ``masks/<img>.png``."""
    import json as _json

    from splat_one_tpu.models.segmentation import build_predictor, save_mask

    clicks_path = clicks_path or os.path.join(workdir, "masks_clicks.json")
    if not os.path.exists(clicks_path):
        return 0
    with open(clicks_path) as f:
        clicks = _json.load(f)
    from PIL import Image

    pred = build_predictor(checkpoint)
    n = 0
    for i, (name, spec) in enumerate(sorted(clicks.items())):
        img_path = os.path.join(workdir, "images", name)
        if not os.path.exists(img_path):
            continue
        img = np.asarray(Image.open(img_path).convert("RGB"))
        pred.set_image(img)
        masks, scores, _ = pred.predict(
            np.asarray(spec["points"], np.float32),
            np.asarray(spec["labels"], np.int32),
        )
        best = int(np.argmax(np.asarray(scores)))
        save_mask(
            masks[best], os.path.join(workdir, "masks", name + ".png"),
            invert=True,
        )
        n += 1
        if progress:
            progress(i + 1, len(clicks))
    return n


def visualize_features(workdir: str, out_dir: Optional[str] = None) -> int:
    """Keypoint-overlay PNGs per image (the reference's feature preview,
    app/feature_extractor.py:440-459) -> ``previews/features/<img>.png``."""
    from PIL import Image, ImageDraw

    proc_dir = out_dir or os.path.join(workdir, "previews", "features")
    os.makedirs(proc_dir, exist_ok=True)
    from splat_one_tpu.app.image_processing import ImageProcessor

    n = 0
    for name in ImageProcessor(workdir).list_images():
        fpath = os.path.join(workdir, "features", name + ".features.npz")
        if not os.path.exists(fpath):
            continue
        z = np.load(fpath)
        img = Image.open(
            os.path.join(workdir, "images", name)
        ).convert("RGB")
        sx = img.width / float(z["width"])
        sy = img.height / float(z["height"])
        draw = ImageDraw.Draw(img)
        for (x, y), ok in zip(z["xys"], z["valid"]):
            if not ok:
                continue
            x, y = x * sx, y * sy
            draw.ellipse([x - 2, y - 2, x + 2, y + 2], outline=(0, 255, 0))
        img.save(os.path.join(proc_dir, name + ".png"))
        n += 1
    return n


def visualize_matches(workdir: str, image_a: str, image_b: str,
                      out_path: Optional[str] = None) -> str:
    """Side-by-side match visualization for one pair (the reference's
    match preview, app/feature_matching.py:395-431)."""
    from PIL import Image, ImageDraw

    with open(os.path.join(workdir, "matches", "matches.json")) as f:
        raw = json.load(f)
    key = f"{image_a}|{image_b}"
    key_r = f"{image_b}|{image_a}"
    if key in raw:
        pairs = np.asarray(raw[key], np.int64)
    elif key_r in raw:
        pairs = np.asarray(raw[key_r], np.int64)[:, ::-1]
    else:
        raise KeyError(f"no matches stored for pair {image_a}, {image_b}")
    za = np.load(os.path.join(workdir, "features",
                              image_a + ".features.npz"))
    zb = np.load(os.path.join(workdir, "features",
                              image_b + ".features.npz"))
    ia = Image.open(os.path.join(workdir, "images", image_a)).convert("RGB")
    ib = Image.open(os.path.join(workdir, "images", image_b)).convert("RGB")
    h = max(ia.height, ib.height)
    canvas = Image.new("RGB", (ia.width + ib.width, h))
    canvas.paste(ia, (0, 0))
    canvas.paste(ib, (ia.width, 0))
    draw = ImageDraw.Draw(canvas)
    sa = (ia.width / float(za["width"]), ia.height / float(za["height"]))
    sb = (ib.width / float(zb["width"]), ib.height / float(zb["height"]))
    for fa, fb in pairs[:500]:
        xa, ya = za["xys"][fa] * sa
        xb, yb = zb["xys"][fb] * sb
        draw.line([xa, ya, ia.width + xb, yb], fill=(0, 200, 0), width=1)
    out_path = out_path or os.path.join(
        workdir, "previews", f"matches_{image_a}_{image_b}.png"
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    canvas.save(out_path)
    return out_path


def estimate_depth(
    workdir: str,
    encoder: str = "vits",
    checkpoint: Optional[str] = None,
    equirect: bool = False,
    camera_aware: bool = False,
    progress: ProgressFn = None,
) -> int:
    """Per-image monocular depth stage (the reference's depth tab,
    app/tabs/depth_tab.py:92-123,173): writes ``depth/<img>_depth.npy`` +
    a colorized PNG per image. ``equirect`` enables the multi-crop
    panorama path; ``camera_aware`` routes each image through the
    camera-model-matched DAC path (fisheye images are resampled to an
    ERP patch through the calibrated distortion, spherical panoramas use
    the multi-crop stitch — reference README.md:63-71). Weight-gated:
    without a converted checkpoint the maps are the documented dummy
    fallback (depth_tab.py:178-186)."""
    from PIL import Image

    from splat_one_tpu.app.image_processing import ImageProcessor
    from splat_one_tpu.models.depth_tpu import (
        DepthAnythingTPU, save_depth_outputs,
    )

    model = DepthAnythingTPU(encoder=encoder, checkpoint=checkpoint)
    out_dir = os.path.join(workdir, "depth")
    images = ImageProcessor(workdir).list_images()
    for i, name in enumerate(images):
        rgb = np.asarray(
            Image.open(os.path.join(workdir, "images", name)).convert(
                "RGB")
        )
        bgr = rgb[..., ::-1]
        cam = None
        if camera_aware:
            exif = _load_exif(workdir, name)
            cam = _camera_for(workdir, exif)
        if cam is not None and cam["projection_type"] == "fisheye":
            H0, W0 = bgr.shape[:2]
            # calibrated focal first, then EXIF, then a sane wide default
            # (never evaluate exif["focal_ratio"] eagerly: EXIF without a
            # focal must not mask a calibrated camera model)
            f_norm = cam.get("focal")
            if f_norm is None:
                f_norm = exif.get("focal_ratio", 0.5)
            f = f_norm * max(W0, H0)
            # principal point from the camera model when calibrated
            # (normalized offsets from the image center, OpenSfM schema)
            cx = W0 / 2 + cam.get("c_x", 0.0) * max(W0, H0)
            cy = H0 / 2 + cam.get("c_y", 0.0) * max(W0, H0)
            K = np.array(
                [[f, 0, cx], [0, f, cy], [0, 0, 1]], np.float32)
            dist = np.array(
                [cam.get("k1", 0.0), cam.get("k2", 0.0),
                 cam.get("k3", 0.0), cam.get("k4", 0.0)])
            depth = model.infer_fisheye(bgr, K, dist=dist)
        elif equirect or (
                cam is not None
                and cam["projection_type"] == "spherical"):
            depth = model.infer_equirectangular(bgr)
        else:
            depth = model.infer_image(bgr)
        save_depth_outputs(depth, out_dir, os.path.splitext(name)[0])
        if progress:
            progress(i + 1, len(images))
    return len(images)
