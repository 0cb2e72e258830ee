"""Streaming data path: disk-backed images + prefetch through the Trainer
(reference DataLoader semantics, gsplat_trainer.py:562-572)."""

import numpy as np
import pytest
from PIL import Image

from splat_one_tpu.data.streaming import StreamingImages
from splat_one_tpu.data.synthetic import make_synthetic_scene
from splat_one_tpu.train.config import Config
from splat_one_tpu.train.strategy import DefaultStrategyCfg
from splat_one_tpu.train.trainer import Trainer


def _write_images(tmp_path, images):
    paths = []
    for i, img in enumerate(images):
        p = tmp_path / f"im_{i:03d}.png"
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(p)
        paths.append(str(p))
    return paths


def test_streaming_images_surface(tmp_path, rng):
    imgs = rng.uniform(size=(10, 24, 32, 3)).astype(np.float32)
    paths = _write_images(tmp_path, imgs)
    st = StreamingImages(paths, 32, 24, cache_images=4)
    assert st.shape == (10, 24, 32, 3)
    one = st[3]
    assert one.shape == (24, 32, 3) and one.dtype == np.float32
    np.testing.assert_allclose(one, imgs[3], atol=2 / 255)
    batch = st[np.array([1, 5, 7])]
    assert batch.shape == (3, 24, 32, 3)
    st.prefetch(np.arange(10))
    _ = [st[i] for i in range(10)]
    assert st.cached_count <= 4  # LRU bound holds


def test_trainer_on_streaming_scene(tmp_path, rng):
    scene, _ = make_synthetic_scene(
        n_gaussians=300, n_cameras=6, width=48, height=48, n_points=150
    )
    paths = _write_images(tmp_path, scene.images)
    st = StreamingImages(paths, 48, 48, cache_images=3)
    scene = scene._replace(images=st)
    cfg = Config(
        max_steps=8, eval_steps=[8], save_steps=[], sh_degree=1,
        capacity=512, batch_size=2, test_every=6,
        result_dir=str(tmp_path / "out"),
        strategy=DefaultStrategyCfg(
            refine_start_iter=10_000, refine_stop_iter=10_001,
            refine_every=10_000, reset_every=10_000,
        ),
    )
    tr = Trainer(cfg, scene)
    hist = tr.train(log_every=4)
    assert np.isfinite([h["loss"] for h in hist]).all()
    stats = tr.eval(8)
    assert stats["psnr"] > 5
    assert st.cached_count <= 3
