"""Interactive mask UI server (app.mask_ui) — the web equivalent of the
reference masks tab (app/mask_manager.py:226-248)."""

import json
import os
import urllib.request

import numpy as np
import pytest

pytest.importorskip("PIL")


@pytest.fixture
def workdir(tmp_path):
    from PIL import Image

    d = tmp_path / "wd"
    (d / "images").mkdir(parents=True)
    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 60, (48, 64, 3))).astype(np.uint8)
    img[10:30, 20:40] = [220, 40, 40]  # bright object to segment
    Image.fromarray(img).save(d / "images" / "a.jpg")
    return str(d)


def test_mask_ui_predict_and_save(workdir):
    from splat_one_tpu.app.mask_ui import MaskUIServer
    from splat_one_tpu.app import pipeline

    srv = MaskUIServer(workdir, port=0)  # ephemeral port
    srv.serve_background()
    port = srv.httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"

    names = json.loads(urllib.request.urlopen(base + "/images").read())
    assert names == ["a.jpg"]

    page = urllib.request.urlopen(base + "/").read().decode()
    assert "shift+click" in page

    spec = json.dumps({
        "name": "a.jpg",
        "points": [[30.0, 20.0], [5.0, 5.0]],
        "labels": [1, 0],
    }).encode()
    png = urllib.request.urlopen(
        urllib.request.Request(base + "/predict", data=spec)).read()
    assert png[:4] == b"\x89PNG"

    urllib.request.urlopen(
        urllib.request.Request(base + "/save", data=spec)).read()
    mask_path = os.path.join(workdir, "masks", "a.jpg.png")
    assert os.path.exists(mask_path)
    clicks = json.load(open(os.path.join(workdir, "masks_clicks.json")))
    assert clicks["a.jpg"]["labels"] == [1, 0]

    # the saved mask ignores (0) the clicked object — OpenSfM convention
    from PIL import Image

    m = np.asarray(Image.open(mask_path))
    assert m[20, 30] == 0
    assert m[5, 5] == 255

    # headless replay through the batch stage reproduces the mask
    os.remove(mask_path)
    n = pipeline.create_masks(workdir)
    assert n == 1 and os.path.exists(mask_path)
    srv.httpd.shutdown()
