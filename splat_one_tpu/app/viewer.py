"""Interactive web viewer: WASD/QE fly-through over the jitted render fn.

Replaces the reference's interactive render stack (SURVEY.md §3.4:
GsplatManager key handling app/gsplat_manager.py:390-458, nerfview
CameraState + Runner._viewer_render_fn gsplat_trainer.py:916-940) with a
dependency-free HTTP server + HTML page: the browser sends camera state,
the server renders JPEG/PNG frames on the TPU. Supports the reference's
pinhole <-> spherical toggle (gsplat_manager.py:105-118).
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><title>splat-one-tpu viewer</title>
<style>body{margin:0;background:#111;color:#eee;font-family:monospace}
#hud{position:fixed;top:8px;left:8px}</style></head>
<body>
<img id="view" width="{W}" height="{H}"/>
<div id="hud">WASD move / QE up-down / arrows rotate / M toggle camera</div>
<script>
let pos=[0,0,-3], yaw=0, pitch=0, model="pinhole", busy=false;
async function refresh(){
  if(busy) return; busy=true;
  try{
    const q=`/render?x=${pos[0]}&y=${pos[1]}&z=${pos[2]}&yaw=${yaw}&pitch=${pitch}&model=${model}`;
    const r=await fetch(q); const b=await r.blob();
    document.getElementById('view').src=URL.createObjectURL(b);
  } finally { busy=false; }
}
document.addEventListener('keydown',e=>{
  const s=0.15, r=0.08;
  const fwd=[Math.sin(yaw),0,Math.cos(yaw)];
  const right=[Math.cos(yaw),0,-Math.sin(yaw)];
  if(e.key=='w'){pos=pos.map((p,i)=>p+fwd[i]*s);}
  if(e.key=='s'){pos=pos.map((p,i)=>p-fwd[i]*s);}
  if(e.key=='a'){pos=pos.map((p,i)=>p-right[i]*s);}
  if(e.key=='d'){pos=pos.map((p,i)=>p+right[i]*s);}
  if(e.key=='q'){pos[1]-=s;} if(e.key=='e'){pos[1]+=s;}
  if(e.key=='ArrowLeft'){yaw-=r;} if(e.key=='ArrowRight'){yaw+=r;}
  if(e.key=='ArrowUp'){pitch-=r;} if(e.key=='ArrowDown'){pitch+=r;}
  if(e.key=='m'){model=model=='pinhole'?'spherical':'pinhole';}
  refresh();
});
refresh(); setInterval(refresh, 2000);
</script></body></html>"""


class ViewerServer:
    """Serves a render function at /render and the HTML page at /."""

    def __init__(self, render_fn, width=640, height=480, port=8080):
        # render_fn(c2w [4,4], K [3,3], camera_model) -> rgb uint8 [H,W,3]
        self.render_fn = render_fn
        self.width = width
        self.height = height
        self.port = port

    def _make_handler(server_self):
        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                u = urlparse(self.path)
                if u.path == "/":
                    page = (
                        _PAGE.replace("{W}", str(server_self.width))
                        .replace("{H}", str(server_self.height))
                    )
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.end_headers()
                    self.wfile.write(page.encode())
                    return
                if u.path == "/render":
                    q = {
                        k: v[0] for k, v in parse_qs(u.query).items()
                    }
                    pos = np.array(
                        [float(q.get(k, 0)) for k in ("x", "y", "z")]
                    )
                    yaw = float(q.get("yaw", 0))
                    pitch = float(q.get("pitch", 0))
                    model = q.get("model", "pinhole")
                    cy, sy = np.cos(yaw), np.sin(yaw)
                    cp, sp = np.cos(pitch), np.sin(pitch)
                    R_yaw = np.array(
                        [[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]]
                    )
                    R_pitch = np.array(
                        [[1, 0, 0], [0, cp, -sp], [0, sp, cp]]
                    )
                    c2w = np.eye(4, dtype=np.float32)
                    c2w[:3, :3] = R_yaw @ R_pitch
                    c2w[:3, 3] = pos
                    f = 0.5 * server_self.width  # 90 deg fov (reference
                    # nerfview CameraState fov=90, gsplat_manager.py:352)
                    K = np.array(
                        [
                            [f, 0, server_self.width / 2],
                            [0, f, server_self.height / 2],
                            [0, 0, 1],
                        ],
                        np.float32,
                    )
                    rgb = server_self.render_fn(c2w, K, model)
                    from PIL import Image

                    buf = io.BytesIO()
                    Image.fromarray(rgb).save(buf, format="JPEG",
                                              quality=90)
                    self.send_response(200)
                    self.send_header("Content-Type", "image/jpeg")
                    self.end_headers()
                    self.wfile.write(buf.getvalue())
                    return
                self.send_response(404)
                self.end_headers()

        return Handler

    def serve_forever(self):
        httpd = ThreadingHTTPServer(
            ("0.0.0.0", self.port), self._make_handler()
        )
        print(f"viewer on http://localhost:{self.port}")
        httpd.serve_forever()

    def serve_background(self):
        t = threading.Thread(target=self.serve_forever, daemon=True)
        t.start()
        return t


def serve_workdir(workdir: str, port: int = 8080, ckpt: str = None):
    """Load the latest checkpoint in <workdir>/results and serve it."""
    import os

    import jax.numpy as jnp

    from splat_one_tpu.data.opensfm import Parser, to_scene_data
    from splat_one_tpu.train.config import Config
    from splat_one_tpu.train.trainer import Trainer

    parser = Parser(workdir)
    scene = to_scene_data(parser, max_images=2)
    cfg = Config(result_dir=os.path.join(workdir, "results"),
                 camera_model=scene.camera_model)
    tr = Trainer(cfg, scene)
    ckpt_dir = os.path.join(workdir, "results", "ckpts")
    if ckpt is None and os.path.isdir(ckpt_dir):
        # latest by STEP NUMBER ("ckpt_7000" sorts after "ckpt_30000"
        # lexicographically) and npz files only (orbax saves directories)
        import re as _re

        cands = []
        for f in os.listdir(ckpt_dir):
            m = _re.match(r"ckpt_(\d+).*\.npz$", f)
            if m:
                cands.append((int(m.group(1)), f))
        if cands:
            ckpt = os.path.join(ckpt_dir, max(cands)[1])
    if ckpt:
        tr.load_checkpoint(ckpt)

    def render_fn(c2w, K, model):
        rgb, _ = tr.render_view(c2w, K, camera_model=model)
        return (np.clip(rgb, 0, 1) * 255).astype(np.uint8)

    ViewerServer(render_fn, port=port).serve_forever()
