"""ctypes bindings + auto-build for the native C++ image loader.

The TPU compute path is JAX/Pallas; the *runtime around it* is native where
the reference's is (SURVEY.md L1/L2): ``native/loader.cpp`` is a C++ thread
pool doing JPEG/PNG decode (libjpeg/libpng), bilinear resize, radial
undistortion and float conversion — the role the reference's torch
DataLoader workers + cv2 play (gsplat_trainer.py:562-572). Python sees it
through a plain C ABI (pybind11 is not in this image; ctypes is).

Falls back to the PIL path transparently when the toolchain or libraries are
unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_SRC = os.path.join(_REPO_ROOT, "native", "loader.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libsplatloader.so")
_build_lock = threading.Lock()
_lib_handle = None
_build_failed = False


def _build() -> Optional[str]:
    if not os.path.exists(_SRC):
        # deployed without the native source tree: use a prebuilt .so if
        # present, else fall back (PIL path) instead of crashing
        return _LIB if os.path.exists(_LIB) else None
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(
        _SRC
    ):
        return _LIB
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-o", _LIB, _SRC, "-ljpeg", "-lpng", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired):
        return None


def get_lib():
    """Build (once) and load the shared library; None if unavailable."""
    global _lib_handle, _build_failed
    with _build_lock:
        if _lib_handle is not None:
            return _lib_handle
        if _build_failed:
            return None
        path = _build()
        if path is None:
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            # stale/mislinked .so (e.g. built without -ljpeg -lpng):
            # rebuild once with the correct flags, else give up cleanly
            try:
                os.remove(path)
            except OSError:
                pass
            path = _build()
            try:
                lib = ctypes.CDLL(path) if path else None
            except OSError:
                lib = None
            if lib is None:
                _build_failed = True
                return None
        lib.loader_create.argtypes = [ctypes.c_int]
        lib.loader_create.restype = ctypes.c_int
        lib.loader_destroy.argtypes = [ctypes.c_int]
        lib.loader_submit.argtypes = [
            ctypes.c_int, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.loader_submit.restype = ctypes.c_int
        lib.loader_wait.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.loader_wait.restype = ctypes.c_int
        _lib_handle = lib
        return lib


def available() -> bool:
    return get_lib() is not None


class NativeImageLoader:
    """Threaded prefetching image loader.

    ``submit`` queues a decode+resize(+undistort) into a caller-visible
    float32 ``[H, W, 3]`` buffer; ``wait`` blocks for completion. Typical
    use double-buffers the next training batch while the current one is on
    device.
    """

    def __init__(self, n_threads: int = 4):
        self._lib = get_lib()
        if self._lib is None:
            raise RuntimeError(
                "native loader unavailable (g++/libjpeg/libpng missing)"
            )
        self._id = self._lib.loader_create(n_threads)
        self._bufs = {}

    def submit(
        self,
        path: str,
        out_w: int,
        out_h: int,
        K: Optional[np.ndarray] = None,
        dist: Optional[np.ndarray] = None,
    ) -> int:
        buf = np.empty((out_h, out_w, 3), np.float32)
        fx = fy = cx = cy = k1 = k2 = 0.0
        if K is not None and dist is not None and np.any(
            np.abs(dist[:2]) > 1e-12
        ):
            fx, fy = float(K[0, 0]), float(K[1, 1])
            cx, cy = float(K[0, 2]), float(K[1, 2])
            k1, k2 = float(dist[0]), float(dist[1])
        ticket = self._lib.loader_submit(
            self._id, path.encode(), out_w, out_h,
            fx, fy, cx, cy, k1, k2,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        self._bufs[ticket] = buf
        return ticket

    def wait(self, ticket: int) -> np.ndarray:
        ok = self._lib.loader_wait(self._id, ticket)
        buf = self._bufs.pop(ticket)
        if not ok:
            raise IOError(f"native decode failed (ticket {ticket})")
        return buf

    def load_batch(self, paths, out_w, out_h, Ks=None, dists=None):
        tickets = [
            self.submit(
                p, out_w, out_h,
                None if Ks is None else Ks[i],
                None if dists is None else dists[i],
            )
            for i, p in enumerate(paths)
        ]
        return np.stack([self.wait(t) for t in tickets])

    def close(self):
        if self._id is not None:
            self._lib.loader_destroy(self._id)
            self._id = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
