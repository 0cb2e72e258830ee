"""Profiling / tracing utilities (SURVEY.md §5.1).

The reference's only instrumentation is ad-hoc wall-clock logging
(app/gsplat_manager.py:336-388 per-render transfer/render/post timings;
torch.cuda.max_memory_allocated in stats). Here:

  - ``trace``: context manager around ``jax.profiler`` writing a TensorBoard
    -loadable trace (per-kernel timeline on TPU),
  - ``device_timer``: accurate step timing on the axon-tunneled TPU, where a
    host sync costs ~28 ms — iterates the jitted function inside one
    on-device ``fori_loop`` so a measurement pays a single round-trip,
  - ``memory_stats``: live/peak HBM usage per device (the
    ``torch.cuda.max_memory_allocated`` analog for the stats JSONs).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace("results/profile"):`` — view in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_timer(
    fn: Callable,
    *args,
    iters: int = 10,
    host_roundtrip_s: float = 0.028,
) -> float:
    """Seconds per call of ``fn(*args)`` (a jittable function returning a
    pytree), measured with an in-device iteration loop so tunnel latency is
    paid once. ``fn``'s first argument must be a float array (perturbed by
    an ulp-scale term to defeat CSE across iterations)."""

    def scalarize(out):
        leaves = [
            l for l in jax.tree.leaves(out)
            if hasattr(l, "dtype") and l.dtype.kind == "f"
        ]
        return sum(jnp.sum(l) for l in leaves) if leaves else 0.0

    @jax.jit
    def run(*a):
        def body(i, c):
            first = a[0] + (c * 1e-30).astype(a[0].dtype)
            return c + scalarize(fn(first, *a[1:])) * 1e-30

        return jax.lax.fori_loop(0, iters, body, 0.0)

    float(run(*args))  # compile + warm
    t0 = time.time()
    float(run(*args))
    return max((time.time() - t0 - host_roundtrip_s) / iters, 0.0)


def memory_stats() -> Dict[str, float]:
    """Per-device HBM usage in GiB (bytes_in_use / peak_bytes_in_use)."""
    out: Dict[str, float] = {}
    for i, d in enumerate(jax.devices()):
        try:
            ms = d.memory_stats()
        except (AttributeError, RuntimeError):
            continue
        if not ms:
            continue
        out[f"dev{i}_gib"] = ms.get("bytes_in_use", 0) / 2**30
        out[f"dev{i}_peak_gib"] = ms.get(
            "peak_bytes_in_use", ms.get("bytes_in_use", 0)
        ) / 2**30
    return out
