"""Device-mesh construction for multi-chip SPMD training.

TPU-native replacement for the reference's distribution entry (SURVEY.md
§2c, §5.8: torch.distributed/NCCL via ``gsplat.distributed.cli``,
gsplat_trainer.py:944-998). The two process-group axes become a 2-D
``jax.sharding.Mesh``:

  - ``data``: camera batches sharded (the DDP analog); parameter
    gradients are ``psum``'d across it over ICI.
  - ``gauss``: splat parameter buffers (and Adam moments, strategy state,
    alive mask) sharded along the capacity dimension (the analog of
    gsplat's ``points[rank::world_size]`` model sharding).

The sharded TRAINING STEP itself lives in ``train.trainer`` (the mesh-
aware ``Trainer``): each device projects its local gaussian shard, the
projected screen-space fields rotate around a ``ppermute`` ring (config
``gauss_exchange="ring"``; ``all_gather`` optional), every device
composites only its supertile slab of the (camera, supertile) grid with
the stream Pallas kernels, and autodiff transposes the exchange into the
gradient reduction back to the owning shard. Standalone single-purpose
shardings live in ``parallel.tile_sharded`` (supertile slabs only) and
``parallel.ring_sharded`` (ring + slabs, no trainer state); multi-host
bring-up in ``parallel.multihost``.
"""

from __future__ import annotations

from jax.sharding import Mesh


def make_mesh(n_data: int, n_gauss: int, devices=None) -> Mesh:
    import jax
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_data * n_gauss, (
        f"need {n_data * n_gauss} devices, have {len(devices)}"
    )
    dev = np.asarray(devices[: n_data * n_gauss]).reshape(n_data, n_gauss)
    return Mesh(dev, ("data", "gauss"))
