"""Multi-host runtime entry (SPMD across hosts over DCN + ICI).

TPU-native replacement for the reference's ``torchrun``/NCCL process-group
bootstrap (``gsplat.distributed.cli``, reference
utils/gsplat_utils/gsplat_trainer.py:944-998): one
``jax.distributed.initialize`` call per host process turns every jitted
computation in this package into a multi-host SPMD program — the SAME
mesh-aware ``Trainer`` / ``ring_sharded`` code paths run unchanged, with
XLA routing the gauss-axis collectives over ICI within a slice and the
data-axis psums over DCN when the mesh spans hosts.

Usage (one process per host, e.g. under a TPU pod launcher):

    from splat_one_tpu.parallel import multihost
    multihost.initialize()              # env-driven (TPU pods: automatic)
    mesh = multihost.global_mesh(n_data=..., n_gauss=...)
    trainer = Trainer(cfg, scene, mesh=mesh)

On TPU pods ``initialize()`` needs no arguments (coordinator discovery is
automatic); elsewhere pass ``coordinator_address``/``num_processes``/
``process_id`` or set the standard JAX_COORDINATOR_* environment
variables.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Idempotent ``jax.distributed.initialize`` wrapper.

    No-op when running single-process (no coordinator configured and not
    on a TPU pod runtime), so single-chip scripts can call it
    unconditionally."""
    global _initialized
    if _initialized:
        return
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    num_processes = num_processes if num_processes is not None else (
        int(env_np) if env_np else None
    )
    env_pid = os.environ.get("JAX_PROCESS_ID")
    process_id = process_id if process_id is not None else (
        int(env_pid) if env_pid else None
    )
    on_pod = bool(os.environ.get("TPU_WORKER_HOSTNAMES")) or bool(
        os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    )
    if coordinator_address is None and not on_pod:
        return  # single-process run
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        _initialized = True
    except (ValueError, RuntimeError):
        # pod-looking env vars without a real coordinator (e.g. a
        # single-chip dev box with TPU_* set): stay single-process
        pass


def global_mesh(n_data: int, n_gauss: int) -> Mesh:
    """(data x gauss) mesh over ALL processes' devices, laid out so the
    gauss axis (all_gather / psum_scatter of projected fields every step —
    the bandwidth-heavy collective) stays within a host's ICI domain and
    the data axis (one grad psum per step) crosses hosts over DCN."""
    devs = jax.devices()
    if len(devs) < n_data * n_gauss:
        raise ValueError(
            f"need {n_data * n_gauss} devices, have {len(devs)}"
        )
    # jax.devices() orders by (process, local id): reshaping (data, gauss)
    # row-major puts consecutive local devices on the gauss axis
    grid = np.asarray(devs[: n_data * n_gauss]).reshape(n_data, n_gauss)
    return Mesh(grid, ("data", "gauss"))


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    """True on the host that should write checkpoints/stats/logs."""
    return jax.process_index() == 0
