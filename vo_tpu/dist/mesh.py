"""Device-mesh construction and distributed runtime init.

The reference has NO parallelism (single MATLAB process, SURVEY §2.3). This
module is the communication backend of the new engine: a named
``jax.sharding.Mesh`` over ICI/DCN; all collectives are XLA collectives
(psum/all_gather) emitted by shard_map/pjit — the NCCL/MPI analogue is the
JAX runtime itself.

Axes (MeshConfig.axis_names):
  "data"  — frame-parallel front-end batches (embarrassingly parallel).
  "model" — hypothesis shards (RANSAC) / landmark blocks (BA Schur reduction).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..config import MeshConfig


def make_mesh(cfg: MeshConfig | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if cfg is None:
        # Default: all devices on the model axis.
        shape = (1, n)
        names = ("data", "model")
    else:
        shape = (cfg.data, cfg.model)
        names = cfg.axis_names
        if cfg.data * cfg.model != n:
            # Fit: put the remainder on the model axis.
            shape = (cfg.data, n // cfg.data)
    dev = np.asarray(devices).reshape(shape)
    return Mesh(dev, names)


def init_distributed(coordinator: str | None = None, num_processes: int | None = None, process_id: int | None = None):
    """Multi-host bring-up (jax.distributed). No-op for single-process runs.

    On the CPU backend cross-process collectives need an explicit transport:
    gloo is selected automatically (the TPU backend uses ICI/DCN natively).
    Exercised for real by ``python -m vo_tpu.dist.multihost_smoke`` and
    tests/test_multihost.py (two actual processes).
    """
    if num_processes is None or num_processes <= 1:
        return
    # NB: must not touch jax.default_backend() here — that would initialize
    # the backends before jax.distributed.initialize. Decide from config/env.
    import os

    platforms = str(jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", ""))
    if "cpu" in platforms:
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass  # older jax: single transport only
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def sharded(mesh: Mesh, axis: str, dim: int = 0) -> NamedSharding:
    spec = [None] * (dim + 1)
    spec[dim] = axis
    return NamedSharding(mesh, PartitionSpec(*spec))
