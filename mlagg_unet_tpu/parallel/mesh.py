"""Device mesh / sharding helpers.

Replaces the reference's DDP plumbing (run_training.py:100-178 mp.spawn +
NCCL init; nnUNetTrainer.py:283-328 per-rank batch sharding). With GSPMD
there is no process-group management: one mesh, batch sharded on the 'data'
axis, XLA inserts the collectives. The reference's uneven per-rank
batch/oversample rebalancing disappears — oversampling is per-sample at
sampling time and the global batch is what the loss sees.

Multi-host: call jax.distributed.initialize() before creating the mesh
(initialize_distributed below gates on env, no-op single-host).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed() -> None:
    """Multi-host init (ICI/DCN). No-op unless a coordinator is configured."""
    if os.environ.get("MLAGG_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=os.environ["MLAGG_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ.get("MLAGG_NUM_PROCESSES", 1)),
            process_id=int(os.environ.get("MLAGG_PROCESS_ID", 0)),
        )


def get_data_mesh(num_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    sh = batch_sharding(mesh)
    return {
        k: (jax.device_put(v, sh) if hasattr(v, "shape") and
            getattr(v, "ndim", 0) > 0 else v)
        for k, v in batch.items()
    }
