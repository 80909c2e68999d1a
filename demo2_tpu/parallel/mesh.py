"""Device mesh + sharding helpers.

The reference scales with NCCL DDP (train_net.py:72-73, processor.py:34-37);
the TPU-native equivalent is a `jax.sharding.Mesh` with the batch sharded
over a 'data' axis and parameters replicated — XLA inserts the gradient
all-reduce over ICI automatically, and BatchNorm statistics are computed over
the GLOBAL batch (a jnp.mean over a sharded axis lowers to a psum), which is
strictly better-behaved than per-GPU BN in the reference.

Multi-host: `jax.distributed.initialize` + the per-host input slice in
parallel/multihost.py (each process feeds exactly its addressable devices'
rows of the global batch); single-host multi-chip needs no process groups
at all.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = -1, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()  # GLOBAL devices under jax.distributed
    if num_devices and num_devices > 0:
        if jax.process_count() > 1 and num_devices != len(devices):
            # A truncated mesh would leave some hosts' addressable devices
            # outside it, deadlocking collectives — multi-process always
            # runs the full global mesh.
            raise ValueError(
                f"make_mesh(num_devices={num_devices}) with "
                f"{jax.process_count()} processes: multi-host requires the "
                f"full global mesh ({len(devices)} devices)"
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put array leaves with the batch axis sharded over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
