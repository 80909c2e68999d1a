"""Multi-host (multi-process) data parallelism.

Reference equivalents: `data/datasets/sampler_ddp.py:117-201` (each DDP rank
computes the FULL deterministic PK order from a shared seed, then keeps its
own strided slice) and `engine/processor.py:146-148` (rank-0-only eval).

TPU-first redesign: under `jax.distributed.initialize()` every process sees
the GLOBAL device mesh but can only feed its *addressable* devices.  The
single source of truth for "which samples does host h feed" is the batch
sharding itself: `NamedSharding(mesh, P('data'))` assigns each device a
contiguous row-range of the global batch, and a host feeds exactly the union
of its addressable devices' rows.  Every host computes the same global PK
order from the shared (seed, epoch) — no gloo broadcast needed — slices its
rows per global batch, decodes only those images, and the global
`jax.Array` is assembled with `jax.make_array_from_single_device_arrays`.
Losses, BatchNorm statistics and gradients then see the full global batch
exactly as in the single-process path (XLA inserts the collectives), so
multi-host training is numerically identical to single-host — asserted by
tests/test_multihost.py.

Eval: all hosts extract features for their own rows; the eval step's output
is replicated (an in-graph all-gather over ICI), so every host materializes
the full feature matrix and computes identical CMC/mAP — symmetric
"rank-0" semantics without a host-side gather.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .mesh import batch_sharding


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs (rank 0)."""
    return jax.process_index() == 0


def host_batch_rows(mesh, global_batch: int) -> np.ndarray:
    """Global batch-row indices THIS process feeds under batch_sharding.

    Derived from the sharding's devices->index map so it stays correct for
    any device enumeration order (the analogue of the DDP rank slice,
    sampler_ddp.py:181-189, but driven by the actual array layout instead of
    an independently-maintained convention).
    """
    sh = batch_sharding(mesh)
    idx_map = sh.devices_indices_map((global_batch,))
    rows: List[int] = []
    for dev, idx in idx_map.items():
        if dev.process_index != jax.process_index():
            continue
        sl = idx[0]
        start = sl.start or 0
        stop = sl.stop if sl.stop is not None else global_batch
        rows.extend(range(start, stop))
    return np.asarray(sorted(rows), np.int64)


def make_global_array(mesh, local: np.ndarray, global_batch: int):
    """Assemble a batch-sharded global jax.Array from this host's rows.

    ``local`` holds this host's rows (in `host_batch_rows` order, i.e.
    ascending global row index).  Single-process this is a plain sharded
    device_put; multi-process each addressable device receives its slice and
    the global array is stitched with make_array_from_single_device_arrays.
    """
    sh = batch_sharding(mesh)
    global_shape = (global_batch,) + local.shape[1:]
    if jax.process_count() == 1 and local.shape[0] == global_batch:
        return jax.device_put(local, sh)
    rows = host_batch_rows(mesh, global_batch)
    assert local.shape[0] == len(rows), (local.shape, len(rows))
    pos = {int(r): i for i, r in enumerate(rows)}
    idx_map = sh.addressable_devices_indices_map(global_shape)
    bufs = []
    for dev, idx in idx_map.items():
        sl = idx[0]
        start = sl.start or 0
        stop = sl.stop if sl.stop is not None else global_batch
        lo = pos[start]
        bufs.append(jax.device_put(local[lo : lo + (stop - start)], dev))
    return jax.make_array_from_single_device_arrays(global_shape, sh, bufs)


from dataclasses import dataclass
from typing import Any


@dataclass
class GlobalBatch:
    """A global batch: sharded device arrays + host-side global metadata."""

    images: Any  # batch-sharded jax.Array (B, 3, H, W, 3)
    pids: Any  # batch-sharded int32 (B,)
    camids: Any
    viewids: Any
    valid: int  # unpadded global sample count
    meta_paths: list  # full global metadata (identical on every host)
    meta_pids: np.ndarray
    meta_camids: np.ndarray
    meta_viewids: np.ndarray


def iter_index_batches(mesh, order: np.ndarray, batch_size: int,
                       drop_last: bool = True, pad_last: bool = False):
    """Batch-sharded (B,) int32 index batches for the device-cache input path.

    Yields (idx_global_array, valid).  The only bytes each host transfers
    per step: its addressable devices' rows of the index vector.
    """
    order = np.asarray(order, np.int32)
    bs = batch_size
    rows = host_batch_rows(mesh, bs) if mesh is not None else np.arange(bs)
    n_full = len(order) // bs
    chunks = [(order[i * bs : (i + 1) * bs], bs) for i in range(n_full)]
    rem = order[n_full * bs :]
    if len(rem) and not drop_last:
        valid = len(rem)
        if pad_last:
            rem = np.concatenate([rem, np.full(bs - valid, rem[-1], np.int32)])
        chunks.append((rem, valid))
    for chunk, valid in chunks:
        if mesh is None:
            yield jnp.asarray(chunk), valid
        else:
            yield make_global_array(mesh, chunk[rows], bs), valid


class HostShardedBatches:
    """Host-sharded global-batch iterator over a TriModalDataPipe.

    Each host decodes ONLY its own rows of every global batch and assembles
    the batch-sharded global arrays; metadata (pids/camids/viewids) is global
    on every host (all hosts hold the full sample list).  Single-process it
    degrades to the plain pipeline with zero extra copies.
    """

    def __init__(self, pipe, mesh):
        self.pipe = pipe
        self.mesh = mesh
        self.global_batch = pipe.batch_size
        self.rows = host_batch_rows(mesh, self.global_batch)

    def _chunks(self, order: np.ndarray, drop_last: bool, pad_last: bool):
        bs = self.global_batch
        n_full = len(order) // bs
        for i in range(n_full):
            yield order[i * bs : (i + 1) * bs], bs
        rem = order[n_full * bs :]
        if len(rem) and not drop_last:
            valid = len(rem)
            if pad_last:
                rem = np.concatenate([rem, np.full(bs - valid, rem[-1])])
            yield rem, valid

    def _assemble(self, chunk: np.ndarray, valid: int, seed: int) -> GlobalBatch:
        # Host decodes only its rows; padding indices already applied.
        local = self.pipe._make_batch(
            chunk[self.rows], seed, pad_to=None, positions=self.rows
        )
        samples = self.pipe.samples
        meta = [samples[i] for i in chunk]
        pids = np.asarray([m[1] for m in meta], np.int32)
        camids = np.asarray([m[2] for m in meta], np.int32)
        viewids = np.asarray([m[3] for m in meta], np.int32)
        g = lambda a: make_global_array(self.mesh, a, self.global_batch)
        return GlobalBatch(
            images=g(local.images),
            pids=g(pids[self.rows]),
            camids=g(camids[self.rows]),
            viewids=g(viewids[self.rows]),
            valid=valid,
            meta_paths=[m[0] for m in meta],
            meta_pids=pids,
            meta_camids=camids,
            meta_viewids=viewids,
        )

    def iter_batches(
        self,
        order: np.ndarray,
        seed: int = 0,
        drop_last: bool = True,
        pad_last: bool = False,
        prefetch: int = 2,
    ):
        """Yields GlobalBatch; decode+transfer runs in a producer thread so
        input overlaps device compute (the multi-host analogue of
        engine.train.device_prefetch over the single-host pipe)."""
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=max(1, prefetch))
        stop = object()
        err: list = []

        def producer():
            try:
                for chunk, valid in self._chunks(np.asarray(order), drop_last, pad_last):
                    q.put(self._assemble(np.asarray(chunk), valid, seed))
            except BaseException as e:  # surfaced in the consumer
                err.append(e)
            finally:
                q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                if err:
                    raise err[0]
                break
            yield item
