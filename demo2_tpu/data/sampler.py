"""PK identity sampler.

Reference: data/datasets/sampler.py:8-75 (`RandomIdentitySampler`: P ids x K
instances per batch, resample-with-replacement for small identities — the
structure batch-hard triplet mining depends on) and sampler_ddp.py:117-201
(the DDP variant whose gloo seed-broadcast is replaced here by a plain
shared integer seed + per-host strided slice, SURVEY §2.12).
"""

from __future__ import annotations

from collections import defaultdict
from typing import List, Sequence

import numpy as np


class RandomIdentitySampler:
    """Deterministic PK sampler driven by (seed, epoch)."""

    def __init__(self, data_source: Sequence, batch_size: int, num_instances: int, seed: int = 0):
        self.batch_size = batch_size
        self.num_instances = num_instances
        self.num_pids_per_batch = batch_size // num_instances
        self.seed = seed
        self.index_dic = defaultdict(list)
        for index, item in enumerate(data_source):
            self.index_dic[item[1]].append(index)
        self.pids = list(self.index_dic.keys())
        self.length = 0
        for pid in self.pids:
            num = max(len(self.index_dic[pid]), num_instances)
            self.length += num - num % num_instances

    def epoch_indices(self, epoch: int) -> np.ndarray:
        rng = np.random.default_rng((self.seed, epoch))
        batch_idxs_dict = defaultdict(list)
        for pid in self.pids:
            idxs = list(self.index_dic[pid])
            if len(idxs) < self.num_instances:
                idxs = list(rng.choice(idxs, size=self.num_instances, replace=True))
            rng.shuffle(idxs)
            chunk = []
            for idx in idxs:
                chunk.append(idx)
                if len(chunk) == self.num_instances:
                    batch_idxs_dict[pid].append(chunk)
                    chunk = []
        avai = list(self.pids)
        final: List[int] = []
        while len(avai) >= self.num_pids_per_batch:
            selected = list(rng.choice(len(avai), self.num_pids_per_batch, replace=False))
            chosen_pids = [avai[i] for i in selected]
            for pid in chosen_pids:
                final.extend(batch_idxs_dict[pid].pop(0))
                if not batch_idxs_dict[pid]:
                    avai.remove(pid)
        return np.asarray(final, np.int64)

    def __len__(self):
        return self.length


class SequentialSampler:
    """DATALOADER.SAMPLER='softmax' batch order.

    The reference's softmax branch builds a plain DataLoader with neither a
    sampler nor shuffle=True (make_dataloader.py:234-239), i.e. SEQUENTIAL
    dataset order every epoch.  Mirrored here with the same epoch_indices
    interface as RandomIdentitySampler; the one deviation is that the
    short tail batch is dropped (static XLA shapes need whole batches —
    the reference's CE-only recipe tolerates a ragged last batch).
    """

    def __init__(self, data_source: Sequence, batch_size: int):
        self.batch_size = batch_size
        n = len(data_source)
        self.length = n - n % batch_size

    def epoch_indices(self, epoch: int) -> np.ndarray:
        del epoch  # sequential order is epoch-invariant, like the reference
        return np.arange(self.length, dtype=np.int64)

    def __len__(self):
        return self.length
