"""Multi-host integration worker (not a test module).

Launched by tests/test_multihost.py as N separate processes, each holding
8//N virtual CPU devices, joined by `jax.distributed.initialize` into one
8-device global mesh.  Each worker runs the REAL `do_train` loop (which
feeds batches through parallel/multihost.HostShardedBatches) plus the eval
path, then dumps final params + metrics for the parent to compare against a
single-process 8-device run of the identical config.

Reference semantics being certified: data/datasets/sampler_ddp.py:117-201
(per-rank slice of a shared-seed PK order) and engine/processor.py:146-148
(rank-0 eval) — here every host computes identical metrics because the eval
features are replicated in-graph.
"""

import json
import sys


def build_cfg():
    from demo2_tpu.config import get_cfg_defaults

    cfg = get_cfg_defaults()
    cfg.MODEL.TRANSFORMER_TYPE = "ViT-B-16"
    cfg.MODEL.USE_SDTPS = True
    cfg.MODEL.USE_DGAF = True
    cfg.INPUT.SIZE_TRAIN = (32, 16)
    cfg.INPUT.SIZE_TEST = (32, 16)
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.USE_FLASH_ATTENTION = False
    cfg.TPU.BACKBONE_DEPTH = 2
    cfg.TPU.BACKBONE_WIDTH = 64
    cfg.TPU.BACKBONE_HEADS = 2
    cfg.SOLVER.IMS_PER_BATCH = 16
    cfg.DATALOADER.NUM_INSTANCE = 2
    cfg.TEST.IMS_PER_BATCH = 8
    cfg.DATALOADER.NUM_WORKERS = 2
    cfg.DATASETS.NAMES = "Synthetic"
    # SGD: updates linear in the gradient, so param tolerances measure the
    # input slicing + all-reduce, not Adam's sign-amplification of fp noise
    # (same rationale as tests/test_multichip_equivalence.py).
    cfg.SOLVER.OPTIMIZER_NAME = "SGD"
    cfg.SOLVER.MAX_EPOCHS = 2
    cfg.SOLVER.EVAL_PERIOD = 2
    cfg.SOLVER.LOG_PERIOD = 100
    cfg.freeze()
    return cfg


def run(out_path: str):
    """Train 2 epochs + eval with the current process topology; dump results."""
    import jax
    import numpy as np

    from demo2_tpu.data import make_dataloader
    from demo2_tpu.engine import create_train_state
    from demo2_tpu.engine.train import do_train

    from demo2_tpu.models import make_model

    cfg = build_cfg()
    train_pipe, sampler, val_pipe, num_query, nc, cams, views = make_dataloader(cfg)
    model = make_model(cfg, nc, cams, views)
    # Init batch: every process decodes the SAME full first batch (init only
    # shapes the params; values are irrelevant but determinism keeps it tidy).
    # Slice to exactly one batch of indices — feeding the full epoch would
    # leave the pipe's producer thread decoding ahead (same hazard fixed in
    # tools/train.py's init batch).
    batch = next(train_pipe.iter_batches(
        sampler.epoch_indices(0)[: cfg.SOLVER.IMS_PER_BATCH], seed=0
    ))
    state, tx, center_tx, schedule = create_train_state(
        cfg, model, jax.random.PRNGKey(0), batch,
        steps_per_epoch=max(1, len(sampler) // cfg.SOLVER.IMS_PER_BATCH),
    )

    # ONE step from the common init, dumped separately: the tight
    # cross-topology equivalence anchor.  Full-trajectory closeness across
    # topologies is chaotic — batch-hard mining flips on reduction-order
    # ulps (see the round-3 cross-check protocol) — so the parent asserts
    # step-1 params tightly and the multi-epoch runs via host bit-equality
    # + the mAP outcome band instead.
    from demo2_tpu.engine.train import build_train_step
    from demo2_tpu.parallel.mesh import make_mesh
    from demo2_tpu.parallel.multihost import HostShardedBatches

    mesh = make_mesh(cfg.TPU.NUM_DEVICES)
    step_fn = build_train_step(cfg, model, tx, center_tx, mesh, donate=False)
    gb = next(HostShardedBatches(train_pipe, mesh).iter_batches(
        sampler.epoch_indices(1)[: cfg.SOLVER.IMS_PER_BATCH], seed=1
    ))
    s1, _ = step_fn(state, gb.images, gb.pids, gb.camids, gb.viewids,
                    jax.random.PRNGKey(cfg.SOLVER.SEED))
    p1 = np.concatenate(
        [np.asarray(l, np.float32).ravel()
         for l in jax.tree_util.tree_leaves(jax.device_get(s1.params))]
    )
    np.save(out_path + ".step1.npy", p1)
    del s1, p1

    state, best = do_train(
        cfg, model, state, tx, center_tx, train_pipe, sampler, val_pipe,
        num_query, schedule=schedule,
    )
    flat = np.concatenate(
        [np.asarray(l, np.float32).ravel()
         for l in jax.tree_util.tree_leaves(jax.device_get(state.params))]
    )
    np.save(out_path + ".params.npy", flat)
    with open(out_path, "w") as f:
        json.dump(
            {
                "mAP": float(best["mAP"]),
                "rank1": float(best["Rank-1"]),
                "step": int(state.step),
                "process_index": jax.process_index(),
                "process_count": jax.process_count(),
                "local_devices": len(jax.local_devices()),
                "global_devices": jax.device_count(),
            },
            f,
        )


def main():
    pid, nprocs, port, out_path = sys.argv[1:5]
    import jax

    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=int(nprocs),
        process_id=int(pid),
    )
    run(out_path)


if __name__ == "__main__":
    main()
