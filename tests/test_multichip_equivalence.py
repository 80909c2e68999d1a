"""Data-parallel numeric equivalence: 1-device vs 8-device meshes.

The correctness claim of data-parallel sharding (replacing the reference's
DDP all-reduce, engine/processor.py:34-37): the SAME global batch through
the jitted train step must produce numerically equal loss, updated params,
and BatchNorm batch statistics regardless of how many devices the batch is
sharded over — global-batch semantics, not per-shard.  Likewise the eval
step's embeddings.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-step 1-vs-8-device equivalence (the driver separately runs dryrun_multichip)

from demo2_tpu.data import make_dataloader
from demo2_tpu.engine import create_train_state
from demo2_tpu.engine.eval import build_eval_step
from demo2_tpu.engine.train import build_train_step
from demo2_tpu.models import make_model
from demo2_tpu.parallel import make_mesh


def _tree_allclose(a, b, rtol, atol, prefix=""):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for (path, la), lb in zip(fa, fb):
        np.testing.assert_allclose(
            np.asarray(la, np.float32), np.asarray(lb, np.float32),
            rtol=rtol, atol=atol,
            err_msg=f"{prefix}{jax.tree_util.keystr(path)}",
        )



def test_train_step_mesh_size_invariance(tiny_cfg):
    cfg = tiny_cfg
    cfg.MODEL.USE_SDTPS = True
    cfg.MODEL.USE_DGAF = True
    cfg.MODEL.DGAF_VERSION = "v3"
    cfg.SOLVER.IMS_PER_BATCH = 16
    # SGD: the update is linear in the gradient, so param tolerances measure
    # the all-reduce itself.  (Adam's first-step m/sqrt(v) ~ sign(grad)
    # amplifies reduction-order noise on near-zero grads into +-lr flips —
    # not a sharding property.)
    cfg.SOLVER.OPTIMIZER_NAME = "SGD"
    cfg.freeze()

    pipe, sampler, vpipe, nq, nc, cams, views = make_dataloader(cfg)
    model = make_model(cfg, nc, cams, views)
    batch = next(pipe.iter_batches(sampler.epoch_indices(0)[:16], seed=0))

    results = []
    for n_dev in (1, 8):
        state, tx, ctx, _ = create_train_state(
            cfg, model, jax.random.PRNGKey(0), batch, steps_per_epoch=4
        )
        mesh = make_mesh(n_dev)
        step = build_train_step(cfg, model, tx, ctx, mesh, donate=False)
        new_state, metrics = step(
            state,
            jnp.asarray(batch.images),
            jnp.asarray(batch.pids),
            jnp.asarray(batch.camids),
            jnp.asarray(batch.viewids),
            jax.random.PRNGKey(1),
        )
        results.append(
            {
                "loss": float(metrics["loss"]),
                "acc": float(metrics["acc"]),
                "params": jax.device_get(new_state.params),
                "batch_stats": jax.device_get(new_state.batch_stats),
            }
        )

    one, eight = results
    np.testing.assert_allclose(one["loss"], eight["loss"], rtol=1e-5)
    np.testing.assert_allclose(one["acc"], eight["acc"], rtol=1e-6)
    # Per-shard (instead of global-batch) semantics would diverge far beyond
    # these tolerances; what remains is reduction-order noise.
    _tree_allclose(one["params"], eight["params"], rtol=1e-4, atol=1e-6,
                   prefix="params")
    _tree_allclose(one["batch_stats"], eight["batch_stats"], rtol=1e-4,
                   atol=1e-5, prefix="batch_stats")



def test_eval_step_mesh_size_invariance(tiny_cfg):
    cfg = tiny_cfg
    cfg.MODEL.USE_SDTPS = True
    cfg.MODEL.USE_DGAF = True
    cfg.freeze()

    pipe, sampler, vpipe, nq, nc, cams, views = make_dataloader(cfg)
    model = make_model(cfg, nc, cams, views)
    batch = next(pipe.iter_batches(sampler.epoch_indices(0)[:8], seed=0))
    state, *_ = create_train_state(
        cfg, model, jax.random.PRNGKey(0), batch, steps_per_epoch=4
    )

    embs = []
    for n_dev in (1, 8):
        eval_step = build_eval_step(cfg, model, make_mesh(n_dev))
        emb = eval_step(
            state.params, state.batch_stats, jnp.asarray(batch.images),
            jnp.asarray(batch.camids), jnp.asarray(batch.viewids),
            jnp.ones((3,), jnp.float32), 3,
        )
        embs.append(np.asarray(emb))
    np.testing.assert_allclose(embs[0], embs[1], rtol=1e-4, atol=1e-5)
