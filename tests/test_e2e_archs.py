"""End-to-end smoke: every architecture trains a few steps and evaluates.

These are the CPU-runnable e2e tests the reference lacks entirely
(SURVEY §4) — each arch runs real train steps on the synthetic dataset over
the 8-device mesh and produces finite, decreasing loss plus a valid eval.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full e2e trainings per arch (minutes)

from demo2_tpu.data import make_dataloader
from demo2_tpu.engine import create_train_state
from demo2_tpu.engine.eval import build_eval_step, run_eval
from demo2_tpu.engine.train import build_train_step
from demo2_tpu.models import make_model
from demo2_tpu.parallel import make_mesh


def _train_some(cfg, steps=4):
    cfg.SOLVER.OPTIMIZER_NAME = "Adam"
    cfg.SOLVER.BASE_LR = 3.5e-4
    cfg.freeze()
    pipes = make_dataloader(cfg)
    train_pipe, sampler, val_pipe, num_query, nc, cams, views = pipes
    model = make_model(cfg, nc, cams, views)
    batch = next(train_pipe.iter_batches(sampler.epoch_indices(0), seed=0))
    state, tx, ctx, _ = create_train_state(
        cfg, model, jax.random.PRNGKey(0), batch, steps_per_epoch=4
    )
    mesh = make_mesh(8)
    step = build_train_step(cfg, model, tx, ctx, mesh, donate=False)
    args = (
        jnp.asarray(batch.images),
        jnp.asarray(batch.pids),
        jnp.asarray(batch.camids),
        jnp.asarray(batch.viewids),
    )
    losses = []
    for _ in range(steps):
        state, metrics = step(state, *args, jax.random.PRNGKey(1))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
    eval_step = build_eval_step(cfg, model, mesh)
    cmc, mAP = run_eval(cfg, eval_step, state, val_pipe, num_query)
    assert 0.0 <= mAP <= 1.0
    return losses


def test_e2e_demo_sdtps_dgaf(tiny_cfg):
    tiny_cfg.MODEL.USE_SDTPS = True
    tiny_cfg.MODEL.USE_DGAF = True
    _train_some(tiny_cfg)


def test_e2e_demo_parallel(tiny_cfg):
    tiny_cfg.MODEL.ARCH = "DeMo_Parallel"
    tiny_cfg.MODEL.USE_SDTPS = True
    tiny_cfg.MODEL.USE_DGAF = True
    _train_some(tiny_cfg)


def test_e2e_legacy_hdm_atm(tiny_cfg):
    tiny_cfg.MODEL.ARCH = "DeMoBeiyong"
    tiny_cfg.MODEL.HDM = True
    tiny_cfg.MODEL.ATM = True
    tiny_cfg.MODEL.HEAD = 8
    tiny_cfg.MODEL.USE_LIF = True
    _train_some(tiny_cfg)


def test_training_improves_map_on_hard_synthetic(tiny_cfg):
    """Quality signal: training must LEARN on the hard variant.

    Bar calibrated against the reference cross-check
    (tools/crosscheck_reference.py): the actual torch reference gains only
    ~+0.025 mAP in 12 tiny-config epochs, so a +0.02-in-5-epochs bar sat
    inside run-to-run noise (a 1-ulp LayerNorm associativity change flipped
    it).  Assert the robust pair instead: the epoch-avg loss drops
    substantially AND mAP does not degrade."""
    cfg = tiny_cfg
    cfg.DATASETS.NAMES = "SyntheticHard"
    cfg.MODEL.USE_SDTPS = True
    cfg.MODEL.USE_DGAF = True
    cfg.SOLVER.OPTIMIZER_NAME = "Adam"
    cfg.SOLVER.BASE_LR = 1e-3
    cfg.freeze()
    pipes = make_dataloader(cfg)
    train_pipe, sampler, val_pipe, num_query, nc, cams, views = pipes
    model = make_model(cfg, nc, cams, views)
    batch = next(train_pipe.iter_batches(sampler.epoch_indices(0), seed=0))
    state, tx, ctx, _ = create_train_state(
        cfg, model, jax.random.PRNGKey(0), batch, steps_per_epoch=4
    )
    eval_step = build_eval_step(cfg, model, mesh=None)
    _, map_before = run_eval(cfg, eval_step, state, val_pipe, num_query)

    step = build_train_step(cfg, model, tx, ctx, mesh=None, donate=False)
    epoch_losses = []
    for epoch in range(5):
        losses = []
        for b in train_pipe.iter_batches(sampler.epoch_indices(epoch), seed=epoch):
            state, _m = step(
                state,
                jnp.asarray(b.images),
                jnp.asarray(b.pids),
                jnp.asarray(b.camids),
                jnp.asarray(b.viewids),
                jax.random.PRNGKey(epoch),
            )
            losses.append(float(_m["loss"]))
        epoch_losses.append(sum(losses) / len(losses))
    _, map_after = run_eval(cfg, eval_step, state, val_pipe, num_query)
    assert all(np.isfinite(l) for l in epoch_losses), epoch_losses
    assert epoch_losses[-1] < epoch_losses[0] - 0.3, epoch_losses
    assert map_after > map_before - 0.02, (map_before, map_after)
