"""Checkpoint save/restore round trip + resume semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from demo2_tpu.data import make_dataloader
from demo2_tpu.engine import create_train_state
from demo2_tpu.engine.train import build_train_step
from demo2_tpu.models import make_model
from demo2_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint


def test_checkpoint_roundtrip_and_resume(tiny_cfg, tmp_path):
    cfg = tiny_cfg
    cfg.SOLVER.OPTIMIZER_NAME = "Adam"
    cfg.freeze()
    pipes = make_dataloader(cfg)
    train_pipe, sampler, _, _, nc, cams, views = pipes
    model = make_model(cfg, nc, cams, views)
    batch = next(train_pipe.iter_batches(sampler.epoch_indices(0), seed=0))
    state, tx, ctx, _ = create_train_state(
        cfg, model, jax.random.PRNGKey(0), batch, steps_per_epoch=2
    )
    step = build_train_step(cfg, model, tx, ctx, mesh=None, donate=False)
    args = (
        jnp.asarray(batch.images),
        jnp.asarray(batch.pids),
        jnp.asarray(batch.camids),
        jnp.asarray(batch.viewids),
    )
    for _ in range(3):
        state, _m = step(state, *args, jax.random.PRNGKey(1))
    assert int(state.step) == 3

    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, state, step=int(state.step))

    # Restore into a FRESH state: everything must round-trip exactly.
    fresh, *_ = create_train_state(
        cfg, model, jax.random.PRNGKey(42), batch, steps_per_epoch=2
    )
    restored = restore_checkpoint(ckpt_dir, fresh)
    assert int(restored.step) == 3
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(state.params),
        jax.tree_util.tree_leaves_with_path(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Optimizer state round-trips too (Adam moments).
    sa = jax.tree_util.tree_leaves(state.opt_state)
    sb = jax.tree_util.tree_leaves(restored.opt_state)
    for a, b in zip(sa, sb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Resuming continues identically to not having stopped.
    cont_direct, _ = step(state, *args, jax.random.PRNGKey(2))
    cont_restored, _ = step(restored, *args, jax.random.PRNGKey(2))
    la = jax.tree_util.tree_leaves(cont_direct.params)
    lb = jax.tree_util.tree_leaves(cont_restored.params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
