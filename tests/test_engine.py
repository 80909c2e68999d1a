"""Engine tests: train step over an 8-device mesh, eval loop, entry points."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from demo2_tpu.data import make_dataloader
from demo2_tpu.engine import create_train_state
from demo2_tpu.engine.eval import build_eval_step, run_eval
from demo2_tpu.engine.train import build_train_step
from demo2_tpu.models import make_model
from demo2_tpu.parallel import make_mesh


@pytest.fixture()
def setup(tiny_cfg):
    cfg = tiny_cfg
    cfg.MODEL.USE_SDTPS = True
    cfg.MODEL.USE_DGAF = True
    cfg.SOLVER.OPTIMIZER_NAME = "Adam"
    cfg.freeze()
    pipes = make_dataloader(cfg)
    train_pipe, sampler, val_pipe, num_query, num_classes, cam_num, view_num = pipes
    model = make_model(cfg, num_classes, cam_num, view_num)
    batch = next(train_pipe.iter_batches(sampler.epoch_indices(0), seed=0))
    state, tx, center_tx, schedule = create_train_state(
        cfg, model, jax.random.PRNGKey(0), batch, steps_per_epoch=4
    )
    return cfg, model, state, tx, center_tx, batch, val_pipe, num_query


def test_train_step_mesh_updates_state(setup):
    cfg, model, state, tx, center_tx, batch, _, _ = setup
    mesh = make_mesh(8)
    step = build_train_step(cfg, model, tx, center_tx, mesh, donate=False)
    new_state, metrics = step(
        state,
        jnp.asarray(batch.images),
        jnp.asarray(batch.pids),
        jnp.asarray(batch.camids),
        jnp.asarray(batch.viewids),
        jax.random.PRNGKey(1),
    )
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    # Parameters actually moved.
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, new_state.params
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0
    # BN running stats updated.
    bs_moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.batch_stats,
        new_state.batch_stats,
    )
    assert max(jax.tree_util.tree_leaves(bs_moved)) > 0


@pytest.mark.slow
def test_scan_steps_matches_python_loop(tiny_cfg):
    """K steps via the device-side `lax.scan` loop == K python-loop steps.

    SGD (updates linear in the gradients) keeps the comparison tight; Adam's
    m/sqrt(v) rescaling amplifies compile-order fp32 noise between the two
    programs far above the math difference being tested (which is zero).
    """
    cfg = tiny_cfg
    cfg.MODEL.USE_SDTPS = True
    cfg.MODEL.USE_DGAF = True
    cfg.SOLVER.OPTIMIZER_NAME = "SGD"
    cfg.freeze()
    pipes = make_dataloader(cfg)
    train_pipe, sampler, _, _, num_classes, cam_num, view_num = pipes
    model = make_model(cfg, num_classes, cam_num, view_num)
    batch = next(train_pipe.iter_batches(sampler.epoch_indices(0), seed=0))
    state, tx, center_tx, _ = create_train_state(
        cfg, model, jax.random.PRNGKey(0), batch, steps_per_epoch=4
    )
    mesh = make_mesh(8)
    im = jnp.asarray(batch.images)
    pid = jnp.asarray(batch.pids)
    cam = jnp.asarray(batch.camids)
    view = jnp.asarray(batch.viewids)
    rng = jax.random.PRNGKey(1)
    K = 3

    step = build_train_step(cfg, model, tx, center_tx, mesh, donate=False)
    s_loop = state
    for _ in range(K):
        s_loop, m_loop = step(s_loop, im, pid, cam, view, rng)

    step_k = build_train_step(
        cfg, model, tx, center_tx, mesh, donate=False, scan_steps=K
    )
    stack = lambda x: jnp.broadcast_to(x, (K,) + x.shape)
    s_scan, m_scan = step_k(
        state, stack(im), stack(pid), stack(cam), stack(view), rng
    )

    assert int(s_scan.step) == int(s_loop.step) == K
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5
        ),
        s_loop.params,
        s_scan.params,
    )


def test_train_step_loss_decreases(setup):
    cfg, model, state, tx, center_tx, batch, _, _ = setup
    step = build_train_step(cfg, model, tx, center_tx, mesh=None, donate=False)
    args = (
        jnp.asarray(batch.images),
        jnp.asarray(batch.pids),
        jnp.asarray(batch.camids),
        jnp.asarray(batch.viewids),
    )
    losses = []
    for i in range(6):
        state, metrics = step(state, *args, jax.random.PRNGKey(0))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]


def test_eval_runs_and_matches_numpy_protocol(setup):
    cfg, model, state, tx, center_tx, batch, val_pipe, num_query = setup
    eval_step = build_eval_step(cfg, model, mesh=None)
    cmc, mAP = run_eval(cfg, eval_step, state, val_pipe, num_query, return_pattern=3)
    assert 0.0 <= mAP <= 1.0
    assert cmc.ndim == 1 and np.all(np.diff(cmc) >= -1e-6)  # monotone CMC


@pytest.mark.slow
def test_graft_entry_dryrun():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "graft_entry", pathlib.Path(__file__).resolve().parents[1] / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
