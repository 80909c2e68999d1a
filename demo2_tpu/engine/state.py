"""Train state: params, BN stats, optimizer state, center-loss centers."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config.defaults import Config
from ..losses.losses import CenterLossState
from ..solver.optim import make_optimizer


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    centers: Optional[jnp.ndarray]
    center_opt_state: Any


def create_train_state(
    cfg: Config,
    model,
    rng: jax.Array,
    sample_batch,
    steps_per_epoch: int,
):
    """Initialize model variables + optimizer chain.

    Returns (state, tx, center_tx, lr_schedule).
    """
    images = jnp.asarray(sample_batch.images)
    cams = jnp.asarray(sample_batch.camids)
    views = jnp.asarray(sample_batch.viewids)
    init_rngs = {"params": rng, "dropout": rng, "gumbel": rng}
    # jit the init: un-jitted tracing dispatches hundreds of individual ops,
    # which is pathologically slow through a remote-compile TPU path.
    variables = jax.jit(
        lambda r, im, cm, vw: model.init(r, im, cm, vw, train=False)
    )(init_rngs, images, cams, views)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    tx, center_tx, schedule = make_optimizer(cfg, params, steps_per_epoch)
    # jit for the same reason as model.init above: eager optax init
    # dispatches one zeros_like PER PARAM LEAF (~300 round-trips), which
    # measured 167 s through the remote tunnel vs seconds jitted
    # (reports/logs/r5_bench_611_122617.log stage ladder).
    opt_state = jax.jit(tx.init)(params)

    centers = None
    center_opt_state = None
    if "center" in cfg.MODEL.METRIC_LOSS_TYPE:
        centers = CenterLossState.create(rng, model.num_classes, 2048).centers
        center_opt_state = center_tx.init(centers)

    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        centers=centers,
        center_opt_state=center_opt_state,
    )
    return state, tx, center_tx, schedule
