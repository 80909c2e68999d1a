"""LoRA fine-tuning path: frozen backbone, trainable adapters + heads."""

import jax
import jax.numpy as jnp
import numpy as np

from demo2_tpu.data import make_dataloader
from demo2_tpu.engine import create_train_state
from demo2_tpu.engine.train import build_train_step
from demo2_tpu.models import make_model


def test_frozen_backbone_trains_only_lora_and_heads(tiny_cfg):
    cfg = tiny_cfg
    cfg.MODEL.FROZEN = True
    cfg.TPU.LORA_RANK = 2
    cfg.SOLVER.OPTIMIZER_NAME = "Adam"
    cfg.freeze()

    train_pipe, sampler, _, _, nc, cams, views = make_dataloader(cfg)
    model = make_model(cfg, nc, cams, views)
    batch = next(train_pipe.iter_batches(sampler.epoch_indices(0), seed=0))
    state, tx, ctx, _ = create_train_state(
        cfg, model, jax.random.PRNGKey(0), batch, steps_per_epoch=2
    )
    # LoRA params exist in the backbone.
    flat = jax.tree_util.tree_leaves_with_path(state.params)
    lora_paths = [p for p, _ in flat if any("lora" in str(k) for k in p)]
    assert lora_paths, "expected LoRA params in the frozen backbone"

    step = build_train_step(cfg, model, tx, ctx, mesh=None, donate=False)
    new_state, _ = step(
        state,
        jnp.asarray(batch.images),
        jnp.asarray(batch.pids),
        jnp.asarray(batch.camids),
        jnp.asarray(batch.viewids),
        jax.random.PRNGKey(1),
    )

    def moved(path, a, b):
        return float(jnp.max(jnp.abs(a - b)))

    for path, a in jax.tree_util.tree_leaves_with_path(state.params):
        b = a  # lookup in new tree
    old_flat = dict(jax.tree_util.tree_leaves_with_path(state.params))
    new_flat = dict(jax.tree_util.tree_leaves_with_path(new_state.params))
    frozen_moved, lora_moved, head_moved = 0.0, 0.0, 0.0
    for path, old in old_flat.items():
        delta = float(jnp.max(jnp.abs(new_flat[path] - old)))
        keys = [str(getattr(k, "key", k)) for k in path]
        # Only backbone/base is frozen; the wrapper-level cv_embed (SIE)
        # remains trainable, matching the reference's lora_train(self.base).
        if "backbone" in keys[0] and len(keys) > 1 and "base" in keys[1]:
            if any("lora" in k for k in keys):
                lora_moved = max(lora_moved, delta)
            else:
                frozen_moved = max(frozen_moved, delta)
        else:
            head_moved = max(head_moved, delta)
    assert frozen_moved == 0.0, "frozen backbone params must not move"
    assert lora_moved > 0.0, "LoRA params must train"
    assert head_moved > 0.0, "heads must train"
