"""Step-by-step finiteness probe: replay the cross-check trajectory with the
REAL train step, checking grads / updates / opt-state / params after every
step, and report the first leaf to go non-finite."""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tests"))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from ref_loader import load_ref
from test_reference_parity import graft, randomize, torch_sd

from crosscheck_reference import build_cfg, render_data
from demo2_tpu.engine import create_train_state
from demo2_tpu.engine.train import build_train_step
from demo2_tpu.models import make_model
from demo2_tpu.utils.ref_convert import convert_demo

cfg = build_cfg()
train_batches, _, _, num_classes, camera_num = render_data(cfg)

ref_vit = load_ref("modeling.backbones.vit_pytorch")
ref_vit.Trans.load_param = lambda self, path: None
ref_mm = load_ref("modeling.make_model")
factory = getattr(ref_mm, "__factory_T_type")
tm = ref_mm.DeMo(num_classes, cfg, camera_num, 0, factory)
randomize(tm, seed=33)
sd0 = torch_sd(tm)

model = make_model(cfg, num_classes, camera_num)
sample = train_batches[0][0]
state, tx, center_tx, _ = create_train_state(
    cfg, model, jax.random.PRNGKey(0), sample, len(train_batches[0])
)
params, stats = convert_demo(sd0, cfg)
variables = graft(
    {"params": state.params, "batch_stats": state.batch_stats},
    params, stats, require_full_params=True, allow_missing_in_model=True,
)
state = state.replace(params=variables["params"],
                      batch_stats=variables["batch_stats"])

step = build_train_step(cfg, model, tx, center_tx, mesh=None, donate=False)
rng = jax.random.PRNGKey(42)


def nonfinite_leaves(tree, tag, limit=6):
    bad = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        if leaf is None or not hasattr(leaf, "dtype"):
            continue
        if not bool(jnp.all(jnp.isfinite(leaf))):
            bad.append(jax.tree_util.keystr(path))
            if len(bad) >= limit:
                break
    if bad:
        print(f"  !! non-finite in {tag}:")
        for b in bad:
            print(f"     {b}")
    return bool(bad)


def amax(tree):
    leaves = [l for l in jax.tree_util.tree_leaves(tree)
              if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)]
    return max(float(jnp.max(jnp.abs(l))) for l in leaves)


# Also build a grad-only fn to inspect raw grads at the breaking step.
from demo2_tpu.losses.losses import branch_weights, make_loss_fn

loss_fn_branch = make_loss_fn(cfg, model.num_classes)


def total_loss(params, batch_stats, images, pids, camids, viewids, rng_drop, rng_gumbel):
    out, _ = model.apply(
        {"params": params, "batch_stats": batch_stats},
        images, camids, viewids, None, train=True,
        rngs={"dropout": rng_drop, "gumbel": rng_gumbel},
        mutable=["batch_stats"],
    )
    branches = out["branches"]
    weights = branch_weights(cfg, branches.keys())
    total = 0.0
    for name, (logits, feat) in branches.items():
        total = total + weights[name] * loss_fn_branch(logits, feat, pids)
    for aux_name, aux_val in out["aux_loss"].items():
        total = total + aux_val
    return total


grad_fn = jax.jit(jax.grad(total_loss))

for epoch in range(1, 13):
    for i, batch in enumerate(train_batches[epoch - 1]):
        images = jnp.asarray(batch.images)
        pids = jnp.asarray(batch.pids)
        cams = jnp.asarray(batch.camids)
        views = jnp.asarray(batch.viewids)
        prev = state
        state, metrics = step(state, images, pids, cams, views, rng)
        loss = float(metrics["loss"])
        p_bad = not bool(
            all(bool(jnp.all(jnp.isfinite(l)))
                for l in jax.tree_util.tree_leaves(state.params))
        )
        print(f"e{epoch} s{i}: loss {loss:.4f} params_absmax {amax(state.params):.3e}"
              f" opt_absmax {amax(state.opt_state):.3e}", flush=True)
        if p_bad or not np.isfinite(loss):
            print("=== first break at this step; dissecting ===", flush=True)
            nonfinite_leaves(state.params, "new params")
            nonfinite_leaves(state.opt_state, "opt state")
            rng_drop, rng_gumbel = jax.random.split(
                jax.random.fold_in(rng, prev.step)
            )
            g = grad_fn(prev.params, prev.batch_stats, images, pids, cams,
                        views, rng_drop, rng_gumbel)
            if not nonfinite_leaves(g, "raw grads"):
                print("  raw grads all finite; absmax %.3e" % amax(g))
                nonfinite_leaves(prev.opt_state, "PREV opt state")
                nonfinite_leaves(prev.params, "PREV params")
            sys.exit(1)
print("no NaN in 12 epochs", flush=True)
