"""Localize the epoch-3-step-4 NaN: replay to the failing step, then grad
each branch/loss-component separately and report finiteness."""
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
from demo2_tpu.losses.losses import (
    batch_hard_triplet_loss,
    branch_weights,
    cross_entropy_label_smooth,
)
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

# Replay up to (but not including) epoch 3, step 3 (0-indexed step idx 3).
replay = [(1, i) for i in range(5)] + [(2, i) for i in range(5)] + [(3, 0), (3, 1), (3, 2)]
for ep, i in replay:
    batch = train_batches[ep - 1][i]
    state, metrics = step(
        state, jnp.asarray(batch.images), jnp.asarray(batch.pids),
        jnp.asarray(batch.camids), jnp.asarray(batch.viewids), rng,
    )
    print(f"replay e{ep} s{i}: loss {float(metrics['loss']):.4f}", flush=True)

bad = train_batches[2][3]  # epoch 3, step idx 3 (the one whose update NaNs)
images = jnp.asarray(bad.images)
pids = jnp.asarray(bad.pids)
cams = jnp.asarray(bad.camids)
views = jnp.asarray(bad.viewids)
rng_drop, rng_gumbel = jax.random.split(jax.random.fold_in(rng, state.step))


def forward(params):
    out, _ = model.apply(
        {"params": params, "batch_stats": state.batch_stats},
        images, cams, views, None, train=True,
        rngs={"dropout": rng_drop, "gumbel": rng_gumbel},
        mutable=["batch_stats"],
    )
    return out


out = forward(state.params)
for name, (logits, feat) in out["branches"].items():
    print(f"branch {name}: logits finite={bool(jnp.all(jnp.isfinite(logits)))} "
          f"feat finite={bool(jnp.all(jnp.isfinite(feat)))} "
          f"feat_absmax={float(jnp.max(jnp.abs(feat))):.3e}", flush=True)
for aux, val in out["aux_loss"].items():
    print(f"aux {aux}: {float(val):.5f}", flush=True)

weights = branch_weights(cfg, out["branches"].keys())


def check(tag, loss_fn):
    val, grads = jax.value_and_grad(loss_fn)(state.params)
    flat = jax.tree_util.tree_leaves(grads)
    bad_leaves = [
        "/".join(str(x) for x in path)
        for path, leaf in jax.tree_util.tree_flatten_with_path(grads)[0][:0]
    ]
    finite = all(bool(jnp.all(jnp.isfinite(l))) for l in flat)
    print(f"{tag}: value {float(val):.5f} grads_finite={finite}", flush=True)
    if not finite:
        for path, leaf in jax.tree_util.tree_leaves_with_path(grads):
            if not bool(jnp.all(jnp.isfinite(leaf))):
                print("   NaN grad at", jax.tree_util.keystr(path), flush=True)
                break


for name in out["branches"].keys():
    check(
        f"{name}:id",
        lambda p, n=name: cross_entropy_label_smooth(forward(p)["branches"][n][0], pids),
    )
    check(
        f"{name}:triplet",
        lambda p, n=name: batch_hard_triplet_loss(forward(p)["branches"][n][1], pids),
    )
