"""Fast iteration on the saved failing state: jitted vs eager grads, per-loss
component, per-module-group finiteness map."""
import pathlib
import pickle
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tests"))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from crosscheck_reference import build_cfg
from demo2_tpu.losses.losses import (
    batch_hard_triplet_loss,
    branch_weights,
    cross_entropy_label_smooth,
)
from demo2_tpu.models import make_model

with open("/tmp/nan_state.pkl", "rb") as f:
    blob = pickle.load(f)

cfg = build_cfg()
model = make_model(cfg, blob["num_classes"], blob["camera_num"])
params = jax.tree_util.tree_map(jnp.asarray, blob["params"])
batch_stats = jax.tree_util.tree_map(jnp.asarray, blob["batch_stats"])
images = jnp.asarray(blob["images"])
pids = jnp.asarray(blob["pids"])
cams = jnp.asarray(blob["camids"])
views = jnp.asarray(blob["viewids"])
step_no = blob["step"]
print(f"loaded state at step {step_no}", flush=True)

rng = jax.random.PRNGKey(42)
rng_drop, rng_gumbel = jax.random.split(jax.random.fold_in(rng, step_no))


def forward(p):
    out, _ = model.apply(
        {"params": p, "batch_stats": batch_stats},
        images, cams, views, None, train=True,
        rngs={"dropout": rng_drop, "gumbel": rng_gumbel},
        mutable=["batch_stats"],
    )
    return out


def group_map(grads):
    """Finiteness per second-level module group."""
    agg = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(grads):
        keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        grp = "/".join(keys[:2])
        ok = bool(jnp.all(jnp.isfinite(leaf)))
        agg[grp] = agg.get(grp, True) and ok
    bad = sorted(g for g, ok in agg.items() if not ok)
    good = sorted(g for g, ok in agg.items() if ok)
    return bad, good


def loss_id(p):
    logits, _ = forward(p)["branches"]["dgaf"]
    return cross_entropy_label_smooth(logits, pids)


def loss_tri(p):
    _, feat = forward(p)["branches"]["dgaf"]
    return batch_hard_triplet_loss(feat, pids)


def loss_total(p):
    out = forward(p)
    logits, feat = out["branches"]["dgaf"]
    total = 2.0 * (0.25 * cross_entropy_label_smooth(logits, pids)
                   + 1.0 * batch_hard_triplet_loss(feat, pids))
    for _, v in out["aux_loss"].items():
        total = total + v
    return total


for tag, fn in (("total", loss_total), ("id", loss_id), ("tri", loss_tri)):
    for mode in ("jit", "eager"):
        g_fn = jax.jit(jax.grad(fn)) if mode == "jit" else jax.grad(fn)
        val = fn(params)
        g = g_fn(params)
        bad, good = group_map(g)
        print(f"{tag}/{mode}: loss {float(val):.5f} bad_groups={len(bad)}", flush=True)
        if bad:
            print("   bad:", bad[:12], flush=True)
            print("   good:", good[:20], flush=True)
