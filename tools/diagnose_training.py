"""Training diagnostics (reference: diagnose_training.py:1-192).

Checks, on a tiny synthetic run:
  1. output format — every configured branch emits (logits, feat) with the
     expected shapes;
  2. gradient flow — gradients reach every trainable parameter group
     (notably the SDTPS scorers, the reference's original concern);
  3. value ranges — activations and losses are finite and sane;
  4. loss composition — per-branch losses and weights.

Usage: python tools/diagnose_training.py [--config_file CFG] [opts ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_file", default="", type=str)
    parser.add_argument("--tiny", action="store_true", default=True)
    parser.add_argument("--tpu", action="store_true",
                        help="run on the TPU backend (default: CPU — diagnostics"
                        " use un-jitted tiny graphs that dispatch op-by-op)")
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    args = parser.parse_args()

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    from demo2_tpu.config import get_cfg_defaults
    from demo2_tpu.losses.losses import branch_weights, make_loss_fn
    from demo2_tpu.models import make_model

    cfg = get_cfg_defaults()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    else:
        cfg.MODEL.TRANSFORMER_TYPE = "ViT-B-16"
        cfg.MODEL.USE_SDTPS = True
        cfg.MODEL.USE_DGAF = True
    cfg.merge_from_list(args.opts)
    if args.tiny:
        cfg.INPUT.SIZE_TRAIN = (32, 16)
        cfg.TPU.BACKBONE_DEPTH = 2
        cfg.TPU.BACKBONE_WIDTH = 64
        cfg.TPU.BACKBONE_HEADS = 2
        cfg.TPU.COMPUTE_DTYPE = "float32"
        cfg.TPU.USE_FLASH_ATTENTION = False
    cfg.freeze()

    num_classes, cams, b = 8, 4, 8
    model = make_model(cfg, num_classes, cams)
    h, w = cfg.INPUT.SIZE_TRAIN
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (b, 3, h, w, 3)) * 0.5
    pids = jnp.asarray(np.repeat(np.arange(4), 2), jnp.int32)
    camids = jnp.zeros((b,), jnp.int32)
    variables = model.init({"params": rng, "dropout": rng, "gumbel": rng},
                           images, camids, train=False)

    print("=" * 60)
    print("1. OUTPUT FORMAT")
    out, _ = model.apply(
        variables, images, camids, train=True,
        rngs={"dropout": rng, "gumbel": rng}, mutable=["batch_stats"],
    )
    weights = branch_weights(cfg, out["branches"].keys())
    for name, (logits, feat) in out["branches"].items():
        print(f"  branch {name:12s} logits{tuple(logits.shape)} feat{tuple(feat.shape)} "
              f"weight={weights[name]}")
    for name, v in out["aux_loss"].items():
        print(f"  aux    {name:12s} value={float(v):.4f}")
    print(f"  embedding {tuple(out['embedding'].shape)}")

    print("=" * 60)
    print("2. GRADIENT FLOW")
    loss_fn = make_loss_fn(cfg, num_classes)

    def total_loss(params):
        o, _ = model.apply(
            {"params": params, "batch_stats": variables.get("batch_stats", {})},
            images, camids, train=True,
            rngs={"dropout": rng, "gumbel": rng}, mutable=["batch_stats"],
        )
        t = 0.0
        for nm, (lg, ft) in o["branches"].items():
            t = t + weights[nm] * loss_fn(lg, ft, pids)
        for v in o["aux_loss"].values():
            t = t + v
        return t

    grads = jax.grad(total_loss)(variables["params"])
    dead, total = [], 0
    groups = {}
    for path, g in jax.tree_util.tree_leaves_with_path(grads):
        total += 1
        top = str(getattr(path[0], "key", path[0]))
        gmax = float(jnp.max(jnp.abs(g)))
        groups[top] = max(groups.get(top, 0.0), gmax)
        if gmax == 0.0:
            dead.append("/".join(str(getattr(k, "key", k)) for k in path))
    for top, gmax in sorted(groups.items()):
        status = "OK " if gmax > 0 else "DEAD"
        print(f"  [{status}] {top:24s} max|grad| = {gmax:.3e}")
    print(f"  {total - len(dead)}/{total} parameters receive gradient")
    if dead:
        print("  zero-gradient params (expected for e.g. unused branches):")
        for d in dead[:10]:
            print(f"    - {d}")

    print("=" * 60)
    print("3. VALUE RANGES")
    emb = out["embedding"]
    print(f"  embedding: finite={bool(jnp.isfinite(emb).all())} "
          f"mean={float(emb.mean()):.4f} std={float(emb.std()):.4f}")
    loss_val = total_loss(variables["params"])
    print(f"  total loss: {float(loss_val):.4f} finite={bool(jnp.isfinite(loss_val))}")
    print("=" * 60)
    print("DIAGNOSIS COMPLETE")


if __name__ == "__main__":
    main()
