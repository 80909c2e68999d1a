"""Module cost comparator (reference: tools/compare_modules.py:1-351).

Reports parameter counts and forward FLOPs across module configurations
(Baseline / HDM+ATM / SDTPS / DGAF / SDTPS+DGAF), using XLA's cost model.

Usage: python tools/compare_modules.py [--tiny]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def build(cfg_mods, tiny):
    from demo2_tpu.config import get_cfg_defaults
    from demo2_tpu.models import make_model

    cfg = get_cfg_defaults()
    cfg.MODEL.TRANSFORMER_TYPE = "ViT-B-16"
    cfg.MODEL.SIE_COE = 1.0
    cfg.MODEL.ID_LOSS_WEIGHT = 0.25
    if tiny:
        cfg.INPUT.SIZE_TRAIN = (64, 32)
        cfg.TPU.BACKBONE_DEPTH = 2
        cfg.TPU.BACKBONE_WIDTH = 64
        cfg.TPU.BACKBONE_HEADS = 2
    if jax.default_backend() not in ("tpu", "axon"):
        cfg.TPU.USE_FLASH_ATTENTION = False
        cfg.TPU.COMPUTE_DTYPE = "float32"
    for k, v in cfg_mods.items():
        setattr(cfg.MODEL, k, v)
    cfg.freeze()
    return cfg, make_model(cfg, num_class=171, camera_num=6)


VARIANTS = {
    "Baseline": {},
    "HDM+ATM": {"HDM": True, "ATM": True, "HEAD": 4, "GLOBAL_LOCAL": True},
    "SDTPS": {"USE_SDTPS": True},
    "DGAFv3": {"USE_DGAF": True},
    "SDTPS+DGAFv3": {"USE_SDTPS": True, "USE_DGAF": True},
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tiny", action="store_true")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU platform (this box's bootstrap "
                             "pins JAX_PLATFORMS=axon; see tools/train.py)")
    args = parser.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from demo2_tpu.utils.profiling import count_params, model_flops

    print(f"{'variant':16s} {'params (M)':>12s} {'fwd GFLOPs':>12s}")
    for name, mods in VARIANTS.items():
        cfg, model = build(mods, args.tiny)
        h, w = cfg.INPUT.SIZE_TRAIN
        rng = jax.random.PRNGKey(0)
        images = jnp.zeros((1, 3, h, w, 3))
        cams = jnp.zeros((1,), jnp.int32)
        variables = model.init({"params": rng}, images, cams, train=False)
        n = count_params(variables["params"])
        try:
            cost = model_flops(model, variables, images, cams)
            gflops = cost["flops"] / 1e9
        except Exception as e:
            gflops = float("nan")
        print(f"{name:16s} {n / 1e6:12.2f} {gflops:12.2f}")


if __name__ == "__main__":
    main()
