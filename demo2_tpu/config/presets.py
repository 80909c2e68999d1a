"""Shared config presets for the perf/quality tooling.

The flagship benchmark configuration (DeMo SDTPS+DGAFv3 on CLIP ViT-B-16,
reference recipe configs/RGBNT201/DeMo_SDTPS_DGAF.yml + the TPU production
flags) was previously copy-pasted across bench.py / tools/quality_gate.py;
one definition here keeps "the gate measures the same path the bench
measures" true by construction.
"""

from __future__ import annotations


def apply_flagship(cfg, on_tpu: bool) -> None:
    """Flagship training recipe + the TPU production flags.

    bf16 Adam moment storage is on here (measured +8/+3 img/s, rounds 2-3)
    and off in config defaults (reference parity).
    """
    cfg.MODEL.TRANSFORMER_TYPE = "ViT-B-16"
    cfg.MODEL.USE_SDTPS = True
    cfg.MODEL.USE_DGAF = True
    cfg.MODEL.DGAF_VERSION = "v3"
    cfg.MODEL.ID_LOSS_WEIGHT = 0.25
    cfg.MODEL.TRIPLET_LOSS_WEIGHT = 1.0
    cfg.SOLVER.OPTIMIZER_NAME = "Adam"
    cfg.SOLVER.BASE_LR = 3.5e-4
    cfg.SOLVER.IMS_PER_BATCH = 64
    cfg.DATALOADER.NUM_INSTANCE = 8
    cfg.DATASETS.NAMES = "RGBNT201"
    cfg.TPU.DATA_CACHE = "device"
    cfg.TPU.COMPUTE_DTYPE = "bfloat16" if on_tpu else "float32"
    cfg.TPU.USE_FLASH_ATTENTION = on_tpu
    cfg.TPU.BF16_MOMENTS = on_tpu
    cfg.TPU.BF16_SECOND_MOMENT = on_tpu


def apply_tiny(cfg) -> None:
    """CPU-smoke shrink: tiny backbone + 64x32 images + small batches."""
    cfg.TPU.BACKBONE_DEPTH = 2
    cfg.TPU.BACKBONE_WIDTH = 64
    cfg.TPU.BACKBONE_HEADS = 2
    cfg.INPUT.SIZE_TRAIN = (64, 32)
    cfg.INPUT.SIZE_TEST = (64, 32)
    cfg.SOLVER.IMS_PER_BATCH = 16
    cfg.DATALOADER.NUM_INSTANCE = 2


def setup_compilation_cache(path: str = "/root/repo/.jax_cache") -> None:
    """Persistent XLA executable cache — remote compiles are minutes cold,
    seconds warm."""
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def apply_overrides(cfg, overrides, log=None) -> None:
    """Apply "SEC.KEY=value" strings (bench.py / quality_gate --set).

    Values are coerced to the current attribute's type (bool accepts
    1/true/yes/on, case-insensitive).
    """
    for ov in overrides:
        path, _, raw = ov.partition("=")
        sec, _, key = path.partition(".")
        node = getattr(cfg, sec)
        cur = getattr(node, key)
        if isinstance(cur, bool):
            val = raw.lower() in ("1", "true", "yes", "on")
        elif isinstance(cur, int):
            val = int(raw)
        elif isinstance(cur, float):
            val = float(raw)
        else:
            val = raw
        setattr(node, key, val)
        if log is not None:
            log(f"override: {sec}.{key} = {val!r}")
