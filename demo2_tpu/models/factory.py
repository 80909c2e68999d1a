"""Model factory (reference: modeling/make_model.py:1223-1237)."""

from __future__ import annotations

from ..config.defaults import Config
from .demo import DeMo, DeMoLegacy, DeMoParallel


def make_model(cfg: Config, num_class: int, camera_num: int, view_num: int = 0):
    if getattr(cfg.TPU, "INT8_MLP", "off") == "static":
        # The static activation scale is a rough 10/127 calibration estimate
        # (clip_vit.py) — perf-measurement only; activations beyond |10| clip
        # silently.  Quality runs use "dynamic" (per-tensor) or "off".
        import logging

        logging.getLogger("DeMo").warning(
            "TPU.INT8_MLP='static' uses an UNCALIBRATED activation scale — "
            "benchmark-only; use 'dynamic' (or 'off') for quality runs"
        )
    arch = cfg.MODEL.ARCH
    if arch == "DeMo_Parallel":
        return DeMoParallel(cfg, num_class, camera_num, view_num)
    if arch == "DeMoBeiyong":
        return DeMoLegacy(cfg, num_class, camera_num, view_num)
    return DeMo(cfg, num_class, camera_num, view_num)
