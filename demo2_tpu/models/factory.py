"""Model factory (reference: modeling/make_model.py:1223-1237)."""

from __future__ import annotations

from ..config.defaults import Config
from .demo import DeMo, DeMoLegacy, DeMoParallel


def make_model(cfg: Config, num_class: int, camera_num: int, view_num: int = 0):
    arch = cfg.MODEL.ARCH
    if arch == "DeMo_Parallel":
        return DeMoParallel(cfg, num_class, camera_num, view_num)
    if arch == "DeMoBeiyong":
        return DeMoLegacy(cfg, num_class, camera_num, view_num)
    return DeMo(cfg, num_class, camera_num, view_num)
