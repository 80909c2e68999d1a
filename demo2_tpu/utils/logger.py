"""Timestamped stdout + file logger (reference: utils/logger.py:9-58)."""

from __future__ import annotations

import logging
import os
import sys
import time


def setup_logger(name: str = "DeMo", save_dir: str = "", if_train: bool = True):
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.propagate = False
    if logger.handlers:
        return logger

    formatter = logging.Formatter("%(asctime)s %(name)s %(levelname)s: %(message)s")
    sh = logging.StreamHandler(stream=sys.stdout)
    sh.setFormatter(formatter)
    logger.addHandler(sh)

    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        stamp = time.strftime("%Y%m%d_%H%M%S")
        mode = "train" if if_train else "test"
        fh = logging.FileHandler(os.path.join(save_dir, f"{mode}_log_{stamp}.txt"))
        fh.setFormatter(formatter)
        logger.addHandler(fh)
    return logger
