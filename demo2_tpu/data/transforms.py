"""Image transforms (host-side, numpy/PIL) mirroring the reference pipeline.

Reference train pipeline (data/datasets/make_dataloader.py:188-196):
  Resize(bicubic) -> RandomHorizontalFlip(0.5) -> Pad(10) ->
  RandomCrop(size) -> ToTensor -> Normalize(mean=std=0.5) ->
  RandomErasing(p=0.5, mode='pixel', max_count=1)   (timm-style, :48-139)
Eval: Resize -> ToTensor -> Normalize (:198-202).

Transforms are applied independently per modality, exactly like the
reference's per-image `self.transform(img)` loop (bases.py:103-104).
Randomness flows through a numpy Generator so epochs are reproducible from a
seed (replacing torch RNG).
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import numpy as np
from PIL import Image


class TrainTransform:
    def __init__(
        self,
        size: Tuple[int, int] = (256, 128),
        flip_prob: float = 0.5,
        padding: int = 10,
        re_prob: float = 0.5,
        mean: Sequence[float] = (0.5, 0.5, 0.5),
        std: Sequence[float] = (0.5, 0.5, 0.5),
    ):
        self.size = tuple(size)
        self.flip_prob = flip_prob
        self.padding = padding
        self.re_prob = re_prob
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, img: Image.Image, rng: np.random.Generator) -> np.ndarray:
        h, w = self.size
        img = img.resize((w, h), Image.BICUBIC)
        if rng.random() < self.flip_prob:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        arr = np.asarray(img, np.float32) / 255.0  # (H, W, 3)
        p = self.padding
        arr = np.pad(arr, ((p, p), (p, p), (0, 0)))
        top = int(rng.integers(0, 2 * p + 1))
        left = int(rng.integers(0, 2 * p + 1))
        arr = arr[top : top + h, left : left + w]
        arr = (arr - self.mean) / self.std
        arr = random_erasing(arr, rng, probability=self.re_prob)
        return arr


class EvalTransform:
    def __init__(
        self,
        size: Tuple[int, int] = (256, 128),
        mean: Sequence[float] = (0.5, 0.5, 0.5),
        std: Sequence[float] = (0.5, 0.5, 0.5),
    ):
        self.size = tuple(size)
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, img: Image.Image, rng=None) -> np.ndarray:
        h, w = self.size
        img = img.resize((w, h), Image.BILINEAR)  # torchvision Resize default
        arr = np.asarray(img, np.float32) / 255.0
        return (arr - self.mean) / self.std


def random_erasing(
    arr: np.ndarray,
    rng: np.random.Generator,
    probability: float = 0.5,
    min_area: float = 0.02,
    max_area: float = 1.0 / 3.0,
    min_aspect: float = 0.3,
    max_attempts: int = 10,
) -> np.ndarray:
    """timm-style pixel-mode random erasing (reference: make_dataloader.py:48-139)."""
    if rng.random() > probability:
        return arr
    h, w, c = arr.shape
    area = h * w
    log_ratio = (math.log(min_aspect), math.log(1.0 / min_aspect))
    for _ in range(max_attempts):
        target = rng.uniform(min_area, max_area) * area
        aspect = math.exp(rng.uniform(*log_ratio))
        eh = int(round(math.sqrt(target * aspect)))
        ew = int(round(math.sqrt(target / aspect)))
        if eh < h and ew < w:
            top = int(rng.integers(0, h - eh + 1))
            left = int(rng.integers(0, w - ew + 1))
            arr[top : top + eh, left : left + ew] = rng.normal(
                size=(eh, ew, c)
            ).astype(np.float32)
            break
    return arr
