"""ctypes bindings for the native C++ data-loader core.

Replaces the per-image PIL hot path (decode/resize/augment) with
native/libd2tloader.so when available; the pure-Python pipeline remains the
fallback (and the determinism reference).  Python still DECIDES every random
augmentation parameter — the native side only executes pixel work — so the
(seed, epoch) schedule is identical across both paths, except that erase
noise values come from a different RNG stream (documented).
"""

from __future__ import annotations

import ctypes
import math
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libd2tloader.so",
)


class TransformParams(ctypes.Structure):
    _fields_ = [
        ("flip", ctypes.c_int32),
        ("pad", ctypes.c_int32),
        ("crop_top", ctypes.c_int32),
        ("crop_left", ctypes.c_int32),
        ("erase", ctypes.c_int32),
        ("erase_top", ctypes.c_int32),
        ("erase_left", ctypes.c_int32),
        ("erase_h", ctypes.c_int32),
        ("erase_w", ctypes.c_int32),
        ("noise_seed", ctypes.c_uint64),
        ("crop_x0", ctypes.c_int32),
        ("crop_y0", ctypes.c_int32),
        ("crop_x1", ctypes.c_int32),
        ("crop_y1", ctypes.c_int32),
        ("interp", ctypes.c_int32),  # 0 = cubic (train), 1 = bilinear (eval)
    ]


INTERP_CUBIC = 0
INTERP_BILINEAR = 1


_lib = None


def build_native(force: bool = False) -> Optional[str]:
    """Compile the shared library if needed; returns its path or None."""
    if os.path.exists(_LIB_PATH) and not force:
        return _LIB_PATH
    script = os.path.join(os.path.dirname(_LIB_PATH), "build.sh")
    try:
        subprocess.run(["bash", script], check=True, capture_output=True)
        return _LIB_PATH
    except Exception:
        return None


def get_lib(auto_build: bool = True):
    global _lib
    if _lib is not None:
        return _lib
    path = _LIB_PATH
    if not os.path.exists(path) and auto_build:
        path = build_native()
    if not path or not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.d2t_load_batch.restype = ctypes.c_int
    lib.d2t_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(TransformParams),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.d2t_decode_jpeg.restype = ctypes.c_int
    lib.d2t_decode_jpeg.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return get_lib() is not None


def sample_train_params(
    rng: np.random.Generator,
    size,
    flip_prob: float = 0.5,
    padding: int = 10,
    re_prob: float = 0.5,
    strip: Optional[Sequence[int]] = None,
) -> TransformParams:
    """Draw augmentation parameters with the SAME rng consumption order as
    the pure-Python TrainTransform (data/transforms.py)."""
    h, w = size
    p = TransformParams()
    p.flip = 1 if rng.random() < flip_prob else 0
    p.pad = padding
    p.crop_top = int(rng.integers(0, 2 * padding + 1))
    p.crop_left = int(rng.integers(0, 2 * padding + 1))
    p.erase = 0
    if rng.random() <= re_prob:
        area = h * w
        log_ratio = (math.log(0.3), math.log(1.0 / 0.3))
        for _ in range(10):
            target = rng.uniform(0.02, 1.0 / 3.0) * area
            aspect = math.exp(rng.uniform(*log_ratio))
            eh = int(round(math.sqrt(target * aspect)))
            ew = int(round(math.sqrt(target / aspect)))
            if eh < h and ew < w:
                p.erase = 1
                p.erase_top = int(rng.integers(0, h - eh + 1))
                p.erase_left = int(rng.integers(0, w - ew + 1))
                p.erase_h = eh
                p.erase_w = ew
                break
    p.noise_seed = int(rng.integers(0, 2 ** 63 - 1))
    if strip is not None:
        p.crop_x0, p.crop_y0, p.crop_x1, p.crop_y1 = strip
    return p


def eval_params(
    strip: Optional[Sequence[int]] = None, interp: int = INTERP_BILINEAR
) -> TransformParams:
    """Identity-augmentation params.  Default interp is bilinear — the
    reference's eval transform is torchvision Resize's default (PIL
    BILINEAR, make_dataloader.py:198-202); pass INTERP_CUBIC to reuse the
    identity transform for train-cache decodes (bicubic, same as
    TrainTransform's resize)."""
    p = TransformParams()
    p.flip = 0
    p.pad = 0
    p.crop_top = 0
    p.crop_left = 0
    p.erase = 0
    if strip is not None:
        p.crop_x0, p.crop_y0, p.crop_x1, p.crop_y1 = strip
    p.interp = interp
    return p


def load_batch_native(
    paths: List[str],
    params: List[TransformParams],
    out_h: int,
    out_w: int,
    mean,
    std,
    num_threads: int = 4,
) -> np.ndarray:
    """Decode+transform a batch -> (N, out_h, out_w, 3) float32."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), np.float32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_params = (TransformParams * n)(*params)
    mean_a = np.ascontiguousarray(mean, np.float32)
    std_a = np.ascontiguousarray(std, np.float32)
    failures = lib.d2t_load_batch(
        c_paths,
        c_params,
        n,
        out_h,
        out_w,
        mean_a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std_a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if failures:
        raise IOError(f"native loader: {failures} image(s) failed to decode")
    return out
