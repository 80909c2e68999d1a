"""HBM-resident dataset cache + on-device augmentation.

The reference re-decodes every JPEG every epoch through a multi-worker
torch DataLoader (engine/processor.py:56, make_dataloader.py:214-259).  On
this TPU host (ONE cpu core) that caps end-to-end training at ~108
samples/s (tools/bench_loader.py) — far below the ~600 img/s the chip
sustains.  TPU-first redesign: decode+resize every image ONCE at startup
into a uint8 cache that lives in device HBM (RGBNT201 train at 256x128
tri-modal is ~390 MB — a few % of HBM), then run the per-epoch random
augmentations IN-GRAPH on the TPU.  The steady-state input cost becomes a
(B,) int32 index transfer per step plus ~1 ms of on-device elementwise work,
so training throughput is decoupled from host decode entirely.

Augmentation parity (host pipeline, data/transforms.py / reference
make_dataloader.py:188-196): resize(bicubic, cached) -> random hflip(0.5)
-> /255 -> pad(10, zeros) -> random crop -> normalize(mean,std) -> timm
pixel-mode RandomErasing(p=0.5, area U(0.02,1/3), log-aspect U(0.3,1/0.3),
10 attempts, N(0,1) fill).  Parameter DISTRIBUTIONS are identical (asserted
by tests/test_device_cache.py against the host transform given the same
draws); only the RNG stream differs (jax.random instead of numpy), exactly
like the documented native-loader erase-noise delta.

Transforms are applied independently per modality (bases.py:103-104): every
(sample, modality) pair draws its own flip/crop/erase.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# On-device augmentation
# ---------------------------------------------------------------------------


def draw_aug_params(
    key,
    batch: int,
    size: Tuple[int, int],
    flip_prob: float = 0.5,
    padding: int = 10,
    re_prob: float = 0.5,
    min_area: float = 0.02,
    max_area: float = 1.0 / 3.0,
    min_aspect: float = 0.3,
    attempts: int = 10,
):
    """Draw per-(sample, modality) augmentation parameters, shapes (B, 3).

    Mirrors TrainTransform/random_erasing's rejection loop: ``attempts``
    (target, aspect) proposals per image, the first with eh<h and ew<w wins;
    none valid -> no erase (same as the host loop falling through).
    """
    h, w = size
    kf, kct, kcl, kg, kt, ka, ku, kv, kn = jax.random.split(key, 9)
    shape = (batch, 3)
    flip = jax.random.uniform(kf, shape) < flip_prob
    crop_top = jax.random.randint(kct, shape, 0, 2 * padding + 1)
    crop_left = jax.random.randint(kcl, shape, 0, 2 * padding + 1)

    area = float(h * w)
    tgt = jax.random.uniform(
        kt, shape + (attempts,), minval=min_area, maxval=max_area
    ) * area
    log_r = (np.log(min_aspect), np.log(1.0 / min_aspect))
    asp = jnp.exp(
        jax.random.uniform(ka, shape + (attempts,), minval=log_r[0], maxval=log_r[1])
    )
    eh = jnp.round(jnp.sqrt(tgt * asp)).astype(jnp.int32)
    ew = jnp.round(jnp.sqrt(tgt / asp)).astype(jnp.int32)
    valid = (eh < h) & (ew < w)
    first = jnp.argmax(valid, axis=-1)  # first valid attempt
    found = jnp.any(valid, axis=-1)
    eh = jnp.take_along_axis(eh, first[..., None], -1)[..., 0]
    ew = jnp.take_along_axis(ew, first[..., None], -1)[..., 0]
    # top ~ U{0..h-eh}: floor(u * (h-eh+1)) == rng.integers(0, h-eh+1).
    etop = jnp.floor(
        jax.random.uniform(ku, shape) * (h - eh + 1).astype(jnp.float32)
    ).astype(jnp.int32)
    eleft = jnp.floor(
        jax.random.uniform(kv, shape) * (w - ew + 1).astype(jnp.float32)
    ).astype(jnp.int32)
    do_erase = (jax.random.uniform(kg, shape) <= re_prob) & found
    return {
        "flip": flip,
        "crop_top": crop_top,
        "crop_left": crop_left,
        "erase": do_erase,
        "erase_top": etop,
        "erase_left": eleft,
        "erase_h": eh,
        "erase_w": ew,
        "noise_key": kn,
    }


def apply_augment(
    u8: jnp.ndarray,
    params,
    mean: Sequence[float],
    std: Sequence[float],
    padding: int = 10,
    idx: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """uint8 (B, 3, H, W, 3) -> augmented float32, host-pipeline order.

    The host chain is flip -> /255 -> pad(0) -> crop -> normalize
    (data/transforms.py; reference make_dataloader.py:188-196).  All of
    flip/pad/crop are index permutations, so they are FOLDED into gathers on
    the uint8 data (out-of-pad positions masked to the pad value before
    normalize).  vs. the naive chain this removes five full-size float32
    materializations per step (~0.5 GB/step of HBM traffic at the flagship
    batch) while staying bit-identical: every surviving float op (/255,
    zero-mask, -mean, /std) is elementwise in the same order.

    With ``idx`` (production path), ``u8`` is the FULL cache (N, 3, H, W, 3)
    and the batch is gathered as (sample, modality) PLANES (98 KB rows).
    Gathering whole samples (``take(cache, idx)``, 294 KB rows) exceeds the
    TPU mini-gather slice limit, and XLA then SLICES THE ENTIRE CACHE into
    two H-halves inside the scan body — a measured 3.5 ms/step, 2.3 GB/step
    whole-dataset copy (round-4 profiler trace, %fusion.2654 ->
    %mini-gather-slice in the step HLO).  Plane rows sit under the limit so
    the lowering gathers directly (580.8 -> 600.0 img/s e2e); gathering
    single image rows (384 B) instead measured SLOWER (576.3) — small-slice
    DMA overhead; docs/PERF.md has the ladder.
    """
    if idx is None:
        b, m, h, w, c = u8.shape
    else:
        n, m, h, w, c = u8.shape
        b = idx.shape[0]
    p = padding
    # Crop window [top, top+h) x [left, left+w) of the padded image maps to
    # source coords (top - p + i, left - p + j); out-of-range = pad zeros.
    rows = params["crop_top"][..., None] - p + jnp.arange(h)  # (B, 3, h)
    cols = params["crop_left"][..., None] - p + jnp.arange(w)  # (B, 3, w)
    in_h = (rows >= 0) & (rows < h)
    in_w = (cols >= 0) & (cols < w)
    # Horizontal flip (applied before pad/crop) = reading column W-1-j.
    src_cols = jnp.where(params["flip"][..., None], w - 1 - cols, cols)
    src_rows = jnp.clip(rows, 0, h - 1)
    if idx is not None:
        # Gather (sample, modality) planes: 98 KB rows sit under the TPU
        # mini-gather slice limit that whole 294 KB samples exceed, so the
        # lowering gathers directly instead of slicing the cache.
        lin = idx[:, None] * m + jnp.arange(m)[None]  # (B, 3)
        u8 = jnp.take(
            u8.reshape(n * m, h, w, c), lin.reshape(-1), axis=0, mode="clip"
        ).reshape(b, m, h, w, c)
    x = jnp.take_along_axis(u8, src_rows[..., None, None], axis=2)
    x = jnp.take_along_axis(
        x, jnp.clip(src_cols, 0, w - 1)[:, :, None, :, None], axis=3
    )
    x = x.astype(jnp.float32) / 255.0
    pad_mask = in_h[..., :, None] & in_w[..., None, :]  # (B, 3, h, w)
    x = jnp.where(pad_mask[..., None], x, 0.0)
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    x = (x - mean) / std
    yy = jnp.arange(h)[None, None, :, None]
    xx = jnp.arange(w)[None, None, None, :]
    top = params["erase_top"][..., None, None]
    left = params["erase_left"][..., None, None]
    rect = (
        (yy >= top)
        & (yy < top + params["erase_h"][..., None, None])
        & (xx >= left)
        & (xx < left + params["erase_w"][..., None, None])
        & params["erase"][..., None, None]
    )
    noise = jax.random.normal(params["noise_key"], x.shape, jnp.float32)
    return jnp.where(rect[..., None], noise, x)


def augment_batch(u8, key, size, mean, std, flip_prob=0.5, padding=10,
                  re_prob=0.5, idx=None):
    batch = u8.shape[0] if idx is None else idx.shape[0]
    params = draw_aug_params(
        key, batch, size, flip_prob=flip_prob, padding=padding, re_prob=re_prob
    )
    return apply_augment(u8, params, mean, std, padding=padding, idx=idx)


def normalize_batch(u8, mean, std) -> jnp.ndarray:
    """Eval path: /255 + normalize only (EvalTransform)."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (u8.astype(jnp.float32) / 255.0 - mean) / std


# ---------------------------------------------------------------------------
# Decode-once cache
# ---------------------------------------------------------------------------

# Host-side persistence for the decoded uint8 tensor.  The decode-once cost
# on this 1-core host is ~2 min at RGBNT201 scale (round-4 bench logs:
# 118.8 s for 3,933 tri-modal samples) and was paid by EVERY bench/train
# invocation; persisting the decoded array keyed on the dataset's file
# identity turns it into a once-per-machine cost (VERDICT r4 #2).
DECODE_CACHE_DIR = os.environ.get("DEMO2_DECODE_CACHE_DIR", "/tmp/d2t_decode_cache")
# Size budget: in-place dataset re-renders (quality-gate A/B sweeps) change
# every mtime, so each parameterization writes a fresh ~1.2 GB entry — the
# oldest entries are evicted past this budget (a tmpfs /tmp makes unbounded
# growth a RAM leak).
DECODE_CACHE_MAX_BYTES = int(
    os.environ.get("DEMO2_DECODE_CACHE_MAX_BYTES", 8 << 30)
)


def _prune_decode_cache(keep: str) -> None:
    """Evict oldest .npy entries beyond DECODE_CACHE_MAX_BYTES (never
    ``keep``, the entry just written)."""
    try:
        entries = []
        for name in os.listdir(DECODE_CACHE_DIR):
            if not name.endswith(".npy"):
                continue
            p = os.path.join(DECODE_CACHE_DIR, name)
            st = os.stat(p)
            entries.append((st.st_mtime, st.st_size, p))
        total = sum(s for _, s, _ in entries)
        for _, size, p in sorted(entries):  # oldest first
            if total <= DECODE_CACHE_MAX_BYTES:
                break
            if os.path.abspath(p) == os.path.abspath(keep):
                continue
            os.unlink(p)
            total -= size
    except OSError:
        pass  # best-effort housekeeping


def _decode_cache_key(pipe, train: bool) -> Optional[str]:
    """Content key for the decoded dataset, or None if not cacheable.

    Keyed on every sample's (path, size, mtime) plus the resize geometry and
    interpolation mode — ~12k os.stat calls (<1 s), so a stale cache after
    regenerating images in place is impossible.  In-memory synthetic refs
    (tuples) are not cacheable (decode is already cheap there).
    """
    import hashlib

    h, w = pipe.transform.size
    hasher = hashlib.sha1(
        f"v1|{h}x{w}|train={train}|native={pipe.use_native}".encode()
    )
    try:
        for ref, *_ in pipe.samples:
            paths = [ref] if isinstance(ref, str) else list(ref)
            for p in paths:
                if not isinstance(p, str):
                    return None
                st = os.stat(p)
                hasher.update(f"{p}|{st.st_size}|{st.st_mtime_ns}".encode())
    except (OSError, TypeError):
        return None
    return hasher.hexdigest()


def _decode_all_cached(pipe, train: bool) -> np.ndarray:
    """_decode_all with host-side persistence (np memmap read on hit)."""
    key = _decode_cache_key(pipe, train)
    if key is None:
        return _decode_all(pipe, train)
    path = os.path.join(DECODE_CACHE_DIR, f"{key}.npy")
    if os.path.exists(path):
        try:
            return np.load(path, mmap_mode="r")
        except (OSError, ValueError):
            pass  # torn write from a crashed run — re-decode below
    out = _decode_all(pipe, train)
    try:
        os.makedirs(DECODE_CACHE_DIR, exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:  # np.save(path) would append .npy
            np.save(f, out)
        os.replace(tmp, path)
        _prune_decode_cache(keep=path)
    except OSError:
        pass  # persistence is best-effort; the decode result still stands
    return out


@dataclass
class DeviceCache:
    """Decoded dataset resident on device (replicated over the mesh)."""

    images: Any  # (N, 3, H, W, 3) uint8 jax.Array
    pids: Any  # (N,) int32
    camids: Any
    viewids: Any
    size: Tuple[int, int]
    mean: Tuple[float, ...]
    std: Tuple[float, ...]
    train: bool  # True -> augment_batch; False -> normalize_batch
    flip_prob: float = 0.5
    padding: int = 10
    re_prob: float = 0.5
    decode_seconds: float = 0.0  # one-time decode cost (reported by benches)


def _decode_all(pipe, train: bool) -> np.ndarray:
    """Decode + resize every sample once -> (N, 3, H, W, 3) uint8."""
    from PIL import Image

    from .loader import read_image

    h, w = pipe.transform.size
    n = len(pipe.samples)
    out = np.empty((n, 3, h, w, 3), np.uint8)

    if pipe.use_native:
        # Native decode+resize, no augment (identity params), mean=0/std=1
        # -> [0,1] floats -> uint8 (same quantization as the host path,
        # which also stores uint8 post-resize).  Filter matches the host
        # transform per mode: bicubic for train (TrainTransform), bilinear
        # for eval (torchvision Resize default, make_dataloader.py:198-202).
        from .native import INTERP_BILINEAR, INTERP_CUBIC, eval_params, load_batch_native

        interp = INTERP_CUBIC if train else INTERP_BILINEAR
        chunk = 256
        strips = [(0, 0, 256, 128), (256, 0, 512, 128), (512, 0, 768, 128)]
        for start in range(0, n, chunk):
            idxs = range(start, min(n, start + chunk))
            paths, params = [], []
            for i in idxs:
                ref = pipe.samples[i][0]
                if isinstance(ref, str):  # wide-strip layout
                    for st in strips:
                        paths.append(ref)
                        params.append(eval_params(st, interp))
                else:
                    for p in ref:
                        paths.append(p)
                        params.append(eval_params(None, interp))
            flat = load_batch_native(
                paths, params, h, w, (0.0, 0.0, 0.0), (1.0, 1.0, 1.0),
                num_threads=pipe.num_workers,
            )
            out[start : start + len(list(idxs))] = (
                np.clip(np.round(flat.reshape(-1, 3, h, w, 3) * 255.0), 0, 255)
                .astype(np.uint8)
            )
        return out

    interp = Image.BICUBIC if train else Image.BILINEAR  # torchvision parity

    def one(i):
        imgs = read_image(pipe.samples[i][0], pipe.dataset)
        return np.stack(
            [np.asarray(im.resize((w, h), interp), np.uint8) for im in imgs]
        )

    for i, arr in enumerate(pipe.pool.map(one, range(n))):
        out[i] = arr
    return out


def _replicated_global(mesh, arr: np.ndarray):
    """Fully-replicated jax.Array on the mesh; multi-process safe."""
    from ..parallel.mesh import replicated_sharding

    if mesh is None:
        return jnp.asarray(arr)
    sh = replicated_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(arr, sh)
    bufs = [jax.device_put(arr, d) for d in sh.addressable_devices]
    return jax.make_array_from_single_device_arrays(arr.shape, sh, bufs)


def build_device_cache(pipe, mesh=None, train: Optional[bool] = None) -> DeviceCache:
    """Decode the pipe's dataset once and park it in device HBM."""
    import time

    from .transforms import TrainTransform

    if train is None:
        train = isinstance(pipe.transform, TrainTransform)
    t0 = time.perf_counter()
    images = _decode_all_cached(pipe, train)
    decode_s = time.perf_counter() - t0
    meta = pipe.samples
    tf = pipe.transform
    return DeviceCache(
        images=_replicated_global(mesh, images),
        pids=_replicated_global(mesh, np.asarray([s[1] for s in meta], np.int32)),
        camids=_replicated_global(mesh, np.asarray([s[2] for s in meta], np.int32)),
        viewids=_replicated_global(mesh, np.asarray([s[3] for s in meta], np.int32)),
        size=(tf.size[0], tf.size[1]),
        mean=tuple(float(v) for v in np.asarray(tf.mean).ravel()),
        std=tuple(float(v) for v in np.asarray(tf.std).ravel()),
        train=train,
        flip_prob=getattr(tf, "flip_prob", 0.5),
        padding=getattr(tf, "padding", 10),
        re_prob=getattr(tf, "re_prob", 0.5),
        decode_seconds=decode_s,
    )
