"""Tri-modal batch pipeline.

Reference: data/datasets/make_dataloader.py — transform composition
(:188-202), collate to a per-modality dict (:142-184), PK-sampled train
loader + sequential query+gallery val loader (:214-259), and
bases.py:9-43 for the two image layouts (3 paths vs one wide strip image).

TPU-first deltas: batches collate to a single stacked (B, 3, H, W, 3)
channel-last array (modality axis explicit) ready for the one-pass backbone;
decoding/augmentation runs in a thread pool with background prefetch; the
last val batch is padded to the fixed batch shape (jit-friendly) and trimmed
after feature extraction.
"""

from __future__ import annotations

import concurrent.futures as cf
import queue
import threading
from dataclasses import dataclass
from typing import Any, Dict, Iterator, List, Optional, Tuple

import numpy as np
from PIL import Image, ImageFile

from ..config.defaults import Config
from .datasets import DATASET_REGISTRY, SyntheticTriModal
from .sampler import RandomIdentitySampler, SequentialSampler
from .transforms import EvalTransform, TrainTransform

ImageFile.LOAD_TRUNCATED_IMAGES = True  # reference: bases.py:6


def read_image(ref, dataset=None) -> List[Image.Image]:
    """Load the 3 modality images (reference: bases.py:9-43)."""
    if dataset is not None and isinstance(dataset, SyntheticTriModal) and isinstance(ref, tuple):
        return [Image.fromarray(a) for a in dataset.render(ref)]
    if isinstance(ref, str):  # RGBNT100 wide strip
        img = Image.open(ref).convert("RGB")
        return [
            img.crop((0, 0, 256, 128)),
            img.crop((256, 0, 512, 128)),
            img.crop((512, 0, 768, 128)),
        ]
    return [Image.open(p).convert("RGB") for p in ref]


@dataclass
class Batch:
    images: np.ndarray  # (B, 3, H, W, 3) float32
    pids: np.ndarray  # (B,) int32
    camids: np.ndarray  # (B,) int32
    viewids: np.ndarray  # (B,) int32 (trackid / sceneid)
    paths: List[Any]
    valid: int  # number of non-padded samples


class TriModalDataPipe:
    def __init__(
        self,
        samples,
        dataset,
        transform,
        batch_size: int,
        num_workers: int = 4,
        use_native: Optional[bool] = None,
    ):
        self.samples = samples
        self.dataset = dataset
        self.transform = transform
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.pool = cf.ThreadPoolExecutor(max_workers=self.num_workers)
        # Native C++ decode/transform path for on-disk JPEGs: train pipes get
        # the full augmentation pipeline (bicubic resize), eval pipes the
        # identity transform with torchvision-parity bilinear resize.  The
        # pipe owns the decision AND its preconditions: auto probes cheaply;
        # an explicit force validates exhaustively and fails clearly instead
        # of deep inside the C++ loader.
        from .native import native_available

        if use_native is None:
            use_native = (
                isinstance(transform, (TrainTransform, EvalTransform))
                and self._all_jpeg_paths()
                and native_available()
            )
        elif use_native:
            if not native_available():
                raise RuntimeError(
                    "native decode forced but libd2tloader is not built "
                    "(run make -C native)"
                )
            if not samples:
                raise ValueError("native decode forced on an empty dataset")
            if not self._all_jpeg_paths(check_all=True):
                raise ValueError(
                    "native decode requires on-disk JPEG datasets "
                    "(DATALOADER.NATIVE_DECODE=on with in-memory/non-JPEG "
                    "samples)"
                )
        self.use_native = bool(use_native)
        if self.use_native:
            # One-line notice so parity audits can tell which decode path
            # ran (the native resize is a ~2/255 bilinear approximation;
            # DATALOADER.NATIVE_DECODE=off forces the PIL-exact path).
            import logging

            mode = "train" if isinstance(transform, TrainTransform) else "eval"
            logging.getLogger("DeMo").info(
                "data pipe (%s): native C++ decode enabled "
                "(DATALOADER.NATIVE_DECODE=off for the PIL-exact path)",
                mode,
            )

    def _all_jpeg_paths(self, check_all: bool = False) -> bool:
        if not self.samples:
            return False
        n = len(self.samples) if check_all else min(len(self.samples), 8)
        for s in self.samples[:n]:
            ref = s[0]
            paths = [ref] if isinstance(ref, str) else ref
            if not isinstance(paths, (list, tuple)):
                return False
            for p in paths:
                if not (isinstance(p, str) and p.lower().endswith((".jpg", ".jpeg"))):
                    return False
        return True

    def _native_batch_images(self, indices, seed, positions=None) -> np.ndarray:
        """Native path: (B, 3, H, W, 3) float32 via libd2tloader."""
        from .native import eval_params, load_batch_native, sample_train_params

        train = isinstance(self.transform, TrainTransform)
        h, w = self.transform.size
        if positions is None:
            positions = range(len(indices))
        paths, params = [], []
        for k, idx in zip(positions, indices):
            ref = self.samples[idx][0]
            if isinstance(ref, str):  # wide-strip layout (RGBNT100)
                strips = [(0, 0, 256, 128), (256, 0, 512, 128), (512, 0, 768, 128)]
                items = [(ref, st) for st in strips]
            else:
                items = [(p, None) for p in ref]
            for m, (path, st) in enumerate(items):
                paths.append(path)
                if train:
                    # Per-(sample, modality) stream, matching _load_one —
                    # geometry draws are position-identical to the PIL path.
                    rng = np.random.default_rng((seed, int(idx), int(k), m))
                    params.append(
                        sample_train_params(
                            rng, (h, w), self.transform.flip_prob,
                            self.transform.padding, self.transform.re_prob, st,
                        )
                    )
                else:
                    params.append(eval_params(st))
        flat = load_batch_native(
            paths, params, h, w, self.transform.mean, self.transform.std,
            num_threads=self.num_workers,
        )
        return flat.reshape(len(indices), 3, h, w, 3)

    def _load_one(self, idx: int, key: tuple) -> np.ndarray:
        ref = self.samples[idx][0]
        imgs = read_image(ref, self.dataset)
        # Transforms applied independently per modality (bases.py:103-104),
        # each from its own (seed, idx, pos, modality) stream so the PIL and
        # native paths draw IDENTICAL geometry: a shared per-sample stream
        # would desynchronize after modality 1 (the native path draws a
        # noise seed where the PIL path draws erase-fill normals; review
        # round 4).
        return np.stack([
            self.transform(im, np.random.default_rng((*key, m)))
            for m, im in enumerate(imgs)
        ])  # (3, H, W, 3)

    def _make_batch(
        self, indices: np.ndarray, seed: int, pad_to: Optional[int],
        positions: Optional[np.ndarray] = None,
    ) -> Batch:
        """``positions`` are the rows' GLOBAL batch positions — they key the
        per-sample augmentation RNG so a multi-host slice draws the same
        augmentations as the single-host full batch (parallel/multihost.py)."""
        valid = len(indices)
        if pad_to is not None and valid < pad_to:
            indices = np.concatenate([indices, np.full(pad_to - valid, indices[-1])])
        if positions is None:
            positions = np.arange(len(indices))
        if self.use_native:
            images = self._native_batch_images(indices, seed, positions)
        else:
            keys = [
                (seed, int(i), int(k)) for k, i in zip(positions, indices)
            ]
            arrs = list(self.pool.map(self._load_one, indices, keys))
            images = np.stack(arrs).astype(np.float32)
        meta = [self.samples[i] for i in indices]
        return Batch(
            images=images,
            pids=np.asarray([m[1] for m in meta], np.int32),
            camids=np.asarray([m[2] for m in meta], np.int32),
            viewids=np.asarray([m[3] for m in meta], np.int32),
            paths=[m[0] for m in meta],
            valid=valid,
        )

    def iter_batches(
        self,
        order: np.ndarray,
        seed: int = 0,
        drop_last: bool = True,
        pad_last: bool = False,
        prefetch: int = 2,
    ) -> Iterator[Batch]:
        bs = self.batch_size
        n_full = len(order) // bs
        chunks = [order[i * bs : (i + 1) * bs] for i in range(n_full)]
        rem = order[n_full * bs :]
        if len(rem) and not drop_last:
            chunks.append(rem)

        q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        stop = object()
        err: List[BaseException] = []

        def producer():
            try:
                for ch in chunks:
                    pad = bs if pad_last else None
                    q.put(self._make_batch(np.asarray(ch), seed, pad))
            except BaseException as e:  # re-raised in the consumer — a
                # swallowed decode error would silently TRUNCATE the epoch
                # (eval would score a partial feature set as if complete).
                err.append(e)
            finally:
                q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                if err:
                    raise err[0]
                break
            yield item


def make_dataloader(cfg: Config):
    """Factory mirroring make_dataloader(cfg) (reference: :187-259).

    Returns (train_pipe, sampler, val_pipe, num_query, num_classes,
    cam_num, view_num).  Train iteration: `train_pipe.iter_batches(
    sampler.epoch_indices(epoch), seed=epoch)`.
    """
    name = cfg.DATASETS.NAMES
    dataset = DATASET_REGISTRY[name](root=cfg.DATASETS.ROOT_DIR)

    native_mode = getattr(cfg.DATALOADER, "NATIVE_DECODE", "auto")
    if isinstance(native_mode, bool):
        # YAML 1.1 parses unquoted on/off as booleans — honor the intent.
        native_mode = "on" if native_mode else "off"
    if native_mode not in ("auto", "on", "off"):
        raise ValueError(
            f"DATALOADER.NATIVE_DECODE must be auto|on|off, got {native_mode!r}"
        )
    # on -> True (pipe validates library + JPEG paths exhaustively and fails
    # clearly); off -> False (PIL-exact); auto -> None (pipe probes).
    use_native = {"on": True, "off": False, "auto": None}[native_mode]

    train_tf = TrainTransform(
        size=tuple(cfg.INPUT.SIZE_TRAIN),
        flip_prob=cfg.INPUT.PROB,
        padding=cfg.INPUT.PADDING,
        re_prob=cfg.INPUT.RE_PROB,
        mean=cfg.INPUT.PIXEL_MEAN,
        std=cfg.INPUT.PIXEL_STD,
    )
    eval_tf = EvalTransform(
        size=tuple(cfg.INPUT.SIZE_TEST), mean=cfg.INPUT.PIXEL_MEAN, std=cfg.INPUT.PIXEL_STD
    )

    train_pipe = TriModalDataPipe(
        dataset.train, dataset, train_tf, cfg.SOLVER.IMS_PER_BATCH,
        cfg.DATALOADER.NUM_WORKERS, use_native=use_native,
    )
    sampler_mode = cfg.DATALOADER.SAMPLER
    if "triplet" in sampler_mode:
        # reference make_dataloader.py:213 — any *triplet* recipe gets PK.
        sampler = RandomIdentitySampler(
            dataset.train, cfg.SOLVER.IMS_PER_BATCH, cfg.DATALOADER.NUM_INSTANCE,
            seed=cfg.SOLVER.SEED,
        )
    elif sampler_mode == "softmax":
        sampler = SequentialSampler(dataset.train, cfg.SOLVER.IMS_PER_BATCH)
    else:
        raise ValueError(
            f"DATALOADER.SAMPLER must be softmax or *triplet*, got {sampler_mode!r}"
        )
    val_samples = list(dataset.query) + list(dataset.gallery)
    val_pipe = TriModalDataPipe(
        val_samples, dataset, eval_tf, cfg.TEST.IMS_PER_BATCH,
        cfg.DATALOADER.NUM_WORKERS, use_native=use_native,
    )
    return (
        train_pipe,
        sampler,
        val_pipe,
        len(dataset.query),
        dataset.num_train_pids,
        dataset.num_train_cams,
        dataset.num_train_vids,
    )
