"""Serving / deployment: AOT-compiled feature extraction.

The reference has no serving story (inference = re-running test_net.py).
For production deployment this module packages a trained model as a
single-purpose embedding extractor:

  * `FeatureExtractor` — holds compiled executables per (batch, miss-mask)
    configuration; pads ragged request batches to the compiled batch size;
    returns L2-normalized embeddings ready for distance search.
  * AOT compilation via `jax.jit(...).lower(...).compile()` so the serving
    process never pays trace time at request time.
  * `match()` — on-device query-vs-gallery ranking (the retrieval op).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config.defaults import Config
from .engine.eval import MISS_MASKS
from .utils.metrics import euclidean_distance


class FeatureExtractor:
    def __init__(
        self,
        cfg: Config,
        model,
        variables,
        batch_size: int = 64,
        normalize: bool = True,
    ):
        self.cfg = cfg
        self.model = model
        self.variables = variables
        self.batch_size = batch_size
        self.normalize = normalize
        self._compiled: Dict[str, object] = {}

    def _fn(self):
        def run(variables, images, cams, mask):
            out = self.model.apply(
                variables, images, cams, None, mask, train=False
            )["embedding"]
            if self.normalize:
                out = out / jnp.maximum(
                    jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12
                )
            return out

        return run

    def compile(self, miss: str = "None"):
        """AOT-compile the extractor (shared across miss configurations).

        The miss mask is a RUNTIME (3,) input, so one executable serves all
        7 configurations — in-graph masking is the whole point of the
        missing-modality design (engine/eval.MISS_MASKS; a per-miss compile
        would pay ~minutes of cold remote compile 7x for identical HLO).
        """
        if self._compiled:
            return next(iter(self._compiled.values()))
        h, w = self.cfg.INPUT.SIZE_TEST
        images = jax.ShapeDtypeStruct((self.batch_size, 3, h, w, 3), jnp.float32)
        cams = jax.ShapeDtypeStruct((self.batch_size,), jnp.int32)
        mask = jax.ShapeDtypeStruct((3,), jnp.float32)
        var_shapes = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), self.variables
        )
        compiled = jax.jit(self._fn()).lower(var_shapes, images, cams, mask).compile()
        self._compiled["__shared__"] = compiled
        return compiled

    def extract(
        self,
        images: np.ndarray,  # (N, 3, H, W, 3) float32, any N (incl. 0)
        camids: Optional[np.ndarray] = None,
        miss: str = "None",
    ) -> np.ndarray:
        """Embed a ragged batch; pads to the compiled batch size internally.

        ``images`` must already be transform-normalized, i.e.
        (x/255 - INPUT.PIXEL_MEAN) / INPUT.PIXEL_STD per channel — the same
        tensor the eval pipeline feeds the model (data/transforms.py
        EvalTransform); raw [0, 1] images are an input distribution the
        model never saw.
        """
        n = images.shape[0]
        if n == 0:  # empty request (drained queue / empty gallery shard)
            # Shape-only trace — no device dispatch for a zero-size request.
            h, w = self.cfg.INPUT.SIZE_TEST
            out = jax.eval_shape(
                self._fn(),
                jax.tree_util.tree_map(
                    lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                    self.variables,
                ),
                jax.ShapeDtypeStruct((self.batch_size, 3, h, w, 3), jnp.float32),
                jax.ShapeDtypeStruct((self.batch_size,), jnp.int32),
                jax.ShapeDtypeStruct((3,), jnp.float32),
            )
            return np.zeros((0, out.shape[-1]), np.float32)
        compiled = self.compile(miss)
        mask = jnp.asarray(MISS_MASKS[miss], jnp.float32)
        if camids is None:
            camids = np.zeros((n,), np.int32)
        outs = []
        bs = self.batch_size
        for i in range(0, n, bs):
            chunk = images[i : i + bs]
            cams = camids[i : i + bs]
            valid = chunk.shape[0]
            if valid < bs:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], bs - valid, axis=0)]
                )
                cams = np.concatenate([cams, np.repeat(cams[-1:], bs - valid)])
            emb = compiled(
                self.variables, jnp.asarray(chunk), jnp.asarray(cams, jnp.int32), mask
            )
            outs.append(np.asarray(emb)[:valid])
        return np.concatenate(outs, axis=0)


def match(
    query_emb: np.ndarray, gallery_emb: np.ndarray, topk: int = 10
) -> Tuple[np.ndarray, np.ndarray]:
    """Rank gallery entries per query on device; returns (indices, distances)."""
    d = euclidean_distance(jnp.asarray(query_emb), jnp.asarray(gallery_emb))
    idx = jnp.argsort(d, axis=1)[:, :topk]
    dist = jnp.take_along_axis(d, idx, axis=1)
    return np.asarray(idx), np.asarray(dist)
