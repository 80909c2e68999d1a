"""Profiling / FLOPs accounting.

Reference counterparts: fvcore flop_count with a hand-maintained op table
(modeling/make_model.py:672-693, basic_cnn_params/flops.py:4-60), per-epoch
throughput logging (engine/processor.py:137-143), parameter counts
(train_net.py:81-82).

TPU-native: XLA's own cost model via `jitted.lower().cost_analysis()`
replaces the hand-maintained table, and `jax.profiler` traces replace
nvprof-style timing.
"""

from __future__ import annotations

import contextlib
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


def count_params(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def model_flops(model, variables, images, cams, train: bool = False) -> Dict[str, Any]:
    """Analytical cost of one forward pass from XLA's cost model.

    Equivalent of the reference `model.flops()` (make_model.py:672-693) but
    exact for the compiled graph instead of a per-op table.
    """

    def fwd(variables, images, cams):
        return model.apply(variables, images, cams, train=train)["embedding"]

    lowered = jax.jit(fwd).lower(variables, images, cams)
    cost = lowered.cost_analysis()
    if isinstance(cost, list) and cost:
        cost = cost[0]
    if not isinstance(cost, dict):
        # The remote axon backend returns None here (round-3 train logs:
        # "FLOP count unavailable") — report zeros instead of raising.
        return {"flops": 0.0, "bytes_accessed": 0.0}
    return {
        "flops": cost.get("flops", 0.0),
        "bytes_accessed": cost.get("bytes accessed", 0.0),
    }


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """jax.profiler trace context; view with TensorBoard's profile plugin."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """samples/s meter matching the reference's per-epoch log format."""

    def __init__(self):
        import time

        self._time = time
        self.reset()

    def reset(self):
        self.t0 = self._time.time()
        self.samples = 0
        self.iters = 0

    def update(self, batch_size: int):
        self.samples += batch_size
        self.iters += 1

    def report(self) -> str:
        dt = self._time.time() - self.t0
        per_batch = dt / max(self.iters, 1)
        speed = self.samples / max(dt, 1e-9)
        return f"Time per batch: {per_batch:.3f}[s] Speed: {speed:.1f}[samples/s]"
