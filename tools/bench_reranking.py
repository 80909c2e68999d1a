"""k-reciprocal re-ranking: on-device TPU vs the reference's numpy.

The reference runs the CVPR'17 algorithm in single-threaded numpy on the
host (utils/reranking.py:29-101) — at real gallery sizes this dominates
eval wall-clock.  Ours is a device reformulation (boolean mask algebra +
blocked min-sum).  This prints both timings at RGBNT201-like scale
(query 1672, gallery 3160 from BASELINE.md protocol sizes are approx;
we use 1600/3200) plus a numeric agreement check on a small instance.
"""
import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tests"))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from demo2_tpu.utils.reranking import re_ranking_device

Q, G, D = 1600, 3200, 512
rng = np.random.default_rng(0)
qf = rng.normal(size=(Q, D)).astype(np.float32)
gf = rng.normal(size=(G, D)).astype(np.float32)

# --- device ---
qd, gd = jnp.asarray(qf), jnp.asarray(gf)
out = re_ranking_device(qd, gd)
jax.block_until_ready(out)
t0 = time.perf_counter()
out = re_ranking_device(qd, gd)
jax.block_until_ready(out)
_ = np.asarray(out[:1, :1])
t_dev = time.perf_counter() - t0
print(f"device re-ranking ({Q}x{G}): {t_dev:.2f} s", flush=True)

# --- reference numpy (direct import) ---
import torch
from ref_loader import load_ref

rr = load_ref("utils.reranking")
t0 = time.perf_counter()
ref = rr.re_ranking(torch.from_numpy(qf), torch.from_numpy(gf), 50, 15, 0.3)
t_ref = time.perf_counter() - t0
print(f"reference numpy re-ranking: {t_ref:.2f} s -> device is "
      f"{t_ref / t_dev:.1f}x faster", flush=True)

# --- agreement on a small instance (rank order, not bitwise: fp16 tricks
# in the reference vs f32 on device) ---
centers = rng.normal(size=(16, D)).astype(np.float32) * 3
qs = (centers[np.arange(64) % 16] + rng.normal(size=(64, D)) * 0.3).astype(np.float32)
gs = (centers[np.arange(256) % 16] + rng.normal(size=(256, D)) * 0.3).astype(np.float32)
d_small = np.asarray(re_ranking_device(jnp.asarray(qs), jnp.asarray(gs)))
r_small = rr.re_ranking(torch.from_numpy(qs), torch.from_numpy(gs), 50, 15, 0.3)
ours_rank = np.argsort(d_small, axis=1)[:, :10]
ref_rank = np.argsort(r_small, axis=1)[:, :10]
agree = (ours_rank == ref_rank).mean()
print(f"top-10 rank agreement vs reference: {agree:.3f}", flush=True)
