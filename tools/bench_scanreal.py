"""Time the REAL train step (batch_stats + metrics + donation) as one
scan-of-K dispatch vs the python-loop driver."""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np
from demo2_tpu.config import get_cfg_defaults
from demo2_tpu.data import Batch
from demo2_tpu.engine import create_train_state
from demo2_tpu.engine.train import build_train_step
from demo2_tpu.models import make_model

batch_size = 64
K = 16
cfg = get_cfg_defaults()
cfg.MODEL.TRANSFORMER_TYPE = "ViT-B-16"
cfg.MODEL.USE_SDTPS = True
cfg.MODEL.USE_DGAF = True
cfg.MODEL.DGAF_VERSION = "v3"
cfg.SOLVER.OPTIMIZER_NAME = "Adam"
cfg.SOLVER.IMS_PER_BATCH = batch_size
cfg.TPU.COMPUTE_DTYPE = "bfloat16"
cfg.TPU.USE_FLASH_ATTENTION = True
cfg.freeze()
num_classes, camera_num = 171, 6
h, w = cfg.INPUT.SIZE_TRAIN
model = make_model(cfg, num_classes, camera_num)
rng = jax.random.PRNGKey(0)
images = np.asarray(jax.random.normal(rng, (batch_size, 3, h, w, 3), jnp.float32) * 0.5)
pids = np.tile(np.arange(16), 4).astype(np.int32)
cams = (np.arange(batch_size) % camera_num).astype(np.int32)
views = np.zeros((batch_size,), np.int32)
sample = Batch(images=images, pids=pids, camids=cams, viewids=views, paths=[], valid=batch_size)
state, tx, center_tx, _ = create_train_state(cfg, model, rng, sample, steps_per_epoch=100)

step_scan = build_train_step(cfg, model, tx, center_tx, mesh=None, donate=True,
                             scan_steps=K)
im_k = jnp.broadcast_to(jnp.asarray(images)[None], (K, *images.shape))
pid_k = jnp.broadcast_to(jnp.asarray(pids)[None], (K, batch_size))
cam_k = jnp.broadcast_to(jnp.asarray(cams)[None], (K, batch_size))
view_k = jnp.broadcast_to(jnp.asarray(views)[None], (K, batch_size))

state, metrics = step_scan(state, im_k, pid_k, cam_k, view_k, rng)
_ = float(metrics["loss"])
t0 = time.perf_counter()
state, metrics = step_scan(state, im_k, pid_k, cam_k, view_k, rng)
_ = float(metrics["loss"])
dt = (time.perf_counter() - t0) / K * 1000
print(f"real step in scan({K}): {dt:.2f} ms -> {batch_size/dt*1000:.1f} img/s",
      flush=True)
