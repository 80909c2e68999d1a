"""Train-step throughput for the PAPER-PATH model (PIFE + HDM + ATMoE,
GLOBAL_LOCAL, HEAD=4 — configs/RGBNT201/DeMo.yml) at batch 64 bf16.

The north star's named target model must not lag the SDTPS+DGAF flagship
(docs/PERF.md)."""
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
from demo2_tpu.parallel import make_mesh

batch_size = 64
cfg = get_cfg_defaults()
cfg.MODEL.TRANSFORMER_TYPE = "ViT-B-16"
cfg.MODEL.SIE_CAMERA = True
cfg.MODEL.SIE_COE = 1.0
cfg.MODEL.DIRECT = 1
cfg.MODEL.ID_LOSS_WEIGHT = 0.25
cfg.MODEL.TRIPLET_LOSS_WEIGHT = 1.0
cfg.MODEL.GLOBAL_LOCAL = True
cfg.MODEL.HDM = True
cfg.MODEL.ATM = True
cfg.MODEL.HEAD = 4
cfg.SOLVER.OPTIMIZER_NAME = "Adam"
cfg.SOLVER.IMS_PER_BATCH = batch_size
cfg.DATALOADER.NUM_INSTANCE = 8
cfg.TPU.COMPUTE_DTYPE = "bfloat16"
cfg.TPU.USE_FLASH_ATTENTION = True
cfg.TPU.BF16_MOMENTS = True
cfg.freeze()
num_classes, camera_num = 171, 6
h, w = cfg.INPUT.SIZE_TRAIN
model = make_model(cfg, num_classes, camera_num)
rng = jax.random.PRNGKey(0)
images = np.asarray(jax.random.normal(rng, (batch_size, 3, h, w, 3), jnp.float32) * 0.5)
pids = np.tile(np.arange(8), 8).astype(np.int32)
cams = (np.arange(batch_size) % camera_num).astype(np.int32)
views = np.zeros((batch_size,), np.int32)
sample = Batch(images=images, pids=pids, camids=cams, viewids=views, paths=[], valid=batch_size)
state, tx, center_tx, _ = create_train_state(cfg, model, rng, sample, steps_per_epoch=100)
mesh = make_mesh(cfg.TPU.NUM_DEVICES)
step = build_train_step(cfg, model, tx, center_tx, mesh, donate=True)
im_d, pid_d, cam_d, view_d = map(jnp.asarray, (images, pids, cams, views))
for _ in range(3):
    state, metrics = step(state, im_d, pid_d, cam_d, view_d, rng)
jax.block_until_ready(metrics["loss"])
iters = 24
t0 = time.perf_counter()
for _ in range(iters):
    state, metrics = step(state, im_d, pid_d, cam_d, view_d, rng)
_ = float(metrics["loss"])
dt = time.perf_counter() - t0
print(f"paper-path (HDM+ATMoE): {batch_size*iters/dt:.1f} img/s ({dt/iters*1e3:.1f} ms/step)", flush=True)
