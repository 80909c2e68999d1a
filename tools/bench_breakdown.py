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
from demo2_tpu.losses.losses import branch_weights, make_loss_fn
from demo2_tpu.models import make_model
from demo2_tpu.parallel import make_mesh

batch_size = 64
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
im_d, pid_d, cam_d, view_d = map(jnp.asarray, (images, pids, cams, views))
loss_fn_branch = make_loss_fn(cfg, num_classes)

def loss_of(params, bs, r):
    out, mutated = model.apply(
        {"params": params, "batch_stats": bs}, im_d, cam_d, view_d, None,
        train=True, rngs={"dropout": r, "gumbel": r}, mutable=["batch_stats"])
    total = 0.0
    weights = branch_weights(cfg, out["branches"].keys())
    for name, (logits, feat) in out["branches"].items():
        total = total + weights[name] * loss_fn_branch(logits, feat, pid_d)
    return total

@jax.jit
def fwd_only(params, bs, r):
    return loss_of(params, bs, r)

@jax.jit
def fwd_bwd(params, bs, r):
    l, g = jax.value_and_grad(loss_of)(params, bs, r)
    return l, g

@jax.jit
def opt_only(grads, opt_state, params):
    updates, new_opt = tx.update(grads, opt_state, params)
    new_params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    return new_params, new_opt

def timeit(name, fn, *args, iters=10, reader=None):
    out = None
    for _ in range(2):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    # force readback through dependency chain
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf[..., :1] if leaf.ndim else leaf)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name}: {dt:.1f} ms", flush=True)
    return out, dt

_, t_f = timeit("forward-only(loss)", fwd_only, state.params, state.batch_stats, rng)
(l, grads), t_fb = timeit("forward+backward", fwd_bwd, state.params, state.batch_stats, rng)
_, t_o = timeit("adam-update", opt_only, grads, state.opt_state, state.params)
print(f"implied backward: {t_fb - t_f:.1f} ms; fwd+bwd+opt: {t_fb + t_o:.1f} ms")
