"""Flagship step breakdown with IN-GRAPH iteration chains (fori_loop), so the
remote tunnel round-trip is paid once per K iterations, not per iteration.
"""
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
from demo2_tpu.losses.losses import branch_weights, make_loss_fn
from demo2_tpu.models import make_model

import sys as _sys
batch_size = int(_sys.argv[1]) if len(_sys.argv) > 1 else 64
K = 20
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
pids = np.tile(np.arange(batch_size // 4), 4).astype(np.int32)
cams = (np.arange(batch_size) % camera_num).astype(np.int32)
views = np.zeros((batch_size,), np.int32)
sample = Batch(images=images, pids=pids, camids=cams, viewids=views, paths=[], valid=batch_size)
state, tx, center_tx, _ = create_train_state(cfg, model, rng, sample, steps_per_epoch=100)
im_d, pid_d, cam_d, view_d = map(jnp.asarray, (images, pids, cams, views))
loss_fn_branch = make_loss_fn(cfg, num_classes)


def loss_of(params, im, r):
    out, _ = model.apply(
        {"params": params, "batch_stats": state.batch_stats}, im, cam_d, view_d,
        None, train=True, rngs={"dropout": r, "gumbel": r},
        mutable=["batch_stats"])
    total = 0.0
    weights = branch_weights(cfg, out["branches"].keys())
    for name, (logits, feat) in out["branches"].items():
        total = total + weights[name] * loss_fn_branch(logits, feat, pid_d)
    return total


def chain(name, step_fn, carry0):
    @jax.jit
    def many(carry):
        def body(i, carry):
            return step_fn(i, carry)
        return jax.lax.fori_loop(0, K, body, carry)

    out = many(carry0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = many(carry0)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf if leaf.ndim == 0 else leaf.ravel()[0])
    dt = (time.perf_counter() - t0) / K * 1000
    print(f"{name}: {dt:.2f} ms", flush=True)
    return dt


rkey = jax.random.PRNGKey(1)

# forward only: chain through images perturbation (params ride the carry so
# they are jit ARGUMENTS, not 366 MB of HLO literals -> remote-compile 413)
def f_fwd(i, carry):
    acc, im, params = carry
    l = loss_of(params, im, jax.random.fold_in(rkey, i))
    return acc + l, im + (l * 1e-30).astype(im.dtype), params

t_f = chain("forward(loss)", f_fwd, (jnp.float32(0.0), im_d, state.params))

# forward+backward: chain through params perturbation
def f_fb(i, carry):
    acc, params = carry
    l, g = jax.value_and_grad(loss_of)(params, im_d, jax.random.fold_in(rkey, i))
    gsum = sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(g))
    params = jax.tree_util.tree_map(
        lambda p: p + (l * 1e-30).astype(p.dtype), params
    )
    return acc + l + gsum, params

t_fb = chain("forward+backward", f_fb, (jnp.float32(0.0), state.params))

# full step: fwd+bwd+adam, state threaded
def f_full(i, carry):
    params, opt_state = carry
    l, g = jax.value_and_grad(loss_of)(params, im_d, jax.random.fold_in(rkey, i))
    updates, opt_state = tx.update(g, opt_state, params)
    params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    return params, opt_state

t_full = chain("full step (fwd+bwd+adam)", f_full, (state.params, state.opt_state))
print(f"implied backward: {t_fb - t_f:.2f} ms, implied adam: {t_full - t_fb:.2f} ms")
print(f"img/s at batch {batch_size}: {batch_size / t_full * 1000:.1f}")
