"""Micro-benchmark: one CLIP block (attention + MLP sub-blocks) fwd and
fwd+bwd at flagship shapes (M=24768 tokens of width 768), vs the GEMM floor."""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np
from flax import linen as nn
from demo2_tpu.models.clip_vit import ResidualAttentionBlock

B, S, C, H = 192, 129, 768, 12
DT = jnp.bfloat16

block = ResidualAttentionBlock(C, H, dtype=DT, attn_implementation="pallas")
x0 = jnp.asarray(np.random.randn(B, S, C) * 0.05, DT)
vs = block.init(jax.random.PRNGKey(0), x0, None, False)

LAYERS = 12

def fwd(params, x):
    for _ in range(LAYERS):
        x = block.apply({"params": params}, x, None, False)
    return x

@jax.jit
def fwd_only(params, x):
    return fwd(params, x)

@jax.jit
def fwd_bwd(params, x):
    def loss(p, x):
        return jnp.sum(fwd(p, x).astype(jnp.float32) ** 2) * 1e-6
    l, g = jax.value_and_grad(loss)(params, x)
    return l, g

def readback(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.sum(leaf.astype(jnp.float32)))

def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    readback(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        readback(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name}: {best*1000:.2f} ms total, {best/LAYERS*1000:.3f} ms/layer", flush=True)
    return best

t_f = timeit("fwd 12 blocks", fwd_only, vs["params"], x0)
t_fb = timeit("fwd+bwd 12 blocks", fwd_bwd, vs["params"], x0)
print(f"bwd/layer: {(t_fb-t_f)/LAYERS*1000:.3f} ms; GEMM floor/layer ~2.95 fwd, ~8.9 fwd+bwd")
