"""Micro-bench HDM forward+backward variants on TPU (isolated module)."""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np
from demo2_tpu.models.hdm_atmoe import HDM

B, N, C = 64, 128, 512
rng = jax.random.PRNGKey(0)
patches = jax.random.normal(rng, (3, B, N, C), jnp.float32).astype(jnp.bfloat16)
globals_ = jax.random.normal(rng, (3, B, C), jnp.float32).astype(jnp.bfloat16)

mod = HDM(feat_dim=C, dropout=0.0, dtype=jnp.bfloat16)
params = mod.init(rng, patches, globals_, True)

@jax.jit
def fwdbwd(p, pt, gl):
    def loss(p):
        out = mod.apply(p, pt, gl, True)
        return jnp.sum(out.astype(jnp.float32) ** 2)
    l, g = jax.value_and_grad(loss)(p)
    return l, g

l, g = fwdbwd(params, patches, globals_)
jax.block_until_ready(l)
iters = 50
t0 = time.perf_counter()
for _ in range(iters):
    l, g = fwdbwd(params, patches, globals_)
_ = float(l)
dt = (time.perf_counter() - t0) / iters
print(f"HDM fwd+bwd: {dt*1e3:.3f} ms", flush=True)
