"""Decompose the attention sub-block with in-jit chained loops
(immune to repeated-call memoization on the remote backend)."""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np
from demo2_tpu.ops.packed_attention import packed_self_attention

B, S, C, H = 192, 129, 768, 12
DT = jnp.bfloat16
REP = 24

def timeit(label, fn, *args):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best/REP*1000:.3f} ms/layer", flush=True)

qkv0 = jnp.asarray(np.random.randn(B, S, 3 * C) * 0.05, DT)
w_back = jnp.asarray(np.random.randn(C, 3 * C) * 0.02, DT)

def attn_chain(qkv, w):
    def body(i, qkv):
        o = packed_self_attention(qkv, H, (C // H) ** -0.5)
        return jnp.dot(o, w, preferred_element_type=jnp.bfloat16)
    return jax.lax.fori_loop(0, REP, body, qkv)

def gemm_chain(qkv, w):
    def body(i, qkv):
        o = qkv[..., :C] * 1.0000001
        return jnp.dot(o, w, preferred_element_type=jnp.bfloat16)
    return jax.lax.fori_loop(0, REP, body, qkv)

attn_j = jax.jit(attn_chain)
g_j = jax.jit(gemm_chain)
attn_fb = jax.jit(lambda qkv, w: jax.value_and_grad(
    lambda q: jnp.sum(attn_chain(q, w).astype(jnp.float32) ** 2) * 1e-6)(qkv))
g_fb = jax.jit(lambda qkv, w: jax.value_and_grad(
    lambda q: jnp.sum(gemm_chain(q, w).astype(jnp.float32) ** 2) * 1e-6)(qkv))

timeit("attn+qkvGEMM fwd", attn_j, qkv0, w_back)
timeit("qkvGEMM-only fwd", g_j, qkv0, w_back)
timeit("attn+qkvGEMM fwd+bwd", attn_fb, qkv0, w_back)
timeit("qkvGEMM-only fwd+bwd", g_fb, qkv0, w_back)
