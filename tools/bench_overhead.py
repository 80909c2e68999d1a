import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time
import jax, jax.numpy as jnp
import numpy as np

x0 = jnp.asarray(np.random.randn(24768, 768) * 0.05, jnp.bfloat16)
w1 = jnp.asarray(np.random.randn(768, 2304) * 0.05, jnp.bfloat16)
w2 = jnp.asarray(np.random.randn(2304, 768) * 0.05, jnp.bfloat16)

@jax.jit
def noop(x):
    return jnp.sum(x[:8, :8].astype(jnp.float32))

def make_chain(rep):
    @jax.jit
    def f(x, w, w2):
        def body(i, x):
            y = jnp.dot(x, w, preferred_element_type=jnp.bfloat16)
            return jnp.dot(y, w2, preferred_element_type=jnp.bfloat16)
        return jax.lax.fori_loop(0, rep, body, x)
    return f

def timeit(label, fn, *args, reps=5):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best*1000:.2f} ms/call", flush=True)
    return best

t0 = timeit("noop", noop, x0, reps=20)
t24 = timeit("chain24", make_chain(24), x0, w1, w2)
t96 = timeit("chain96", make_chain(96), x0, w1, w2)
pair = (t96 - t24) / 72
print(f"per-pair GEMM time from slope: {pair*1000:.3f} ms; implied overhead: {(t24 - 24*pair)*1000:.2f} ms")
